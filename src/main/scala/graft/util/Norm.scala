package graft.util

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** THE text-normalization contract, shared by every module that
  * fingerprints, shingles, or tokenizes (dedup, text analysis): lowercase,
  * trim, collapse whitespace runs to one space.
  *
  * The whitespace class is spelled out explicitly because Java regex `\s`
  * includes vertical tab (0x0B) while DuckDB's RE2 `\s` does not — with
  * `\s+` the two engines normalize a 0x0B-bearing document differently and
  * every downstream hash diverges. `[ \t\n\x0B\f\r]` means the same thing
  * in both engines. */
object Norm {

  private val WsClass = "[ \\t\\n\\x0B\\f\\r]+"

  def normalize(c: Column): Column = regexp_replace(lower(trim(c)), WsClass, " ")

  def normalizeSql(x: String): String =
    s"regexp_replace(lower(trim($x)), '[ \\t\\n\\x0B\\f\\r]+', ' ', 'g')"
}
