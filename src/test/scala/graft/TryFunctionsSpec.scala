package graft

import org.apache.spark.sql.functions._

/** ANSI-mode safety valves: the `try_*` function family is the
  * sanctioned per-expression opt-out from fail-loud arithmetic — at
  * 100 TB one poisoned row must not kill a 10-hour job, but silently
  * wrapping overflow (legacy mode) is worse. Pins: overflow → NULL,
  * division by zero → NULL, bad casts/parses → NULL, out-of-bounds
  * element access → NULL — while the same expressions WITHOUT try_
  * throw under ANSI. */
class TryFunctionsSpec extends SparkSpec {

  import spark.implicits._

  private def one[T](sqlExpr: String): Any =
    spark.sql(s"SELECT $sqlExpr AS v").head.get(0)

  test("try_ arithmetic yields NULL where plain ANSI arithmetic throws") {
    assert(one(s"try_add(${Long.MaxValue}L, 1L)") == null)
    assert(one(s"try_multiply(${Long.MaxValue}L, 2L)") == null)
    assert(one("try_subtract(CAST(-9223372036854775808 AS BIGINT), 1L)") == null)
    assert(one("try_divide(1, 0)") == null)
    assert(one("try_mod(1, 0)") == null)
    // Sanity: the non-try forms do throw under ANSI.
    intercept[Exception] {
      spark.sql(s"SELECT ${Long.MaxValue}L + 1L").collect()
    }
    intercept[Exception] { spark.sql("SELECT 1 div 0").collect() }
  }

  test("try_cast / try_to_number / try_element_at yield NULL on bad input") {
    assert(one("try_cast('not-a-number' AS INT)") == null)
    assert(one("try_cast('123' AS INT)") == 123)
    assert(one("try_to_number('12x', '999')") == null)
    assert(one("try_element_at(array(1, 2, 3), 7)") == null)
    assert(one("try_element_at(map('a', 1), 'b')") == null)
  }

  test("a poisoned row nulls out instead of killing the job") {
    val df = Seq(("1", "2"), ("3", "0"), ("oops", "4")).toDF("a", "b")
    val out = df.select(
      expr("try_divide(try_cast(a AS INT), try_cast(b AS INT))").as("q"))
      .collect().map(r => Option(r.get(0)))
    assert(out.toSeq == Seq(Some(0.5), None, None))
  }
}
