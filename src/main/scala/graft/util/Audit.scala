package graft.util

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Referential-integrity audit — the data-quality gate an ingest pipeline
  * runs before publishing a snapshot: for each declared FK relationship,
  * how many child rows have no matching parent (orphans).
  *
  * Shape per relationship: one left-anti join on the FK column, counted —
  * a single keyed shuffle of the child's FK column only (the child is
  * projected to that one column first, so at 100 TB the shuffle carries
  * 8 bytes/row, not the row). Small parents (nation, region — bounded
  * catalogs) are broadcast explicitly so those relationships shuffle
  * NOTHING on the child side; large parents (orders at ~1.5B rows/100 TB)
  * go through the shuffled anti join where AQE picks the strategy. The
  * per-relationship scalar results union into one tiny frame — unions of
  * aggregates, never of raw tables.
  */
object Audit {

  /** One FK relationship: child rows whose `fk` never appears among the
    * parent's `pk`. Returns a single row (rel, n_rows, n_orphans). */
  def orphanCount(rel: String, child: DataFrame, fk: String,
                  parent: DataFrame, pk: String,
                  broadcastParent: Boolean = false): DataFrame = {
    val keys0 = parent.select(col(pk).as("__pk")).distinct()
    val keys = if (broadcastParent) broadcast(keys0) else keys0
    val fks = child.select(col(fk).as("__fk"))
    val total = fks.groupBy().agg(count(lit(1)).as("n_rows"))
    val orphans = fks.join(keys, col("__fk") === col("__pk"), "left_anti")
      .groupBy().agg(count(lit(1)).as("n_orphans"))
    total.crossJoin(orphans).select(
      lit(rel).as("rel"), col("n_rows"), col("n_orphans"))
  }
}
