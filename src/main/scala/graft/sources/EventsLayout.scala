package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** DAY-PARTITIONED physical layout for the events table — the serving
  * layout a 100 TB event lake actually uses: `day=<epoch-day>/` Hive
  * directories, so a time-sliced read prunes at the DIRECTORY level
  * (the file listing itself shrinks) before row-group min/max stats even
  * enter the picture. Complements [[graft.Sources.eventsTsRange]], which
  * proves row-group pruning on the unpartitioned fixture.
  *
  * Write shape: `repartition(col("day"))` before `partitionBy("day")` so
  * each day is written by one task → one file per day directory instead
  * of (input tasks × days) small files. At cluster scale with large days,
  * widen to `repartition(n, col("day"), <salt>)` — the layout contract
  * (one directory per day) is unchanged.
  */
object EventsLayout {

  val NanosPerDay = 86400000000000L

  /** The DATA-column schema to pass explicitly to [[readDays]] (the
    * `day` partition column is NOT in it — partition discovery supplies
    * it from the directory names): with a user schema present, planning
    * never opens a single file footer for inference — at directory-
    * pruned scale, listing is metadata-only and pruned-away directories
    * are never touched. */
  def daySchema(events: DataFrame): StructType = events.schema

  /** Write `events` day-partitioned under `outDir`. FLOOR division, not
    * `DIV`: Spark's `DIV` truncates toward zero, which would fold the
    * last pre-1970 day and the first 1970 day both into `day=0` and
    * break range semantics for any fixture with pre-epoch timestamps. */
  def writeDayPartitioned(events: DataFrame, outDir: String): Unit =
    events.withColumn("day",
        expr(s"ts DIV $NanosPerDay - CASE WHEN ts % $NanosPerDay < 0 THEN 1 ELSE 0 END"))
      .repartition(col("day"))
      .write.mode("overwrite").partitionBy("day").parquet(outDir)

  /** Read a closed-open day range [loDay, hiDay) off the partitioned
    * layout. The `day` predicate is a PARTITION filter: Catalyst resolves
    * it against the directory names during file listing, so files under
    * non-matching `day=` directories are never listed into the scan,
    * let alone opened. */
  def readDays(spark: SparkSession, outDir: String, schema: StructType,
               loDay: Long, hiDay: Long): DataFrame =
    spark.read.schema(schema).parquet(outDir)
      .filter(col("day") >= loDay && col("day") < hiDay)
}
