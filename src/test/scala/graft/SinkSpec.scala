package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

class SinkSpec extends SparkSpec {

  test("writeAll lands day/month/year in one agg_type-partitioned dataset") {
    val out = Files.createTempDirectory("graft_sink").toString
    val bars = Sources.ohlcv(spark, sfDir)
    yf.Ohlcv.writeAll(bars, out)
    // partition directories exist — the K2 'one target, discriminated by
    // agg_type' shape (yfinance_transform.py:125-137)
    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory).map(_.getName).sorted
    assert(dirs.toSeq === Seq("agg_type=day", "agg_type=month", "agg_type=year"))
    // per-branch read-back: partition pruning gives exactly that branch
    val day = spark.read.parquet(s"$out/agg_type=day")
    assert(day.count() === bars.count())
    val month = spark.read.parquet(s"$out/agg_type=month")
    assert(month.count() ===
      yf.Ohlcv.aggregatePeriod(bars, "yyyy-MM", "month").count())
    // merged read: all three branches in one frame, discriminator restored
    val all = spark.read.option("mergeSchema", "true").parquet(out)
    assert(all.select("agg_type").distinct().count() === 3)
    assert(all.count() === day.count() + month.count() +
      spark.read.parquet(s"$out/agg_type=year").count())
    // appending again doubles rows (append semantics, K2)
    yf.Ohlcv.writeAll(bars, out)
    assert(spark.read.parquet(s"$out/agg_type=day").count() === 2 * bars.count())
  }

  test("readBranch: explicit-schema branch read prunes partitions at the scan") {
    val out = Files.createTempDirectory("graft_sink_prune").toString
    val bars = Sources.ohlcv(spark, sfDir)
    yf.Ohlcv.writeAll(bars, out)
    val monthSchema = yf.Ohlcv.aggregatePeriod(bars, "yyyy-MM", "month").schema
    val month = yf.Ohlcv.readBranch(spark, out, monthSchema, "month")
    // the discriminator equality reaches the scan as a PARTITION filter —
    // only the month branch's files are listed and read; no mergeSchema
    // footer sweep over the other branches
    val planStr = month.queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*agg_type".r.findFirstIn(planStr).isDefined,
      s"expected agg_type in PartitionFilters:\n$planStr")
    // result is exactly the branch, with the pinned branch schema
    assert(month.count() ===
      yf.Ohlcv.aggregatePeriod(bars, "yyyy-MM", "month").count())
    assert(month.columns.toSeq === monthSchema.fieldNames.toSeq)
  }
}
