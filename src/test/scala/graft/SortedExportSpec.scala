package graft

import org.apache.spark.sql.functions._

/** Range-partitioned sorted export — the "globally sorted parquet drop"
  * layout consumers expect from a lake export (disjoint per-file key
  * ranges ⇒ a reader can binary-search files by min/max footer stats,
  * and concatenating files in partition order yields a total order).
  * `repartitionByRange` + `sortWithinPartitions` is the scale-right
  * plan: one range exchange (sampled boundaries), per-partition local
  * sort, no single-node global sort anywhere.
  */
class SortedExportSpec extends SparkSpec {

  test("repartitionByRange + sortWithinPartitions yields disjoint, internally-sorted partitions") {
    import spark.implicits._
    val ev = Sources.events(spark, sfDir).select($"ts", $"event_id")
    val n = ev.count()
    val sorted = ev.repartitionByRange(8, $"ts", $"event_id")
      .sortWithinPartitions($"ts", $"event_id")
    // Per-partition audit in one pass: id, row count, (min,max) key,
    // and whether the partition iterator was really sorted.
    val audit = sorted.mapPartitions { it =>
      val rows = it.map(r => (r.getLong(0), r.getLong(1))).toArray
      if (rows.isEmpty) Iterator.empty
      else Iterator((rows.length.toLong, rows.head, rows.last,
        rows.sliding(2).forall(w => w.length < 2 ||
          Ordering[(Long, Long)].lteq(w(0), w(1)))))
    }.collect()
    assert(audit.map(_._1).sum == n, "export drops no rows")
    assert(audit.forall(_._4), "each partition is internally sorted")
    // Partition key ranges are pairwise disjoint: sort by min and check
    // each max < next min.
    val ranges = audit.map(a => (a._2, a._3)).sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, max), (nextMin, _)) =>
        assert(Ordering[(Long, Long)].lt(max, nextMin),
          s"overlapping partition ranges: $max vs $nextMin")
      case _ =>
    }
    // The plan is a single range exchange — no global sort node.
    val plan = sorted.queryExecution.executedPlan.toString
    assert(plan.contains("rangepartitioning"), plan)
    assert(!plan.contains("global=true"), s"must not global-sort:\n$plan")
  }

  test("written export round-trips with per-file disjoint ranges") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_sorted_export").toString
    val ev = Sources.events(spark, sfDir).select($"ts", $"event_id")
    ev.repartitionByRange(4, $"ts").sortWithinPartitions($"ts")
      .write.mode("overwrite").parquet(dir)
    val back = spark.read.parquet(dir)
    assert(back.count() == ev.count())
    // Each physical file's [min,max] ts ranges are disjoint — the
    // footer-stats property file-skipping readers rely on.
    val perFile = back
      .select(input_file_name().as("f"), $"ts")
      .groupBy("f").agg(min($"ts").as("lo"), max($"ts").as("hi"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(perFile.length > 1)
    perFile.sliding(2).foreach {
      case Array((_, hi), (lo2, _)) => assert(hi <= lo2)
      case _ =>
    }
  }
}
