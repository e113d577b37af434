package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .withExtensions(new graft.functions.GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // AQE partition coalescing stays at its defaults (parallelismFirst):
      // measured at sf0.1/local[32], size-based coalescing
      // (parallelismFirst=false) collapsed the shingle self-joins — small
      // shuffle INPUT, exploding join OUTPUT — onto 1-2 cores and cost
      // +60% total. The round-1 "32 cores slower than 8" regression was
      // lazy-cache double computation (fixed in util.Views.materialize),
      // not partition-count overhead.
      // events.parquet carries INT64 TIMESTAMP(NANOS); read as BIGINT nanos
      // (session-level so no reader mutates conf mid-query — SPARK-40819).
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Optional comma-separated filter for fast iteration on one query.
    val only = sys.env.get("SPARK_GRAFT_QUERIES")
      .map(_.split(",").map(_.trim).toSet)
    val queries = SparkEntry.queries
      .filter { case (n, _) => only.forall(_.contains(n)) }
    // Warm-up: run every query once at the smallest SF so JIT + whole-stage
    // codegen compilation is paid before timing, not by whichever query
    // happens to run first (measured: 18 s cold vs 2 s warm for the same
    // plan). Falls back to the bench SF if the small SF is absent.
    val warmDir = Seq("/root/testdata/sf0.001", sfDir)
      .find(d => java.nio.file.Files.exists(java.nio.file.Paths.get(d))).get
    queries.foreach { case (name, fn) =>
      try { fn(spark, warmDir).count() } catch { case e: Throwable =>
        System.err.println(s"[bench] warm-up $name failed: ${e.getMessage}")
      }
    }
    spark.catalog.clearCache()
    // MEDIAN-OF-N protocol: single samples on this shared box carry
    // ±2-4x per-query noise (measured: the same untouched query ran 2.9 s
    // and 11.1 s in adjacent rounds), which made round-over-round
    // comparisons unadjudicable. Each query is timed `reps` times
    // (cache-cleared between passes so every pass pays its own work) and
    // the per-query MEDIAN is reported; raw samples ride along under
    // "samples" so outliers stay visible.
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.size % 2 == 1) s(s.size / 2) else (s(s.size / 2 - 1) + s(s.size / 2)) / 2
    }
    val results = queries.map { case (name, fn) =>
      val samples = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        val ok = try { fn(spark, sfDir).count(); true }
          catch { case e: Throwable =>
            System.err.println(s"[bench] $name failed: ${e.getMessage}"); false
          }
        // Queries persist shared intermediates (e.g. the dedup shingle
        // view); drop them so no pass's timing pays another's cache residue.
        spark.catalog.clearCache()
        // A failed pass reports -1, never a misleading small elapsed time.
        if (ok) (System.nanoTime() - t0) / 1e9 else -1.0
      }
      // Any failed pass poisons the query: -1, not a median over survivors.
      val dt = if (samples.exists(_ < 0)) -1.0 else median(samples)
      name -> (dt, samples)
    }
    val qs = results.map { case (k, (v, _)) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val ss = results.map { case (k, (_, s)) =>
      s"\"" + k + "\":" + s.mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    val failed = results.values.count(_._1 < 0)
    // Failures are visible in the JSON itself ("failed" + the -1 entries),
    // so a consumer reading the metric alone can tell coverage shrank.
    val total = results.values.map(_._1).filter(_ >= 0).sum
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","failed":$failed,"reps":$reps,"queries":$qs,"samples":$ss,"sf":"$sfDir"}"""
    println(json)
    // Also write to a file: stdout passes through sbt's [info] prefixing,
    // which downstream JSON parsers trip over.
    java.nio.file.Files.writeString(java.nio.file.Paths.get("bench.json"), json + "\n")
    spark.stop()
  }
}
