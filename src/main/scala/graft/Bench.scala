package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm-up: run every query once at the smallest SF so JIT + whole-stage
    // codegen compilation is paid before timing, not by whichever query
    // happens to run first (measured: 18 s cold vs 2 s warm for the same
    // plan). Falls back to the bench SF if the small SF is absent.
    val warmDir = Seq("/root/testdata/sf0.001", sfDir)
      .find(d => java.nio.file.Files.exists(java.nio.file.Paths.get(d))).get
    SparkEntry.queries.foreach { case (_, fn) =>
      try { fn(spark, warmDir).count() } catch { case _: Throwable => }
    }
    spark.catalog.clearCache()
    val results = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok = try { fn(spark, sfDir).count(); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}"); false
        }
      // A failed query reports -1, never a misleading small elapsed time.
      val dt = if (ok) (System.nanoTime() - t0) / 1e9 else -1.0
      // Queries persist shared intermediates (e.g. the dedup shingle view);
      // drop them so no query's timing pays another's cache residue.
      spark.catalog.clearCache()
      name -> dt
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.values.filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
