package graft

import org.apache.spark.sql.functions._

/** [[graft.sources.CsvSink]] — the V2 two-phase write commit: round-trip
  * content parity, append vs truncate semantics, temp-file hygiene, and
  * marker-gated visibility. */
class CsvSinkSpec extends SparkSpec {

  private def freshDir(): String =
    java.nio.file.Files.createTempDirectory("graft_csvsink").toString + "/out"

  private def writeCat(dir: String, mode: String, kodeMax: Int): Unit =
    Sources.stockCatalog(spark).filter(col("Kode") < kodeMax)
      .repartition(3)
      .write.format("graft.sources.CsvSink").option("path", dir)
      .mode(mode).save()

  private def readBack(dir: String) =
    spark.read.schema("Kode INT, `Nama Perusahaan` STRING").csv(dir)

  test("round-trip: written rows == source rows; temp dir cleaned; marker present") {
    val dir = freshDir()
    writeCat(dir, "append", 100)
    val back = readBack(dir).collect().map(r => (r.getInt(0), r.getString(1))).sortBy(_._1)
    val src = Sources.stockCatalog(spark).filter(col("Kode") < 100)
      .collect().map(r => (r.getInt(0), r.getString(1))).sortBy(_._1)
    assert(back.length == src.length && back.sameElements(src))
    val d = new java.io.File(dir)
    assert(!new java.io.File(d, "_tmp").exists(), "temp dir must be cleaned on commit")
    assert(new java.io.File(d, "_GRAFT_COMMITTED").exists(), "commit marker must land")
    // Multiple task files published (3 input partitions).
    assert(d.listFiles().count(_.getName.startsWith("part-")) == 3)
  }

  test("append adds to committed data; overwrite truncates it") {
    val dir = freshDir()
    writeCat(dir, "append", 50)
    writeCat(dir, "append", 50)
    assert(readBack(dir).count() == 100) // both batches visible
    writeCat(dir, "overwrite", 20)
    assert(readBack(dir).count() == 20) // truncate cleared the old files
    assert(readBack(dir).agg(max("Kode")).head.getInt(0) == 19)
  }

  test("schema mismatch is rejected at write planning") {
    val dir = freshDir()
    val e = intercept[Exception] {
      Sources.stockCatalog(spark).select(col("Kode").as("wrong_name"), col("Nama Perusahaan"))
        .write.format("graft.sources.CsvSink").option("path", dir).mode("append").save()
    }
    assert(e.getMessage != null)
  }
}
