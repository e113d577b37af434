package graft

import org.apache.spark.sql.functions._

/** Parquet compression-codec matrix — the storage-tuning knob that
  * matters most at lake scale (zstd vs snappy is routinely a 1.5–2×
  * size difference on text-heavy tables, i.e. tens of TB at 100 TB).
  * Pins that every codec round-trips byte-identical data and that zstd
  * beats uncompressed and snappy on the text corpus, so the engine can
  * recommend zstd for cold data with evidence. */
class CodecSpec extends SparkSpec {

  private def dirSize(path: String): Long = {
    def walk(f: java.io.File): Long =
      if (f.isFile) f.length
      else Option(f.listFiles).map(_.map(walk).sum).getOrElse(0L)
    walk(new java.io.File(path))
  }

  test("zstd/snappy/lz4 all round-trip exactly; zstd compresses text best") {
    val docs = Sources.documents(spark, sfDir).orderBy("doc_id")
    val base = java.nio.file.Files.createTempDirectory("graft_codec")
      .toFile.getAbsolutePath
    val digestOf = (df: org.apache.spark.sql.DataFrame) =>
      df.agg(sum(conv(substring(md5(concat_ws("|",
        col("doc_id"), col("text"), col("lang"))
        .cast("binary")), 1, 10), 16, 10).cast("long"))).head.getLong(0)
    val want = digestOf(docs)

    val sizes = Seq("uncompressed", "snappy", "zstd", "lz4").map { codec =>
      val out = s"$base/$codec"
      docs.write.option("compression", codec).parquet(out)
      val got = digestOf(spark.read.parquet(out))
      assert(got == want, s"$codec round-trip changed the data")
      codec -> dirSize(out)
    }.toMap

    assert(sizes("zstd") < sizes("uncompressed"),
      s"zstd ${sizes("zstd")} not smaller than uncompressed ${sizes("uncompressed")}")
    assert(sizes("zstd") < sizes("snappy"),
      s"zstd ${sizes("zstd")} not smaller than snappy ${sizes("snappy")} on text")
  }
}
