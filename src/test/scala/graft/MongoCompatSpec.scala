package graft

import org.apache.spark.sql.functions._

/** [[graft.sources.MongoCompat]]: the reference's `format("mongo")` call
  * shape (`yfinance_transform.py:113-115,125-128`) must run UNMODIFIED
  * against the parquet data plane. */
class MongoCompatSpec extends SparkSpec {

  private def freshRoot(): String =
    java.nio.file.Files.createTempDirectory("graft_mongo_compat").toString

  test("reference write→read round-trip, byte-identical rows") {
    import spark.implicits._
    val root = freshRoot()
    val uri = "mongodb://localhost:27017/Saham.BBCA"
    val bars = Seq(
      ("2024-01-02", 100.0, 102.5, 1000L),
      ("2024-01-03", 102.5, 101.0, 2000L)).toDF("Date", "Open", "Close", "Volume")
    // The reference's exact write line (mode append there; both modes work).
    bars.write.format("mongo").option("uri", uri).option("root", root)
      .mode("append").save()
    // The reference's exact read line.
    val back = spark.read.format("mongo").option("uri", uri)
      .option("root", root).load()
    assert(back.columns.toSeq == Seq("Date", "Open", "Close", "Volume"))
    assert(back.orderBy("Date").collect().toSeq ==
      bars.orderBy("Date").collect().toSeq)
    // Append really appends.
    bars.write.format("mongo").option("uri", uri).option("root", root)
      .mode("append").save()
    assert(spark.read.format("mongo").option("uri", uri).option("root", root)
      .load().count() == 4)
  }

  test("collections map to <root>/<db>/<collection> parquet directories") {
    import spark.implicits._
    val root = freshRoot()
    Seq((1, "x")).toDF("k", "v").write.format("mongo")
      .option("uri", "mongodb://h:27017/DBfin.TLKM").option("root", root)
      .mode("overwrite").save()
    val dir = new java.io.File(s"$root/DBfin/TLKM")
    assert(dir.isDirectory &&
      dir.listFiles().exists(_.getName.endsWith(".parquet")))
    // Distinct collections are isolated.
    Seq((2, "y")).toDF("k", "v").write.format("mongo")
      .option("uri", "mongodb://h:27017/DBfin.BBRI").option("root", root)
      .mode("overwrite").save()
    val tl = spark.read.format("mongo")
      .option("uri", "mongodb://h:27017/DBfin.TLKM").option("root", root)
      .load().select("k").collect().map(_.getInt(0)).toSeq
    assert(tl == Seq(1))
  }

  test("filters and pruning are forwarded onto the inner parquet scan") {
    import spark.implicits._
    val root = freshRoot()
    val uri = "mongodb://h/db.filtered"
    (1 to 100).map(i => (i.toLong, s"p$i")).toDF("id", "payload")
      .write.format("mongo").option("uri", uri).option("root", root)
      .mode("overwrite").save()
    val q = spark.read.format("mongo").option("uri", uri).option("root", root)
      .load().filter(col("id") > 90L).select("id")
    assert(q.collect().map(_.getLong(0)).sorted.toSeq == (91L to 100L))
  }

  test("count() (empty projection) scans zero columns and still counts rows") {
    import spark.implicits._
    val root = freshRoot()
    val uri = "mongodb://h/db.wide"
    (1 to 50).map(i => (i, s"a$i", s"b$i", s"c$i")).toDF("k", "a", "b", "c")
      .write.format("mongo").option("uri", uri).option("root", root)
      .mode("overwrite").save()
    assert(spark.read.format("mongo").option("uri", uri).option("root", root)
      .load().count() == 50)
  }

  test("malformed URIs fail loudly") {
    intercept[IllegalArgumentException] {
      spark.read.format("mongo").option("uri", "mongodb://hostonly").load()
    }
    intercept[IllegalArgumentException] {
      spark.read.format("mongo").option("uri", "mongodb://h/nodots").load()
    }
    intercept[IllegalArgumentException] {
      spark.read.format("mongo").load() // no uri at all
    }
  }

  test("URIs that would escape or nest outside <root>/<db>/<coll> are rejected") {
    def bad(uri: String): Unit = {
      val e = intercept[IllegalArgumentException] {
        spark.read.format("mongo").option("uri", uri).load()
      }
      assert(e.getMessage.contains("mongo"), s"$uri: ${e.getMessage}")
    }
    bad("mongodb://h/a/b.c")      // extra path segment would nest
    bad("mongodb://h/...c")       // '..' db segment would escape the root
    bad("mongodb://h/.co.ll")     // empty-ish db segment
    bad("ftp://h/db.coll")        // wrong scheme must not fall through
    // mongodb+srv:// is an accepted alias of the same namespace syntax
    val p1 = sources.MongoCompat.resolvePath(spark.sqlContext,
      Map("uri" -> "mongodb+srv://h/db.coll", "root" -> "/tmp/mc"))
    assert(p1 == "/tmp/mc/db/coll")
  }
}
