package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

/** Row-level DELETE through the V2 catalog — `DELETE FROM <table> WHERE
  * <arbitrary SQL>` compiled by Spark into the group-based copy-on-write
  * rewrite (scan survivors → replace the group) against the connector's
  * two-phase file swap. The predicate deliberately includes a modulo
  * term the connector cannot evaluate: the row-level framework's whole
  * point is that ARBITRARY conditions run in Spark while the connector
  * only provides scan + replace. */
class RowLevelDeleteSpec extends SparkSpec {

  private def freshTable(): String = {
    val tmp = Files.createTempDirectory("graft_rld").resolve("cat.csv")
    Files.copy(Paths.get(Sources.CatalogCsvPath), tmp)
    tmp.toString
  }

  test("DELETE FROM removes exactly the matching rows and keeps the file well-formed") {
    val path = freshTable()
    spark.conf.set("spark.sql.catalog.graft_del", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft_del.path", path)
    val before = spark.sql("SELECT * FROM graft_del.stock_catalog")
      .collect().map(r => (r.getInt(0), r.getString(1)))
    assert(before.nonEmpty)
    spark.sql(
      "DELETE FROM graft_del.stock_catalog WHERE Kode < 100 OR Kode % 7 = 0")
    val after = spark.sql("SELECT * FROM graft_del.stock_catalog")
      .collect().map(r => (r.getInt(0), r.getString(1))).toSet
    val expected = before.filterNot { case (k, _) => k < 100 || k % 7 == 0 }.toSet
    assert(after == expected && expected.nonEmpty)
    // The live file survived the swap well-formed: header + sorted keys.
    val lines = scala.io.Source.fromFile(path).getLines().toVector
    assert(lines.head.contains("Kode"))
    val keys = lines.tail.map(l => l.substring(0, l.indexOf(',')).trim.toInt)
    assert(keys == keys.sorted && keys.toSet == expected.map(_._1))
    // Reported statistics follow the mutation (cache invalidated).
    val stats = spark.sql("SELECT * FROM graft_del.stock_catalog")
      .queryExecution.optimizedPlan.stats
    assert(stats.rowCount.forall(_.toLong == expected.size))
  }

  test("UPDATE rewrites matching rows in place through the same machinery") {
    val path = freshTable()
    spark.conf.set("spark.sql.catalog.graft_upd", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft_upd.path", path)
    val before = spark.sql("SELECT * FROM graft_upd.stock_catalog")
      .collect().map(r => (r.getInt(0), r.getString(1)))
    spark.sql("UPDATE graft_upd.stock_catalog " +
      "SET `Nama Perusahaan` = concat(`Nama Perusahaan`, ' (d)') " +
      "WHERE Kode % 5 = 0")
    val after = spark.sql("SELECT * FROM graft_upd.stock_catalog")
      .collect().map(r => (r.getInt(0), r.getString(1))).toSet
    val expected = before.map { case (k, n) =>
      (k, if (k % 5 == 0) n + " (d)" else n)
    }.toSet
    assert(after == expected)
  }

  test("MERGE INTO applies update+insert against a source frame") {
    import spark.implicits._
    val path = freshTable()
    spark.conf.set("spark.sql.catalog.graft_mrg", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft_mrg.path", path)
    val before = spark.sql("SELECT * FROM graft_mrg.stock_catalog")
      .collect().map(r => (r.getInt(0), r.getString(1)))
    val maxK = before.map(_._1).max
    Seq((before.head._1, "Renamed Co"), (maxK + 1, "Fresh Co"))
      .toDF("k", "n").createOrReplaceTempView("merge_src")
    spark.sql(
      """MERGE INTO graft_mrg.stock_catalog t USING merge_src s
        |ON t.Kode = s.k
        |WHEN MATCHED THEN UPDATE SET `Nama Perusahaan` = s.n
        |WHEN NOT MATCHED THEN INSERT (Kode, `Nama Perusahaan`) VALUES (s.k, s.n)
        |""".stripMargin)
    val after = spark.sql("SELECT * FROM graft_mrg.stock_catalog")
      .collect().map(r => (r.getInt(0), r.getString(1))).toSet
    val expected = before.map { case (k, n) =>
      (k, if (k == before.head._1) "Renamed Co" else n)
    }.toSet + ((maxK + 1, "Fresh Co"))
    assert(after == expected)
  }

  test("a second DELETE composes and an all-matching DELETE empties the table") {
    val path = freshTable()
    spark.conf.set("spark.sql.catalog.graft_del2", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft_del2.path", path)
    spark.sql("DELETE FROM graft_del2.stock_catalog WHERE Kode >= 500")
    spark.sql("DELETE FROM graft_del2.stock_catalog WHERE Kode >= 0")
    assert(spark.sql("SELECT * FROM graft_del2.stock_catalog").count() == 0)
    // Header survives an empty table — the file stays readable.
    val lines = scala.io.Source.fromFile(path).getLines().toVector
    assert(lines.length == 1 && lines.head.contains("Kode"))
  }
}
