package graft

import org.apache.spark.sql.functions._

/** Modern SQL-surface coverage — the query-authoring conveniences a user
  * switching from another engine expects to keep working. Each desugars
  * to ordinary Catalyst operators (same pushdown/codegen), so these pin
  * ACCEPTANCE and semantics, not plan shape:
  *  - parameterized SQL (named + positional markers) — the
  *    injection-safe way to template queries; literals arrive typed,
  *    not string-spliced;
  *  - lateral column aliases — referencing a select-list alias from a
  *    later item in the SAME select list;
  *  - EXECUTE IMMEDIATE — SQL-scripting dynamic statement execution;
  *  - pipe syntax is covered by the oracle-checked
  *    `events_pipe_syntax` query.
  */
class SqlSurfaceSpec extends SparkSpec {

  test("named-parameter SQL binds typed literals") {
    Sources.events(spark, sfDir).createOrReplaceTempView("sql_surface_events")
    val df = spark.sql(
      "SELECT count(*) AS n FROM sql_surface_events " +
        "WHERE event_type = :t AND user_id < :cap",
      Map("t" -> "click", "cap" -> 10))
    val direct = Sources.events(spark, sfDir)
      .filter(col("event_type") === "click" && col("user_id") < 10).count()
    assert(df.head().getLong(0) == direct && direct > 0)
  }

  test("positional-parameter SQL binds in order") {
    Sources.events(spark, sfDir).createOrReplaceTempView("sql_surface_events")
    val df = spark.sql(
      "SELECT count(*) AS n FROM sql_surface_events WHERE event_type = ? " +
        "AND value > ?",
      Array("view", 0.25))
    val direct = Sources.events(spark, sfDir)
      .filter(col("event_type") === "view" && col("value") > 0.25).count()
    assert(df.head().getLong(0) == direct)
  }

  test("lateral column alias: later select items see earlier aliases") {
    Sources.events(spark, sfDir).createOrReplaceTempView("sql_surface_events")
    val rows = spark.sql(
      """SELECT user_id,
        |  count(*) AS n,
        |  n * 2 AS double_n
        |FROM sql_surface_events GROUP BY user_id ORDER BY user_id""".stripMargin)
      .collect()
    assert(rows.nonEmpty)
    for (r <- rows)
      assert(r.getAs[Long]("double_n") == 2 * r.getAs[Long]("n"))
  }

  test("EXECUTE IMMEDIATE runs a dynamically-built statement") {
    Sources.events(spark, sfDir).createOrReplaceTempView("sql_surface_events")
    spark.sql("DECLARE OR REPLACE VARIABLE surface_stmt STRING")
    spark.sql("SET VAR surface_stmt = " +
      "'SELECT count(*) AS n FROM sql_surface_events WHERE user_id >= 5'")
    val n = spark.sql("EXECUTE IMMEDIATE surface_stmt").head().getLong(0)
    val direct = Sources.events(spark, sfDir).filter(col("user_id") >= 5).count()
    assert(n == direct && direct > 0)
  }

  test("SQL scripting: DECLARE/WHILE/SET with scalar subqueries over a real table") {
    // Spark 4 SQL scripting (SQL/PSM control flow) — the procedural
    // authoring surface: a WHILE loop accumulating per-bucket counts via
    // scalar subqueries into session variables. The partition-by-modulus
    // loop must recompose the exact corpus total.
    Sources.events(spark, sfDir).createOrReplaceTempView("sql_surface_events")
    spark.conf.set("spark.sql.scripting.enabled", "true")
    val total = spark.sql(
      """BEGIN
        |  DECLARE i INT DEFAULT 0;
        |  DECLARE total BIGINT DEFAULT 0;
        |  WHILE i < 7 DO
        |    SET total = total +
        |      (SELECT count(*) FROM sql_surface_events WHERE user_id % 7 = i);
        |    SET i = i + 1;
        |  END WHILE;
        |  SELECT total;
        |END""".stripMargin).head().getLong(0)
    assert(total == Sources.events(spark, sfDir).count() && total > 0)
  }
}
