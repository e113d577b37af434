package graft

import org.apache.spark.sql.functions._

/** [[graft.sources.SnapshotStore]]: latest-wins/tombstone fold across
  * commits, manifest-last visibility (a torn write — data landed, marker
  * didn't — must be invisible), and the commit-batch guards. */
class SnapshotStoreSpec extends SparkSpec {
  import graft.sources.SnapshotStore

  private def freshDir(): String =
    java.nio.file.Files.createTempDirectory("graft_snap_spec").toString + "/store"

  private def df(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("id", "payload")
  }

  private def ids(rows: Long*) = {
    import spark.implicits._
    rows.toDF("id")
  }

  private def state(dir: String, v: Int): Map[Long, String] =
    SnapshotStore.readAsOf(spark, dir, "id", v)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[String]("payload")).toMap

  test("latest-wins upserts, deletes, and resurrection across versions") {
    val dir = freshDir()
    assert(SnapshotStore.commit(df(1L -> "a1", 2L -> "b1", 3L -> "c1"),
      None, dir, "id") == 1)
    assert(SnapshotStore.commit(df(2L -> "b2"), Some(ids(3L)), dir, "id") == 2)
    assert(SnapshotStore.commit(df(3L -> "c3", 4L -> "d3"), None, dir, "id") == 3)
    assert(state(dir, 1) == Map(1L -> "a1", 2L -> "b1", 3L -> "c1"))
    assert(state(dir, 2) == Map(1L -> "a1", 2L -> "b2")) // 3 deleted
    assert(state(dir, 3) == Map(1L -> "a1", 2L -> "b2", 3L -> "c3", 4L -> "d3"))
    // Surviving rows carry their version.
    val vs = SnapshotStore.readAsOf(spark, dir, "id", 3)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Number]("v").intValue).toMap
    assert(vs == Map(1L -> 1, 2L -> 2, 3L -> 3, 4L -> 3))
  }

  test("torn write (data without marker) is invisible to readers") {
    val dir = freshDir()
    SnapshotStore.commit(df(1L -> "a1"), None, dir, "id")
    // Simulate a crash after the data append, before the marker: write
    // v=2 upsert files directly, no _commits/2.
    df(1L -> "TORN").withColumn("v", lit(2))
      .write.mode("append").partitionBy("v").parquet(s"$dir/upserts")
    assert(SnapshotStore.committedVersions(spark, dir) == Seq(1))
    // asOf(2) must cap at the newest COMMITTED version and not see v=2.
    assert(state(dir, 2) == Map(1L -> "a1"))
    // A later real commit takes version 2's slot logically? No — versions
    // derive from the manifest, so the next commit is v2 and would merge
    // with the torn files. Real stores fence writers; here the contract
    // is the single-writer one every manifest-last store documents.
  }

  test("commit guards: duplicate ids in a batch, upsert+delete overlap") {
    val dir = freshDir()
    intercept[IllegalArgumentException] {
      SnapshotStore.commit(df(1L -> "x", 1L -> "y"), None, dir, "id")
    }
    SnapshotStore.commit(df(1L -> "a"), None, dir, "id")
    intercept[IllegalArgumentException] {
      SnapshotStore.commit(df(1L -> "a2"), Some(ids(1L)), dir, "id")
    }
  }

  test("compaction: reads past the checkpoint fold only newer commits, all states preserved") {
    val dir = freshDir()
    SnapshotStore.commit(df(1L -> "a1", 2L -> "b1", 3L -> "c1"), None, dir, "id")
    SnapshotStore.commit(df(2L -> "b2"), Some(ids(3L)), dir, "id")
    // Uncompacted truth for every version, captured BEFORE compacting.
    val before = (1 to 2).map(v => state(dir, v))
    SnapshotStore.compact(spark, dir, "id", 2)
    SnapshotStore.commit(df(3L -> "c3"), Some(ids(1L)), dir, "id")
    // Pre-checkpoint time travel still works and is unchanged...
    assert(state(dir, 1) == before(0) && state(dir, 2) == before(1))
    // ...post-checkpoint state folds checkpoint + the v3 commit: 1
    // deleted at v3, 2 from the checkpoint, 3 resurrected at v3.
    assert(state(dir, 3) == Map(2L -> "b2", 3L -> "c3"))
    // The checkpointed read excludes pre-checkpoint LOG partitions at the
    // scan: its upserts branch filters v > 2.
    val plan = SnapshotStore.readAsOf(spark, dir, "id", 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("> 2"), s"expected a v > 2 partition filter:\n$plan")
  }

  test("old-version reads prune newer partitions at the scan") {
    val dir = freshDir()
    SnapshotStore.commit(df(1L -> "a1"), None, dir, "id")
    SnapshotStore.commit(df(2L -> "b2"), None, dir, "id")
    val plan = SnapshotStore.readAsOf(spark, dir, "id", 1)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("(v"),
      s"expected a v-partition filter at the scan:\n$plan")
  }

  private def partFiles(dir: String): Map[String, Long] = {
    val root = new java.io.File(dir)
    if (!root.exists()) Map.empty
    else root.listFiles().filter(_.isDirectory)
      .filterNot(_.getName.startsWith("."))
      .flatMap(d => d.listFiles().filter(f => f.getName.endsWith(".parquet")))
      .map(f => f.getPath -> f.length()).toMap
  }

  test("purgeIds erases an id from ALL history but rewrites only affected versions") {
    val dir = freshDir()
    SnapshotStore.commit(df(1L -> "a1", 2L -> "b1"), None, dir, "id")
    SnapshotStore.commit(df(3L -> "c2"), None, dir, "id")        // no id 2
    SnapshotStore.commit(df(2L -> "b3"), Some(ids(1L)), dir, "id")
    SnapshotStore.compact(spark, dir, "id", 2)
    val before = partFiles(s"$dir/upserts")
    val rewritten = SnapshotStore.purgeIds(spark, dir, "id", ids(2L))
    // v=2 contains no id-2 rows: its files must be untouched, byte for byte.
    val after = partFiles(s"$dir/upserts")
    val v2Before = before.filter(_._1.contains("v=2"))
    assert(v2Before.nonEmpty && v2Before.forall { case (p, len) =>
      after.get(p).contains(len) }, "untouched version was rewritten")
    assert(rewritten.exists(_.contains("v=1")) &&
      rewritten.exists(_.contains("v=3")) &&
      !rewritten.exists(_.contains("v=2")))
    // Erased from every historical read, not just the head.
    for (v <- 1 to 3)
      assert(!state(dir, v).contains(2L), s"id 2 visible at v=$v after purge")
    // Other ids' history is intact (1 visible at v1/v2, tombstoned at v3).
    assert(state(dir, 1).get(1L).contains("a1"))
    assert(state(dir, 3) == Map(3L -> "c2"))
  }

  test("purgeIds erases the id from tombstone files too") {
    val dir = freshDir()
    SnapshotStore.commit(df(1L -> "a1", 2L -> "b1"), None, dir, "id")
    SnapshotStore.commit(df(), Some(ids(1L)), dir, "id")
    SnapshotStore.purgeIds(spark, dir, "id", ids(1L))
    val tombs = spark.read.parquet(s"$dir/tombstones")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(!tombs.contains(1L), "purged id still present in a tombstone file")
    assert(state(dir, 2) == Map(2L -> "b1"))
  }

  test("purgeIds >100k ids: distributed anti-join, no giant In literal") {
    import spark.implicits._
    val dir = freshDir()
    // 150k-row payload, every 3rd id in the purge set (well past the old
    // 100k collect ceiling).
    SnapshotStore.commit(
      spark.range(150000).select(col("id"),
        concat(lit("p"), col("id")).as("payload")),
      None, dir, "id")
    val purgeSet = spark.range(150000).filter(col("id") % 3 === 0)
      .select("id")
    // The PLAN guard: the keep-side frame for a large id set must join,
    // never inline 100001+ literals into an In/InSet expression.
    val keepPlan = spark.read.parquet(s"$dir/upserts/v=1")
      .join(broadcast(purgeSet), Seq("id"), "left_anti")
      .queryExecution.executedPlan.toString
    assert(!keepPlan.contains(" IN ("), "anti-join plan carries an In list")
    val rewritten = SnapshotStore.purgeIds(spark, dir, "id", purgeSet)
    assert(rewritten.exists(_.contains("v=1")))
    val left = spark.read.parquet(s"$dir/upserts")
      .select("id").as[Long].collect()
    assert(left.length == 100000 && left.forall(_ % 3 != 0),
      "purge with a >100k id set did not erase exactly the requested ids")
  }

  test("purgeIds tolerates a NULL inside the purge id SET (literal path)") {
    val dir = freshDir()
    import spark.implicits._
    SnapshotStore.commit(df(5L -> "a", 6L -> "b", 7L -> "c"), None, dir, "id")
    // [NULL, 5]: NULL names no row; without the up-front isNotNull drop,
    // NOT In(NULL, 5) is NULL for ids 6 and 7 and the rewrite would
    // silently erase the whole partition.
    val withNullIds = Seq(Option(5L), Option.empty[Long]).toDF("id")
    SnapshotStore.purgeIds(spark, dir, "id", withNullIds)
    val left = spark.read.parquet(s"$dir/upserts")
      .select("payload").as[String].collect().toSet
    assert(left == Set("b", "c"), s"survivors mangled: $left")
  }

  test("purgeIds: all-NULL id set is a no-op; truly empty set still errors") {
    val dir = freshDir()
    import spark.implicits._
    SnapshotStore.commit(df(1L -> "a"), None, dir, "id")
    val allNull = Seq(Option.empty[Long]).toDF("id")
    assert(SnapshotStore.purgeIds(spark, dir, "id", allNull).isEmpty)
    assert(state(dir, 1) == Map(1L -> "a"))
    intercept[IllegalArgumentException] {
      SnapshotStore.purgeIds(spark, dir, "id", allNull.limit(0))
    }
  }

  test("purgeIds literal path keeps NULL-id rows (never requested for erasure)") {
    val dir = freshDir()
    import spark.implicits._
    val withNull = Seq((java.lang.Long.valueOf(1L), "a1"),
      (null.asInstanceOf[java.lang.Long], "n1")).toDF("id", "payload")
    SnapshotStore.commit(withNull, None, dir, "id")
    SnapshotStore.purgeIds(spark, dir, "id", ids(1L))
    val payloads = spark.read.parquet(s"$dir/upserts")
      .select("payload").as[String].collect().toSet
    assert(payloads == Set("n1"), s"expected only the null-id row, got $payloads")
  }

  test("recoverInterruptedPurge restores a crash between the two renames") {
    val dir = freshDir()
    SnapshotStore.commit(df(1L -> "a1"), None, dir, "id")
    // Simulate the worst crash point: live staged away to bak, publish
    // never happened.
    val live = new java.io.File(s"$dir/upserts/v=1")
    val bak = new java.io.File(s"$dir/upserts/.v=1.purge_bak")
    assert(live.renameTo(bak))
    SnapshotStore.recoverInterruptedPurge(spark, dir)
    assert(state(dir, 1) == Map(1L -> "a1"))
    assert(!bak.exists())
    // Idempotent on a healthy store.
    SnapshotStore.recoverInterruptedPurge(spark, dir)
    assert(state(dir, 1) == Map(1L -> "a1"))
  }
}
