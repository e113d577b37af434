package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Versioned snapshot store with AS-OF (time-travel) reads — the
  * relational core of a lakehouse table format (Delta/Iceberg), built on
  * nothing but parquet + a commit manifest:
  *
  *  - each commit appends its upsert rows under `dir/upserts/v=N/` and
  *    its tombstone ids under `dir/tombstones/v=N/` (plain partitioned
  *    parquet appends — the same write every warehouse sink does);
  *  - the commit POINT is an empty marker file `dir/_commits/N`, written
  *    LAST: readers reconstruct state only from marker-listed versions,
  *    so a torn write (data landed, marker didn't) is simply invisible —
  *    the classic manifest-last commit protocol, no filesystem
  *    transactions required;
  *  - `readAsOf(V)` = latest-wins fold of all committed versions ≤ V:
  *    one bounded-heap per-key top-1 ([[graft.plans.TopK.perKey]] — map-
  *    side collapse, shuffles ≤ one row per (id, map partition)) picks
  *    each id's newest upsert, then a keyed left join against the
  *    max-version tombstones drops ids whose newest operation is a
  *    delete. Both shuffles are id-keyed; nothing is global, nothing
  *    driver-side. Partition pruning on `v` means reading an OLD
  *    snapshot never touches newer versions' files.
  *
  * At 100 TB this is exactly the MERGE-on-read shape: commits are
  * O(batch) appends, reads pay one keyed fold over live versions (and a
  * periodic compaction — [[graft.util.Maintenance.compactTo]] — would
  * checkpoint the fold, exactly like Delta's OPTIMIZE).
  */
object SnapshotStore {

  private def fs(spark: SparkSession, dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Committed versions, ascending — ONLY what the marker files list. */
  def committedVersions(spark: SparkSession, dir: String): Seq[Int] = {
    val p = new Path(s"$dir/_commits")
    val f = fs(spark, dir)
    if (!f.exists(p)) Seq.empty
    else f.listStatus(p).map(_.getPath.getName.toInt).sorted.toSeq
  }

  /** Append one commit (upserts + optional tombstones) and return its
    * version. Preconditions enforced here (commits are rare actions —
    * the guards are cheap next to the writes they protect):
    *  - at most one upsert row per id per commit (latest-wins needs a
    *    total order across versions, not within one);
    *  - a commit never both upserts and deletes the same id. */
  def commit(upserts: DataFrame, tombstoneIds: Option[DataFrame],
             dir: String, idCol: String): Int = {
    val spark = upserts.sparkSession
    val v = committedVersions(spark, dir).lastOption.getOrElse(0) + 1
    // One evaluation of the (possibly expensive) upsert lineage feeds the
    // guards AND the write — without this, an unmaterialized input is
    // scanned once per guard action plus once for the parquet write.
    val ups = upserts.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      require(ups.groupBy(col(idCol)).count().filter(col("count") > 1).isEmpty,
        s"commit v$v: duplicate $idCol within one upsert batch")
      tombstoneIds.foreach { t =>
        require(t.join(ups.select(col(idCol)), Seq(idCol), "left_semi").isEmpty,
          s"commit v$v: an id is both upserted and deleted in the same commit")
      }
      // Write the explicit `v=N` directory rather than partitionBy: an
      // EMPTY batch (a delete-only CDC micro-batch, say) then still lands
      // one zero-row parquet file carrying the payload SCHEMA — a
      // partitioned write of zero rows emits no files at all, and a store
      // whose first commit was delete-only would crash every readAsOf on
      // parquet schema inference. Partition discovery supplies `v` from
      // the directory name either way.
      ups.write.mode("errorifexists").parquet(s"$dir/upserts/v=$v")
      tombstoneIds.foreach(_.select(col(idCol))
        .write.mode("errorifexists").parquet(s"$dir/tombstones/v=$v"))
      // Marker LAST: this create is the commit point.
      fs(spark, dir).create(new Path(s"$dir/_commits/$v"), true).close()
      v
    } finally ups.unpersist()
  }

  /** Compactions present, ascending (marker-gated like commits). */
  def compactedVersions(spark: SparkSession, dir: String): Seq[Int] = {
    val p = new Path(s"$dir/_compactions")
    val f = fs(spark, dir)
    if (!f.exists(p)) Seq.empty
    else f.listStatus(p).map(_.getPath.getName.toInt).sorted.toSeq
  }

  /** CHECKPOINT the fold (the production read-path optimization — Delta
    * checkpoint / Iceberg snapshot rewrite): materialize `readAsOf(upTo)`
    * once under `dir/compactions/c=upTo`; from then on, reads at or past
    * `upTo` start from the checkpoint and fold only the NEWER commits, so
    * read cost is O(checkpoint + commits since), not O(all commits ever).
    * Rows keep their original `v`, so later tombstones still adjudicate
    * against them correctly. Marker-last, same torn-write story as
    * commits; the log is untouched, so pre-checkpoint time travel keeps
    * working. */
  def compact(spark: SparkSession, dir: String, idCol: String,
              upTo: Int): Unit = {
    require(committedVersions(spark, dir).contains(upTo),
      s"compact($upTo): not a committed version")
    readAsOf(spark, dir, idCol, upTo)
      .write.mode("overwrite").parquet(s"$dir/compactions/c=$upTo")
    fs(spark, dir).create(new Path(s"$dir/_compactions/$upTo"), true).close()
  }

  /** The table as of version `asOf` (inclusive). Output schema = the
    * upsert payload plus `v`, each surviving row's version. Starts from
    * the newest compaction ≤ `asOf` when one exists; the partition
    * filters on `v` then exclude every pre-checkpoint file at the scan. */
  def readAsOf(spark: SparkSession, dir: String, idCol: String,
               asOf: Int): DataFrame = {
    val committed = committedVersions(spark, dir)
    require(committed.nonEmpty && asOf >= committed.head,
      s"readAsOf($asOf): no committed version at or before it in $dir")
    // Trust the manifest, not the directory listing: cap the fold at the
    // newest MARKED version ≤ asOf so a torn (unmarked) write never leaks.
    val cap = committed.filter(_ <= asOf).max
    // floor = newest usable checkpoint (its rows already resolve every
    // operation ≤ floor); 0 = fold the full log.
    val floor = compactedVersions(spark, dir).filter(_ <= cap)
      .lastOption.getOrElse(0)
    val live = spark.read.parquet(s"$dir/upserts")
      .filter(col("v") > floor && col("v") <= cap)
    val up = if (floor == 0) live
      else spark.read.parquet(s"$dir/compactions/c=$floor")
        .unionByName(live)
    val lastUp = graft.plans.TopK.perKey(
      up, keyCols = Seq(idCol), orderBy = Seq("v" -> false), k = 1)
    val delDir = s"$dir/tombstones"
    if (!fs(spark, dir).exists(new Path(delDir))) lastUp
    else {
      // Tombstones ≤ floor are already resolved inside the checkpoint.
      val del = spark.read.parquet(delDir)
        .filter(col("v") > floor && col("v") <= cap)
        .groupBy(col(idCol)).agg(max(col("v")).as("_del_v"))
      lastUp.join(del, Seq(idCol), "left")
        .filter(col("_del_v").isNull || col("v") > col("_del_v"))
        .drop("_del_v")
    }
  }
}
