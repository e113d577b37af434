package graft.util

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed EXACT global rank and ntile — the rank-free replacement
  * for an unpartitioned `row_number`/`ntile` window over a
  * corpus-growing grain (the shape PlanLintSpec polices: a global
  * window is a single-partition sort of the whole frame at 100 TB).
  *
  * Two-phase, the same decomposition `RDD.zipWithIndex` uses:
  *
  *  1. range-repartition on the sort key and sort WITHIN partitions —
  *     a distributed sort: every partition holds a contiguous key range
  *     and no stage ever sees more than one partition's rows;
  *  2. assign each row its within-partition sequence
  *     (`monotonically_increasing_id` AFTER the sort: ids are issued in
  *     partition-local row order, so `id & (2^33−1)` IS the local
  *     sequence and partition id rides in the high bits), count rows
  *     per partition (≤ P rows — bounded by cluster parallelism, not
  *     data), collect that tiny table, and broadcast-join the cumulative
  *     offsets back: rank = offset(pid) + local_seq + 1.
  *
  * The sort key MUST be a total order (callers append a unique
  * tiebreaker, as the ntile queries already do) — equal keys spanning a
  * range boundary would otherwise mis-rank. Output equals the global
  * window bit-for-bit, so the `_scaled` twins share their unscaled
  * queries' oracles.
  */
object Ranks {

  private val SeqMask = (1L << 33) - 1

  /** `df` plus `rankName` = the 1-based global rank under `cols`
    * (ascending/descending as given; must form a total order). Also
    * returns the total row count, already paid for by the offset pass. */
  def withGlobalRankCounted(df: DataFrame, rankName: String,
                            cols: Column*): (DataFrame, Long) = {
    val p = df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    val seq = Views.materialize(
      df.repartitionByRange(p, cols: _*)
        .sortWithinPartitions(cols: _*)
        .withColumn("__mid", monotonically_increasing_id())
        .withColumn("__pid", shiftright(col("__mid"), 33))
        .withColumn("__seq", col("__mid").bitwiseAND(lit(SeqMask))))
    // ≤ P rows: the per-partition histogram every two-phase indexer
    // collects (RDD.zipWithIndex does exactly this); NOT data-sized.
    val counts = seq.groupBy("__pid").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1)
    // monotonically_increasing_id gives each partition a 33-bit record
    // space; a partition beyond 2^33 rows would bleed into the
    // partition-id bits and silently mis-rank. The histogram is already
    // here — fail loudly instead (re-partition wider to fix). The bound
    // is EXACTLY 2^33 rows: the max record number of a 2^33-row
    // partition is 2^33−1 = SeqMask, which still fits the record field.
    require(counts.forall(_._2 <= SeqMask + 1),
      s"withGlobalRank: a partition exceeds 2^33 rows and would overflow " +
        s"monotonically_increasing_id's per-partition space — increase " +
        s"the range-partition width (got ${counts.map(_._2).max} rows)")
    val offsets = counts.scanLeft((-1L, 0L)) {
      case ((_, acc), (pid, n)) => (pid, acc + n)
    }.init.zip(counts).map { case ((_, off), (pid, _)) => (pid, off) }
    val offDf = broadcast(
      df.sparkSession.createDataFrame(offsets.toSeq).toDF("__pid", "__off"))
    val ranked = seq.join(offDf, "__pid")
      .withColumn(rankName, col("__off") + col("__seq") + lit(1L))
      .drop("__mid", "__pid", "__seq", "__off")
    (ranked, counts.map(_._2).sum)
  }

  def withGlobalRank(df: DataFrame, rankName: String, cols: Column*): DataFrame =
    withGlobalRankCounted(df, rankName, cols: _*)._1

  /** Spark's exact `ntile(k)` bucket of a 1-based rank over `n` rows:
    * base = n/k rows per bucket, the first n%k buckets take one extra.
    * Matches `ntile` bit-for-bit so `_scaled` twins reuse the unscaled
    * oracle. */
  def ntileOfRank(rank: Column, n: Long, k: Int): Column = {
    val base = n / k
    val r = n % k
    val cut = r * (base + 1)
    when(rank <= cut, floor((rank - 1) / (base + 1)) + 1)
      .otherwise(lit(r) + floor((rank - cut - 1) / math.max(base, 1)) + 1)
      .cast("int")
  }

  /** `df` plus `out` = the exact `ntile(k)` bucket under `cols` —
    * [[withGlobalRankCounted]] + [[ntileOfRank]], rank dropped. */
  def ntileExact(df: DataFrame, out: String, k: Int, cols: Column*): DataFrame = {
    val (ranked, n) = withGlobalRankCounted(df, "__rank", cols: _*)
    ranked.withColumn(out, ntileOfRank(col("__rank"), n, k)).drop("__rank")
  }

  /** `df` plus `out` = the exact RUNNING SUM of `value` in `cols` order
    * (inclusive of the current row) — the distributed prefix sum behind
    * cumulative-share readouts (ABC/Pareto cuts): range-repartition on
    * the total-order key, a PARTITIONED window for the within-partition
    * running sum (bounded width by construction — PlanLint-clean), and
    * per-partition base offsets from a ≤P-row totals table (offsets
    * derived by a tiny triangular self-join, so exact-decimal arithmetic
    * never leaves the engine). Addition is exact and associative for
    * decimal/integer `value`s, so the result equals the global-window
    * running sum bit-for-bit; for IEEE doubles use a quantized value
    * first (the summation-order discipline). */
  def withGlobalPrefixSum(df: DataFrame, out: String, value: Column,
                          cols: Column*): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val p = df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    val part = Views.materialize(
      df.repartitionByRange(p, cols: _*)
        .withColumn("__pid", spark_partition_id()))
    val totals = part.groupBy("__pid").agg(sum(value).as("__t"))
    val off = totals.as("a")
      .join(totals.as("b"), col("b.__pid") < col("a.__pid"), "left")
      .groupBy(col("a.__pid").as("__pid"))
      .agg(sum(col("b.__t")).as("__off")) // null when no earlier partition
    val w = Window.partitionBy("__pid").orderBy(cols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    part.join(broadcast(off), "__pid")
      .withColumn(out,
        sum(value).over(w) + coalesce(col("__off"), lit(0)))
      .drop("__pid", "__off")
  }
}
