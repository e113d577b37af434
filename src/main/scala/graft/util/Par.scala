package graft.util

import org.apache.spark.sql.{Column, DataFrame}

/** Scan-width guard for heavy per-row derivations (round 13).
  *
  * A parquet scan's task count comes from file splits
  * (`spark.sql.files.maxPartitionBytes`), and a single small file is ONE
  * task regardless of session cores — parquet cannot split below a row
  * group. Any expensive per-row expression chain applied before the
  * first exchange then runs on one core (measured at sf0.1 / local[32]:
  * every fixture table is one <11 MB parquet file, so e.g. the
  * 32-replica Poisson bootstrap's 3.2 M md5+conv evaluations ran
  * single-threaded while 31 cores idled).
  *
  * [[widen]] hash-clusters the frame by a DETERMINISTIC key — never
  * round-robin, whose retry semantics need a sort (SPARK-23207) and
  * whose placement would differ run-to-run — and ONLY when the frame's
  * planned parallelism is below the session's cores. At real corpus
  * scale, where a scan is already thousands of splits, the guard makes
  * it a no-op: no shuffle is added to the 100 TB plan. Callers project
  * to the needed columns FIRST (guide §2.3: shuffle the narrow rows,
  * not the wide scan).
  */
object Par {
  def widen(df: DataFrame, key: Column): DataFrame = {
    val cores = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < cores) df.repartition(key) else df
  }
}
