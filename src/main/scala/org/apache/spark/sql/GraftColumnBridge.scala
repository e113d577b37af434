package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into Spark's `private[sql]` Column↔Expression converters so the
  * engine can expose native Catalyst expressions (e.g.
  * `graft.functions.WordShingles`) as ordinary `Column`s. Same technique
  * used by public Spark-ecosystem libraries that ship custom expressions
  * (a one-file shim in the `org.apache.spark.sql` package). */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** `Dataset.ofRows` for engine-defined logical nodes (e.g.
    * [[graft.plans.TopKPerKeyPlan]]) — the converter is `private[sql]`,
    * same-package shim like the two above. */
  def ofRows(spark: SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Lineage-truncated view of `df`: a DataFrame whose plan is a flat
    * scan of `df`'s physical RDD. For iterative algorithms this stops
    * Catalyst re-analyzing a per-round-deepening plan, while — unlike
    * `localCheckpoint` — the storage stays the caller's `persist`ed
    * cache, freeable deterministically with `unpersist` (checkpoint
    * blocks are only released when the RDD is GC'd). */
  def lineageTruncated(df: DataFrame): DataFrame =
    df.sparkSession.asInstanceOf[classic.SparkSession]
      .internalCreateDataFrame(df.queryExecution.toRdd, df.schema)
}
