package graft.util

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Two-phase salted aggregation — the standard hot-key mitigation when one
  * group key holds a disproportionate share of rows (AQE skew-join
  * handling covers joins; for aggregations the fix is manual salting).
  *
  * Phase 1 groups by (key, salt) — the hot key's rows spread over
  * `numSalts` reducers — phase 2 re-aggregates the partial results by key
  * alone (tiny input: `numSalts` rows per key). Correct for any algebraic
  * aggregate supplied as (partial, merge) pairs; results are identical to
  * the direct `groupBy(key)` (ScalaTest-checked and, used in
  * `yf_salted_month_agg`, DuckDB-oracle-checked against the unsalted
  * oracle SQL).
  *
  * The salt is `pmod(hash(distributor), numSalts)` over a high-cardinality
  * column so it is deterministic (re-runs and stage retries see the same
  * salt — a `rand()` salt breaks exactly-once recomputation semantics).
  */
object Salt {

  /** `agg`: (partialExpr, mergeOfPartial) per output column, e.g.
    * `(sum(c).as("s"), sum(col("s")).as("s"))`. */
  def saltedAgg(df: DataFrame, keys: Seq[String], distributor: Column,
                numSalts: Int, agg: Seq[(Column, Column)]): DataFrame = {
    val salted = df.withColumn("_salt", pmod(hash(distributor), lit(numSalts)))
    val partial = salted
      .groupBy((keys.map(col) :+ col("_salt")): _*)
      .agg(agg.head._1, agg.tail.map(_._1): _*)
    partial
      .groupBy(keys.map(col): _*)
      .agg(agg.head._2, agg.tail.map(_._2): _*)
  }
}
