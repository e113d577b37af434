package graft.util

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Shared-view materialization for multi-consumer plans (self-joins,
  * candidate sets).
  *
  * A bare `.persist()` is lazy: the cache fills as partitions are first
  * computed. When TWO consumers of the cached view land in independent
  * query stages (every self-join does, and AQE submits independent stages
  * concurrently), both race to compute the same uncached partitions —
  * the work runs twice and one result is dropped ("Block already exists"
  * / "Asked to cache already cached data" warnings). Measured at
  * local[32] this doubled the dedup pipeline's cost; more cores = more
  * concurrent duplication.
  *
  * [[materialize]] persists and then forces the computation with one
  * cheap `count()` action, so every later consumer — both sides of a
  * self-join included — reads the cache. This is the standard
  * materialize-the-exploded-view step of a shingle join at cluster
  * scale: one pass writes the view, N stages read it.
  */
object Views {
  def materialize(df: DataFrame): DataFrame = materializeCounted(df)._1

  /** [[materialize]], also returning the row count the forcing action
    * already paid for — callers sizing later stages off the view's
    * cardinality (e.g. a loop's shuffle width) get it for free. */
  def materializeCounted(df: DataFrame): (DataFrame, Long) = {
    val p = df.persist(StorageLevel.MEMORY_AND_DISK)
    val n = p.count()
    (p, n)
  }
}
