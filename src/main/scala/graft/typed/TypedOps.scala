package graft.typed

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** The TYPED Dataset surface: case-class rows + a typed [[Aggregator]]
  * driven through `KeyValueGroupedDataset.agg` — the compile-time-safe
  * API tier beside the engine's untyped `DataFrame` queries and native
  * `TypedImperativeAggregate`s.
  *
  * The reference works throughout in dynamically-typed rows (pandas
  * inference, `idx_transform.py:294-310`; connector sampling,
  * `yfinance_transform.py:113-115`); Spark's `Dataset[T]` is the
  * strict-upgrade alternative where the schema is known at build time:
  * field access is checked by scalac, not discovered at runtime.
  *
  * Scale note: a typed Aggregator's merge tree is the same partial/final
  * two-phase as any declarative aggregate (map-side combine applies),
  * but each input row pays an InternalRow→case-class deserialization
  * that whole-stage-codegen'd `sum`/`count` never pay. The house rule
  * stands — untyped codegen'd aggregates in hot paths; the typed tier
  * is for logic that profits from compile-time checking. Both faces are
  * exposed so the contract (exact integer sums ⇒ engine-identical
  * averages) is provable across them: `yf_typed_agg` hash-matches the
  * same oracle an untyped twin would.
  */
object TypedOps {

  /** One OHLCV bar reduced to the typed-aggregation demo's fields:
    * symbol key + the 1e-4-quantized close (quantized BEFORE entering
    * the aggregate, so every sum below is exact integer arithmetic). */
  case class BarQ(symbol: Long, closeQ4: Long)

  /** (count, exact q4 sum) — the summation-order-free state. */
  case class CloseState(n: Long, sumQ4: Long)

  /** Exact per-key close statistics as a typed Aggregator: the zero /
    * reduce / merge algebra is associative-commutative on exact longs,
    * so any partitioning and any merge order yields the same state —
    * the same discipline as the engine's Stable.exactSum, expressed in
    * the typed API. */
  object ExactCloseStats extends Aggregator[BarQ, CloseState, CloseState] {
    override def zero: CloseState = CloseState(0L, 0L)
    override def reduce(b: CloseState, a: BarQ): CloseState =
      CloseState(b.n + 1L, b.sumQ4 + a.closeQ4)
    override def merge(b1: CloseState, b2: CloseState): CloseState =
      CloseState(b1.n + b2.n, b1.sumQ4 + b2.sumQ4)
    override def finish(r: CloseState): CloseState = r
    override def bufferEncoder: Encoder[CloseState] = Encoders.product[CloseState]
    override def outputEncoder: Encoder[CloseState] = Encoders.product[CloseState]
  }
}
