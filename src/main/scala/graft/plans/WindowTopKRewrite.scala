package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Window}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.IntegerType

/** Optimizer rewrite: the ubiquitous
  * `... row_number() OVER (PARTITION BY p ORDER BY o) AS rn ... WHERE rn <= k`
  * pattern re-plans through [[TopKPerKeyPlan]] — users keep writing the
  * window form, the engine executes bounded per-key heaps (≤ k rows per
  * key per map task reach the exchange, no per-key sort) instead of
  * shuffling and sorting every row.
  *
  * The rewrite only SHRINKS the window's input:
  * {{{ Filter(cond, Window(rn, child)) → Filter(cond, Window(rn, TopKPerKey(child))) }}}
  * Per key, TopKPerKey keeps exactly the rows row_number would rank
  * 1..k (modulo ties beyond the declared order — on which row_number is
  * itself non-deterministic), so re-ranking the survivors reproduces
  * their rank values and BOTH the original filter and any other
  * conjunct evaluate unchanged; rows with rank > k could only have
  * failed the `rn <= k` conjunct. Keeping the original Filter + Window
  * on top makes the rewrite trivially semantics-preserving — their
  * remaining cost is k rows per key.
  *
  * Fires only when: the window computes EXACTLY one expression and it is
  * `row_number()`; the partition spec is non-empty (global top-k already
  * has TakeOrderedAndProject) and deterministic; some TOP-LEVEL conjunct
  * bounds rn by an integer literal (`rn <= k`, `rn < k`, `rn = 1`, or
  * the reversed forms) — a disjunction like `rn <= k OR x` must NOT
  * prune; and k ≤ `spark.graft.topk.rewriteMaxK` (heaps hold k rows per
  * key per partition — a giant k wants the sort-based window after all).
  * Idempotence inside the optimizer's fixed-point batch: skip when the
  * window's child is already the operator.
  */
object WindowTopKRewrite extends Rule[LogicalPlan] {
  val EnabledConf = "spark.graft.topk.rewrite.enabled"
  val MaxKConf = "spark.graft.topk.rewriteMaxK"
  val DefaultMaxK = 10000

  private def enabled: Boolean =
    SQLConf.get.getConfString(EnabledConf, "true").toBoolean
  private def maxK: Int =
    SQLConf.get.getConfString(MaxKConf, DefaultMaxK.toString).toInt

  /** k such that `c` ⇒ rn ≤ k, for the rn attribute only. */
  private def rnBound(c: Expression, rn: ExprId): Option[Int] = c match {
    case LessThanOrEqual(a: AttributeReference, Literal(k: Int, IntegerType))
      if a.exprId == rn => Some(k)
    case LessThan(a: AttributeReference, Literal(k: Int, IntegerType))
      if a.exprId == rn => Some(k - 1)
    case EqualTo(a: AttributeReference, Literal(k: Int, IntegerType))
      if a.exprId == rn => Some(k)
    case GreaterThanOrEqual(Literal(k: Int, IntegerType), a: AttributeReference)
      if a.exprId == rn => Some(k)
    case GreaterThan(Literal(k: Int, IntegerType), a: AttributeReference)
      if a.exprId == rn => Some(k - 1)
    case _ => None
  }

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case other => Seq(other)
  }

  def apply(plan: LogicalPlan): LogicalPlan = {
    if (!enabled) return plan
    plan.transformUp {
      case f @ Filter(cond, w @ Window(
          Seq(al @ Alias(WindowExpression(RowNumber(), spec), _)),
          parts, order, child, _))
          if parts.nonEmpty && parts.forall(_.deterministic) &&
            order.forall(_.deterministic) &&
            !child.isInstanceOf[TopKPerKeyPlan] =>
        val ks = conjuncts(cond).flatMap(rnBound(_, al.exprId))
        ks.reduceOption(math.min) match {
          case Some(k) if k >= 1 && k <= maxK =>
            f.copy(child = w.copy(child = TopKPerKeyPlan(parts, order, k, child)))
          case Some(_) =>
            // k < 1 ⇒ the filter keeps nothing; k > maxK ⇒ keep the
            // sort-based window. Either way, leave the plan alone.
            f
          case None => f
        }
    }
  }
}
