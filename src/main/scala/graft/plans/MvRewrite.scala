package graft.plans

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, Join, JoinHint, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.LongType

/** A registered rollup MATERIALIZED VIEW: a parquet table holding, per
  * `groupCols` grain of the fact at `factPath`, re-aggregable partial
  * state — `SUM` columns, a `COUNT(*)` column, and optional `MIN`/`MAX`
  * columns. Because sum/count/min/max are all associative, ANY aggregate
  * over a grouping SUBSET of the grain (including the empty/global
  * grouping) can be answered by RE-aggregating the MV instead of the
  * fact — the classic rollup-MV rewrite (Gupta & Mumick, "Maintenance of
  * Materialized Views", and every warehouse engine since).
  *
  * CONTRACT: the registrant guarantees each MV column really is the
  * declared aggregate of the fact at registration time — `sums(k)` holds
  * `SUM(expr)` where queries write `sum(expr)` with `expr` an attribute
  * `k` or a cast of it (the engine's exact-decimal discipline means the
  * cast is part of the column's one canonical aggregation form). The
  * rewrite preserves result TYPES by casting each re-aggregation back to
  * the original aggregate's dataType (one decimal-widening round-trip —
  * exact for the engine's DECIMAL(38,·) headroom discipline).
  */
/** A KEY-PRESERVING dimension of a registered fact (the star-schema
  * rewrite's contract, declared by the registrant like the `sums`
  * contract): the fact's `factKey` column — which MUST be part of the
  * MV grain — joins the dimension at `dimPath` on its UNIQUE key
  * `dimKey`, and every fact row has exactly ONE match (FK with
  * referential integrity). Under that contract an inner fact⋈dim join
  * neither duplicates nor drops fact rows, so any aggregate over the
  * join folds onto the MV joined to the SAME dimension: a dim predicate
  * selects whole factKey-groups, and factKey ∈ grain means those groups
  * are whole MV rows. */
case class MvDim(dimPath: String, factKey: String, dimKey: String)

case class MvDef(
    name: String,
    factPath: String,
    mvPath: String,
    groupCols: Seq[String],
    sums: Map[String, String],
    countCol: Option[String],
    mins: Map[String, String] = Map.empty,
    maxs: Map[String, String] = Map.empty,
    dims: Seq[MvDim] = Seq.empty)

/** Driver-side registry of MV definitions + a cache of their analyzed
  * scan plans (one file-listing per MV, not per query). Registration is
  * idempotent — queries re-register on every invocation. */
object MvRegistry {
  private val views = new ConcurrentHashMap[String, MvDef]()
  private val plans = new ConcurrentHashMap[String, LogicalPlan]()

  def register(d: MvDef): Unit = {
    val prev = views.put(d.name, d)
    if (prev != null && prev != d) plans.remove(prev.mvPath)
  }
  def clear(): Unit = { views.clear(); plans.clear() }
  def all: Seq[MvDef] = {
    val b = Seq.newBuilder[MvDef]
    views.values().forEach(v => b += v)
    b.result()
  }

  /** Fresh-ExprId scan of the MV parquet (analyzed once per path, then
    * `newInstance()`d per use so two rewrites never share attribute ids). */
  def scan(spark: SparkSession, mvPath: String): Option[LogicalRelation] = {
    val cached = plans.computeIfAbsent(mvPath, p =>
      spark.read.parquet(p).queryExecution.analyzed)
    cached match {
      case lr: LogicalRelation => Some(lr.newInstance())
      case _ => None
    }
  }
}

/** Optimizer rewrite: `Aggregate` over a (filtered, projected) scan of a
  * registered fact table re-plans as a RE-aggregation of the fact's
  * rollup MV — the query reads `|MV|` rows instead of `|fact|` rows.
  * At 100 TB this is the difference between a dashboard query scanning
  * the corpus and scanning a few thousand pre-aggregated rows; the MV is
  * maintained incrementally (see `mv_refresh_incremental_stored`), so
  * the fact is scanned once per ingest batch, not once per query.
  *
  * Fires only when the whole query provably folds onto the MV grain:
  *  - the aggregate's child is the registered fact scan, under
  *    attribute-only `Project`s and `Filter`s whose predicates reference
  *    GRAIN columns only (a grain predicate selects whole MV groups, so
  *    it transplants onto the MV unchanged);
  *  - every grouping expression is a bare grain attribute (any SUBSET of
  *    the grain, empty = global rollup);
  *  - every aggregate call is non-DISTINCT, un-FILTERed, and one of:
  *    `sum(col)` / `sum(cast(col))` over a registered sum column
  *    (rewrites to `sum(mv.sum_col)`), `count(<literal>)` i.e. count(*)
  *    (rewrites to `coalesce(sum(mv.cnt), 0)` — the coalesce preserves
  *    COUNT's 0-on-empty while SUM yields null), `min(col)` / `max(col)`
  *    over registered min/max columns (min of per-group minima);
  *    expression trees AROUND the aggregates (casts, arithmetic) carry
  *    over verbatim.
  * Anything else — an unregistered column, count(col), avg, a distinct,
  *  a non-grain residual predicate — leaves the plan untouched: the
  * rewrite is an optimization, never a semantics gamble. Output
  * attribute ExprIds (and dataTypes, via the cast-back) are preserved,
  * so parent operators re-resolve unchanged.
  */
/** Folds aggregate calls / grain attributes of a query over the fact
  * onto the MV's stored state columns — the expression-level half of the
  * rewrite, shared by the direct and star-schema plan shapes. Returns
  * None wherever the fold is not provably exact. */
private class StateRewriter(d: MvDef, grainIds: Map[ExprId, String],
    grainMv: Map[String, AttributeReference],
    mvAttr: String => Option[AttributeReference]) {

  private def sumOf(a: Expression): AggregateExpression =
    Sum(a).toAggregateExpression()

  private def rewriteAgg(ae: AggregateExpression): Option[Expression] = {
    if (ae.isDistinct || ae.filter.isDefined) return None
    def srcName(e: Expression): Option[String] = e match {
      case a: AttributeReference => Some(a.name)
      case c: Cast => c.child match {
        case a: AttributeReference => Some(a.name)
        case _ => None
      }
      case _ => None
    }
    ae.aggregateFunction match {
      case s: Sum =>
        srcName(s.child).flatMap(d.sums.get).flatMap(mvAttr)
          .map(a => Cast(sumOf(a), ae.dataType))
      case c: Count if c.children.forall {
          case Literal(v, _) => v != null
          case _ => false
        } =>
        d.countCol.flatMap(mvAttr).map(a =>
          Coalesce(Seq(Cast(sumOf(a), LongType), Literal(0L))))
      case m: Min =>
        srcName(m.child).flatMap(d.mins.get).flatMap(mvAttr)
          .map(a => Cast(Min(a).toAggregateExpression(), ae.dataType))
      case m: Max =>
        srcName(m.child).flatMap(d.maxs.get).flatMap(mvAttr)
          .map(a => Cast(Max(a).toAggregateExpression(), ae.dataType))
      case _ => None
    }
  }

  /** Rewrite an expression tree: aggregate calls fold onto MV state,
    * grain attrs map to MV attrs, literals/casts/arithmetic carry over;
    * any OTHER attribute (non-grain fact column, dim column) blocks. */
  def rw(e: Expression): Option[Expression] = e match {
    case ae: AggregateExpression => rewriteAgg(ae)
    case a: AttributeReference =>
      grainIds.get(a.exprId).flatMap(grainMv.get)
    case leaf if leaf.children.isEmpty => Some(leaf)
    case other =>
      val kids = other.children.map(rw)
      if (kids.forall(_.isDefined)) Some(other.withNewChildren(kids.map(_.get)))
      else None
  }
}

object MvRewrite extends Rule[LogicalPlan] {
  val EnabledConf = "spark.graft.mv.rewrite.enabled"

  private def enabled: Boolean =
    SQLConf.get.getConfString(EnabledConf, "true").toBoolean

  private def normalize(p: String): String =
    new org.apache.hadoop.fs.Path(p).toUri.getPath

  /** Peel attribute-only Projects and collect Filters down to the scan. */
  private def strip(p: LogicalPlan, conds: Seq[Expression])
      : Option[(LogicalRelation, Seq[Expression])] = p match {
    case Project(pl, c) if pl.forall(_.isInstanceOf[AttributeReference]) =>
      strip(c, conds)
    case Filter(cond, c) => strip(c, conds :+ cond)
    case lr: LogicalRelation => Some((lr, conds))
    case _ => None
  }

  private def scanPaths(lr: LogicalRelation): Seq[String] = lr.relation match {
    case fs: HadoopFsRelation => fs.location.rootPaths.map(p => normalize(p.toString))
    case _ => Seq.empty
  }

  def apply(plan: LogicalPlan): LogicalPlan = {
    if (!enabled || MvRegistry.all.isEmpty) return plan
    plan.transformUp {
      case agg @ Aggregate(_, _, child, _) =>
        strip(child, Nil).flatMap { case (lr, conds) =>
          val paths = scanPaths(lr)
          // Several MVs may share a fact (different grains) — take the
          // first whose state set covers this query, not the first match.
          MvRegistry.all.filter(d => paths.contains(normalize(d.factPath)))
            .view.flatMap(d => rewrite(agg, lr, conds, d)).headOption
        }.orElse(starRewrite(agg, child)).getOrElse(agg)
    }
  }

  /** Peel attribute-only Projects / collect Filters down to a JOIN. */
  private def stripToJoin(p: LogicalPlan, conds: Seq[Expression])
      : Option[(Join, Seq[Expression])] = p match {
    case Project(pl, c) if pl.forall(_.isInstanceOf[AttributeReference]) =>
      stripToJoin(c, conds)
    case Filter(cond, c) => stripToJoin(c, conds :+ cond)
    case j: Join => Some((j, conds))
    case _ => None
  }

  /** THE STAR-SCHEMA SHAPE (round 10): `Aggregate` over
    * `fact ⋈ dim` where the join is a REGISTERED key-preserving dim
    * join ([[MvDim]]) re-plans as the same aggregate over `MV ⋈ dim` —
    * the dominant BI query reads |MV| rows plus a (broadcast-sized)
    * dimension instead of the fact. Soundness rests on the MvDim
    * contract (factKey ∈ grain; dimKey unique; referential integrity):
    * the join then neither duplicates nor drops fact rows, a dim
    * predicate selects whole factKey-groups = whole MV rows, and the
    * dim SUBPLAN (scan + its own filters/projections) transplants
    * verbatim. Eligibility beyond the direct rewrite's rules:
    *  - the join is INNER with a bare `factKey = dimKey` equality on
    *    the declared attribute pair (either orientation);
    *  - groupings are bare FACT grain attributes only — grouping by a
    *    dim column is conservatively blocked (MvRewriteSpec pins it);
    *  - filters above the join may reference fact GRAIN columns and/or
    *    dim columns (both select whole MV rows after the join);
    *    fact-side filters below the join must be grain-only as always;
    *  - aggregate calls fold onto MV state exactly as in the direct
    *    rewrite; any dim column inside the aggregate list blocks. */
  private def starRewrite(agg: Aggregate, child: LogicalPlan): Option[LogicalPlan] =
    stripToJoin(child, Nil).flatMap {
      case (Join(l, r, Inner, Some(cond), _), above) =>
        orientStar(agg, l, r, cond, above)
          .orElse(orientStar(agg, r, l, cond, above))
      case _ => None
    }

  private def orientStar(agg: Aggregate, factSide: LogicalPlan,
      dimSide: LogicalPlan, cond: Expression,
      above: Seq[Expression]): Option[LogicalPlan] =
    strip(factSide, Nil).flatMap { case (factLr, factConds) =>
      val fPaths = scanPaths(factLr)
      MvRegistry.all
        .filter(d => d.dims.nonEmpty && fPaths.contains(normalize(d.factPath)))
        .view.flatMap { d =>
          strip(dimSide, Nil).flatMap { case (dimLr, _) =>
            val dPaths = scanPaths(dimLr)
            d.dims.find(dm => dPaths.contains(normalize(dm.dimPath)))
              .flatMap(dm => rewriteStar(agg, factLr, factConds, dimSide,
                cond, above, d, dm))
          }
        }.headOption
    }

  private def rewriteStar(agg: Aggregate, fact: LogicalRelation,
      factConds: Seq[Expression], dimSide: LogicalPlan, cond: Expression,
      above: Seq[Expression], d: MvDef, dm: MvDim): Option[LogicalPlan] = {
    if (!d.groupCols.contains(dm.factKey)) return None // broken registration
    val grainIds: Map[ExprId, String] = fact.output
      .filter(a => d.groupCols.contains(a.name)).map(a => a.exprId -> a.name).toMap
    // The join condition must be the DECLARED key equality, bare
    // attributes only (a cast or expression around either side could
    // merge key groups — not the registered contract).
    val dimKeyAttr: Option[AttributeReference] = cond match {
      case EqualTo(a: AttributeReference, b: AttributeReference) =>
        val factKeyOk = (x: AttributeReference) =>
          grainIds.get(x.exprId).contains(dm.factKey)
        val dimKeyOk = (x: AttributeReference) =>
          x.name == dm.dimKey && dimSide.outputSet.contains(x)
        if (factKeyOk(a) && dimKeyOk(b)) Some(b)
        else if (factKeyOk(b) && dimKeyOk(a)) Some(a)
        else None
      case _ => None
    }
    if (dimKeyAttr.isEmpty) return None
    // Groupings: bare fact grain attributes only.
    val groupNames = agg.groupingExpressions.map {
      case a: AttributeReference => grainIds.get(a.exprId)
      case _ => None
    }
    if (groupNames.exists(_.isEmpty)) return None
    // Below-join fact filters: grain-only. Above-join filters: grain
    // and/or dim columns.
    if (!factConds.forall(_.references.forall(a => grainIds.contains(a.exprId))))
      return None
    if (!above.forall(_.references.forall(a =>
        grainIds.contains(a.exprId) || dimSide.outputSet.contains(a))))
      return None

    val spark = SparkSession.active
    val mv = MvRegistry.scan(spark, d.mvPath).getOrElse(return None)
    def mvAttr(name: String): Option[AttributeReference] =
      mv.output.collectFirst { case a if a.name == name => a }
    val grainMv: Map[String, AttributeReference] =
      d.groupCols.flatMap(g => mvAttr(g).map(g -> _)).toMap
    if (grainMv.size != d.groupCols.size) return None

    val rewriter = new StateRewriter(d, grainIds, grainMv, mvAttr)
    val newAggExprs: Seq[Option[NamedExpression]] = agg.aggregateExpressions.map {
      case a: AttributeReference =>
        grainIds.get(a.exprId).flatMap(grainMv.get)
          .map(m => Alias(m, a.name)(exprId = a.exprId))
      case al @ Alias(c, name) =>
        rewriter.rw(c).map(nc => Alias(nc, name)(exprId = al.exprId))
      case _ => None
    }
    if (newAggExprs.exists(_.isEmpty)) return None
    val newGroupings = groupNames.flatten.map(grainMv)
    def mapFact(e: Expression): Expression = e.transform {
      case a: AttributeReference if grainIds.contains(a.exprId) =>
        grainMv(grainIds(a.exprId))
    }
    val mvFiltered: LogicalPlan =
      if (factConds.isEmpty) mv else Filter(mapFact(factConds.reduce(And)), mv)
    val joined: LogicalPlan = Join(mvFiltered, dimSide, Inner,
      Some(EqualTo(grainMv(dm.factKey), dimKeyAttr.get)), JoinHint.NONE)
    val withAbove: LogicalPlan =
      if (above.isEmpty) joined else Filter(mapFact(above.reduce(And)), joined)
    Some(Aggregate(newGroupings, newAggExprs.map(_.get), withAbove))
  }

  private def rewrite(agg: Aggregate, fact: LogicalRelation,
      conds: Seq[Expression], d: MvDef): Option[LogicalPlan] = {
    // Grain attrs of the FACT scan, by name (engine tables are lower-case).
    val grainIds: Map[ExprId, String] = fact.output
      .filter(a => d.groupCols.contains(a.name)).map(a => a.exprId -> a.name).toMap
    // All groupings must be bare grain attributes.
    val groupNames = agg.groupingExpressions.map {
      case a: AttributeReference => grainIds.get(a.exprId)
      case _ => None
    }
    if (groupNames.exists(_.isEmpty)) return None
    // Filters may touch grain columns only.
    val condsOk = conds.forall(_.references.forall(a => grainIds.contains(a.exprId)))
    if (!condsOk) return None

    val spark = SparkSession.active
    val mv = MvRegistry.scan(spark, d.mvPath).getOrElse(return None)
    def mvAttr(name: String): Option[AttributeReference] =
      mv.output.collectFirst { case a if a.name == name => a }
    // Every grain / state column the rewrite may reference must exist in
    // the MV schema — else someone registered a stale artifact; bail out.
    val grainMv: Map[String, AttributeReference] =
      d.groupCols.flatMap(g => mvAttr(g).map(g -> _)).toMap
    if (grainMv.size != d.groupCols.size) return None

    val rewriter = new StateRewriter(d, grainIds, grainMv, mvAttr)
    val newAggExprs: Seq[Option[NamedExpression]] = agg.aggregateExpressions.map {
      case a: AttributeReference =>
        grainIds.get(a.exprId).flatMap(grainMv.get)
          .map(m => Alias(m, a.name)(exprId = a.exprId))
      case al @ Alias(c, name) =>
        rewriter.rw(c).map(nc => Alias(nc, name)(exprId = al.exprId))
      case _ => None
    }
    if (newAggExprs.exists(_.isEmpty)) return None
    val newGroupings = groupNames.flatten.map(grainMv)
    val newChild: LogicalPlan =
      if (conds.isEmpty) mv
      else Filter(conds.reduce(And).transform {
        case a: AttributeReference => grainMv(grainIds(a.exprId))
      }, mv)
    Some(Aggregate(newGroupings, newAggExprs.map(_.get), newChild))
  }
}
