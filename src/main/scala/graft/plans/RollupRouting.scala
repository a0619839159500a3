package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.types.LongType

import graft.ops.Rollup

/** Optimizer rule: answer an exact-match aggregation over a registered
  * base table from its saved [[Rollup]] instead of the base scan — the
  * narrow, provably-exact core of materialized-view matching.
  *
  * A plan routes when ALL of:
  *   - it is `Aggregate(groupings, results, child)` with `child` a
  *     chain of attribute-only Projects and deterministic Filters over
  *     ONE parquet [[LogicalRelation]] whose root paths are registered;
  *   - every grouping is a plain attribute naming a rollup dim;
  *   - every Filter condition references dims only;
  *   - every aggregate call is non-DISTINCT, FILTER-free, and one of:
  *     COUNT(*)/COUNT(1) -> re-sum of the stored group counts;
  *     COUNT(col) -> re-sum of the stored non-null counts (dims: a
  *     null-guarded re-sum of the group counts); SUM(measure) -> re-sum
  *     of partial sums (cast back when decimal widening changes the
  *     type); MIN/MAX(measure or dim) -> MIN/MAX compose.
  * Anything else — AVG (needs sum+count state the caller didn't ask us
  * to fuse), DISTINCT, expression groupings, measure-referencing
  * filters, any other function — leaves the plan untouched; routing is
  * an optimization, never a semantics change.
  *
  * Exactness notes embedded in the rewrites: COUNT never returns NULL,
  * but SUM over an EMPTY rollup (global aggregation over zero rows)
  * does — counts re-enter through `coalesce(sum(..), 0)`. Output
  * expression ids are preserved by aliasing every result to its
  * original id, so parent operators re-resolve untouched. Runs in
  * `experimental.extraOptimizations` — after pushdown/pruning have
  * settled into the Project/Filter chain this rule walks, and
  * idempotent because the rollup's own path is never a registered
  * base. */
object RollupRouting extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val session = org.apache.spark.sql.SparkSession.getActiveSession.orNull
    // building: saveRollup's own aggregation must always scan the base
    // (routing a REBUILD through the old rollup would freeze it)
    if (session == null || Rollup.building.value ||
        Rollup.isEmpty(session) || plan.isStreaming) plan
    else plan.transformUp {
      case agg: Aggregate => route(session, agg).getOrElse(agg)
    }
  }

  /** Peel attribute-only Projects and deterministic Filters down to a
    * single relation, collecting filter conditions. */
  private def strip(p: LogicalPlan, conds: Seq[Expression])
      : Option[(LogicalRelation, Seq[Expression])] = p match {
    case lr: LogicalRelation => Some((lr, conds))
    case Project(pl, child) if pl.forall(_.isInstanceOf[AttributeReference]) =>
      strip(child, conds)
    // no subquery conditions: a ScalarSubquery's plan holds its own
    // references — the dim remap cannot see inside it, so a routed
    // copy would keep base-side attrs and mis-resolve
    case Filter(cond, child) if cond.deterministic &&
        cond.collectFirst { case p: PlanExpression[_] => p }.isEmpty =>
      strip(child, conds :+ cond)
    case _ => None
  }

  private def route(session: org.apache.spark.sql.SparkSession,
      agg: Aggregate): Option[Aggregate] = for {
    (baseLr, conds) <- strip(agg.child, Nil)
    key <- Rollup.keyOf(baseLr)
    info <- Rollup.lookup(session, key)
    routed <- rewrite(session, agg, baseLr, conds, info)
  } yield routed

  private def rewrite(session: org.apache.spark.sql.SparkSession,
      agg: Aggregate, baseLr: LogicalRelation,
      conds: Seq[Expression], info: Rollup.RollupInfo)
      : Option[Aggregate] = {
    // analyzed fresh per rewrite: fresh expression ids per use, no
    // cached relation pinning the session (see RollupInfo), and a
    // fresh file listing
    val rollupLr =
      Rollup.analyzedRelation(session, s"${info.rollupPath}/data")
    val byName = rollupLr.output.map(a => a.name -> a).toMap
    val dims = info.dims.toSet
    val measures = info.measures.toSet

    // base dim attribute -> rollup dim attribute, by name; built from
    // the RELATION output (not agg.child.output) so a filter on a dim
    // the projection above it pruned away still routes
    val dimMap: Map[ExprId, Attribute] = baseLr.output.collect {
      case a if dims(a.name) && byName.contains(a.name) =>
        a.exprId -> byName(a.name)
    }.toMap

    def mapDims(e: Expression): Option[Expression] = {
      var ok = true
      val out = e.transformUp {
        case a: AttributeReference =>
          dimMap.get(a.exprId) match {
            case Some(r) => r
            case None => ok = false; a
          }
      }
      if (ok) Some(out) else None
    }

    def cnt = byName(Rollup.cntCol)
    def complete(f: AggregateFunction): Expression =
      AggregateExpression(f, Complete, isDistinct = false, None,
        NamedExpression.newExprId)
    def reSumCount(inner: Expression): Expression =
      Coalesce(Seq(complete(Sum(inner)), Literal(0L)))

    /** One original aggregate call -> its rollup-side equivalent, or
      * None when the call is outside the exact-rewrite surface. */
    def convert(ae: AggregateExpression): Option[Expression] = {
      if (ae.isDistinct || ae.filter.nonEmpty) return None
      ae.aggregateFunction match {
        // non-null literal only: count(NULL) is always 0, not count(*)
        case Count(Seq(Literal(v, _))) if v != null => Some(reSumCount(cnt))
        case Count(Seq(a: AttributeReference)) if measures(a.name) =>
          Some(reSumCount(byName(Rollup.cntColOf(a.name))))
        case Count(Seq(a: AttributeReference))
            if dims(a.name) && dimMap.contains(a.exprId) =>
          Some(reSumCount(If(IsNotNull(dimMap(a.exprId)), cnt,
            Literal(null, LongType))))
        // default eval context ONLY: try_sum resolves to Sum with a
        // TRY context (TrySumExpressionBuilder) and would otherwise
        // match here — routing it as a default-mode Sum turns its
        // NULL-on-overflow into a wrap or an ANSI throw, a semantics
        // change. Case-class equality against a freshly built default
        // Sum compares exactly the context field.
        case s0 @ Sum(a: AttributeReference, _)
            if measures(a.name) && s0 == Sum(a) =>
          val s = complete(Sum(byName(Rollup.sumCol(a.name))))
          Some(if (s.dataType == ae.dataType) s else Cast(s, ae.dataType))
        case Min(a: AttributeReference) if measures(a.name) =>
          Some(complete(Min(byName(Rollup.minCol(a.name)))))
        case Min(a: AttributeReference)
            if dims(a.name) && dimMap.contains(a.exprId) =>
          Some(complete(Min(dimMap(a.exprId))))
        case Max(a: AttributeReference) if measures(a.name) =>
          Some(complete(Max(byName(Rollup.maxCol(a.name)))))
        case Max(a: AttributeReference)
            if dims(a.name) && dimMap.contains(a.exprId) =>
          Some(complete(Max(dimMap(a.exprId))))
        case _ => None
      }
    }

    // groupings: plain dim attributes only
    val newGroupings = agg.groupingExpressions.map {
      case a: AttributeReference => dimMap.get(a.exprId)
      case _ => None
    }
    // filters: dim-only conditions, remapped onto the rollup
    val newConds = conds.map(mapDims)
    if (newGroupings.exists(_.isEmpty) || newConds.exists(_.isEmpty))
      return None

    // results: rewrite aggregate calls (their subtrees replaced
    // WHOLESALE — the measure refs inside them exist only on the base
    // side), remap dim refs outside them, and keep every output name
    // AND ExprId so the parent plan re-resolves untouched. Manual
    // top-down recursion, not transformUp/transformDown: a bottom-up
    // transform would reject sum(m)'s measure attr before reaching the
    // aggregate node, and transformDown would descend into the rewrite
    // and reject the rollup-side attrs it just produced.
    def rewriteExpr(e: Expression): Option[Expression] = e match {
      case ae: AggregateExpression => convert(ae)
      case a: AttributeReference => dimMap.get(a.exprId)
      case other =>
        val kids = other.children.map(rewriteExpr)
        if (kids.exists(_.isEmpty)) None
        else if (kids.isEmpty) Some(other)
        else Some(other.withNewChildren(kids.map(_.get)))
    }
    val newResults: Seq[Option[NamedExpression]] =
      agg.aggregateExpressions.map {
        case a: AttributeReference =>
          dimMap.get(a.exprId).map(r =>
            Alias(r, a.name)(exprId = a.exprId, qualifier = a.qualifier))
        case al @ Alias(child, name) =>
          rewriteExpr(child).map(c => Alias(c, name)(exprId = al.exprId,
            qualifier = al.qualifier,
            explicitMetadata = al.explicitMetadata))
        case _ => None
      }
    if (newResults.exists(_.isEmpty)) return None

    // explicit pruning Project: ColumnPruning already ran (this rule
    // sits in extraOptimizations), so without it the physical scan
    // reads EVERY rollup column — measured, not hypothetical: the
    // routed ReadSchema carried all stored partials of every measure
    val refs = AttributeSet(
      newGroupings.flatten.flatMap(_.references) ++
        newResults.flatten.flatMap(_.references) ++
        newConds.flatten.flatMap(_.references))
    val filtered = newConds.flatten
      .foldLeft(rollupLr: LogicalPlan)((p, c) => Filter(c, p))
    val pruned = Project(rollupLr.output.filter(refs.contains), filtered)
    Some(Aggregate(newGroupings.flatten, newResults.flatten, pruned))
  }
}
