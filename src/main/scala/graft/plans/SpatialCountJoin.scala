package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference, AttributeSet, Coalesce, Expression, Literal, NamedExpression, PredicateHelper}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count, Sum}
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, BinaryNode, BROADCAST, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.LongType

/** `COUNT(*) GROUP BY build-side keys` over a broadcast spatial join,
  * with the count folded into the probe loop.
  *
  * A spatial join whose parent is an immediate `COUNT(*)` aggregate on
  * build-side keys (g15's shape: points-in-zones histogram) otherwise
  * materializes every matched pair only to count it — at high match fan-out
  * the UnsafeRow writes dominate the query. Folding the count into the
  * probe path emits one `(build row, count)` pair per build row per
  * partition: the aggregate above sees `partitions × |build|` rows instead
  * of `|matches|`, and no per-match row is ever constructed. At 100 TB the
  * match count grows with the data but the folded output stays bounded by
  * `partitions × |broadcast side|`.
  *
  * [[SpatialCountFoldRule]] rewrites the logical plan
  * (`Aggregate(count(*)) → Aggregate(sum(cnt))` over this node);
  * [[SpatialJoinStrategy]] plans it as [[SpatialJoinFoldExec]].
  */
case class SpatialCountJoin(
    left: LogicalPlan, right: LogicalPlan,
    leftGeom: Expression, rightGeom: Expression,
    predicate: String, radius: Double,
    buildRight: Boolean,
    groupOutput: Seq[Attribute],
    cntAttr: Attribute) extends BinaryNode {

  override def output: Seq[Attribute] = groupOutput :+ cntAttr

  // cntAttr is created by this node, not read from a child
  override def producedAttributes: AttributeSet = AttributeSet(cntAttr)

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): SpatialCountJoin =
    copy(left = newLeft, right = newRight)
}

/** Rewrites `Aggregate(groupBy build keys, COUNT(*)-only aggs,
  * [Project] Join(ON one ST_* predicate))` into
  * `Aggregate(groupBy, SUM(cnt), SpatialCountJoin)`.
  *
  * Fires only when the whole aggregate reads nothing from the probe side
  * (grouping and aggregates reference build-side columns only — the probe
  * side exists purely to be counted) and the build side qualifies for
  * broadcast (size under `autoBroadcastJoinThreshold`, or an explicit
  * broadcast hint). Runs in `experimental.extraOptimizations` (after the
  * main optimizer batches, so pruning Projects are already in place).
  */
object SpatialCountFoldRule extends Rule[LogicalPlan] with PredicateHelper {

  /** Count of a non-null literal (COUNT(*) / COUNT(1)), plain, no DISTINCT,
    * no FILTER. */
  private def isCountStar(ae: AggregateExpression): Boolean = ae match {
    case AggregateExpression(Count(Seq(l: Literal)), _, false, None, _) => l.value != null
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case agg @ Aggregate(groupExprs, aggExprs, child, _) =>
      rewrite(agg, groupExprs, aggExprs, child).getOrElse(agg)
  }

  private def rewrite(agg: Aggregate, groupExprs: Seq[Expression],
                      aggExprs: Seq[NamedExpression],
                      child: LogicalPlan): Option[LogicalPlan] = {
    // unwrap a pruning Project (attributes only — anything computed between
    // the join and the aggregate disqualifies the fold)
    val join = child match {
      case j @ Join(_, _, Inner, Some(_), _) => j
      case Project(pl, j @ Join(_, _, Inner, Some(_), _))
          if pl.forall(_.isInstanceOf[Attribute]) => j
      case _ => return None
    }
    val Join(left, right, _, Some(cond), hint) = join: @unchecked

    // exactly one conjunct, and it must be a supported spatial predicate
    // (a residual conjunct would filter matched rows after the fold already
    // counted them)
    val conjuncts = splitConjunctivePredicates(cond)
    if (conjuncts.length != 1) return None
    val (lg, rg, pred, radius) =
      SpatialJoinStrategy.extract(conjuncts.head, left, right) match {
        // exact only: the fold counts matches inside the exec, so an
        // inexact (strict-<) extraction's residual would come too late
        case Some((a, b, p, r, true)) => (a, b, p, r)
        case _ => return None
      }

    // every aggregate function must be COUNT(*); everything else the
    // aggregate computes must read build-side columns only
    val aggFns = aggExprs.flatMap(_.collect { case ae: AggregateExpression => ae })
    if (aggFns.isEmpty || !aggFns.forall(isCountStar)) return None
    val neededRefs = AttributeSet(groupExprs.flatMap(_.references)) ++
      AttributeSet(aggExprs.flatMap(_.references))

    // the build side must carry every referenced column and fit a broadcast
    val threshold = SQLConf.get.autoBroadcastJoinThreshold
    def qualifies(side: LogicalPlan, hinted: Boolean): Boolean =
      hinted || (threshold > 0 && side.stats.sizeInBytes <= threshold)
    val hintLeft = hint.leftHint.exists(_.strategy.contains(BROADCAST))
    val hintRight = hint.rightHint.exists(_.strategy.contains(BROADCAST))
    val buildRight =
      if (neededRefs.subsetOf(right.outputSet) && qualifies(right, hintRight)) true
      else if (neededRefs.subsetOf(left.outputSet) && qualifies(left, hintLeft)) false
      else return None

    val buildSide = if (buildRight) right else left
    val groupOutput = buildSide.output.filter(neededRefs.contains)
    val cnt = AttributeReference("__match_cnt", LongType, nullable = false)()
    val folded = SpatialCountJoin(left, right, lg, rg, pred, radius,
      buildRight, groupOutput, cnt)

    // COUNT(*) over matches ≡ SUM(cnt) over folded rows. COALESCE keeps the
    // output attribute non-nullable (Sum is nullable, Count was not), so
    // parents referencing the alias by exprId see an unchanged schema. A
    // top-level count is always analyzer-wrapped in an Alias, and transform
    // preserves the Alias (and its exprId) around the replaced child.
    val newAggExprs = aggExprs.map(_.transformUp {
      case ae: AggregateExpression if isCountStar(ae) =>
        Coalesce(Seq(ae.copy(aggregateFunction = Sum(cnt)), Literal(0L)))
    }.asInstanceOf[NamedExpression])
    Some(agg.copy(aggregateExpressions = newAggExprs, child = folded))
  }
}
