package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Window}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy}

/** Optimizer rule: rewrite `row_number()/rank()/dense_rank() OVER
  * (ORDER BY ...)` — an EMPTY partition spec — into [[GlobalRankPlan]],
  * so plain SQL/DataFrame users get the range-partitioned offset-pass
  * plan instead of Spark's single-partition `WindowExec` sort (VERDICT
  * r9 #1; the automatic counterpart of `stats/GlobalRank`, following
  * the [[RangeJoinRule]] auto-rewrite precedent).
  *
  * ON by default in sessions built with
  * `spark.sql.extensions=graft.GraftExtensions`; disable per session or
  * per query with `spark.graft.globalRank.rewrite=false` (the conf is
  * read at optimization time, so toggling affects the next plan).
  *
  * Scope — a Window node is rewritten only when ALL of:
  *   - its partition spec is empty and its order spec is not;
  *   - every window expression is row_number / rank / dense_rank /
  *     ntile(k) / percent_rank — all pure functions of the global
  *     position, tie run, and total count the two-pass plan computes
  *     (any other function — running sums, lag, cume_dist — keeps the
  *     Window node untouched: their semantics need the frame, and a
  *     mixed node must stay one node to compute consistently);
  *   - it is NOT directly under a rank-limit filter (`rn <= k` etc.):
  *     that shape belongs to Spark's `InferWindowGroupLimit` top-k
  *     path, which prunes to k rows per map partition BEFORE the final
  *     sort — better than ranking everything. Rank-RANGE predicates
  *     (`rn > 100 AND rn <= 120`) contain a limit-like conjunct too
  *     (`rn <= 120`), so they also stay with the group-limit path,
  *     which handles them with the same map-side prune at `hi`.
  *
  * Identity: the rewrite is exact — same values, same `IntegerType`,
  * same exprIds — for ANY input, including non-total orders (ties get
  * an arbitrary-but-valid row_number either way; rank/dense_rank are
  * deterministic under ties by construction). Idempotent: the rewrite
  * produces no Window node, so it cannot match twice.
  */
case class GlobalRankRule(session: SparkSession) extends Rule[LogicalPlan]
    with PredicateHelper {

  import GlobalRankRule.RewriteConf

  private def kindOf(fn: Expression): Option[RankKind] = fn match {
    case _: RowNumber => Some(RankKind.RowNumber)
    case _: Rank => Some(RankKind.Rank)
    case _: DenseRank => Some(RankKind.DenseRank)
    case NTile(Literal(k: Int, _)) if k > 0 => Some(RankKind.Ntile(k))
    case _: PercentRank => Some(RankKind.PercentRank)
    case _ => None
  }

  /** A conjunct that bounds the rank attr above (the shapes
    * `InferWindowGroupLimit` accepts): `rn < k`, `rn <= k`, `rn = k`.
    */
  private def hasRankLimit(cond: Expression, rankAttrs: AttributeSet): Boolean =
    splitConjunctivePredicates(cond).exists {
      case LessThan(a: Attribute, _: Literal) => rankAttrs.contains(a)
      case LessThanOrEqual(a: Attribute, _: Literal) => rankAttrs.contains(a)
      case EqualTo(a: Attribute, _: Literal) => rankAttrs.contains(a)
      case EqualTo(_: Literal, a: Attribute) => rankAttrs.contains(a)
      case GreaterThan(_: Literal, a: Attribute) => rankAttrs.contains(a)
      case GreaterThanOrEqual(_: Literal, a: Attribute) => rankAttrs.contains(a)
      case _ => false
    }

  private def rewritable(w: Window): Boolean =
    w.partitionSpec.isEmpty && w.orderSpec.nonEmpty &&
      w.windowExpressions.nonEmpty &&
      w.windowExpressions.forall {
        case Alias(WindowExpression(fn, _), _) => kindOf(fn).isDefined
        case _ => false
      }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (session.conf.get(RewriteConf, "true") != "true") return plan
    // leave top-k shapes to InferWindowGroupLimit (see scaladoc): collect
    // the Window nodes sitting directly under a rank-limit Filter
    val keep = java.util.Collections.newSetFromMap(
      new java.util.IdentityHashMap[Window, java.lang.Boolean]())
    plan.foreach {
      case Filter(cond, w: Window) if rewritable(w) &&
          hasRankLimit(cond, AttributeSet(w.windowExpressions.map(_.toAttribute))) =>
        keep.add(w)
      case _ => ()
    }
    plan.transformUp {
      case w: Window if rewritable(w) && !keep.contains(w) =>
        val (attrs, kinds) = w.windowExpressions.map {
          case a @ Alias(WindowExpression(fn, _), _) =>
            (a.toAttribute, kindOf(fn).get)
        }.unzip
        GlobalRankPlan(w.orderSpec, attrs, kinds, w.child)
    }
  }
}

object GlobalRankRule {
  val RewriteConf = "spark.graft.globalRank.rewrite"
}

/** Planner strategy for [[GlobalRankPlan]] → [[GlobalRankExec]];
  * registered beside the rule in `graft.GraftExtensions`.
  */
object GlobalRankStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case GlobalRankPlan(order, attrs, kinds, child) =>
      GlobalRankExec(order, attrs, kinds, planLater(child)) :: Nil
    case _ => Nil
  }
}
