package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, AggregateFunction, Average, Complete, Count, DeclarativeAggregate, First, Last, Max, Min, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project, Window}
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
  *   - every window expression is either a ranking function —
  *     row_number / rank / dense_rank / ntile(k) / percent_rank /
  *     cume_dist, all pure functions of the global position, tie run,
  *     and total count [[GlobalRankPlan]]'s two-pass plan computes — or
  *     a running aggregate — sum/count/min/max/avg over an UNBOUNDED
  *     PRECEDING → CURRENT ROW frame (ROWS or RANGE), the distributed
  *     prefix-sum of [[GlobalRunningAggPlan]] — or a whole-frame total
  *     (`agg() OVER ()`, [[GlobalTotalAggPlan]]: zero exchange) — or a
  *     literal-offset respect-nulls lag/lead ([[GlobalOffsetPlan]]:
  *     boundary values cross partitions as metadata). A mix stacks the
  *     plans over ONE range exchange (each preserves the child's
  *     partitioning and order, so the outer's requirement is already
  *     satisfied). Running aggregates include `first_value`/
  *     `last_value` (Spark's First/Last aggregates) in every variant —
  *     ignore-nulls included — since the fold reproduces their frame
  *     semantics exactly. Anything else — ignore-nulls lag/lead,
  *     bounded frames, nth_value — keeps the whole Window node
  *     untouched: their semantics need the frame, and a mixed node
  *     must stay one node to compute consistently;
  *   - it is NOT directly under a rank-limit filter (`rn <= k` etc.)
  *     when purely ranking:
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
    case _: CumeDist => Some(RankKind.CumeDist)
    case _ => None
  }

  /** Whitelisted running aggregates: `DeclarativeAggregate`s whose
    * init/update/merge/evaluate expressions the prefix-sum exec replays
    * verbatim, so semantics (null handling, Decimal widening, ANSI
    * overflow) are inherited, not reimplemented. First/Last cover
    * `first_value`/`last_value` in EVERY unbounded-preceding frame —
    * including ignore-nulls, and including the classic "last_value with
    * the default frame is the current row / run end" SQL gotcha, which
    * the fold reproduces exactly (ROWS evaluates per row; RANGE back-
    * fills the peer run's final state). DISTINCT and FILTER forms are
    * excluded (neither is a prefix-mergeable fold).
    */
  private def supportedAgg(f: AggregateFunction): Boolean = f match {
    case _: Sum | _: Min | _: Max | _: Count | _: Average | _: First | _: Last =>
      f.isInstanceOf[DeclarativeAggregate]
    case _ => false
  }

  /** `agg(x) OVER (ORDER BY ... [ROWS|RANGE] UNBOUNDED PRECEDING →
    * CURRENT ROW)` → (the aggregate, isRowsFrame). RANGE — the default
    * frame when only ORDER BY is written — includes the row's peers.
    */
  private def runningAggOf(fn: Expression,
                           spec: WindowSpecDefinition): Option[(AggregateExpression, RunFrame)] =
    (fn, spec.frameSpecification) match {
      case (ae @ AggregateExpression(f, Complete, false, None, _),
            SpecifiedWindowFrame(ft, UnboundedPreceding, CurrentRow))
          if supportedAgg(f) =>
        Some((ae,
          if (ft == RowFrame) RunFrame.RowsCurrent else RunFrame.RangeCurrent))
      // the EXCLUSIVE prefix (x51's boundary-level shape): everything
      // strictly before the current row
      case (ae @ AggregateExpression(f, Complete, false, None, _),
            SpecifiedWindowFrame(RowFrame, UnboundedPreceding,
              Literal(-1, org.apache.spark.sql.types.IntegerType)))
          if supportedAgg(f) =>
        Some((ae, RunFrame.RowsExclusive))
      case _ => None
    }

  /** `agg(x) OVER ()` — or any UNBOUNDED PRECEDING → UNBOUNDED
    * FOLLOWING frame — the whole-frame global total, order-irrelevant.
    */
  private def totalAggOf(fn: Expression,
                         spec: WindowSpecDefinition): Option[AggregateExpression] =
    (fn, spec.frameSpecification) match {
      case (ae @ AggregateExpression(f, Complete, false, None, _),
            SpecifiedWindowFrame(_, UnboundedPreceding, UnboundedFollowing))
          if supportedAgg(f) =>
        Some(ae)
      case _ => None
    }

  /** `lag(e, n[, default])` / `lead(e, n[, default])` with a literal
    * offset and respect-nulls → (input, SIGNED row offset, default).
    * `ignoreNulls` forms are excluded: their reach is unbounded, so the
    * boundary metadata of [[GlobalOffsetPlan]] cannot be sized.
    */
  private def offsetOf(fn: Expression): Option[(Expression, Int, Expression)] =
    fn match {
      case Lag(in, Literal(n: Int, _), default, false)
          if in.deterministic && default.deterministic =>
        Some((in, -n, default))
      case Lead(in, Literal(n: Int, _), default, false)
          if in.deterministic && default.deterministic =>
        Some((in, n, default))
      case _ => None
    }

  private sealed trait Kind
  private case class RankK(k: RankKind) extends Kind
  private case class RunK(ae: AggregateExpression, frame: RunFrame) extends Kind
  private case class TotK(ae: AggregateExpression) extends Kind
  private case class OffK(in: Expression, off: Int, default: Expression) extends Kind

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

  private def classify(ne: NamedExpression): Option[Kind] =
    ne match {
      case Alias(WindowExpression(fn, spec), _) =>
        kindOf(fn).map(RankK.apply)
          .orElse(runningAggOf(fn, spec).map { case (ae, fr) => RunK(ae, fr) })
          .orElse(totalAggOf(fn, spec).map(TotK.apply))
          .orElse(offsetOf(fn).map { case (in, o, d) => OffK(in, o, d) })
      case _ => None
    }

  /** Whole-frame totals need no order at all; anything position- or
    * prefix-dependent needs a non-empty ORDER BY to be range-
    * partitionable (a ROWS prefix with no order is left to Spark —
    * its result is only defined up to an arbitrary order anyway).
    */
  /** Cost guard: when the frame is PROVABLY tiny (`maxRows` — a hard
    * bound, typically from a `LIMIT` marker over a bounded level frame),
    * Spark's single-partition window is strictly cheaper than the
    * rewrite: a one-task sort of ≤ a few thousand rows is microseconds,
    * while a range exchange pays a SAMPLING JOB that re-executes the
    * whole upstream (plus the metadata pass). Library code documents
    * bounded frames with an exact `.limit(bound)` (per-mill level
    * frames: ≤1001 rows by construction); unbounded frames — calendars,
    * sources, anything corpus-derived — have no `maxRows` and always
    * rewrite.
    */
  private def provablySmall(child: LogicalPlan): Boolean = {
    val threshold =
      session.conf.get(GlobalRankRule.SmallFrameConf, "4096").toLong
    threshold > 0L && child.maxRows.exists(_ <= threshold)
  }

  private def rewritable(w: Window): Boolean =
    w.partitionSpec.isEmpty && w.windowExpressions.nonEmpty &&
      !provablySmall(w.child) && {
      val kinds = w.windowExpressions.map(classify)
      kinds.forall(_.isDefined) &&
        (w.orderSpec.nonEmpty || kinds.forall(_.exists(_.isInstanceOf[TotK])))
    }

  private def isPureRank(w: Window): Boolean =
    w.windowExpressions.forall {
      case Alias(WindowExpression(fn, _), _) => kindOf(fn).isDefined
      case _ => false
    }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (session.conf.get(RewriteConf, "true") != "true") return plan
    // leave top-k shapes to InferWindowGroupLimit (see scaladoc): collect
    // the PURE-rank Window nodes sitting directly under a rank-limit
    // Filter (an aggregate in the node disables the group-limit path, so
    // mixed nodes rewrite regardless of filters above them)
    val keep = java.util.Collections.newSetFromMap(
      new java.util.IdentityHashMap[Window, java.lang.Boolean]())
    plan.foreach {
      case Filter(cond, w: Window) if rewritable(w) && isPureRank(w) &&
          hasRankLimit(cond, AttributeSet(w.windowExpressions.collect {
            // only the kinds InferWindowGroupLimit can actually prune on:
            // a bound on ntile/percent_rank/cume_dist does NOT make the
            // group-limit path fire, so those nodes must still rewrite
            case a @ Alias(WindowExpression(fn, _), _)
                if kindOf(fn).exists {
                  case RankKind.RowNumber | RankKind.Rank |
                       RankKind.DenseRank => true
                  case _ => false
                } => a.toAttribute
          })) =>
        keep.add(w)
      case _ => ()
    }
    plan.transformUp {
      case w: Window if rewritable(w) && !keep.contains(w) =>
        val classified = w.windowExpressions.map { ne =>
          (ne.toAttribute, classify(ne).get)
        }
        val rankPairs = classified.collect { case (attr, RankK(k)) => (attr, k) }
        val runTriples = classified.collect {
          case (attr, RunK(ae, fr)) => (attr, ae, fr)
        }
        val totPairs = classified.collect { case (attr, TotK(ae)) => (attr, ae) }
        val offQuads = classified.collect {
          case (attr, OffK(in, o, d)) => (attr, in, o, d)
        }
        // stack order: ranks innermost (they, running aggs and offsets
        // share the one range exchange), totals outermost (no
        // requirement at all — they ride whatever partitioning is below)
        var replaced: LogicalPlan = w.child
        if (rankPairs.nonEmpty) {
          replaced = GlobalRankPlan(w.orderSpec,
            rankPairs.map(_._1), rankPairs.map(_._2), replaced)
        }
        if (runTriples.nonEmpty) {
          replaced = GlobalRunningAggPlan(w.orderSpec,
            runTriples.map(_._1), runTriples.map(_._2),
            runTriples.map(_._3), replaced)
        }
        if (offQuads.nonEmpty) {
          replaced = GlobalOffsetPlan(w.orderSpec,
            offQuads.map(_._1), offQuads.map(_._2),
            offQuads.map(_._3), offQuads.map(_._4), replaced)
        }
        if (totPairs.nonEmpty) {
          replaced = GlobalTotalAggPlan(
            totPairs.map(_._1), totPairs.map(_._2), replaced)
        }
        // stacking groups by kind: restore the Window's exact column
        // order when kinds interleave
        if (replaced.output == w.output) replaced
        else Project(w.output, replaced)
    }
  }
}

object GlobalRankRule {
  val RewriteConf = "spark.graft.globalRank.rewrite"

  /** Frames with `maxRows` at or under this stay single-partition
    * windows (see the cost-guard scaladoc); 0 disables the guard. */
  val SmallFrameConf = "spark.graft.globalRank.smallFrameRows"
}

/** Planner strategy for [[GlobalRankPlan]] → [[GlobalRankExec]] and
  * [[GlobalRunningAggPlan]] → [[GlobalRunningAggExec]]; registered
  * beside the rule in `graft.GraftExtensions`.
  */
object GlobalRankStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case GlobalRankPlan(order, attrs, kinds, child) =>
      GlobalRankExec(order, attrs, kinds, planLater(child)) :: Nil
    case GlobalRunningAggPlan(order, attrs, aggs, frames, child) =>
      GlobalRunningAggExec(order, attrs, aggs, frames, planLater(child)) :: Nil
    case GlobalTotalAggPlan(attrs, aggs, child) =>
      GlobalTotalAggExec(attrs, aggs, planLater(child)) :: Nil
    case GlobalOffsetPlan(order, attrs, ins, offs, defs, child) =>
      GlobalOffsetExec(order, attrs, ins, offs, defs, planLater(child)) :: Nil
    case _ => Nil
  }
}
