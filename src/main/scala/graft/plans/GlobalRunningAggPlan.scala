package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeSet, Expression, SortOrder}
import org.apache.spark.sql.catalyst.expressions.aggregate.AggregateExpression
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}

/** The prefix frame of one [[GlobalRunningAggPlan]] output. */
sealed trait RunFrame extends Serializable
object RunFrame {
  /** ROWS UNBOUNDED PRECEDING → CURRENT ROW: evaluate after each row. */
  case object RowsCurrent extends RunFrame
  /** ROWS UNBOUNDED PRECEDING → 1 PRECEDING: the EXCLUSIVE prefix —
    * evaluate BEFORE folding the current row in (the first row of the
    * whole frame sees the empty-frame value: the aggregate's own
    * initial-buffer evaluation, i.e. null sums / zero counts). */
  case object RowsExclusive extends RunFrame
  /** RANGE UNBOUNDED PRECEDING → CURRENT ROW (the default frame of
    * `agg() OVER (ORDER BY ...)`): tied rows share the value of their
    * peer run's last row. */
  case object RangeCurrent extends RunFrame
}

/** Logical plan for scale-safe EXACT running aggregates — what
  * `sum(x)/count(x)/avg(x)/min(x)/max(x) OVER (ORDER BY ... ROWS|RANGE
  * BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)` (no partition spec)
  * SHOULD plan as. Spark plans that window with a `SinglePartition`
  * requirement — at 100 TB the whole frame rides through one task —
  * even though a running aggregate over a prefix frame is exactly a
  * distributed prefix sum: per-partition partial buffers (one metadata
  * job), an exclusive prefix-merge of those partials on the driver
  * (O(partitions) state, the same class as the range partitioner's own
  * bounds), and a streaming second pass that folds each partition's
  * rows on top of its incoming offset buffer. The companion of
  * [[GlobalRankPlan]] (VERDICT r9 #1): together they cover both classic
  * unpartitioned-window scale killers — global ranks and cumulative
  * sums (the same prefix-sum discipline `text/TextOps.packConcat`
  * applies per shard, promoted to an automatic whole-corpus rewrite).
  *
  * `aggAttrs` keep the exprIds of the window expressions they replace,
  * so downstream references resolve unchanged. `aggs(i)` is an
  * expression containing EXACTLY ONE `AggregateExpression` — usually
  * the aggregate itself, but later optimizer rules may wrap it in
  * scalar post-processing (`DecimalAggregates` turns `avg(decimal)`
  * into `cast(divide(avg(unscaled(…))))`); the exec folds the inner
  * aggregate and composes the wrapper into its evaluate projection.
  * Carried as real child expressions so attribute rewrites and column
  * pruning see the references. `frames(i)` says where output i's
  * prefix ends — see [[RunFrame]].
  */
case class GlobalRunningAggPlan(order: Seq[SortOrder], aggAttrs: Seq[Attribute],
                                aggs: Seq[Expression],
                                frames: Seq[RunFrame], child: LogicalPlan)
    extends UnaryNode {
  require(aggAttrs.length == aggs.length && aggs.length == frames.length &&
    aggs.nonEmpty)
  override def output: Seq[Attribute] = child.output ++ aggAttrs
  override def producedAttributes: AttributeSet = AttributeSet(aggAttrs)
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): GlobalRunningAggPlan =
    copy(child = newChild)
}

/** Logical plan for the whole-frame cousin: `agg(x) OVER ()` (or any
  * UNBOUNDED PRECEDING → UNBOUNDED FOLLOWING frame with an empty
  * partition spec) — every row gets the GLOBAL aggregate. Spark plans
  * this as a single-partition `WindowExec` too, but for the order-
  * insensitive aggregates no order is needed at all:
  * [[GlobalTotalAggExec]] demands NOTHING of its child (zero exchange,
  * zero sort) — one metadata job folds per-partition partials, the
  * driver merges them to one buffer and evaluates, and a map attaches
  * the constant. Strictly cheaper than `WindowExec` at every scale, and
  * cheaper than the scalar-subquery form (which scans the child twice).
  *
  * `order` is non-empty ONLY when an aggregate is ORDER-SENSITIVE
  * (First/Last with the window's ORDER BY written): the exec then
  * requires `OrderedDistribution(order)` — partials fold rows in the
  * sorted order and the driver merges them in partition-index order, so
  * the merged First/Last is the global order's first/last, exactly.
  * When the node stacks above the family's other execs the shared range
  * exchange already satisfies the requirement (still zero extra cost);
  * standalone it plans its own range sort — still never one task.
  */
case class GlobalTotalAggPlan(aggAttrs: Seq[Attribute],
                              aggs: Seq[Expression],
                              order: Seq[SortOrder],
                              child: LogicalPlan) extends UnaryNode {
  require(aggAttrs.length == aggs.length && aggs.nonEmpty)
  override def output: Seq[Attribute] = child.output ++ aggAttrs
  override def producedAttributes: AttributeSet = AttributeSet(aggAttrs)
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): GlobalTotalAggPlan =
    copy(child = newChild)
}
