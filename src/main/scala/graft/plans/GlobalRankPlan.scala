package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeSet, SortOrder}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}

/** Which ranking function a [[GlobalRankPlan]] output column computes.
  * All three are order-statistics of the SAME total sort — they share one
  * range exchange, one in-partition sort, one metadata count pass and one
  * streaming rank pass, whatever combination a query asks for.
  */
sealed trait RankKind extends Serializable
object RankKind {
  /** 1-based global row position (ties broken arbitrarily-but-
    * deterministically by the sort, exactly like `WindowExec`). */
  case object RowNumber extends RankKind
  /** Competition rank: tied rows share the rank of their first row; the
    * next distinct key jumps by the tie count. */
  case object Rank extends RankKind
  /** Dense rank: tied rows share a rank; the next distinct key takes the
    * next integer. */
  case object DenseRank extends RankKind
  /** `ntile(buckets)`: rows split into `buckets` as-even groups, the
    * first `N % buckets` groups one row larger — a pure function of the
    * global row position and the total count, both of which the count
    * pass already yields. */
  final case class Ntile(buckets: Int) extends RankKind
  /** `percent_rank()` = (rank − 1) / (N − 1), 0.0 for N = 1 — the
    * competition rank scaled by the total count. `DoubleType`. */
  case object PercentRank extends RankKind
  /** `cume_dist()` = (global position of the row's LAST peer) / N — the
    * inclusive distribution function. Unlike the other kinds it needs
    * the tie run's END, so its presence makes the streaming pass buffer
    * one peer run at a time (peak memory = the largest tie run; still
    * strictly below `WindowExec`, which buffers whole partitions).
    * `DoubleType`. */
  case object CumeDist extends RankKind
}

/** Logical plan for scale-safe EXACT global ranking — what
  * `row_number()/rank()/dense_rank() OVER (ORDER BY ...)` (no partition
  * spec) SHOULD plan as. Spark plans that window with a
  * `SinglePartition` requirement: at 100 TB the whole frame rides
  * through one task. This node instead requires only an ordered (range)
  * distribution — a fully parallel sort — and [[GlobalRankExec]] adds
  * the global rank with a per-partition offset pass, the zipWithIndex
  * technique `stats/GlobalRank` already applies at the DataFrame level
  * (VERDICT r9 #1 asks for the same protection for plain-SQL users;
  * rewritten automatically by [[GlobalRankRule]] via
  * `graft.GraftExtensions`, the `RangeJoinRule` precedent).
  *
  * `rankAttrs` keep the exprIds of the window expressions they replace,
  * so downstream references resolve unchanged. `rankKinds(i)` says what
  * `rankAttrs(i)` computes.
  */
case class GlobalRankPlan(order: Seq[SortOrder], rankAttrs: Seq[Attribute],
                          rankKinds: Seq[RankKind], child: LogicalPlan)
    extends UnaryNode {
  require(rankAttrs.length == rankKinds.length && rankAttrs.nonEmpty)
  override def output: Seq[Attribute] = child.output ++ rankAttrs
  override def producedAttributes: AttributeSet = AttributeSet(rankAttrs)
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): GlobalRankPlan =
    copy(child = newChild)
}
