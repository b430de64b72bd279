package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Add, And, AttributeReference, CaseWhen, EqualTo, Expression, GreaterThanOrEqual, If, IsNotNull, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{DataType, LongType}

/** Fixed-size "value ring" aggregates backing the window-rewrite family's
  * `nth_value(x, n>1)` and ignore-nulls `lag(x, n>1)` arms (VERDICT r11
  * missing/next #6). Each keeps the first (resp. last) `n` contributing
  * values of the fold as `n` literal buffer slots plus a contributing-row
  * count, so the nth-in-frame / nth-non-null-back pick is a buffer read —
  * no frame materialization, state O(n) per fold.
  *
  * Both are honest [[DeclarativeAggregate]]s: sequential `update` makes
  * them exact on the bounded/range execs' per-frame re-folds, and a real
  * `merge` (a CaseWhen shift over the literal slot count — expressible
  * precisely because `n` is a plan-time literal) makes them exact on the
  * running execs' partition-partial prefix merges. Merge/update read
  * left-buffer slots only at positions not yet overwritten by the
  * sequential `MutableProjection` write order (documented per class), so
  * they are safe for in-place buffer merges too.
  *
  * `n` is capped ([[RingAggs.MaxSlots]]): the merge expression count
  * grows O(n²), and a window user's nth/lag offsets are small constants;
  * a larger literal keeps Spark's `WindowExec` plan.
  */
object RingAggs {
  /** Largest ring the rewrite rules will plan. */
  val MaxSlots = 16
}

/** The first `n` contributing values of the fold, in order; evaluates to
  * the n-th (null while fewer than `n` rows have contributed) — exactly
  * `nth_value(x, n [IGNORE NULLS])` over a frame folded in frame order.
  * "Contributing" = every row (respect-nulls: the stored n-th value may
  * itself be null, which is also the correct answer) or non-null rows
  * (ignore-nulls).
  *
  * Buffer layout `[v1 … vn, cnt]`: update/merge at slot j reads only
  * `cnt` (written last) and slot j itself, so the sequential projection
  * write order can never corrupt a later read.
  */
case class NthFirstRing(child: Expression, n: Int, ignoreNulls: Boolean)
    extends DeclarativeAggregate with UnaryLike[Expression] {
  require(n >= 1 && n <= RingAggs.MaxSlots)

  override def nullable: Boolean = true
  override def dataType: DataType = child.dataType
  override def prettyName: String = "nth_first_ring"

  // slots(i) holds the (i+1)-th contributing value of the stream
  private lazy val slots: Seq[AttributeReference] =
    (1 to n).map(j => AttributeReference(s"v$j", child.dataType)())
  private lazy val cnt =
    AttributeReference("cnt", LongType, nullable = false)()

  override lazy val aggBufferAttributes: Seq[AttributeReference] = slots :+ cnt
  override lazy val initialValues: Seq[Expression] =
    slots.map(_ => Literal.create(null, child.dataType)) :+ Literal(0L)

  private def contributes: Expression =
    if (ignoreNulls) IsNotNull(child) else Literal.TrueLiteral

  override lazy val updateExpressions: Seq[Expression] = {
    val c = contributes
    slots.zipWithIndex.map { case (v, i) =>
      If(And(c, EqualTo(cnt, Literal(i.toLong))), child, v)
    } :+ If(c, Add(cnt, Literal(1L)), cnt)
  }

  /** Combined j-th value: the left fold's when it saw ≥ j contributing
    * rows, else the right fold's (j − left.cnt)-th — a CaseWhen over the
    * possible left counts 0 … j−1 (all literals). */
  override lazy val mergeExpressions: Seq[Expression] = {
    slots.zipWithIndex.map { case (v, i) =>
      val j = i + 1
      If(GreaterThanOrEqual(cnt.left, Literal(j.toLong)), v.left,
        CaseWhen((0 until j).map { k =>
          (EqualTo(cnt.left, Literal(k.toLong)): Expression,
            slots(j - k - 1).right: Expression)
        }, Literal.create(null, child.dataType)))
    } :+ Add(cnt.left, cnt.right)
  }

  override lazy val evaluateExpression: Expression = slots.last

  override protected def withNewChildInternal(newChild: Expression): NthFirstRing =
    copy(child = newChild)
}

/** The last `n` NON-NULL values of the fold, most recent first; evaluates
  * to the n-th most recent (null while fewer than `n` non-nulls have been
  * seen) — exactly ignore-nulls `lag(x, n)` when folded over the
  * exclusive prefix, with the lag's default grafted back by the rules'
  * coalesce projection.
  *
  * Buffer layout `[vn … v1, cnt]` (DESCENDING logical index): the update
  * shift `v_j ← v_{j−1}` then reads a slot the projection writes LATER,
  * and the merge's left reads (`l.v_{j−k}`, k ≥ 1) are also all at later
  * positions — sequential in-place writes stay safe.
  */
case class NthLastRing(child: Expression, n: Int)
    extends DeclarativeAggregate with UnaryLike[Expression] {
  require(n >= 1 && n <= RingAggs.MaxSlots)

  override def nullable: Boolean = true
  override def dataType: DataType = child.dataType
  override def prettyName: String = "nth_last_ring"

  // byIdx(j) = slot holding the j-th most recent non-null (1-based)
  private lazy val byIdx: Array[AttributeReference] = {
    val a = new Array[AttributeReference](n + 1)
    (1 to n).foreach { j =>
      a(j) = AttributeReference(s"v$j", child.dataType)()
    }
    a
  }
  private lazy val cnt =
    AttributeReference("cnt", LongType, nullable = false)()

  // buffer order v_n, v_{n-1}, …, v_1, cnt
  override lazy val aggBufferAttributes: Seq[AttributeReference] =
    (n to 1 by -1).map(byIdx) :+ cnt
  override lazy val initialValues: Seq[Expression] =
    (1 to n).map(_ => Literal.create(null, child.dataType)) :+ Literal(0L)

  override lazy val updateExpressions: Seq[Expression] = {
    val c = IsNotNull(child)
    (n to 1 by -1).map { j =>
      If(c, if (j == 1) child else byIdx(j - 1), byIdx(j)): Expression
    } :+ If(c, Add(cnt, Literal(1L)), cnt)
  }

  /** Combined j-th most recent: the right fold's when it saw ≥ j
    * non-nulls, else the left fold's (j − right.cnt)-th. */
  override lazy val mergeExpressions: Seq[Expression] = {
    (n to 1 by -1).map { j =>
      If(GreaterThanOrEqual(cnt.right, Literal(j.toLong)), byIdx(j).right,
        CaseWhen((0 until j).map { k =>
          (EqualTo(cnt.right, Literal(k.toLong)): Expression,
            byIdx(j - k).left: Expression)
        }, Literal.create(null, child.dataType))): Expression
    } :+ Add(cnt.left, cnt.right)
  }

  override lazy val evaluateExpression: Expression = byIdx(n)

  override protected def withNewChildInternal(newChild: Expression): NthLastRing =
    copy(child = newChild)
}
