package graft.expressions

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{SetOperation, Union}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Mergeable theta sketches — DISTINCT-SET ALGEBRA, the question HLL
  * cannot answer: HLL unions only; theta sketches also INTERSECT (and
  * difference), so "how many users did both A and B" runs on two tiny
  * blobs instead of a distinct-distinct join. Exact while the set fits
  * the nominal 2^lgK entries (no sampling has begun); beyond that,
  * estimates with published error. Serialized compact sketches are the
  * storage unit — per-partition/per-day artifacts union associatively,
  * the same lifecycle as the HLL/KLL/FI blobs.
  */
object ThetaOps {
  def newUnion(lgK: Int): Union =
    SetOperation.builder().setLogNominalEntries(lgK).buildUnion()

  def wrapCompact(bytes: Array[Byte]): org.apache.datasketches.theta.Sketch =
    org.apache.datasketches.theta.Sketches.wrapSketch(Memory.wrap(bytes))
}

/** Aggregate raw values (LONG or STRING) into a theta sketch (binary). */
case class ThetaSketchAgg(
    child: Expression,
    lgK: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Union] {

  require(lgK >= 4 && lgK <= 26, "lgK in [4, 26]")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_theta_agg requires BIGINT or STRING, got ${t.sql}")
  }

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): Union = ThetaOps.newUnion(lgK)

  override def update(b: Union, input: InternalRow): Union = {
    val v = child.eval(input)
    if (v != null) v match {
      case l: java.lang.Long => b.update(l.longValue())
      case s: UTF8String => b.update(s.toString)
      case other => throw new IllegalStateException(s"unexpected input $other")
    }
    b
  }

  override def merge(b: Union, other: Union): Union = {
    b.union(other.getResult); b
  }

  override def eval(b: Union): Any = b.getResult.toByteArray

  override def serialize(b: Union): Array[Byte] = b.getResult.toByteArray
  override def deserialize(bytes: Array[Byte]): Union = {
    val u = ThetaOps.newUnion(lgK)
    u.union(Memory.wrap(bytes))
    u
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ThetaSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ThetaSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): ThetaSketchAgg =
    copy(child = newChildren(0))
}

/** Union of serialized theta sketches (per-batch blobs → one). */
case class ThetaUnionAgg(
    child: Expression,
    lgK: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Union] {

  require(lgK >= 4 && lgK <= 26, "lgK in [4, 26]")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_theta_union requires a BINARY sketch input, got ${child.dataType.sql}")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): Union = ThetaOps.newUnion(lgK)

  override def update(b: Union, input: InternalRow): Union = {
    val v = child.eval(input)
    if (v != null) b.union(Memory.wrap(v.asInstanceOf[Array[Byte]]))
    b
  }

  override def merge(b: Union, other: Union): Union = {
    b.union(other.getResult); b
  }

  override def eval(b: Union): Any = b.getResult.toByteArray

  override def serialize(b: Union): Array[Byte] = b.getResult.toByteArray
  override def deserialize(bytes: Array[Byte]): Union = {
    val u = ThetaOps.newUnion(lgK)
    u.union(Memory.wrap(bytes))
    u
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ThetaUnionAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ThetaUnionAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): ThetaUnionAgg =
    copy(child = newChildren(0))
}

/** Rounded distinct estimate of a serialized theta sketch — EXACT (a true
  * integer count) while the sketch never entered estimation mode.
  */
case class ThetaCount(child: Expression)
  extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_theta_count requires BINARY, got ${child.dataType.sql}")

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def nullSafeEval(bytes: Any): Any =
    math.round(ThetaOps.wrapCompact(bytes.asInstanceOf[Array[Byte]]).getEstimate)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Rounded distinct estimate of the INTERSECTION of two serialized theta
  * sketches — the audience-overlap primitive.
  */
case class ThetaIntersectCount(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == BinaryType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_theta_intersect_count requires (BINARY, BINARY), got " +
        s"(${left.dataType.sql}, ${right.dataType.sql})")

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val i = SetOperation.builder().buildIntersection()
    i.intersect(ThetaOps.wrapCompact(a.asInstanceOf[Array[Byte]]))
    i.intersect(ThetaOps.wrapCompact(b.asInstanceOf[Array[Byte]]))
    math.round(i.getResult.getEstimate)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
