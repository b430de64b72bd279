package graft.expressions

import org.apache.datasketches.common.ArrayOfStringsSerDe
import org.apache.datasketches.frequencies.{ErrorType, ItemsSketch}
import org.apache.datasketches.memory.Memory

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Mergeable heavy-hitters sketch aggregates over Datasketches'
  * frequent-items `ItemsSketch[String]` — the third leg of the mergeable
  * sketch family (HLL → distinct counts, KLL → quantiles, FI → top
  * items). The Misra-Gries-style sketch holds at most `maxMapSize`
  * counters: under capacity every count is EXACT; over capacity each
  * estimate carries explicit lower/upper bounds and no item whose true
  * count exceeds the error threshold is ever missed (NO_FALSE_NEGATIVES).
  * Serialized sketches are the unit of storage — per-partition/per-day
  * blobs persist as index-table artifacts and union later, the same
  * lifecycle as `x3_hll_artifact`.
  *
  * The 100 TB story: exact term-frequency top-k (`x5_term_freq`) shuffles
  * every distinct token; the sketch form ships one bounded blob per
  * partition, and unions are associative — the incremental-stats shape
  * (`IncrementalStats`) for "what are the dominant tokens/domains/URLs".
  */
object FreqItemsSketch {
  val Serde = new ArrayOfStringsSerDe()
}

case class FreqItemsAgg(
    child: Expression,
    maxMapSize: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ItemsSketch[String]] {

  require(maxMapSize >= 8 && (maxMapSize & (maxMapSize - 1)) == 0,
    "maxMapSize must be a power of 2, >= 8")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_freq_agg requires a STRING input, got ${child.dataType.sql}")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): ItemsSketch[String] =
    new ItemsSketch[String](maxMapSize)

  override def update(b: ItemsSketch[String], input: InternalRow): ItemsSketch[String] = {
    val v = child.eval(input)
    if (v != null) b.update(v.asInstanceOf[UTF8String].toString)
    b
  }

  override def merge(b: ItemsSketch[String], other: ItemsSketch[String]): ItemsSketch[String] = {
    b.merge(other); b
  }

  override def eval(b: ItemsSketch[String]): Any = b.toByteArray(FreqItemsSketch.Serde)

  override def serialize(b: ItemsSketch[String]): Array[Byte] =
    b.toByteArray(FreqItemsSketch.Serde)
  override def deserialize(bytes: Array[Byte]): ItemsSketch[String] =
    ItemsSketch.getInstance(Memory.wrap(bytes), FreqItemsSketch.Serde)

  override def withNewMutableAggBufferOffset(newOffset: Int): FreqItemsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FreqItemsAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): FreqItemsAgg =
    copy(child = newChildren(0))
}

/** Union of serialized frequent-items sketches (per-batch blobs → one). */
case class FreqItemsUnionAgg(
    child: Expression,
    maxMapSize: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ItemsSketch[String]] {

  require(maxMapSize >= 8 && (maxMapSize & (maxMapSize - 1)) == 0,
    "maxMapSize must be a power of 2, >= 8")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_freq_union requires a BINARY sketch input, got ${child.dataType.sql}")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): ItemsSketch[String] =
    new ItemsSketch[String](maxMapSize)

  override def update(b: ItemsSketch[String], input: InternalRow): ItemsSketch[String] = {
    val v = child.eval(input)
    if (v != null)
      b.merge(ItemsSketch.getInstance(
        Memory.wrap(v.asInstanceOf[Array[Byte]]), FreqItemsSketch.Serde))
    b
  }

  override def merge(b: ItemsSketch[String], other: ItemsSketch[String]): ItemsSketch[String] = {
    b.merge(other); b
  }

  override def eval(b: ItemsSketch[String]): Any = b.toByteArray(FreqItemsSketch.Serde)

  override def serialize(b: ItemsSketch[String]): Array[Byte] =
    b.toByteArray(FreqItemsSketch.Serde)
  override def deserialize(bytes: Array[Byte]): ItemsSketch[String] =
    ItemsSketch.getInstance(Memory.wrap(bytes), FreqItemsSketch.Serde)

  override def withNewMutableAggBufferOffset(newOffset: Int): FreqItemsUnionAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FreqItemsUnionAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): FreqItemsUnionAgg =
    copy(child = newChildren(0))
}

/** Top-k extraction from a serialized frequent-items sketch:
  * array<struct<item, estimate, lower, upper>> under NO_FALSE_NEGATIVES
  * (every true heavy hitter appears; some near-threshold items may).
  * Deterministic output order: estimate desc, then item asc — tie order
  * from the sketch is NOT relied on. Runs on aggregate output rows —
  * CodegenFallback is fine off the hot path.
  */
case class FreqItemsTopK(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == IntegerType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_freq_topk requires (BINARY, INT), got " +
        s"(${left.dataType.sql}, ${right.dataType.sql})")

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("estimate", LongType, nullable = false),
    StructField("lower", LongType, nullable = false),
    StructField("upper", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = true

  override def nullSafeEval(sketchBytes: Any, k: Any): Any = {
    val kk = k.asInstanceOf[Int]
    if (kk <= 0) return null
    val sk = ItemsSketch.getInstance(
      Memory.wrap(sketchBytes.asInstanceOf[Array[Byte]]), FreqItemsSketch.Serde)
    val rows = sk.getFrequentItems(ErrorType.NO_FALSE_NEGATIVES)
      .sortBy(r => (-r.getEstimate, r.getItem))
      .take(kk)
      .map { r =>
        val out = new GenericInternalRow(4)
        out.update(0, UTF8String.fromString(r.getItem))
        out.update(1, r.getEstimate)
        out.update(2, r.getLowerBound)
        out.update(3, r.getUpperBound)
        out: Any
      }
    new GenericArrayData(rows)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
