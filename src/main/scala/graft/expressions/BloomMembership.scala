package graft.expressions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Mergeable Bloom MEMBERSHIP sketches — the missing member of the sketch
  * family (HLL answers "how many distinct", KLL "what quantile", FI "which
  * heavy items", theta "how big is the overlap"; Bloom answers "have I
  * seen THIS one"). The contract is one-sided: NO FALSE NEGATIVES — a key
  * that was added always reports present; an absent key reports present
  * with probability ≤ fpp. That one-sidedness is exactly what incremental
  * corpus dedup needs: `might_contain = false` rows are PROVEN new and
  * skip the expensive exact-verify join entirely; only the ≤(dups + fpp)
  * fraction pays the shuffle.
  *
  * Built on `org.apache.spark.util.sketch.BloomFilter` (public Spark API,
  * the same sketch the engine's runtime bloom-filter join pushdown uses).
  * Serialized filters are the storage/merge unit — per-partition or
  * per-day blobs OR together associatively (same lifecycle as the other
  * sketch blobs), so a 100 TB corpus maintains per-key-range blooms as
  * tiny artifact rows and a new batch checks against them map-side.
  */
object BloomOps {
  def serialize(bf: BloomFilter): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    bf.writeTo(out)
    out.toByteArray
  }
  def deserialize(bytes: Array[Byte]): BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bytes))
}

/** Aggregate raw keys (BIGINT or STRING) into a serialized Bloom filter.
  * `expectedItems`/`fpp` size the bit array; all partial buffers use the
  * same (n, fpp) so `mergeInPlace` is always compatible.
  */
case class BloomFilterAgg(
    child: Expression,
    expectedItems: Long,
    fpp: Double,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BloomFilter] {

  require(expectedItems > 0, "expectedItems must be positive")
  require(fpp > 0.0 && fpp < 1.0, "fpp in (0, 1)")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_bloom_agg requires BIGINT or STRING, got ${t.sql}")
  }

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): BloomFilter =
    BloomFilter.create(expectedItems, fpp)

  override def update(b: BloomFilter, input: InternalRow): BloomFilter = {
    val v = child.eval(input)
    if (v != null) v match {
      case l: java.lang.Long => b.putLong(l.longValue())
      case s: UTF8String => b.putBinary(s.getBytes)
      case other => throw new IllegalStateException(s"unexpected input $other")
    }
    b
  }

  override def merge(b: BloomFilter, other: BloomFilter): BloomFilter = {
    b.mergeInPlace(other); b
  }

  override def eval(b: BloomFilter): Any = BloomOps.serialize(b)
  override def serialize(b: BloomFilter): Array[Byte] = BloomOps.serialize(b)
  override def deserialize(bytes: Array[Byte]): BloomFilter =
    BloomOps.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomFilterAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomFilterAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BloomFilterAgg =
    copy(child = newChildren(0))
}

/** OR-union of serialized Bloom filters (per-batch/per-partition blobs →
  * one). All inputs must share (expectedItems, fpp) — enforced by
  * `mergeInPlace` (throws IncompatibleMergeException otherwise).
  */
case class BloomUnionAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Option[BloomFilter]] {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_bloom_union requires a BINARY sketch input, got ${child.dataType.sql}")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = BinaryType

  // the union of zero sketches has no (n, fpp) to size an empty filter
  // from — the buffer starts empty and adopts the first input's geometry
  override def createAggregationBuffer(): Option[BloomFilter] = None

  override def update(b: Option[BloomFilter], input: InternalRow): Option[BloomFilter] = {
    val v = child.eval(input)
    if (v == null) b
    else {
      val incoming = BloomOps.deserialize(v.asInstanceOf[Array[Byte]])
      b match {
        case Some(acc) => acc.mergeInPlace(incoming); b
        case None => Some(incoming)
      }
    }
  }

  override def merge(b: Option[BloomFilter], other: Option[BloomFilter]): Option[BloomFilter] =
    (b, other) match {
      case (Some(acc), Some(o)) => acc.mergeInPlace(o); b
      case (None, o) => o
      case (b2, None) => b2
    }

  override def eval(b: Option[BloomFilter]): Any =
    b.map(BloomOps.serialize).orNull

  override def serialize(b: Option[BloomFilter]): Array[Byte] =
    b.map(BloomOps.serialize).getOrElse(Array.emptyByteArray)
  override def deserialize(bytes: Array[Byte]): Option[BloomFilter] =
    if (bytes.isEmpty) None else Some(BloomOps.deserialize(bytes))

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomUnionAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomUnionAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BloomUnionAgg =
    copy(child = newChildren(0))
}

/** `might_contain(sketch, key)` — true if the key may be in the set, false
  * only if it is PROVEN absent. Deserialized filters are cached per blob
  * identity: under a broadcast join the per-bucket blob is the same object
  * for every probe row in a partition, so the cache holds one filter per
  * bucket (bounded by the bucket count), not one per row.
  */
case class BloomMightContain(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, LongType | StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_bloom_contains requires (BINARY, BIGINT|STRING), got (${l.sql}, ${r.sql})")
    }

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = true

  @transient private lazy val cache =
    new java.util.IdentityHashMap[AnyRef, BloomFilter]()

  override def nullSafeEval(sketch: Any, key: Any): Any = {
    val bytes = sketch.asInstanceOf[Array[Byte]]
    var bf = cache.get(bytes)
    if (bf == null) {
      bf = BloomOps.deserialize(bytes)
      if (cache.size < 4096) cache.put(bytes, bf)
    }
    key match {
      case l: java.lang.Long => bf.mightContainLong(l.longValue())
      case s: UTF8String => bf.mightContainBinary(s.getBytes)
      case other => throw new IllegalStateException(s"unexpected key $other")
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
