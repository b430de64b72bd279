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
  def deserialize(bytes: Array[Byte]): BloomFilter = {
    nDeserialize.incrementAndGet()
    BloomFilter.readFrom(new ByteArrayInputStream(bytes))
  }

  /** Observability for the probe-side cache: lets a spec assert that N
    * probe rows against K distinct sketches deserialize K times, not N
    * (the ADVICE r6 identity-cache regression class).
    */
  private val nDeserialize = new java.util.concurrent.atomic.AtomicLong(0)
  def deserializations: Long = nDeserialize.get()
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
  * only if it is PROVEN absent. Deserialized filters are cached by blob
  * CONTENT, not object identity (ADVICE r6): in real plans the sketch
  * bytes arrive as a fresh copy per probe row (`UnsafeRow.getBinary`
  * copies), so an identity-keyed cache never hit and re-deserialized the
  * filter for every row while still retaining every copy. The content key
  * hashes a strided 64-byte sample (Bloom blobs share headers, so
  * prefix-only hashing would collide every bucket into one chain) and
  * resolves collisions by full `Arrays.equals` — one memcmp per probe row
  * against one allocation-heavy deserialize, and the LRU is bounded by
  * TOTAL BYTES (64 MB), so large `expectedItems` sketches cannot pile up
  * unbounded heap per task.
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

  import BloomMightContain.BytesKey

  private val MaxCacheBytes = 64L << 20

  @transient private var cachedBytes = 0L
  @transient private lazy val cache =
    new java.util.LinkedHashMap[BytesKey, BloomFilter](16, 0.75f, true) {
      override protected def removeEldestEntry(
          eldest: java.util.Map.Entry[BytesKey, BloomFilter]): Boolean =
        if (cachedBytes > MaxCacheBytes) {
          cachedBytes -= eldest.getKey.bytes.length; true
        } else false
    }

  override def nullSafeEval(sketch: Any, key: Any): Any = {
    val bytes = sketch.asInstanceOf[Array[Byte]]
    val k = new BytesKey(bytes)
    var bf = cache.get(k)
    if (bf == null) {
      bf = BloomOps.deserialize(bytes)
      cachedBytes += bytes.length
      cache.put(k, bf)
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

object BloomMightContain {
  /** Content key for serialized sketch blobs: cheap strided-sample hash,
    * exact equality. Safe for any byte-array content.
    */
  private[expressions] final class BytesKey(val bytes: Array[Byte]) {
    override val hashCode: Int = {
      val n = bytes.length
      var h = 31 * n + 17
      if (n > 0) {
        val step = math.max(1, n / 64)
        var i = 0
        while (i < n) { h = h * 31 + bytes(i); i += step }
      }
      h
    }
    override def equals(o: Any): Boolean = o match {
      case k: BytesKey =>
        (k.bytes eq bytes) || java.util.Arrays.equals(k.bytes, bytes)
      case _ => false
    }
  }
}
