package graft.expressions

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.datasketches.quantilescommon.QuantileSearchCriteria

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._

/** Mergeable KLL quantile sketch aggregate (A7) over Datasketches'
  * `KllDoublesSketch` — the approximate, *incremental* twin of the exact
  * range-partitioned percentiles in `graft.stats.Percentiles`:
  * per-partition sketches are fixed-size (O(k·log n) doubles), partials
  * merge on the map side, and a persisted sketch keeps answering quantile
  * questions without rescanning the data (union preserves the sketch's
  * ±~1.65% @ k=200 normalized rank-error guarantee). Returns the
  * serialized sketch (BinaryType) so results can be stored as index-table
  * artifacts and re-merged later — exactly the HLL lifecycle
  * (`x3_hll_artifact`) for quantiles.
  *
  * KLL compaction draws random offsets, so two runs over the same data
  * may produce different (equally valid) sketches — queries built on this
  * are approximate-by-construction and verified by rank-error tolerance
  * in `SketchSpec`, not by a SQL oracle.
  */
case class KllSketchAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllDoublesSketch] {

  require(k >= 8 && k <= 65535, "KLL k must be in [8, 65535]")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == DoubleType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_kll_agg requires a DOUBLE input, got ${child.dataType.sql}")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  override def update(b: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null) b.update(v.asInstanceOf[Double])
    b
  }

  override def merge(b: KllDoublesSketch, other: KllDoublesSketch): KllDoublesSketch = {
    b.merge(other); b
  }

  override def eval(b: KllDoublesSketch): Any = b.toByteArray

  override def serialize(b: KllDoublesSketch): Array[Byte] = b.toByteArray
  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))

  override def withNewMutableAggBufferOffset(newOffset: Int): KllSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): KllSketchAgg =
    copy(child = newChildren(0))
}

/** Union of serialized KLL sketches (the `hll_union_agg` analogue): feeds
  * on BinaryType sketch blobs — stored per-partition/per-day artifacts —
  * and merges them into one sketch. Union is the sketch's native
  * operation, so the merged rank guarantees equal a sketch built over the
  * concatenated inputs.
  */
case class KllUnionAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllDoublesSketch] {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_kll_union requires a BINARY sketch input, got ${child.dataType.sql}")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  // k of the union buffer: merging into a higher-k buffer preserves each
  // input sketch's own accuracy, so use the max supported default (the
  // merged result's error is governed by the inputs' k)
  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(400)

  override def update(b: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null)
      b.merge(KllDoublesSketch.heapify(Memory.wrap(v.asInstanceOf[Array[Byte]])))
    b
  }

  override def merge(b: KllDoublesSketch, other: KllDoublesSketch): KllDoublesSketch = {
    b.merge(other); b
  }

  override def eval(b: KllDoublesSketch): Any = b.toByteArray

  override def serialize(b: KllDoublesSketch): Array[Byte] = b.toByteArray
  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))

  override def withNewMutableAggBufferOffset(newOffset: Int): KllUnionAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllUnionAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): KllUnionAgg =
    copy(child = newChildren(0))
}

/** Scalar quantile extraction from a serialized KLL sketch (INCLUSIVE
  * search criteria — the Datasketches default). Null for a null/empty
  * sketch or a rank outside [0, 1]. Runs on aggregate OUTPUT rows (one
  * per group), far off the hot path — CodegenFallback is fine.
  */
case class KllQuantile(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == DoubleType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_kll_quantile requires (BINARY, DOUBLE), got " +
        s"(${left.dataType.sql}, ${right.dataType.sql})")

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def nullSafeEval(sketchBytes: Any, rank: Any): Any = {
    val r = rank.asInstanceOf[Double]
    if (r < 0.0 || r > 1.0) return null
    val sk = KllDoublesSketch.heapify(
      Memory.wrap(sketchBytes.asInstanceOf[Array[Byte]]))
    if (sk.isEmpty) null
    else sk.getQuantile(r, QuantileSearchCriteria.INCLUSIVE)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): KllQuantile =
    copy(left = newLeft, right = newRight)
}

/** Kolmogorov–Smirnov distance between two serialized KLL sketches
  * (Datasketches' `KolmogorovSmirnov.computeKSDelta` over the sketches'
  * retained-item CDFs) — the 100 TB twin of the exact binned KS in
  * `graft.stats.Drift`: per-slice sketches are O(k·log n), merge
  * map-side, persist as artifacts, and the pairwise drift check runs on
  * KB blobs instead of histograms. Approximate by construction (KLL
  * compaction randomizes), so queries on this are rows-only with the
  * tolerance vs the exact form pinned in `SketchSpec`/`R8bOpsSpec`.
  * Runs on aggregate-output rows — CodegenFallback is fine.
  */
case class KllKsDelta(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == BinaryType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_kll_ks_delta requires (BINARY, BINARY), got " +
        s"(${left.dataType.sql}, ${right.dataType.sql})")

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val ska = KllDoublesSketch.heapify(Memory.wrap(a.asInstanceOf[Array[Byte]]))
    val skb = KllDoublesSketch.heapify(Memory.wrap(b.asInstanceOf[Array[Byte]]))
    if (ska.isEmpty || skb.isEmpty) null
    else org.apache.datasketches.quantilescommon.KolmogorovSmirnov
      .computeKSDelta(ska, skb)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): KllKsDelta =
    copy(left = newLeft, right = newRight)
}
