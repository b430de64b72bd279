package graft.expressions

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded min-heap buffer: keeps the k best (score, id) pairs seen.
  * "Better" = higher score, ties broken by lower id — a total order, so
  * results are deterministic and match `ORDER BY score DESC, id` exactly.
  */
final class TopKBuffer(val k: Int) {
  // worst element first, so eviction is O(log k)
  private val heap = scala.collection.mutable.PriorityQueue.empty[(Double, Long)](
    Ordering.by[(Double, Long), (Double, Long)] { case (s, i) => (-s, i) })

  private def better(a: (Double, Long), b: (Double, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  def add(score: Double, id: Long): Unit = {
    val e = (score, id)
    if (heap.size < k) heap.enqueue(e)
    else if (better(e, heap.head)) { heap.dequeue(); heap.enqueue(e) }
  }

  def merge(other: TopKBuffer): Unit = other.heap.foreach(e => add(e._1, e._2))

  def elements: Seq[(Double, Long)] = heap.toSeq

  /** best-first: score desc, id asc */
  def sortedDesc: Seq[(Double, Long)] =
    heap.toSeq.sortBy { case (s, i) => (-s, i) }
}

/** Group-wise top-k as a single-pass aggregate: O(k) state per group, map-
  * side partial aggregation (each task keeps its local top-k, merge is
  * heap-union) — no per-group sort, no window, no full candidate
  * materialization. This is the scale shape for "top-k neighbors per
  * query" ranking; the salted two-phase window variant in `SimSearch`
  * is the built-in-only alternative it is verified against.
  *
  * Returns `array<struct<score double, id bigint>>` sorted best-first
  * (score desc, id asc — deterministic under score ties).
  */
case class TopKByScore(
    score: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer] {

  require(k > 0, "k must be positive")

  // analysis-time type check (ADVICE r2): update() hard-casts, so a float
  // score or int id reaching eval would be a mid-job ClassCastException;
  // the SQL builder inserts casts for numeric inputs before this runs
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (score.dataType == DoubleType && id.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_topk requires (score DOUBLE, id BIGINT), got " +
          s"(${score.dataType.sql}, ${id.dataType.sql})")

  override def children: Seq[Expression] = Seq(score, id)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("score", DoubleType), StructField("id", LongType))),
    containsNull = false)

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(b: TopKBuffer, input: InternalRow): TopKBuffer = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null)
      b.add(s.asInstanceOf[Double], i.asInstanceOf[Long])
    b
  }

  override def merge(b: TopKBuffer, other: TopKBuffer): TopKBuffer = {
    b.merge(other); b
  }

  override def eval(b: TopKBuffer): Any =
    new GenericArrayData(b.sortedDesc.map { case (s, i) => InternalRow(s, i) })

  override def serialize(b: TopKBuffer): Array[Byte] = {
    val bytes = new ByteArrayOutputStream()
    val out = new DataOutputStream(bytes)
    val es = b.elements
    out.writeInt(b.k)
    out.writeInt(es.size)
    es.foreach { case (s, i) => out.writeDouble(s); out.writeLong(i) }
    out.flush()
    bytes.toByteArray
  }

  override def deserialize(storageFormat: Array[Byte]): TopKBuffer = {
    val in = new DataInputStream(new java.io.ByteArrayInputStream(storageFormat))
    val buf = new TopKBuffer(in.readInt())
    val n = in.readInt()
    (1 to n).foreach(_ => buf.add(in.readDouble(), in.readLong()))
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScore =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScore =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): TopKByScore =
    copy(score = newChildren(0), id = newChildren(1))
}
