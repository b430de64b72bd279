package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.physical.{Distribution, OrderedDistribution, Partitioning}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}
import org.apache.spark.sql.execution.metric.{SQLMetric, SQLMetrics}

/** Physical global ranking without a single-partition sort.
  *
  * Requires `OrderedDistribution(order)` + in-partition order, so
  * `EnsureRequirements` plans a RANGE exchange and a parallel sort —
  * the same machinery as a global `ORDER BY`, whose parallelism is
  * bounded only by the data, never one task. On top of the sorted
  * shuffle output this runs the `RDD.zipWithIndex` two-pass:
  *
  *   1. a metadata pass (`sparkContext.runJob`) counts rows — and,
  *      when a rank/dense_rank output is needed, distinct-key runs —
  *      per partition: O(partitions) driver state, the same scale
  *      class as the range partitioner's own bounds;
  *   2. the streaming rank pass adds `offset + local position` (and
  *      run-aware rank/dense values) per partition. No task ever holds
  *      more than its own partition; the pass is a pure iterator map.
  *
  * Correctness of rank/dense_rank across partition boundaries relies on
  * range partitioning placing ALL rows with equal sort keys in the same
  * partition (RangePartitioner's binary-search assignment is a pure
  * function of the key), so a tie run can never straddle a boundary;
  * AQE's partition coalescing only merges adjacent ranges, preserving
  * that invariant. Both passes read the SAME materialized shuffle
  * output, so they cannot disagree on the partitioning (the persist
  * trick `stats/GlobalRank` needs at the DataFrame level is free here).
  *
  * The count job runs eagerly inside `doExecute` — precedent: the range
  * exchange itself runs an eager sampling job the same way.
  *
  * Rank values are `IntegerType`, matching `RowNumber`/`RankLike`
  * (`org.apache.spark.sql.catalyst.expressions.windowExpressions`), so
  * a rewritten plan is type-identical to the window it replaces.
  */
case class GlobalRankExec(order: Seq[SortOrder], rankAttrs: Seq[Attribute],
                          rankKinds: Seq[RankKind], child: SparkPlan)
    extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output ++ rankAttrs
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(rankAttrs)
  override def outputOrdering: Seq[SortOrder] = order
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override def requiredChildDistribution: Seq[Distribution] =
    OrderedDistribution(order) :: Nil
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(order)

  override lazy val metrics: Map[String, SQLMetric] = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"))

  override protected def withNewChildInternal(newChild: SparkPlan): GlobalRankExec =
    copy(child = newChild)

  protected override def doExecute(): RDD[InternalRow] = {
    val childRdd = child.execute()
    val childOutput = child.output
    val sortOrder = order
    // run boundaries only matter when a tie-aware output exists; plain
    // row_number/ntile skip every comparison and copy
    val needRuns = rankKinds.exists {
      case RankKind.Rank | RankKind.DenseRank | RankKind.PercentRank => true
      case _ => false
    }
    val kinds = rankKinds.toArray
    val numOutputRows = longMetric("numOutputRows")

    // pass 1: per-partition (rows, distinct-key runs) — pure metadata
    val counts: Array[(Long, Long)] =
      if (childRdd.getNumPartitions == 0) Array.empty
      else childRdd.sparkContext.runJob(childRdd, (it: Iterator[InternalRow]) => {
        if (needRuns) {
          val ord = RowOrdering.create(sortOrder, childOutput)
          var rows = 0L
          var runs = 0L
          var rep: InternalRow = null // copy of the current run's first row
          while (it.hasNext) {
            val r = it.next()
            rows += 1L
            if (rep == null || ord.compare(rep, r) != 0) {
              runs += 1L
              rep = r.copy()
            }
          }
          (rows, runs)
        } else {
          var rows = 0L
          while (it.hasNext) { it.next(); rows += 1L }
          (rows, 0L)
        }
      })
    // exclusive prefix sums: partition p's first row/run global offsets
    val rowOffsets = new Array[Long](counts.length)
    val runOffsets = new Array[Long](counts.length)
    var accRows = 0L
    var accRuns = 0L
    var p = 0
    while (p < counts.length) {
      rowOffsets(p) = accRows
      runOffsets(p) = accRuns
      accRows += counts(p)._1
      accRuns += counts(p)._2
      p += 1
    }
    val totalRows = accRows // ntile / percent_rank need the global count

    // pass 2: streaming rank append per partition. cume_dist needs the
    // tie run's END position, so its presence buffers one peer run at a
    // time; every other kind streams row by row. The O(partitions)
    // offset arrays ship as ONE broadcast (once per executor), never in
    // each task's closure (O(P²) aggregate transfer at cluster scale).
    val hasCume = kinds.contains(RankKind.CumeDist)
    val offsetsB = childRdd.sparkContext.broadcast((rowOffsets, runOffsets))
    childRdd.mapPartitionsWithIndex { (pid, it) =>
      val rowOff = offsetsB.value._1(pid)
      val runOff = offsetsB.value._2(pid)
      val ord =
        if (needRuns || hasCume) RowOrdering.create(sortOrder, childOutput)
        else null
      val proj = UnsafeProjection.create(
        childOutput ++ rankAttrs, childOutput ++ rankAttrs)
      val joined = new JoinedRow
      val rankRow = new GenericInternalRow(kinds.length)
      var localPos = 0L  // 1-based position within the partition
      var runStart = 0L  // localPos of the current run's first row
      var runIdx = 0L    // 1-based run index within the partition
      var rep: InternalRow = null
      // fill rankRow's non-cume fields for the row at localPos/runStart
      def fillRanks(): Unit = {
        var i = 0
        while (i < kinds.length) {
          kinds(i) match {
            case RankKind.RowNumber =>
              rankRow.update(i, (rowOff + localPos).toInt)
            case RankKind.Rank =>
              rankRow.update(i, (rowOff + runStart).toInt)
            case RankKind.DenseRank =>
              rankRow.update(i, (runOff + runIdx).toInt)
            case RankKind.Ntile(k) =>
              // N rows into k as-even buckets, remainder to the first
              // buckets (Spark's NTile semantics): position p lands in
              // bucket (p-1) div (q+1) + 1 while inside the r oversized
              // buckets, then strides by q
              val pGlobal = rowOff + localPos
              val q = totalRows / k
              val r = totalRows % k
              val big = r * (q + 1)
              val b =
                if (pGlobal <= big) (pGlobal - 1) / (q + 1) + 1
                else r + (pGlobal - big - 1) / q + 1
              rankRow.update(i, b.toInt)
            case RankKind.PercentRank =>
              val rank = rowOff + runStart
              rankRow.update(i,
                if (totalRows > 1L) (rank - 1).toDouble / (totalRows - 1L)
                else 0.0d)
            case RankKind.CumeDist => () // filled at run end (buffered path)
          }
          i += 1
        }
      }
      if (!hasCume) {
        it.map { r =>
          localPos += 1L
          if (needRuns && (rep == null || ord.compare(rep, r) != 0)) {
            runStart = localPos
            runIdx += 1L
            rep = r.copy()
          }
          fillRanks()
          numOutputRows += 1L
          proj(joined(r, rankRow))
        }
      } else {
        val cumeIdx = kinds.indices.filter(kinds(_) == RankKind.CumeDist).toArray
        val bIt = it.buffered
        new Iterator[InternalRow] {
          private val pending =
            scala.collection.mutable.Queue.empty[(InternalRow, GenericInternalRow)]
          override def hasNext: Boolean = pending.nonEmpty || bIt.hasNext
          override def next(): InternalRow = {
            if (pending.isEmpty) {
              // read one full peer run, per-row values as in streaming
              var done = false
              while (!done) {
                val r = bIt.next().copy()
                localPos += 1L
                if (rep == null || ord.compare(rep, r) != 0) {
                  runStart = localPos
                  runIdx += 1L
                  rep = r
                }
                fillRanks()
                pending.enqueue(
                  (r, rankRow.copy().asInstanceOf[GenericInternalRow]))
                done = !bIt.hasNext || ord.compare(rep, bIt.head) != 0
              }
              // run end: inclusive distribution = last peer's position / N
              val cd = (rowOff + localPos).toDouble / totalRows
              pending.foreach { case (_, rr) =>
                var j = 0
                while (j < cumeIdx.length) { rr.update(cumeIdx(j), cd); j += 1 }
              }
            }
            val (r, rr) = pending.dequeue()
            numOutputRows += 1L
            proj(joined(r, rr))
          }
        }
      }
    }
  }
}
