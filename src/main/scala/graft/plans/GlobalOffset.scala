package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeSet, GenericInternalRow, JoinedRow, MutableProjection, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{Distribution, OrderedDistribution, Partitioning}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}
import org.apache.spark.sql.execution.metric.{SQLMetric, SQLMetrics}

/** Logical plan for scale-safe `lag/lead OVER (ORDER BY ...)` — the last
  * unpartitioned-window shape. An offset function needs only a BOUNDED
  * neighborhood of each row, yet Spark still plans the empty partition
  * spec as one task holding the whole frame. Here the frame is range-
  * partitioned (the [[GlobalRankPlan]] machinery) and only the BOUNDARY
  * VALUES cross partitions: a metadata job collects, per partition and
  * per expression, the first `lead`-offset and last `lag`-offset
  * evaluated input values — O(partitions × offset) driver state, the
  * range-partitioner scale class — and the streaming pass stitches them
  * in as each partition's seed (for lags) and drain (for leads).
  *
  * `off(i)` is the SIGNED row offset of `attrs(i)`: negative = lag
  * (look back), positive = lead (look ahead), 0 = the current row.
  * `defaults(i)` is evaluated against the CURRENT row when the offset
  * row falls off either end of the whole frame — `WindowExec`'s exact
  * contract for `lag(e, n, default)`.
  */
case class GlobalOffsetPlan(order: Seq[SortOrder], attrs: Seq[Attribute],
                            inputs: Seq[org.apache.spark.sql.catalyst.expressions.Expression],
                            offs: Seq[Int],
                            defaults: Seq[org.apache.spark.sql.catalyst.expressions.Expression],
                            child: LogicalPlan) extends UnaryNode {
  require(attrs.length == inputs.length && inputs.length == offs.length &&
    offs.length == defaults.length && attrs.nonEmpty)
  override def output: Seq[Attribute] = child.output ++ attrs
  override def producedAttributes: AttributeSet = AttributeSet(attrs)
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): GlobalOffsetPlan =
    copy(child = newChild)
}

/** Physical lag/lead over the global order without a single-partition
  * sort. Requires `OrderedDistribution(order)` (a parallel range sort);
  * on the sorted output:
  *
  *   1. a metadata pass evaluates each offset's INPUT expression over
  *      just the first/last |off| rows of every partition (values, not
  *      rows — a lag over a 1 MB document column ships only the lagged
  *      column's values);
  *   2. the driver stitches per-partition back/forward contexts by
  *      walking the partition tails/heads in order — each partition
  *      learns the |off| values immediately before its first row and
  *      after its last row, wherever those rows live;
  *   3. the streaming pass answers lags from a ring buffer seeded with
  *      the back context, and leads from a pending queue of at most
  *      max-lead rows, drained at partition end against the forward
  *      context. Peak task memory = max |off| rows — versus
  *      `WindowExec`'s whole-partition buffer.
  *
  * Defaults are evaluated lazily against the current row (matching
  * `WindowExec`); `ignoreNulls` variants are NOT rewritten (their reach
  * is unbounded, so the boundary metadata cannot be sized — the rule
  * leaves them to Spark; the sole exception, offset-1 lag, rewrites as
  * a `Last(ignoreNulls)` exclusive prefix on [[GlobalRunningAggExec]]).
  *
  * Consistency caveat: passes 1 and 2 re-execute the sorted child RDD,
  * and shuffle-fetch order is nondeterministic, so rows TYING on the
  * full ORDER BY may reorder between the executions — a partition's
  * seeded boundary context can then disagree with the neighbor rows
  * pass 2 actually emits near a boundary. Exactness therefore assumes a
  * total order or order-insensitive tied payloads (the same caveat as
  * `stats/GlobalRank`, which persists the sorted frame to close it at
  * the DataFrame level); under a non-total order `WindowExec`'s answer
  * is itself only defined up to the sort's arbitrary tie placement.
  */
case class GlobalOffsetExec(order: Seq[SortOrder], attrs: Seq[Attribute],
                            inputs: Seq[org.apache.spark.sql.catalyst.expressions.Expression],
                            offs: Seq[Int],
                            defaults: Seq[org.apache.spark.sql.catalyst.expressions.Expression],
                            child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output ++ attrs
  override def producedAttributes: AttributeSet = AttributeSet(attrs)
  override def outputOrdering: Seq[SortOrder] = order
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override def requiredChildDistribution: Seq[Distribution] =
    OrderedDistribution(order) :: Nil
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(order)

  override lazy val metrics: Map[String, SQLMetric] = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"))

  override protected def withNewChildInternal(newChild: SparkPlan): GlobalOffsetExec =
    copy(child = newChild)

  protected override def doExecute(): RDD[InternalRow] = {
    // driver metadata here is Σ|offset| values per partition — budget it
    // like the bounded family (see [[BoundaryBudget]])
    val childRdd = BoundaryBudget.bound(child.execute(),
      offs.map(o => math.abs(o).toLong).sum,
      conf.getConfString(BoundaryBudget.Conf,
        BoundaryBudget.Default.toString).toLong)
    val childOutput = child.output
    val outAttrs = attrs
    val inExprs = inputs
    val defExprs = defaults
    val offArr = offs.toArray
    val nExpr = offArr.length
    val backIdx = offArr.indices.filter(offArr(_) < 0).toArray
    val fwdIdx = offArr.indices.filter(offArr(_) > 0).toArray
    val maxFwd = if (fwdIdx.isEmpty) 0 else fwdIdx.map(offArr(_)).max
    val numOutputRows = longMetric("numOutputRows")

    // pass 1: per partition, per expression: the last |off| input values
    // (for lags) and first off values (for leads) — copied out of the
    // row buffers, so they survive the iterator
    val boundary: Array[(Array[Array[Any]], Array[Array[Any]])] =
      if (childRdd.getNumPartitions == 0) Array.empty
      else childRdd.sparkContext.runJob(childRdd, (it: Iterator[InternalRow]) => {
        val inProj = MutableProjection.create(inExprs, childOutput)
        val types = inExprs.map(_.dataType).toArray
        // ring of the last |off_j| values per back expr; list of the
        // first off_j values per fwd expr
        val tails = backIdx.map(j => new Array[Any](-offArr(j)))
        val heads = fwdIdx.map(j =>
          scala.collection.mutable.ArrayBuffer.empty[Any])
        var t = 0L
        while (it.hasNext) {
          val vals = inProj(it.next())
          var k = 0
          while (k < backIdx.length) {
            val j = backIdx(k)
            val cap = -offArr(j)
            tails(k)((t % cap).toInt) =
              InternalRow.copyValue(vals.get(j, types(j)))
            k += 1
          }
          k = 0
          while (k < fwdIdx.length) {
            val j = fwdIdx(k)
            if (t < offArr(j)) {
              heads(k) += InternalRow.copyValue(vals.get(j, types(j)))
            }
            k += 1
          }
          t += 1L
        }
        // unroll each ring into oldest..newest order, trimmed to t rows
        val tailsOrdered = backIdx.indices.map { k =>
          val cap = tails(k).length
          val n = math.min(t, cap.toLong).toInt
          Array.tabulate[Any](n)(i => tails(k)(((t - n + i) % cap).toInt))
        }.toArray
        (tailsOrdered, heads.map(_.toArray))
      })

    // driver stitch: back context (the |off| values before partition p's
    // first row) and forward context (the off values after its last row)
    val nPart = boundary.length
    val backCtx = Array.ofDim[Array[Any]](nPart, backIdx.length)
    locally {
      val running = backIdx.map(j =>
        scala.collection.mutable.ArrayBuffer.empty[Any])
      var p = 0
      while (p < nPart) {
        var k = 0
        while (k < backIdx.length) {
          backCtx(p)(k) = running(k).toArray
          val cap = -offArr(backIdx(k))
          running(k) ++= boundary(p)._1(k)
          if (running(k).length > cap)
            running(k).remove(0, running(k).length - cap)
          k += 1
        }
        p += 1
      }
    }
    val fwdCtx = Array.ofDim[Array[Any]](nPart, fwdIdx.length)
    locally {
      val running = fwdIdx.map(j =>
        scala.collection.mutable.ArrayBuffer.empty[Any])
      var p = nPart - 1
      while (p >= 0) {
        var k = 0
        while (k < fwdIdx.length) {
          fwdCtx(p)(k) = running(k).toArray
          val cap = offArr(fwdIdx(k))
          running(k).prependAll(boundary(p)._2(k))
          if (running(k).length > cap)
            running(k).remove(cap, running(k).length - cap)
          k += 1
        }
        p -= 1
      }
    }

    // pass 2: ring-seeded lags, queue-drained leads. Both O(partitions)
    // context tables ship as ONE broadcast (once per executor), never in
    // each task's closure (O(P²) aggregate transfer at cluster scale).
    val ctxB = childRdd.sparkContext.broadcast((backCtx, fwdCtx))
    childRdd.mapPartitionsWithIndex { (pid, it) =>
      val inProj = MutableProjection.create(inExprs, childOutput)
      val defProj = MutableProjection.create(defExprs, childOutput)
      val types = inExprs.map(_.dataType).toArray
      val outProj = UnsafeProjection.create(
        childOutput ++ outAttrs, childOutput ++ outAttrs)
      val joined = new JoinedRow
      // lag rings seeded from the back context: ring(i mod cap) holds the
      // value of global-row (i - cap); valid marks seeds that exist
      val rings = backIdx.indices.map { k =>
        val cap = -offArr(backIdx(k))
        val ring = new Array[Any](cap)
        val valid = new Array[Boolean](cap)
        val ctx = ctxB.value._1(pid)(k) // oldest..newest, length <= cap
        var i = 0
        while (i < cap) {
          // at step i the ring slot must hold row (i - cap) = the
          // (cap - i)-th-from-last context value
          val ci = ctx.length - (cap - i)
          if (ci >= 0) { ring(i) = ctx(ci); valid(i) = true }
          i += 1
        }
        (ring, valid)
      }.toArray
      var t = 0L // local row index
      if (fwdIdx.isEmpty) {
        // lags/zero only: pure streaming, no row copies, no queue
        val res = new GenericInternalRow(nExpr)
        it.map { r0 =>
          val vals = inProj(r0)
          val defs = defProj(r0)
          var i = 0
          while (i < nExpr) {
            if (offArr(i) == 0) res.update(i, vals.get(i, types(i)))
            else res.update(i, defs.get(i, defExprs(i).dataType))
            i += 1
          }
          var k = 0
          while (k < backIdx.length) {
            val j = backIdx(k)
            val cap = -offArr(j)
            val (ring, valid) = rings(k)
            val slot = (t % cap).toInt
            if (valid(slot)) res.update(j, ring(slot))
            ring(slot) = InternalRow.copyValue(vals.get(j, types(j)))
            valid(slot) = true
            k += 1
          }
          t += 1L
          numOutputRows += 1L
          outProj(joined(r0, res))
        }
      } else {
        // the general (lead-bearing) pass: pending queue of at most
        // max-lead rows, drained at partition end against the forward
        // context
        val pending =
          scala.collection.mutable.ArrayDeque.empty[(InternalRow, GenericInternalRow)]
        new Iterator[InternalRow] {
        private var drained: Iterator[InternalRow] = Iterator.empty
        private def emit(r: InternalRow, res: GenericInternalRow): InternalRow = {
          numOutputRows += 1L
          outProj(joined(r, res))
        }
        override def hasNext: Boolean =
          it.hasNext || pending.nonEmpty || drained.hasNext
        override def next(): InternalRow = {
          if (drained.hasNext) return drained.next()
          while (it.hasNext && pending.length <= maxFwd) {
            val r0 = it.next()
            val vals = inProj(r0)
            val defs = defProj(r0)
            val res = new GenericInternalRow(nExpr)
            var i = 0
            while (i < nExpr) {
              if (offArr(i) == 0) {
                res.update(i, InternalRow.copyValue(vals.get(i, types(i))))
              } else {
                // prefill with the default; lags overwrite now, leads
                // overwrite when their target row is read (or at drain)
                res.update(i, InternalRow.copyValue(defs.get(i, defExprs(i).dataType)))
              }
              i += 1
            }
            var k = 0
            while (k < backIdx.length) {
              val j = backIdx(k)
              val cap = -offArr(j)
              val (ring, valid) = rings(k)
              val slot = (t % cap).toInt
              if (valid(slot)) res.update(j, ring(slot))
              ring(slot) = InternalRow.copyValue(vals.get(j, types(j)))
              valid(slot) = true
              k += 1
            }
            // this row's values resolve the leads of rows read offs ago
            k = 0
            while (k < fwdIdx.length) {
              val j = fwdIdx(k)
              val back = offArr(j) // rows behind in the pending queue
              if (pending.length >= back) {
                pending(pending.length - back)._2
                  .update(j, InternalRow.copyValue(vals.get(j, types(j))))
              }
              k += 1
            }
            pending.append((r0.copy(), res))
            t += 1L
            if (pending.length > maxFwd) {
              val (r, res2) = pending.removeHead()
              return emit(r, res2)
            }
          }
          // partition exhausted: drain pending against the forward
          // context (lazily: outProj reuses one buffer, so each row must
          // be projected only when consumed)
          val ctx = ctxB.value._2(pid)
          val snapshot = pending.toArray
          pending.clear()
          val n = snapshot.length
          drained = snapshot.iterator.zipWithIndex.map { case ((r, res), idx) =>
            val after = n - 1 - idx // rows after it in this partition
            var k = 0
            while (k < fwdIdx.length) {
              val j = fwdIdx(k)
              val need = offArr(j) - after
              if (need > 0 && need <= ctx(k).length) {
                res.update(j, ctx(k)(need - 1))
              } // else: already filled in-partition, or default stands
              k += 1
            }
            emit(r, res)
          }
          drained.next()
        }
        }
      }
    }
  }
}
