package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeSet, Expression, JoinedRow, MutableProjection, SortOrder, SpecificInternalRow, UnsafeProjection}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, DeclarativeAggregate}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{Distribution, OrderedDistribution, Partitioning}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}
import org.apache.spark.sql.execution.metric.{SQLMetric, SQLMetrics}

/** Logical plan for scale-safe BOUNDED sliding aggregates over the whole
  * corpus — `agg(x) OVER (ORDER BY ... ROWS BETWEEN <lo> AND <up>)` with
  * BOTH frame ends bounded (k PRECEDING / CURRENT ROW / k FOLLOWING), an
  * empty partition spec: the reference's flagship trailing mean
  * (`etl/etl_job.py:126-130`) written globally, the centered smoothing
  * frame (`a PRECEDING AND b FOLLOWING`), and the pure-following
  * lookahead. Spark plans the empty partition spec as ONE task holding
  * the whole frame, yet a bounded frame needs only a bounded
  * neighbourhood of each row: range-partition the frame
  * ([[GlobalRankPlan]] machinery) and ship only the BOUNDARY ROWS —
  * each partition's last maxBack and first maxFwd aggregate-input
  * tuples — as metadata (O(partitions × reach × inputWidth) driver
  * state, [[GlobalOffsetPlan]]'s tail/head pattern generalized from one
  * value to a tuple of aggregate inputs), seeding a row-local windowed
  * fold.
  *
  * `lowers(i)`/`uppers(i)` are SIGNED row offsets: output i's frame is
  * rows [t+lower, t+upper], lower ≤ upper (-k = k PRECEDING, 0 =
  * CURRENT ROW, +k = k FOLLOWING). Frames clip at the whole frame's
  * head and tail exactly like `WindowExec` (pandas `min_periods=1`
  * parity comes from the same clipping), and an empty clipped frame
  * evaluates the aggregate's initial buffer (null sum, zero count) —
  * `WindowExec`'s contract.
  */
case class GlobalBoundedAggPlan(order: Seq[SortOrder], aggAttrs: Seq[Attribute],
                                aggs: Seq[Expression],
                                lowers: Seq[Int], uppers: Seq[Int],
                                child: LogicalPlan) extends UnaryNode {
  require(aggAttrs.length == aggs.length && aggs.length == lowers.length &&
    lowers.length == uppers.length && aggs.nonEmpty)
  require(lowers.zip(uppers).forall { case (lo, up) => lo <= up })
  override def output: Seq[Attribute] = child.output ++ aggAttrs
  override def producedAttributes: AttributeSet = AttributeSet(aggAttrs)
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): GlobalBoundedAggPlan =
    copy(child = newChild)
}

/** Physical bounded sliding aggregate over the global order without a
  * single-partition sort. Requires `OrderedDistribution(order)` (the
  * family's shared range exchange); on the sorted output:
  *
  *   1. a metadata pass projects each row to the flat tuple of ALL
  *      aggregate inputs and keeps each partition's LAST maxBack and
  *      FIRST maxFwd tuples (ring + prefix — one pass, no partition
  *      buffered whole);
  *   2. the driver stitches per-partition back AND forward contexts —
  *      the tuples immediately before the partition's first row and
  *      after its last row, wherever they live — and broadcasts them
  *      (once per executor);
  *   3. the streaming pass keeps a ring of the last
  *      maxBack+maxFwd+1 input tuples; a row is finalized once the row
  *      maxFwd ahead of it has been read (a pending queue of ≤ maxFwd
  *      row copies — zero when no frame looks forward), re-folding its
  *      in-frame tuples through the aggregate's OWN
  *      init/update/evaluate expressions (rebased onto the stored
  *      tuple attributes with `withNewChildren` — null handling,
  *      Decimal widening, ANSI overflow inherited, not reimplemented);
  *      at partition end the pending rows drain against the forward
  *      context.
  *
  * Re-folding per row is O(frame) — the same cost class as
  * `WindowExec`'s own `SlidingWindowFunctionFrame`, which also rebuilds
  * the buffer each slide (aggregates have no generic inverse update).
  * Peak task memory = the ring + ≤ maxFwd pending rows, versus
  * `WindowExec`'s whole-frame buffer in one task. The rewrite is capped
  * at `spark.graft.globalRank.maxBoundedFrame` rows of reach either
  * side (driver metadata is O(partitions × reach)); larger frames keep
  * Spark's plan.
  *
  * The [[GlobalOffset]] two-pass tie caveat applies: exactness assumes
  * a total order (or order-insensitive tied payloads) because the two
  * passes may observe tied rows in different orders.
  */
case class GlobalBoundedAggExec(order: Seq[SortOrder], aggAttrs: Seq[Attribute],
                                aggs: Seq[Expression],
                                lowers: Seq[Int], uppers: Seq[Int],
                                child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output ++ aggAttrs
  override def producedAttributes: AttributeSet = AttributeSet(aggAttrs)
  override def outputOrdering: Seq[SortOrder] = order
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override def requiredChildDistribution: Seq[Distribution] =
    OrderedDistribution(order) :: Nil
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(order)

  override lazy val metrics: Map[String, SQLMetric] = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"))

  override protected def withNewChildInternal(newChild: SparkPlan): GlobalBoundedAggExec =
    copy(child = newChild)

  protected override def doExecute(): RDD[InternalRow] = {
    // driver-metadata budget: coalesce consecutive sorted partitions
    // (order-preserving, no shuffle) when partitions × reach would
    // exceed the boundary budget — see [[BoundaryBudget]]
    val childRdd = BoundaryBudget.bound(child.execute(),
      math.max(0, -lowers.min).toLong + math.max(0, uppers.max).toLong,
      conf.getConfString(BoundaryBudget.Conf,
        BoundaryBudget.Default.toString).toLong)
    val childOutput = child.output
    val outAttrs = aggAttrs
    val funcs: Seq[DeclarativeAggregate] =
      aggs.map(GlobalRunningAggExec.innerAggregate(_).aggregateFunction
        .asInstanceOf[DeclarativeAggregate])
    // flat tuple of every aggregate's input expressions, evaluated once
    // per row; each function is REBASED onto the tuple slots so its own
    // update expressions read stored inputs instead of child rows
    val inExprs: Seq[Expression] = funcs.flatMap(_.children)
    val valAttrs = inExprs.zipWithIndex.map { case (e, i) =>
      org.apache.spark.sql.catalyst.expressions.AttributeReference(
        s"_in$i", e.dataType, e.nullable)()
    }
    val rebased: Seq[DeclarativeAggregate] = {
      var at = 0
      funcs.map { f =>
        val n = f.children.length
        val slice = valAttrs.slice(at, at + n)
        at += n
        f.withNewChildren(slice).asInstanceOf[DeclarativeAggregate]
      }
    }
    val bufferAttrs = rebased.map(_.aggBufferAttributes)
    val bufferTypes = bufferAttrs.map(_.map(_.dataType))
    val initExprs = rebased.map(_.initialValues)
    val updateExprs = rebased.map(_.updateExpressions)
    // output expression: the REBASED aggregate's evaluate, composed into
    // whatever scalar wrapper later optimizer rules put around the
    // AggregateExpression (DecimalAggregates' cast/divide etc.)
    val evalExprs = aggs.zip(rebased).map { case (e, rb) =>
      e.transform { case _: AggregateExpression => rb.evaluateExpression }
    }
    val resultTypes = outAttrs.map(_.dataType)
    val loArr = lowers.toArray
    val upArr = uppers.toArray
    val maxBack = math.max(0, -loArr.min)
    val maxFwd = math.max(0, upArr.max)
    val numOutputRows = longMetric("numOutputRows")

    // pass 1: each partition's last maxBack and first maxFwd tuples
    val boundary: Array[(Array[InternalRow], Array[InternalRow])] =
      if (childRdd.getNumPartitions == 0) Array.empty
      else childRdd.sparkContext.runJob(childRdd, (it: Iterator[InternalRow]) => {
        val inProj = UnsafeProjection.create(inExprs, childOutput)
        val ring = new Array[InternalRow](math.max(maxBack, 1))
        val heads = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
        var t = 0L
        while (it.hasNext) {
          val tuple = inProj(it.next()).copy()
          if (maxBack > 0) ring((t % maxBack).toInt) = tuple
          if (t < maxFwd) heads += tuple
          t += 1L
        }
        val n = if (maxBack == 0) 0 else math.min(t, maxBack.toLong).toInt
        (Array.tabulate[InternalRow](n)(i => ring(((t - n + i) % maxBack).toInt)),
          heads.toArray)
      })

    // driver stitch: tuples immediately BEFORE partition p's first row
    // and immediately AFTER its last row
    val nPart = boundary.length
    val backCtx = new Array[Array[InternalRow]](nPart)
    locally {
      val running = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
      var p = 0
      while (p < nPart) {
        backCtx(p) = running.toArray
        running ++= boundary(p)._1
        if (running.length > maxBack) running.remove(0, running.length - maxBack)
        p += 1
      }
    }
    val fwdCtx = new Array[Array[InternalRow]](nPart)
    locally {
      val running = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
      var p = nPart - 1
      while (p >= 0) {
        fwdCtx(p) = running.toArray
        running.prependAll(boundary(p)._2)
        if (running.length > maxFwd) running.remove(maxFwd, running.length - maxFwd)
        p -= 1
      }
    }
    val ctxB = childRdd.sparkContext.broadcast((backCtx, fwdCtx))

    // pass 2: ring over relative positions [g-maxBack-maxFwd, g]; row at
    // position e is finalized once position e+maxFwd is read (or at the
    // drain, against the forward context)
    childRdd.mapPartitionsWithIndex { (pid, it) =>
      val inProj = UnsafeProjection.create(inExprs, childOutput)
      // streaming needs [g-maxBack-maxFwd, g]; the DRAIN additionally
      // overlays up to maxFwd forward-context tuples past g while the
      // oldest pending row still reads maxBack behind itself — the
      // simultaneous span is maxBack + pending(≤maxFwd) + fctx(≤maxFwd),
      // so the ring is sized for both
      val cap = maxBack + 2 * maxFwd + 1
      val ring = new Array[InternalRow](cap)
      val bctx = ctxB.value._1(pid) // oldest..newest, length <= maxBack
      val fctx = ctxB.value._2(pid) // first..later, length <= maxFwd
      // relative coords: context rows occupy g in [0, bctx.length);
      // local row t sits at g = bctx.length + t
      var i = 0
      while (i < bctx.length) { ring(i % cap) = bctx(i); i += 1 }
      var g = bctx.length.toLong - 1L // highest position ingested so far
      val updaters = rebased.indices.map { fi =>
        val buf = new SpecificInternalRow(bufferTypes(fi))
        val init = MutableProjection.create(initExprs(fi), Nil).target(buf)
        val upd = MutableProjection.create(
          updateExprs(fi), bufferAttrs(fi) ++ valAttrs).target(buf)
        (buf, init, upd)
      }.toArray
      val resultRow = new SpecificInternalRow(resultTypes)
      val evals = rebased.indices.map { fi =>
        MutableProjection.create(Seq(evalExprs(fi)), bufferAttrs(fi))
      }.toArray
      val joinedUp = new JoinedRow
      val joinedOut = new JoinedRow
      val outProj = UnsafeProjection.create(
        childOutput ++ outAttrs, childOutput ++ outAttrs)
      // evaluate the row at position e against tuples in [loClip, hiClip]
      // (hiCap = highest EXISTING position: g while streaming, g+|fctx
      // used| at drain)
      def evaluate(e: Long, hiCap: Long): Unit = {
        var fi = 0
        while (fi < updaters.length) {
          val (buf, init, upd) = updaters(fi)
          init(InternalRow.empty)
          var pos = math.max(e + loArr(fi), 0L)
          val hi = math.min(e + upArr(fi), hiCap)
          while (pos <= hi) {
            upd(joinedUp(buf, ring((pos % cap).toInt)))
            pos += 1L
          }
          val res = evals(fi)(buf)
          resultRow.update(fi,
            InternalRow.copyValue(res.get(0, resultTypes(fi))))
          fi += 1
        }
      }
      if (maxFwd == 0) {
        // trailing frames: pure streaming, no pending rows
        it.map { r0 =>
          g += 1L
          ring((g % cap).toInt) = inProj(r0).copy()
          evaluate(g, g)
          numOutputRows += 1L
          outProj(joinedOut(r0, resultRow))
        }
      } else {
        val pending = scala.collection.mutable.ArrayDeque.empty[InternalRow]
        new Iterator[InternalRow] {
          private var drained: Iterator[InternalRow] = Iterator.empty
          override def hasNext: Boolean =
            drained.hasNext || it.hasNext || pending.nonEmpty
          override def next(): InternalRow = {
            if (drained.hasNext) return drained.next()
            while (it.hasNext) {
              val r0 = it.next()
              g += 1L
              ring((g % cap).toInt) = inProj(r0).copy()
              pending.append(r0.copy())
              if (pending.length > maxFwd) {
                val row = pending.removeHead()
                evaluate(g - maxFwd, g)
                numOutputRows += 1L
                return outProj(joinedOut(row, resultRow))
              }
            }
            // drain: extend the ring with the forward context, then
            // finalize the pending rows against the true frame end
            var j = 0
            while (j < fctx.length) {
              ring(((g + 1L + j) % cap).toInt) = fctx(j)
              j += 1
            }
            val hiCap = g + fctx.length
            val firstPos = g - pending.length + 1L
            val snapshot = pending.toArray
            pending.clear()
            drained = snapshot.iterator.zipWithIndex.map { case (row, idx) =>
              evaluate(firstPos + idx, hiCap)
              numOutputRows += 1L
              outProj(joinedOut(row, resultRow))
            }
            drained.next()
          }
        }
      }
    }
  }
}
