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
  * corpus — `agg(x) OVER (ORDER BY ... ROWS BETWEEN k PRECEDING AND
  * [CURRENT ROW | j PRECEDING])` with an empty partition spec: the
  * reference's own flagship shape (a 7-row rolling mean,
  * `etl/etl_job.py:126-130`) written globally. Spark plans the empty
  * partition spec as ONE task holding the whole frame, yet a k-row
  * sliding frame needs exactly the k rows before each row: range-
  * partition the frame ([[GlobalRankPlan]] machinery) and ship only the
  * BOUNDARY ROWS — each partition's last k aggregate-input tuples — as
  * metadata (O(partitions × k × inputWidth) driver state, the
  * [[GlobalOffsetPlan]] tail-ring pattern generalized from one value to
  * a row of aggregate inputs), seeding a row-local windowed fold.
  *
  * `lowers(i)`/`uppers(i)` bound output i's frame in ROWS: lower k ≥ 1
  * (k PRECEDING), upper ∈ [-(k), 0] (0 = CURRENT ROW, -j = j
  * PRECEDING). Frames clip at the whole frame's head exactly like
  * `WindowExec` (the first rows aggregate fewer inputs — pandas
  * `min_periods=1` parity comes from the same clipping), and an empty
  * clipped frame evaluates the aggregate's initial buffer (null sum,
  * zero count) — `WindowExec`'s contract.
  */
case class GlobalBoundedAggPlan(order: Seq[SortOrder], aggAttrs: Seq[Attribute],
                                aggs: Seq[Expression],
                                lowers: Seq[Int], uppers: Seq[Int],
                                child: LogicalPlan) extends UnaryNode {
  require(aggAttrs.length == aggs.length && aggs.length == lowers.length &&
    lowers.length == uppers.length && aggs.nonEmpty)
  require(lowers.zip(uppers).forall { case (lo, up) =>
    lo >= 1 && up <= 0 && -up <= lo })
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
  *      aggregate inputs and keeps each partition's LAST kMax tuples
  *      (ring buffer — one pass, no partition buffered whole);
  *   2. the driver stitches per-partition back contexts — the kMax
  *      tuples immediately before each partition's first row, wherever
  *      they live — and broadcasts them (once per executor);
  *   3. the streaming pass keeps a ring of the last kMax+1 input tuples
  *      (seeded from the back context) and, per row and per aggregate,
  *      re-folds its ≤ k+1 in-frame tuples through the aggregate's OWN
  *      init/update/evaluate expressions (rebased onto the stored
  *      tuple attributes with `withNewChildren` — null handling,
  *      Decimal widening, ANSI overflow inherited, not reimplemented).
  *
  * Re-folding per row is O(k) — the same cost class as `WindowExec`'s
  * own `SlidingWindowFunctionFrame`, which also rebuilds the buffer
  * each slide (aggregates have no generic inverse update). Peak task
  * memory = kMax+1 input tuples, versus `WindowExec`'s whole-frame
  * buffer in one task. The rewrite is capped at
  * `spark.graft.globalRank.maxBoundedFrame` rows of reach (driver
  * metadata is O(partitions × kMax)); larger frames keep Spark's plan.
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
    val childRdd = child.execute()
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
    val kMax = loArr.max
    val numOutputRows = longMetric("numOutputRows")

    // pass 1: each partition's last kMax input tuples, oldest..newest
    val tails: Array[Array[InternalRow]] =
      if (childRdd.getNumPartitions == 0) Array.empty
      else childRdd.sparkContext.runJob(childRdd, (it: Iterator[InternalRow]) => {
        val inProj = UnsafeProjection.create(inExprs, childOutput)
        val ring = new Array[InternalRow](kMax)
        var t = 0L
        while (it.hasNext) {
          ring((t % kMax).toInt) = inProj(it.next()).copy()
          t += 1L
        }
        val n = math.min(t, kMax.toLong).toInt
        Array.tabulate[InternalRow](n)(i => ring(((t - n + i) % kMax).toInt))
      })

    // driver stitch: the kMax tuples immediately before partition p
    val nPart = tails.length
    val backCtx = new Array[Array[InternalRow]](nPart)
    locally {
      val running = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
      var p = 0
      while (p < nPart) {
        backCtx(p) = running.toArray
        running ++= tails(p)
        if (running.length > kMax) running.remove(0, running.length - kMax)
        p += 1
      }
    }
    val ctxB = childRdd.sparkContext.broadcast(backCtx)

    // pass 2: ring of the last kMax+1 tuples; per row, per aggregate,
    // re-fold its in-frame tuples
    childRdd.mapPartitionsWithIndex { (pid, it) =>
      val inProj = UnsafeProjection.create(inExprs, childOutput)
      val cap = kMax + 1
      val ring = new Array[InternalRow](cap)
      // seed: ring slot (t mod cap) will hold global row t; before the
      // first local row (local t=0 at ring slot seeded+0) place the
      // context rows at the slots their global positions map to
      val ctx = ctxB.value(pid) // oldest..newest, length <= kMax
      var avail = ctx.length    // rows present in the ring before current
      var i = 0
      while (i < ctx.length) {
        // context row j (0-based oldest) is global row (t0 - ctx.length + j)
        // for first local row t0; index rings RELATIVE: local row t sits at
        // slot ((t + ctx.length) mod cap), context row j at slot (j mod cap)
        ring(i % cap) = ctx(i)
        i += 1
      }
      var t = 0L // local row index
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
      it.map { r0 =>
        val slot = ((t + ctx.length) % cap).toInt
        ring(slot) = inProj(r0).copy()
        if (avail < cap) avail += 1
        var fi = 0
        while (fi < updaters.length) {
          val (buf, init, upd) = updaters(fi)
          init(InternalRow.empty)
          // frame rows: positions (t - lo) .. (t + up) clipped to the
          // avail-1 rows before t (plus t itself)
          val lo = loArr(fi)
          val up = upArr(fi)
          var back = math.min(lo.toLong, avail - 1L).toInt // how far back to start
          while (back >= -up) {
            val s = ((t + ctx.length - back) % cap + cap) % cap
            upd(joinedUp(buf, ring(s.toInt)))
            back -= 1
          }
          val res = evals(fi)(buf)
          resultRow.update(fi, InternalRow.copyValue(
            res.get(0, resultTypes(fi))))
          fi += 1
        }
        t += 1L
        numOutputRows += 1L
        outProj(joinedOut(r0, resultRow))
      }
    }
  }
}
