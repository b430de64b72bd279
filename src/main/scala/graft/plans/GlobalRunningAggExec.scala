package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, GenericInternalRow, JoinedRow, MutableProjection, RowOrdering, SortOrder, SpecificInternalRow, UnsafeProjection}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, DeclarativeAggregate}
import org.apache.spark.sql.catalyst.plans.physical.{Distribution, OrderedDistribution, Partitioning}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}
import org.apache.spark.sql.execution.metric.{SQLMetric, SQLMetrics}

/** Physical running aggregate over a whole-corpus prefix frame without a
  * single-partition sort: the distributed prefix-sum plan.
  *
  * Requires `OrderedDistribution(order)` + in-partition order, so
  * `EnsureRequirements` plans a RANGE exchange and a parallel sort —
  * exactly the global-`ORDER BY` machinery, parallelism bounded only by
  * the data. On top of the sorted shuffle output:
  *
  *   1. a metadata pass (`sparkContext.runJob`) folds each partition to
  *      ONE aggregation buffer per function (the partition's partial);
  *   2. the driver prefix-merges those partials with the functions' own
  *      `mergeExpressions` — O(partitions × buffer width) state, the
  *      same scale class as the range partitioner's bounds — giving
  *      each partition the buffer of everything BEFORE it;
  *   3. the streaming pass seeds each partition's buffer with its
  *      incoming offset buffer and folds rows forward with the
  *      functions' own `updateExpressions` (associativity of
  *      merge/update is the `DeclarativeAggregate` contract — the same
  *      property partial aggregation relies on), evaluating per row.
  *
  * Frame semantics: a ROWS frame evaluates after each row (strict
  * prefix-inclusive). A RANGE frame's CURRENT ROW bound includes ALL
  * peers of the row, so tied rows share the value of their run's last
  * row: the pass buffers one peer run at a time (rows + their per-row
  * ROWS results), evaluates the RANGE outputs once at run end, and
  * back-fills. Range partitioning places all rows with equal sort keys
  * in one partition, so a run never straddles a boundary (the
  * [[GlobalRankExec]] invariant); peak memory is one peer run — versus
  * `WindowExec`, which buffers the whole partition.
  *
  * Using each aggregate's own init/update/merge/evaluate expressions —
  * never a reimplementation — keeps null handling, Decimal widening,
  * and ANSI overflow semantics bit-identical to the `WindowExec` plan
  * this replaces ([[GlobalRankRule]] rewrites only whitelisted
  * `DeclarativeAggregate`s: Sum/Count/Min/Max/Average/First/Last).
  * Exclusive prefixes (ROWS ... AND 1 PRECEDING) evaluate the buffer
  * BEFORE folding the current row — same pass, zero extra state.
  */
case class GlobalRunningAggExec(order: Seq[SortOrder], aggAttrs: Seq[Attribute],
                                aggs: Seq[Expression],
                                frames: Seq[RunFrame], child: SparkPlan)
    extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output ++ aggAttrs
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(aggAttrs)
  override def outputOrdering: Seq[SortOrder] = order
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override def requiredChildDistribution: Seq[Distribution] =
    OrderedDistribution(order) :: Nil
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(order)

  override lazy val metrics: Map[String, SQLMetric] = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"))

  override protected def withNewChildInternal(newChild: SparkPlan): GlobalRunningAggExec =
    copy(child = newChild)

  protected override def doExecute(): RDD[InternalRow] = {
    val childRdd = child.execute()
    val childOutput = child.output
    val sortOrder = order
    val outAttrs = aggAttrs
    val funcs: Seq[DeclarativeAggregate] =
      aggs.map(GlobalRunningAggExec.innerAggregate(_).aggregateFunction
        .asInstanceOf[DeclarativeAggregate])
    val bufferAttrs = funcs.flatMap(_.aggBufferAttributes)
    val bufferTypes = bufferAttrs.map(_.dataType)
    val initExprs = funcs.flatMap(_.initialValues)
    val updateExprs = funcs.flatMap(_.updateExpressions)
    // the output expression: the aggregate's own evaluate, composed into
    // whatever scalar wrapper later optimizer rules put around the
    // AggregateExpression (e.g. DecimalAggregates' cast/divide)
    val evalExprs = aggs.map(_.transform {
      case a: AggregateExpression =>
        a.aggregateFunction.asInstanceOf[DeclarativeAggregate].evaluateExpression
    })
    val resultTypes = outAttrs.map(_.dataType)
    val frameArr = frames.toArray
    val numOutputRows = longMetric("numOutputRows")

    // pass 1: fold each partition to one partial buffer — pure metadata
    val partials: Array[InternalRow] =
      if (childRdd.getNumPartitions == 0) Array.empty
      else childRdd.sparkContext.runJob(childRdd, (it: Iterator[InternalRow]) => {
        val buf = new SpecificInternalRow(bufferTypes)
        MutableProjection.create(initExprs, Nil).target(buf)(InternalRow.empty)
        val update =
          MutableProjection.create(updateExprs, bufferAttrs ++ childOutput).target(buf)
        val joined = new JoinedRow
        while (it.hasNext) update(joined(buf, it.next()))
        buf.copy() // GenericInternalRow: serializable task result
      })

    // driver prefix-merge: partition p's buffer of everything before it
    // (exclusive), via the functions' own mergeExpressions
    val inputBufferAttrs = funcs.flatMap(_.inputAggBufferAttributes)
    val mergeExprs = funcs.flatMap(_.mergeExpressions)
    val offsets: Array[InternalRow] = {
      val out = new Array[InternalRow](partials.length)
      val init = new SpecificInternalRow(bufferTypes)
      MutableProjection.create(initExprs, Nil).target(init)(InternalRow.empty)
      var acc: InternalRow = init.copy()
      val merge = MutableProjection.create(mergeExprs, bufferAttrs ++ inputBufferAttrs)
      val joined = new JoinedRow
      var p = 0
      while (p < partials.length) {
        out(p) = acc
        // fresh target per step: acc is both merge input and prior output
        acc = merge.target(new SpecificInternalRow(bufferTypes))(
          joined(acc, partials(p))).copy()
        p += 1
      }
      out
    }

    // pass 2: seed each partition's buffer with its offset, fold forward.
    // The O(partitions) offset array ships as a BROADCAST — Torrent
    // moves it once per executor — never in each task's closure (which
    // would be O(P) per task, O(P²) aggregate at cluster scale).
    val anyRange = frameArr.contains(RunFrame.RangeCurrent)
    val exclIdx = frameArr.indices.filter(
      frameArr(_) == RunFrame.RowsExclusive).toArray
    val offsetsB = childRdd.sparkContext.broadcast(offsets)
    childRdd.mapPartitionsWithIndex { (pid, it) =>
      val buf = new SpecificInternalRow(bufferTypes)
      val off = offsetsB.value(pid)
      var i = 0
      while (i < bufferTypes.length) {
        buf.update(i, off.get(i, bufferTypes(i)))
        i += 1
      }
      val update =
        MutableProjection.create(updateExprs, bufferAttrs ++ childOutput).target(buf)
      val resultRow = new SpecificInternalRow(resultTypes)
      val eval = MutableProjection.create(evalExprs, bufferAttrs).target(resultRow)
      val joinedUp = new JoinedRow
      val joinedOut = new JoinedRow
      val outProj = UnsafeProjection.create(
        childOutput ++ outAttrs, childOutput ++ outAttrs)
      // fold one row in and leave resultRow holding its per-row outputs:
      // exclusive-prefix fields evaluate BEFORE the update, the rest after
      val exclSaved = new Array[Any](exclIdx.length)
      def foldRow(r: InternalRow): Unit = {
        if (exclIdx.nonEmpty) {
          eval(buf)
          var k = 0
          while (k < exclIdx.length) {
            exclSaved(k) = InternalRow.copyValue(
              resultRow.get(exclIdx(k), resultTypes(exclIdx(k))))
            k += 1
          }
        }
        update(joinedUp(buf, r))
        eval(buf)
        var k = 0
        while (k < exclIdx.length) {
          resultRow.update(exclIdx(k), exclSaved(k))
          k += 1
        }
      }
      if (!anyRange) {
        // ROWS frames only: strict streaming, no buffering at all
        it.map { r =>
          foldRow(r)
          numOutputRows += 1L
          outProj(joinedOut(r, resultRow))
        }
      } else {
        // a RANGE output exists: buffer one peer run, back-fill at run end
        val ord = RowOrdering.create(sortOrder, childOutput)
        val rangeIdx = frameArr.indices.filter(
          frameArr(_) == RunFrame.RangeCurrent).toArray
        val bIt = it.buffered
        new Iterator[InternalRow] {
          private val pending =
            scala.collection.mutable.Queue.empty[(InternalRow, GenericInternalRow)]
          override def hasNext: Boolean = pending.nonEmpty || bIt.hasNext
          override def next(): InternalRow = {
            if (pending.isEmpty) {
              // read one full peer run
              val first = bIt.next().copy()
              foldRow(first)
              pending.enqueue((first, resultRow.copy().asInstanceOf[GenericInternalRow]))
              while (bIt.hasNext && ord.compare(first, bIt.head) == 0) {
                val r = bIt.next().copy()
                foldRow(r)
                pending.enqueue((r, resultRow.copy().asInstanceOf[GenericInternalRow]))
              }
              // run end: RANGE outputs take the run's final buffer
              eval(buf)
              pending.foreach { case (_, res) =>
                var j = 0
                while (j < rangeIdx.length) {
                  val k = rangeIdx(j)
                  res.update(k, resultRow.get(k, resultTypes(k)))
                  j += 1
                }
              }
            }
            val (r, res) = pending.dequeue()
            numOutputRows += 1L
            outProj(joinedOut(r, res))
          }
        }
      }
    }
  }
}

object GlobalRunningAggExec {
  /** The single `AggregateExpression` inside a (possibly wrapped) agg
    * slot. [[GlobalRankRule]] always plants a bare aggregate, but later
    * optimizer rules may wrap it in scalar post-processing
    * (`DecimalAggregates`: `avg(decimal)` → `cast(divide(avg(…)))`);
    * the execs fold the inner aggregate and compose the wrapper into
    * their evaluate projections. */
  private[plans] def innerAggregate(e: Expression): AggregateExpression =
    e.collectFirst { case a: AggregateExpression => a }.getOrElse(
      throw new IllegalStateException(
        s"global window agg slot lost its AggregateExpression: $e"))
}

/** Physical whole-frame aggregate attach: every row gets the GLOBAL
  * aggregate value, with ZERO exchange — the child keeps whatever
  * partitioning and order it has. One metadata job folds each partition
  * to a partial buffer; the driver merges the partials and evaluates
  * the results ONCE; a map attaches the constant columns to every row.
  * The scale profile is a `count()` plus a map — there is no cheaper
  * correct plan for `agg(x) OVER ()`.
  *
  * When `order` is non-empty (an aggregate is order-sensitive:
  * First/Last over a written ORDER BY) the exec instead requires
  * `OrderedDistribution(order)` + in-partition order: partition-index
  * merge order then equals the global sort order, making the merged
  * First/Last the frame's true first/last row value.
  */
case class GlobalTotalAggExec(aggAttrs: Seq[Attribute],
                              aggs: Seq[Expression],
                              order: Seq[SortOrder],
                              child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output ++ aggAttrs
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(aggAttrs)
  override def outputOrdering: Seq[SortOrder] =
    if (order.nonEmpty) order else child.outputOrdering
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override def requiredChildDistribution: Seq[Distribution] =
    (if (order.nonEmpty) OrderedDistribution(order)
     else org.apache.spark.sql.catalyst.plans.physical.UnspecifiedDistribution) :: Nil
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(order)

  override lazy val metrics: Map[String, SQLMetric] = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"))

  override protected def withNewChildInternal(newChild: SparkPlan): GlobalTotalAggExec =
    copy(child = newChild)

  protected override def doExecute(): RDD[InternalRow] = {
    val childRdd = child.execute()
    val childOutput = child.output
    val outAttrs = aggAttrs
    val funcs: Seq[DeclarativeAggregate] =
      aggs.map(GlobalRunningAggExec.innerAggregate(_).aggregateFunction
        .asInstanceOf[DeclarativeAggregate])
    val bufferAttrs = funcs.flatMap(_.aggBufferAttributes)
    val bufferTypes = bufferAttrs.map(_.dataType)
    val initExprs = funcs.flatMap(_.initialValues)
    val updateExprs = funcs.flatMap(_.updateExpressions)
    val resultTypes = outAttrs.map(_.dataType)
    val numOutputRows = longMetric("numOutputRows")

    val partials: Array[InternalRow] =
      if (childRdd.getNumPartitions == 0) Array.empty
      else childRdd.sparkContext.runJob(childRdd, (it: Iterator[InternalRow]) => {
        val buf = new SpecificInternalRow(bufferTypes)
        MutableProjection.create(initExprs, Nil).target(buf)(InternalRow.empty)
        val update =
          MutableProjection.create(updateExprs, bufferAttrs ++ childOutput).target(buf)
        val joined = new JoinedRow
        while (it.hasNext) update(joined(buf, it.next()))
        buf.copy()
      })

    // driver: merge all partials, evaluate once → the constant columns
    val inputBufferAttrs = funcs.flatMap(_.inputAggBufferAttributes)
    val mergeExprs = funcs.flatMap(_.mergeExpressions)
    val total: InternalRow = {
      val init = new SpecificInternalRow(bufferTypes)
      MutableProjection.create(initExprs, Nil).target(init)(InternalRow.empty)
      var acc: InternalRow = init.copy()
      val merge = MutableProjection.create(mergeExprs, bufferAttrs ++ inputBufferAttrs)
      val joined = new JoinedRow
      partials.foreach { p =>
        acc = merge.target(new SpecificInternalRow(bufferTypes))(joined(acc, p)).copy()
      }
      acc
    }
    val resultValues: InternalRow = {
      val res = new SpecificInternalRow(resultTypes)
      MutableProjection.create(aggs.map(_.transform {
        case a: AggregateExpression =>
          a.aggregateFunction.asInstanceOf[DeclarativeAggregate].evaluateExpression
      }), bufferAttrs).target(res)(total)
      res.copy()
    }

    childRdd.mapPartitions { it =>
      val joined = new JoinedRow
      val outProj = UnsafeProjection.create(
        childOutput ++ outAttrs, childOutput ++ outAttrs)
      it.map { r =>
        numOutputRows += 1L
        outProj(joined(r, resultValues))
      }
    }
  }
}
