package graft.plans

import org.apache.spark.SparkException
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, AttributeSet, CurrentRow, Expression, JoinedRow, Literal, MutableProjection, SortOrder, SpecificInternalRow, UnaryMinus, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, DeclarativeAggregate}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{Distribution, OrderedDistribution, Partitioning}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}
import org.apache.spark.sql.execution.metric.{SQLMetric, SQLMetrics}
import org.apache.spark.sql.types.{DataType, DateType, DayTimeIntervalType, IntegerType, LongType, TimestampNTZType, TimestampType, YearMonthIntervalType}

/** Shared pieces of the VALUE-DISTANCE (RANGE) frame rewrite — the last
  * common plain-SQL window shape that still planned a one-task (global)
  * or ndv-task (keyed) sort (VERDICT r11 missing #1): `agg(x) OVER
  * ([PARTITION BY k] ORDER BY t RANGE BETWEEN <lo> AND <up>)` with
  * value-distance bounds — trailing (`Δ PRECEDING AND CURRENT ROW`, the
  * reference's `w9_window_frames` trailing-2-day shape, ref
  * `etl/etl_job.py:126-130` is its row-count cousin), strictly-preceding,
  * CENTERED (`a PRECEDING AND b FOLLOWING`) and pure-following.
  *
  * Scope: ONE ascending NULLS FIRST order key of an integer-backed type
  * (int/long/date/timestamp), literal signed distances — fixed (int/long,
  * or a day-time interval over timestamps) or calendar MONTHS (a
  * year-month interval over date/timestamp orders; edges evaluated per
  * peer run with Spark's own clamping month arithmetic) — with lo ≤ up,
  * global AND keyed (the keyed forward stitch is key-scoped: contexts
  * chain only through single-key partitions of the same key). Anything
  * else — descending orders, non-literal bounds — keeps Spark's plan.
  */
private[plans] object RangeFrames {

  /** Order types whose sort value is an int/long under the hood. */
  def supportedOrderType(dt: DataType): Boolean = dt match {
    case IntegerType | LongType | DateType | TimestampType |
         TimestampNTZType => true
    case _ => false
  }

  /** A SIGNED frame-edge distance: fixed (in order units — days for
    * dates, µs for timestamps) or calendar MONTHS (a YM interval over a
    * date/timestamp order — variable length, so the edge is computed per
    * peer run with Spark's own month arithmetic); or UNBOUNDED (r12
    * verdict #3 — the half-unbounded shapes `UNBOUNDED PRECEDING AND Δ
    * FOLLOWING` / `Δ PRECEDING AND UNBOUNDED FOLLOWING`; both-unbounded
    * is the whole-frame total and never reaches here). An unbounded side
    * is served by PREFIX/SUFFIX SEEDS (per-partition partial buffers,
    * driver-merged along the partition chain — the running exec's merge
    * contract) rather than row harvests, so only merge-safe aggregates
    * ride it. NULL-ordered rows: a bounded RANGE frame of a value row
    * excludes the null group (null < v+lo), but an UNBOUNDED side
    * includes it — `UNBOUNDED PRECEDING` starts at the partition head
    * (where nulls sort), and a null row's `v+lo` bound is null, below
    * everything (exactly `WindowExec`'s RangeBoundOrdering arithmetic). */
  sealed trait RBound extends Serializable
  final case class RFixed(d: Long) extends RBound
  final case class RMonths(m: Int) extends RBound
  case object RUnbounded extends RBound

  /** Largest |months| the rewrite accepts (10 000 years). Past this —
    * or at `Int.MinValue`, whose abs stays negative — [[reachOf]]'s
    * conservative 31-day expansion would overflow Long µs and a
    * negative reach makes the retention deques evict everything
    * (silently-wrong cross-partition frames), so [[signedBound]]
    * refuses the rewrite and keeps Spark's plan instead. */
  val MaxMonths: Int = 120000

  /** `Δ PRECEDING` → negative (the parser spells it `UnaryMinus(lit)`;
    * constant folding may have collapsed it to a negative literal),
    * `CURRENT ROW` → fixed 0, `Δ FOLLOWING` → positive. */
  def signedBound(bound: Expression, orderType: DataType): Option[RBound] = {
    // Long.MinValue is refused like RMonths' Int.MinValue: its negation
    // overflows (math.abs stays negative), so the sign-based inward/
    // outward classification and the reach arithmetic would both
    // misread it — Spark's plan answers the absurd literal correctly
    def lit(e: Expression): Option[RBound] = e match {
      case Literal(v: Int, IntegerType) => Some(RFixed(v.toLong))
      case Literal(v: Long, LongType)
          if v != Long.MinValue => Some(RFixed(v))
      case Literal(v: Long, _: DayTimeIntervalType)
          if v != Long.MinValue => Some(RFixed(v))
      case Literal(m: Int, _: YearMonthIntervalType)
          if m != Int.MinValue && math.abs(m) <= MaxMonths => Some(RMonths(m))
      case _ => None
    }
    def typeOk(e: Expression): Boolean = (orderType, e.dataType) match {
      case (IntegerType, IntegerType) => true
      case (LongType, IntegerType | LongType) => true
      case (DateType, IntegerType) => true
      case (TimestampType | TimestampNTZType, _: DayTimeIntervalType) => true
      case (DateType | TimestampType | TimestampNTZType,
            _: YearMonthIntervalType) => true
      case _ => false
    }
    def neg(b: RBound): RBound = b match {
      case RFixed(d) => RFixed(-d)
      case RMonths(m) => RMonths(-m)
    }
    bound match {
      case CurrentRow => Some(RFixed(0L))
      case UnaryMinus(e, _) if typeOk(e) => lit(e).map(neg)
      case e if typeOk(e) => lit(e)
      case _ => None
    }
  }

  /** `lo ≤ up` when statically comparable; mixed units are accepted —
    * a per-row inverted frame is simply empty, matching `WindowExec`. */
  def boundsOrdered(lo: RBound, up: RBound): Boolean = (lo, up) match {
    case (RFixed(a), RFixed(b)) => a <= b
    case (RMonths(a), RMonths(b)) => a <= b
    case _ => true // RUnbounded on either side is always ordered
  }

  /** CONSERVATIVE reach of a bound in order units (every month is ≤ 31
    * days; +2 days absorbs DST and clamping slack) — used only for the
    * pass-1 harvests and driver stitches, which may over-keep; the exact
    * per-run edges come from [[boundEdgeExpr]]. */
  def reachOf(b: RBound, orderType: DataType): Long = b match {
    case RUnbounded => 0L // served by prefix/suffix seeds, not harvests
    case RFixed(d) => if (d == Long.MinValue) Long.MaxValue else math.abs(d)
    case RMonths(m) =>
      // |m| ≤ MaxMonths by [[signedBound]]'s gate, so neither multiply
      // can overflow (31 * 120000 + 2 days ≈ 3.2e17 µs ≪ Long.MaxValue);
      // the guards are defense-in-depth for any future caller.
      val am = if (m == Int.MinValue) Int.MaxValue.toLong else math.abs(m.toLong)
      val days = 31L * am + 2L
      if (orderType == DateType) days
      else if (days > Long.MaxValue / 86400000000L) Long.MaxValue
      else days * 86400000000L
  }

  /** The order-typed expression computing `orderRef + b` with Spark's
    * OWN arithmetic — exactly what `WindowExecBase.createBoundOrdering`
    * would build, so month clamping and timezone semantics are
    * bit-identical. */
  def boundEdgeExpr(orderRef: Expression, b: RBound, orderType: DataType,
                    timeZoneId: String): Option[Expression] = b match {
    case RFixed(_) | RUnbounded => None // saturating long edges
    case RMonths(m) =>
      val ym = Literal(m, org.apache.spark.sql.types.YearMonthIntervalType())
      Some(orderType match {
        case DateType =>
          org.apache.spark.sql.catalyst.expressions.DateAddYMInterval(orderRef, ym)
        case _ =>
          org.apache.spark.sql.catalyst.expressions.TimestampAddYMInterval(
            orderRef, ym, Some(timeZoneId))
      })
  }

  /** Sort value of the tuple's order slot as a long. */
  def longAt(row: InternalRow, idx: Int, dt: DataType): Long = dt match {
    case IntegerType | DateType => row.getInt(idx).toLong
    case _ => row.getLong(idx)
  }

  /** `a + d` saturating at both Long extremes. */
  def satAdd(a: Long, d: Long): Long = {
    val r = a + d
    if (d > 0 && r < a) Long.MaxValue
    else if (d < 0 && r > a) Long.MinValue
    else r
  }

  def overflow(maxHarvest: Int, site: String): Nothing = throw new SparkException(
    s"Range-frame rewrite ($site): more than $maxHarvest rows fell within " +
      "the RANGE distance of a partition edge (or of one frame), so the " +
      "rewrite cannot serve the frame exactly within its row budget. " +
      s"Raise ${GlobalRankRule.MaxRangeRowsConf} for denser frames, or " +
      s"disable ${GlobalRankRule.RewriteConf} / " +
      s"${KeyedWindowRule.RewriteConf} for this query.")
}

/** Logical plan for the GLOBAL value-distance frame — empty partition
  * spec. `(los(i), ups(i))` are output i's SIGNED frame distances in
  * order units; the frame of a row with order value v is every row with
  * value in [v + lo, v + up] — INCLUDING peers at exactly v when the
  * bound touches 0 (RANGE CURRENT ROW semantics), which is safe to
  * compute per partition because the range partitioner sends equal sort
  * keys (nulls included) to one partition: peer runs and null groups
  * never straddle a seam. Rows with a NULL order value form their own
  * peer group (frame = the null group), matching `WindowExec`.
  */
case class GlobalRangeAggPlan(order: Seq[SortOrder], aggAttrs: Seq[Attribute],
                              aggs: Seq[Expression],
                              los: Seq[RangeFrames.RBound],
                              ups: Seq[RangeFrames.RBound],
                              child: LogicalPlan) extends UnaryNode {
  require(aggAttrs.length == aggs.length && aggs.length == los.length &&
    los.length == ups.length && aggs.nonEmpty &&
    los.zip(ups).forall { case (l, u) => RangeFrames.boundsOrdered(l, u) })
  override def output: Seq[Attribute] = child.output ++ aggAttrs
  override def producedAttributes: AttributeSet = AttributeSet(aggAttrs)
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): GlobalRangeAggPlan =
    copy(child = newChild)
}

/** Keyed cousin — `PARTITION BY k` with a provably small ndv
  * ([[KeyedWindowRule]]'s gate): per-key resets of the sliding
  * structures and key-scoped boundary stitches (forward contexts chain
  * only through single-key partitions of the same key), the
  * [[KeyedBoundedAggPlan]] discipline transplanted from row counts to
  * value distances — two-sided included. */
case class KeyedRangeAggPlan(partKeys: Seq[Expression], order: Seq[SortOrder],
                             aggAttrs: Seq[Attribute], aggs: Seq[Expression],
                             los: Seq[RangeFrames.RBound],
                             ups: Seq[RangeFrames.RBound],
                             child: LogicalPlan) extends UnaryNode {
  require(partKeys.nonEmpty && aggAttrs.length == aggs.length &&
    aggs.length == los.length && los.length == ups.length && aggs.nonEmpty &&
    los.zip(ups).forall { case (l, u) => RangeFrames.boundsOrdered(l, u) })
  override def output: Seq[Attribute] = child.output ++ aggAttrs
  override def producedAttributes: AttributeSet = AttributeSet(aggAttrs)
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): KeyedRangeAggPlan =
    copy(child = newChild)
}

/** Physical value-distance frame aggregate over a range exchange —
  * global when `partKeys` is empty, keyed otherwise. On the
  * `OrderedDistribution(keys ++ order)` sorted output:
  *
  *   1. a metadata pass keeps, per partition, the trailing tuples within
  *      maxBack of the partition's LAST value (back context for later
  *      partitions) and — when any frame has a FOLLOWING upper bound —
  *      the leading non-null tuples within maxFwd of its FIRST non-null
  *      value (forward context for earlier partitions), each a
  *      value-retention deque capped at
  *      `spark.graft.globalRank.maxRangeRows` rows (a cap drop is
  *      remembered by its most-threatening dropped value: if a
  *      neighbouring partition's threshold would have qualified a
  *      dropped row, the exec refuses loudly rather than answer wrong —
  *      a value frame's row count is unknowable at plan time);
  *   2. the driver walks partitions forward (back contexts) and backward
  *      (forward contexts) with the same retention, under the family's
  *      [[BoundaryBudget]];
  *   3. the streaming pass runs, per output, a STAGING GATE (a tuple
  *      enters the fold only once the run being computed has
  *      v + up ≥ its value) in front of either a TWO-STACK sliding fold
  *      ([[RangeAggExec]]'s SWAG structure: O(1) amortized updates per
  *      row for merge-safe aggregates, one merge per peer run) or — for
  *      the bounded-only float moments — a sequential per-run re-fold in
  *      `WindowExec`'s own operation order (bit-identity preserved, and
  *      `WindowExec`'s own cost class). Peer runs with a FOLLOWING bound
  *      park in a pending queue and finalize when the stream passes
  *      v + up (partition tails finalize against the stitched forward
  *      context); up ≤ 0 outputs finalize eagerly, so trailing frames
  *      stream with zero lag. Null-valued runs fold their own peer group
  *      (wholly local, see [[GlobalRangeAggPlan]]).
  *
  * Peak task memory is the densest value window (frame + pending +
  * staging — pending and staging refuse loudly past the row cap; the
  * moment path caps its held frame exactly, the two-stack path at 2×
  * the cap since its deques also span the capped pending runs — the
  * same class as `WindowExec`'s own sliding-frame buffer); driver
  * metadata is
  * O(partitions × maxRangeRows) worst-case, budgeted by
  * [[BoundaryBudget]] like the rest of the family.
  *
  * HALF-UNBOUNDED frames (r12 #3, merge-safe aggregates only):
  * `UNBOUNDED PRECEDING AND Δ FOLLOWING` outputs fold a PREFIX buffer —
  * no row retention, seeded with driver-merged per-partition segment
  * totals (the running exec's merge contract, key-scoped) — and stream
  * with Δ lag, so cumulative-with-lookahead scales exactly like the
  * trailing frames. `Δ PRECEDING AND UNBOUNDED FOLLOWING` outputs hold
  * every run pending until the partition/key flush and merge a SUFFIX
  * seed (the mirror stitch): their memory is the key's span — O(rows
  * per key) keyed, O(rows per partition) global — held in-heap under
  * the same loud row cap; `WindowExec` buffers the same span, spillably,
  * in ONE task. Unbounded sides include the NULL GROUP (Spark's
  * RangeBoundOrdering arithmetic: `UNBOUNDED PRECEDING` starts at the
  * partition head where nulls sort, and a null row's `v + lo` bound is
  * null, below everything), so null tuples feed the prefix/suffix
  * structures — never the bounded ones — and a suffix output's null
  * run finalizes at the flush with everything from its group head.
  */
case class RangeAggExec(partKeys: Seq[Expression], order: Seq[SortOrder],
                        aggAttrs: Seq[Attribute], aggs: Seq[Expression],
                        los: Seq[RangeFrames.RBound], ups: Seq[RangeFrames.RBound],
                        child: SparkPlan) extends UnaryExecNode {

  private val full =
    if (partKeys.isEmpty) order else KeyedWindowExec.fullOrder(partKeys, order)

  override def output: Seq[Attribute] = child.output ++ aggAttrs
  override def producedAttributes: AttributeSet = AttributeSet(aggAttrs)
  override def outputOrdering: Seq[SortOrder] = full
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override def requiredChildDistribution: Seq[Distribution] =
    OrderedDistribution(full) :: Nil
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(full)

  override lazy val metrics: Map[String, SQLMetric] = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"))

  override protected def withNewChildInternal(newChild: SparkPlan): RangeAggExec =
    copy(child = newChild)

  protected override def doExecute(): RDD[InternalRow] = {
    val maxHarvest =
      conf.getConfString(GlobalRankRule.MaxRangeRowsConf, "16384").toInt
    val orderExprEarly = order.head.child
    val orderTypeEarly = orderExprEarly.dataType
    // half-unbounded classification is needed up front: INWARD shapes
    // (r13 — a partner bound that cuts into the seeded side) extend the
    // harvest reaches, which feed the shipping budget below
    val prefixArr: Array[Boolean] = los.map(_ == RangeFrames.RUnbounded).toArray
    val suffixArr: Array[Boolean] = ups.map(_ == RangeFrames.RUnbounded).toArray
    def backReachOf(b: RangeFrames.RBound): Long = b match {
      case RangeFrames.RUnbounded => 0L // prefix seeds, not harvests
      case RangeFrames.RFixed(d) => math.max(0L, -d)
      case RangeFrames.RMonths(m) =>
        if (m >= 0) 0L else RangeFrames.reachOf(b, orderTypeEarly)
    }
    def fwdReachOf(b: RangeFrames.RBound): Long = b match {
      case RangeFrames.RUnbounded => 0L // suffix seeds, not harvests
      case RangeFrames.RFixed(d) => math.max(0L, d)
      case RangeFrames.RMonths(m) =>
        if (m <= 0) 0L else RangeFrames.reachOf(b, orderTypeEarly)
    }
    // INWARD prefix (`UNBOUNDED PRECEDING AND k PRECEDING`): the previous
    // chain's trailing k-band must travel as BACK context (the seed is
    // band-cut), so a negative upper bound contributes back reach.
    // Mirrored, an inward suffix's positive lower bound contributes
    // forward reach.
    val preInArr: Array[Boolean] = prefixArr.zip(ups).map {
      case (true, u) => backReachOf(u) > 0L
      case _ => false
    }
    val sufInArr: Array[Boolean] = suffixArr.zip(los).map {
      case (true, l) => fwdReachOf(l) > 0L
      case _ => false
    }
    val anyPreIn = preInArr.exists(identity)
    val anySufIn = sufInArr.exists(identity)
    val maxBack = (los.map(backReachOf) ++
      ups.zip(prefixArr).collect { case (u, true) => backReachOf(u) }).max
    val maxFwd = (ups.map(fwdReachOf) ++
      los.zip(suffixArr).collect { case (l, true) => fwdReachOf(l) }).max
    // a partition ships up to maxHarvest BACK tuples plus, when anything
    // needs a forward harvest, maxHarvest FORWARD tuples — budget the
    // true per-partition reach
    val budgetReach =
      if (maxFwd > 0L) 2L * maxHarvest else maxHarvest.toLong
    val childRdd = BoundaryBudget.bound(child.execute(), budgetReach,
      conf.getConfString(BoundaryBudget.Conf,
        BoundaryBudget.Default.toString).toLong)
    val childOutput = child.output
    val keyExprs = partKeys
    val keyed = keyExprs.nonEmpty
    val outAttrs = aggAttrs
    val orderExpr = orderExprEarly
    val orderType = orderTypeEarly
    val funcs: Seq[DeclarativeAggregate] =
      aggs.map(GlobalRunningAggExec.innerAggregate(_).aggregateFunction
        .asInstanceOf[DeclarativeAggregate])
    val inExprs: Seq[Expression] = funcs.flatMap(_.children)
    val orderIdx = inExprs.length
    val tupleExprs = inExprs :+ orderExpr
    val valAttrs = inExprs.zipWithIndex.map { case (e, i) =>
      AttributeReference(s"_in$i", e.dataType, e.nullable)()
    }
    val tupleAttrs = valAttrs :+
      AttributeReference("_ord", orderType, orderExpr.nullable)()
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
    val evalExprs = aggs.zip(rebased).map { case (e, rb) =>
      e.transform { case _: AggregateExpression => rb.evaluateExpression }
    }
    val resultTypes = outAttrs.map(_.dataType)
    val loArr = los.toArray
    val upArr = ups.toArray
    val nAggs = loArr.length
    val timeZoneId = conf.sessionLocalTimeZone
    val anyFwd = maxFwd > 0L
    // half-unbounded outputs (r12 #3): unbounded-PRECEDING outputs fold a
    // seeded prefix buffer (no row retention); unbounded-FOLLOWING outputs
    // hold runs pending until the partition/key flush and merge a suffix
    // seed. Both need per-partition SEGMENT TOTALS (pass-1 partials of the
    // first/last key segment) driver-merged along the partition chain —
    // the running exec's merge contract. INWARD shapes (r13) BAND-CUT
    // those segments at the harvest boundary: the band rows travel as
    // the ordinary boundary context tuples and the driver folds rows
    // leaving the context retention into the seed accumulators.
    val anyPrefix = prefixArr.exists(identity)
    val anySuffix = suffixArr.exists(identity)
    val needSegs = anyPrefix || anySuffix
    // outputs whose frame can never extend past the current run's value:
    // they finalize eagerly, so pure-trailing nodes stream with zero lag
    val eagerArr: Array[Boolean] = upArr.map(u =>
      u != RangeFrames.RUnbounded && fwdReachOf(u) == 0L)
    val numOutputRows = longMetric("numOutputRows")

    import RangeFrames.{longAt, satAdd}

    // ---- pass 1: per-partition boundary harvests --------------------------
    // (firstKey, firstIsNull, firstVal, lastKey, lastVal (Long.MinValue =
    //  no non-null row), back harvest oldest→newest, backDrop, backDropMax,
    //  fwd harvest oldest→newest, fwdDrop, fwdDropMin,
    //  segFirst, segLast: per-fi partial buffers of the FIRST / LAST key
    //  segment (ALL rows incl. null-ordered; equal when single-key/global;
    //  null when no half-unbounded output needs them))
    type Boundary = (InternalRow, Boolean, Long, InternalRow, Long,
      Array[InternalRow], Boolean, Long, Array[InternalRow], Boolean, Long,
      Array[InternalRow], Array[InternalRow])
    val boundary: Array[Boundary] =
      if (childRdd.getNumPartitions == 0) Array.empty
      else childRdd.sparkContext.runJob(childRdd, (it: Iterator[InternalRow]) => {
        val keyProj =
          if (keyed) UnsafeProjection.create(keyExprs, childOutput) else null
        val proj = UnsafeProjection.create(tupleExprs, childOutput)
        val dq = scala.collection.mutable.ArrayDeque.empty[InternalRow]
        val fwd = scala.collection.mutable.ArrayDeque.empty[InternalRow]
        var firstKey: InternalRow = null
        var lastKey: UnsafeRow = null
        var firstIsNull = false
        var firstVal = 0L
        var seenFirst = false
        var lastVal = Long.MinValue
        var backDrop = false
        var backDropMax = Long.MinValue
        var fwdDrop = false
        var fwdDropMin = Long.MaxValue
        // segment totals for the half-unbounded seeds: fold EVERY tuple
        // (null-ordered included — unbounded sides include the null
        // group) of the current key segment; remember the first segment
        val segUpd = if (!needSegs) null else rebased.indices.map { fi =>
          val buf = new SpecificInternalRow(bufferTypes(fi))
          val init = MutableProjection.create(initExprs(fi), Nil).target(buf)
          val upd = MutableProjection.create(
            updateExprs(fi), bufferAttrs(fi) ++ tupleAttrs).target(buf)
          init(InternalRow.empty)
          (buf, init, upd)
        }.toArray
        val segJoin = new JoinedRow
        var segFirst: Array[InternalRow] = null
        def segSnapshot(): Array[InternalRow] =
          segUpd.map(_._1.copy(): InternalRow)
        def segReset(): Unit = segUpd.foreach(_._2(InternalRow.empty))
        def segFold(fi: Int, t: InternalRow): Unit =
          segUpd(fi)._3(segJoin(segUpd(fi)._1, t))
        // inward band-cut folds: a row evicted from the BACK harvest is
        // provably below every later consumer's frame edge (retention
        // invariant, maxBack ≥ each inward |up|), so it belongs in the
        // inward-prefix segments — FIFO, so even order-sensitive buffers
        // would stay exact; cap evictions are guarded by the stitch's
        // existing drop refusal
        def foldPreIn(t: InternalRow): Unit = {
          var fi = 0
          while (fi < preInArr.length) {
            if (preInArr(fi)) segFold(fi, t); fi += 1
          }
        }
        def foldSufIn(t: InternalRow): Unit = {
          var fi = 0
          while (fi < sufInArr.length) {
            if (sufInArr(fi)) segFold(fi, t); fi += 1
          }
        }
        // fwd harvest state: threshold fixes at the FIRST non-null value;
        // keyed, the harvest stops at the first key change (frames never
        // cross keys, so only the FIRST key can serve earlier partitions)
        var fwdThr = Long.MaxValue
        var fwdThrSet = false
        var fwdOpen = anyFwd
        while (it.hasNext) {
          val r = it.next()
          if (keyed) {
            val k = keyProj(r)
            if (lastKey == null) { firstKey = k.copy(); lastKey = k.copy() }
            else if (!lastKey.equals(k)) {
              lastKey = k.copy()
              dq.clear()
              backDrop = false; backDropMax = Long.MinValue
              fwdOpen = false
              if (needSegs) {
                if (segFirst == null) segFirst = segSnapshot()
                segReset()
              }
            }
          }
          val t = proj(r).copy()
          // routing (r13 inward band-split): inward-PREFIX segments take
          // rows only as they LEAVE the back harvest (the retained band
          // is context, not seed); inward-SUFFIX segments take rows that
          // never enter (or are cap-popped from) the forward harvest;
          // everything else folds at arrival, as before
          var addedFwd = false
          if (!seenFirst) {
            seenFirst = true
            firstIsNull = t.isNullAt(orderIdx)
            firstVal = if (firstIsNull) 0L else longAt(t, orderIdx, orderType)
          }
          if (!t.isNullAt(orderIdx)) {
            val v = longAt(t, orderIdx, orderType)
            lastVal = v
            val thr = satAdd(v, -maxBack)
            // natural retention: provably outside every later threshold
            while (dq.nonEmpty && (dq.head.isNullAt(orderIdx) ||
                longAt(dq.head, orderIdx, orderType) < thr)) {
              val e = dq.removeHead()
              if (anyPreIn && needSegs) foldPreIn(e)
            }
            // forward harvest: leading non-null tuples within maxFwd of
            // the first non-null value (a superset of what any earlier
            // partition can need, since its last value precedes ours)
            if (fwdOpen) {
              if (!fwdThrSet) { fwdThr = satAdd(v, maxFwd); fwdThrSet = true }
              if (v <= fwdThr) {
                fwd.append(t)
                addedFwd = true
                if (fwd.length > maxHarvest) {
                  val h = fwd.removeLast() // keep the NEAREST tuples
                  fwdDrop = true
                  fwdDropMin = math.min(fwdDropMin,
                    longAt(h, orderIdx, orderType))
                  // the popped row (the just-appended, farthest one)
                  // leaves the harvest — inward-suffix segments take it
                  // here; the fwd-stitch drop refusal guards the serve
                  if (anySufIn && needSegs) foldSufIn(h)
                }
              } else fwdOpen = false
            }
          }
          if (needSegs) {
            var fi = 0
            while (fi < segUpd.length) {
              if (!preInArr(fi) && !(sufInArr(fi) && addedFwd)) segFold(fi, t)
              fi += 1
            }
          }
          dq.append(t)
          if (dq.length > maxHarvest) {
            val h = dq.removeHead()
            if (anyPreIn && needSegs) foldPreIn(h)
            if (!h.isNullAt(orderIdx)) {
              backDrop = true
              backDropMax = math.max(backDropMax,
                longAt(h, orderIdx, orderType))
            }
          }
        }
        val segLast = if (needSegs && seenFirst) segSnapshot() else null
        (firstKey, firstIsNull, firstVal, lastKey: InternalRow, lastVal,
          dq.toArray, backDrop, backDropMax, fwd.toArray, fwdDrop, fwdDropMin,
          if (segFirst != null) segFirst else segLast, segLast)
      })

    // ---- driver stitch ----------------------------------------------------
    val nPart = boundary.length
    val backCtx = new Array[Array[InternalRow]](nPart)
    // inward-prefix band accounting (r13): rows the context retention
    // lets go of are provably below every later consumer's frame edge
    // (retention invariant: value < fVal − maxBack ≤ fVal + up for every
    // inward up), so they move from CONTEXT to SEED — logged per served
    // partition and folded into the inward seed slots by the prefix-seed
    // walk below. A chain break discards the log with the retention.
    val preInLog: Array[Array[InternalRow]] =
      if (anyPreIn) new Array[Array[InternalRow]](nPart) else null
    locally {
      // forward walk with the same retention → back contexts
      val running = scala.collection.mutable.ArrayDeque.empty[InternalRow]
      var runningKey: InternalRow = null
      val letGo = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
      var gDrop = false
      var gDropVal = Long.MinValue
      var p = 0
      while (p < nPart) {
        val (fk, fNull, fVal, lk, _, harvest, hDrop, hDropVal, _, _, _, _, _) =
          boundary(p)
        // a partition that saw any row harvests ≥ 1 tuple (the clear at a
        // key change is always followed by that row's append)
        if (harvest.isEmpty) {
          backCtx(p) = Array.empty
          if (anyPreIn) preInLog(p) = Array.empty
        } else {
          val continues = !keyed ||
            (runningKey != null && fk != null &&
              KeyedWindowExec.keyEq(fk, runningKey))
          if (!continues || running.isEmpty || fNull) {
            // !continues / empty: chain break or chain head. fNull: a
            // null first value's peers are wholly local, and the branch
            // can only be reached with an EMPTY retention anyway — a
            // key's null group never straddles partitions (equal sort
            // keys co-partition) and nothing of the same key can sort
            // below it, so a continuing chain before a null-headed
            // partition holds no rows
            backCtx(p) = Array.empty
            if (anyPreIn) preInLog(p) = Array.empty
          } else {
            val thr = satAdd(fVal, -maxBack)
            if (gDrop && gDropVal >= thr) RangeFrames.overflow(maxHarvest, "back stitch")
            var i = 0
            while (i < running.length && (running(i).isNullAt(orderIdx) ||
                longAt(running(i), orderIdx, orderType) < thr)) {
              i += 1
            }
            backCtx(p) = Array.tabulate(running.length - i)(j => running(i + j))
            if (anyPreIn) {
              // below-threshold rows will never serve a later context
              // either (thresholds are monotone) — fold them into the
              // inward seeds now and drop them from the retention
              var j = 0
              while (j < i) { letGo += running.removeHead(); j += 1 }
              preInLog(p) = letGo.toArray
              letGo.clear()
            }
          }
        }
        // fold p's harvest into the running deque (key-aware)
        if (harvest.nonEmpty) {
          if (keyed &&
              (runningKey == null || !KeyedWindowExec.keyEq(lk, runningKey))) {
            running.clear()
            letGo.clear()
            gDrop = false; gDropVal = Long.MinValue
          }
          if (hDrop) { gDrop = true; gDropVal = math.max(gDropVal, hDropVal) }
          running.appendAll(harvest)
          val last = running.last
          if (!last.isNullAt(orderIdx)) {
            val thr = satAdd(longAt(last, orderIdx, orderType), -maxBack)
            while (running.nonEmpty && (running.head.isNullAt(orderIdx) ||
                longAt(running.head, orderIdx, orderType) < thr)) {
              val e = running.removeHead()
              if (anyPreIn) letGo += e
            }
          }
          while (running.length > maxHarvest) {
            val h = running.removeHead()
            if (anyPreIn) letGo += h
            if (!h.isNullAt(orderIdx)) {
              gDrop = true
              gDropVal = math.max(gDropVal,
                longAt(h, orderIdx, orderType))
            }
          }
          if (keyed) runningKey = lk
        }
        p += 1
      }
    }
    val fwdCtx = new Array[Array[InternalRow]](nPart)
    // inward-suffix band accounting (r13, mirror of preInLog): rows the
    // forward retention lets go of sit ABOVE every earlier consumer's
    // frame start (value > lastVal + maxFwd ≥ lastVal + lo for every
    // inward lo), so they move from CONTEXT to SEED — logged per served
    // partition and folded by the suffix-seed walk below.
    val sufInLog: Array[Array[InternalRow]] =
      if (anySufIn) new Array[Array[InternalRow]](nPart) else null
    if (anyFwd && nPart > 0) {
      // backward walk → forward contexts. `coming` = non-null tuples from
      // later partitions, ascending, nearest first — keyed, all of ONE
      // key (`comingKey`): a partition's leading harvest is its FIRST
      // key's tuples, and the chain extends through a partition only
      // when that partition is single-key and of the same key, since
      // frames never cross keys.
      val coming = scala.collection.mutable.ArrayDeque.empty[InternalRow]
      var comingKey: InternalRow = null
      val letGoS = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
      var gDrop = false
      var gDropMin = Long.MaxValue
      var p = nPart - 1
      while (p >= 0) {
        val (fk, _, _, lk, lastVal, harvest, _, _, fwdHarvest, fDrop, fDropMin,
          _, _) = boundary(p)
        if (harvest.isEmpty) {
          // the partition saw no rows — pass through untouched (coming /
          // comingKey / gDrop survive), mirroring the forward walk's
          // harvest.isEmpty handling: an empty partition inside a key's
          // run must not break the chain for earlier partitions
          fwdCtx(p) = Array.empty
          if (anySufIn) sufInLog(p) = Array.empty
        } else {
        val servesP = lastVal != Long.MinValue && coming.nonEmpty &&
          (!keyed || (lk != null && comingKey != null &&
            KeyedWindowExec.keyEq(lk, comingKey)))
        if (!servesP) {
          // no non-null row (null frames are local), nothing ahead, or
          // the coming tuples belong to a different key — a drop can
          // never hide here: drops always leave survivors in `coming`
          // (the cap trims, never empties) and die with a chain break
          fwdCtx(p) = Array.empty
          if (anySufIn) {
            // an ALL-NULL partition (nulls sort first, so a dense null
            // group can own a whole range partition) has no value
            // threshold to serve context with, but its null runs'
            // unbounded-following frames span EVERY later same-chain
            // row — the retained head-band rows (excluded from the cut
            // segments) move to its seed wholesale, or they would be
            // lost when the chain ends here
            if (lastVal == Long.MinValue && coming.nonEmpty &&
                (!keyed || (lk != null && comingKey != null &&
                  KeyedWindowExec.keyEq(lk, comingKey)))) {
              letGoS ++= coming
              coming.clear()
              sufInLog(p) = letGoS.toArray
              letGoS.clear()
            } else sufInLog(p) = Array.empty
          }
        } else {
          val thr = satAdd(lastVal, maxFwd)
          if (gDrop && gDropMin <= thr) RangeFrames.overflow(maxHarvest, "forward stitch")
          var i = 0
          while (i < coming.length &&
              longAt(coming(i), orderIdx, orderType) <= thr) {
            i += 1
          }
          fwdCtx(p) = Array.tabulate(i)(coming(_))
          if (anySufIn) {
            // above-threshold rows can serve no earlier context either
            // (thresholds shrink walking backward) — move them from the
            // retention into the inward suffix seeds
            while (coming.length > i) { letGoS += coming.removeLast() }
            sufInLog(p) = letGoS.toArray
            letGoS.clear()
          }
        }
        // p's own leading harvest becomes the nearest context for earlier
        // partitions; the old chain survives only through a single-key
        // partition of the same key
        val chains = !keyed || (fk != null && lk != null &&
          comingKey != null && KeyedWindowExec.keyEq(fk, lk) &&
          KeyedWindowExec.keyEq(lk, comingKey))
        if (!chains) {
          coming.clear()
          letGoS.clear()
          gDrop = false; gDropMin = Long.MaxValue
        }
        if (fDrop) { gDrop = true; gDropMin = math.min(gDropMin, fDropMin) }
        coming.prependAll(fwdHarvest)
        while (coming.length > maxHarvest) {
          val h = coming.removeLast()
          if (anySufIn) letGoS += h
          gDrop = true
          gDropMin = math.min(gDropMin, longAt(h, orderIdx, orderType))
        }
        if (keyed && fk != null) comingKey = fk
        }
        p -= 1
      }
    } else {
      java.util.Arrays.fill(fwdCtx.asInstanceOf[Array[AnyRef]], Array.empty[InternalRow])
    }

    // ---- seed stitches for the half-unbounded outputs ---------------------
    // prefix seed of partition p = driver-merged segment totals of the
    // chain of SAME-KEY partitions before p (global: all partitions
    // before p); suffix seed = the mirror over partitions after p. The
    // merges replay the aggregates' own mergeExpressions in partition-
    // index order — the running exec's contract, so First/Last and
    // order-sensitive buffers stay exact. Per-fi entries are null when
    // that output needs no seed or no chain exists.
    val inputBufferAttrs = rebased.map(_.inputAggBufferAttributes)
    val mergeExprsPer = rebased.map(_.mergeExpressions)
    val prefixSeed = new Array[Array[InternalRow]](nPart)
    val suffixSeed = new Array[Array[InternalRow]](nPart)
    if (needSegs && nPart > 0) {
      val mergeProjs = rebased.indices.map { fi =>
        MutableProjection.create(
          mergeExprsPer(fi), bufferAttrs(fi) ++ inputBufferAttrs(fi))
      }.toArray
      val joinedM = new JoinedRow
      def mergeAll(a: Array[InternalRow], b: Array[InternalRow]): Array[InternalRow] =
        rebased.indices.map { fi =>
          mergeProjs(fi).target(new SpecificInternalRow(bufferTypes(fi)))(
            joinedM(a(fi), b(fi))).copy(): InternalRow
        }.toArray
      // fold band-log TUPLES into the INWARD slots of an accumulator
      // (r13): inward shapes are commutative-fold aggregates, so the
      // interleaving of log rows with segment merges cannot move a
      // value. One update projection per inward fi, hoisted out of the
      // per-partition walk (codegen compiles once) and retargeted per
      // call — the mergeProjs discipline.
      val joinedF = new JoinedRow
      val preInIdx = rebased.indices.filter(preInArr(_)).toArray
      val sufInIdx = rebased.indices.filter(sufInArr(_)).toArray
      val inwardUpd: Map[Int, MutableProjection] =
        (preInIdx ++ sufInIdx).map { fi =>
          fi -> MutableProjection.create(
            updateExprs(fi), bufferAttrs(fi) ++ tupleAttrs)
        }.toMap
      def foldInward(acc: Array[InternalRow], idxs: Array[Int],
                     rows: scala.collection.Seq[InternalRow]): Array[InternalRow] =
        if (rows.isEmpty) acc
        else {
          val out = acc.clone()
          var k = 0
          while (k < idxs.length) {
            val fi = idxs(k)
            val types = bufferTypes(fi)
            val buf = new SpecificInternalRow(types)
            var c = 0
            while (c < types.length) {
              buf.update(c, InternalRow.copyValue(acc(fi).get(c, types(c))))
              c += 1
            }
            val upd = inwardUpd(fi).target(buf)
            var r = 0
            while (r < rows.length) { upd(joinedF(buf, rows(r))); r += 1 }
            out(fi) = buf
            k += 1
          }
          out
        }
      if (anyPrefix) {
        var acc: Array[InternalRow] = null
        var accKey: InternalRow = null
        val carry = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
        var p = 0
        while (p < nPart) {
          val (fk, _, _, lk, _, harvest, _, _, _, _, _, segF, segL) = boundary(p)
          if (anyPreIn && preInLog(p) != null) carry ++= preInLog(p)
          if (harvest.nonEmpty) {
            val continues = !keyed ||
              (accKey != null && fk != null && KeyedWindowExec.keyEq(fk, accKey))
            if (continues && acc != null) {
              // rows that left the context retention join the inward
              // seed slots here — and stay in acc for later partitions
              if (anyPreIn && carry.nonEmpty) {
                acc = foldInward(acc, preInIdx, carry)
                carry.clear()
              }
              prefixSeed(p) = acc
            }
            val singleKey = !keyed || KeyedWindowExec.keyEq(fk, lk)
            if (!(singleKey && continues && acc != null)) carry.clear()
            acc =
              if (singleKey && continues && acc != null) mergeAll(acc, segL)
              else segL // chain restarts at p's last key's own segment
            accKey = lk
          }
          p += 1
        }
        // a multi-key partition's segF is never accumulated forward: its
        // first key ENDS inside p, so no later partition seeds from it
      }
      if (anySuffix) {
        var acc: Array[InternalRow] = null
        var accKey: InternalRow = null
        val carry = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
        var p = nPart - 1
        while (p >= 0) {
          val (fk, _, _, lk, _, harvest, _, _, _, _, _, segF, _) = boundary(p)
          if (anySufIn && sufInLog(p) != null) carry ++= sufInLog(p)
          if (harvest.nonEmpty) {
            val continues = !keyed ||
              (accKey != null && lk != null && KeyedWindowExec.keyEq(lk, accKey))
            if (continues && acc != null) {
              if (anySufIn && carry.nonEmpty) {
                acc = foldInward(acc, sufInIdx, carry)
                carry.clear()
              }
              suffixSeed(p) = acc
            }
            val singleKey = !keyed || KeyedWindowExec.keyEq(fk, lk)
            if (!(singleKey && continues && acc != null)) carry.clear()
            acc =
              if (singleKey && continues && acc != null) mergeAll(segF, acc)
              else segF // chain restarts at p's first key's own segment
            accKey = fk
          }
          p -= 1
        }
      }
    }
    val preSeedB = childRdd.sparkContext.broadcast(prefixSeed)
    val sufSeedB = childRdd.sparkContext.broadcast(suffixSeed)
    val ctxB = childRdd.sparkContext.broadcast(backCtx)
    val fwdB = childRdd.sparkContext.broadcast(fwdCtx)

    // ---- pass 2: staged per-output sliding folds ---------------------------
    //
    // Merge-safe aggregates ride a TWO-STACK sliding fold (SWAG): a front
    // buffer folds arrivals in order; evictions pop a back stack of
    // precomputed SUFFIX buffers (rebuilt from the front at O(1) amortized
    // merges per element); a frame's value is merge(back-suffix, front) —
    // one merge per peer run. Merge-association is exactly the family's
    // running-exec contract. The bounded-only float moments keep a
    // sequential per-run re-fold (`WindowExec`'s own operation order —
    // and its own cost class), so their bit-identity guarantee is
    // unchanged. Each output runs behind a STAGING GATE so FOLLOWING
    // bounds never over-ingest: a tuple enters output i's fold only once
    // the run being computed satisfies tuple.val ≤ v + up(i).
    val seqSet = funcs.indices.filter(fi =>
      WindowShapes.boundedOnlyAgg(funcs(fi))).toArray
    val preSet = funcs.indices.filter(prefixArr(_)).toArray
    val sufSet = funcs.indices.filter(fi =>
      suffixArr(fi) && !prefixArr(fi)).toArray
    val fastSet = funcs.indices.filterNot(fi =>
      WindowShapes.boundedOnlyAgg(funcs(fi)) || prefixArr(fi) || suffixArr(fi))
      .toArray

    childRdd.mapPartitionsWithIndex { (pid, it) =>
      val keyProj =
        if (keyed) UnsafeProjection.create(keyExprs, childOutput) else null
      val proj = UnsafeProjection.create(tupleExprs, childOutput)
      val updaters = rebased.indices.map { fi =>
        val buf = new SpecificInternalRow(bufferTypes(fi))
        val init = MutableProjection.create(initExprs(fi), Nil).target(buf)
        val upd = MutableProjection.create(
          updateExprs(fi), bufferAttrs(fi) ++ tupleAttrs).target(buf)
        (buf, init, upd)
      }.toArray
      val evals = rebased.indices.map { fi =>
        MutableProjection.create(Seq(evalExprs(fi)), bufferAttrs(fi))
      }.toArray
      val joinedUp = new JoinedRow
      val joinedOut = new JoinedRow
      val outProj = UnsafeProjection.create(
        childOutput ++ outAttrs, childOutput ++ outAttrs)
      // per-output frame-edge evaluators: fixed distances are saturating
      // long adds; MONTH distances evaluate Spark's own YM-interval
      // arithmetic per peer run (bit-identical clamping/timezone
      // semantics, and monotone — the sliding invariants hold)
      def edgeFn(b: RangeFrames.RBound, upper: Boolean): Long => Long = b match {
        // an unbounded edge saturates: the lower never evicts, the upper
        // admits every staged tuple immediately
        case RangeFrames.RUnbounded =>
          val sat = if (upper) Long.MaxValue else Long.MinValue
          (_: Long) => sat
        case RangeFrames.RFixed(d) => (v: Long) => satAdd(v, d)
        case _ =>
          val ref = org.apache.spark.sql.catalyst.expressions.BoundReference(
            0, orderType, nullable = false)
          val proj = UnsafeProjection.create(Seq(
            RangeFrames.boundEdgeExpr(ref, b, orderType, timeZoneId).get))
          val in = new SpecificInternalRow(Seq(orderType))
          (v: Long) => {
            orderType match {
              case DateType => in.setInt(0, v.toInt)
              case _ => in.setLong(0, v)
            }
            val r = proj(in)
            if (orderType == DateType) r.getInt(0).toLong else r.getLong(0)
          }
      }
      val loAt: Array[Long => Long] = loArr.map(edgeFn(_, upper = false))
      val upAt: Array[Long => Long] = upArr.map(edgeFn(_, upper = true))

      /** Two-stack sliding fold for output `fi`, fed through its staging
        * gate. Only non-null-ordered tuples enter (a value frame can
        * never reach the null group), oldest first. */
      final class Slider(val fi: Int) {
        private val types = bufferTypes(fi)
        private val joinedM = new JoinedRow
        private val frontBuf = new SpecificInternalRow(types)
        private val frontInit =
          MutableProjection.create(initExprs(fi), Nil).target(frontBuf)
        private val frontUpd = MutableProjection.create(
          updateExprs(fi), bufferAttrs(fi) ++ tupleAttrs).target(frontBuf)
        private val single = new SpecificInternalRow(types)
        private val singleInit =
          MutableProjection.create(initExprs(fi), Nil).target(single)
        private val singleUpd = MutableProjection.create(
          updateExprs(fi), bufferAttrs(fi) ++ tupleAttrs).target(single)
        private val mergeProj = MutableProjection.create(
          mergeExprsPer(fi), bufferAttrs(fi) ++ inputBufferAttrs(fi))
        private val mergeTmp = new SpecificInternalRow(types)
        val staging = scala.collection.mutable.ArrayDeque.empty[InternalRow]
        private val frontTs = scala.collection.mutable.ArrayDeque.empty[InternalRow]
        private val backTs = scala.collection.mutable.ArrayDeque.empty[InternalRow]
        private val backSuf = scala.collection.mutable.ArrayDeque.empty[InternalRow]
        frontInit(InternalRow.empty)

        def clear(): Unit = {
          staging.clear(); frontTs.clear(); backTs.clear(); backSuf.clear()
          frontInit(InternalRow.empty)
        }

        def stage(t: InternalRow): Unit = {
          staging.append(t)
          if (staging.length > maxHarvest)
            RangeFrames.overflow(maxHarvest, "slider staging")
        }

        private def push(t: InternalRow): Unit = {
          frontTs.append(t)
          // the held span is frame-of-last-computed-run + pending span;
          // pendingRows is separately capped at maxHarvest, so 2× here
          // can only trip when the FRAME itself exceeds the row cap —
          // the same refusal the moment path makes exactly
          if (frontTs.length + backTs.length > 2 * maxHarvest)
            RangeFrames.overflow(maxHarvest, "slider frame")
          frontUpd(joinedUp(frontBuf, t))
        }

        /** Move the front into the back as suffix folds: S(i) =
          * merge(single(t_i), S(i+1)) right-to-left — each element is
          * singleton-folded once and merged once, O(1) amortized. */
        private def flip(): Unit = {
          val n = frontTs.length
          val sufArr = new Array[InternalRow](n)
          var suffix: InternalRow = null
          var i = n - 1
          while (i >= 0) {
            singleInit(InternalRow.empty)
            singleUpd(joinedUp(single, frontTs(i)))
            suffix =
              if (suffix == null) single.copy()
              else mergeProj.target(new SpecificInternalRow(types))(
                joinedM(single, suffix)).copy()
            sufArr(i) = suffix
            i -= 1
          }
          backTs.appendAll(frontTs)
          backSuf.appendAll(sufArr)
          frontTs.clear()
          frontInit(InternalRow.empty)
        }

        private def evictBelow(thr: Long): Unit = {
          var go = true
          while (go) {
            val oldest =
              if (backTs.nonEmpty) backTs.head
              else if (frontTs.nonEmpty) frontTs.head
              else null
            // null-ordered heads (pushed only into SUFFIX sliders, whose
            // null-run frames include the null group) sort below every
            // value threshold — a value run's frame evicts them first
            if (oldest == null || (!oldest.isNullAt(orderIdx) &&
                longAt(oldest, orderIdx, orderType) >= thr)) go = false
            else {
              if (backTs.isEmpty) flip()
              backTs.removeHead(); backSuf.removeHead()
            }
          }
        }

        /** Admit staged tuples with value ≤ `hi` into the fold. Early
          * admission against the OLDEST pending run's horizon is safe —
          * later runs' horizons are only larger, and eviction happens at
          * compute — and is what keeps staging from accumulating the
          * whole FOLLOWING span between computes. */
        def drainTo(hi: Long): Unit = {
          while (staging.nonEmpty &&
              longAt(staging.head, orderIdx, orderType) <= hi) {
            push(staging.removeHead())
          }
        }

        /** Compute the fold for a run at value `v`: admit staged tuples
          * ≤ v + up, evict below v + lo, return the frame's buffer
          * (valid until the next mutation). */
        def compute(v: Long): InternalRow = computeFrame(v, isNullRun = false)

        /** [[compute]], with the null-run variant for SUFFIX sliders: a
          * null run's unbounded-following frame starts at its own group
          * head, so nothing evicts — the fold is everything held. */
        def computeFrame(v: Long, isNullRun: Boolean): InternalRow = {
          drainTo(upAt(fi)(v))
          if (!isNullRun) evictBelow(loAt(fi)(v))
          if (backSuf.isEmpty && frontTs.isEmpty) {
            singleInit(InternalRow.empty); single
          } else if (backSuf.isEmpty) frontBuf
          else if (frontTs.isEmpty) backSuf.head
          else mergeProj.target(mergeTmp)(joinedM(backSuf.head, frontBuf))
        }

        private val seedTmp = new SpecificInternalRow(types)
        private val joinedS = new JoinedRow
        /** merge(frame, suffix seed) — operand order keeps the seed's
          * rows AFTER the local frame's, the partition-index order the
          * driver stitched them in. */
        def mergedWith(frame: InternalRow, seed: InternalRow): InternalRow =
          mergeProj.target(seedTmp)(joinedS(frame, seed))
      }

      /** Sequential re-fold for a bounded-only moment output `fi`,
        * behind the same staging gate. */
      final class SeqFold(val fi: Int) {
        val staging = scala.collection.mutable.ArrayDeque.empty[InternalRow]
        private val held = scala.collection.mutable.ArrayDeque.empty[InternalRow]
        def clear(): Unit = { staging.clear(); held.clear() }
        def stage(t: InternalRow): Unit = {
          staging.append(t)
          if (staging.length > maxHarvest)
            RangeFrames.overflow(maxHarvest, "moment staging")
        }
        def drainTo(hi: Long): Unit = {
          while (staging.nonEmpty &&
              longAt(staging.head, orderIdx, orderType) <= hi) {
            held.append(staging.removeHead())
            if (held.length > maxHarvest)
              RangeFrames.overflow(maxHarvest, "moment frame")
          }
        }
        def compute(v: Long): InternalRow = {
          drainTo(upAt(fi)(v))
          val lo = loAt(fi)(v)
          while (held.nonEmpty &&
              longAt(held.head, orderIdx, orderType) < lo) {
            held.removeHead()
          }
          val (buf, init, upd) = updaters(fi)
          init(InternalRow.empty)
          var i = 0
          while (i < held.length) { upd(joinedUp(buf, held(i))); i += 1 }
          buf
        }
      }

      /** Seeded prefix fold for an UNBOUNDED-PRECEDING output (r12 #3):
        * no row retention — the frame is one running buffer, seeded with
        * the driver-merged totals of the earlier same-chain partitions.
        * Null-ordered tuples fold immediately (null sorts below every
        * horizon, and they only ever arrive at the chain head, before
        * anything can be staged); value tuples wait behind the same
        * staging gate as the sliders. */
      final class PrefixFold(val fi: Int) {
        private val types = bufferTypes(fi)
        private val buf = new SpecificInternalRow(types)
        private val init = MutableProjection.create(initExprs(fi), Nil).target(buf)
        private val upd = MutableProjection.create(
          updateExprs(fi), bufferAttrs(fi) ++ tupleAttrs).target(buf)
        private val mergeProj = MutableProjection.create(
          mergeExprsPer(fi), bufferAttrs(fi) ++ inputBufferAttrs(fi))
        private val mergeTmp = new SpecificInternalRow(types)
        private val joinedM = new JoinedRow
        val staging = scala.collection.mutable.ArrayDeque.empty[InternalRow]
        init(InternalRow.empty)

        def clear(seed: InternalRow): Unit = {
          staging.clear()
          init(InternalRow.empty)
          if (seed != null) {
            // buf := merge(init, seed), copied back into the working
            // buffer (the update projection's target is fixed to `buf`)
            val m = mergeProj.target(mergeTmp)(joinedM(buf, seed))
            var i = 0
            while (i < types.length) {
              buf.update(i, InternalRow.copyValue(m.get(i, types(i))))
              i += 1
            }
          }
        }
        def stage(t: InternalRow): Unit = {
          if (t.isNullAt(orderIdx)) upd(joinedUp(buf, t))
          else {
            staging.append(t)
            if (staging.length > maxHarvest)
              RangeFrames.overflow(maxHarvest, "prefix staging")
          }
        }
        def drainTo(hi: Long): Unit = {
          while (staging.nonEmpty &&
              longAt(staging.head, orderIdx, orderType) <= hi) {
            upd(joinedUp(buf, staging.removeHead()))
          }
        }
        def compute(v: Long): InternalRow = { drainTo(upAt(fi)(v)); buf }
      }

      val sliders = fastSet.map(new Slider(_))
      val seqFolds = seqSet.map(new SeqFold(_))
      val preFolds = preSet.map(new PrefixFold(_))
      val sufSliders = sufSet.map(new Slider(_))
      // staging routes (r12 #3, r13 inward): in-stream VALUE tuples feed
      // everyone; NULL tuples feed only the unbounded sides (their
      // frames include the null group; bounded value frames never do).
      // BACK ctx rows feed the bounded-lo structures AND the INWARD
      // prefixes (whose seeds are band-cut: the previous chain's tail
      // band arrives as context, admitted per run by the staging gate);
      // an OUTWARD prefix's history is wholly its seed. FWD ctx rows
      // mirror: bounded-up structures + INWARD suffixes (per-run slider
      // eviction applies the k FOLLOWING start exactly), never outward
      // prefixes/suffixes — each row reaches each output exactly once.
      def stageAll(t: InternalRow): Unit = {
        var s = 0
        while (s < sliders.length) { sliders(s).stage(t); s += 1 }
        var q = 0
        while (q < seqFolds.length) { seqFolds(q).stage(t); q += 1 }
        var p = 0
        while (p < preFolds.length) { preFolds(p).stage(t); p += 1 }
        var u = 0
        while (u < sufSliders.length) { sufSliders(u).stage(t); u += 1 }
      }
      def stageNull(t: InternalRow): Unit = {
        var p = 0
        while (p < preFolds.length) { preFolds(p).stage(t); p += 1 }
        var u = 0
        while (u < sufSliders.length) { sufSliders(u).stage(t); u += 1 }
      }
      def stageBackCtx(t: InternalRow): Unit = {
        var s = 0
        while (s < sliders.length) { sliders(s).stage(t); s += 1 }
        var q = 0
        while (q < seqFolds.length) { seqFolds(q).stage(t); q += 1 }
        var p = 0
        while (p < preFolds.length) {
          if (preInArr(preFolds(p).fi)) preFolds(p).stage(t); p += 1
        }
        var u = 0
        while (u < sufSliders.length) { sufSliders(u).stage(t); u += 1 }
      }
      def stageFwdCtx(t: InternalRow): Unit = {
        var s = 0
        while (s < sliders.length) { sliders(s).stage(t); s += 1 }
        var q = 0
        while (q < seqFolds.length) { seqFolds(q).stage(t); q += 1 }
        var p = 0
        while (p < preFolds.length) {
          if (!preInArr(preFolds(p).fi)) preFolds(p).stage(t); p += 1
        }
        var u = 0
        while (u < sufSliders.length) {
          if (sufInArr(sufSliders(u).fi)) sufSliders(u).stage(t); u += 1
        }
      }
      def clearAll(preSeeds: Array[InternalRow]): Unit = {
        sliders.foreach(_.clear()); seqFolds.foreach(_.clear())
        sufSliders.foreach(_.clear())
        preFolds.foreach(f =>
          f.clear(if (preSeeds != null) preSeeds(f.fi) else null))
      }

      // a peer run awaiting FOLLOWING-bound outputs; results fill per-fi.
      // Null runs are computed in full at append time — the cursors skip
      // them without touching the value-frame structures.
      final class Run(val v: Long, val isNull: Boolean,
                      val rows: Array[InternalRow]) {
        val results = new Array[Any](nAggs)
        var remaining: Int = nAggs
      }
      val pending = scala.collection.mutable.ArrayDeque.empty[Run]
      var pendingRows = 0
      // per-output cursor into `pending`: next run index to compute
      val fastNext = new Array[Int](sliders.length)
      val seqNext = new Array[Int](seqFolds.length)
      val preNext = new Array[Int](preFolds.length)
      val sufNext = new Array[Int](sufSliders.length)
      // set just before the stream-end advance: ONLY then do suffix
      // outputs merge their driver seed (an interior keyed flush is a
      // wholly-local key — no later partition continues it)
      var atStreamEnd = false

      def computeFor(run: Run, fi: Int, buf: InternalRow): Unit = {
        val res = evals(fi)(buf)
        run.results(fi) = InternalRow.copyValue(res.get(0, resultTypes(fi)))
        run.remaining -= 1
      }
      /** Advance every output whose horizon `v + up` lies strictly below
        * `w` (Long.MaxValue at partition end = compute everything), then
        * early-admit staged tuples against the oldest STILL-pending
        * run's horizon — otherwise staging would accumulate the whole
        * FOLLOWING span (plus the seeded back context) between
        * computes. */
      def advance(w: Long): Unit = {
        var s = 0
        while (s < sliders.length) {
          val fi = sliders(s).fi
          var go = true
          while (go && fastNext(s) < pending.length) {
            val run = pending(fastNext(s))
            if (run.isNull) fastNext(s) += 1
            else if (w == Long.MaxValue || upAt(fi)(run.v) < w) {
              computeFor(run, fi, sliders(s).compute(run.v))
              fastNext(s) += 1
            } else go = false
          }
          if (fastNext(s) < pending.length && !pending(fastNext(s)).isNull) {
            sliders(s).drainTo(upAt(fi)(pending(fastNext(s)).v))
          }
          s += 1
        }
        var q = 0
        while (q < seqFolds.length) {
          val fi = seqFolds(q).fi
          var go = true
          while (go && seqNext(q) < pending.length) {
            val run = pending(seqNext(q))
            if (run.isNull) seqNext(q) += 1
            else if (w == Long.MaxValue || upAt(fi)(run.v) < w) {
              computeFor(run, fi, seqFolds(q).compute(run.v))
              seqNext(q) += 1
            } else go = false
          }
          if (seqNext(q) < pending.length && !pending(seqNext(q)).isNull) {
            seqFolds(q).drainTo(upAt(fi)(pending(seqNext(q)).v))
          }
          q += 1
        }
        var p = 0
        while (p < preFolds.length) {
          val fi = preFolds(p).fi
          var go = true
          while (go && preNext(p) < pending.length) {
            val run = pending(preNext(p))
            if (run.isNull) preNext(p) += 1
            else if (w == Long.MaxValue || upAt(fi)(run.v) < w) {
              computeFor(run, fi, preFolds(p).compute(run.v))
              preNext(p) += 1
            } else go = false
          }
          if (preNext(p) < pending.length && !pending(preNext(p)).isNull) {
            preFolds(p).drainTo(upAt(fi)(pending(preNext(p)).v))
          }
          p += 1
        }
        var u = 0
        while (u < sufSliders.length) {
          val fi = sufSliders(u).fi
          if (w == Long.MaxValue) {
            // unbounded-FOLLOWING outputs finalize only here (stream end
            // or keyed interior flush); null runs compute too — their
            // frame is everything from their own group head
            val seeds = if (atStreamEnd) sufSeedB.value(pid) else null
            val seed = if (seeds != null) seeds(fi) else null
            while (sufNext(u) < pending.length) {
              val run = pending(sufNext(u))
              val frame = sufSliders(u).computeFrame(run.v, run.isNull)
              val res =
                if (seed != null) sufSliders(u).mergedWith(frame, seed)
                else frame
              computeFor(run, fi, res)
              sufNext(u) += 1
            }
          } else {
            // admit arrivals immediately: every tuple qualifies for every
            // pending unbounded-following frame at or before its value
            sufSliders(u).drainTo(Long.MaxValue)
          }
          u += 1
        }
      }

      var curKey: UnsafeRow = null
      var firstKeyOfPartition = true
      var drainedFwd = false
      val bIt = it.buffered
      val resultRow = new SpecificInternalRow(resultTypes)

      new Iterator[InternalRow] {
        private var emitRun: Run = null
        private var emitIdx = 0

        private def emitReady: Boolean =
          emitRun != null ||
            (pending.nonEmpty && pending.head.remaining == 0)

        override def hasNext: Boolean =
          emitReady || pending.nonEmpty || bIt.hasNext

        private def startEmit(): Unit = {
          emitRun = pending.removeHead()
          pendingRows -= emitRun.rows.length
          emitIdx = 0
          // a cursor at 0 never advanced past the (fully-computed-at-
          // append) null head — it stays at the new head
          var s = 0
          while (s < fastNext.length) {
            fastNext(s) = math.max(0, fastNext(s) - 1); s += 1
          }
          var q = 0
          while (q < seqNext.length) {
            seqNext(q) = math.max(0, seqNext(q) - 1); q += 1
          }
          var p = 0
          while (p < preNext.length) {
            preNext(p) = math.max(0, preNext(p) - 1); p += 1
          }
          var u = 0
          while (u < sufNext.length) {
            sufNext(u) = math.max(0, sufNext(u) - 1); u += 1
          }
          var fi = 0
          while (fi < nAggs) {
            resultRow.update(fi, emitRun.results(fi))
            fi += 1
          }
        }

        override def next(): InternalRow = {
          while (!emitReady) ingest()
          if (emitRun == null) startEmit()
          val r = emitRun.rows(emitIdx)
          emitIdx += 1
          if (emitIdx == emitRun.rows.length) emitRun = null
          numOutputRows += 1L
          outProj(joinedOut(r, resultRow))
        }

        /** Read one peer run (or drain the forward context at stream
          * end), computing every output whose horizon has passed. */
        private def ingest(): Unit = {
          if (!bIt.hasNext) {
            // partition exhausted: admit the stitched forward tuples
            // (bounded-up structures only — the suffix side's future is
            // its SEED), then finalize every pending run with the seeds
            if (!drainedFwd) {
              drainedFwd = true
              atStreamEnd = true
              val fwd = fwdB.value(pid)
              var i = 0
              while (i < fwd.length) { stageFwdCtx(fwd(i)); i += 1 }
            }
            advance(Long.MaxValue)
            return
          }
          val first = bIt.next().copy()
          if (keyed) {
            val k = keyProj(first)
            if (curKey == null || !curKey.equals(k)) {
              // the old key can receive no more tuples: finalize its
              // pending runs (FOLLOWING bounds) before the reset
              if (curKey != null) advance(Long.MaxValue)
              curKey = k.copy()
              clearAll(if (firstKeyOfPartition) preSeedB.value(pid) else null)
              if (firstKeyOfPartition) {
                val ctx = ctxB.value(pid)
                var i = 0
                while (i < ctx.length) { stageBackCtx(ctx(i)); i += 1 }
              }
              firstKeyOfPartition = false
            }
          } else if (firstKeyOfPartition) {
            val seeds = preSeedB.value(pid)
            if (seeds != null) preFolds.foreach(f => f.clear(seeds(f.fi)))
            val ctx = ctxB.value(pid)
            var i = 0
            while (i < ctx.length) { stageBackCtx(ctx(i)); i += 1 }
            firstKeyOfPartition = false
          }
          val t0 = proj(first).copy()
          val runNull = t0.isNullAt(orderIdx)
          val runVal = if (runNull) 0L else longAt(t0, orderIdx, orderType)
          val rows = scala.collection.mutable.ArrayBuffer[InternalRow](first)
          val tuples = scala.collection.mutable.ArrayBuffer[InternalRow](t0)
          var more = true
          while (more && bIt.hasNext) {
            val peek = bIt.head
            val sameKey = !keyed || curKey.equals(keyProj(peek))
            val samePeer = sameKey && {
              val tp = proj(peek)
              if (runNull) tp.isNullAt(orderIdx)
              else !tp.isNullAt(orderIdx) &&
                longAt(tp, orderIdx, orderType) == runVal
            }
            if (samePeer) {
              val r = bIt.next().copy()
              tuples += proj(r).copy()
              rows += r
            } else more = false
          }
          if (runNull) {
            // the null peer group IS its frame for every BOUNDED output
            // (computed at append); nulls sort FIRST, so no value run can
            // be pending, and null tuples never enter the bounded value-
            // frame structures. The UNBOUNDED sides differ: the null
            // group belongs to later value runs' prefix frames (fold into
            // prefix buffers / suffix sliders), and a SUFFIX output's
            // null-run frame is everything from the group head — those
            // results wait for the final advance.
            val run = new Run(0L, isNull = true, rows.toArray)
            var i0 = 0
            while (i0 < tuples.length) { stageNull(tuples(i0)); i0 += 1 }
            var fi = 0
            while (fi < nAggs) {
              if (!suffixArr(fi)) {
                val (buf, init, upd) = updaters(fi)
                init(InternalRow.empty)
                var i = 0
                while (i < tuples.length) { upd(joinedUp(buf, tuples(i))); i += 1 }
                computeFor(run, fi, buf)
              }
              fi += 1
            }
            pending.append(run)
            pendingRows += rows.length
            // without a suffix output the null run emits immediately
            // (remaining hits 0 above) — only the held-to-end case needs
            // the pending-row cap
            if (anySuffix && pendingRows > maxHarvest)
              RangeFrames.overflow(maxHarvest, "pending rows")
          } else {
            var i = 0
            while (i < tuples.length) { stageAll(tuples(i)); i += 1 }
            advance(runVal)
            val run = new Run(runVal, isNull = false, rows.toArray)
            pending.append(run)
            pendingRows += rows.length
            if (pendingRows > maxHarvest) RangeFrames.overflow(maxHarvest, "pending rows")
            // outputs with up ≤ 0 never wait: every qualifying tuple has
            // arrived (peers included — the run was fully collected)
            var s = 0
            while (s < sliders.length) {
              val fi = sliders(s).fi
              if (eagerArr(fi) && fastNext(s) == pending.length - 1) {
                computeFor(run, fi, sliders(s).compute(runVal))
                fastNext(s) += 1
              }
              s += 1
            }
            var q = 0
            while (q < seqFolds.length) {
              val fi = seqFolds(q).fi
              if (eagerArr(fi) && seqNext(q) == pending.length - 1) {
                computeFor(run, fi, seqFolds(q).compute(runVal))
                seqNext(q) += 1
              }
              q += 1
            }
            var p2 = 0
            while (p2 < preFolds.length) {
              val fi = preFolds(p2).fi
              if (eagerArr(fi) && preNext(p2) == pending.length - 1) {
                computeFor(run, fi, preFolds(p2).compute(runVal))
                preNext(p2) += 1
              }
              p2 += 1
            }
          }
        }
      }
    }
  }
}