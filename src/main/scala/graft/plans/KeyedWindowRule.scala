package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, AggregateFunction, Average, Complete, Count, DeclarativeAggregate, First, Last, Max, Min, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project, UnaryNode, Window}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{BooleanType, IntegerType, LongType}

/** The window-expression shapes the rewrite family executes — shared by
  * [[GlobalRankRule]] (empty partition spec) and [[KeyedWindowRule]]
  * (low-ndv PARTITION BY): one source of truth, so the keyed and global
  * arms can never drift on what "a running aggregate" means.
  */
private[plans] object WindowShapes {

  /** Whitelisted running aggregates: `DeclarativeAggregate`s whose
    * init/update/merge/evaluate expressions the prefix-sum execs replay
    * verbatim, so semantics (null handling, Decimal widening, ANSI
    * overflow) are inherited, not reimplemented. DISTINCT and FILTER
    * forms are excluded (neither is a prefix-mergeable fold).
    */
  def supportedAgg(f: AggregateFunction): Boolean = f match {
    case _: Sum | _: Min | _: Max | _: Count | _: Average | _: First | _: Last =>
      f.isInstanceOf[DeclarativeAggregate]
    case _ => false
  }

  /** Additional aggregates sound for BOUNDED frames only: the bounded
    * execs re-fold each frame's rows SEQUENTIALLY — the exact operation
    * order `WindowExec`'s sliding frame uses — so float-order-sensitive
    * moments (stddev/variance, correlation, covariance) stay
    * bit-identical. The running/total paths merge per-partition
    * PARTIALS instead, a different float operation order, so these
    * never ride those. */
  def boundedOnlyAgg(f: AggregateFunction): Boolean = f match {
    case _: org.apache.spark.sql.catalyst.expressions.aggregate.CentralMomentAgg |
         _: org.apache.spark.sql.catalyst.expressions.aggregate.Corr |
         _: org.apache.spark.sql.catalyst.expressions.aggregate.Covariance =>
      f.isInstanceOf[DeclarativeAggregate]
    case _ => false
  }

  /** No nondeterministic expression anywhere in the tree (subquery
    * markers excepted: `PlanExpression` wrappers report themselves
    * nondeterministic, but their inner plans are validated by their
    * own rewrites). ONE definition shared by the whole self-join
    * elimination family (`ArgMaxJoinRule`/`TopNSubqueryRule`/
    * `RankJoinRule`) so the determinism contract can never drift
    * between rules. */
  def deterministicTree(p: LogicalPlan): Boolean =
    p.find(n => n.expressions.exists(e =>
      !e.deterministic && !e.exists(_.isInstanceOf[PlanExpression[_]]))).isEmpty

  /** The ranking functions the rank execs compute — pure functions of
    * position, tie run, and frame total. */
  def rankKindOf(fn: Expression): Option[RankKind] = fn match {
    case _: RowNumber => Some(RankKind.RowNumber)
    case _: Rank => Some(RankKind.Rank)
    case _: DenseRank => Some(RankKind.DenseRank)
    case NTile(Literal(k: Int, _)) if k > 0 => Some(RankKind.Ntile(k))
    case _: PercentRank => Some(RankKind.PercentRank)
    case _: CumeDist => Some(RankKind.CumeDist)
    case _ => None
  }

  /** `nth_value(x, 1[, ignoreNulls])` — Spark's `OptimizeWindowFunctions`
    * spelling of `first_value` for ROWS frames starting at UNBOUNDED
    * PRECEDING — as the equivalent `First` aggregate. */
  def nthFirstOf(fn: Expression): Option[AggregateExpression] = fn match {
    case NthValue(in, Literal(1, IntegerType), ignoreNulls) if in.deterministic =>
      Some(First(in, ignoreNulls).toAggregateExpression())
    case _ => None
  }

  /** `nth_value(x, n[, ignoreNulls])` for 2 ≤ n ≤ [[RingAggs.MaxSlots]]
    * → the [[NthFirstRing]] aggregate: first-n value slots + count, so
    * the nth-in-frame pick is a buffer read. Mergeable (running frames,
    * partition-partial prefix merges) AND sequential-fold exact
    * (bounded/range frames) — see [[RingAggs]]. n = 1 stays on `First`
    * via [[nthFirstOf]]; larger n keeps Spark's plan. */
  def nthRingOf(fn: Expression): Option[AggregateExpression] = fn match {
    case NthValue(in, Literal(n: Int, IntegerType), ignoreNulls)
        if n > 1 && n <= RingAggs.MaxSlots && in.deterministic =>
      Some(NthFirstRing(in, n, ignoreNulls).toAggregateExpression())
    case _ => None
  }

  /** Any rewritable `nth_value` spelling → its aggregate. */
  def nthAggOf(fn: Expression): Option[AggregateExpression] =
    nthFirstOf(fn).orElse(nthRingOf(fn))

  /** `agg(x) OVER (… [ROWS|RANGE] UNBOUNDED PRECEDING → CURRENT ROW)`
    * (or the exclusive `… AND 1 PRECEDING`) → (aggregate, frame). */
  def runningAggOf(fn: Expression,
                   spec: WindowSpecDefinition): Option[(AggregateExpression, RunFrame)] =
    (fn, spec.frameSpecification) match {
      case (ae @ AggregateExpression(f, Complete, false, None, _),
            SpecifiedWindowFrame(ft, UnboundedPreceding, CurrentRow))
          if supportedAgg(f) =>
        Some((ae,
          if (ft == RowFrame) RunFrame.RowsCurrent else RunFrame.RangeCurrent))
      case (ae @ AggregateExpression(f, Complete, false, None, _),
            SpecifiedWindowFrame(RowFrame, UnboundedPreceding,
              Literal(-1, IntegerType)))
          if supportedAgg(f) =>
        Some((ae, RunFrame.RowsExclusive))
      case (nth, SpecifiedWindowFrame(ft, UnboundedPreceding, CurrentRow)) =>
        nthAggOf(nth).map((_,
          if (ft == RowFrame) RunFrame.RowsCurrent else RunFrame.RangeCurrent))
      case (nth, SpecifiedWindowFrame(RowFrame, UnboundedPreceding,
              Literal(-1, IntegerType))) =>
        nthAggOf(nth).map((_, RunFrame.RowsExclusive))
      case _ => None
    }

  /** `agg(x) OVER (… ROWS BETWEEN <lo> AND <up>)` with BOTH ends
    * bounded — k PRECEDING / CURRENT ROW / k FOLLOWING in any valid
    * combination: trailing (the reference's W1 rolling mean), centered
    * smoothing (`a PRECEDING AND b FOLLOWING`), strictly-preceding and
    * pure-following frames → (aggregate, signed lower, signed upper),
    * frame rows = [t+lower, t+upper]. Capped at `maxReach` rows of
    * reach either side: the rewrites ship that many boundary tuples per
    * partition as driver metadata, so a pathological million-row frame
    * stays on Spark's plan. `first_value` over a bounded frame reaches
    * here in its aggregate spelling (the optimizer's `nth_value(x, 1)`
    * rewrite fires only for UNBOUNDED PRECEDING frames), but nth
    * handling is kept for DataFrame-API `nth_value(…, 1)` calls.
    */
  def boundedAggOf(fn: Expression, spec: WindowSpecDefinition,
                   maxReach: Int): Option[(AggregateExpression, Int, Int)] = {
    def boundOf(e: Expression): Option[Int] = e match {
      case CurrentRow => Some(0)
      case Literal(v: Int, IntegerType) => Some(v)
      case _ => None
    }
    def bounds: Option[(Int, Int)] = spec.frameSpecification match {
      case SpecifiedWindowFrame(RowFrame, loE, upE) =>
        for {
          lo <- boundOf(loE)
          up <- boundOf(upE)
          if lo <= up && -lo <= maxReach && up <= maxReach
        } yield (lo, up)
      case _ => None
    }
    fn match {
      case ae @ AggregateExpression(f, Complete, false, None, _)
          if supportedAgg(f) || boundedOnlyAgg(f) =>
        bounds.map { case (lo, up) => (ae, lo, up) }
      case _ =>
        nthAggOf(fn).flatMap(ae => bounds.map { case (lo, up) => (ae, lo, up) })
    }
  }

  /** `agg(x) OVER (… ORDER BY t RANGE BETWEEN <lo> AND <up>)` with
    * literal VALUE-DISTANCE bounds — trailing (`Δ PRECEDING AND CURRENT
    * ROW`, the trailing-2-days shape), strictly-preceding, CENTERED
    * (`a PRECEDING AND b FOLLOWING`) and pure-following → (aggregate,
    * signed lo, signed up) in order units. One ascending NULLS FIRST
    * order key of an integer-backed type; the bounded-only float moments
    * are allowed because [[RangeAggExec]] re-folds each frame
    * sequentially in `WindowExec`'s own order. */
  def rangeAggOf(fn: Expression, spec: WindowSpecDefinition)
      : Option[(AggregateExpression, RangeFrames.RBound, RangeFrames.RBound)] =
    spec.orderSpec match {
      case Seq(SortOrder(oe, Ascending, NullsFirst, _))
          if RangeFrames.supportedOrderType(oe.dataType) && oe.deterministic =>
        spec.frameSpecification match {
          case SpecifiedWindowFrame(RangeFrame, loE, upE) =>
            // HALF-unbounded sides (r12 verdict #3) ride prefix/suffix
            // seeds — merge-safe aggregates only (the seeds are driver-
            // merged partials; the float moments' sequential-fold
            // guarantee cannot survive an unbounded frame). Both-
            // unbounded is the whole-frame total (TotK / the global
            // total plan), and `UNBOUNDED PRECEDING AND CURRENT ROW`
            // was already taken by the running arm upstream.
            //
            // A partner bound that CUTS INTO the seeded side (r13, the
            // last two cells of the RANGE bound lattice): `UNBOUNDED
            // PRECEDING AND k PRECEDING` excludes the previous chain's
            // trailing k-band from the prefix seed, and `k FOLLOWING AND
            // UNBOUNDED FOLLOWING` excludes the following chain's head
            // band from the suffix seed. These now heal via BAND-SPLIT
            // seeds: pass 1 cuts each partition's segment total at its
            // harvest boundary, the driver folds rows leaving the
            // context retention into the seed accumulators (FIFO, below
            // every later consumer's frame edge by the retention
            // invariant), and the band rows travel as the SAME boundary
            // context tuples the bounded frames already ship, admitted
            // per run by the staging gate / slider eviction. Because
            // band rows reach the seed through eviction paths whose
            // stream order the suffix mirror cannot always keep, the
            // inward shapes are restricted to COMMUTATIVE-fold
            // aggregates (sum/count/min/max/avg); First/Last and the
            // nth rings keep Spark's plan there.
            def nonNegative(b: RangeFrames.RBound): Boolean = b match {
              case RangeFrames.RFixed(d) => d >= 0L
              case RangeFrames.RMonths(m) => m >= 0
              case RangeFrames.RUnbounded => false
            }
            def nonPositive(b: RangeFrames.RBound): Boolean = b match {
              case RangeFrames.RFixed(d) => d <= 0L
              case RangeFrames.RMonths(m) => m <= 0
              case RangeFrames.RUnbounded => false
            }
            def commutativeAgg(f: AggregateFunction): Boolean = f match {
              case _: Sum | _: Min | _: Max | _: Count | _: Average =>
                f.isInstanceOf[DeclarativeAggregate]
              case _ => false
            }
            val loOpt = loE match {
              case UnboundedPreceding => Some(RangeFrames.RUnbounded)
              case e => RangeFrames.signedBound(e, oe.dataType)
            }
            val upOpt = upE match {
              case UnboundedFollowing => Some(RangeFrames.RUnbounded)
              case e => RangeFrames.signedBound(e, oe.dataType)
            }
            for {
              lo <- loOpt
              up <- upOpt
              if !(lo == RangeFrames.RUnbounded && up == RangeFrames.RUnbounded)
              if RangeFrames.boundsOrdered(lo, up)
              anyUnb = lo == RangeFrames.RUnbounded || up == RangeFrames.RUnbounded
              inward = (lo == RangeFrames.RUnbounded && !nonNegative(up)) ||
                (up == RangeFrames.RUnbounded && !nonPositive(lo))
              ae <- (fn match {
                case ae @ AggregateExpression(f, Complete, false, None, _)
                    if (if (inward) commutativeAgg(f)
                        else supportedAgg(f) || (boundedOnlyAgg(f) && !anyUnb)) =>
                  Some(ae)
                case _ if !inward => nthAggOf(fn)
                case _ => None
              })
            } yield (ae, lo, up)
          case _ => None
        }
      case _ => None
    }

  /** `agg(x) OVER (… ROWS BETWEEN UNBOUNDED PRECEDING AND k PRECEDING/
    * FOLLOWING)` with |k| beyond the running arms (k ≤ −2 or k ≥ 1) —
    * the ROWS cells of the half-unbounded lattice (r13). Served by
    * COMPOSITION, not a new exec: the frame is a row-shifted prefix, so
    * `lag(running, k, empty-frame value)` / `lead(running, k, total)`
    * reproduce it exactly (lead's default fires precisely when the
    * shifted frame clamps to the whole partition), and both pieces are
    * shapes the family already heals over one exchange. */
  def rowsShiftOf(fn: Expression, spec: WindowSpecDefinition)
      : Option[(AggregateExpression, Int)] =
    (fn, spec.frameSpecification) match {
      case (ae @ AggregateExpression(f, Complete, false, None, _),
            SpecifiedWindowFrame(RowFrame, UnboundedPreceding,
              Literal(k: Int, IntegerType)))
          if supportedAgg(f) && (k <= -2 || k >= 1) =>
        Some((ae, k))
      case _ => None
    }

  /** The aggregate's value over an EMPTY frame (count → 0, sum/min/max/
    * avg → null, …): `evaluateExpression` folded over `initialValues`.
    * None when the fold cannot be evaluated constant (refuse then). */
  def emptyFrameValue(ae: AggregateExpression): Option[Literal] = {
    val f = ae.aggregateFunction.asInstanceOf[DeclarativeAggregate]
    val byAttr = f.aggBufferAttributes.map(_.exprId).zip(f.initialValues).toMap
    val folded = f.evaluateExpression.transform {
      case a: AttributeReference if byAttr.contains(a.exprId) => byAttr(a.exprId)
    }
    scala.util.Try(Literal.create(folded.eval(InternalRow.empty), f.dataType))
      .toOption
  }

  /** Literal-offset respect-nulls lag/lead → (input, SIGNED offset,
    * default). */
  def offsetOf(fn: Expression): Option[(Expression, Int, Expression)] =
    fn match {
      case Lag(in, Literal(n: Int, _), default, false)
          if in.deterministic && default.deterministic =>
        Some((in, -n, default))
      case Lead(in, Literal(n: Int, _), default, false)
          if in.deterministic && default.deterministic =>
        Some((in, n, default))
      case _ => None
    }

  /** ignore-nulls `lag(e, n[, default])` → (input, n, default): exactly
    * `last_value(e, ignoreNulls)` (n = 1) or the last-n [[NthLastRing]]
    * (n > 1, the nth-non-null-back pick) over the EXCLUSIVE prefix, with
    * the default grafted back by a coalesce projection (the lag returns
    * its default exactly when fewer than n preceding non-null values
    * exist). ignore-nulls `lead` stays on `WindowExec`: the n-th FUTURE
    * non-null may sit arbitrarily far ahead (an all-null stretch), so a
    * streaming rewrite would need an unbounded pending queue — the exact
    * state class this family exists to avoid. */
  def ignLagOf(fn: Expression): Option[(Expression, Int, Expression)] =
    fn match {
      case Lag(in, Literal(n: Int, IntegerType), default, true)
          if n >= 1 && n <= RingAggs.MaxSlots &&
            in.deterministic && default.deterministic =>
        Some((in, n, default))
      case _ => None
    }
}

/** Optimizer rule healing the LOW-CARDINALITY `PARTITION BY` window
  * hazard automatically (VERDICT r10 #3): `agg(x) OVER (PARTITION BY c
  * ORDER BY t [running frame])` and `lag/lead(e, n) OVER (PARTITION BY c
  * ORDER BY t)` hash-cluster on c, so with ndv(c) = 3 (the reference's
  * `l_returnflag` bars) the whole corpus rides through THREE tasks at
  * any cluster size. When ndv(c) is PROVABLY small the rule re-plans
  * through [[KeyedRunningAggPlan]]/[[KeyedOffsetPlan]]: one range
  * exchange on (c, t) — parallelism bounded by the data — with per-key
  * boundary stitching, results bit-identical.
  *
  * "Provably small" (≤ `spark.graft.keyedWindow.maxNdv`, default 64),
  * in evidence order:
  *   - the EXPRESSION bounds its own domain: boolean (≤3 with null),
  *     `pmod(x, k)`/`x % k` with a literal k, a literal, a CASE WHEN
  *     whose outputs are all literals, a cast of any of these (a cast
  *     never increases ndv);
  *   - an upstream `Filter` pins the column to a literal set
  *     (`c IN (…)`, `c = lit`), walked through intervening projects;
  *   - CATALOG/CBO column statistics (`distinctCount` from
  *     `ANALYZE TABLE … FOR COLUMNS`) on the child plan — ALSO read
  *     directly off the leaf relation's CatalogTable (no CBO flag
  *     needed); `BatchPipeline.registerRefined` auto-ANALYZEs tables
  *     under `spark.graft.autoAnalyze.maxBytes` at registration, so
  *     dimension columns (`PARTITION BY n_name`) prove with zero setup;
  *   - a session NDV HINT (`spark.graft.keyedWindow.ndvHints`,
  *     `name=ndv[,name=ndv…]`) — the handoff point for runtime stats
  *     artifacts: `MarketEtl.rollingStats` (w2/w4's bucketing stats)
  *     registers its measured key count via [[KeyedWindowRule.registerNdvHint]],
  *     making the library's artifact knowledge visible to plain SQL
  *     plans in the same session. Hints match by column NAME, so they
  *     are session-scoped facts the caller vouches for.
  *
  * A PROVABLY-high ndv leaves the plan with Spark: hash clustering at
  * high ndv is already parallel, and the rewrite's range sampling job +
  * boundary metadata would be pure overhead. A COMPOSITE key is
  * proven-high by a single MEASURED-high component (r15, VERDICT r14
  * #1): `ndv(k₁…kₙ) ≥ max ndv(kᵢ)`, applied only to the ndv-SENSITIVE
  * shapes (whole-frame totals and ntile/percent_rank/cume_dist, whose
  * heal broadcasts an O(ndv) model) and only on measured evidence —
  * a domain UPPER bound caps ndv but cannot floor it. An UNPROVABLE
  * ndv — the stats-less ad-hoc `spark.read.parquet` lineage, no bound,
  * pin, stats, or hint — fires OPTIMISTICALLY by default (VERDICT r12
  * #1, `spark.graft.keyedWindow.optimistic`). Since r15 the runtime
  * `spark.graft.keyedWindow.maxRuns` budget guards only the shapes
  * with inherent O(ndv) state: running aggregates and plain
  * row_number/rank/dense_rank stitch on O(partitions) BOUNDARY
  * metadata and complete at any key count; whole-frame totals enforce
  * the budget inside pass 1 and a trip PIVOTS to the shuffled attach
  * where the node promised no ordering/partitioning, aborting loudly
  * (typed, remedy-bearing) only for order-sensitive totals, where no
  * sound fallback exists. Frames with a small `maxRows` proof keep
  * Spark's plan too (the [[GlobalRankRule.SmallFrameConf]] cost guard,
  * same threshold). Disable with
  * `spark.graft.keyedWindow.rewrite=false`.
  */
case class KeyedWindowRule(session: SparkSession) extends Rule[LogicalPlan]
    with PredicateHelper {

  import KeyedWindowRule._

  private sealed trait Kind
  private case class RankK(k: RankKind) extends Kind
  private case class RunK(ae: AggregateExpression, frame: RunFrame) extends Kind
  private case class OffK(in: Expression, off: Int, default: Expression) extends Kind
  private case class IgnK(in: Expression, n: Int, default: Expression) extends Kind
  private case class BndK(ae: AggregateExpression, lower: Int, upper: Int) extends Kind
  private case class RngK(ae: AggregateExpression, lo: RangeFrames.RBound, up: RangeFrames.RBound) extends Kind
  private case class TotK(ae: AggregateExpression, orderSensitive: Boolean) extends Kind

  private def classify(ne: NamedExpression): Option[Kind] = {
    val maxReach =
      session.conf.get(GlobalRankRule.MaxBoundedFrameConf, "1024").toInt
    ne match {
      case Alias(WindowExpression(fn, spec), _) =>
        WindowShapes.rankKindOf(fn).map(RankK.apply)
          .orElse(
            WindowShapes.runningAggOf(fn, spec).map { case (ae, fr) => RunK(ae, fr) })
          .orElse(WindowShapes.offsetOf(fn).map { case (in, o, d) => OffK(in, o, d) })
          .orElse(WindowShapes.ignLagOf(fn).map { case (in, n, d) => IgnK(in, n, d) })
          // keyed bounded frames fold backward only (the global exec
          // owns two-sided frames; a keyed FOLLOWING end stays with
          // Spark until the keyed exec grows a pending queue)
          .orElse(WindowShapes.boundedAggOf(fn, spec, maxReach)
            .filter(_._3 <= 0).map { case (ae, lo, up) => BndK(ae, lo, up) })
          .orElse(WindowShapes.rangeAggOf(fn, spec)
            .map { case (ae, lo, up) => RngK(ae, lo, up) })
          .orElse(keyedTotalOf(fn, spec).map { case (ae, os) => TotK(ae, os) })
      case _ => None
    }
  }

  /** `agg(x) OVER (PARTITION BY k [ORDER BY t ROWS UNBOUNDED BOTH])` —
    * the keyed whole-frame total. First/Last are ORDER-SENSITIVE: with
    * the window's ORDER BY written they are the key's order-first/-last
    * (accepted, flagged — the exec then demands the (keys ++ order)
    * range exchange, the keyed mirror of the global G6 fix); without an
    * order their value is partition-order-arbitrary (Spark's included),
    * so they stay with Spark. `first_value` also arrives in its
    * optimizer-rewritten `nth_value(x, 1)` spelling. */
  private def keyedTotalOf(fn: Expression, spec: WindowSpecDefinition)
      : Option[(AggregateExpression, Boolean)] =
    (fn, spec.frameSpecification) match {
      case (ae @ AggregateExpression(f, Complete, false, None, _),
            SpecifiedWindowFrame(_, UnboundedPreceding, UnboundedFollowing))
          if WindowShapes.supportedAgg(f) =>
        val orderSensitive = f.isInstanceOf[First] || f.isInstanceOf[Last]
        if (!orderSensitive) Some((ae, false))
        else if (spec.orderSpec.nonEmpty) Some((ae, true))
        else None
      case (nth, SpecifiedWindowFrame(_, UnboundedPreceding, UnboundedFollowing))
          if spec.orderSpec.nonEmpty =>
        // nth_value(x, 1) (the first_value rewrite spelling) AND the
        // n>1 ring — both order-defined, both mergeable
        WindowShapes.nthAggOf(nth).map((_, true))
      case _ => None
    }

  private def provablySmall(child: LogicalPlan): Boolean = {
    val threshold =
      session.conf.get(GlobalRankRule.SmallFrameConf, "4096").toLong
    threshold > 0L && child.maxRows.exists(_ <= threshold)
  }

  /** Plan-time PROOF that the keys' ndv is at or under `maxNdv` —
    * exposed for `ArgMaxJoinRule`'s keys-only arm (r14): a keys-only
    * group-stats join already has a good Spark plan (AQE picks
    * broadcast), so eliminating it is only justified when the
    * zero-exchange attach is provably in its low-ndv design center
    * (measured: the optimistic attach ran 1.7× slower than the
    * decorrelated broadcast join at 20k unproven keys — q17). */
  private[plans] def provenKeyNdv(keys: Seq[Expression],
                                  child: LogicalPlan): Boolean =
    ndvOk(keys, child)

  private def ndvOk(keys: Seq[Expression], child: LogicalPlan): Boolean = {
    val maxNdv = session.conf.get(MaxNdvConf, "64").toLong
    val hints = parseHints(session.conf.get(NdvHintsConf, ""))
    val bounds = keys.map(ndvBound(_, child, hints))
    bounds.forall(_.isDefined) && {
      val product = bounds.flatten.foldLeft(1L) { (acc, b) =>
        if (acc > maxNdv) acc else math.min(acc * math.max(b, 1L), Long.MaxValue / 2)
      }
      product <= maxNdv
    }
  }

  /** The OPTIMISTIC arm (VERDICT r12 #1): some key's ndv has NO plan-time
    * evidence at all — the stats-less ad-hoc lineage. Fires the rewrite
    * under the runtime [[KeyedWindowRule.MaxRunsConf]] budget (the execs
    * enforce it before unbounded metadata can accumulate). A key whose
    * ndv IS provable but too high does NOT reach here: known-high ndv
    * means Spark's hash clustering is the right plan, and staying put is
    * the correct answer, not a gap.
    *
    * LOWER-BOUND refusal (VERDICT r14 #1): a composite key is
    * proven-HIGH by any single component, because `ndv(k₁…kₙ) ≥ max
    * ndv(kᵢ)` — so when `ndvSensitive` (the node carries shapes whose
    * heal degrades with ndv: whole-frame totals and the
    * ntile/percent_rank/cume_dist ranks, all of which broadcast an
    * O(ndv) model), a component with MEASURED evidence over `maxNdv`
    * refuses the wager even though another component is unprovable —
    * `(o_custkey, month)` keeps Spark's hash-clustered Window once
    * `o_custkey` is measured high. Only MEASURED evidence (session
    * hints, catalog/CBO distinct counts) counts: a domain UPPER bound
    * (pmod k, IN-list pin) above `maxNdv` proves nothing about the
    * floor. Shapes with O(partitions) driver state (running aggs and
    * plain row_number/rank/dense_rank) stay eligible — their heal does
    * not degrade with ndv, so high measurement is not a loss signal. */
  private def ndvUnprovable(keys: Seq[Expression], child: LogicalPlan,
                            ndvSensitive: Boolean): Boolean = {
    session.conf.get(OptimisticConf, "true") == "true" &&
      // `__`-prefixed columns are the library's own derived plumbing
      // (e.g. the hand-bucketed constructs' `__bucket`): those plans are
      // already skew-healed by construction, and an optimistic re-plan
      // on top would only stack a second exchange + stitch over the
      // first heal — leave them exactly as built
      !keys.exists(_.references.exists(_.name.startsWith("__"))) && {
      val hints = parseHints(session.conf.get(NdvHintsConf, ""))
      keys.exists(ndvBound(_, child, hints).isEmpty) && {
        !ndvSensitive || {
          val maxNdv = session.conf.get(MaxNdvConf, "64").toLong
          !keys.exists(measuredFloor(_, child, hints).exists(_ > maxNdv))
        }
      }
    }
  }

  /** MEASURED ndv of a key component, for the lower-bound refusal — or
    * None when the only evidence is a domain bound (which caps ndv but
    * never floors it) or a filter pin (which proves the POST-filter
    * domain small, overriding the table-level measurement). The walk
    * crosses only ndv-preserving edges by construction (pure renames,
    * unary pass-throughs); it also crosses Filters and Joins, which can
    * REDUCE the true count below the table-level measurement — there the
    * value is an estimate, not a floor, and using it to refuse is the
    * engine's no-wager posture: both candidate plans are correct, the
    * refusal keeps Spark's always-parallel one, and a user who KNOWS the
    * filtered subset is small holds the proof tools (filter pin, hint,
    * ANALYZE) that win outright via the proven arm. Exposed for spec. */
  private[plans] def measuredFloor(e: Expression, child: LogicalPlan,
                                   hints: Map[String, Long]): Option[Long] = e match {
    case a: Attribute => measuredAttr(a, child, hints, Set(a.name))
    case c: Cast => None // cast can collapse values — measurement doesn't carry
    case _ => None // computed keys: domain reasoning only, no measurement
  }

  private def measuredAttr(a: Attribute, plan: LogicalPlan,
                           hints: Map[String, Long],
                           names: Set[String]): Option[Long] = plan match {
    case Project(list, gc) =>
      list.collectFirst {
        case al @ Alias(at: Attribute, _) if al.exprId == a.exprId =>
          measuredAttr(at, gc, hints, names + al.name + at.name)
        case al @ Alias(_, _) if al.exprId == a.exprId =>
          None // computed column: no measurement to carry
        case at: Attribute if at.exprId == a.exprId =>
          measuredAttr(at, gc, hints, names + at.name)
      }.flatten
    case Filter(cond, gc) =>
      // a pin on THIS column proves the post-filter domain small — the
      // table-level measurement no longer describes what the window sees
      val pinned = splitConjunctivePredicates(cond).exists {
        case In(at: Attribute, list) =>
          at.exprId == a.exprId && list.forall(_.foldable)
        case InSet(at: Attribute, _) => at.exprId == a.exprId
        case EqualTo(at: Attribute, _: Literal) => at.exprId == a.exprId
        case EqualTo(_: Literal, at: Attribute) => at.exprId == a.exprId
        case _ => false
      }
      if (pinned) None else measuredAttr(a, gc, hints, names)
    case l: org.apache.spark.sql.catalyst.plans.logical.LeafNode
        if l.outputSet.contains(a) =>
      leafHint(a, l, hints, names)
    case u: UnaryNode if u.child.outputSet.contains(a) =>
      measuredAttr(a, u.child, hints, names)
    case other =>
      other.children.find(_.outputSet.contains(a))
        .flatMap(measuredAttr(a, _, hints, names))
  }

  /** Everything but the on/off conf: would this node re-plan? Exposed
    * for the PlanAuditSpec sweep (detector self-check plants a probe
    * with the rewrite off and must still SEE it). */
  /** The shapes whose HEAL holds O(ndv) driver/broadcast state — totals
    * and the key-total-dividing ranks. Running aggs, offsets, and plain
    * row_number/rank/dense_rank stitch on O(partitions) boundary
    * metadata instead, so their optimistic arm needs no ndv ceiling. */
  private def ndvSensitiveKinds(kinds: Seq[Option[Kind]]): Boolean =
    kinds.exists(_.exists {
      case _: TotK => true
      case _: BndK => false
      case RankK(k) => k match {
        case RankKind.Ntile(_) | RankKind.PercentRank | RankKind.CumeDist => true
        case _ => false
      }
      case _ => false
    })

  private[graft] def wouldRewrite(w: Window): Boolean =
    w.partitionSpec.nonEmpty && w.windowExpressions.nonEmpty &&
      !provablySmall(w.child) && {
        val kinds = w.windowExpressions.map(classify)
        kinds.forall(_.isDefined) &&
          // whole-frame totals need no order; every other shape is
          // position-dependent and needs the ORDER BY to range-partition
          (w.orderSpec.nonEmpty || kinds.forall(_.exists(_.isInstanceOf[TotK]))) &&
          (ndvOk(w.partitionSpec, w.child) ||
            ndvUnprovable(w.partitionSpec, w.child, ndvSensitiveKinds(kinds)))
      }

  private def rewritable(w: Window): Boolean =
    session.conf.get(RewriteConf, "true") == "true" && wouldRewrite(w)

  /** A conjunct that bounds a rank attr above — the shapes Spark's
    * `InferWindowGroupLimit` prunes map-side (the global rule's
    * carve-out, applied to PARTITIONED top-k too: `rnk <= k` per key is
    * Spark's best plan, pruning to k rows per key per map partition
    * BEFORE any exchange). */
  private def hasRankLimit(cond: Expression, rankAttrs: AttributeSet): Boolean =
    splitConjunctivePredicates(cond).exists {
      case LessThan(a: Attribute, _: Literal) => rankAttrs.contains(a)
      case LessThanOrEqual(a: Attribute, _: Literal) => rankAttrs.contains(a)
      case EqualTo(a: Attribute, _: Literal) => rankAttrs.contains(a)
      case EqualTo(_: Literal, a: Attribute) => rankAttrs.contains(a)
      case GreaterThan(_: Literal, a: Attribute) => rankAttrs.contains(a)
      case GreaterThanOrEqual(_: Literal, a: Attribute) => rankAttrs.contains(a)
      case _ => false
    }

  private def isPureRank(w: Window): Boolean =
    w.windowExpressions.forall {
      case Alias(WindowExpression(fn, _), _) =>
        WindowShapes.rankKindOf(fn).isDefined
      case _ => false
    }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    // leave keyed top-k shapes to InferWindowGroupLimit (keyed by
    // exprIds — transform-stable, the r10 ADVICE lesson)
    val keep = scala.collection.mutable.HashSet.empty[Seq[ExprId]]
    plan.foreach {
      case Filter(cond, w: Window) if rewritable(w) && isPureRank(w) &&
          hasRankLimit(cond, AttributeSet(w.windowExpressions.collect {
            case a @ Alias(WindowExpression(fn, _), _)
                if WindowShapes.rankKindOf(fn).exists {
                  case RankKind.RowNumber | RankKind.Rank |
                       RankKind.DenseRank => true
                  case _ => false
                } => a.toAttribute
          })) =>
        keep.add(w.windowExpressions.map(_.exprId))
      case _ => ()
    }
    plan.transformUp {
      case w: Window if rewritable(w) &&
          !keep.contains(w.windowExpressions.map(_.exprId)) =>
      val classified = w.windowExpressions.map { ne =>
        (ne.toAttribute, classify(ne).get)
      }
      // fired without a plan-time ndv proof → the ndv-dependent execs
      // (running/total/rank per-run metadata) enforce the runtime budget
      val optimistic = !ndvOk(w.partitionSpec, w.child)
      val rankPairs = classified.collect { case (attr, RankK(k)) => (attr, k) }
      val ignMap: Map[ExprId, (Attribute, Expression)] =
        classified.collect { case (attr, IgnK(in, _, d)) =>
          attr.exprId -> (AttributeReference(attr.name + "__ignlag",
            in.dataType, nullable = true)() -> d)
        }.toMap
      val runTriples = classified.collect {
        case (attr, RunK(ae, fr)) => (attr, ae, fr)
      } ++ classified.collect {
        case (attr, IgnK(in, n, _)) =>
          (ignMap(attr.exprId)._1,
            (if (n == 1) Last(in, ignoreNulls = true) else NthLastRing(in, n))
              .toAggregateExpression(),
            RunFrame.RowsExclusive: RunFrame)
      }
      val offQuads = classified.collect {
        case (attr, OffK(in, o, d)) => (attr, in, o, d)
      }
      val bndQuads = classified.collect {
        case (attr, BndK(ae, lo, up)) => (attr, ae, lo, up)
      }
      val totPairs = classified.collect { case (attr, TotK(ae, _)) => (attr, ae) }
      val totOrderSensitive = classified.exists {
        case (_, TotK(_, os)) => os
        case _ => false
      }
      var replaced: LogicalPlan = w.child
      if (rankPairs.nonEmpty) {
        replaced = KeyedRankPlan(w.partitionSpec, w.orderSpec,
          rankPairs.map(_._1), rankPairs.map(_._2), replaced, optimistic)
      }
      if (runTriples.nonEmpty) {
        replaced = KeyedRunningAggPlan(w.partitionSpec, w.orderSpec,
          runTriples.map(_._1), runTriples.map(_._2: Expression),
          runTriples.map(_._3), replaced, optimistic)
      }
      if (offQuads.nonEmpty) {
        replaced = KeyedOffsetPlan(w.partitionSpec, w.orderSpec,
          offQuads.map(_._1), offQuads.map(_._2),
          offQuads.map(_._3), offQuads.map(_._4), replaced)
      }
      if (bndQuads.nonEmpty) {
        replaced = KeyedBoundedAggPlan(w.partitionSpec, w.orderSpec,
          bndQuads.map(_._1), bndQuads.map(_._2: Expression),
          bndQuads.map(_._3), bndQuads.map(_._4), replaced)
      }
      val rngQuads = classified.collect {
        case (attr, RngK(ae, lo, up)) => (attr, ae, lo, up)
      }
      if (rngQuads.nonEmpty) {
        replaced = KeyedRangeAggPlan(w.partitionSpec, w.orderSpec,
          rngQuads.map(_._1), rngQuads.map(_._2: Expression),
          rngQuads.map(_._3), rngQuads.map(_._4), replaced)
      }
      if (totPairs.nonEmpty) {
        // outermost: demands nothing (order-insensitive) or the stack's
        // shared (keys ++ order) range exchange (First/Last with ORDER)
        replaced = KeyedTotalAggPlan(w.partitionSpec,
          totPairs.map(_._1), totPairs.map(_._2: Expression),
          if (totOrderSensitive) w.orderSpec else Nil, replaced, optimistic)
      }
      if (ignMap.isEmpty && replaced.output == w.output) replaced
      else Project(w.output.map { a =>
        ignMap.get(a.exprId) match {
          case Some((hidden, Literal(null, _))) =>
            Alias(hidden, a.name)(exprId = a.exprId)
          case Some((hidden, d)) =>
            Alias(Coalesce(Seq(hidden, d)), a.name)(exprId = a.exprId)
          case None => a
        }
      }, replaced)
    }
  }

  /** Largest provable distinct-value bound of `e` over `child`, or None.
    * pmod/remainder account for the NULL group explicitly: `pmod(null,
    * k)` is null and PARTITION BY makes null its own group, so a
    * nullable input admits one more key than the arithmetic bound
    * (matching the boolean arm's true/false/null accounting). */
  private def ndvBound(e: Expression, child: LogicalPlan,
                       hints: Map[String, Long]): Option[Long] = e match {
    case _: Literal => Some(1L)
    case _ if e.dataType == BooleanType => Some(3L) // true/false/null
    case p @ Pmod(_, Literal(k: Int, IntegerType), _) if k > 0 =>
      Some(k.toLong + (if (p.nullable) 1L else 0L))
    case p @ Pmod(_, Literal(k: Long, LongType), _) if k > 0 =>
      Some(k + (if (p.nullable) 1L else 0L))
    case r @ Remainder(_, Literal(k: Int, IntegerType), _) if k > 0 =>
      Some(2L * k - 1 + (if (r.nullable) 1L else 0L)) // remainder keeps the sign
    case r @ Remainder(_, Literal(k: Long, LongType), _) if k > 0 =>
      Some(2L * k - 1 + (if (r.nullable) 1L else 0L))
    case c: Cast => ndvBound(c.child, child, hints) // never increases ndv
    case CaseWhen(branches, elseValue)
        if branches.forall(_._2.foldable) && elseValue.forall(_.foldable) =>
      Some(branches.length + 1L) // branch outputs + else/null
    case ElementAt(CreateArray(items, _), _, _, _) if items.forall(_.foldable) =>
      Some(items.length + 1L) // literal decode table + out-of-bounds null
    case a: Attribute =>
      statsNdv(a, child).orElse(lineageNdv(a, child, hints, Set(a.name)))
    case _ => None
  }

  /** CBO/catalog column stats, when the plan carries them. */
  private def statsNdv(a: Attribute, plan: LogicalPlan): Option[Long] =
    scala.util.Try(plan.stats.attributeStats.get(a)
      .flatMap(_.distinctCount).map(_.toLong)).toOption.flatten

  /** Walk the attribute down through projects/filters: an upstream
    * `c IN (literals)` / `c = literal` bounds the domain; a project
    * alias recurses into the defining expression. Session ndv hints are
    * consulted ONLY at the LEAF relation the column traces to through
    * pass-throughs and pure RENAMES (`names` collects every name the
    * column has carried on the way down) — the caller vouches for a base
    * column of a specific source, not for every same-named derived
    * column in the session. Filter pins anchor at TOP-LEVEL conjuncts —
    * an `In`/`EqualTo` under `NOT(…)` or as one disjunct of an `OR`
    * proves nothing about the domain. */
  private def lineageNdv(a: Attribute, plan: LogicalPlan,
                         hints: Map[String, Long],
                         names: Set[String]): Option[Long] = plan match {
    case Project(list, gc) =>
      list.collectFirst {
        // pure rename: keep walking toward the leaf, remembering the name
        case al @ Alias(at: Attribute, _) if al.exprId == a.exprId =>
          statsNdv(at, gc).orElse(
            lineageNdv(at, gc, hints, names + al.name + at.name))
        case al @ Alias(inner, _) if al.exprId == a.exprId =>
          ndvBound(inner, gc, hints)
        case at: Attribute if at.exprId == a.exprId =>
          statsNdv(at, gc).orElse(lineageNdv(at, gc, hints, names + at.name))
      }.flatten
    case Filter(cond, gc) =>
      // anchor at each conjunct's ROOT: the pin must BE the conjunct
      val fromCond = splitConjunctivePredicates(cond).collectFirst {
        case In(at: Attribute, list)
            if at.exprId == a.exprId && list.forall(_.foldable) =>
          list.length.toLong
        case InSet(at: Attribute, set) if at.exprId == a.exprId =>
          set.size.toLong
        case EqualTo(at: Attribute, l: Literal) if at.exprId == a.exprId => 1L
        case EqualTo(l: Literal, at: Attribute) if at.exprId == a.exprId => 1L
      }
      fromCond.orElse(
        statsNdv(a, gc).orElse(lineageNdv(a, gc, hints, names)))
    case l: org.apache.spark.sql.catalyst.plans.logical.LeafNode
        if l.outputSet.contains(a) =>
      leafHint(a, l, hints, names)
    case u: UnaryNode if u.child.outputSet.contains(a) =>
      // pass-through: a unary node cannot raise a forwarded column's ndv
      statsNdv(a, u.child).orElse(lineageNdv(a, u.child, hints, names))
    case other =>
      // multi-child pass-through (joins): descend into the side that
      // outputs the column — a join cannot raise its ndv either
      other.children.find(_.outputSet.contains(a)).flatMap { c =>
        statsNdv(a, c).orElse(lineageNdv(a, c, hints, names))
      }
  }

  /** Hint lookup at a leaf relation: `table.column` keys first (scoped
    * registration), then bare keys for any name the column carried on
    * the walk down — which now only ever match a BASE column of a leaf
    * (possibly renamed en route), never a same-named COMPUTED column
    * elsewhere in the session. Catalog column stats on the leaf's
    * CatalogTable are read directly (no CBO flag needed — the walk is
    * ours, not the stats propagation framework's). */
  private def leafHint(a: Attribute, leaf: LogicalPlan,
                       hints: Map[String, Long],
                       names: Set[String]): Option[Long] = {
    val tableName: Option[String] = leaf match {
      case r: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        r.catalogTable.map(_.identifier.table)
      case _ => None
    }
    val catalogNdv: Option[Long] = leaf match {
      case r: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        r.catalogTable.flatMap(_.stats).flatMap(_.colStats.get(a.name))
          .flatMap(_.distinctCount).map(_.toLong)
      case _ => None
    }
    val allNames = names + a.name
    tableName.flatMap(t =>
        allNames.toSeq.sorted.iterator.map(n => hints.get(s"$t.$n"))
          .collectFirst { case Some(v) => v })
      .orElse(allNames.toSeq.sorted.iterator.map(hints.get)
        .collectFirst { case Some(v) => v })
      .orElse(catalogNdv)
      .orElse(statsNdv(a, leaf))
  }
}

object KeyedWindowRule {
  val RewriteConf = "spark.graft.keyedWindow.rewrite"
  /** Rewrite fires only when the partition keys' combined ndv is
    * provably at or under this. */
  val MaxNdvConf = "spark.graft.keyedWindow.maxNdv"
  /** When a key's ndv is UNPROVABLE (no domain bound, filter pin,
    * stats, or hint — the ad-hoc `spark.read.parquet` shape), fire the
    * rewrite anyway under the runtime [[MaxRunsConf]] budget (default
    * on). Keys whose ndv is PROVEN above [[MaxNdvConf]] still keep
    * Spark's plan — known-high ndv means hash clustering is already
    * parallel and the rewrite would be pure overhead. */
  val OptimisticConf = "spark.graft.keyedWindow.optimistic"
  /** Runtime budget for OPTIMISTIC rewrites with inherent O(ndv)
    * driver state. Since r15 this is ONLY the whole-frame totals
    * (per-task map caps + incremental driver-merge cap inside pass 1;
    * a trip pivots to the shuffled attach where the node made no
    * ordering/partitioning promise, and aborts loudly otherwise) and
    * the key-total ranks (ntile/percent_rank/cume_dist, count-only
    * pre-pass). Running aggregates and plain row_number/rank/
    * dense_rank ship O(partitions) boundary metadata and need no
    * budget at all. The default bounds driver metadata at ~1M (key,
    * buffer) tuples. */
  val MaxRunsConf = "spark.graft.keyedWindow.maxRuns"
  val MaxRunsDefault: Long = 1000000L

  def runsOverflow(site: String, maxRuns: Long, seen: Long): Nothing =
    throw new KeyedBudgetOverflow(
      s"Keyed-window rewrite ($site): $seen PARTITION BY key runs at " +
        s"runtime, over the $MaxRunsConf budget of $maxRuns. The rewrite " +
        "fired OPTIMISTICALLY (the keys' ndv was not provable at plan " +
        "time) and refuses rather than accumulate unbounded driver " +
        s"metadata. Raise $MaxRunsConf, prove the ndv (ANALYZE TABLE … " +
        "FOR COLUMNS, a literal filter pin, or registerNdvHint), or set " +
        s"$OptimisticConf=false to keep Spark's plan for unprovable keys.")

  /** Is `t` (or anything in its cause chain — a task-side trip arrives
    * wrapped in the scheduler's job-abort exception) the keyed budget
    * overflow? Drives [[graft.plans.KeyedTotalAggExec]]'s adaptive
    * pivot (VERDICT r14 #2): trip → re-plan as the shuffled attach
    * instead of failing the job, where the node's promises allow it. */
  def isBudgetOverflow(t: Throwable): Boolean = {
    var cur = t
    var depth = 0
    while (cur != null && depth < 16) {
      if (cur.isInstanceOf[KeyedBudgetOverflow]) return true
      if (Option(cur.getMessage).exists(_.contains(MaxRunsConf))) return true
      cur = cur.getCause
      depth += 1
    }
    false
  }
  /** Session ndv hints: `name=ndv[,name=ndv…]` — the runtime-stats
    * handoff (see the rule scaladoc). */
  val NdvHintsConf = "spark.graft.keyedWindow.ndvHints"

  def parseHints(s: String): Map[String, Long] =
    s.split(',').iterator.map(_.trim).filter(_.nonEmpty).flatMap { kv =>
      kv.split('=') match {
        case Array(k, v) => scala.util.Try(k.trim -> v.trim.toLong).toOption
        case _ => None
      }
    }.toMap

  /** Record a measured ndv for `column` in the session hints — called by
    * stats artifacts (e.g. `MarketEtl.rollingStats`) so their knowledge
    * reaches plain SQL plans. Session-scoped; consulted only where the
    * named column is a BASE column of a leaf relation. Pass `column` as
    * `"table.column"` to scope the hint to one catalog table. */
  def registerNdvHint(spark: SparkSession, column: String, ndv: Long): Unit = {
    val merged = parseHints(spark.conf.get(NdvHintsConf, "")) + (column -> ndv)
    spark.conf.set(NdvHintsConf,
      merged.map { case (k, v) => s"$k=$v" }.mkString(","))
  }
}

/** The optimistic keyed heal's runtime budget trip. A DEDICATED type so
  * [[KeyedTotalAggExec]]'s adaptive pivot can distinguish "the wager
  * lost" (recoverable: re-plan as the shuffled attach) from a genuine
  * execution failure (never swallowed). Extends SparkException so
  * callers that matched the old loud abort keep matching. */
class KeyedBudgetOverflow(message: String)
    extends org.apache.spark.SparkException(message)
