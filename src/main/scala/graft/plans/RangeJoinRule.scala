package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, IntegerType, LongType}

/** Optimizer rule: rewrite a pure-inequality point-in-interval inner join
  * (`p >= s AND p < e`, no equi-conjunct) into the bucketed equi-join
  * `RangeJoin.pointInInterval` builds by hand — Spark would otherwise plan
  * BroadcastNestedLoopJoin (O(|points| x |intervals|) comparisons and a
  * whole side broadcast), which is the classic interval-join scale trap.
  *
  * The rewrite replicates each interval row to every fixed-width bucket it
  * overlaps (`explode(sequence(s div W, (e-1) div W))`), tags each point
  * row with its single bucket (`p div W`), and adds the bucket equality to
  * the join condition: Catalyst then plans a hash join, and the original
  * predicate still filters exactly within each bucket, so the result is
  * identical (each pair matches in exactly one bucket — the point's).
  *
  * Opt-in per session/query: set `spark.graft.rangeJoin.bucketWidth` to a
  * positive long in the time unit of the join columns (pick it near the
  * typical interval length; replication factor is len/W + 1). The conf is
  * SESSION-scoped — once set, every pure-inequality inner join in the
  * session is rewritten, so scope it per query: set it, run the query,
  * unset it (or use a dedicated session via `spark.newSession()`). As a
  * backstop for a width tuned to one join leaking onto another, an
  * interval spanning more than `spark.graft.rangeJoin.maxReplication`
  * buckets (default 4096) fails fast with a clear message instead of
  * materializing an explode() of unbounded width (ADVICE r2 — Spark's
  * sequence() would otherwise error opaquely near 2^31 elements or
  * silently bloat the join).
  *
  * The rule is a no-op when unset, when the join has any equi-conjunct
  * (hash join already applies), or when the bound columns are not
  * integral. Applied via `spark.sql.extensions=graft.GraftExtensions`.
  * Idempotent: the rewritten join contains an equi-conjunct, so it no
  * longer matches.
  */
case class RangeJoinRule(session: SparkSession) extends Rule[LogicalPlan]
    with PredicateHelper {

  import RangeJoinRule.{BucketWidthConf, MaxReplicationConf}

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val width = session.conf.get(BucketWidthConf, "0").toLong
    if (width <= 0) plan
    else plan.transformUp {
      case j @ Join(left, right, Inner, Some(cond), hint) =>
        rewrite(j, left, right, cond, hint, width)
          .orElse(rewriteOverlap(j, left, right, cond, hint, width))
          .getOrElse(j)
    }
  }

  private def integral(e: Expression): Boolean =
    e.dataType == LongType || e.dataType == IntegerType

  /** p div w as a floor (not truncate) — matches RangeJoin's bucketing and
    * stays correct for negative times. Pure integer arithmetic
    * (p - pmod(p, w) is exactly divisible by w, so truncating division IS
    * floor division): exact for EVERY long, closing the documented 2^53
    * double-round-trip caveat of the previous formulation (ADVICE r2).
    */
  private def bucketOf(p: Expression, w: Long): Expression = {
    val pl = Cast(p, LongType)
    new IntegralDivide(Subtract(pl, Pmod(pl, Literal(w))), Literal(w))
  }

  private def rewrite(j: Join, left: LogicalPlan, right: LogicalPlan,
                      cond: Expression, hint: JoinHint,
                      width: Long): Option[LogicalPlan] = {
    val conjuncts = splitConjunctivePredicates(cond)
    def crossSide(a: Expression, b: Expression): Boolean =
      (a.references.subsetOf(left.outputSet) && b.references.subsetOf(right.outputSet)) ||
        (a.references.subsetOf(right.outputSet) && b.references.subsetOf(left.outputSet))
    // a hash join is already available — leave the plan alone
    if (conjuncts.exists { case EqualTo(a, b) => crossSide(a, b); case _ => false })
      return None

    // normalize every comparison to (smaller, largerOrEqualSide) forms
    // p >= s  (lower bound)  and  p < e  (upper bound)
    val lower = conjuncts.collectFirst {
      case c @ GreaterThanOrEqual(p, s) if crossSide(p, s) => (c: Expression, p, s)
      case c @ LessThanOrEqual(s, p) if crossSide(s, p) => (c: Expression, p, s)
    }
    val upper = conjuncts.collectFirst {
      case c @ LessThan(p, e) if crossSide(p, e) => (c: Expression, p, e)
      case c @ GreaterThan(e, p) if crossSide(e, p) => (c: Expression, p, e)
    }
    (lower, upper) match {
      case (Some((lc, p1, s)), Some((uc, p2, e)))
          if p1.semanticEquals(p2) && integral(p1) && integral(s) && integral(e) &&
            // point bounds on one side, interval bounds on the other
            (s.references ++ e.references).nonEmpty &&
            p1.references.nonEmpty &&
            ((p1.references.subsetOf(left.outputSet) &&
              (s.references ++ e.references).subsetOf(right.outputSet)) ||
             (p1.references.subsetOf(right.outputSet) &&
              (s.references ++ e.references).subsetOf(left.outputSet))) =>
        val pointOnLeft = p1.references.subsetOf(left.outputSet)
        val (pointPlan, intervalPlan) = if (pointOnLeft) (left, right) else (right, left)

        val pb = Alias(bucketOf(p1, width), "__graft_pb")()
        val newPoint = Project(pointPlan.output :+ pb, pointPlan)

        // one bucket id per overlapped bucket; empty-range rows (e <= s)
        // produce an empty sequence instead of a runtime error, and rows
        // spanning more than maxReplication buckets fail fast with
        // guidance (the width is session-global — a value tuned for one
        // join must not silently explode another)
        val maxRepl = session.conf.get(MaxReplicationConf, "4096").toLong
        val lo = bucketOf(s, width)
        val hi = bucketOf(Subtract(Cast(e, LongType), Literal(1L)), width)
        val emptyArr =
          Literal.create(Array.empty[Long], ArrayType(LongType, containsNull = false))
        val guarded = If(
          LessThanOrEqual(Subtract(hi, lo), Literal(maxRepl - 1)),
          Sequence(lo, hi, None,
            Some(session.sessionState.conf.sessionLocalTimeZone)),
          Cast(new RaiseError(Literal(
            s"graft range join: an interval spans more than $maxRepl buckets at " +
              s"$BucketWidthConf=$width — raise the width (scope the conf per " +
              s"query) or $MaxReplicationConf")),
            ArrayType(LongType, containsNull = false)))
        val seq = If(LessThanOrEqual(lo, hi), guarded, emptyArr)
        val ib = AttributeReference("__graft_ib", LongType, nullable = false)()
        val newInterval = Generate(Explode(seq), unrequiredChildIndex = Nil,
          outer = false, qualifier = None, generatorOutput = Seq(ib),
          child = intervalPlan)

        val bucketEq = EqualTo(pb.toAttribute, ib)
        val (newLeft, newRight) =
          if (pointOnLeft) (newPoint, newInterval) else (newInterval, newPoint)
        val newJoin = Join(newLeft, newRight, Inner,
          Some((conjuncts :+ (bucketEq: Expression)).reduce(And)), hint)
        Some(Project(j.output, newJoin))
      case _ => None
    }
  }

  /** Interval-OVERLAP rewrite (`ls < re AND rs < le`, no equi-conjunct —
    * the j8 shape): both sides replicate to fixed-width buckets, a
    * matched pair survives only in its OWNER bucket
    * (`bucket(greatest(ls, rs))` — the first bucket of the overlap
    * region), so each pair is emitted exactly once: no dedup pass, bag
    * semantics preserved, and the original predicate still decides.
    *
    * PREDICATE-exact, including degenerate rows where `end <= start`
    * (the raw inequality pair can still match for them): each side's
    * bucket cover is clamped to `[bucket(s), bucket(greatest(e-1, s))]`,
    * which provably contains the owner bucket whenever the predicate
    * holds — so unlike the hand-written `RangeJoin.intervalOverlap`
    * (whose half-open contract filters empty intervals), the rewrite
    * changes no result whatsoever.
    */
  private def rewriteOverlap(j: Join, left: LogicalPlan, right: LogicalPlan,
                             cond: Expression, hint: JoinHint,
                             width: Long): Option[LogicalPlan] = {
    val conjuncts = splitConjunctivePredicates(cond)
    def fromLeft(e: Expression) =
      e.references.nonEmpty && e.references.subsetOf(left.outputSet)
    def fromRight(e: Expression) =
      e.references.nonEmpty && e.references.subsetOf(right.outputSet)
    if (conjuncts.exists {
      case EqualTo(a, b) => (fromLeft(a) && fromRight(b)) || (fromRight(a) && fromLeft(b))
      case _ => false
    }) return None
    // normalize strict comparisons to a < b; orient by which side a is from
    val lts = conjuncts.flatMap {
      case c @ LessThan(a, b) => Seq((c: Expression, a, b))
      case c @ GreaterThan(a, b) => Seq((c: Expression, b, a))
      case _ => Nil
    }
    val lsRe = lts.collectFirst {
      case (c, a, b) if fromLeft(a) && fromRight(b) && integral(a) && integral(b) =>
        (c, a, b) // ls < re
    }
    val rsLe = lts.collectFirst {
      case (c, a, b) if fromRight(a) && fromLeft(b) && integral(a) && integral(b) =>
        (c, a, b) // rs < le
    }
    (lsRe, rsLe) match {
      case (Some((_, ls, re)), Some((_, rs, le))) =>
        val maxRepl = session.conf.get(MaxReplicationConf, "4096").toLong
        val tz = Some(session.sessionState.conf.sessionLocalTimeZone)
        def cover(start: Expression, end: Expression): Expression = {
          val lo = bucketOf(start, width)
          val hi = bucketOf(Greatest(Seq(
            Subtract(Cast(end, LongType), Literal(1L)),
            Cast(start, LongType))), width)
          If(
            LessThanOrEqual(Subtract(hi, lo), Literal(maxRepl - 1)),
            Sequence(lo, hi, None, tz),
            Cast(new RaiseError(Literal(
              s"graft range join: an interval spans more than $maxRepl buckets at " +
                s"$BucketWidthConf=$width — raise the width (scope the conf per " +
                s"query) or $MaxReplicationConf")),
              ArrayType(LongType, containsNull = false)))
        }
        val lb = AttributeReference("__graft_lb", LongType, nullable = false)()
        val rb = AttributeReference("__graft_rb", LongType, nullable = false)()
        val newLeft = Generate(Explode(cover(ls, le)), unrequiredChildIndex = Nil,
          outer = false, qualifier = None, generatorOutput = Seq(lb), child = left)
        val newRight = Generate(Explode(cover(rs, re)), unrequiredChildIndex = Nil,
          outer = false, qualifier = None, generatorOutput = Seq(rb), child = right)
        val owner = bucketOf(Greatest(Seq(Cast(ls, LongType), Cast(rs, LongType))), width)
        val newCond = (conjuncts ++ Seq(
          EqualTo(lb, rb): Expression,
          EqualTo(lb, owner): Expression)).reduce(And)
        Some(Project(j.output, Join(newLeft, newRight, Inner, Some(newCond), hint)))
      case _ => None
    }
  }
}

object RangeJoinRule {
  val BucketWidthConf = "spark.graft.rangeJoin.bucketWidth"
  val MaxReplicationConf = "spark.graft.rangeJoin.maxReplication"
}
