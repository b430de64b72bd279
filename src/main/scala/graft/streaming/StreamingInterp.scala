package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Incremental linear interpolation via `flatMapGroupsWithState` — the
  * streaming twin of x137 (`x137_linear_interp`): gap days rebuilt the
  * moment the CLOSING known point of a hole arrives, completing the
  * pandas gap-repair pair's online form (ffill's streaming face is
  * [[StatefulRolling]]'s carried state; interpolation is inherently
  * one-point-lookahead, so its online form emits a hole's interior
  * exactly when the hole closes — no unbounded wait, no watermark
  * gymnastics).
  *
  * Per-key state is ONE point: the key's latest known (day, cents) —
  * bounded by #keys, not data. Each micro-batch sorts its rows by day,
  * and for every consecutive pair with a hole emits the interior days
  * with the EXACT integer-cents lerp the batch operator uses
  * (`v0 + (n − pmod(n, dd)) div dd`, floor division via an explicit
  * positive mod — identical on any engine, negative slopes included),
  * tagged `interp`; known rows pass through tagged `known`.
  *
  * Ordering contract (the [[StatefulRolling]] trust): days arrive in
  * order per key across batches; a hole must not straddle an emitted
  * boundary retroactively (the no-retraction law of append streams).
  * Late data beyond that is the T5 full-recompute's job.
  */
object StreamingInterp {

  final case class PtIn(key: String, day: Int, cents: Long)
  final case class PtOut(key: String, day: Int, cents: Long, src: String)
  final case class LastPoint(day: Int, cents: Long)

  /** Exact integer lerp at `day` between (d0, v0) and (d1, v1):
    * `v0 + (n − pmod(n, dd)) div dd` with n = (v1−v0)·(day−d0),
    * dd = d1−d0 — floor division, engine-portable. ADVICE r13: the
    * product is computed with `multiplyExact`, so an extreme cents delta
    * times a wide hole FAILS LOUDLY instead of wrapping silently where
    * DuckDB (HUGEINT) would keep computing — the remaining terms cannot
    * overflow: |n−m| ≤ |n| and the quotient lands between v0 and v1. */
  private[streaming] def lerp(d0: Int, v0: Long, d1: Int, v1: Long,
                              day: Int): Long = {
    val n = Math.multiplyExact(Math.subtractExact(v1, v0), (day - d0).toLong)
    val dd = (d1 - d0).toLong
    val m = ((n % dd) + dd) % dd
    v0 + (n - m) / dd
  }

  /** Append-mode gap interpolation: known points pass through; every
    * hole's interior days emit (tagged `interp`) when its closing point
    * arrives. Identical on a static Dataset (batch backfill). */
  def withInterpolation(ds: Dataset[PtIn]): Dataset[PtOut] = {
    implicit val outEnc = Encoders.product[PtOut]
    implicit val stateEnc = Encoders.product[LastPoint]
    implicit val keyEnc = Encoders.STRING
    ds.groupByKey(_.key)
      .flatMapGroupsWithState[LastPoint, PtOut](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (key: String, rows: Iterator[PtIn], state: GroupState[LastPoint]) =>
          val sorted = rows.toSeq.sortBy(_.day)
          val out = scala.collection.mutable.ArrayBuffer.empty[PtOut]
          var last = state.getOption
          sorted.foreach { p =>
            last match {
              case Some(LastPoint(d0, v0)) if p.day > d0 + 1 =>
                var d = d0 + 1
                while (d < p.day) {
                  out += PtOut(key, d, lerp(d0, v0, p.day, p.cents, d), "interp")
                  d += 1
                }
              case _ => ()
            }
            out += PtOut(key, p.day, p.cents, "known")
            last = Some(LastPoint(p.day, p.cents))
          }
          last.foreach(state.update)
          out.iterator
      }
  }
}
