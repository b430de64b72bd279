package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Incremental trailing-by-EVENT-TIME window via `flatMapGroupsWithState`
  * — the streaming twin of the batch `RangeAggExec` trailing value frame
  * (x124: `sum/count OVER (PARTITION BY k ORDER BY t RANGE BETWEEN Δ
  * PRECEDING AND CURRENT ROW)`), the x91/T10 discipline: the round's
  * headline batch operator gets its online form.
  *
  * Per-key state is the VALUE-RETENTION DEQUE the batch exec's pass-1
  * harvest keeps at partition edges: the (us, v) rows within Δ of the
  * key's latest event time, ascending. Each micro-batch sorts its rows
  * in event-time order, folds them in PEER RUNS (all rows at one instant
  * share a frame — RANGE semantics, later peers included), evicts below
  * `us - Δ`, and emits every row with its frame sum/count. A batch costs
  * O(batch + evictions); state is bounded by the data rate × Δ — the
  * deque IS the eviction watermark at key granularity.
  *
  * Ordering contract (the [[StatefulRolling]] trust): rows are processed
  * in event-time order WITHIN a batch; across batches arrival order is
  * trusted, and a peer INSTANT must not straddle a micro-batch boundary
  * (a row cannot retroactively join an already-emitted peer's frame —
  * the same no-retraction law every append-mode stream obeys). Late data
  * beyond that is the T5 full-recompute's job, as in the reference.
  *
  * Identical on a static Dataset (batch backfill) and a streaming one;
  * integer sums keep the twin bit-identical to the batch window.
  */
object StreamingTimeWindow {

  final case class EvIn(key: String, us: Long, v: Long)
  final case class EvOut(key: String, us: Long, v: Long,
                         w_sum: Long, w_n: Long)
  final case class TimeState(rows: List[(Long, Long)])

  /** Append-mode trailing time window: every row gets the sum/count of
    * its key's rows with event time in `[us - deltaUs, us]` (peers at
    * the same instant included, exactly the RANGE frame). */
  def withTrailingSum(ds: Dataset[EvIn], deltaUs: Long): Dataset[EvOut] = {
    require(deltaUs >= 0L)
    implicit val outEnc = Encoders.product[EvOut]
    implicit val stateEnc = Encoders.product[TimeState]
    implicit val keyEnc = Encoders.STRING
    ds.groupByKey(_.key)
      .flatMapGroupsWithState[TimeState, EvOut](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (_: String, rows: Iterator[EvIn], state: GroupState[TimeState]) =>
          val sorted = rows.toSeq.sortBy(e => (e.us, e.v))
          var buf = state.getOption.map(_.rows).getOrElse(Nil)
          val out = scala.collection.mutable.ArrayBuffer.empty[EvOut]
          var i = 0
          while (i < sorted.length) {
            // one peer run: every row at this instant shares the frame
            val us = sorted(i).us
            var j = i
            while (j < sorted.length && sorted(j).us == us) j += 1
            val run = sorted.slice(i, j)
            buf = buf.dropWhile(_._1 < us - deltaUs) ++
              run.map(e => (e.us, e.v))
            var sum = 0L
            var n = 0L
            buf.foreach { case (_, v) => sum += v; n += 1 }
            run.foreach(e => out += EvOut(e.key, e.us, e.v, sum, n))
            i = j
          }
          state.update(TimeState(buf))
          out.iterator
      }
  }
}
