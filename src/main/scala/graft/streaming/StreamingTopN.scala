package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** T14 — streaming twin of the x145 rank-join top-n family: per-key
  * LEADERBOARD ADMISSION over an append stream. A retractable "current
  * top n" is impossible in append mode (an arriving large value would
  * have to retract an earlier emission), so the online form answers the
  * question an append stream CAN answer exactly, and a batch replay can
  * verify: was this row among its key's top n AT ARRIVAL — i.e. against
  * the values that had arrived strictly BEFORE its event time.
  *
  * Per-key state is the n largest values seen so far — a bounded
  * min-heap of AT MOST n doubles per key whatever the stream's length
  * or cardinality (the x141b/T13b bounded-state discipline): admission
  * only needs "is v larger than the n-th largest prior value", and the
  * emitted rank is CAPPED at n+1 (`n+1` = "arrived below the board").
  *
  * Determinism: a row competes against strictly-earlier event times
  * only — same-t peers neither see each other nor race (the RANGE peer
  * law's admission mirror: the whole t-group is judged against the
  * pre-t board, then the group's values enter together). NULL values
  * never enter the board and always emit rank n+1, admitted = false.
  *
  * Ordering contract as the other streaming twins: rows arrive in
  * nondecreasing t per key across batches, and no (key, t) peer group
  * straddles a batch boundary — a straddled group's later rows would
  * be judged against a board their own peers already entered,
  * breaking the at-arrival law the batch replay verifies; late data
  * is the T5 full-recompute's job.
  */
object StreamingTopN {

  final case class Ev(key: String, t: Long, v: Option[Double])
  final case class Out(key: String, t: Long, v: Option[Double],
                       rankAtArrival: Int, admitted: Boolean)
  /** The n largest values seen so far (unordered; n is tiny). */
  final case class Board(top: List[Double])

  /** Append-mode leaderboard admission; identical on a static Dataset
    * (batch replay — pinned against a brute-force recompute). */
  def withAdmission(ds: Dataset[Ev], n: Int): Dataset[Out] = {
    require(n >= 1, "n >= 1")
    implicit val outEnc = Encoders.product[Out]
    implicit val stateEnc = Encoders.product[Board]
    implicit val keyEnc = Encoders.STRING
    ds.groupByKey(_.key)
      .flatMapGroupsWithState[Board, Out](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (key: String, rows: Iterator[Ev], state: GroupState[Board]) =>
          var board = state.getOption.map(_.top).getOrElse(Nil)
          val out = scala.collection.mutable.ArrayBuffer.empty[Out]
          rows.toSeq.groupBy(_.t).toSeq.sortBy(_._1).foreach {
            case (t, group) =>
              // judge the whole t-group against the PRE-t board
              group.foreach { ev =>
                ev.v match {
                  case Some(v) =>
                    val above = board.count(_ > v)
                    val rank = math.min(above + 1, n + 1)
                    out += Out(key, t, ev.v, rank, rank <= n)
                  case None =>
                    out += Out(key, t, None, n + 1, admitted = false)
                }
              }
              // then the group's values enter together
              group.flatMap(_.v).foreach { v =>
                board = (v :: board).sorted(Ordering[Double].reverse).take(n)
              }
          }
          state.update(Board(board))
          out.iterator
      }
  }

  /** The law the stream implements, as a brute-force batch recompute —
    * the spec's oracle (n² per key; fixture-scale only). */
  def bruteForce(rows: Seq[Ev], n: Int): Seq[Out] =
    rows.map { ev =>
      ev.v match {
        case Some(v) =>
          val priorTop = rows.filter(r => r.key == ev.key && r.t < ev.t)
            .flatMap(_.v).sorted(Ordering[Double].reverse).take(n)
          val above = priorTop.count(_ > v)
          val rank = math.min(above + 1, n + 1)
          Out(ev.key, ev.t, ev.v, rank, rank <= n)
        case None => Out(ev.key, ev.t, None, n + 1, admitted = false)
      }
    }
}
