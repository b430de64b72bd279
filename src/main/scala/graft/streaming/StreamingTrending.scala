package graft.streaming

import java.sql.Date

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of x91's time-decayed trending score, kept EXACT by
  * construction: because x91's decay is a power-of-two half-life over
  * whole days inside a 14-day horizon, the sufficient state per trend
  * key is a 15-slot ring of per-age day counts — advancing the anchor
  * by k days shifts the ring by k (ages ≥ 15 fall out, exactly as the
  * batch recompute drops them), and the score is the ring folded with
  * integer bit-shift weights. No float ever enters the state, so the
  * streaming head equals the batch x91 recompute bit-for-bit at every
  * trigger — PROVIDED the key has events on the anchor day: x91 anchors
  * every key at the corpus max day, while this state anchors per key,
  * so a key whose latest event predates the global anchor reports its
  * per-key-anchored score instead (weights relative to its own newest
  * day). `StreamingTrendingSpec` asserts that precondition before
  * pinning fixture bit-equality, and pins multi-batch == one-shot
  * unconditionally.
  *
  * Late data: an event older than the horizon contributes nothing in
  * the batch form and is likewise ignored here; an event late but
  * inside the horizon lands in its correct ring slot, so lateness
  * within the horizon cannot corrupt the score. State is 16 longs per
  * key — millions of trend keys fit in MBs; the only shuffle is the
  * groupByKey exchange on the trend key.
  */
object StreamingTrending {

  val Horizon = 14

  final case class Ev(event_type: String, epoch_day: Long)
  final case class St(anchor: Long, counts: Seq[Long])
  final case class Out(event_type: String, anchor_day: Date,
                       n_recent: Long, score: Long)

  private def emptySt = St(Long.MinValue, Seq.fill(Horizon + 1)(0L))

  private[streaming] def advance(st: St, day: Long): St =
    if (st.anchor == Long.MinValue) St(day, Seq.fill(Horizon + 1)(0L))
    else if (day <= st.anchor) st
    else {
      val k = math.min((day - st.anchor), (Horizon + 1).toLong).toInt
      St(day, Seq.fill(k)(0L) ++ st.counts.dropRight(k))
    }

  private[streaming] def add(st: St, day: Long, n: Long): St = {
    val age = (st.anchor - day).toInt
    if (age < 0 || age > Horizon) st
    else St(st.anchor, st.counts.updated(age, st.counts(age) + n))
  }

  private[streaming] def score(st: St): (Long, Long) = (
    st.counts.sum,
    st.counts.zipWithIndex.map { case (n, age) =>
      n * (1L << (Horizon - age))
    }.sum)

  /** One head row per key per trigger; works identically on a static
    * Dataset (batch backfill == the x91 recompute).
    */
  def trending(ds: Dataset[Ev]): Dataset[Out] = {
    implicit val outEnc = Encoders.product[Out]
    implicit val stEnc = Encoders.product[St]
    implicit val keyEnc = Encoders.STRING
    ds.groupByKey(_.event_type)
      .flatMapGroupsWithState[St, Out](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (key: String, rows: Iterator[Ev], state: GroupState[St]) =>
          val byDay = rows.toSeq.groupBy(_.epoch_day)
            .view.mapValues(_.size.toLong).toSeq.sortBy(_._1)
          var st = state.getOption.getOrElse(emptySt)
          for ((day, n) <- byDay) st = add(advance(st, day), day, n)
          state.update(st)
          if (st.anchor == Long.MinValue) Iterator.empty
          else {
            val (n, sc) = score(st)
            // Date.valueOf(LocalDate) is timezone-free; a raw
            // new Date(millis) would shift the day on non-UTC JVMs
            Iterator.single(Out(key,
              Date.valueOf(java.time.LocalDate.ofEpochDay(st.anchor)),
              n, sc))
          }
      }
  }
}
