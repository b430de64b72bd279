package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** T13 — streaming twin of the x141 ordered running distinct count
  * (`stats/RunningDistinct`): `count(DISTINCT x) OVER (PARTITION BY key
  * ORDER BY t)` as an online operator. Per-key state is the SET of
  * values seen so far — the information-theoretic minimum for an exact
  * cumulative distinct count (any exact operator must distinguish
  * seen from unseen values); for stream-scale cardinalities
  * [[StreamingRunningDistinctSketch]] (r15) swaps in as the
  * bounded-error bounded-state twin — one compact theta sketch per
  * key, the x141b batch discipline as online state.
  *
  * RANGE peer semantics, exactly the batch operator's law: all rows of
  * one (key, t) peer group share the running value INCLUDING every
  * value first seen at that t — the fold admits a whole t-group's new
  * values before emitting any of its rows. NULL x contributes nothing
  * but its rows still carry the running value.
  *
  * Ordering contract (the [[StreamingInterp]]/[[StatefulRolling]]
  * trust): rows arrive in nondecreasing t per key across batches — a
  * peer group must not straddle an emitted boundary retroactively (the
  * no-retraction law of append streams). Late data beyond that is the
  * T5 full-recompute's job.
  */
object StreamingRunningDistinct {

  final case class Ev(key: String, t: Long, x: Option[String])
  final case class Out(key: String, t: Long, x: Option[String], cum: Long)
  final case class Seen(xs: List[String])

  /** Append-mode running distinct count; identical on a static Dataset
    * (batch replay — pinned against `RunningDistinct.attach`). */
  def withRunningDistinct(ds: Dataset[Ev]): Dataset[Out] = {
    implicit val outEnc = Encoders.product[Out]
    implicit val stateEnc = Encoders.product[Seen]
    implicit val keyEnc = Encoders.STRING
    ds.groupByKey(_.key)
      .flatMapGroupsWithState[Seen, Out](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (key: String, rows: Iterator[Ev], state: GroupState[Seen]) =>
          val sorted = rows.toSeq.sortBy(_.t)
          var seen = state.getOption.map(_.xs.toSet).getOrElse(Set.empty[String])
          val out = scala.collection.mutable.ArrayBuffer.empty[Out]
          // fold peer group by peer group: admit ALL of a t-group's new
          // values, then emit its rows at the shared count
          sorted.iterator.toSeq.groupBy(_.t).toSeq.sortBy(_._1).foreach {
            case (t, group) =>
              group.foreach(ev => ev.x.foreach(v => seen += v))
              group.foreach(ev => out += Out(key, t, ev.x, seen.size.toLong))
          }
          state.update(Seen(seen.toList))
          out.iterator
      }
  }
}
