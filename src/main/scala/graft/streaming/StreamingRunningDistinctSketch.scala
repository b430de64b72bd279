package graft.streaming

import org.apache.datasketches.memory.Memory
import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.expressions.ThetaOps

/** T13b — BOUNDED-STATE twin of [[StreamingRunningDistinct]] (VERDICT
  * r14 #5): the exact form's per-key state is the value set — the
  * information-theoretic minimum for exactness, but it grows with
  * ndv(x). This twin carries ONE compact theta sketch per key instead
  * (≤ ~8·2^lgK bytes serialized, ~32 KB at the default lgK=12,
  * WHATEVER the stream's cardinality), the same mergeable-sketch
  * discipline as the x141b batch twin — the swap-in the exact
  * operator's scaladoc names for stream-scale keys.
  *
  * Approximate by construction — but EXACT while a key's distinct
  * count stays under the sketch's nominal capacity (2^lgK), the
  * x3/x29 exact-under-capacity law the spec pins against the exact
  * twin at fixture cardinality.
  *
  * Semantics otherwise identical to the exact twin: RANGE peer law
  * (a whole t-group's new values are admitted before any of its rows
  * emit), NULL x contributes nothing but its rows carry the running
  * value, and rows arrive in nondecreasing t per key across batches
  * (the append-stream no-retraction contract; late data beyond it is
  * the T5 full-recompute's job).
  */
object StreamingRunningDistinctSketch {

  final case class Ev(key: String, t: Long, x: Option[String])
  final case class Out(key: String, t: Long, x: Option[String], cumApprox: Long)
  /** One serialized COMPACT theta sketch — the whole per-key state. */
  final case class SketchState(bytes: Array[Byte])

  /** Append-mode running distinct-count estimate; identical on a
    * static Dataset (batch replay — pinned against the exact twin and
    * the x141b batch fold while under capacity). */
  def withRunningDistinct(ds: Dataset[Ev], lgK: Int = 12): Dataset[Out] = {
    implicit val outEnc = Encoders.product[Out]
    implicit val stateEnc = Encoders.product[SketchState]
    implicit val keyEnc = Encoders.STRING
    ds.groupByKey(_.key)
      .flatMapGroupsWithState[SketchState, Out](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (key: String, rows: Iterator[Ev], state: GroupState[SketchState]) =>
          val union = ThetaOps.newUnion(lgK)
          state.getOption.foreach(s => union.union(Memory.wrap(s.bytes)))
          val out = scala.collection.mutable.ArrayBuffer.empty[Out]
          // peer group by peer group: admit the whole t-group's values,
          // then emit its rows at the shared estimate (getResult is a
          // non-destructive snapshot)
          rows.toSeq.groupBy(_.t).toSeq.sortBy(_._1).foreach {
            case (t, group) =>
              group.foreach(_.x.foreach(v => union.update(v)))
              val est = Math.round(union.getResult.getEstimate)
              group.foreach(ev => out += Out(key, t, ev.x, est))
          }
          state.update(SketchState(union.getResult.toByteArray))
          out.iterator
      }
  }
}
