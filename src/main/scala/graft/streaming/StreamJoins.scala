package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream joins with watermark-bounded state — the attribution
  * shape: match each left event (click/impression) to right events
  * (purchase/conversion) of the same key arriving within a bounded
  * event-time horizon after it.
  *
  * Both sides carry watermarks and the join condition carries the time
  * bound, so Spark can expire state: a left row is held only until the
  * right watermark passes `leftTs + horizon`, and vice versa — state is
  * O(events per horizon) per key, the same boundedness contract as
  * `StreamingDedup` (which `StreamingDedupSpec`'s soak case pins).
  * Without the time bound the state store would grow forever and the
  * query would be rejected in append mode.
  *
  * 100 TB note: stream-stream join state shuffles by the join key; a
  * hot key concentrates state in one state-store partition — pre-salt
  * the key (and replicate the other side's rows per salt) exactly as
  * `SkewJoin.saltedEquiJoin` does for batch if attribution keys are
  * skewed.
  */
object StreamJoins {

  /** Inner interval join: rows of `left` matched to rows of `right` with
    * equal `keyCol` and `right.tsCol` in `[left.tsCol, left.tsCol +
    * horizon]`. Column names of the two inputs must be disjoint apart
    * from `keyCol` (rename upstream); output carries left columns plus
    * the right side's under their own names.
    *
    * @param watermark  max out-of-orderness tolerated on either stream
    *                   (e.g. "10 minutes")
    * @param horizon    attribution window as a SQL interval string added
    *                   to the left timestamp (e.g. "1 hour")
    */
  def intervalJoin(left: DataFrame, right: DataFrame, keyCol: String,
                   leftTs: String, rightTs: String,
                   watermark: String, horizon: String): DataFrame = {
    val l = left.withWatermark(leftTs, watermark)
    val r = right.withWatermark(rightTs, watermark)
    l.join(r,
      l(keyCol) === r(keyCol) &&
        r(rightTs) >= l(leftTs) &&
        r(rightTs) <= l(leftTs) + expr(s"INTERVAL $horizon"))
      .drop(r(keyCol))
  }
}
