package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.text.TextOps

/** Streaming serving path of the mixture rebalancer (x53): apply
  * per-stratum keep rates to an arriving document stream — the online
  * admission step that keeps a continuously-ingested corpus at the target
  * language mixture (batch twin: `x53_mixture_rebalance`).
  *
  * Deliberately STATELESS: the keep decision is a row-local salted
  * portable-hash draw against a per-stratum rate looked up via a
  * stream-static broadcast join — no state store, no watermark, no
  * stream-side shuffle. The rates are computed OFFLINE from the corpus
  * census (the small `(stratum, keep_pm)` frame x53 derives); refreshing
  * the census is a stream restart against a new rates table — the same
  * train-offline / version / roll-the-consumer lifecycle as
  * `StreamingQualityFilter`.
  *
  * The draw uses the identical salt + portable rolling hash as the batch
  * twin, so a doc admitted by the stream is exactly the doc the batch
  * rebalance pass would keep (pinned in `StreamingRebalanceSpec`).
  */
object StreamingRebalance {

  /** Per-stratum keep rates (per-mill) from a static corpus census:
    * `max(1, 1000·min_cnt div cnt)` — every stratum downsampled toward
    * the smallest. Returns the tiny `(stratumCol, keep_pm)` frame.
    */
  def keepRates(census: DataFrame, stratumCol: String): DataFrame = {
    val counts = census.groupBy(stratumCol).agg(count(lit(1)).as("cnt"))
    counts
      .crossJoin(broadcast(counts.agg(min(col("cnt")).as("mc"))))
      .select(col(stratumCol),
        greatest(lit(1L), expr("1000 * mc div cnt")).as("keep_pm"))
  }

  /** Admit stream rows whose salted id-hash draw clears their stratum's
    * keep rate. `rates` is the static frame from [[keepRates]]; rows in
    * strata absent from it are dropped (an unseen stratum has no census
    * and must not flood the mixture).
    */
  def keep(stream: DataFrame, idCol: String, stratumCol: String,
           rates: DataFrame, salt: String = "x53"): DataFrame =
    stream.join(broadcast(rates), Seq(stratumCol))
      .where(TextOps.saltedDraw(col(idCol).cast("string"), salt, 1000L)
        < col("keep_pm"))
}
