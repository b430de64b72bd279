package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.expressions.HashedBagWeightedScore
import graft.text.TextOps

/** Streaming serving path of the trained hashed-logit quality classifier
  * (x36b): score every arriving document with the LEARNED weight table
  * and keep the positive tail — the online admission filter of a
  * training-data ingest pipeline (batch twin: `x36b_trained_classifier`).
  *
  * Deliberately STATELESS: scoring is row-local (one compiled
  * `HashedBagWeightedScore` kernel pass riding each micro-batch's scan —
  * no state store, no watermark, no shuffle), so the stream sustains any
  * ingest rate the source can scan. The model is durable `ArtifactStore`
  * state fitted OFFLINE by `graft.ml.HashedLogit` and loaded ONCE at plan
  * build — a restarted stream serves the same weights without refitting,
  * and a model refresh is a stream restart against a new artifact key
  * (the standard online-serving lifecycle: train offline, version the
  * artifact, roll the consumer).
  *
  * All-integer scoring keeps the keep boundary bit-identical to the batch
  * twin — a doc admitted by the stream is exactly the doc the batch
  * curation pass would keep (pinned in `StreamingQualitySpec`).
  */
object StreamingQualityFilter {

  /** Add `score` (BIGINT) to a document stream. `weights` is the fitted
    * table from `HashedLogit.fit`/`ensureWeights` (length buckets+1,
    * last = bias); `biasCnt` must match the fit.
    */
  def scored(stream: DataFrame, textCol: String, weights: Array[Long],
             biasCnt: Long): DataFrame = {
    import org.apache.spark.sql.graft.ColumnBridge.{column => ccol, expression => cexp}
    stream.withColumn("score",
      ccol(HashedBagWeightedScore(cexp(TextOps.tokens(col(textCol))), weights, biasCnt)))
  }

  /** Admit only positive-scoring documents. */
  def keep(stream: DataFrame, textCol: String, weights: Array[Long],
           biasCnt: Long): DataFrame =
    scored(stream, textCol, weights, biasCnt).filter(col("score") > 0)
}
