package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.stats.Drift

/** Streaming serving path of the drift gate (x64): score every arriving
  * micro-batch's per-slice distribution against the PERSISTED baseline
  * histogram and emit a (batch_id, slice, tv_permill, verdict) report row
  * stream — the online "does this crawl slice still look like the corpus
  * we validated?" alarm (batch twin: `x64_drift_gate`).
  *
  * Runs in `foreachBatch`: drift is a relation between a batch and the
  * static baseline, not an incremental aggregate, so each micro-batch is
  * scored independently with the SAME `Drift.tvVsBaseline` kernel the
  * batch gate uses (one partial-agg shuffle of the batch, bin-bounded
  * everything else) — no state store, no watermark. Refreshing the
  * baseline is a stream restart against a new artifact, the
  * train-offline / version / roll-the-consumer lifecycle of
  * `StreamingQualityFilter` and `StreamingRebalance`.
  */
object StreamingDrift {

  /** Start the gate: per micro-batch, per `groupCol` slice, TV drift vs
    * `baseline` ((bin, cnt) histogram), appended to `outPath` as parquet.
    * `binSql` is the binning expression over the stream's columns.
    */
  def start(stream: DataFrame, groupCol: String, binSql: String,
            baseline: DataFrame, thresholdPermill: Long,
            outPath: String, checkpoint: String): StreamingQuery = {
    val base = baseline.cache() // tiny histogram, reused every batch
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        if (!batch.isEmpty) {
          Drift.tvVsBaseline(batch, groupCol, expr(binSql), base)
            .select(lit(id).as("batch_id"), col("grp"),
              col("n_a"), col("n_b"), col("tv_permill"),
              when(col("tv_permill") <= thresholdPermill, lit("keep"))
                .otherwise(lit("quarantine")).as("verdict"))
            .coalesce(1)
            .write.mode("append").parquet(outPath)
        }
        ()
      }
      .start()
  }

  /** The report for one already-materialized batch — the exact kernel
    * the stream applies, exposed for stream==batch pinning. */
  def scoreBatch(batch: DataFrame, groupCol: String, binSql: String,
                 baseline: DataFrame, thresholdPermill: Long): DataFrame =
    Drift.tvVsBaseline(batch, groupCol, expr(binSql), baseline)
      .select(col("grp"), col("n_a"), col("n_b"), col("tv_permill"),
        when(col("tv_permill") <= thresholdPermill, lit("keep"))
          .otherwise(lit("quarantine")).as("verdict"))
}
