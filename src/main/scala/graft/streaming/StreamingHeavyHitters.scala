package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge

import graft.expressions.{FreqItemsAgg, FreqItemsTopK}

/** Streaming windowed heavy hitters — the online form of the x28
  * Misra-Gries diagnostic: "which keys dominate this hour's traffic?"
  * over an unbounded stream, with BOUNDED state per window.
  *
  * The piece none of the other streaming operators exercise: a mergeable
  * sketch (`FreqItemsAgg`, a `TypedImperativeAggregate`) AS the streaming
  * aggregation state. Spark keeps one serialized sketch per open
  * event-time window in the state store (KBs, regardless of how many
  * events the window saw — a per-key exact count would grow with
  * cardinality); partial sketches from each micro-batch merge into the
  * stored sketch exactly like map-side partials in batch. The watermark
  * closes windows in append mode, so each window's top-k is emitted once,
  * when its answer is final.
  *
  * Same estimator caveats as x28 (upper-bound ordering, no false
  * negatives above the error band); `StreamingHeavyHittersSpec` pins the
  * closed-window output against the batch recompute at fixture
  * cardinality, where the sketch is exact.
  */
object StreamingHeavyHitters {

  /** Per tumbling `windowDur` window (event time `tsCol`, lateness bound
    * `watermark`): the top-`k` heaviest `keyCol` values. Append-mode
    * emission — rows appear only for closed windows.
    */
  def topK(stream: DataFrame, tsCol: String, keyCol: String,
           windowDur: String, watermark: String, k: Int,
           maxMapSize: Int = 1024): DataFrame = {
    val sk = ColumnBridge.column(
      FreqItemsAgg(ColumnBridge.expression(col(keyCol).cast("string")),
        maxMapSize).toAggregateExpression())
    def topk(c: Column) = ColumnBridge.column(FreqItemsTopK(
      ColumnBridge.expression(c), ColumnBridge.expression(lit(k))))
    stream
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowDur))
      .agg(sk.as("__sk"), count(lit(1)).as("n_events"))
      .select(col("window.start").as("win_start"),
        col("window.end").as("win_end"),
        col("n_events"), topk(col("__sk")).as("top_items"))
  }
}
