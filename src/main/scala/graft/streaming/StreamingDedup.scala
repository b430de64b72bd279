package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Streaming exact dedup — the X1 operator for the incremental path. A
  * training-data ingest stream re-delivers documents (retries, overlapping
  * crawls); this keeps the first arrival per content key and drops every
  * later duplicate across micro-batches.
  *
  * State is the built-in `dropDuplicatesWithinWatermark` store keyed by
  * `xxhash64(content)` — fixed-width state per distinct document (the
  * same hash-bucket trick as the batch `x1_dedup_exact` shuffle key), and
  * the watermark bounds state size: duplicates are only suppressed while
  * they can still arrive (`withinUs`), so state is O(docs per horizon),
  * not O(all docs ever) — the property that keeps this runnable forever
  * at ingest scale.
  */
object StreamingDedup {

  /** @param df        streaming frame
    * @param eventTime event-time timestamp column (watermark anchor)
    * @param withinUs  dedup horizon: duplicates arriving within this many
    *                  microseconds of the original are dropped
    * @param contentCols columns whose combination defines identity
    */
  def dedupWithinWatermark(df: DataFrame, eventTime: String, withinUs: Long,
                           contentCols: Column*): DataFrame =
    df.withColumn("__key", xxhash64(contentCols: _*))
      .withWatermark(eventTime, s"$withinUs microseconds")
      .dropDuplicatesWithinWatermark("__key")
      .drop("__key")
}
