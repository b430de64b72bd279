package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Streaming twin of the batch sessionizer (x8_sessionize): gap-based
  * user sessions over an event stream via Spark's native
  * `session_window` — merging event-time windows with watermark-bounded
  * state (a session's state is dropped once the watermark passes its
  * close, so state is O(open sessions), never O(history)).
  *
  * Boundary semantics: `session_window` extends a session to
  * `last_event + gap`, half-open — an event exactly `gap` after the
  * previous one starts a NEW session (diff >= gap splits). The batch x8
  * splits on strict `diff > gap`; the two agree everywhere except an
  * exact-boundary tie, which `StreamingSessionizeSpec` documents by
  * replaying the same >=-convention reference.
  *
  * Output (append mode, emitted once the watermark closes the session):
  * user, session_start, session_end, n_events.
  */
object StreamingSessionize {

  def sessions(stream: DataFrame, userCol: String, tsCol: String,
               gap: String, watermark: String): DataFrame =
    stream
      .withWatermark(tsCol, watermark)
      .groupBy(col(userCol), session_window(col(tsCol), gap))
      .agg(count(lit(1)).as("n_events"))
      .select(col(userCol),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"))
}
