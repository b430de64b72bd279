package graft.streaming

import org.apache.spark.sql.DataFrame

import graft.text.TextOps

/** Streaming twin of the round-9 ingest-hygiene pair (x105 + x106): NFC
  * Unicode normalization and within-document substring dedup applied to
  * every arriving document — the FIRST transform of a streaming
  * training-data ingest, run before anything fingerprints or shingles
  * the text (so the downstream streaming dedup/LSH probes
  * ([[StreamingDedup]], [[IncrementalIngest]]) see canonical bytes).
  *
  * Deliberately STATELESS, like [[StreamingQualityFilter]]: both ops are
  * row-local codegen kernels riding each micro-batch's scan — no state
  * store, no watermark, no shuffle — so the stage sustains any ingest
  * rate the source can scan and is trivially exactly-once under replay
  * (same row in → same row out). Stream == batch bit-for-bit is pinned
  * in `StreamingIngestHygieneSpec` against `TextOps.dedupWithinDoc`.
  *
  * Output schema: (idCol, n_seg, n_kept, text_kept) — the x48/x106
  * shape; `n_seg - n_kept` is the per-doc repetition mass an operator
  * alerts on.
  */
object StreamingIngestHygiene {

  /** NFC-normalize then first-occurrence-dedup each document's
    * non-overlapping `segTokens`-token segments. Works identically on a
    * streaming or batch frame (pure projection).
    */
  def clean(stream: DataFrame, idCol: String, textCol: String,
            segTokens: Int = 3): DataFrame =
    TextOps.dedupWithinDoc(stream, idCol, textCol, segTokens,
      normalizeNfc = true)
}
