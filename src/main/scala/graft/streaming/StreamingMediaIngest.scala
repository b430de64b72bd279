package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.media.{Hamming64, ImageDedup, MediaHashIndex}

/** Incremental MEDIA ingest with near-dup gating as one `foreachBatch`
  * operator — [[IncrementalIngest]]'s lifecycle for binary media, with
  * the persisted [[MediaHashIndex]] in the LSH index's role: each
  * micro-batch of (media_id, media) rows is
  *
  *   1. decoded + perceptually hashed ONCE (the batch only — the corpus
  *      binaries are never re-read; undecodable rows are dropped here,
  *      the same contract as the batch miners);
  *   2. near-dup-deduped WITHIN the batch (the shared Hamming band join,
  *      min-id survivor per pair);
  *   3. probed against the persisted (media_id, h) index — re-encodes /
  *      gain-shifts / brightness-shifts of anything already admitted are
  *      dropped, O(batch) at any corpus size;
  *   4. committed exactly-once to a [[SnapshotSink]] table WITH the
  *      hashes, and — only when this call performed the commit —
  *      appended to the index, so the NEXT batch's probe sees this
  *      batch's media.
  *
  * Crash/replay contract mirrors [[IncrementalIngest]]: the sink commit
  * is the atomic point; a replayed batchId re-appends the admitted
  * (id, h) rows from the sink's own delta dir — no re-decode, since the
  * hashes were committed alongside the bytes — and the append is
  * idempotent IN STORAGE (a batchId-tagged marker in the index dir), so
  * a restart loop cannot grow the persisted index without bound; the
  * one crash window (part files before marker) re-appends at most once,
  * which stays correct (duplicate index rows only produce duplicate
  * candidates, collapsed before the exact verify).
  *
  * The hash stage is a parameter (`hasher`), so one operator serves
  * images (dHash) and audio (envelope hash) — the modality IS the hash
  * function, exactly as in [[MediaHashIndex]].
  */
object StreamingMediaIngest {

  /** Process one micro-batch of (idCol, bytesCol) rows. Returns true iff
    * this call performed the commit (false = replay; index re-healed,
    * nothing else touched). `baseHashed` is the frozen pre-existing
    * corpus's (id, h) table the index is built over; `corpusKey` its
    * immutable identity. */
  def processBatch(batch: DataFrame, batchId: Long, sinkRoot: String,
                   baseHashed: => DataFrame, corpusKey: Seq[Any],
                   hasher: DataFrame => DataFrame = ImageDedup.hashed(_),
                   maxDist: Int = 6,
                   idCol: String = "media_id", bytesCol: String = "media",
                   commitTs: Timestamp = new Timestamp(System.currentTimeMillis())): Boolean = {
    val spark = batch.sparkSession
    val idx = MediaHashIndex.ensureIndex(spark, baseHashed, corpusKey)

    if (SnapshotSink.commits(spark, sinkRoot).exists(_._1 == batchId)) {
      // replay of a committed batch: heal the commit->append crash
      // window from the sink's own delta dir, touch nothing else — the
      // committed hashes make this a metadata-only job, and the
      // batchId-tagged marker makes it idempotent IN STORAGE (repeated
      // restarts must not grow the persisted index without bound)
      val admitted = SnapshotSink.readBatch(spark, sinkRoot, batchId)
        .select(col(idCol).as("id"), col("__h").as("h"))
      MediaHashIndex.appendToIndexOnce(spark, admitted, corpusKey, s"batch$batchId")
      return false
    }

    // (1) decode + hash the batch once; keep the bytes alongside
    val hashed = hasher(batch)
    val withBytes = batch
      .select(col(idCol).cast("long").as("id"), col(bytesCol).as("__bytes"))
      .join(hashed, "id")

    // (2) within-batch near-dup dedup: min-id survivor per pair
    val selfPairs = Hamming64.nearDupPairs(hashed, maxDist, maxBucketSize = 1000)
    val selfDeduped = withBytes.join(
      selfPairs.select(col("b").as("id")).distinct(), Seq("id"), "left_anti")

    // (3) O(batch) probe of the persisted index (base ∪ admitted appends)
    val dupIds = MediaHashIndex.probeNearDups(
      selfDeduped.select(col("id"), col("h")), idx, maxDist)
    val admitted = selfDeduped.join(dupIds, Seq("id"), "left_anti")
      .select(col("id").as(idCol), col("__bytes").as(bytesCol),
        col("h").as("__h"))

    // (4) exactly-once commit, then index maintenance
    val committed = SnapshotSink.commitBatch(admitted, sinkRoot, batchId, commitTs)
    if (committed) {
      val rows = SnapshotSink.readBatch(spark, sinkRoot, batchId)
        .select(col(idCol).as("id"), col("__h").as("h"))
      MediaHashIndex.appendToIndexOnce(spark, rows, corpusKey, s"batch$batchId")
    }
    committed
  }

  /** `foreachBatch` adapter. */
  def writer(sinkRoot: String, baseHashed: => DataFrame, corpusKey: Seq[Any],
             hasher: DataFrame => DataFrame = ImageDedup.hashed(_),
             maxDist: Int = 6): (DataFrame, Long) => Unit =
    (df, batchId) => {
      processBatch(df, batchId, sinkRoot, baseHashed, corpusKey, hasher, maxDist)
      ()
    }
}
