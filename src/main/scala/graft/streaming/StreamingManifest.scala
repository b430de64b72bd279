package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.text.ShardManifest
import graft.util.ArtifactStore

/** Streaming maintenance of the x87 shard manifest: a `foreachBatch`
  * operator that folds each admitted micro-batch into a PERSISTED
  * manifest version chain —
  *
  *   version(b) = absorb(batch_b, version(b−1)),   version(−1) = base
  *
  * — so at any point the head version describes exactly the documents
  * ingested so far, at O(batch) + O(32 shards) per trigger, without
  * ever rescanning the corpus (x87b's absorb==rebuild exactness made
  * continuous).
  *
  * Replay contract: versions are keyed by batchId and published behind
  * `ArtifactStore`'s atomic `_SUCCESS` gate, so a replayed batchId
  * finds its version already published and changes nothing — the chain
  * is exactly-once without any coordination beyond the streaming
  * checkpoint's stable batchId sequence (single writer per chain key,
  * as with [[IncrementalIngest]]).
  */
object StreamingManifest {

  private[streaming] def versionKey(chainKey: Seq[Any], batchId: Long): Seq[Any] =
    chainKey :+ s"b$batchId"

  /** Publish the chain's base version from the pre-existing corpus
    * (empty corpus → empty manifest). Call once before streaming.
    */
  def ensureBase(spark: SparkSession, baseCorpus: DataFrame,
                 chainKey: Seq[Any]): DataFrame =
    ShardManifest.ensure(spark, baseCorpus, versionKey(chainKey, -1L))

  /** Fold one micro-batch of (`doc_id`, `text`) into the chain. Returns
    * the head manifest after this batch.
    */
  def processBatch(batch: DataFrame, batchId: Long,
                   chainKey: Seq[Any]): DataFrame =
    ShardManifest.absorb(batch.sparkSession, batch,
      versionKey(chainKey, batchId - 1), versionKey(chainKey, batchId))

  /** Load a published version (batchId = −1 for the base). */
  def version(spark: SparkSession, chainKey: Seq[Any],
              batchId: Long): DataFrame =
    spark.read.parquet(ArtifactStore.artifactDir(spark, "shard_manifest",
      versionKey(chainKey, batchId)).getAbsolutePath)

  /** `foreachBatch` adapter. */
  def writer(chainKey: Seq[Any]): (DataFrame, Long) => Unit =
    (df, batchId) => { processBatch(df, batchId, chainKey); () }
}
