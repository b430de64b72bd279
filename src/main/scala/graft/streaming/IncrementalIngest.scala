package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.text.{LshIndex, MembershipIndex, TextOps}

/** The full incremental corpus-ingest lifecycle as ONE `foreachBatch`
  * operator — the production composition of the pieces the engine builds
  * separately (x1 exact dedup, x34's membership index, x37's LSH index,
  * T8's exactly-once sink): each micro-batch of documents is
  *
  *   1. exact-deduped WITHIN the batch (content-keyed, min-id survivor —
  *      hash routes, content decides);
  *   2. anti-joined against the corpus's persisted exact-membership
  *      index (re-crawls of anything already admitted are dropped — the
  *      index, not the corpus, is probed);
  *   3. near-dup-probed against the corpus's persisted LSH band-key
  *      index (O(batch) candidates + exact-Jaccard verify on the
  *      candidate sliver only);
  *   4. near-dup-deduped within itself (pair-based min-id);
  *   5. committed exactly-once to a [[SnapshotSink]] table, and — only
  *      when this call performed the commit — appended to BOTH indexes,
  *      so the NEXT batch's probes see this batch's documents.
  *
  * Exactly-once/crash contract: the sink commit is the atomic point
  * (CAS manifest). The index appends happen after it; a crash between
  * commit and append is healed on replay — a replayed batchId re-reads
  * the ADMITTED rows from the sink's own delta dir and re-appends them
  * (both appends are idempotent-for-correctness: duplicate index rows
  * only produce duplicate candidates, which the probes collapse). Net:
  * the table is exactly-once, the indexes are at-least-once-idempotent,
  * and no admitted document can be invisible to later batches.
  *
  * The static per-bucket Bloom fast-path (x34) is deliberately NOT used
  * here: a Bloom blob fitted over the base corpus is stale for documents
  * admitted later, and a stale "proven new" would break the
  * no-false-negative contract exactly where it matters. Bloom pruning
  * belongs to the batch-vs-frozen-corpus shape; a growing corpus probes
  * the appended indexes.
  *
  * At 100 TB: every per-batch job is O(batch) — the corpus parquet is
  * touched only to fetch the LSH candidate sliver rows for the exact
  * verify (the x37 contract). Single writer per sink root (a streaming
  * query's checkpoint provides the stable batchId sequence this keys on).
  */
object IncrementalIngest {

  /** Process one micro-batch. Returns true iff this call performed the
    * commit (false = replay; indexes re-healed, nothing else touched).
    *
    * @param baseCorpus  the frozen pre-existing corpus (id, text) the
    *                    indexes were/will be built over
    * @param corpusKey   immutable identity of (baseCorpus, params) — keys
    *                    both persisted indexes
    */
  def processBatch(batch: DataFrame, batchId: Long, sinkRoot: String,
                   baseCorpus: DataFrame, corpusKey: Seq[Any],
                   threshold: Double = 0.8, numBuckets: Int = 16,
                   idCol: String = "doc_id", textCol: String = "text",
                   commitTs: Timestamp = new Timestamp(System.currentTimeMillis())): Boolean = {
    val spark = batch.sparkSession
    val memberIdx = MembershipIndex.ensureIndex(spark, baseCorpus, corpusKey, numBuckets, textCol)
    val lshIdx = LshIndex.ensureIndex(spark, baseCorpus, corpusKey)

    if (SnapshotSink.commits(spark, sinkRoot).exists(_._1 == batchId)) {
      // replay of a committed batch: heal the commit->append crash
      // window by re-appending the admitted rows from the sink's own
      // delta dir (idempotent), then change nothing else
      val admitted = SnapshotSink.readBatch(spark, sinkRoot, batchId)
        .select(col(idCol), col(textCol))
      MembershipIndex.appendToIndex(spark, admitted, corpusKey, numBuckets, textCol)
      LshIndex.appendToIndex(spark, admitted, corpusKey)
      return false
    }

    // (1) exact self-dedup: shuffle keyed on (fingerprint, content)
    val selfDeduped = batch
      .select(col(idCol), col(textCol))
      .withColumn("__fp", TextOps.rollingHash(col(textCol)))
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col("__fp"), col(textCol)).orderBy(col(idCol))))
      .filter(col("__rn") === 1)
      .drop("__fp", "__rn")

    // (2) exact membership vs the persisted index
    val notMember = selfDeduped
      .withColumn("fp", TextOps.rollingHash(col(textCol)))
      .withColumn("bucket", pmod(col("fp"), lit(numBuckets)).cast("int"))
      .join(memberIdx, Seq("bucket", "fp", textCol), "left_anti")
      .drop("fp", "bucket")

    // (3) near-dups of the (base ∪ admitted) corpus via the LSH index;
    // the verify side fetches candidate rows from base + committed deltas
    val commitsNow = SnapshotSink.commits(spark, sinkRoot)
    val corpusNow =
      if (commitsNow.isEmpty) baseCorpus.select(col(idCol), col(textCol))
      else baseCorpus.select(col(idCol), col(textCol))
        .unionByName(SnapshotSink.readCommitted(spark, sinkRoot)
          .select(col(idCol), col(textCol)))
    val nearDupIds = LshIndex.probeNearDups(notMember, corpusNow, lshIdx,
      threshold, idCol = idCol, textCol = textCol)
    val notNearDup = notMember.join(nearDupIds, Seq(idCol), "left_anti")

    // (4) near-dup dedup within the batch itself (pair-based min-id)
    val admitted = TextOps.dedupCorpus(notNearDup, threshold, idCol, textCol)

    // (5) exactly-once commit, then index maintenance
    val committed = SnapshotSink.commitBatch(admitted, sinkRoot, batchId, commitTs)
    if (committed) {
      val rows = SnapshotSink.readBatch(spark, sinkRoot, batchId)
        .select(col(idCol), col(textCol))
      MembershipIndex.appendToIndex(spark, rows, corpusKey, numBuckets, textCol)
      LshIndex.appendToIndex(spark, rows, corpusKey)
    }
    committed
  }

  /** `foreachBatch` adapter. */
  def writer(sinkRoot: String, baseCorpus: DataFrame, corpusKey: Seq[Any],
             threshold: Double = 0.8, numBuckets: Int = 16): (DataFrame, Long) => Unit =
    (df, batchId) => {
      processBatch(df, batchId, sinkRoot, baseCorpus, corpusKey, threshold, numBuckets)
      ()
    }
}
