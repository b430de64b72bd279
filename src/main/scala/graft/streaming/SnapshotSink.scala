package graft.streaming

import java.io.File
import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Exactly-once streaming sink into a versioned, append-only snapshot
  * table (T8): `foreachBatch` hands this sink at-least-once micro-batches
  * with a stable `batchId`; the sink makes the TABLE exactly-once by
  * making the commit idempotent on that id.
  *
  * Protocol (the delta-log discipline, minimally):
  *   1. already committed? → no-op. The data directory is NOT touched —
  *      a replayed batch cannot disturb a committed one.
  *   2. write the batch to its own immutable delta dir `b=<batchId>`
  *      (overwrite mode: a half-written dir from a crashed attempt is
  *      simply clobbered by the retry — it was never visible, because…)
  *   3. …append ONE manifest row `(batch_id, version, commit_ts, n_rows)`
  *      to the `_commits` log. The manifest append IS the commit point:
  *      readers resolve the manifest first and scan exactly the committed
  *      delta dirs, so an uncommitted/partial `b=` dir is invisible.
  *
  * Crash matrix: die before (2) → retry rewrites nothing visible; die
  * between (2) and (3) → dir exists but is invisible, retry overwrites
  * and commits; die after (3) → replay hits (1) and no-ops. Net effect:
  * each batch's rows appear in the table exactly once.
  *
  * Scale/lifecycle:
  *   - append-only deltas: a micro-batch commit writes ONLY its own rows —
  *     never a snapshot rewrite (contrast `TimeTravel.commit`, the full-
  *     snapshot form for batch jobs); at 100 TB the per-commit cost is
  *     the batch, not the table;
  *   - the manifest is one row per batch (KBs/day) — resolution is a
  *     driver-side metadata read, never a data scan;
  *   - accumulated small deltas are the small-file problem the repo's
  *     `pipeline/Compaction` bin-packer already solves; `compactInto`
  *     folds committed deltas into a `TimeTravel` full snapshot for the
  *     long-term read path;
  *   - single writer per table root assumed (one streaming query per
  *     checkpoint — the T2 single-flight contract); multi-writer needs a
  *     CAS/rename commit protocol on the log.
  *
  * Reference provenance: the reference's streaming ingest commits refined
  * partitions then refreshes the catalog (`lambdas/start-etl/handler.py:
  * 16-54`); its exactly-once story is Glue job bookmarks — this sink is
  * the same bookmark idea with the bookmark (batch id) stored IN the
  * table's own commit log.
  */
object SnapshotSink {

  private val ManifestSchema = StructType(Seq(
    StructField("batch_id", LongType, nullable = false),
    StructField("version", LongType, nullable = false),
    StructField("commit_ts", TimestampType, nullable = false),
    StructField("n_rows", LongType, nullable = false)))

  private def logDir(root: String) = s"${root.stripSuffix("/")}/_commits"
  private def batchDir(root: String, b: Long) = s"${root.stripSuffix("/")}/b=$b"

  /** Committed (batch_id, version, commit_ts, n_rows), version-ascending.
    * Empty for a fresh root.
    */
  def commits(spark: SparkSession, root: String): Seq[(Long, Long, Timestamp, Long)] = {
    if (!new File(logDir(root)).exists()) return Seq.empty
    spark.read.schema(ManifestSchema).parquet(logDir(root))
      .orderBy(col("version"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2), r.getLong(3)))
      .toSeq
  }

  /** Idempotently commit one micro-batch. Returns true iff this call
    * performed the commit (false = `batchId` was already committed and
    * nothing was touched).
    */
  def commitBatch(df: DataFrame, root: String, batchId: Long,
                  commitTs: Timestamp): Boolean = {
    val spark = df.sparkSession
    val existing = commits(spark, root)
    if (existing.exists(_._1 == batchId)) return false
    val dir = batchDir(root, batchId)
    df.write.mode("overwrite").parquet(dir)
    // count from the written files' footers — no second pass over `df`
    // (which may be a one-shot streaming source view)
    val n = spark.read.parquet(dir).count()
    val version = existing.lastOption.map(_._2 + 1).getOrElse(0L)
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        Seq(Row(batchId, version, commitTs, n)), 1), ManifestSchema)
      .write.mode("append").parquet(logDir(root))
    true
  }

  /** `foreachBatch` adapter stamping wall-clock commit time. */
  def writer(root: String): (DataFrame, Long) => Unit =
    (df, batchId) =>
      { commitBatch(df, root, batchId, new Timestamp(System.currentTimeMillis())); () }

  /** The table: union of exactly the COMMITTED delta dirs (an uncommitted
    * or half-written `b=` dir is invisible). One parquet relation over n
    * sibling dirs — partition-parallel, no per-dir driver loop.
    */
  def readCommitted(spark: SparkSession, root: String): DataFrame = {
    val cs = commits(spark, root)
    require(cs.nonEmpty, s"no committed batches at $root")
    spark.read.parquet(cs.map(c => batchDir(root, c._1)): _*)
  }

  /** Fold all committed deltas into a full `TimeTravel` snapshot at
    * `snapshotRoot` — the long-term read path once a table stops being
    * hot (bounded version history, compacted files).
    */
  def compactInto(spark: SparkSession, root: String, snapshotRoot: String,
                  commitTs: Timestamp): Long =
    graft.tables.TimeTravel.commit(readCommitted(spark, root), snapshotRoot, commitTs)
}
