package graft.tables

import java.io.File
import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Snapshot versioning with time travel: every commit writes an immutable
  * full-snapshot parquet tree `v=<n>` plus one manifest row (version,
  * commit timestamp) to a tiny `_log` table; readers resolve a version
  * number or an AS OF timestamp against the manifest and scan exactly one
  * snapshot directory.
  *
  * Scale/lifecycle design:
  *   - snapshots are immutable — a reader holding version N is unaffected
  *     by later commits (snapshot isolation for free; no file is ever
  *     rewritten);
  *   - the manifest is metadata (one row per commit, KBs for years of
  *     history) — resolution is a driver-side lookup, never a data scan;
  *   - full-snapshot commits keep the read path trivial (one directory);
  *     INCREMENTAL history is already covered by the repo's change-batch
  *     operators — `Merge.applyScd2` for row history, `DatasetDiff` for
  *     version reconciliation — a delta-log format composes those with
  *     this manifest discipline;
  *   - single writer assumed (the reference's ETL is a single-flight
  *     job, `lambdas/start-etl/handler.py:16-54`); a multi-writer store
  *     needs an atomic commit protocol (rename/CAS on the manifest),
  *     which local-FS append approximates but does not guarantee.
  */
object TimeTravel {

  private val ManifestSchema = StructType(Seq(
    StructField("version", LongType, nullable = false),
    StructField("commit_ts", TimestampType, nullable = false)))

  private def logDir(root: String) = s"${root.stripSuffix("/")}/_log"
  private def snapDir(root: String, v: Long) = s"${root.stripSuffix("/")}/v=$v"

  /** All committed (version, commit_ts), ascending. Empty for a fresh root. */
  def versions(spark: SparkSession, root: String): Seq[(Long, Timestamp)] = {
    if (!new File(logDir(root)).exists()) return Seq.empty
    spark.read.schema(ManifestSchema).parquet(logDir(root))
      .orderBy(col("version"))
      .collect().map(r => (r.getLong(0), r.getTimestamp(1))).toSeq
  }

  /** Commit `df` as the next version with the given commit timestamp;
    * returns the version number. Commit timestamps must be monotonically
    * non-decreasing (enforced — AS OF resolution depends on it).
    */
  def commit(df: DataFrame, root: String, commitTs: Timestamp): Long = {
    val spark = df.sparkSession
    val existing = versions(spark, root)
    existing.lastOption.foreach { case (v, ts) =>
      require(!commitTs.before(ts),
        s"commit_ts $commitTs precedes version $v's $ts — history must be ordered")
    }
    val next = existing.lastOption.map(_._1 + 1).getOrElse(0L)
    df.write.mode("overwrite").parquet(snapDir(root, next))
    spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(next, commitTs)), 1),
      ManifestSchema)
      .write.mode("append").parquet(logDir(root))
    next
  }

  /** Read an exact version. Fails with the available range if absent. */
  def readVersion(spark: SparkSession, root: String, version: Long): DataFrame = {
    val vs = versions(spark, root)
    require(vs.exists(_._1 == version),
      s"version $version not in [${vs.headOption.map(_._1).getOrElse(-1L)}, " +
        s"${vs.lastOption.map(_._1).getOrElse(-1L)}] at $root")
    spark.read.parquet(snapDir(root, version))
  }

  /** Read the latest snapshot whose commit_ts <= `asOf`. Fails (with the
    * earliest available timestamp) when the history starts later.
    */
  def readAsOf(spark: SparkSession, root: String, asOf: Timestamp): DataFrame = {
    val vs = versions(spark, root)
    val hit = vs.filter(!_._2.after(asOf)).lastOption.getOrElse(
      throw new IllegalArgumentException(
        s"no snapshot at or before $asOf — history starts at " +
          s"${vs.headOption.map(_._2).getOrElse("<empty>")} at $root"))
    spark.read.parquet(snapDir(root, hit._1))
  }

  /** Latest version's frame (the "current table" read). */
  def readLatest(spark: SparkSession, root: String): DataFrame = {
    val vs = versions(spark, root)
    require(vs.nonEmpty, s"no committed versions at $root")
    spark.read.parquet(snapDir(root, vs.last._1))
  }
}
