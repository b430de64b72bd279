package graft.pipeline

import java.io.File

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) clustering + a min/max file-skipping index — the
  * lakehouse data-layout pair that makes multi-dimensional selective scans
  * cheap at 100 TB.
  *
  * Why: partition pruning handles ONE dimension (the partition key). A
  * second selective column forces a full scan of every matching partition.
  * Interleaving the bits of k rank-normalized columns into one sort key
  * makes rows close in ANY of those dimensions land in the same files, so
  * per-file min/max ranges become tight on EVERY clustered column at once
  * — a box predicate then skips most files before any row is read. The
  * reference's Athena users get this from columnar statistics over
  * partitioned parquet (`/root/reference/README.md:274-296` filters on
  * `ano/mes/dia` + value columns); z-ordering generalizes it past the
  * partition key.
  *
  * Scale design:
  *   - normalization stats (per-column min/max) are ONE tiny aggregate —
  *     bounded driver metadata, same class as percentile rank bookkeeping;
  *   - the z-value is pure bitwise arithmetic on codegen'd built-ins
  *     (`shiftleft`/`&`/`|`) — no UDF, stays inside WholeStageCodegen;
  *   - the layout write is `repartitionByRange` on the z-value (one range
  *     shuffle, Spark samples boundaries) + an in-partition sort;
  *   - the index is per-FILE min/max collected in one group-by over
  *     `_metadata.file_path` — a few rows per file, persisted as a tiny
  *     sibling parquet (the `ArtifactStore` index-table discipline);
  *   - a pruned read consults the index (driver-side, KBs), reads only
  *     intersecting files, and re-applies the exact predicate — pruning is
  *     conservative, correctness never depends on it.
  *
  * Null keys: a null in any clustered column yields a null z-value, routed
  * to the low end of the range partitioning (`asc_nulls_first`), i.e.
  * nulls concentrate in the first file(s). Range predicates never match
  * null, so index pruning (which ignores nulls in min/max) stays safe.
  */
object ZOrder {

  /** Per-dimension resolution: as many bits as fit k dims below the
    * long's SIGN BIT (bit 63) — 16 bits up to 3 dims, 15 at 4 dims. With
    * 4×16 the top bit of dim 3 would land ON the sign bit, flipping half
    * the rows negative and range-partitioning them FIRST — silently
    * destroying the clustering (pruning stays correct, just useless).
    */
  private def bitsFor(k: Int): Int = math.min(16, 63 / k)

  /** Spread the low `bits` bits of `v` so consecutive bits land `step`
    * apart (step = number of interleaved dimensions). Classic Morton
    * spreading generalized to k dims. Built entirely from codegen'd
    * bitwise built-ins; the shift-or chain is branch-free and static.
    */
  private def spread(v: Column, step: Int, bits: Int): Column = {
    if (step == 1) v
    else (0 until bits).map { i =>
      shiftleft(shiftright(v, i).bitwiseAND(lit(1L)), i * step)
    }.reduce(_ bitwiseOR _)
  }

  /** Rank-normalize `c` into [0, 2^bits) by linear min/max scaling (stats
    * passed in — computed once by the caller). Double arithmetic is fine
    * here: the scale only steers LAYOUT quality; filter correctness never
    * reads it.
    */
  private def normalize(c: Column, lo: Double, hi: Double, bits: Int): Column = {
    val range = math.max(hi - lo, java.lang.Double.MIN_VALUE)
    val maxV = ((1 << bits) - 1).toDouble
    least(greatest(
      floor((c.cast("double") - lit(lo)) * lit(maxV / range)),
      lit(0.0)), lit(maxV)).cast("long")
  }

  /** The interleaved z-value for `cols` given (lo, hi) stats per column.
    * Always non-negative: k·bitsFor(k) < 64 keeps the sign bit clear.
    */
  def zValue(cols: Seq[Column], stats: Seq[(Double, Double)]): Column = {
    require(cols.nonEmpty && cols.size <= 4, s"1-4 dims, got ${cols.size}")
    val k = cols.size
    val bits = bitsFor(k)
    cols.zip(stats).zipWithIndex.map { case ((c, (lo, hi)), i) =>
      shiftleft(spread(normalize(c, lo, hi, bits), k, bits), i)
    }.reduce(_ bitwiseOR _)
  }

  /** One-pass per-column (min, max) stats for the clustering columns. A
    * column with no non-null values (or an empty input) gets the
    * degenerate (0, 1) range — every row's z-contribution for it is then
    * null/zero, which the null-routing path already handles, instead of
    * an opaque NPE from the null aggregate.
    */
  def columnStats(df: DataFrame, cols: Seq[String]): Seq[(Double, Double)] = {
    val aggs = cols.flatMap(c =>
      Seq(min(col(c).cast("double")), max(col(c).cast("double"))))
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    cols.indices.map { i =>
      if (row.isNullAt(2 * i)) (0.0, 1.0)
      else (row.getDouble(2 * i), row.getDouble(2 * i + 1))
    }
  }

  /** Write `df` z-order-clustered on `cols` into `outDir` as ~`numFiles`
    * parquet files, then build and persist the min/max file index beside
    * it. Idempotent per (outDir): an existing `_SUCCESS` is trusted.
    */
  def clusterWrite(df: DataFrame, cols: Seq[String], outDir: String,
                   numFiles: Int): Unit = {
    if (new File(outDir, "_SUCCESS").exists() &&
        new File(indexDir(outDir), "_SUCCESS").exists()) return
    val stats = columnStats(df, cols)
    val z = zValue(cols.map(col), stats)
    df.withColumn("__z", z)
      .repartitionByRange(numFiles, col("__z").asc_nulls_first)
      .sortWithinPartitions(col("__z").asc_nulls_first)
      .drop("__z")
      .write.mode("overwrite").parquet(outDir)
    buildFileIndex(df.sparkSession, outDir, cols)
  }

  def indexDir(dataDir: String): String = dataDir.stripSuffix("/") + "__idx"

  /** Per-file min/max of `cols` over the files in `dataDir`, persisted as
    * the skipping index (a few rows per file — KBs for thousands of
    * files). Re-derivable at any time from the data; callers that rewrite
    * `dataDir` simply rebuild it (clusterWrite does).
    */
  def buildFileIndex(spark: SparkSession, dataDir: String,
                     cols: Seq[String]): Unit = {
    val aggs = cols.flatMap(c => Seq(
      min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c")))
    spark.read.parquet(dataDir)
      .groupBy(col("_metadata.file_path").as("file_path"))
      .agg(aggs.head, aggs.tail: _*)
      .coalesce(1)
      .write.mode("overwrite").parquet(indexDir(dataDir))
  }

  /** One conjunctive index consultation: read the tiny index ONCE, apply
    * every range's intersection test in a single filter, collect the
    * surviving file paths (bounded metadata — one row per file). Empty
    * `ranges` keeps every file (no pruning evidence, full read).
    */
  def candidateFiles(spark: SparkSession, dataDir: String,
                     ranges: Seq[(String, Any, Any)]): Seq[String] = {
    val idx = spark.read.parquet(indexDir(dataDir))
    val pred = ranges
      .map { case (c, lo, hi) =>
        !(col(s"max_$c") < lit(lo) || col(s"min_$c") > lit(hi)) }
      .reduceOption(_ && _).getOrElse(lit(true))
    idx.filter(pred).select(col("file_path"))
      .collect().map(_.getString(0)).toSeq
  }

  /** Read only the files that can contain rows matching ALL the given
    * per-column ranges (conjunctive box predicate), for a clustered table.
    * Callers MUST still apply the exact predicate — pruning is
    * conservative (file granularity), not exact.
    */
  def prunedRead(spark: SparkSession, dataDir: String,
                 ranges: Seq[(String, Any, Any)]): DataFrame = {
    val files = candidateFiles(spark, dataDir, ranges).sorted
    if (files.isEmpty) spark.read.parquet(dataDir).limit(0)
    else spark.read.parquet(files: _*)
  }

  /** Pruning power diagnostic: (files matching the box, total files). */
  def pruneStats(spark: SparkSession, dataDir: String,
                 ranges: Seq[(String, Any, Any)]): (Int, Int) = {
    val all = candidateFiles(spark, dataDir, Seq.empty)
    val kept = candidateFiles(spark, dataDir, ranges)
    (kept.size, all.size)
  }
}
