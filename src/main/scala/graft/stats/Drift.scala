package graft.stats

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distribution-drift diagnostics between data slices — the monitoring
  * step a training-data pipeline runs when a new crawl / source / vintage
  * lands: "does this slice's distribution still look like the corpus we
  * validated?".
  *
  * Both statistics are computed over a BINNED domain in per-mill integer
  * arithmetic:
  *
  *   - Binning first makes the shape scale-safe: the only per-group state
  *     is one row per (group, bin), so the ordered window that builds the
  *     ECDF runs over a frame bounded by the bin count — never by the row
  *     count. At 100 TB the corpus-scale work is exactly one partial-
  *     aggregable `groupBy(group, bin).count()` shuffle.
  *   - Per-mill floor-division (`cum * 1000 div n`) keeps every derived
  *     number integral, so the DuckDB oracle hashes bit-identically on
  *     any fixture vintage; the deliberate quantization error is < 2‰,
  *     irrelevant for a drift alarm. Cross-multiplied exact KS
  *     (`cum_a*n_b - cum_b*n_a`) would overflow BIGINT once both slices
  *     pass ~3e9 rows, so the per-mill form is also the 100 TB-safe one.
  *
  * Reference behavior context: the reference pipeline has no drift check
  * at all (its ETL re-reads whole prefixes, `etl_job.py`); this is part
  * of the §2.12 curation surface built beyond it.
  */
object Drift {

  /** Per-(group, bin) counts for every non-baseline group, aligned with the
    * baseline group's counts on the UNION grid of observed bins.
    * Returns (grid, totals): grid has (grp, bin, cnt_a, cnt_b); totals has
    * (grp, n_a, n_b). Both frames are bin/group-bounded, never row-bounded.
    */
  private def alignedCounts(df: DataFrame, groupCol: String, bin: Column,
                            baseline: String): (DataFrame, DataFrame) = {
    // The single corpus-scale stage: partial-aggregable count per (grp, bin).
    val cnts = df.select(col(groupCol).as("grp"), bin.as("bin"))
      .groupBy("grp", "bin").agg(count(lit(1)).as("cnt"))

    val aCnt = cnts.where(col("grp") =!= baseline)
    val bCnt = cnts.where(col("grp") === baseline)
      .select(col("bin"), col("cnt").as("cnt_b"))

    // Every (candidate group × observed bin) cell, so both ECDFs step on
    // the pooled support. |groups| × |bins| rows — tiny by construction.
    val grid = aCnt.select("grp").distinct()
      .crossJoin(cnts.select("bin").distinct())

    val aligned = grid
      .join(aCnt.withColumnRenamed("cnt", "cnt_a"), Seq("grp", "bin"), "left")
      .join(broadcast(bCnt), Seq("bin"), "left")
      .na.fill(0L, Seq("cnt_a", "cnt_b"))

    val totals = aligned.groupBy("grp")
      .agg(sum("cnt_a").as("n_a"), sum("cnt_b").as("n_b"))
    (aligned, totals)
  }

  /** Two-sample Kolmogorov–Smirnov drift (per-mill, binned) of each group's
    * `bin` distribution against the `baseline` group's:
    * `ks_permill = max_bins |ecdf_a - ecdf_b|` with per-mill integer ECDFs.
    * Output: (grp, n_a, n_b, ks_permill), one row per non-baseline group.
    */
  def ksDrift(df: DataFrame, groupCol: String, bin: Column,
              baseline: String): DataFrame = {
    val (aligned, totals) = alignedCounts(df, groupCol, bin, baseline)
    // ECDF window: per-group, ordered by bin — frame is bin-bounded.
    val w = Window.partitionBy("grp").orderBy("bin")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    aligned
      .select(col("grp"),
        sum("cnt_a").over(w).as("cum_a"), sum("cnt_b").over(w).as("cum_b"))
      .join(broadcast(totals), "grp")
      .select(col("grp"), col("n_a"), col("n_b"),
        expr("abs(cum_a * 1000 div n_a - cum_b * 1000 div n_b)").as("d"))
      .groupBy("grp")
      .agg(max("n_a").as("n_a"), max("n_b").as("n_b"),
        max("d").as("ks_permill"))
  }

  /** SQL (DuckDB) twin of [[ksDrift]]. `binSql` must be the same binning
    * expression over the same table; caller supplies FROM-able `table`. */
  def ksDriftSql(table: String, groupCol: String, binSql: String,
                 baseline: String): String =
    s"""WITH c AS (
       |  SELECT $groupCol AS grp, $binSql AS bin, CAST(count(*) AS BIGINT) AS cnt
       |  FROM $table GROUP BY 1, 2),
       |grid AS (
       |  SELECT g.grp, b.bin
       |  FROM (SELECT DISTINCT grp FROM c WHERE grp <> '$baseline') g
       |  CROSS JOIN (SELECT DISTINCT bin FROM c) b),
       |al AS (
       |  SELECT grid.grp, grid.bin,
       |         COALESCE(a.cnt, 0) AS cnt_a, COALESCE(bb.cnt, 0) AS cnt_b
       |  FROM grid
       |  LEFT JOIN c a ON a.grp = grid.grp AND a.bin = grid.bin
       |  LEFT JOIN (SELECT bin, cnt FROM c WHERE grp = '$baseline') bb
       |    ON bb.bin = grid.bin),
       |cum AS (
       |  SELECT grp,
       |         SUM(cnt_a) OVER (PARTITION BY grp ORDER BY bin
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_a,
       |         SUM(cnt_b) OVER (PARTITION BY grp ORDER BY bin
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_b
       |  FROM al),
       |tot AS (SELECT grp, CAST(SUM(cnt_a) AS BIGINT) AS n_a,
       |               CAST(SUM(cnt_b) AS BIGINT) AS n_b
       |        FROM al GROUP BY grp)
       |SELECT cum.grp, tot.n_a, tot.n_b,
       |       CAST(MAX(abs(cum_a * 1000 // n_a - cum_b * 1000 // n_b))
       |            AS BIGINT) AS ks_permill
       |FROM cum JOIN tot ON cum.grp = tot.grp
       |GROUP BY cum.grp, tot.n_a, tot.n_b""".stripMargin

  /** Total-variation drift (per-mill, binned) of each group against the
    * baseline: `tv_permill = (sum_bins |pmf_a - pmf_b|) / 2` with per-mill
    * integer PMFs. Output: (grp, n_a, n_b, tv_permill). */
  def tvDrift(df: DataFrame, groupCol: String, bin: Column,
              baseline: String): DataFrame = {
    val (aligned, totals) = alignedCounts(df, groupCol, bin, baseline)
    aligned
      .join(broadcast(totals), "grp")
      .select(col("grp"), col("n_a"), col("n_b"),
        expr("abs(cnt_a * 1000 div n_a - cnt_b * 1000 div n_b)").as("d"))
      .groupBy("grp")
      .agg(max("n_a").as("n_a"), max("n_b").as("n_b"),
        expr("sum(d) div 2").as("tv_permill"))
  }

  /** Total-variation drift of each group against a PRECOMPUTED baseline
    * histogram `(bin, cnt)` — the ingest-gate form: the baseline is built
    * once from the validated corpus (see [[ensureBaseline]]) and every
    * new slice compares against that durable artifact without touching
    * the corpus again. Output: (grp, n_a, n_b, tv_permill). */
  def tvVsBaseline(df: DataFrame, groupCol: String, bin: Column,
                   baseline: DataFrame): DataFrame = {
    val cnts = df.select(col(groupCol).as("grp"), bin.as("bin"))
      .groupBy("grp", "bin").agg(count(lit(1)).as("cnt_a"))
    val base = baseline.select(col("bin"), col("cnt").as("cnt_b"))
    // pooled support: bins observed in the slices OR the baseline
    val bins = cnts.select("bin").union(base.select("bin")).distinct()
    val grid = cnts.select("grp").distinct().crossJoin(bins)
    val aligned = grid
      .join(cnts, Seq("grp", "bin"), "left")
      .join(broadcast(base), Seq("bin"), "left")
      .na.fill(0L, Seq("cnt_a", "cnt_b"))
    val totals = aligned.groupBy("grp")
      .agg(sum("cnt_a").as("n_a"), sum("cnt_b").as("n_b"))
    aligned
      .join(broadcast(totals), "grp")
      .select(col("grp"), col("n_a"), col("n_b"),
        expr("abs(cnt_a * 1000 div n_a - cnt_b * 1000 div n_b)").as("d"))
      .groupBy("grp")
      .agg(max("n_a").as("n_a"), max("n_b").as("n_b"),
        expr("sum(d) div 2").as("tv_permill"))
  }

  /** Build-once durable baseline histogram `(bin, cnt)` for the drift
    * gate — same artifact lifecycle as the membership / LSH / IVF
    * indexes: first-writer-wins tmp+rename, survives a fresh JVM,
    * keyed by the immutable corpus + binning spec. */
  def ensureBaseline(spark: org.apache.spark.sql.SparkSession,
                     corpus: => DataFrame, bin: Column,
                     key: Seq[Any]): DataFrame = {
    import graft.util.ArtifactStore
    val dir = ArtifactStore.artifactDir(spark, "drift_baseline", key)
    if (!new java.io.File(dir, "_SUCCESS").exists()) {
      val tmp = new java.io.File(dir.getParentFile,
        dir.getName + ".tmp-" + java.util.UUID.randomUUID().toString.take(8))
      corpus.select(bin.as("bin")).groupBy("bin")
        .agg(count(lit(1)).as("cnt"))
        .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
        .parquet(tmp.getAbsolutePath)
      ArtifactStore.publishDir(tmp, dir)
    }
    spark.read.parquet(dir.getAbsolutePath)
  }

  /** Absorb a new batch into a persisted baseline WITHOUT rescanning the
    * corpus the baseline summarizes: merged = stored histogram + batch
    * histogram, published as a NEW artifact version under `newKey`
    * (same first-writer-wins lifecycle; the old version stays readable —
    * refreshing consumers is a key roll, the x59/IncrementalStats
    * discipline). Cost is O(batch) + O(bins). Returns the merged
    * histogram. Histogram addition is exact, so absorb == full rebuild
    * bit-for-bit (pinned in `R8bOpsSpec` and the x64b oracle). */
  def absorbBaseline(spark: org.apache.spark.sql.SparkSession,
                     batch: DataFrame, bin: Column,
                     baseKey: Seq[Any], newKey: Seq[Any]): DataFrame = {
    import graft.util.ArtifactStore
    val dir = ArtifactStore.artifactDir(spark, "drift_baseline", newKey)
    if (!new java.io.File(dir, "_SUCCESS").exists()) {
      val base = spark.read.parquet(
        ArtifactStore.artifactDir(spark, "drift_baseline", baseKey)
          .getAbsolutePath)
      val delta = batch.select(bin.as("bin")).groupBy("bin")
        .agg(count(lit(1)).as("cnt"))
      val tmp = new java.io.File(dir.getParentFile,
        dir.getName + ".tmp-" + java.util.UUID.randomUUID().toString.take(8))
      base.unionByName(delta).groupBy("bin").agg(sum("cnt").as("cnt"))
        .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
        .parquet(tmp.getAbsolutePath)
      ArtifactStore.publishDir(tmp, dir)
    }
    spark.read.parquet(dir.getAbsolutePath)
  }

  /** SQL (DuckDB) twin of [[tvDrift]]. */
  def tvDriftSql(table: String, groupCol: String, binSql: String,
                 baseline: String): String =
    s"""WITH c AS (
       |  SELECT $groupCol AS grp, $binSql AS bin, CAST(count(*) AS BIGINT) AS cnt
       |  FROM $table GROUP BY 1, 2),
       |grid AS (
       |  SELECT g.grp, b.bin
       |  FROM (SELECT DISTINCT grp FROM c WHERE grp <> '$baseline') g
       |  CROSS JOIN (SELECT DISTINCT bin FROM c) b),
       |al AS (
       |  SELECT grid.grp, grid.bin,
       |         COALESCE(a.cnt, 0) AS cnt_a, COALESCE(bb.cnt, 0) AS cnt_b
       |  FROM grid
       |  LEFT JOIN c a ON a.grp = grid.grp AND a.bin = grid.bin
       |  LEFT JOIN (SELECT bin, cnt FROM c WHERE grp = '$baseline') bb
       |    ON bb.bin = grid.bin),
       |tot AS (SELECT grp, CAST(SUM(cnt_a) AS BIGINT) AS n_a,
       |               CAST(SUM(cnt_b) AS BIGINT) AS n_b
       |        FROM al GROUP BY grp)
       |SELECT al.grp, tot.n_a, tot.n_b,
       |       CAST(SUM(abs(cnt_a * 1000 // n_a - cnt_b * 1000 // n_b)) // 2
       |            AS BIGINT) AS tv_permill
       |FROM al JOIN tot ON al.grp = tot.grp
       |GROUP BY al.grp, tot.n_a, tot.n_b""".stripMargin
}
