package graft.stats

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance: keep a per-key summary table whose
  * state is MERGEABLE (counters + sketches), so absorbing a change batch
  * touches only the tiny summary and the batch — the corpus is never
  * rescanned.
  *
  * This is the table-lifecycle shape that matters at 100 TB: a full
  * recompute of per-source stats is a full corpus scan; the incremental
  * path is `summarize(delta)` (one scan of the BATCH) + `merge` (a
  * full-outer join of two KB-to-MB summary tables). Counters add; distinct
  * counts ride Datasketches HLL sketches, whose union is exactly the
  * sketch the full recompute would have built — merge-then-estimate equals
  * recompute-then-estimate, bit for bit (pinned in IncrementalStatsSpec).
  *
  * Composes with the rest of the lifecycle toolbox: persist summaries via
  * `tables/TimeTravel` commits for stats history, or `util/ArtifactStore`
  * for single-current-version semantics.
  */
object IncrementalStats {

  /** Per-key mergeable summary of `df`: row count, sum of `sumCol`, and an
    * HLL sketch of `distinctCol`. One scan, one key-shuffle with map-side
    * partials.
    */
  def summarize(df: DataFrame, key: String, sumCol: String,
                distinctCol: String): DataFrame =
    df.groupBy(col(key)).agg(
      count(lit(1)).as("n_rows"),
      sum(col(sumCol).cast("long")).as("sum_val"),
      hll_sketch_agg(col(distinctCol)).as("distinct_sk"))

  /** Absorb `delta` (a summary of the change batch) into `existing` (the
    * persisted summary): full-outer join on the key — new keys insert,
    * existing keys add counters and union sketches. Only the two summary
    * tables shuffle; their size is O(#keys), not O(#rows).
    */
  def merge(existing: DataFrame, delta: DataFrame, key: String): DataFrame = {
    val e = existing.select(col(key), col("n_rows").as("__n1"),
      col("sum_val").as("__s1"), col("distinct_sk").as("__k1"))
    val d = delta.select(col(key), col("n_rows").as("__n2"),
      col("sum_val").as("__s2"), col("distinct_sk").as("__k2"))
    e.join(d, Seq(key), "full_outer")
      .select(col(key),
        (coalesce(col("__n1"), lit(0L)) + coalesce(col("__n2"), lit(0L)))
          .as("n_rows"),
        (coalesce(col("__s1"), lit(0L)) + coalesce(col("__s2"), lit(0L)))
          .as("sum_val"),
        when(col("__k1").isNull, col("__k2"))
          .when(col("__k2").isNull, col("__k1"))
          .otherwise(hll_union(col("__k1"), col("__k2"))).as("distinct_sk"))
  }

  /** Human-readable form: estimate the sketch, keep exact counters. */
  def finish(summary: DataFrame, key: String): DataFrame =
    summary.select(col(key), col("n_rows"), col("sum_val"),
      hll_sketch_estimate(col("distinct_sk")).as("n_distinct_est"))

  /** The exact columns of a summary (for callers projecting oracle-exact
    * output without the sketch payload).
    */
  def exactCols(key: String): Seq[Column] =
    Seq(col(key), col("n_rows"), col("sum_val"))
}
