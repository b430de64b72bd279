package graft.stats

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** Correlation/covariance via SUFFICIENT STATISTICS — the distribution-
  * friendly form: per group, the six exact components (n, Σx, Σy, Σx²,
  * Σy², Σxy) folded as integers (order-independent, hash-stable across
  * shuffles), with the correlation derived at the END from the
  * already-exact components. This sidesteps the float-accumulator
  * problem that makes built-in `corr` fold-order-dependent: every
  * component is exact, and the final divide/sqrt is one deterministic
  * IEEE-754 evaluation per group — bit-identical in any engine given
  * identical components.
  *
  * All components are BIGINT — no decimal wider than 18 digits ever
  * reaches the output schema. The money column is quantized ONCE per row
  * to integer cents via the shared double op `round(y * 100)` (the same
  * op on both engines of a cross-engine compare sees the same IEEE
  * product, so the integer is engine-exact by construction). Σy² would
  * overflow int64 at ~1e10 rows of 5-digit prices, so it is carried
  * SPLIT-RADIX: per row, yc² is divided into (yc² div 1e6, yc² mod 1e6)
  * and each half summed separately — two exact, independently-mergeable
  * BIGINTs (Σy² = hi·1e6 + lo), each bounded by n·max(yc²)/1e6 resp.
  * n·1e6, i.e. safe to ~1e12 rows. Same headroom math bounds Σxy (x
  * ≤ 2⁷-scale quantities) without a split.
  *
  * The components are MERGEABLE (plain sums — hi/lo halves add
  * independently), so per-partition / per-day component rows can be
  * persisted and added later — the `IncrementalStats` lifecycle for
  * second-order moments.
  */
object SufficientStats {

  /** Per-row radix for the Σy² split: yc² = 1e6·(yc² div 1e6) + (yc² mod
    * 1e6), summed half-by-half.
    */
  val YyRadix = 1000000L

  /** Per-group components + derived Pearson correlation for an
    * integral-valued x column and a 2-decimal y column (the fixture
    * money/quantity shapes). y is quantized to integer cents once per
    * row; all outputs are BIGINT except the one derived double `corr`,
    * rounded to 12 decimals to absorb conversion-ulp noise, null for
    * degenerate (zero-variance) groups. Correlation is scale-invariant,
    * so corr over (x, cents) equals corr over (x, dollars).
    */
  def perGroup(df: DataFrame, groupCol: String, xCol: String,
               yCol: String): DataFrame = {
    val prepared = df.select(
      col(groupCol),
      col(xCol).cast("long").as("__x"),
      expr(s"CAST(round($yCol * 100) AS BIGINT)").as("__yc"))
    prepared.groupBy(col(groupCol))
      .agg(
        count(lit(1)).as("n"),
        sum(col("__x")).as("sum_x"),
        sum(col("__yc")).as("sum_y_cents"),
        sum(col("__x") * col("__x")).as("sum_xx"),
        sum(expr(s"(__yc * __yc) div $YyRadix")).as("sum_yy_hi"),
        sum(expr(s"(__yc * __yc) % $YyRadix")).as("sum_yy_lo"),
        sum(col("__x") * col("__yc")).as("sum_xy_cents"))
      .withColumn("corr", {
        val n = col("n").cast("double")
        val sx = col("sum_x").cast("double")
        val sy = col("sum_y_cents").cast("double")
        val syy = col("sum_yy_hi").cast("double") * lit(YyRadix.toDouble) +
          col("sum_yy_lo").cast("double")
        val cov = n * col("sum_xy_cents").cast("double") - sx * sy
        val vx = n * col("sum_xx").cast("double") - sx * sx
        val vy = n * syy - sy * sy
        round(when(vx > 0 && vy > 0, cov / sqrt(vx * vy)), 12)
      })
  }
}
