package graft.stats

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Correlation/covariance via SUFFICIENT STATISTICS — the distribution-
  * friendly form: per group, the six exact components (n, Σx, Σy, Σx²,
  * Σy², Σxy) folded as integers/decimals (order-independent, hash-stable
  * across shuffles), with the correlation derived at the END from the
  * already-exact components. This sidesteps the float-accumulator
  * problem that makes built-in `corr` fold-order-dependent: every
  * component is exact, and the final divide/sqrt is one deterministic
  * IEEE-754 evaluation per group — bit-identical in any engine given
  * identical components.
  *
  * The components are also MERGEABLE (plain sums), so per-partition /
  * per-day component rows can be persisted and added later — the
  * `IncrementalStats` lifecycle for second-order moments.
  */
object SufficientStats {

  /** Per-group components + derived Pearson correlation for an
    * integral-valued x column and a 2-decimal y column (the fixture
    * money/quantity shapes). Components ship as exact DECIMAL/BIGINT (a
    * large decimal cast to double is NOT correctly rounded in every
    * engine — measured one-ulp divergence — so exactness lives in the
    * decimals); `corr` is the one derived double, rounded to 12 decimals
    * to absorb conversion-ulp noise, null for degenerate (zero-variance)
    * groups.
    */
  def perGroup(df: DataFrame, groupCol: String, xCol: String,
               yCol: String): DataFrame = {
    val x = col(xCol).cast("long")
    val y = col(yCol).cast("decimal(18,2)")
    df.groupBy(col(groupCol))
      .agg(
        count(lit(1)).as("n"),
        sum(x).as("sum_x"),
        sum(y).cast("decimal(28,2)").as("sum_y"),
        sum(x * x).as("sum_xx"),
        sum((y * y).cast("decimal(38,4)")).as("sum_yy"),
        sum((x * y).cast("decimal(28,2)")).as("sum_xy"))
      .withColumn("corr", {
        val n = col("n").cast("double")
        val sx = col("sum_x").cast("double")
        val sy = col("sum_y").cast("double")
        val cov = n * col("sum_xy").cast("double") - sx * sy
        val vx = n * col("sum_xx").cast("double") - sx * sx
        val vy = n * col("sum_yy").cast("double") - sy * sy
        round(when(vx > 0 && vy > 0, cov / sqrt(vx * vy)), 12)
      })
  }
}
