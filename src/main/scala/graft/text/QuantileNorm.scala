package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-group quantile normalization on a bounded level frame — the ONE
  * implementation x97 and the x100 release capstone both build on
  * (R8hOpsSpec pins their agreement, so the logic must not fork). Raw
  * quality is x51's integer per-mill alpha ratio (≤1001 levels), the
  * CDF lives on a |groups|×|levels| frame, and the only ordered windows
  * run over that frame — never the corpus.
  */
object QuantileNorm {

  /** x51's integer per-mill alpha-ratio quality (proven engine-portable:
    * double division of ints, truncated to long identically everywhere).
    */
  def rawQuality(text: Column): Column =
    graft.util.Expr.bind(lower(text), t =>
      (length(regexp_replace(t, "[^a-z]", "")) * lit(1000L) /
        greatest(length(t), lit(1))).cast("long"))

  /** DuckDB mirror of [[rawQuality]] over a column named `text`. */
  val rawQualitySql: String =
    "length(regexp_replace(lower(text), '[^a-z]', '', 'g')) * 1000 " +
      "// greatest(length(text), 1)"

  /** Strictly-below per-mill quantile mapping per group: input must
    * carry (`groupCol`, `q`); output (`groupCol`, `q`, `norm`) with
    * norm = 1000·|{q' < q in group}| div |group| ∈ [0, 1000).
    */
  def mapping(scored: DataFrame, groupCol: String): DataFrame = {
    val levels = scored.groupBy(groupCol, "q").agg(count(lit(1)).as("c"))
    val wBelow = Window.partitionBy(groupCol).orderBy("q")
      .rowsBetween(Window.unboundedPreceding, -1)
    val wAll = Window.partitionBy(groupCol)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    levels
      .withColumn("below", coalesce(sum("c").over(wBelow), lit(0L)))
      .withColumn("n_grp", sum("c").over(wAll))
      .select(col(groupCol), col("q"),
        expr("below * 1000 div n_grp").as("norm"))
  }

  /** DuckDB mirror of [[mapping]]: CTE text for `lv` (levels) and `cdf`
    * given a prior CTE named `scored` with (`groupCol`, q) columns.
    */
  def mappingSql(groupCol: String): String =
    s"""lv AS (SELECT $groupCol, q, CAST(count(*) AS BIGINT) AS c
       |       FROM scored GROUP BY 1, 2),
       |cdf AS (SELECT $groupCol, q,
       |               COALESCE(SUM(c) OVER (PARTITION BY $groupCol ORDER BY q
       |                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
       |                 0) AS below,
       |               SUM(c) OVER (PARTITION BY $groupCol) AS n_grp
       |        FROM lv)""".stripMargin
}
