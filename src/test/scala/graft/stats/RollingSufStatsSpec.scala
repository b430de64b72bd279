package graft.stats

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** `RollingSufStats.attach` — trailing-frame (count, Σcents, Σcents²)
  * with adaptive skew-safe bucketing — must be BIT-IDENTICAL to the
  * plain per-key window on every branch: the whole point is that the
  * bucketed form (parallelism #keys × #buckets instead of #keys) is a
  * pure plan change. Integer sums make the boundary corrections exact
  * by construction; these tests pin the bucket-boundary bookkeeping:
  * head rows reaching into the previous bucket's tail, first buckets
  * with genuinely short frames, and null values inside a frame.
  */
class RollingSufStatsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** 3 keys × 14 months × ~30 rows/month, values with nulls every 37th
    * row; a tie-heavy secondary order column exercises deterministic
    * ordering through (dt, seq).
    */
  private def fixture: DataFrame = {
    spark.range(0, 3 * 14 * 30)
      .select(
        (col("id") % 3).cast("string").as("k"),
        expr("date_add(date'2023-01-01', cast(id div 3 as int) % 420)").as("dt"),
        col("id").as("seq"),
        when(col("id") % 37 === 0, lit(null))
          .otherwise(pmod(col("id") * 131, lit(100000))).as("cents"))
  }

  private def plainStats(df: DataFrame, n: Int): DataFrame = {
    val w = Window.partitionBy("k").orderBy(col("dt"), col("seq"))
      .rowsBetween(-(n - 1), 0)
    df.select(col("k"), col("seq"),
      count(lit(1)).over(w).as("en"),
      sum(col("cents")).over(w).as("esxc"),
      sum(col("cents") * col("cents")).over(w).as("esxxc"))
  }

  test("bucketed path is chosen and matches the plain window exactly") {
    val df = fixture
    val st = graft.etl.MarketEtl.rollingStats(df, Seq("k"), col("dt"))
    assert(st.minMonth >= 6 && st.monthGroups > st.keys,
      s"fixture must qualify for month bucketing, got $st")
    val got = RollingSufStats.attach(df, Seq("k"),
        Seq(col("dt"), col("seq")), col("cents"), 7, col("dt"))
      .select(col("k"), col("seq"), col("__n"), col("__sxc"), col("__sxxc"))
    // the plan must actually be the bucketed one: corrections broadcast
    val plan = got.queryExecution.executedPlan.toString
    assert(plan.contains("__bucket"),
      s"expected the bucketed plan:\n${plan.take(1200)}")
    val exp = plainStats(df, 7)
    val joined = got.join(exp, Seq("k", "seq"))
    val bad = joined.filter(
      !(col("__n") === col("en")) ||
      !(col("__sxc") <=> col("esxc")) ||
      !(col("__sxxc") <=> col("esxxc")))
    assert(bad.count() === 0, s"mismatches:\n${bad.take(5).mkString("\n")}")
    assert(got.count() === df.count())
  }

  test("short months force the plain fallback; results still exact") {
    // one key has a 2-row month: minMonth < 6 → attach must fall back
    val df = fixture.filter(!(col("k") === "1" &&
      expr("date_trunc('month', dt)") === lit("2023-03-01").cast("timestamp") &&
      col("seq") % 30 > 1))
    val st = graft.etl.MarketEtl.rollingStats(df, Seq("k"), col("dt"))
    assert(st.minMonth < 6, s"fixture must disqualify month bucketing: $st")
    val got = RollingSufStats.attach(df, Seq("k"),
        Seq(col("dt"), col("seq")), col("cents"), 7, col("dt"))
      .select(col("k"), col("seq"), col("__n"), col("__sxc"), col("__sxxc"))
    if (st.minYear >= 6 && st.yearGroups > st.keys) {
      assert(got.queryExecution.executedPlan.toString.contains("__bucket"))
    }
    val exp = plainStats(df, 7)
    val bad = got.join(exp, Seq("k", "seq")).filter(
      !(col("__n") === col("en")) ||
      !(col("__sxc") <=> col("esxc")) ||
      !(col("__sxxc") <=> col("esxxc")))
    assert(bad.count() === 0)
  }

  test("w8 composed on the helper equals the plain-window z exactly at sf0.001") {
    val d = "/root/testdata/sf0.001"
    val viaHelper = graft.SparkEntry.queries("w8_zscore_outliers")(spark, d)
    graft.tables.Tables.lineitem(spark, d).createOrReplaceTempView("rss_li")
    val plain = spark.sql("""
      WITH b AS (SELECT l_returnflag AS ativo, l_shipdate AS dt,
                        l_extendedprice AS close_price,
                        l_orderkey, l_linenumber
                 FROM rss_li),
      w AS (
        SELECT ativo, l_orderkey, l_linenumber, close_price,
               COUNT(*) OVER win AS n,
               CAST(SUM(CAST(close_price AS DECIMAL(18,2))) OVER win
                    AS DOUBLE) AS sx,
               CAST(SUM(CAST(CAST(close_price AS DECIMAL(18,2))
                             * CAST(close_price AS DECIMAL(18,2))
                        AS DECIMAL(38,4))) OVER win AS DOUBLE) AS sxx
        FROM b
        WINDOW win AS (PARTITION BY ativo
                       ORDER BY dt, l_orderkey, l_linenumber, close_price
                       ROWS BETWEEN 6 PRECEDING AND CURRENT ROW))
      SELECT ativo, l_orderkey, l_linenumber,
             ROUND(CASE WHEN n = 7
                         AND (7.0D * sxx - sx * sx) / (7.0D * 6.0D) > 0
                        THEN (close_price - sx / 7.0D)
                             / sqrt((7.0D * sxx - sx * sx) / (7.0D * 6.0D))
                   END, 10) AS z
      FROM w""").withColumn("is_outlier", abs(col("z")) > 2.0)
    assert(viaHelper.exceptAll(plain).count() === 0L)
    assert(plain.exceptAll(viaHelper).count() === 0L)
  }
}
