package graft.stats

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** `KeyedPrefix` — per-key running sum and lag with adaptive bucketing —
  * must be BIT-IDENTICAL to the plain per-key window on every branch.
  * Boundary coverage: every bucket's first row takes its lag from the
  * previous bucket's last row (or null for the key's first bucket), and
  * running sums compose prior-bucket totals with within-bucket prefixes;
  * nulls exercise the all-null-prefix and null-previous-value seams.
  */
class KeyedPrefixSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** 3 keys × 14 months × ~30 rows/month; v null every 37th row,
    * including some month-FIRST and month-LAST rows across the span.
    */
  private def fixture: DataFrame = {
    spark.range(0, 3 * 14 * 30)
      .select(
        (col("id") % 3).cast("string").as("k"),
        expr("date_add(date'2023-01-01', cast(id div 3 as int) % 420)").as("dt"),
        col("id").as("seq"),
        when(col("id") % 37 === 0, lit(null))
          .otherwise(pmod(col("id") * 131, lit(1000))).as("v"))
  }

  test("bucketed running sum equals the plain window exactly, nulls included") {
    val df = fixture
    val got = KeyedPrefix.runningSum(df, Seq("k"), Seq(col("dt"), col("seq")),
      col("v"), "rs", col("dt"))
    assert(got.queryExecution.executedPlan.toString.contains("__bucket"),
      "fixture must take the bucketed path")
    val w = Window.partitionBy("k").orderBy(col("dt"), col("seq"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val exp = df.withColumn("ers", sum(col("v")).over(w))
    val bad = got.select(col("k"), col("seq"), col("rs"))
      .join(exp.select(col("k"), col("seq"), col("ers")), Seq("k", "seq"))
      .filter(!(col("rs") <=> col("ers")))
    assert(bad.count() === 0, s"mismatches:\n${bad.take(5).mkString("\n")}")
    assert(got.count() === df.count())
  }

  test("a key whose first months are ALL null still sums null until the first value") {
    val df = fixture.withColumn("v",
      when(col("k") === "1" && col("dt") < lit("2023-03-15"), lit(null))
        .otherwise(col("v")))
    val got = KeyedPrefix.runningSum(df, Seq("k"), Seq(col("dt"), col("seq")),
      col("v"), "rs", col("dt"))
    val w = Window.partitionBy("k").orderBy(col("dt"), col("seq"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val exp = df.withColumn("ers", sum(col("v")).over(w))
    val bad = got.select(col("k"), col("seq"), col("rs"))
      .join(exp.select(col("k"), col("seq"), col("ers")), Seq("k", "seq"))
      .filter(!(col("rs") <=> col("ers")))
    assert(bad.count() === 0)
  }

  test("bucketed lag equals the plain window exactly, null carriers included") {
    val df = fixture
    val got = KeyedPrefix.lagValue(df, Seq("k"), Seq(col("dt"), col("seq")),
      col("v"), "pv", col("dt"))
    assert(got.queryExecution.executedPlan.toString.contains("__bucket"),
      "fixture must take the bucketed path")
    val w = Window.partitionBy("k").orderBy(col("dt"), col("seq"))
    val exp = df.withColumn("epv", lag(col("v"), 1).over(w))
    val bad = got.select(col("k"), col("seq"), col("pv"))
      .join(exp.select(col("k"), col("seq"), col("epv")), Seq("k", "seq"))
      .filter(!(col("pv") <=> col("epv")))
    assert(bad.count() === 0, s"mismatches:\n${bad.take(5).mkString("\n")}")
  }

  test("a null LAST row of a bucket seeds the next bucket's first lag as null") {
    // force the last row of k=0's January to carry a null v: the next
    // bucket's first row must see null from the BORROW, not from the
    // missing-previous-bucket case
    val df = fixture.withColumn("v",
      when(col("k") === "0" && col("dt") === lit("2023-01-31"), lit(null))
        .otherwise(col("v")))
    val got = KeyedPrefix.lagValue(df, Seq("k"), Seq(col("dt"), col("seq")),
      col("v"), "pv", col("dt"))
    val w = Window.partitionBy("k").orderBy(col("dt"), col("seq"))
    val exp = df.withColumn("epv", lag(col("v"), 1).over(w))
    val bad = got.select(col("k"), col("seq"), col("pv"))
      .join(exp.select(col("k"), col("seq"), col("epv")), Seq("k", "seq"))
      .filter(!(col("pv") <=> col("epv")))
    assert(bad.count() === 0)
  }

  test("single-bucket keys fall back to the plain window; results still exact") {
    // all rows inside one month: bucketing cannot multiply parallelism
    // (monthGroups == keys) → the plain per-key window is used
    val df = spark.range(0, 24).select(
      (col("id") % 2).cast("string").as("k"),
      expr("date_add(date'2023-01-01', cast(id div 2 as int) % 28)").as("dt"),
      col("id").as("seq"), col("id").as("v"))
    val st = graft.etl.MarketEtl.rollingStats(df, Seq("k"), col("dt"))
    assert(st.monthGroups <= st.keys || st.minMonth < 1)
    val got = KeyedPrefix.runningSum(df, Seq("k"), Seq(col("dt"), col("seq")),
      col("v"), "rs", col("dt"), stats = Some(st))
    assert(!got.queryExecution.analyzed.toString.contains("__bucket"))
    val w = Window.partitionBy("k").orderBy(col("dt"), col("seq"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val exp = df.withColumn("ers", sum(col("v")).over(w))
    val bad = got.select(col("k"), col("seq"), col("rs"))
      .join(exp.select(col("k"), col("seq"), col("ers")), Seq("k", "seq"))
      .filter(!(col("rs") <=> col("ers")))
    assert(bad.count() === 0)
  }
}
