package graft.stats

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** [[GlobalRank.withRowNumber]] must equal `row_number() OVER (ORDER BY
  * ...)` bit for bit whenever the order is total — that identity is what
  * lets x86/x94/x98 swap their unpartitioned windows for the
  * range-partitioned pass without moving a single oracle hash.
  */
class GlobalRankSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  // duplicate-heavy values: the unique-id tie-break is load-bearing
  private def df = spark.range(0, 1000).select(col("id"),
    pmod(col("id") * 7919, lit(97)).as("v"))

  test("equals an unpartitioned row_number window (asc, ties by id)") {
    val viaWindow = df.withColumn("rn",
      row_number().over(Window.orderBy(col("v"), col("id"))).cast("long"))
      .orderBy("rn").collect().toSeq
    val viaRank = GlobalRank
      .withRowNumber(df, Seq(col("v"), col("id")), "rn", numPartitions = 7)
      .orderBy("rn").collect().toSeq
    assert(viaRank === viaWindow)
  }

  test("equals the window under DESC order and when chained") {
    val viaWindow = df
      .withColumn("rn_d", row_number().over(
        Window.orderBy(col("v").desc, col("id"))).cast("long"))
      .withColumn("rn_a", row_number().over(
        Window.orderBy(col("v"), col("id").desc)).cast("long"))
      .orderBy("id").collect().toSeq
    val viaRank = GlobalRank.withRowNumber(
        GlobalRank.withRowNumber(df,
          Seq(col("v").desc, col("id")), "rn_d", numPartitions = 5),
        Seq(col("v"), col("id").desc), "rn_a", numPartitions = 3)
      .orderBy("id").collect().toSeq
    assert(viaRank === viaWindow)
  }

  test("empty input yields an empty, correctly-schemaed output") {
    val empty = df.where(lit(false))
    val out = GlobalRank.withRowNumber(empty, Seq(col("v")), "rn")
    assert(out.columns.toSeq === Seq("id", "v", "rn"))
    assert(out.count() === 0L)
  }

  test("rowsInRankRange equals the filtered window and prunes cleanly at the edges") {
    val viaWindow = df.withColumn("rn",
      row_number().over(Window.orderBy(col("v").desc, col("id"))).cast("long"))
      .where(col("rn") >= 101 && col("rn") <= 120)
      .orderBy("rn").collect().toSeq
    val viaRange = GlobalRank.rowsInRankRange(df,
        Seq(col("v").desc, col("id")), 101L, 120L, "rn", numPartitions = 7)
      .orderBy("rn").collect().toSeq
    assert(viaRange === viaWindow)
    // hi beyond n: clipped, not an error
    assert(GlobalRank.rowsInRankRange(df, Seq(col("v"), col("id")),
      995L, 2000L, "rn", numPartitions = 7).count() === 6L)
    // lo beyond n: empty
    assert(GlobalRank.rowsInRankRange(df, Seq(col("v"), col("id")),
      1001L, 2000L, "rn").count() === 0L)
    // full range: identical to withRowNumber
    assert(GlobalRank.rowsInRankRange(df, Seq(col("v"), col("id")),
      1L, 1000L, "rn", numPartitions = 7).orderBy("rn").collect().toSeq ===
      GlobalRank.withRowNumber(df, Seq(col("v"), col("id")), "rn",
        numPartitions = 7).orderBy("rn").collect().toSeq)
  }

  test("rowsAtRanks picks exactly the requested ranks (the x94 boundary pick)") {
    val full = GlobalRank.withRowNumber(df, Seq(col("v"), col("id")), "rk",
        numPartitions = 7)
      .collect().map(r => r.getAs[Long]("rk") ->
        ((r.getLong(0), r.getLong(1)))).toMap
    val ranks = Seq(1L, 251L, 501L, 751L, 1000L)
    val picked = GlobalRank.rowsAtRanks(df, Seq(col("v"), col("id")), ranks,
        "rk", numPartitions = 7)
      .collect().map(r => r.getAs[Long]("rk") ->
        ((r.getLong(0), r.getLong(1)))).toMap
    assert(picked.keySet === ranks.toSet)
    ranks.foreach(rk => assert(picked(rk) === full(rk), s"rank $rk"))
    // duplicate + out-of-range ranks: deduped and clipped, not an error
    assert(GlobalRank.rowsAtRanks(df, Seq(col("v"), col("id")),
      Seq(5L, 5L, 4000L), "rk").count() === 1L)
  }

  test("the plan carries no Window node and no single-partition sort") {
    val p = GlobalRank
      .withRowNumber(df, Seq(col("v"), col("id")), "rn", numPartitions = 7)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Window ["), s"rank planned as a window:\n$p")
    assert(!p.contains("Exchange SinglePartition"),
      s"global sort sneaked back in:\n$p")
  }
}
