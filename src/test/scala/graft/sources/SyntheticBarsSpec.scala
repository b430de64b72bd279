package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class SyntheticBarsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("bars are deterministic, daily, and schema-complete") {
    val a = SyntheticBars.bars(spark, "VALE3.SA", "2024-01-01", 30)
    val b = SyntheticBars.bars(spark, "VALE3.SA", "2024-01-01", 30)
    assert(a.collect().toSeq === b.collect().toSeq)
    assert(a.count() === 30)
    assert(a.columns.toSeq ===
      Seq("Date", "Open", "High", "Low", "Close", "Volume", "ativo"))
    assert(a.select("ativo").distinct().head().getString(0) === "VALE3")
    assert(a.select(countDistinct(col("Date"))).head().getLong(0) === 30)
    // High >= Close >= Low invariant
    assert(a.filter(col("High") < col("Close") || col("Low") > col("Close"))
      .count() === 0)
  }

  test("different tickers produce different series") {
    val a = SyntheticBars.bars(spark, "VALE3.SA", "2024-01-01", 10)
      .select("Close").collect().map(_.getDouble(0)).toSeq
    val b = SyntheticBars.bars(spark, "PETR4.SA", "2024-01-01", 10)
      .select("Close").collect().map(_.getDouble(0)).toSeq
    assert(a !== b)
  }
}
