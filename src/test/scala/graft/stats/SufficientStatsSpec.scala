package graft.stats

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class SufficientStatsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("components and correlation match a hand computation") {
    // y = 2x exactly → corr = 1
    val df = Seq((1L, 2.0), (2L, 4.0), (3L, 6.0), (4L, 8.0))
      .map { case (x, y) => ("g", x, y) }.toDF("g", "x", "y")
    val r = SufficientStats.perGroup(df, "g", "x", "y").head()
    assert(r.getLong(1) === 4L)                          // n
    assert(r.getLong(2) === 10L)                         // sum_x
    assert(r.getDecimal(3).doubleValue === 20.0)         // sum_y
    assert(r.getLong(4) === 30L)                         // sum_xx
    assert(r.getDecimal(5).doubleValue === 120.0)        // sum_yy
    assert(r.getDecimal(6).doubleValue === 60.0)         // sum_xy
    assert(math.abs(r.getDouble(7) - 1.0) < 1e-12)
  }

  test("anti-correlated and degenerate groups") {
    val df = Seq(
      ("anti", 1L, 9.0), ("anti", 2L, 6.0), ("anti", 3L, 3.0),
      ("flat", 1L, 5.0), ("flat", 2L, 5.0), ("flat", 3L, 5.0)
    ).toDF("g", "x", "y")
    val got = SufficientStats.perGroup(df, "g", "x", "y").collect()
      .map(r => r.getString(0) -> Option(r.get(7)).map(_.asInstanceOf[Double]))
      .toMap
    assert(math.abs(got("anti").get + 1.0) < 1e-12)
    assert(got("flat").isEmpty, "zero-variance group must yield null corr")
  }

  test("components are mergeable: split-and-add equals whole") {
    val docs = graft.tables.Tables.lineitem(spark, "/root/testdata/sf0.001")
    val whole = SufficientStats.perGroup(docs, "l_returnflag",
      "l_quantity", "l_extendedprice")
      .select("l_returnflag", "n", "sum_x", "sum_xx").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val parts = Seq(docs.filter(col("l_orderkey") % 2 === 0),
      docs.filter(col("l_orderkey") % 2 === 1))
      .map(d => SufficientStats.perGroup(d, "l_returnflag",
        "l_quantity", "l_extendedprice")
        .select("l_returnflag", "n", "sum_x", "sum_xx").collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap)
    val added = (parts(0).keySet ++ parts(1).keySet).map { k =>
      val a = parts(0).getOrElse(k, (0L, 0L, 0L))
      val b = parts(1).getOrElse(k, (0L, 0L, 0L))
      k -> (a._1 + b._1, a._2 + b._2, a._3 + b._3)
    }.toMap
    assert(added === whole)
  }
}
