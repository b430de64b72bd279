package graft.stats

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class SufficientStatsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // Output row layout: group(0), n(1), sum_x(2), sum_y_cents(3),
  // sum_xx(4), sum_yy_hi(5), sum_yy_lo(6), sum_xy_cents(7), corr(8).

  test("components and correlation match a hand computation") {
    // y = 2x exactly → corr = 1 (scale-invariant, so cents don't change it)
    val df = Seq((1L, 2.0), (2L, 4.0), (3L, 6.0), (4L, 8.0))
      .map { case (x, y) => ("g", x, y) }.toDF("g", "x", "y")
    val r = SufficientStats.perGroup(df, "g", "x", "y").head()
    assert(r.getLong(1) === 4L)                          // n
    assert(r.getLong(2) === 10L)                         // sum_x
    assert(r.getLong(3) === 2000L)                       // sum_y_cents
    assert(r.getLong(4) === 30L)                         // sum_xx
    // Σyc² = 200²+400²+600²+800² = 1,200,000; per-row each yc² < 1e6 so
    // every hi contribution is 0 and the whole sum lands in lo.
    assert(r.getLong(5) === 0L)                          // sum_yy_hi
    assert(r.getLong(6) === 1200000L)                    // sum_yy_lo
    assert(r.getLong(7) === 6000L)                       // sum_xy_cents
    assert(math.abs(r.getDouble(8) - 1.0) < 1e-12)
  }

  test("split-radix halves reconstruct Σy² exactly across the boundary") {
    // yc = 2000 → yc² = 4,000,000 = 4·1e6 + 0 → hi=4, lo=0 per row.
    val df = Seq(("g", 1L, 20.0), ("g", 2L, 20.0)).toDF("g", "x", "y")
    val r = SufficientStats.perGroup(df, "g", "x", "y").head()
    assert(r.getLong(5) === 8L)                          // sum_yy_hi
    assert(r.getLong(6) === 0L)                          // sum_yy_lo
    assert(r.getLong(5) * SufficientStats.YyRadix + r.getLong(6) === 8000000L)
  }

  test("anti-correlated and degenerate groups") {
    val df = Seq(
      ("anti", 1L, 9.0), ("anti", 2L, 6.0), ("anti", 3L, 3.0),
      ("flat", 1L, 5.0), ("flat", 2L, 5.0), ("flat", 3L, 5.0)
    ).toDF("g", "x", "y")
    val got = SufficientStats.perGroup(df, "g", "x", "y").collect()
      .map(r => r.getString(0) -> Option(r.get(8)).map(_.asInstanceOf[Double]))
      .toMap
    assert(math.abs(got("anti").get + 1.0) < 1e-12)
    assert(got("flat").isEmpty, "zero-variance group must yield null corr")
  }

  test("components are mergeable: split-and-add equals whole") {
    val docs = graft.tables.Tables.lineitem(spark, "/root/testdata/sf0.001")
    def comps(d: org.apache.spark.sql.DataFrame) =
      SufficientStats.perGroup(d, "l_returnflag", "l_quantity", "l_extendedprice")
        .select("l_returnflag", "n", "sum_x", "sum_xx", "sum_yy_hi", "sum_yy_lo")
        .collect()
        .map(r => r.getString(0) ->
          Seq(r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
        .toMap
    val whole = comps(docs)
    val parts = Seq(docs.filter(col("l_orderkey") % 2 === 0),
      docs.filter(col("l_orderkey") % 2 === 1)).map(comps)
    val added = (parts(0).keySet ++ parts(1).keySet).map { k =>
      val a = parts(0).getOrElse(k, Seq.fill(5)(0L))
      val b = parts(1).getOrElse(k, Seq.fill(5)(0L))
      k -> a.zip(b).map { case (x, y) => x + y }
    }.toMap
    assert(added === whole)
  }
}
