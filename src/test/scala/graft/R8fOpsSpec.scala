package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for the round-8f suite (x94 RFM segmentation,
  * x95 per-supplier latency percentiles) — properties the DuckDB
  * oracle proves by agreement but cannot NAME.
  */
class R8fOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.Sf0001

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  // ---- X94: RFM segments ----

  test("x94: quartiles are balanced and the census conserves customers") {
    val rows = q("x94_rfm_segments").collect()
    val customers = graft.tables.Tables.orders(spark, sf)
      .select(countDistinct(col("o_custkey"))).head().getLong(0)
    assert(rows.map(_.getLong(3)).sum === customers,
      "every customer lands in exactly one segment")
    rows.foreach { r =>
      for (i <- 0 to 2)
        assert(r.getLong(i) >= 1L && r.getLong(i) <= 4L,
          s"quartile label out of range: $r")
    }
    // rank-arithmetic quartiles are balanced by construction: each
    // axis marginal holds n/4 ± 1 customers per quartile
    for (axis <- 0 to 2) {
      val marginal = rows.groupBy(_.getLong(axis))
        .view.mapValues(_.map(_.getLong(3)).sum)
      marginal.foreach { case (qr, n) =>
        assert(math.abs(n - customers / 4) <= 1,
          s"axis $axis quartile $qr holds $n of $customers")
      }
    }
  }

  // ---- X96: seasonal anomaly ----

  test("x96: residuals cancel within each weekday; flags follow the rule") {
    val rows = q("x96_seasonal_anomaly").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (res, flag) = (r.getLong(2), r.getLong(3))
      assert(flag === (if (math.abs(res) > 500) 1L else 0L))
    }
    // Σ over a weekday of (n·w_days − w_total) is exactly 0; `div`
    // truncates toward zero (positive rows lose <1, negative rows gain
    // <1), so the per-weekday residual sum stays within ±w_days
    val byDow = rows.groupBy(r =>
      ((r.getDate(0).toLocalDate.getDayOfWeek.getValue % 7) + 1))
    byDow.foreach { case (dow, rs) =>
      val s = rs.map(_.getLong(2)).sum
      assert(math.abs(s) < rs.length.toLong,
        s"weekday $dow residual sum $s outside ±${rs.length}")
    }
  }

  // ---- X97: quantile normalization ----

  test("x97: normalized ranks are per-source uniform and order-preserving") {
    val rows = q("x97_quantile_normalize").collect()
    val docs = graft.tables.Tables.documents(spark, sf).count()
    assert(rows.length === docs, "every doc gets a normalized rank")
    rows.foreach { r =>
      assert(r.getLong(2) >= 0L && r.getLong(2) < 1000L,
        s"strictly-below rank must live in [0, 1000): ${r.getLong(2)}")
    }
    // order preservation within a source: higher raw q ⇒ ≥ normalized
    // rank (recheck one source end-to-end)
    val src = graft.tables.Tables.documents(spark, sf)
      .select(col("doc_id"), col("source")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val one = src.values.head
    val inSrc = rows.filter(r => src(r.getLong(0)) == one)
      .sortBy(_.getLong(1))
    inSrc.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getLong(2) <= b.getLong(2),
          "normalization must preserve the raw-quality order")
      case _ =>
    }
    // the lowest level of every source normalizes to exactly 0
    assert(inSrc.head.getLong(2) === 0L)
  }

  // ---- X95: ship-latency percentiles ----

  test("x95: every supplier reports ordered percentiles; p50 recomputed") {
    val rows = q("x95_ship_latency").collect()
    val suppliers = graft.tables.Tables.lineitem(spark, sf)
      .select(countDistinct(col("l_suppkey"))).head().getLong(0)
    assert(rows.length === suppliers)
    rows.foreach { r =>
      assert(!r.isNullAt(2) && !r.isNullAt(3),
        s"rank selection missed for supplier ${r.getLong(0)}")
      assert(r.getLong(2) <= r.getLong(3), "p50 <= p90")
    }
    // independent p50 recount for one supplier: the selected value has
    // floor((n+1)/2) values <= it in the sorted latency list
    val supp = rows.head.getLong(0)
    val lats = graft.tables.Tables.lineitem(spark, sf)
      .where(col("l_suppkey") === supp)
      .join(graft.tables.Tables.orders(spark, sf),
        col("l_orderkey") === col("o_orderkey"))
      .select(datediff(col("l_shipdate"), col("o_orderdate")).cast("long"))
      .collect().map(_.getLong(0)).sorted
    assert(rows.head.getLong(2) === lats((lats.length + 1) / 2 - 1))
  }
}
