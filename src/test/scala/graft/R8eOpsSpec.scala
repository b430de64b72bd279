package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for the round-8e suite (x88 weekday seasonality,
  * x89 small-cell suppression, x90 risk-report composition) — properties
  * the DuckDB oracle proves by agreement but cannot NAME.
  */
class R8eOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.Sf0001

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  // ---- X88: weekday seasonality ----

  test("x88: seven weekdays, mass conservation, floor-bounded deviations") {
    val rows = q("x88_weekday_seasonality").collect()
    assert(rows.map(_.getLong(0)).sorted.toSeq === (1L to 7L))
    val events = graft.tables.Tables.events(spark, sf).count()
    assert(rows.map(_.getLong(1)).sum === events)
    // Σ(n_d·7 − total) cancels to 0 exactly; `div` truncates toward
    // zero (positive cells lose <1, negative cells GAIN <1), so the
    // truncated per-mill deviations sum within ±7
    val devSum = rows.map(_.getLong(2)).sum
    assert(math.abs(devSum) < 7L, s"dev sum $devSum out of band")
  }

  // ---- X89: small-cell suppression ----

  test("x89: EVERY published row covers >= k people; deficit only from sub-k rollups") {
    // sf0.01: the (nation × segment) cells span both sides of k=10
    // (FixtureContractSpec pins this precondition). Strict k-anonymity
    // (ADVICE r8): the "__other" rollup is held to the same k bar as the
    // named cells, so mass is conserved EXCEPT for nations whose whole
    // suppressed slice is sub-k — and that deficit is < k by
    // construction (it IS the suppressed rollup's count).
    val d = TestSpark.Sf001
    val rows = SparkEntry.queries("x89_small_cell_suppress")(spark, d)
      .collect()
    val named = rows.filter(_.getString(1) != "__other")
    val other = rows.filter(_.getString(1) == "__other")
    assert(named.nonEmpty, "named cells must survive")
    rows.foreach(r => assert(r.getLong(2) >= 10L,
      s"published row below k: ${r.getString(0)}/${r.getString(1)}"))
    val published = rows.groupBy(_.getString(0))
      .view.mapValues(_.map(_.getLong(2)).sum).toMap
    val raw = graft.tables.Tables.customer(spark, d)
      .join(graft.tables.Tables.nation(spark, d),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy("n_name").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val deficits = raw.map { case (nation, n) =>
      nation -> (n - published.getOrElse(nation, 0L))
    }
    deficits.foreach { case (nation, deficit) =>
      assert(deficit >= 0L && deficit < 10L,
        s"$nation: deficit $deficit outside [0, k) — only a sub-k rollup may vanish")
    }
    // both suppression modes exercised: a surviving rollup or a deficit
    assert(other.nonEmpty || deficits.values.exists(_ > 0L),
      "suppression must be exercised on the rollup side too")
  }

  // ---- X91: decayed trending ----

  test("x91: score bounds follow the power-of-two decay envelope") {
    val rows = q("x91_decayed_trending").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, score) = (r.getLong(1), r.getLong(2))
      // every in-horizon event contributes between 1 (age 14) and 2^14
      // (age 0): the sum must sit inside that envelope
      assert(score >= n && score <= n * (1L << 14),
        s"score $score outside [$n, ${n * (1L << 14)}] for ${r.getString(0)}")
    }
    // the anchor day itself always has events, so at least one type's
    // score includes a full-weight 2^14 term
    assert(rows.map(_.getLong(2)).max >= (1L << 14))
  }

  // ---- X92: revenue-LTV cohorts ----

  test("x92: cumulative curves are monotone and total revenue is conserved") {
    val rows = q("x92_ltv_cohorts").collect()
    assert(rows.nonEmpty)
    // within each cohort the cumulative curve strictly accumulates
    rows.groupBy(_.getLong(0)).foreach { case (cohort, rs) =>
      val byAge = rs.sortBy(_.getLong(1))
      assert(byAge.head.getLong(1) === 0L,
        s"cohort $cohort must start at age 0 (its defining first order)")
      val cum = byAge.map(_.getLong(4))
      assert(cum.zip(cum.tail).forall { case (a, b) => a < b })
      assert(cum.last === byAge.map(_.getLong(3)).sum)
    }
    // every order cent lands in exactly one (cohort, age) cell
    val total = graft.tables.Tables.orders(spark, sf)
      .select(expr("sum(CAST(round(o_totalprice * 100) AS BIGINT))"))
      .head().getLong(0)
    assert(rows.map(_.getLong(3)).sum === total,
      "cohorting must conserve total revenue")
  }

  // ---- X93: basket lift ----

  test("x93: support threshold, symmetry-free pairs, plausible lift") {
    val d = TestSpark.Sf001 // sf0.001 baskets are too sparse for n>=3
    val rows = SparkEntry.queries("x93_basket_lift")(spark, d).collect()
    assert(rows.nonEmpty, "no pair reaches support 3 — op trivialized")
    rows.foreach { r =>
      assert(r.getLong(0) < r.getLong(1), "pairs must be canonical a<b")
      assert(r.getLong(2) >= 3L)
      assert(r.getLong(3) > 0L)
    }
  }

  // ---- X90: risk-report composition ----

  test("x90: composition agrees with each standalone component") {
    val report = q("x90_risk_report").collect()
      .map(r => r.getString(0) -> r).toMap
    assert(report.size === 2)
    // x75 drawdown, x76 moments, x85 impact run the SAME 2-ticker panel.
    q("x75_max_drawdown").collect().foreach { r =>
      assert(report(r.getString(0)).getLong(9) === r.getLong(1),
        s"max_drawdown(${r.getString(0)})")
    }
    q("x76_return_stats").collect().foreach { r =>
      val g = report(r.getString(0))
      assert(g.getLong(3) === r.getLong(1), "n_ret == x76.n")
      assert(g.getLong(4) === r.getLong(2), "sum_bp")
      assert(g.getLong(5) === r.getLong(3), "sum_sq_bp")
    }
    q("x85_amihud_illiq").collect().foreach { r =>
      assert(report(r.getString(0)).getLong(10) === r.getLong(2),
        s"sum_impact(${r.getString(0)})")
    }
    // beta components: Σm and Σm² identical across assets (both assets
    // see the same 2-asset index on every return date); Σrm recomputed
    // independently from the collected panel
    val vals = report.values.toSeq
    assert(vals.map(_.getLong(7)).distinct.length === 1, "sum_m shared")
    assert(vals.map(_.getLong(8)).distinct.length === 1, "sum_mm shared")
    val panel = MarketPanel.centsPanel(spark, MarketPanel.tickers2)
      .collect().map(r => (r.getString(0), r.getTimestamp(1).getTime,
        r.getLong(2)))
    val rets = panel.groupBy(_._1).flatMap { case (a, rows) =>
      rows.sortBy(_._2).sliding(2).collect {
        case Array((_, _, c0), (_, t1, c1)) =>
          (a, t1, (c1 - c0) * 10000L / c0)
      }
    }.toSeq
    val m = rets.groupBy(_._2).view
      .mapValues(rs => rs.map(_._3).sum / rs.length).toMap
    val expRm = rets.groupBy(_._1).view
      .mapValues(_.map { case (_, t, r) => r * m(t) }.sum).toMap
    expRm.foreach { case (a, e) =>
      assert(report(a).getLong(6) === e, s"sum_rm($a) recompute")
    }
  }
}
