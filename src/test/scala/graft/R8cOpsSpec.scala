package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for the round-8c market-risk suite (x78 beta,
  * x79 RSI, x80 Bollinger) and governance audits (x81 referential
  * integrity, x82 Lorenz curve) — properties the DuckDB oracle proves
  * by agreement but cannot NAME.
  */
class R8cOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.Sf0001

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  // ---- X78: market-beta components ----

  test("x78: components are internally consistent and Cauchy-Schwarz-valid") {
    val rows = q("x78_market_beta").collect()
    assert(rows.length === 3, "three assets in the panel")
    rows.foreach { r =>
      val (n, sr, sm, srm, smm, srr) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6))
      assert(n === 119L, "120 bars - 1 lag row per asset")
      // Cauchy-Schwarz on centered sums: (nΣrm − ΣrΣm)² ≤
      // (nΣr² − Σr²)(nΣm² − Σm²) — fails if any component were corrupted.
      val covN = BigInt(n) * srm - BigInt(sr) * sm
      val varR = BigInt(n) * srr - BigInt(sr) * sr
      val varM = BigInt(n) * smm - BigInt(sm) * sm
      assert(varR >= 0 && varM >= 0)
      assert(covN * covN <= varR * varM)
    }
    // Σm and Σm² are the SAME market series for every asset (all three
    // assets trade every date, so each sees the identical index).
    assert(rows.map(_.getLong(3)).distinct.length === 1)
    assert(rows.map(_.getLong(5)).distinct.length === 1)
  }

  test("x78: marginal return sums agree with x76 on the shared assets") {
    val beta = q("x78_market_beta").collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    val x76 = q("x76_return_stats").collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    // x76's panel is the VALE3/PETR4 pair; x78 adds ITUB4 but the
    // per-asset return series — and hence Σr — are identical.
    x76.foreach { case (a, s) => assert(beta(a) === s, s"sum_r($a)") }
  }

  // ---- X79: RSI ----

  test("x79: per-mill range, full-window row count, gain/loss symmetry") {
    val rows = q("x79_rsi").collect()
    // 120 bars → 119 diffs → first full 14-diff window at diff #14:
    // 106 evaluated days per asset.
    assert(rows.length === 3 * 106)
    rows.foreach { r =>
      val rsi = r.getLong(2)
      assert(rsi >= 0L && rsi <= 1000L, s"RSI per-mill out of range: $rsi")
    }
    // The synthetic close steps by (h mod 997) with occasional modular
    // wraparound, so each day's diff takes only two values and a
    // 14-diff window admits a handful of gain/loss mixes — RSI must
    // still move across those levels, not sit at a degenerate constant.
    assert(rows.map(_.getLong(2)).distinct.length > 1)
  }

  // ---- X80: Bollinger breaches ----

  test("x80: evaluated-day count and breach bounds") {
    val rows = q("x80_bollinger").collect()
    assert(rows.length === 3)
    rows.foreach { r =>
      val (n, up, dn) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(n === 101L, "120 bars - 19 warm-up rows")
      assert(up >= 0 && dn >= 0 && up + dn <= n)
      // 2σ breaches are rare by Chebyshev (≤ 1/4 of rows even for a
      // worst-case distribution; far fewer for this near-uniform walk).
      assert(up + dn <= n / 4, s"breach rate implausibly high: $up+$dn/$n")
    }
  }

  // ---- X81: referential integrity ----

  test("x81: every planted edge reports a non-empty orphan set") {
    val rows = q("x81_ref_integrity").collect()
    assert(rows.map(_.getString(0)).sorted.toSeq ===
      Seq("lineitem_orders", "lineitem_part", "lineitem_supplier",
        "orders_customer"))
    rows.foreach { r =>
      val (orphans, keys) = (r.getLong(1), r.getLong(2))
      assert(orphans > 0L,
        s"plant produced no orphans on ${r.getString(0)} — audit trivialized")
      assert(keys > 0L && keys <= orphans)
    }
  }

  test("x81: orphan children are exactly the children of dropped parents") {
    import spark.implicits._
    val orders = graft.tables.Tables.orders(spark, sf)
    val li = graft.tables.Tables.lineitem(spark, sf)
    val expected = li.join(orders.where(pmod($"o_orderkey", lit(97L)) === 3)
        .select($"o_orderkey".as("l_orderkey")), Seq("l_orderkey"))
      .count()
    val got = q("x81_ref_integrity").collect()
      .find(_.getString(0) == "lineitem_orders").get.getLong(1)
    assert(got === expected)
  }

  // ---- X82: Lorenz curve ----

  test("x82: cumulative mass is monotone and terminates at 1000 per-mill") {
    val rows = q("x82_source_lorenz").collect()
    assert(rows.length > 1)
    val cum = rows.map(_.getLong(2))
    assert(cum.zip(cum.tail).forall { case (a, b) => a < b },
      "cumulative mass strictly increases")
    val pm = rows.map(_.getLong(3))
    assert(pm.zip(pm.tail).forall { case (a, b) => a <= b })
    assert(pm.last === 1000L, "full corpus = 1000 per-mill")
    // Lorenz convexity: sources are ordered by mass, so per-source
    // increments are non-decreasing along the curve.
    val inc = rows.map(_.getLong(1))
    assert(inc.zip(inc.tail).forall { case (a, b) => a <= b })
    assert(cum.last === rows.map(_.getLong(1)).sum)
  }
}
