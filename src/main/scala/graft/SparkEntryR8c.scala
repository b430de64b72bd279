package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.SyntheticBars
import graft.tables.Tables

/** Round-8 (continued, part c) query entries: the market-analytics risk
  * suite the reference's Athena examples gesture at but never compute
  * (beta, RSI, Bollinger breaches — `README.md:274-296` stops at plain
  * means), plus two corpus-governance audits (referential integrity,
  * source-concentration Lorenz curve). All price/return arithmetic stays
  * in the integer cents / basis-points discipline proven by x73–x77:
  * no float ever enters an aggregate, so every output hashes identically
  * across engines. §2.12 extension operators.
  */
object SparkEntryR8c {

  /** Three-asset daily close panel in integer cents — the x76/x77 shape
    * widened to a cross-section big enough for an equal-weight index
    * (the shared [[MarketPanel]]).
    */
  private def centsPanel(s: SparkSession): DataFrame =
    MarketPanel.centsPanel(s, MarketPanel.tickers3)

  /** Integer basis-point daily returns over [[centsPanel]] (the x76
    * lag-div shape; one per-asset ordered window).
    */
  private def retsPanel(s: SparkSession): DataFrame = {
    val w = Window.partitionBy("ativo").orderBy("dt")
    centsPanel(s).withColumn("lagc", lag(col("cents"), 1).over(w))
      .where(col("lagc").isNotNull)
      .select(col("ativo"), col("dt"),
        expr("(cents - lagc) * 10000 div lagc").as("r"))
  }

  private def barsGen3Sql: String =
    MarketPanel.barsGenSql(MarketPanel.tickers3)

  /** DuckDB replay of [[retsPanel]]. */
  private def retsPanelSql: String =
    s"""bars AS (
       |$barsGen3Sql),
       |cpan AS (SELECT ativo, date AS dt,
       |                CAST(round(close * 100) AS BIGINT) AS cents
       |         FROM bars),
       |lagd AS (SELECT ativo, dt, cents,
       |                lag(cents) OVER (PARTITION BY ativo ORDER BY dt)
       |                  AS lagc
       |         FROM cpan),
       |rets AS (SELECT ativo, dt, (cents - lagc) * 10000 // lagc AS r
       |         FROM lagd WHERE lagc IS NOT NULL)""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ---- X78: market beta components (equal-weight index) ----
    //
    // The cross-sectional risk statistic x77's pairwise form cannot
    // give: each asset's co-movement with THE MARKET. The equal-weight
    // index return per date is `sum(r) div n` over the cross-section —
    // integer floor-div of an integer sum, so it is engine-exact where a
    // float mean would not be. Per asset, emit the mergeable integer
    // regression components (n, Σr, Σm, Σrm, Σm², Σr²); the consumer's
    // beta = (nΣrm − ΣrΣm) / (nΣm² − (Σm)²) is one row-local division.
    // Scale shape: the per-date index frame is |dates| rows — broadcast
    // — and every aggregate is partial-aggregable; the cross-section
    // join is broadcast-hash, never a shuffle of the panel.
    "x78_market_beta" -> ((s, d) => {
      val rets = retsPanel(s)
      val mkt = rets.groupBy("dt")
        .agg(sum("r").as("m_sum"), count(lit(1)).as("m_n"))
        .select(col("dt"), expr("m_sum div m_n").as("m"))
      rets.join(broadcast(mkt), "dt")
        .groupBy("ativo")
        .agg(count(lit(1)).as("n"),
          sum("r").as("sum_r"), sum("m").as("sum_m"),
          sum(expr("r * m")).as("sum_rm"),
          sum(expr("m * m")).as("sum_mm"),
          sum(expr("r * r")).as("sum_rr"))
        .orderBy("ativo")
    }),

    // ---- X79: RSI (Cutler's 14-day relative-strength index) ----
    //
    // The momentum oscillator on every market terminal. Cutler's SMA
    // form (not Wilder's recursive EWMA) is chosen deliberately: it is a
    // pure 14-row frame aggregate — partial-window sums of integer gains
    // and losses — so it stays one per-asset ordered window with no
    // recursion, and the per-mill output `1000·ΣG div (ΣG+ΣL)` is
    // engine-exact. Rows before the window fills are dropped (the W1
    // min_periods discipline); an all-flat window reads neutral 500.
    "x79_rsi" -> ((s, d) => {
      val wl = Window.partitionBy("ativo").orderBy("dt")
      val wf = wl.rowsBetween(-13, Window.currentRow)
      centsPanel(s)
        .withColumn("diff", col("cents") - lag(col("cents"), 1).over(wl))
        .where(col("diff").isNotNull)
        .withColumn("gain", greatest(col("diff"), lit(0L)))
        .withColumn("loss", greatest(-col("diff"), lit(0L)))
        .withColumn("sum_gain", sum("gain").over(wf))
        .withColumn("sum_loss", sum("loss").over(wf))
        .withColumn("n_win", count(lit(1)).over(wf))
        .where(col("n_win") === 14)
        .select(col("ativo"), col("dt").cast("date").as("day"),
          when(col("sum_gain") + col("sum_loss") === 0, lit(500L))
            .otherwise(expr("sum_gain * 1000 div (sum_gain + sum_loss)"))
            .as("rsi_permill"))
        .orderBy("ativo", "day")
    }),

    // ---- X80: Bollinger-band breach audit (20-day, 2σ) ----
    //
    // Band breaches without ever materializing a float σ: the breach
    // predicate |p − Σ/n| > 2σ is cross-multiplied into integers —
    // (p·n − Σ)² > 4·(n·Σ² − Σ²) — so the comparison is exact (the x30
    // sufficient-statistics discipline applied to a rolling frame).
    // One per-asset ordered window computing (Σ, Σ²) over 20 rows, then
    // a row-local predicate and a partial-aggregable count rollup.
    "x80_bollinger" -> ((s, d) => {
      val wf = Window.partitionBy("ativo").orderBy("dt")
        .rowsBetween(-19, Window.currentRow)
      centsPanel(s)
        .withColumn("s1", sum("cents").over(wf))
        .withColumn("s2", sum(expr("cents * cents")).over(wf))
        .withColumn("nw", count(lit(1)).over(wf))
        .where(col("nw") === 20)
        .withColumn("dev", expr("cents * nw - s1"))
        .withColumn("var4", expr("4 * (nw * s2 - s1 * s1)"))
        .groupBy("ativo")
        .agg(count(lit(1)).as("n_days"),
          sum(when(col("dev") > 0 && expr("dev * dev") > col("var4"), 1L)
            .otherwise(0L)).as("n_upper_breach"),
          sum(when(col("dev") < 0 && expr("dev * dev") > col("var4"), 1L)
            .otherwise(0L)).as("n_lower_breach"))
        .orderBy("ativo")
    }),

    // ---- X81: referential-integrity audit (planted orphans) ----
    //
    // The lake-governance check every warehouse runs before publishing a
    // star schema: per foreign-key edge, how many child rows point at no
    // parent. The raw fixture is referentially clean, so each parent
    // side deterministically drops keys ≡ 3 (mod 97) — the plantedRecrawl
    // discipline: the SAME plant feeds the oracle, and the audit exercises
    // a real non-empty orphan set. Shape: four independent anti-joins on
    // the key (shuffle-hash on the child's own join key — the plan a
    // 1000-executor run wants), then a 4-row union.
    "x81_ref_integrity" -> ((s, d) => {
      def edge(name: String, child: DataFrame, key: String,
               parent: DataFrame, pkey: String): DataFrame = {
        val keep = parent.where(pmod(col(pkey), lit(97L)) =!= 3)
          .select(col(pkey).as(key))
        child.select(key).join(keep, Seq(key), "left_anti")
          .agg(count(lit(1)).as("n_orphans"),
            count_distinct(col(key)).as("n_orphan_keys"))
          .select(lit(name).as("edge"), col("n_orphans"),
            col("n_orphan_keys"))
      }
      edge("lineitem_orders", Tables.lineitem(s, d), "l_orderkey",
          Tables.orders(s, d), "o_orderkey")
        .unionByName(edge("lineitem_part", Tables.lineitem(s, d),
          "l_partkey", Tables.part(s, d), "p_partkey"))
        .unionByName(edge("lineitem_supplier", Tables.lineitem(s, d),
          "l_suppkey", Tables.supplier(s, d), "s_suppkey"))
        .unionByName(edge("orders_customer", Tables.orders(s, d),
          "o_custkey", Tables.customer(s, d), "c_custkey"))
        .orderBy("edge")
    }),

    // ---- X82: source-concentration Lorenz curve ----
    //
    // The corpus-balance statistic behind every dataset card's "is one
    // source dominating?" question: sources ordered by character mass,
    // with exact cumulative per-mill shares (the Lorenz curve a Gini
    // consumer integrates). The per-source frame is |sources| rows —
    // the only ordered window runs over that tiny frame, never the
    // corpus (the x51 boundary-level discipline), so the corpus itself
    // costs one partial-aggregable shuffle.
    "x82_source_lorenz" -> ((s, d) => {
      val bySrc = Tables.documents(s, d)
        .groupBy("source").agg(sum("n_chars").as("mass"))
      val w = Window.orderBy("mass", "source")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      bySrc
        .withColumn("cum_mass", sum("mass").over(w))
        .crossJoin(broadcast(bySrc.agg(sum("mass").as("total"))))
        .select(col("source"), col("mass"), col("cum_mass"),
          expr("cum_mass * 1000 div total").as("cum_permill"))
        .orderBy("mass", "source")
    }))

  def oracleSql: Map[String, String] = Map(
    "x78_market_beta" ->
      s"""WITH ${retsPanelSql},
         |mkt AS (SELECT dt, CAST(SUM(r) AS BIGINT) // count(*) AS m
         |        FROM rets GROUP BY 1)
         |SELECT ativo, CAST(count(*) AS BIGINT) AS n,
         |       CAST(SUM(r) AS BIGINT) AS sum_r,
         |       CAST(SUM(m) AS BIGINT) AS sum_m,
         |       CAST(SUM(r * m) AS BIGINT) AS sum_rm,
         |       CAST(SUM(m * m) AS BIGINT) AS sum_mm,
         |       CAST(SUM(r * r) AS BIGINT) AS sum_rr
         |FROM rets JOIN mkt USING (dt)
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    "x79_rsi" ->
      s"""WITH bars AS (
         |$barsGen3Sql),
         |cpan AS (SELECT ativo, date AS dt,
         |                CAST(round(close * 100) AS BIGINT) AS cents
         |         FROM bars),
         |dif AS (SELECT ativo, dt,
         |               cents - lag(cents) OVER
         |                 (PARTITION BY ativo ORDER BY dt) AS diff
         |        FROM cpan),
         |gl AS (SELECT ativo, dt,
         |              greatest(diff, 0) AS gain, greatest(-diff, 0) AS loss
         |       FROM dif WHERE diff IS NOT NULL),
         |win AS (SELECT ativo, dt,
         |               SUM(gain) OVER w AS sum_gain,
         |               SUM(loss) OVER w AS sum_loss,
         |               count(*) OVER w AS n_win
         |        FROM gl
         |        WINDOW w AS (PARTITION BY ativo ORDER BY dt
         |                     ROWS BETWEEN 13 PRECEDING AND CURRENT ROW))
         |SELECT ativo, CAST(dt AS DATE) AS day,
         |       CAST(CASE WHEN sum_gain + sum_loss = 0 THEN 500
         |            ELSE sum_gain * 1000 // (sum_gain + sum_loss)
         |            END AS BIGINT) AS rsi_permill
         |FROM win WHERE n_win = 14 ORDER BY 1, 2""".stripMargin,
    "x80_bollinger" ->
      s"""WITH bars AS (
         |$barsGen3Sql),
         |cpan AS (SELECT ativo, date AS dt,
         |                CAST(round(close * 100) AS BIGINT) AS cents
         |         FROM bars),
         |win AS (SELECT ativo, cents,
         |               SUM(cents) OVER w AS s1,
         |               SUM(cents * cents) OVER w AS s2,
         |               count(*) OVER w AS nw
         |        FROM cpan
         |        WINDOW w AS (PARTITION BY ativo ORDER BY dt
         |                     ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)),
         |ev AS (SELECT ativo, cents * nw - s1 AS dev,
         |              4 * (nw * s2 - s1 * s1) AS var4
         |       FROM win WHERE nw = 20)
         |SELECT ativo, CAST(count(*) AS BIGINT) AS n_days,
         |       CAST(SUM(CASE WHEN dev > 0 AND dev * dev > var4
         |                     THEN 1 ELSE 0 END) AS BIGINT)
         |         AS n_upper_breach,
         |       CAST(SUM(CASE WHEN dev < 0 AND dev * dev > var4
         |                     THEN 1 ELSE 0 END) AS BIGINT)
         |         AS n_lower_breach
         |FROM ev GROUP BY 1 ORDER BY 1""".stripMargin,
    "x81_ref_integrity" -> {
      def edgeSql(name: String, child: String, key: String,
                  parent: String, pkey: String): String =
        s"""SELECT '$name' AS edge,
           |       CAST(count(*) AS BIGINT) AS n_orphans,
           |       CAST(count(DISTINCT $key) AS BIGINT) AS n_orphan_keys
           |FROM $child WHERE $key NOT IN
           |  (SELECT $pkey FROM $parent WHERE $pkey % 97 <> 3)""".stripMargin
      Seq(
        edgeSql("lineitem_orders", "lineitem", "l_orderkey",
          "orders", "o_orderkey"),
        edgeSql("lineitem_part", "lineitem", "l_partkey",
          "part", "p_partkey"),
        edgeSql("lineitem_supplier", "lineitem", "l_suppkey",
          "supplier", "s_suppkey"),
        edgeSql("orders_customer", "orders", "o_custkey",
          "customer", "c_custkey"),
      ).mkString("", "\nUNION ALL\n", "\nORDER BY edge")
    },
    "x82_source_lorenz" ->
      """WITH bysrc AS (
        |  SELECT source, CAST(SUM(n_chars) AS BIGINT) AS mass
        |  FROM documents GROUP BY 1),
        |tot AS (SELECT CAST(SUM(mass) AS BIGINT) AS total FROM bysrc)
        |SELECT source, mass,
        |       CAST(SUM(mass) OVER (ORDER BY mass, source
        |              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |            AS BIGINT) AS cum_mass,
        |       CAST(SUM(mass) OVER (ORDER BY mass, source
        |              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |            * 1000 // total AS BIGINT) AS cum_permill
        |FROM bysrc CROSS JOIN tot ORDER BY mass, source""".stripMargin)
}
