package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.SyntheticBars
import graft.tables.Tables

/** Round-8 (continued, part e) query entries: calendar seasonality,
  * privacy-preserving publication, and the market-suite composition
  * flagship that assembles the x73–x85 pieces into one risk report.
  * §2.12 extension operators; integer-exact discipline throughout.
  */
object SparkEntryR8e {

  private def barsGen2Sql: String =
    MarketPanel.barsGenSql(MarketPanel.tickers2)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ---- X88: weekday seasonality profile ----
    //
    // The calendar-effect statistic x63's MAD anomaly flags cannot
    // give: systematic day-of-week load deviation, as exact per-mill
    // of the uniform expectation — (n_d·7 − total)·1000 div total, all
    // integer. One partial-agg shuffle to a 7-row frame; the 1-row
    // total attaches by broadcast.
    "x88_weekday_seasonality" -> ((s, d) => {
      val byDow = Tables.events(s, d)
        .groupBy(dayofweek(col("ts")).as("dow"))
        .agg(count(lit(1)).as("n_events"))
      byDow.crossJoin(broadcast(
          byDow.agg(sum("n_events").as("total"))))
        .select(col("dow").cast("long").as("dow"), col("n_events"),
          expr("(n_events * 7 - total) * 1000 div total").as("dev_permill"))
        .orderBy("dow")
    }),

    // ---- X89: small-cell suppression (privacy-safe publication) ----
    //
    // What x66's k-anonymity AUDIT flags, this op FIXES before a table
    // is published: aggregate cells below the k=10 threshold are
    // suppressed and rolled into one "__other" row per nation. STRICT
    // k-anonymity (ADVICE r8): a rollup row that itself holds fewer
    // than k customers is suppressed too — EVERY published row, named
    // or "__other", covers ≥ k people. The cost is that mass is no
    // longer conserved for a nation whose whole suppressed slice is
    // sub-k (the deficit is < k by construction — R8eOpsSpec pins it).
    // Row-local verdict on the \|nation × segment\| aggregate frame,
    // one re-aggregation of the suppressed slice — the corpus costs a
    // single partial-agg shuffle.
    "x89_small_cell_suppress" -> ((s, d) => {
      val cells = Tables.customer(s, d)
        .join(broadcast(Tables.nation(s, d)),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"), col("c_mktsegment"))
        .agg(count(lit(1)).as("n"))
      val kept = cells.where(col("n") >= 10)
        .select(col("n_name"), col("c_mktsegment").as("segment"), col("n"))
      val folded = cells.where(col("n") < 10)
        .groupBy("n_name")
        .agg(sum("n").as("n"))
        .where(col("n") >= 10) // strict k: a sub-k rollup is suppressed too
        .select(col("n_name"), lit("__other").as("segment"), col("n"))
      kept.unionByName(folded).orderBy("n_name", "segment")
    }),

    // ---- X90: asset risk report (market-suite composition flagship) --
    //
    // The per-asset dashboard row a market pipeline publishes daily,
    // assembling the round-8 market pieces as ONE lazy plan (the
    // x72 composition discipline): close/volume panel → integer
    // returns (x76) → equal-weight index join (x78) → drawdown window
    // (x75) → a single partial-agg rollup emitting VWAP (x73), return
    // moments, beta components, max drawdown, and Amihud impact (x85)
    // side by side. Two per-asset ordered windows (lag + running max)
    // and one broadcast index join — no extra shuffles appear because
    // the pieces share the SAME panel scan and asset-keyed exchange.
    "x90_risk_report" -> ((s, d) => {
      val panel = MarketPanel.barsPanel(s, MarketPanel.tickers2)
      val w = Window.partitionBy("ativo").orderBy("dt")
      val enriched = panel
        .withColumn("lagc", lag(col("cents"), 1).over(w))
        .withColumn("runmax",
          max(col("cents")).over(w.rowsBetween(Window.unboundedPreceding,
            Window.currentRow)))
        .withColumn("r", expr("(cents - lagc) * 10000 div lagc"))
      val mkt = enriched.where(col("r").isNotNull)
        .groupBy("dt").agg(sum("r").as("m_sum"), count(lit(1)).as("m_n"))
        .select(col("dt"), expr("m_sum div m_n").as("m"))
      enriched.join(broadcast(mkt), Seq("dt"), "left")
        .groupBy("ativo")
        .agg(count(lit(1)).as("n_days"),
          expr("sum(cents * vol) div sum(vol)").as("vwap_cents"),
          count(col("r")).as("n_ret"),
          sum("r").as("sum_bp"),
          sum(expr("r * r")).as("sum_sq_bp"),
          sum(expr("r * m")).as("sum_rm"),
          sum(when(col("r").isNotNull, col("m"))).as("sum_m"),
          sum(when(col("r").isNotNull, expr("m * m"))).as("sum_mm"),
          max(expr("(runmax - cents) * 1000 div runmax"))
            .as("max_drawdown_permill"),
          sum(expr("abs(r) * 1000000 div vol")).as("sum_impact"))
        .orderBy("ativo")
    }),

    // ---- X91: time-decayed trending score (integer half-life) --------
    //
    // The "what is hot NOW" ranking every product dashboard runs —
    // without the float exp() that could never hash across engines:
    // the decay is a POWER-OF-TWO half-life per day, weight =
    // 1 << (14 − age_days) inside a 14-day horizon, 0 outside. Bit
    // shifts of integers are exact everywhere; the anchor day is the
    // corpus max (1-row broadcast), and the rollup is one
    // partial-aggregable shuffle on the trend key.
    "x91_decayed_trending" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .select(col("event_type"), col("ts").cast("date").as("day"))
      val anchor = ev.agg(max("day").as("anchor"))
      ev.crossJoin(broadcast(anchor))
        .select(col("event_type"),
          datediff(col("anchor"), col("day")).as("age"))
        .where(col("age") <= 14)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_recent"),
          sum(expr("shiftleft(CAST(1 AS BIGINT), CAST(14 - age AS INT))"))
            .as("score"))
        .orderBy("event_type")
    }),

    // ---- X92: revenue-LTV cohort curves ----
    //
    // The money sibling of x33's user-count retention: customers
    // cohorted by first-order year, revenue accumulated by cohort age —
    // the lifetime-value curve every growth dashboard plots. Revenue
    // stays integer cents end to end (the q17/x30 discipline); the
    // cumulative window runs over the ≤\|years\|² cohort frame, never
    // the order log, and the first-order frame is one partial-agg
    // min per customer.
    "x92_ltv_cohorts" -> ((s, d) => {
      val orders = Tables.orders(s, d)
        .select(col("o_custkey"), year(col("o_orderdate")).as("yr"),
          expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"))
      val cohort = orders.groupBy("o_custkey")
        .agg(min("yr").as("cohort_year"))
      val curve = orders.join(cohort, "o_custkey")
        .groupBy(col("cohort_year"), (col("yr") - col("cohort_year"))
          .cast("long").as("age_years"))
        .agg(count_distinct(col("o_custkey")).as("n_active"),
          sum("cents").as("revenue_cents"))
      val w = Window.partitionBy("cohort_year").orderBy("age_years")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      curve
        .withColumn("cum_revenue_cents", sum("revenue_cents").over(w))
        .select(col("cohort_year").cast("long").as("cohort_year"),
          col("age_years"), col("n_active"), col("revenue_cents"),
          col("cum_revenue_cents"))
        .orderBy("cohort_year", "age_years")
    }),

    // ---- X93: market-basket pair lift ----
    //
    // Co-occurrence affinity over order baskets: for part pairs seen in
    // ≥3 baskets, exact integer lift in per-mill —
    // 1000·n_ab·N div (n_a·n_b). Shape: one distinct on (order, part),
    // a self equi-join on the order key (fan-out bounded by basket
    // size², ~16 per order — never a cross of the catalog). The two
    // part-frequency marginals are \|parts\|-cardinality — they grow
    // with the catalog, so the join strategy is left to SIZE-BASED
    // planning (VERDICT r8 #2): AQE broadcasts them while small and
    // switches to a pair-keyed shuffle join when the catalog outgrows
    // the threshold, instead of a forced hint turning growth into an
    // OOM. Only the 1-row total keeps an explicit broadcast. The ≥3
    // support filter prunes the pair table before the marginals attach.
    "x93_basket_lift" -> ((s, d) => {
      val items = Tables.lineitem(s, d)
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
        .distinct()
      val pairs = items.as("a").join(items.as("b"),
          col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
        .groupBy(col("a.pk").as("part_a"), col("b.pk").as("part_b"))
        .agg(count(lit(1)).as("n_ab"))
        .where(col("n_ab") >= 3)
      val freq = items.groupBy(col("pk"))
        .agg(count(lit(1)).as("n"))
      val total = items.select(count_distinct(col("ok")).as("n_orders"))
      pairs
        .join(freq.select(col("pk").as("part_a"), col("n").as("n_a")),
          "part_a")
        .join(freq.select(col("pk").as("part_b"), col("n").as("n_b")),
          "part_b")
        .crossJoin(broadcast(total))
        .select(col("part_a"), col("part_b"), col("n_ab"),
          expr("n_ab * n_orders * 1000 div (n_a * n_b)").as("lift_permill"))
        .orderBy("part_a", "part_b")
    }))

  def oracleSql: Map[String, String] = Map(
    "x88_weekday_seasonality" ->
      """WITH d AS (
        |  SELECT dayofweek(CAST(ts AS TIMESTAMP)) + 1 AS dow,
        |         CAST(count(*) AS BIGINT) AS n_events
        |  FROM events GROUP BY 1),
        |t AS (SELECT CAST(SUM(n_events) AS BIGINT) AS total FROM d)
        |SELECT CAST(dow AS BIGINT) AS dow, n_events,
        |       CAST((n_events * 7 - total) * 1000 // total AS BIGINT)
        |         AS dev_permill
        |FROM d CROSS JOIN t ORDER BY dow""".stripMargin,
    "x89_small_cell_suppress" ->
      """WITH cells AS (
        |  SELECT n.n_name, c.c_mktsegment, CAST(count(*) AS BIGINT) AS n
        |  FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
        |  GROUP BY 1, 2)
        |SELECT n_name, c_mktsegment AS segment, n FROM cells WHERE n >= 10
        |UNION ALL
        |SELECT n_name, '__other' AS segment, CAST(SUM(n) AS BIGINT) AS n
        |FROM cells WHERE n < 10 GROUP BY n_name HAVING SUM(n) >= 10
        |ORDER BY n_name, segment""".stripMargin,
    "x90_risk_report" ->
      s"""WITH bars AS (
         |$barsGen2Sql),
         |panel AS (SELECT ativo, date AS dt,
         |                 CAST(round(close * 100) AS BIGINT) AS cents,
         |                 volume AS vol
         |          FROM bars),
         |en AS (SELECT ativo, dt, cents, vol,
         |              lag(cents) OVER (PARTITION BY ativo ORDER BY dt)
         |                AS lagc,
         |              MAX(cents) OVER (PARTITION BY ativo ORDER BY dt
         |                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |                AS runmax
         |       FROM panel),
         |er AS (SELECT *, (cents - lagc) * 10000 // lagc AS r FROM en),
         |mkt AS (SELECT dt, CAST(SUM(r) AS BIGINT) // count(*) AS m
         |        FROM er WHERE r IS NOT NULL GROUP BY 1)
         |SELECT ativo,
         |       CAST(count(*) AS BIGINT) AS n_days,
         |       CAST(SUM(cents * vol) // SUM(vol) AS BIGINT) AS vwap_cents,
         |       CAST(count(r) AS BIGINT) AS n_ret,
         |       CAST(SUM(r) AS BIGINT) AS sum_bp,
         |       CAST(SUM(r * r) AS BIGINT) AS sum_sq_bp,
         |       CAST(SUM(r * m) AS BIGINT) AS sum_rm,
         |       CAST(SUM(CASE WHEN r IS NOT NULL THEN m END) AS BIGINT)
         |         AS sum_m,
         |       CAST(SUM(CASE WHEN r IS NOT NULL THEN m * m END) AS BIGINT)
         |         AS sum_mm,
         |       CAST(MAX((runmax - cents) * 1000 // runmax) AS BIGINT)
         |         AS max_drawdown_permill,
         |       CAST(SUM(abs(r) * 1000000 // vol) AS BIGINT) AS sum_impact
         |FROM er LEFT JOIN mkt USING (dt)
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    "x91_decayed_trending" ->
      """WITH e AS (SELECT event_type, CAST(ts AS DATE) AS day FROM events),
        |a AS (SELECT MAX(day) AS anchor FROM e),
        |ag AS (SELECT event_type,
        |              date_diff('day', day, anchor) AS age
        |       FROM e CROSS JOIN a)
        |SELECT event_type, CAST(count(*) AS BIGINT) AS n_recent,
        |       CAST(SUM(CAST(1 AS BIGINT) << (14 - age)) AS BIGINT)
        |         AS score
        |FROM ag WHERE age <= 14
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "x92_ltv_cohorts" ->
      """WITH o AS (SELECT o_custkey, year(o_orderdate) AS yr,
        |                  CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        |           FROM orders),
        |c AS (SELECT o_custkey, MIN(yr) AS cohort_year FROM o GROUP BY 1),
        |cur AS (SELECT c.cohort_year,
        |               CAST(o.yr - c.cohort_year AS BIGINT) AS age_years,
        |               CAST(count(DISTINCT o.o_custkey) AS BIGINT)
        |                 AS n_active,
        |               CAST(SUM(o.cents) AS BIGINT) AS revenue_cents
        |        FROM o JOIN c USING (o_custkey)
        |        GROUP BY 1, 2)
        |SELECT CAST(cohort_year AS BIGINT) AS cohort_year, age_years,
        |       n_active, revenue_cents,
        |       CAST(SUM(revenue_cents) OVER (PARTITION BY cohort_year
        |              ORDER BY age_years
        |              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |            AS BIGINT) AS cum_revenue_cents
        |FROM cur ORDER BY cohort_year, age_years""".stripMargin,
    "x93_basket_lift" ->
      """WITH items AS (
        |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
        |pairs AS (
        |  SELECT a.pk AS part_a, b.pk AS part_b,
        |         CAST(count(*) AS BIGINT) AS n_ab
        |  FROM items a JOIN items b
        |    ON a.ok = b.ok AND a.pk < b.pk
        |  GROUP BY 1, 2 HAVING count(*) >= 3),
        |freq AS (SELECT pk, CAST(count(*) AS BIGINT) AS n
        |         FROM items GROUP BY 1),
        |tot AS (SELECT CAST(count(DISTINCT ok) AS BIGINT) AS n_orders
        |        FROM items)
        |SELECT p.part_a, p.part_b, p.n_ab,
        |       CAST(p.n_ab * t.n_orders * 1000 // (fa.n * fb.n) AS BIGINT)
        |         AS lift_permill
        |FROM pairs p
        |JOIN freq fa ON fa.pk = p.part_a
        |JOIN freq fb ON fb.pk = p.part_b
        |CROSS JOIN tot t
        |ORDER BY part_a, part_b""".stripMargin)
}
