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

  private val tickers2 = Seq("VALE3.SA", "PETR4.SA")

  private def barsGen2Sql: String =
    tickers2.map(SparkEntryPipeline.barsGenSql).mkString("\nUNION ALL\n")

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
    // suppressed and rolled into one "__other" row per nation, so no
    // published cell identifies a small group yet every count is still
    // accounted for. Row-local verdict on the \|nation × segment\|
    // aggregate frame, one re-aggregation of the suppressed slice —
    // the corpus costs a single partial-agg shuffle.
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
      val panel = tickers2
        .map(t => SyntheticBars.bars(s, t, "2024-01-01", 120))
        .reduce(_ unionByName _)
        .select(col("ativo"), col("Date").as("dt"),
          expr("CAST(round(Close * 100) AS BIGINT)").as("cents"),
          col("Volume").as("vol"))
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
        |FROM cells WHERE n < 10 GROUP BY n_name
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
        |GROUP BY 1 ORDER BY 1""".stripMargin)
}
