package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.tables.Tables

/** Round-8 (continued, part f) query entries: customer-value and
  * fulfillment analytics — RFM segmentation and per-supplier exact
  * latency percentiles. Integer-exact discipline throughout (epoch
  * days, cents, rank arithmetic — no float enters an aggregate).
  * §2.12 extension operators.
  */
object SparkEntryR8f {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ---- X94: RFM customer segmentation ----
    //
    // The classic recency/frequency/monetary triage, engine-exact: each
    // customer's (days since last order, order count, lifetime cents)
    // is quartiled by RANK arithmetic — q = (rank−1)·4 div n over the
    // (metric, key) total order — not by any float percentile, so every
    // engine buckets identically, ties broken by customer key. The
    // three global ranks over the \|customers\| frame are written as
    // plain unpartitioned row_number windows and planned by
    // GlobalRankRule (round 10) into the range-partition + offset-pass
    // GlobalRankExec — no single-task sort of the customer base at any
    // scale, and AQE materializes the three independent range shuffles
    // CONCURRENTLY (replacing round 9's hand-rolled parallel Future
    // submission of three GlobalRank helper passes, each of which paid
    // its own persist + count-shuffle job — VERDICT r9 #6). Output:
    // the 64-cell segment census.
    "x94_rfm_segments" -> ((s, d) => {
      val orders = Tables.orders(s, d)
        .select(col("o_custkey"),
          expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"),
          col("o_orderdate").cast("date").as("day"))
      val anchor = orders.agg(max("day").as("anchor"))
      val rfm = orders.crossJoin(broadcast(anchor))
        .groupBy("o_custkey")
        .agg(min(datediff(col("anchor"), col("day"))).cast("long")
            .as("recency_days"),
          count(lit(1)).as("frequency"),
          sum("cents").as("monetary_cents"))
      // lower recency is BETTER (most-recent ranks first, ascending);
      // higher frequency/monetary are better (descending). Each rank is
      // an unpartitioned row_number over a 2-column projection of the
      // shared persisted frame — GlobalRankRule plans all three as
      // parallel range sorts; the (key, rank) outputs re-join on the
      // customer key.
      val rfmP = rfm.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      def rank(c: String, descending: Boolean, out: String) = {
        val w =
          if (descending) Window.orderBy(col(c).desc, col("o_custkey"))
          else Window.orderBy(col(c), col("o_custkey"))
        rfmP.select(col("o_custkey"), col(c))
          .withColumn(out, row_number().over(w))
          .select(col("o_custkey"), col(out))
      }
      val ranked = rank("recency_days", descending = false, "rn_r")
        .join(rank("frequency", descending = true, "rn_f"), "o_custkey")
        .join(rank("monetary_cents", descending = true, "rn_m"), "o_custkey")
      val scored = ranked
        .withColumn("r_q", expr("(rn_r - 1) * 4"))
        .withColumn("f_q", expr("(rn_f - 1) * 4"))
        .withColumn("m_q", expr("(rn_m - 1) * 4"))
        .crossJoin(broadcast(rfmP.agg(count(lit(1)).as("n"))))
        .select(expr("1 + r_q div n").as("r"),
          expr("1 + f_q div n").as("f"),
          expr("1 + m_q div n").as("m"))
      scored.groupBy("r", "f", "m")
        .agg(count(lit(1)).as("n_customers"))
        .select(col("r").cast("long").as("r"), col("f").cast("long").as("f"),
          col("m").cast("long").as("m"), col("n_customers"))
        .orderBy("r", "f", "m")
    }),

    // ---- X95: per-supplier fulfillment-latency percentiles ----
    //
    // The a3 exact-rank-selection discipline taken PER GROUP: for each
    // supplier, exact p50/p90 of ship latency in whole days
    // (l_shipdate − o_orderdate). One equi-join to attach order dates,
    // then a single per-supplier ordered window computing rank and
    // group size in one pass — the selection predicate is rank
    // arithmetic, no approximate percentile. Groups scale out on the
    // supplier key; no global order anywhere.
    "x95_ship_latency" -> ((s, d) => {
      val lat = Tables.lineitem(s, d)
        .select(col("l_suppkey"), col("l_orderkey"),
          col("l_linenumber"), col("l_shipdate"))
        .join(Tables.orders(s, d)
          .select(col("o_orderkey").as("l_orderkey"), col("o_orderdate")),
          "l_orderkey")
        .select(col("l_suppkey"),
          datediff(col("l_shipdate"), col("o_orderdate")).cast("long")
            .as("lat_days"),
          col("l_orderkey"), col("l_linenumber"))
      val w = Window.partitionBy("l_suppkey")
        .orderBy(col("lat_days"), col("l_orderkey"), col("l_linenumber"))
      val wAll = Window.partitionBy("l_suppkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      lat
        .withColumn("rk", row_number().over(w))
        .withColumn("n", count(lit(1)).over(wAll))
        .groupBy("l_suppkey")
        .agg(max("n").as("n_shipments"),
          max(when(col("rk") === expr("(n + 1) div 2"), col("lat_days")))
            .as("p50_days"),
          max(when(col("rk") === expr("(9 * n + 9) div 10"), col("lat_days")))
            .as("p90_days"))
        .orderBy("l_suppkey")
    }),

    // ---- X96: weekday-adjusted volume anomaly ----
    //
    // Closes the x63/x88 loop: x63 flags days against a FLAT baseline,
    // x88 measures the weekday effect — this op flags days against
    // their OWN weekday's expectation, so a naturally quiet Sunday
    // stops alerting and a quiet Tuesday starts. Residual is exact
    // per-mill: (n_day·days_of_that_weekday − weekday_total)·1000 div
    // weekday_total; flag when |residual| > 500. Two partial-agg
    // shuffles to day and weekday frames, the 7-row profile broadcast.
    "x96_seasonal_anomaly" -> ((s, d) => {
      val byDay = Tables.events(s, d)
        .groupBy(col("ts").cast("date").as("day"))
        .agg(count(lit(1)).as("n"))
        .withColumn("dow", dayofweek(col("day")))
      val profile = byDay.groupBy("dow")
        .agg(sum("n").as("w_total"), count(lit(1)).as("w_days"))
      byDay.join(broadcast(profile), "dow")
        .select(col("day"), col("n"),
          expr("(n * w_days - w_total) * 1000 div w_total")
            .as("residual_permill"))
        .withColumn("is_anomaly",
          when(abs(col("residual_permill")) > 500, 1L).otherwise(0L))
        .orderBy("day")
    }),

    // ---- X97: per-source quantile normalization ----
    //
    // The calibration step corpus mixing needs before quality scores
    // from different sources can be compared: each doc's raw quality is
    // mapped to its PER-SOURCE quantile rank (per-mill of strictly-
    // lower-scored docs in the same source). Raw quality is x51's
    // integer per-mill alpha ratio, so the CDF lives on a
    // \|sources\|×≤1001 LEVEL frame — the only ordered window runs over
    // that bounded frame and the mapping re-attaches by broadcast; the
    // corpus itself never sees a window (the x51 boundary discipline).
    "x97_quantile_normalize" -> ((s, d) => {
      import graft.text.QuantileNorm
      val scored = Tables.documents(s, d).select(col("doc_id"),
        col("source"), QuantileNorm.rawQuality(col("text")).as("q"))
      scored.join(broadcast(QuantileNorm.mapping(scored, "source")),
          Seq("source", "q"))
        .select(col("doc_id"), col("q"), col("norm").as("norm_permill"))
        .orderBy("doc_id")
    }))

  def oracleSql: Map[String, String] = Map(
    "x94_rfm_segments" ->
      """WITH o AS (SELECT o_custkey,
        |                  CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
        |                  CAST(o_orderdate AS DATE) AS day
        |           FROM orders),
        |a AS (SELECT MAX(day) AS anchor FROM o),
        |rfm AS (SELECT o_custkey,
        |               CAST(MIN(date_diff('day', day, anchor)) AS BIGINT)
        |                 AS recency_days,
        |               CAST(count(*) AS BIGINT) AS frequency,
        |               CAST(SUM(cents) AS BIGINT) AS monetary_cents
        |        FROM o CROSS JOIN a GROUP BY 1),
        |sc AS (SELECT
        |         1 + (row_number() OVER (ORDER BY recency_days, o_custkey)
        |              - 1) * 4 // (SELECT count(*) FROM rfm) AS r,
        |         1 + (row_number() OVER (ORDER BY frequency DESC, o_custkey)
        |              - 1) * 4 // (SELECT count(*) FROM rfm) AS f,
        |         1 + (row_number() OVER (ORDER BY monetary_cents DESC,
        |                                 o_custkey)
        |              - 1) * 4 // (SELECT count(*) FROM rfm) AS m
        |       FROM rfm)
        |SELECT CAST(r AS BIGINT) AS r, CAST(f AS BIGINT) AS f,
        |       CAST(m AS BIGINT) AS m,
        |       CAST(count(*) AS BIGINT) AS n_customers
        |FROM sc GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,
    "x95_ship_latency" ->
      """WITH lat AS (
        |  SELECT l.l_suppkey,
        |         CAST(date_diff('day', o.o_orderdate, l.l_shipdate)
        |              AS BIGINT) AS lat_days,
        |         l.l_orderkey, l.l_linenumber
        |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
        |rk AS (SELECT l_suppkey, lat_days,
        |              row_number() OVER (PARTITION BY l_suppkey
        |                ORDER BY lat_days, l_orderkey, l_linenumber) AS rk,
        |              count(*) OVER (PARTITION BY l_suppkey) AS n
        |       FROM lat)
        |SELECT l_suppkey, CAST(MAX(n) AS BIGINT) AS n_shipments,
        |       CAST(MAX(CASE WHEN rk = (n + 1) // 2 THEN lat_days END)
        |            AS BIGINT) AS p50_days,
        |       CAST(MAX(CASE WHEN rk = (9 * n + 9) // 10 THEN lat_days END)
        |            AS BIGINT) AS p90_days
        |FROM rk GROUP BY 1 ORDER BY 1""".stripMargin,
    "x96_seasonal_anomaly" ->
      """WITH byday AS (
        |  SELECT CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1),
        |dw AS (SELECT day, n, dayofweek(day) + 1 AS dow FROM byday),
        |prof AS (SELECT dow, CAST(SUM(n) AS BIGINT) AS w_total,
        |                CAST(count(*) AS BIGINT) AS w_days
        |         FROM dw GROUP BY 1)
        |SELECT dw.day, dw.n,
        |       CAST((dw.n * p.w_days - p.w_total) * 1000 // p.w_total
        |            AS BIGINT) AS residual_permill,
        |       CAST(CASE WHEN abs((dw.n * p.w_days - p.w_total) * 1000
        |                          // p.w_total) > 500
        |                 THEN 1 ELSE 0 END AS BIGINT) AS is_anomaly
        |FROM dw JOIN prof p USING (dow) ORDER BY dw.day""".stripMargin,
    "x97_quantile_normalize" ->
      s"""WITH scored AS (
         |  SELECT doc_id, source,
         |         ${graft.text.QuantileNorm.rawQualitySql} AS q
         |  FROM documents),
         |${graft.text.QuantileNorm.mappingSql("source")}
         |SELECT s.doc_id, CAST(s.q AS BIGINT) AS q,
         |       CAST(cdf.below * 1000 // cdf.n_grp AS BIGINT)
         |         AS norm_permill
         |FROM scored s JOIN cdf ON cdf.source = s.source AND cdf.q = s.q
         |ORDER BY s.doc_id""".stripMargin)
}
