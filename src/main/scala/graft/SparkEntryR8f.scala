package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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
    // engine buckets identically, ties broken by customer key.
    //
    // Round-10 shape (VERDICT r9 #6): instead of materializing three
    // full |customers| rank columns and re-joining them (r9: three
    // GlobalRank passes + three hash joins, ~2.1 s at sf0.1), only the
    // three quartile BOUNDARY rows per axis are selected — one
    // rowsAtRanks sort+count+pick per axis, ≤3 rows out — and the
    // quartile of every customer is then a ROW-LOCAL lexicographic
    // comparison against the 9 collected boundary keys compiled into
    // the single scan: q = 1 + #{j : (key, ck) ≥ boundary_j}, exactly
    // the rank arithmetic because the sorted key sequence is strictly
    // increasing under the (metric, custkey) total order. No window, no
    // join, no rank column ever materializes; the only corpus-scale
    // work is the three parallel range sorts of the boundary picks and
    // one final 64-cell aggregate.
    "x94_rfm_segments" -> ((s, d) => {
      val orders = Tables.orders(s, d)
        .select(col("o_custkey"),
          expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"),
          col("o_orderdate").cast("date").as("day"))
      // ONE orders scan: recency needs only each customer's LAST day
      // (min over datediff(anchor, day) = datediff(anchor, max day)),
      // and the anchor itself is max(last_day) over the tiny customer
      // frame — no second scan, no crossJoin
      val rfm0 = orders.groupBy("o_custkey")
        .agg(max(col("day")).as("last_day"),
          count(lit(1)).as("frequency"),
          sum("cents").as("monetary_cents"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      // one job yields the row count AND the anchor (and materializes
      // the cache as a side effect)
      val nAnchor = rfm0.agg(count(lit(1)), max("last_day")).head()
      val n = nAnchor.getLong(0)
      val anchorDay = nAnchor.getDate(1)
      val rfmP = rfm0.withColumn("recency_days",
        datediff(lit(anchorDay), col("last_day")).cast("long"))
      // first rank of quartile j+1: b_j = ceil(j*n/4)+1 (kept as a list
      // WITH multiplicity — for tiny n two quartile cuts can share a
      // rank, and each occurrence must still bump the bucket)
      val bj = Seq(1L, 2L, 3L).map(j => (j * n + 3) / 4 + 1).filter(_ <= n)
      // lower recency is BETTER (ascending); higher frequency/monetary
      // are better — negated so every axis is an ASCENDING total order
      // on (key, custkey), making "rank >= b_j" ⟺ "(key, ck) >= the
      // b_j-th row's (key, ck)". All NINE boundaries come from ONE
      // rowsAtRanks pass: the three axis projections union under an
      // axis tag, the tag leads the sort order, and axis a's local rank
      // b sits at global rank a·n + b — one range sort + one count pass
      // + one pruned pick over 3n rows instead of three passes.
      val tagged = rfmP.select(lit(0L).as("ax"),
          col("recency_days").as("k"), col("o_custkey").as("ck"))
        .unionByName(rfmP.select(lit(1L).as("ax"),
          (-col("frequency")).as("k"), col("o_custkey").as("ck")))
        .unionByName(rfmP.select(lit(2L).as("ax"),
          (-col("monetary_cents")).as("k"), col("o_custkey").as("ck")))
      val wanted = for { a <- 0L to 2L; b <- bj } yield a * n + b
      val byRank: Map[Long, (Long, Long)] =
        if (bj.isEmpty) Map.empty
        else graft.stats.GlobalRank.rowsAtRanks(tagged,
            Seq(col("ax"), col("k"), col("ck")), wanted, "rk")
          .select("rk", "k", "ck").collect()
          .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      def axisBounds(a: Long): Seq[(Long, Long)] = bj.map(b => byRank(a * n + b))
      val (rB, fB, mB) = (axisBounds(0L), axisBounds(1L), axisBounds(2L))
      def quart(key: Column, bs: Seq[(Long, Long)]): Column =
        bs.foldLeft(lit(1L)) { case (acc, (bk, bck)) =>
          acc + when(key > bk ||
            (key === bk && col("o_custkey") >= bck), 1L).otherwise(0L)
        }
      rfmP.select(
          quart(col("recency_days"), rB).as("r"),
          quart(-col("frequency"), fB).as("f"),
          quart(-col("monetary_cents"), mB).as("m"))
        .groupBy("r", "f", "m")
        .agg(count(lit(1)).as("n_customers"))
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
