package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.tables.Tables

/** Round-12 query entries. §2.12 extension operators. */
object SparkEntryR12 {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ---- X124: trailing-by-event-time rolling windows — VALUE-DISTANCE
    // (RANGE) frames through the plain SQL surface ----
    //
    // The w9 trailing-2-day shape (`RANGE BETWEEN <Δt> PRECEDING AND
    // CURRENT ROW`) written GLOBALLY and per a LOW-NDV key — the two
    // spellings Spark plans as a one-task (resp. ndv-task) sort-window
    // (VERDICT r11 missing #1). `GlobalRankRule`/`KeyedWindowRule` now
    // re-plan both through `RangeAggExec`: a range exchange, a
    // per-partition boundary harvest capped by VALUE distance (the cap
    // refuses loudly if a dropped tuple could have served a later
    // partition — a value frame's row count is unknowable at plan time),
    // a driver stitch, and a per-peer-run sliding re-fold. RANGE peer
    // semantics (later rows at the SAME instant are IN the frame) ride
    // free: equal sort keys never straddle a range partition. Outputs
    // are integer sums/counts/extrema — fold-order-independent, so
    // engine-exact even under timestamp ties. The keyed arm's ndv proof
    // is the event-type IN filter (how a user scopes event classes
    // anyway); `PlanAuditSpec` pins both plans Window-free.
    "x124_trailing_time_window" -> ((s, d) => {
      import org.apache.spark.sql.functions._
      Tables.events(s, d)
        .select(col("event_id"), col("event_type"),
          unix_micros(col("ts")).as("us"),
          expr("CAST(floor(value * 1000000) AS BIGINT)").as("v_us"))
        .createOrReplaceTempView("x124_events")
      s.sql(
        """SELECT event_id,
          |  sum(v_us)  OVER wg AS g_sum2d,
          |  count(*)   OVER wg AS g_n2d,
          |  min(v_us)  OVER wg AS g_min2d,
          |  max(v_us)  OVER wg AS g_max2d,
          |  sum(v_us)  OVER wk AS k_sum2d,
          |  count(*)   OVER wk AS k_n2d
          |FROM x124_events
          |WHERE event_type IN ('click', 'error', 'purchase', 'signup', 'view')
          |WINDOW wg AS (ORDER BY us
          |    RANGE BETWEEN 172800000000 PRECEDING AND CURRENT ROW),
          |  wk AS (PARTITION BY event_type ORDER BY us
          |    RANGE BETWEEN 172800000000 PRECEDING AND CURRENT ROW)
          |ORDER BY event_id""".stripMargin)
    }))

  def oracleSql: Map[String, String] = Map(
    // DuckDB widens sum(BIGINT) to HUGEINT and count to HUGEINT-ish —
    // cast both back to BIGINT to hash-match Spark's LongType
    "x124_trailing_time_window" ->
      """WITH e AS (
        |  SELECT event_id, event_type,
        |         epoch_us(CAST(ts AS TIMESTAMP)) AS us,
        |         CAST(floor(value * 1000000) AS BIGINT) AS v_us
        |  FROM events
        |)
        |SELECT event_id,
        |  CAST(sum(v_us) OVER wg AS BIGINT) AS g_sum2d,
        |  CAST(count(*)  OVER wg AS BIGINT) AS g_n2d,
        |  min(v_us) OVER wg AS g_min2d,
        |  max(v_us) OVER wg AS g_max2d,
        |  CAST(sum(v_us) OVER wk AS BIGINT) AS k_sum2d,
        |  CAST(count(*)  OVER wk AS BIGINT) AS k_n2d
        |FROM e
        |WHERE event_type IN ('click', 'error', 'purchase', 'signup', 'view')
        |WINDOW wg AS (ORDER BY us
        |    RANGE BETWEEN 172800000000 PRECEDING AND CURRENT ROW),
        |  wk AS (PARTITION BY event_type ORDER BY us
        |    RANGE BETWEEN 172800000000 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin)
}
