package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Cross-entry semantic invariants for the round-6 analytics surface —
  * relationships BETWEEN queries (and distribution-free properties) that
  * the per-query DuckDB oracle cannot express.
  */
class R6OpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.Sf0001

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("horizon-bounded funnel is dominated by the unbounded funnel") {
    // restricting each stage to a 7-day window can only lose conversions
    val unb = q("x32_funnel").head()
    val hor = q("x32b_funnel_horizon").head()
    assert(hor.getLong(0) === unb.getLong(0), "signup stage has no horizon")
    assert(hor.getLong(1) <= unb.getLong(1))
    assert(hor.getLong(2) <= unb.getLong(2))
    assert(unb.getLong(1) > 0 && hor.getLong(1) > 0,
      "fixture must convert at both settings for the test to bite")
  }

  test("gap fill emits a dense contiguous day grid per user, no null fills") {
    val rows = q("w10_gap_fill")
      .groupBy("user_id").agg(
        count(lit(1)).as("n"),
        (max(col("day")) - min(col("day")) + 1).as("span"),
        sum(col("v_filled").isNull.cast("int")).as("n_null"),
        sum(col("is_gap")).as("n_gaps"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) === r.getLong(2),
        s"user ${r.get(0)}: grid not dense (n=${r.getLong(1)} span=${r.getLong(2)})")
      assert(r.getLong(3) === 0L, s"user ${r.get(0)}: null fill escaped")
    }
    assert(rows.map(_.getLong(4)).sum > 0, "fixture must contain real gaps")
  }

  test("winsorize clips ~5% per tail and keeps totals consistent") {
    q("a9_winsorize").collect().foreach { r =>
      val (n, nLo, nHi) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(nLo >= (0.03 * n).toLong && nLo <= (0.07 * n).toLong + 1,
        s"${r.getString(0)}: low-tail clip count $nLo implausible for n=$n")
      assert(nHi >= (0.03 * n).toLong && nHi <= (0.07 * n).toLong + 1,
        s"${r.getString(0)}: high-tail clip count $nHi implausible for n=$n")
    }
  }

  test("rolling 7-day actives dominate single-day actives at every window end") {
    val daily = graft.tables.Tables.events(spark, sf)
      .select(col("user_id"), expr("unix_micros(ts) div 86400000000").as("day"))
      .groupBy("day").agg(countDistinct(col("user_id")).as("dau"))
    val rolled = q("x41_rolling_active_users")
      .withColumnRenamed("win_end", "day")
    val joined = daily.join(rolled, "day")
    assert(joined.filter(col("n_active") < col("dau")).isEmpty,
      "a trailing 7-day window can never hold fewer users than its last day")
    assert(joined.filter(col("n_active") > col("dau")).count() > 0,
      "fixture must have multi-day actives for the test to bite")
  }
}
