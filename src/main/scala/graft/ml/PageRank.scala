package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Integer fixed-point PageRank over an aggregated transition graph — the
  * Markov-chain authority score of a categorical navigation structure
  * (event types here; domains or hosts in a crawl-frontier ranking, where
  * authority feeds the quality prior of corpus curation).
  *
  * The 100 TB shape: the corpus-scale stage is EDGE EXTRACTION (one
  * user-keyed window + one partial-aggregable groupBy collapses billions
  * of events into a node²-bounded edge table); the power iteration then
  * runs on that aggregate only — R rounds of (edge ⋈ rank) joins that
  * never revisit the corpus, expressed lazily as one Catalyst plan (no
  * driver round-trips: the round count is fixed, so nothing needs a
  * convergence collect).
  *
  * All-integer arithmetic in parts-per-million (rank mass 1 000 000,
  * damping 850/1000), truncating division — both engines' positive-operand
  * `div`/`//` agree — so the DuckDB oracle replays the identical rounds as
  * an unrolled CTE chain and matches bit-for-bit. Per textbook treatment
  * (Page et al. 1999; damping redistribution simplified): dangling mass is
  * dropped rather than redistributed, and each round re-bases at
  * `150000 div n + 850·contrib div 1000` — total mass stays ≤ 1 000 000
  * (truncation and dangling edges only leak mass down).
  */
object PageRank {

  /** Edge table (src, dst, cnt) of consecutive-event transitions per user,
    * ordered by (ts, tiebreaker) — the tiebreaker keeps the lag
    * deterministic across engines when timestamps collide.
    */
  def transitions(events: DataFrame, userCol: String, typeCol: String,
                  tsCol: String, tieCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(userCol)).orderBy(col(tsCol), col(tieCol))
    events
      .select(col(userCol), col(typeCol).as("dst"),
        lag(col(typeCol), 1).over(w).as("src"))
      .where(col("src").isNotNull)
      .groupBy("src", "dst").agg(count(lit(1)).as("cnt"))
  }

  /** `rounds` power-iteration steps over `edges` (src, dst, cnt); returns
    * (node, pr) with pr in parts-per-million. `nodes` must hold every
    * vertex (sources AND sinks) exactly once.
    *
    * Cardinality-adaptive (the x35 adaptive-k discipline): after the
    * corpus-scale edge extraction, a graph whose EDGE TABLE is at most
    * `smallGraphEdges` rows iterates on the driver — the whole aggregate
    * is bounded model state, and 10 rounds of 32-partition micro-shuffles
    * would cost more in task scheduling than the arithmetic (measured
    * 2.4 s -> ~0.3 s at sf0.1 over 5 event types). Larger graphs (domain
    * ranking: millions of nodes) run the same rounds as distributed
    * joins with per-round lineage cuts. Both paths compute the identical
    * integer fixed point (pinned against each other in `R8OpsSpec`).
    */
  def ranks(nodes: DataFrame, nodeCol: String, edges: DataFrame,
            rounds: Int, smallGraphEdges: Long = 100000L): DataFrame = {
    val spark = nodes.sparkSession
    val out = edges.groupBy("src").agg(sum("cnt").as("out"))
    // materialized ONCE: every round references the edge aggregate, and
    // without a lineage cut each reference re-derives the corpus-scale
    // edge extraction inside one plan
    val e = edges.join(out, "src").localCheckpoint()
    if (e.count() <= smallGraphEdges) {
      val es = e.collect().map(r => (r.getString(0), r.getString(1),
        r.getLong(2), r.getLong(3)))
      val ns = nodes.select(col(nodeCol).cast("string")).collect()
        .map(_.getString(0))
      val nn = ns.length.toLong
      var pr = ns.map(_ -> 1000000L / nn).toMap
      for (_ <- 1 to rounds) {
        val contrib = es.groupBy(_._2).map { case (dst, g) =>
          dst -> g.map { case (src, _, cnt, od) => pr(src) * cnt / od }.sum
        }
        pr = ns.map(v =>
          v -> (150000L / nn + 850L * contrib.getOrElse(v, 0L) / 1000L)).toMap
      }
      import scala.jdk.CollectionConverters._
      spark.createDataFrame(
        ns.map(v => org.apache.spark.sql.Row(v, pr(v))).toSeq.asJava,
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("node",
            org.apache.spark.sql.types.StringType, nullable = false),
          org.apache.spark.sql.types.StructField("pr",
            org.apache.spark.sql.types.LongType, nullable = false))))
    } else {
      // node key normalized to string for schema parity with the
      // driver-side path
      val n = nodes.select(col(nodeCol).cast("string").as("node"))
        .crossJoin(broadcast(nodes.agg(count(lit(1)).as("nn"))))
        .localCheckpoint()
      val p0 = n.select(col("node"), col("nn"), expr("1000000 div nn").as("pr"))
      (1 to rounds).foldLeft(p0) { (p, _) =>
        val contrib = e.join(p, e("src") === p("node"))
          .select(col("dst"), expr("(pr * cnt) div out").as("c"))
          .groupBy("dst").agg(sum("c").as("contrib"))
        // teleport 150000 div n per node conserves total mass at 1e6
        // (truncation + dangling edges can only leak mass DOWN); per-round
        // lineage cuts keep round k from re-planning rounds 1..k-1
        n.join(contrib, n("node") === contrib("dst"), "left")
          .select(col("node"), col("nn"),
            (expr("150000 div nn") + expr("(850 * coalesce(contrib, 0L)) div 1000")).as("pr"))
          .localCheckpoint()
      }.drop("nn")
    }
  }

  /** DuckDB replay of [[transitions]] + [[ranks]] over the events table:
    * the same rounds as an unrolled CTE chain, emitting
    * (event_type, pr BIGINT).
    */
  def oracleSql(rounds: Int): String = {
    val head = Seq(
      "tr AS MATERIALIZED (SELECT user_id, event_type AS dst, " +
        "lag(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) " +
        "AS src FROM events)",
      "e AS MATERIALIZED (SELECT src, dst, CAST(count(*) AS BIGINT) AS cnt " +
        "FROM tr WHERE src IS NOT NULL GROUP BY 1, 2)",
      "o AS MATERIALIZED (SELECT src, SUM(cnt) AS \"out\" FROM e GROUP BY 1)",
      "n AS MATERIALIZED (SELECT DISTINCT event_type AS node FROM events)",
      "p0 AS MATERIALIZED (SELECT node, 1000000 // (SELECT count(*) FROM n) " +
        "AS pr FROM n)")
    val loop = (1 to rounds).flatMap { k =>
      Seq(
        s"c$k AS MATERIALIZED (SELECT e.dst, SUM((p.pr * e.cnt) // o.\"out\") AS contrib " +
          s"FROM e JOIN o USING (src) JOIN p${k - 1} p ON p.node = e.src GROUP BY 1)",
        s"p$k AS MATERIALIZED (SELECT n.node, 150000 // (SELECT count(*) FROM n) " +
          s"+ (850 * COALESCE(c.contrib, 0)) // 1000 " +
          s"AS pr FROM n LEFT JOIN c$k c ON c.dst = n.node)")
    }
    s"""WITH ${(head ++ loop).mkString(",\n")}
       |SELECT node AS event_type, CAST(pr AS BIGINT) AS pr FROM p$rounds""".stripMargin
  }
}
