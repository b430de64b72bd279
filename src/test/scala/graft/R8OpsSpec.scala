package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Cross-entry semantic invariants for the round-8 curation surface
  * (mixture rebalancing, leakage-safe splitting) — properties the
  * per-query DuckDB oracle proves by agreement but cannot NAME.
  */
class R8OpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.Sf0001

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  // ---- X53 mixture rebalance ----

  test("x53: every stratum lands within binomial noise of the smallest") {
    val out = q("x53_mixture_rebalance")
    val kept = out.groupBy("lang").agg(count(lit(1)).as("k")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val totals = graft.tables.Tables.documents(spark, sf)
      .groupBy("lang").agg(count(lit(1)).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val m = totals.values.min.toDouble
    assert(totals.size >= 3, "fixture must have several strata")
    // expected kept per stratum = n * keep_pm/1000 ≈ m; binomial noise
    // bound uses sigma = sqrt(m)·~3 with a floor (corpus-wide redraws —
    // the ADVICE r7 discipline: wide floor, never flaky)
    totals.foreach { case (lang, n) =>
      val pm = math.max(1L, 1000L * m.toLong / n)
      val expected = n * pm / 1000.0
      val bound = math.max(10.0, 3.5 * math.sqrt(expected))
      assert(math.abs(kept.getOrElse(lang, 0L) - expected) <= bound,
        s"$lang kept=${kept.getOrElse(lang, 0L)} expected=$expected±$bound")
    }
    // the smallest stratum keeps everything (keep_pm = 1000)
    val smallest = totals.minBy(_._2)._1
    assert(kept(smallest) === totals(smallest))
  }

  test("x53: corpus is never shuffled — stratum table broadcasts back") {
    val plan = q("x53_mixture_rebalance").queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"keep-rate join must broadcast:\n$plan")
  }

  test("x53: deterministic — two runs produce the identical sample") {
    val a = q("x53_mixture_rebalance").collect().map(_.getLong(0)).sorted
    val b = q("x53_mixture_rebalance").collect().map(_.getLong(0)).sorted
    assert(a.sameElements(b))
  }

  // ---- X54 leakage-safe split ----

  test("x54: every near-dup component lands in ONE split (no leakage)") {
    val out = q("x54_leakage_safe_split").persist()
    try {
      // grp → exactly one split value
      val bad = out.groupBy("grp")
        .agg(countDistinct(col("split")).as("ns"))
        .where(col("ns") > 1).count()
      assert(bad === 0L, "a component straddles splits")
      // the planted chain A~B~C (ids n, n+2e6, n+1e6) must share a split
      val chains = out
        .withColumn("base", pmod(col("doc_id"), lit(1000000L)))
        .groupBy("base")
        .agg(countDistinct(col("split")).as("ns"), count(lit(1)).as("n"))
        .where(col("n") === 3 && col("ns") > 1)
      assert(chains.count() === 0L, "a planted chain straddles splits")
      // all three split values occur and train dominates (7/2/1 hash split)
      val bySplit = out.groupBy("split").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(bySplit.keySet === Set("train", "val", "test"))
      assert(bySplit("train") > bySplit("val") && bySplit("val") > bySplit("test"))
    } finally { out.unpersist(); () }
  }

  test("x54: reuses the persisted x2 component labels — no second propagation") {
    // prime: x2_dedup_cc materializes the cc_labels artifact for this
    // (corpus, params) key; x54 must then load it, not refit
    q("x2_dedup_cc").collect()
    val loads0 = countCcLabelDirs()
    assert(loads0 > 0, "priming x2_dedup_cc must materialize a label dir " +
      "— if this is 0 the prefix below no longer matches the artifact kind")
    q("x54_leakage_safe_split").collect()
    assert(countCcLabelDirs() === loads0,
      "x54 created a NEW cc_labels artifact — key mismatch with x2_dedup_cc")
  }

  // ---- X58 mixture recipe planner ----

  test("x58: factors really up- AND down-sample, and x49's executor hits the plan") {
    val plan = q("x58_mix_plan").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(plan.exists(_._3 > 1000L), "no source upsampled — plan trivialized")
    assert(plan.exists(_._3 < 1000L), "no source downsampled — plan trivialized")
    // planned post-mix tokens land near the equal share (floor effects only)
    val share = plan.map(_._2).sum / plan.length
    plan.foreach { case (src, tokens, f) =>
      val planned = tokens * f / 1000.0
      assert(math.abs(planned - share) <= math.max(0.05 * share, tokens / 1000.0 + 1),
        s"$src planned=$planned share=$share")
    }
    // EXECUTE the plan: epochMix with the planned factors; realized
    // per-source token counts approach the share (fractional-draw noise —
    // wide floor per the ADVICE discipline)
    val docs = graft.tables.Tables.documents(spark, sf)
    val factors = q("x58_mix_plan").select(col("source"), col("factor_pm"))
    val mixed = graft.text.TextOps.epochMix(
      docs.join(broadcast(factors), "source"), "text", col("factor_pm"), "r8test")
    val realized = mixed
      .select(col("source"),
        when(length(trim(col("text"))) === 0, lit(0L))
          .otherwise(size(split(trim(col("text")), "\\s+")).cast("bigint")).as("n"))
      .groupBy("source").agg(sum("n").as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    plan.foreach { case (src, tokens, _) =>
      val got = realized.getOrElse(src, 0L).toDouble
      // one fractional doc-draw can move up to the source's mean doc
      // length; bound by 25% of share with a wide absolute floor
      assert(math.abs(got - share) <= math.max(200.0, 0.25 * share),
        s"$src realized=$got share=$share")
    }
  }

  // ---- X57 source keywords ----

  test("x57: every ranking window is source-partitioned, never corpus-global") {
    val p = q("x57_source_keywords").queryExecution.executedPlan.toString
    val windows = p.linesIterator
      .filter(_.contains("windowspecdefinition(")).toSeq
    assert(windows.nonEmpty, s"top-5 ranking lost its window:\n$p")
    windows.foreach(w => assert(w.contains("windowspecdefinition(source"),
      s"unpartitioned ranking window (one task would own the term table):\n$w"))
  }

  // ---- X55 transition-graph PageRank ----

  test("x55: matches a local fixed-point replay exactly; mass is bounded") {
    val out = q("x55_event_pagerank").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // local replay from the same transition counts (tiny graph)
    val ev = graft.tables.Tables.events(spark, sf)
    val edges = graft.ml.PageRank
      .transitions(ev, "user_id", "event_type", "ts", "event_id")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val nodes = ev.select("event_type").distinct().collect()
      .map(_.getString(0)).sorted
    val outDeg = edges.groupBy(_._1).map { case (s, es) => s -> es.map(_._3).sum }
    var pr = nodes.map(_ -> 1000000L / nodes.length).toMap
    for (_ <- 1 to 10) {
      val contrib = edges.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map { case (s, _, c) => pr(s) * c / outDeg(s) }.sum
      }
      pr = nodes.map(v =>
        v -> (150000L / nodes.length + 850L * contrib.getOrElse(v, 0L) / 1000L)).toMap
    }
    assert(out === pr, s"engine $out != replay $pr")
    // every node keeps at least the teleport floor; total mass can only
    // leak down (truncation + dangling), never up
    out.values.foreach(v => assert(v >= 150000L / nodes.length))
    assert(out.values.sum <= 1000000L)
    // the adaptive small-graph (driver) and distributed paths compute
    // the identical fixed point: force the distributed fold and compare
    val dist = graft.ml.PageRank.ranks(
      ev.select("event_type").distinct(), "event_type",
      graft.ml.PageRank.transitions(ev, "user_id", "event_type", "ts", "event_id"),
      rounds = 10, smallGraphEdges = 0L)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(dist === out, s"distributed $dist != adaptive $out")
  }

  private def countCcLabelDirs(): Int = {
    val base = graft.util.ArtifactStore.baseDir(spark)
    Option(base.listFiles()).map(_.count(f =>
      f.getName.startsWith("cc_labels_v2-") && !f.getName.contains(".tmp-")))
      .getOrElse(0)
  }
}
