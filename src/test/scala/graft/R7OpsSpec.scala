package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.text.TextOps

/** Cross-entry semantic invariants for the round-7 training-data surface
  * (boilerplate strip, fractional-epoch mixing, deterministic training
  * shuffle) — properties the per-query DuckDB oracle cannot express, plus
  * planted-fixture exercises of paths the organic sf0.001 corpus may not
  * reach (the hot-segment drop path needs >= minDocs distinct docs
  * sharing a segment).
  */
class R7OpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.Sf0001

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  // ---- X48 boilerplate strip ----

  test("boilerplate strip drops planted boilerplate everywhere, keeps organic text") {
    import spark.implicits._
    // 30 docs share a nav-bar prefix (2 segments of 3 tokens); unique tails.
    val planted = (1 to 30).map { i =>
      (i.toLong, s"home about contact terms privacy cookies unique$i tail$i words$i")
    } :+ (99L, "an organic document with no shared segments at all here")
    val out = TextOps.stripBoilerplate(
      planted.toDF("doc_id", "text"), "doc_id", "text", segTokens = 3, minDocs = 12)
      .collect().map(r => r.getLong(0) -> r).toMap
    (1 to 30).foreach { i =>
      val r = out(i.toLong)
      assert(r.getLong(1) === 3L, s"doc $i segment count")
      assert(r.getLong(2) === 1L, s"doc $i must lose both boilerplate segments")
      assert(r.getString(3) === s"unique$i tail$i words$i", s"doc $i remainder")
    }
    val organic = out(99L)
    assert(organic.getLong(1) === organic.getLong(2), "organic doc keeps every segment")
    assert(organic.getString(3) ===
      "an organic document with no shared segments at all here")
  }

  test("boilerplate strip is a no-op below the distinct-doc threshold") {
    import spark.implicits._
    // the same segment in 11 docs (< minDocs=12) survives
    val docs = (1 to 11).map { i => (i.toLong, s"home about contact tail$i") }
    val out = TextOps.stripBoilerplate(
      docs.toDF("doc_id", "text"), "doc_id", "text", segTokens = 3, minDocs = 12)
    assert(out.filter(col("n_kept") =!= col("n_seg")).count() === 0L)
  }

  test("x48 on the fixture: kept text is a subsequence rebuild, counts consistent") {
    val rows = q("x48_boilerplate_strip").collect()
    assert(rows.length === spark.read.parquet(s"$sf/documents.parquet").count())
    rows.foreach { r =>
      val (nSeg, nKept, kept) = (r.getLong(1), r.getLong(2), r.getString(3))
      assert(nKept <= nSeg)
      // only whole 3-token segments are dropped: the kept text's token
      // count can exceed 3*(n_kept-1) only via the original short tail
      val keptToks = if (kept.isEmpty) 0L else kept.split("\\s+").length.toLong
      assert(keptToks <= 3L * nKept, s"doc ${r.getLong(0)}: $keptToks toks / $nKept segs")
      if (nKept > 0) assert(keptToks > 3L * (nKept - 1))
    }
  }

  test("hot-set cap keeps the most-shared segments and bounds the broadcast") {
    import spark.implicits._
    // two boilerplate segments at different heat: seg A in 30 docs, seg B
    // in 15; with maxHotSet=1 only A (the hotter) is stripped, B survives
    val docs = (1 to 30).map { i =>
      val b = if (i <= 15) "meta nav menu " else ""
      (i.toLong, s"home about contact ${b}unique$i tail$i words$i")
    }
    val out = TextOps.stripBoilerplate(
      docs.toDF("doc_id", "text"), "doc_id", "text",
      segTokens = 3, minDocs = 12, maxHotSet = 1)
      .collect().map(r => r.getLong(0) -> r).toMap
    (1 to 15).foreach { i =>
      assert(out(i.toLong).getString(3) === s"meta nav menu unique$i tail$i words$i",
        s"doc $i: colder hot segment must survive a cap of 1")
    }
    (16 to 30).foreach { i =>
      assert(out(i.toLong).getString(3) === s"unique$i tail$i words$i")
    }
  }

  test("hot-set selection plans a bounded top-k, not an unbounded collect") {
    // two acceptable shapes, both bounded: a fresh unkeyed build owns the
    // hot set through TakeOrderedAndProject (bounded per-partition heap
    // of maxHotSet rows); the keyed entries compile the persisted
    // (<= maxHotSet rows) hot set into the graft_strip_segments kernel.
    // A plan regression to a global Sort or a straight collect_list over
    // the filtered segment table would reintroduce the unbounded one-row
    // broadcast.
    for (name <- Seq("x48_boilerplate_strip", "x48b_boilerplate_sketch")) {
      val p = q(name).queryExecution.executedPlan.toString
      assert(p.contains("TakeOrderedAndProject") ||
        p.contains("graft_strip_segments"),
        s"$name: hot set neither bounded top-k nor compiled kernel set\n$p")
    }
    // the unkeyed (no-artifact) form must plan the bounded top-k itself
    import spark.implicits._
    val docs = (1 to 20).map(i => (i.toLong, s"home about contact tail$i"))
      .toDF("doc_id", "text")
    val fresh = TextOps.stripBoilerplate(docs, "doc_id", "text",
      segTokens = 3, minDocs = 12).queryExecution.executedPlan.toString
    assert(fresh.contains("TakeOrderedAndProject"),
      s"unkeyed strip lost its bounded top-k\n$fresh")
  }

  test("sketch-counted boilerplate strip equals the exact strip at fixture cardinality") {
    // per-segment doc counts are tiny at sf0.001, so the HLL estimate is
    // exact and the two hot sets — hence the two outputs — must agree
    // bit for bit (the x41b/x46b twin discipline applied to x48)
    val exact = q("x48_boilerplate_strip")
    val sketch = q("x48b_boilerplate_sketch")
    assert(exact.exceptAll(sketch).count() === 0L)
    assert(sketch.exceptAll(exact).count() === 0L)
  }

  // ---- X49 fractional-epoch mix ----

  test("epoch mix respects per-source expected repeat factors") {
    import spark.implicits._
    val df = q("x49_epoch_mix")
    val bySource = df.groupBy("source").agg(count(lit(1)).as("n_epoch"))
      .join(graft.tables.Tables.documents(spark, sf).groupBy("source")
        .agg(count(lit(1)).as("n_docs")), "source")
      .select(col("source"), col("n_epoch"), col("n_docs"))
      .as[(String, Long, Long)].collect()
    assert(bySource.nonEmpty)
    bySource.foreach { case (src, nEpoch, nDocs) =>
      val f = 500L + 250L * (src.drop(3).toLong % 7L)
      val expected = nDocs * f / 1000.0
      // the fractional draw is a per-mill hash over 25 docs/source at
      // sf0.001 — allow binomial noise around the expectation
      // floor 8 ≈ 3.2σ for 25 docs at p=0.5 — a redrawn fixture vintage
      // should not flake this (ADVICE r7)
      assert(math.abs(nEpoch - expected) <= math.max(8.0, 0.35 * expected),
        s"$src: epoch rows $nEpoch vs expected ~$expected (f=$f, docs=$nDocs)")
      // integer repeat floor is a hard bound both ways
      assert(nEpoch >= nDocs * (f / 1000L), s"$src: below integer floor")
      assert(nEpoch <= nDocs * (f / 1000L + 1), s"$src: above integer ceiling")
    }
  }

  test("epoch mix copies are dense 0..reps-1 per doc and deterministic") {
    val df = q("x49_epoch_mix")
    val perDoc = df.groupBy("doc_id")
      .agg(count(lit(1)).as("n"), min(col("copy")).as("lo"), max(col("copy")).as("hi"))
    assert(perDoc.filter(col("lo") =!= 0L || col("hi") =!= col("n") - 1).count() === 0L,
      "copy indexes must be dense from 0")
    // same inputs -> identical epoch (no RNG anywhere)
    val again = q("x49_epoch_mix")
    assert(df.exceptAll(again).count() === 0L && again.exceptAll(df).count() === 0L)
  }

  test("a different salt repeats different fractional picks, same integer floor") {
    import spark.implicits._
    val docs = graft.tables.Tables.documents(spark, sf)
      .select(col("doc_id"), col("source"), col("text"))
    val f = lit(500L) + lit(250L) * pmod(substring(col("source"), 4, 8).cast("long"), lit(7L))
    val e1 = TextOps.epochMix(docs, "text", f, salt = "ep1")
      .groupBy("doc_id").agg(count(lit(1)).as("n1"))
    val e2 = TextOps.epochMix(docs, "text", f, salt = "ep2")
      .groupBy("doc_id").agg(count(lit(1)).as("n2"))
    val joined = e1.join(e2, Seq("doc_id"), "full_outer")
      .select(coalesce(col("n1"), lit(0L)).as("n1"), coalesce(col("n2"), lit(0L)).as("n2"))
      .as[(Long, Long)].collect()
    // fractional picks differ by at most 1 repeat per doc
    assert(joined.forall { case (a, b) => math.abs(a - b) <= 1 })
    assert(joined.exists { case (a, b) => a != b },
      "different salts must disagree on some fractional pick")
  }

  // ---- X51 token-budget selection ----

  test("budget select: spends at most the budget, leaves no affordable better doc") {
    import spark.implicits._
    val docs = graft.tables.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text"))
    val totalTok = docs
      .select(size(TextOps.tokens(col("text"))).cast("bigint").as("n"))
      .agg(sum("n")).head().getLong(0)
    val budget = totalTok * 2 / 5
    val sel = q("x51_token_budget_select")
    val spent = sel.agg(sum("n_tok")).head().getLong(0)
    assert(spent <= budget, s"spent $spent over budget $budget")
    // greedy-by-level exactness: every rejected doc is of strictly lower
    // quality than every selected one, except ties at the boundary level
    val qMin = sel.agg(min("q")).head().getLong(0)
    val rejected = docs.join(sel.select("doc_id"), Seq("doc_id"), "left_anti")
      .select(graft.util.Expr.bind(lower(col("text")), t =>
        (length(regexp_replace(t, "[^a-z]", "")) * lit(1000L) /
          greatest(length(t), lit(1))).cast("long")).as("q"))
    assert(rejected.filter(col("q") > qMin).count() === 0L,
      "a higher-quality doc was rejected while lower-quality docs were kept")
    // the boundary prefix fills the budget tightly: the next boundary doc
    // would not have fit
    val maxTok = docs.select(size(TextOps.tokens(col("text"))).cast("bigint").as("n"))
      .agg(max("n")).head().getLong(0)
    assert(spent > budget - maxTok, s"budget underfilled: $spent of $budget")
    assert(sel.count() > 0 && sel.count() < docs.count(),
      "fixture must select a proper subset")
  }

  // ---- X50 training shuffle ----

  test("training shuffle: every doc exactly once, dense per-shard positions") {
    val df = q("x50_training_shuffle")
    val n = graft.tables.Tables.documents(spark, sf).count()
    assert(df.count() === n)
    assert(df.select("doc_id").distinct().count() === n)
    val shards = df.groupBy("shard")
      .agg(count(lit(1)).as("n"), min(col("pos")).as("lo"), max(col("pos")).as("hi"))
    assert(shards.filter(col("lo") =!= 1L || col("hi") =!= col("n")).count() === 0L,
      "positions must be dense 1..n within each shard")
    // 500 docs over 32 shards: no empty shard and no shard hoarding
    assert(shards.count() === 32L)
    assert(shards.filter(col("n") > 4L * n / 32L).count() === 0L, "shard skew")
  }

  test("training shuffle separates exact-duplicate texts across the order") {
    import spark.implicits._
    val dupes = Seq((1L, "same text"), (2L, "same text"), (3L, "same text"))
      .toDF("doc_id", "text")
    val h = TextOps.rollingHash(concat(
      lit("shuf1:"), col("text"), lit(":"), col("doc_id").cast("string")))
    val hs = dupes.select(h).as[Long].collect()
    assert(hs.distinct.length === 3, "id-salted hash must split identical texts")
  }
}
