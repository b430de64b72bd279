package graft.text

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Ranked-retrieval properties: the BM25 twin has no DuckDB oracle (ln()
  * ulp parity across engines is not a contract worth betting a hash on),
  * so its ranking semantics are pinned here on planted corpora, and the
  * plan shape (one data shuffle + true top-k) is pinned for both scorers.
  */
class SearchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def corpus(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")

  test("bm25: higher tf of the same term ranks higher") {
    val docs = corpus(
      1L -> "join join join noise words here",
      2L -> "join noise words here pad pad",
      3L -> "nothing relevant at all pad pad")
    val top = Search.bm25TopK(docs, Seq("join"), 10).collect()
    assert(top.map(_.getLong(0)).toSeq == Seq(1L, 2L),
      "tf monotonicity broken (and non-matching docs must not appear)")
    assert(top(0).getDouble(1) > top(1).getDouble(1))
  }

  test("bm25: rare term outweighs common term at equal tf and length") {
    val docs = corpus(
      1L -> "common rare pad1 pad2",
      2L -> "common other pad1 pad2",
      3L -> "common other2 pad1 pad2",
      4L -> "common other3 pad1 pad2")
    // doc 1 matches both; docs 2-4 match only 'common' (df=4 vs df=1)
    val top = Search.bm25TopK(docs, Seq("common", "rare"), 10).collect()
    assert(top.head.getLong(0) == 1L, "rare-term doc should rank first")
  }

  test("bm25: length normalization — same tf in a shorter doc scores higher") {
    val docs = corpus(
      1L -> "join pad",
      2L -> ("join " + Seq.fill(40)("pad").mkString(" ")),
      3L -> "unrelated text entirely pad")
    val top = Search.bm25TopK(docs, Seq("join"), 10).collect()
    assert(top.map(_.getLong(0)).toSeq == Seq(1L, 2L))
  }

  test("tfidf surrogate agrees with bm25 on single-term ranking") {
    val docs = corpus(
      1L -> "join join join a b c",
      2L -> "join join a b c d",
      3L -> "join a b c d e",
      4L -> "no match here at all x")
    val ids = Search.tfidfTopK(docs, Seq("join"), 10).collect().map(_.getLong(0)).toSeq
    assert(ids == Seq(1L, 2L, 3L))
  }

  test("tfidf: AQE reuses the tf shuffle; corpus scanned+shuffled once; true top-k") {
    // The tf frame feeds both the scoring rows and the document-frequency
    // aggregate; statically that is two identical corpus-scan+shuffle
    // subtrees, and the pin is that AQE materializes the doc-keyed shuffle
    // ONCE and the df branch consumes a ReusedExchange.
    val docs = graft.tables.Tables.documents(spark, "/root/testdata/sf0.001")
      .select($"doc_id", $"text")
    val df = Search.tfidfTopK(docs, Search.DefaultTerms, 20)
    df.collect()
    val finalPlan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(finalPlan.contains("TakeOrderedAndProject"), "ranking is not a bounded top-k")
    val materialized = finalPlan.linesIterator
      .count(l => l.contains("Exchange hashpartitioning") && !l.contains("ReusedExchange"))
    assert(materialized <= 1, s"expected 1 materialized doc-keyed shuffle, saw $materialized")
    assert(finalPlan.contains("ReusedExchange"),
      "df branch re-scans the corpus instead of reusing the tf shuffle")
  }

  test("bm25: checkpointed tf frame — the query itself re-shuffles nothing") {
    // bm25's scoring branch keeps dl while the df branch prunes it, so AQE
    // stage reuse can't apply (the subtrees canonicalize differently); the
    // implementation materializes the tiny pivoted frame once instead.
    // Pin: the ranking query reads the materialized frame — zero
    // hash-partitioned exchanges (the one corpus shuffle happened inside
    // the checkpoint) — and ranks via a bounded top-k.
    val docs = graft.tables.Tables.documents(spark, "/root/testdata/sf0.001")
      .select($"doc_id", $"text")
    val df = Search.bm25TopK(docs, Search.DefaultTerms, 20)
    df.collect()
    val finalPlan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(finalPlan.contains("TakeOrderedAndProject"), "ranking is not a bounded top-k")
    val materialized = finalPlan.linesIterator
      .count(l => l.contains("Exchange hashpartitioning") && !l.contains("ReusedExchange"))
    assert(materialized == 0,
      s"expected the checkpointed tf frame to feed both branches, saw $materialized shuffles")
  }

  test("deterministic tie cut: equal scores break by doc_id ascending") {
    val docs = corpus(
      5L -> "join pad pad",
      3L -> "join pad pad",
      9L -> "join pad pad",
      1L -> "other text pad")
    val ids = Search.tfidfTopK(docs, Seq("join"), 2).collect().map(_.getLong(0)).toSeq
    assert(ids == Seq(3L, 5L))
  }
}
