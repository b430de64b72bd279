package graft.ml

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Semantics pins for the BPE trainer (x52/x52b) — the properties the
  * DuckDB oracle proves by agreement but cannot NAME: greedy
  * non-overlapping merge application, the combined-pair-string tie-break,
  * vocabulary-only loop cost, and artifact provenance (bench repetitions
  * load the merge table, never refit).
  */
class BpeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("merge application is greedy left-to-right, non-overlapping") {
    import spark.implicits._
    // 'aaa' -> |a|a|a| : the first match consumes '|a|a|' INCLUDING the
    // shared trailing pipe, so the next occurrence has no leading pipe
    // and survives the round -> |aa|a|. Likewise 'aaaa' -> |aa|a|a| (the
    // second pair merges in a LATER round, not this one). Run-adjacent
    // occurrences merging alternately is the delimiter-sharing semantics
    // both engines implement identically; never |aaa|... (no re-matching
    // inside a replacement).
    val df = Seq("aaaa", "aaa", "abab", "abcab").toDF("word")
      .select(col("word"), Bpe.applyMerges(Bpe.charSeq(col("word")),
        Seq(Bpe.Merge(1, "a|b", "ab", 0L), Bpe.Merge(2, "a|a", "aa", 0L))).as("seq"))
    val m = df.collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(m("aaaa") === "|aa|a|a|")
    assert(m("aaa") === "|aa|a|")
    // immediately-consecutive occurrences also share a pipe (tilings)
    assert(m("abab") === "|ab|a|b|")
    // occurrences separated by >= 1 other symbol all merge in one round
    assert(m("abcab") === "|ab|c|ab|")
  }

  test("argmax tie-break is the combined pair string, ascending") {
    import spark.implicits._
    // The comparator is the combined "l|r" STRING asc (both engines),
    // not (l, r) component-wise: '|' (0x7C) sorts after every letter, so
    // "ab|x" < "a|y" under the combined order while (l asc) would say
    // "a" < "ab". Pin the ordering fact the oracle relies on, then a
    // concrete tied fit.
    assert(("ab|x" < "a|y") && ("a" < "ab"))
    val words = Seq(("xbc", 2L), ("ybc", 1L), ("zbd", 3L)).toDF("word", "cnt")
    val merges = Bpe.fit(words, 1)
    // pair counts: b|c = 3 (xbc·2 + ybc·1), b|d = 3, z|b = 3 — a
    // three-way tie at 3 → "b|c" wins (string asc).
    assert(merges.head.pair === "b|c")
    assert(merges.head.cnt === 3L)
  }

  test("learned merges reproduce the corpus' dominant digraph and persist") {
    val docs = graft.tables.Tables.documents(spark, TestSpark.Sf0001)
    val words = Bpe.wordCounts(docs, "text")
    // unique key per run: the provenance assertions below need the fit to
    // actually happen (a stamp-keyed artifact would survive from a
    // previous test JVM on disk)
    val key = Seq("bpespec", java.util.UUID.randomUUID().toString,
      TestSpark.Sf0001)
    val fits0 = graft.util.ArtifactStore.fits
    val m1 = Bpe.ensureMerges(spark, words, 4, key)
    assert(m1.size === 4)
    assert(graft.util.ArtifactStore.fits === fits0 + 1)
    // monotone: a merged symbol is at least 2 chars; counts positive
    m1.foreach { m =>
      assert(m.merged.length >= 2)
      assert(m.cnt > 0L)
      assert(m.pair === m.pair.toLowerCase)
    }
    // second call (same key): served from cache/artifact, no refit
    val m2 = Bpe.ensureMerges(spark, words, 4, key)
    assert(m2 === m1)
    assert(graft.util.ArtifactStore.fits === fits0 + 1)
  }

  test("x52b per-word compute joins back broadcast; counts are consistent") {
    val out = graft.SparkEntry.queries("x52b_bpe_tokenize")(spark, TestSpark.Sf0001)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"vocabulary join must broadcast:\n$plan")
    // BPE only ever merges: per-doc sub-token count is <= the alpha char
    // count and >= the alpha word count.
    val docs = graft.tables.Tables.documents(spark, TestSpark.Sf0001)
    val words = docs
      .where(length(trim(col("text"))) > 0)
      .select(col("doc_id"),
        explode(split(trim(lower(col("text"))), "\\s+")).as("word"))
      .where(col("word").rlike("^[a-z]+$"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("nw"), sum(length(col("word"))).as("nc"))
    val joined = out.join(words, Seq("doc_id"), "left")
      .select(col("n_bpe_tokens"),
        coalesce(col("nw"), lit(0L)).as("nw"),
        coalesce(col("nc"), lit(0L)).as("nc"))
      .collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val (n, nw, nc) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(n >= nw && n <= nc, s"token count $n outside [$nw, $nc]")
    }
  }
}
