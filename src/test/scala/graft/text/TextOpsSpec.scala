package graft.text

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class TextOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("tokens: empty and whitespace-only text yield zero tokens") {
    val df = Seq("", "   ", "a b", " a  b ").toDF("text")
    val out = df.select(size(TextOps.tokens(col("text")))).collect().map(_.getInt(0))
    assert(out.toSeq === Seq(0, 0, 2, 2))
  }

  test("shingles: 3-grams of n tokens = n-2 shingles; short docs empty") {
    val df = Seq("a b c d e", "a b", "").toDF("text")
    val out = df.select(TextOps.shingles(TextOps.tokens(col("text")), 3))
      .collect().map(_.getSeq[String](0))
    assert(out(0) === Seq("a b c", "b c d", "c d e"))
    assert(out(1).isEmpty && out(2).isEmpty)
  }

  test("jaccard: exact distinct-set semantics") {
    val df = Seq((Seq("a", "b", "c"), Seq("b", "c", "d"))).toDF("x", "y")
    assert(df.select(TextOps.jaccard(col("x"), col("y"))).head().getDouble(0) === 0.5)
  }

  test("chunkDocs: stride windows cover every token with the declared overlap") {
    // 10 tokens, chunk 4 / stride 3 → starts 0,3,6,9; sizes 4,4,4,1
    val df = Seq((1L, (1 to 10).map(i => s"t$i").mkString(" ")), (2L, ""))
      .toDF("doc_id", "text")
    val out = TextOps.chunkDocs(df, "doc_id", "text", chunkTokens = 4, stride = 3)
      .orderBy("doc_id", "chunk_idx")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(out.toSeq === Seq(
      (1L, 0L, 4L, "t1 t2 t3 t4"),
      (1L, 1L, 4L, "t4 t5 t6 t7"),
      (1L, 2L, 4L, "t7 t8 t9 t10"),
      (1L, 3L, 1L, "t10")))
    // empty document yields no chunks, and every token appears in a chunk
    assert(!out.exists(_._1 == 2L))
  }

  test("dupTokenFrac and topBigramFrac: exact ratios, empty-doc zeroes") {
    val df = Seq("a a b", "a b a b a", "a", "").toDF("text")
    val out = df.select(
      TextOps.dupTokenFrac(TextOps.tokens(col("text"))).as("d"),
      TextOps.topBigramFrac(TextOps.tokens(col("text"))).as("b"))
      .collect().map(r => (r.getDouble(0), r.getDouble(1)))
    assert(out(0) === ((1.0 / 3.0, 1.0 / 2.0)))  // bigrams: "a a","a b" → top 1/2
    assert(out(1) === ((3.0 / 5.0, 2.0 / 4.0)))  // "a b"×2,"b a"×2 → top 2/4
    assert(out(2) === ((0.0, 0.0)))              // single token: no dups, no bigrams
    assert(out(3) === ((0.0, 0.0)))
  }

  test("native repetitionStats kernel equals the HOF definitions on the fixture") {
    val docs = graft.tables.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("text"))
      .unionByName(Seq((9001L, ""), (9002L, "solo"), (9003L, "x x x x x"))
        .toDF("doc_id", "text"))
    val both = docs.select(col("doc_id"),
      TextOps.repetitionStats(TextOps.tokens(col("text"))).as("__st"),
      TextOps.dupTokenFrac(TextOps.tokens(col("text"))).as("d2"),
      TextOps.topBigramFrac(TextOps.tokens(col("text"))).as("b2"))
      .select(col("doc_id"), col("__st.dup_frac").as("d1"), col("d2"),
        col("__st.top_bigram_frac").as("b1"), col("b2"))
      .collect()
    both.foreach { r =>
      assert(r.getDouble(1) === r.getDouble(2), s"dup_frac diverges at ${r.getLong(0)}")
      assert(r.getDouble(3) === r.getDouble(4), s"top_bigram diverges at ${r.getLong(0)}")
    }
    assert(both.length > 500)
  }

  test("nearDupPairs finds a planted near-duplicate and nothing else") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again today"),
      (2L, "the quick brown fox jumps over the lazy dog again and again today ok"),
      (3L, "completely different words about spark catalyst optimizer plans here now")
    ).toDF("doc_id", "text")
    val pairs = TextOps.nearDupPairs(docs, 0.5)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSeq === Seq((1L, 2L)))
  }

  test("nearDupPairs is deterministic across runs") {
    val docs = Seq.tabulate(30)(i =>
      (i.toLong, s"token$i shared words across documents number $i with padding tokens here"))
      .toDF("doc_id", "text")
    val a = TextOps.nearDupPairs(docs, 0.3).collect().toSet
    val b = TextOps.nearDupPairs(docs, 0.3).collect().toSet
    assert(a === b)
  }

  test("connected-component dedup: chain A~B~C keeps exactly A") {
    // 8-token base: J(A,B) = 6/7, J(B,C) = 7/8 clear 0.8; J(A,C) = 6/8
    // does not — a true chain. The middle vertex B carries the LARGEST id,
    // the topology where pair-based min-id-survivor (keeps A and C) and
    // connected components (keeps only A) disagree.
    val base = "one two three four five six seven eight"
    val docs = Seq(
      (1L, base), // A
      (3L, base + " qq"), // B (middle, largest id)
      (2L, base + " qq rr"), // C
      (9L, "totally unrelated content about catalyst plans and shuffles")
    ).toDF("doc_id", "text")
    val cc = TextOps.dedupCorpusConnected(docs, 0.8)
      .select("doc_id").as[Long].collect().toSet
    assert(cc === Set(1L, 9L), "one survivor per cluster")
    val pairBased = TextOps.dedupCorpus(docs, 0.8)
      .select("doc_id").as[Long].collect().toSet
    assert(pairBased === Set(1L, 2L, 9L), "pair-based keeps the chain end")
  }

  test("minLabelComponents: multi-cluster fixpoint labels") {
    val pairs = Seq((5L, 2L), (2L, 7L), (7L, 6L), (10L, 11L)).toDF("id_a", "id_b")
    val labels = TextOps.minLabelComponents(pairs)
      .as[(Long, Long)].collect().toMap
    assert(labels === Map(2L -> 2L, 5L -> 2L, 6L -> 2L, 7L -> 2L,
      10L -> 10L, 11L -> 10L))
  }

  test("minLabelComponents: deep chains converge; hitting the cap THROWS") {
    // a 20-hop path — deeper than the old silent 10-round cap that cost
    // x35 one wrong survivor on a regenerated sf0.001 fixture (diameter
    // 16); the default cap must converge it exactly
    val chain = (1L until 21L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val labels = TextOps.minLabelComponents(chain)
      .as[(Long, Long)].collect().toMap
    assert(labels.values.toSet === Set(1L), "whole chain labels to its min")
    // and an insufficient cap must be an ERROR, never silently-wrong labels
    val e = intercept[IllegalStateException] {
      TextOps.minLabelComponents(chain, maxIters = 3).collect()
    }
    assert(e.getMessage.contains("did not converge"))
  }

  test("langId picks the dominant stopword language, und when none") {
    val df = Seq(
      "the cat is in the hat", // en
      "el gato es un gato", // es
      "der hund und die katze", // de
      "zzz qqq www" // none
    ).toDF("text")
    val out = df.select(TextOps.langId(TextOps.tokens(col("text"))))
      .collect().map(_.getString(0))
    assert(out.toSeq === Seq("en", "es", "de", "und"))
  }

  test("qualityScore in [0,1], 0 for empty") {
    val df = Seq("", "the of and to in a good plain sentence here", "!!!! ????")
      .toDF("text")
    val out = df.select(TextOps.qualityScore(col("text"), TextOps.tokens(col("text"))))
      .collect().map(_.getDouble(0))
    assert(out(0) === 0.0)
    assert(out.forall(v => v >= 0.0 && v <= 1.0))
    assert(out(1) > out(2), "stopword-rich prose must outscore punctuation soup")
  }

  test("bpeTokenCount charges ceil(len/4) per piece") {
    // "abcdefgh ok!" → pieces: abcdefgh(2) + ok(1) + !(1) = 4
    val df = Seq("abcdefgh ok!").toDF("text")
    assert(df.select(TextOps.bpeTokenCount(col("text"))).head().getLong(0) === 4L)
  }

  test("rollingHash matches hand-computed polynomial value") {
    // "abc" → ((97*31)+98)*31+99 = 96354
    val df = Seq("abc").toDF("s")
    assert(df.select(expr(TextOps.rollingHashExpr("s"))).head().getLong(0) === 96354L)
    assert(df.select(TextOps.rollingHash(col("s"))).head().getLong(0) === 96354L)
  }

  test("saltedDraw is near-uniform on short sequential ids; raw hash is not") {
    // the defect saltedDraw exists to fix (x53's first cut kept 8 of 193
    // 'en' docs at keep_pm=367): pmod(rollingHash, 1000) over short
    // sequential keys lands in a narrow band. Pin BOTH facts so a future
    // 'simplification' back to the raw form fails loudly.
    val ids = (0L until 5000L).toDF("id").select(col("id").cast("string").as("s"))
    val draws = ids.select(TextOps.saltedDraw(col("s"), "x53", 1000L).as("d"))
    val deciles = draws.groupBy((col("d") / 100).cast("int").as("dec"))
      .count().collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(deciles.keySet === (0 to 9).toSet, s"missing deciles: $deciles")
    deciles.values.foreach(c => assert(math.abs(c - 500L) <= 120L,
      s"decile skew: $deciles"))
    // bounds check: every draw in [0, 1000)
    val mm = draws.agg(min("d"), max("d")).head()
    assert(mm.getLong(0) >= 0L && mm.getLong(1) < 1000L)
    // the RAW hash mod 1000 at fixture id-scale (500 sequential ids, the
    // x53 regression's shape) misses whole deciles entirely
    val rawDeciles = (0L until 500L).toDF("id")
      .select(pmod(TextOps.rollingHash(
        concat(lit("x53:"), col("id").cast("string"))), lit(1000L)).as("d"))
      .groupBy((col("d") / 100).cast("int")).count().count()
    assert(rawDeciles < 10, "raw hash became uniform — revisit the finalizer note")
  }

  test("native allShingles equals the non-distinct expression chain, order and multiplicity") {
    val docs = graft.tables.Tables.documents(spark, graft.TestSpark.Sf0001)
      .limit(200)
      .select(col("text"),
        TextOps.allShingles(col("text"), 3).as("native"),
        TextOps.shingles(TextOps.tokens(col("text")), 3).as("chain"))
      .unionByName(Seq("", "   ", "a b", "x y z x y z x y z", "\tA  B\tc ")
        .toDF("text").select(col("text"),
          TextOps.allShingles(col("text"), 3).as("native"),
          TextOps.shingles(TextOps.tokens(col("text")), 3).as("chain")))
    assert(docs.filter(col("native") =!= col("chain")).count() === 0)
  }

  test("native distinctShingles equals the expression chain on the fixture") {
    val docs = graft.tables.Tables.documents(spark, graft.TestSpark.Sf0001)
      .limit(200)
      .select(col("text"),
        TextOps.distinctShingles(col("text"), 3).as("native"),
        array_distinct(TextOps.shingles(TextOps.tokens(col("text")), 3)).as("chain"))
    assert(docs.filter(col("native") =!= col("chain")).count() === 0)
    // edge cases: empty, whitespace-only, short, repeated shingles
    val edge = Seq("", "   ", "a b", "x y z x y z x y z", "\tA  B\tc ")
      .toDF("text")
      .select(
        TextOps.distinctShingles(col("text"), 3).as("native"),
        array_distinct(TextOps.shingles(TextOps.tokens(col("text")), 3)).as("chain"))
    assert(edge.filter(col("native") =!= col("chain")).count() === 0)
  }

  test("native rollingHash and simhash equal their SQL-fold twins") {
    val docs = graft.tables.Tables.documents(spark, graft.TestSpark.Sf0001)
      .limit(100)
      .withColumn("__sh", TextOps.shingles(TextOps.tokens(col("text")), 3))
    val rh = docs.select(
      TextOps.rollingHash(col("text")).as("native"),
      expr(TextOps.rollingHashExpr("text")).as("folds"))
    assert(rh.filter(col("native") =!= col("folds")).count() === 0)
    val sh = docs.select(
      TextOps.simhash("__sh").as("native"),
      TextOps.simhashFolds("__sh").as("folds"))
    assert(sh.filter(col("native") =!= col("folds")).count() === 0)
  }

  test("minLabelComponents unpersists intermediate round state (VERDICT r3 #2)") {
    // a 5-vertex chain forces ~5 propagation rounds; each previously left
    // its checkpoint blocks to the ContextCleaner (the source of the
    // 2-4x bench spread). After the run, at most the FINAL labels
    // checkpoint may remain registered -- every per-round intermediate
    // and the edges cache must be unregistered.
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.keySet
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (10L, 11L))
      .toDF("id_a", "id_b")
    val labels = TextOps.minLabelComponents(pairs, maxIters = 10)
    val out = labels.select("id", "label").as[(Long, Long)].collect().toMap
    assert(out(5L) === 1L && out(11L) === 10L, s"wrong labels: $out")
    val leaked = sc.getPersistentRDDs.keySet -- before
    assert(leaked.size <= 1,
      s"leaked ${leaked.size} persisted RDDs (expected <= 1, the final labels)")
  }
}
