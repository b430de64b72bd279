package graft.text

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class NgramLmSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def corpus = Seq(
    (1L, "a b c d"),        // trigrams: "a b c", "b c d"
    (2L, "a b c"),          // "a b c"
    (3L, "a b x"),          // "a b x"
    (4L, "zz")              // no trigrams
  ).toDF("doc_id", "text")

  test("train: trigram counts and prefix-context denominators") {
    val lm = NgramLm.train(corpus).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    // "a b" context continues 3 times: c,c,x → cnt2=3
    assert(lm("a b c") === ((2L, 3L)))
    assert(lm("a b x") === ((1L, 3L)))
    assert(lm("b c d") === ((1L, 1L)))
    assert(lm.size === 3)
  }

  test("score: fixed-point conditional sums; trigram-less docs get (0,0)") {
    val lm = NgramLm.train(corpus)
    val got = NgramLm.score(corpus, lm).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // p(a b c) = 2*1e6 div 3 = 666666; p(b c d) = 1e6; p(a b x) = 333333
    assert(got(1L) === ((666666L + 1000000L, 2L)))
    assert(got(2L) === ((666666L, 1L)))
    assert(got(3L) === ((333333L, 1L)))
    assert(got(4L) === ((0L, 0L)))
  }

  test("every conditional is a true probability: cnt3 <= cnt2, contexts sum to 1") {
    val docs = graft.tables.Tables.documents(spark, "/root/testdata/sf0.001")
    val lm = NgramLm.train(docs)
    assert(lm.filter(col("cnt3") > col("cnt2")).count() === 0)
    // per context, Σ cnt3 == cnt2 exactly
    val bad = lm.withColumn("p2", expr("substring_index(tri, ' ', 2)"))
      .groupBy("p2").agg(sum("cnt3").as("s"), first("cnt2").as("c"))
      .filter(col("s") =!= col("c")).count()
    assert(bad === 0)
  }

  test("minCount pruning keeps conditionals intact; pruned trigrams score as unseen") {
    val lmAll = NgramLm.train(corpus)
    val lmPruned = NgramLm.train(corpus, minCount = 2)
    // only "a b c" (cnt3=2) survives; its denominator is UNCHANGED (3)
    val kept = lmPruned.collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(kept === Map("a b c" -> ((2L, 3L))))
    // scores drop monotonically (unseen trigrams contribute 0)
    val sAll = NgramLm.score(corpus, lmAll).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val sPruned = NgramLm.score(corpus, lmPruned).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sPruned.forall { case (id, s) => s <= sAll(id) })
    assert(sPruned(2L) === 666666L && sPruned(3L) === 0L)
  }

  test("scoring plans hash joins, never a product") {
    val docs = graft.tables.Tables.documents(spark, "/root/testdata/sf0.001")
    val p = NgramLm.score(docs, NgramLm.train(docs))
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"ngram scoring degenerated to a product:\n$p")
  }
}
