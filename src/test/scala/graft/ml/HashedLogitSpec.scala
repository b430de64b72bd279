package graft.ml

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, TestSpark}
import graft.tables.Tables
import graft.text.TextOps
import graft.util.{ArtifactStore, SessionCache}

class HashedLogitSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.Sf0001

  test("the fitted classifier actually learns the teacher (accuracy >= 0.95)") {
    val docs = Tables.documents(spark, sf).select(col("doc_id"), col("text"))
    val w = HashedLogit.fit(docs, "doc_id", "text",
      buckets = 1024, thresh = 60, rounds = 20, etaDen = 20000L, biasCnt = 10L)
    assert(w.length === 1025)
    assert(w(1024) < 0, "bias must be negative (boundary is n_tok >= 60, not >= 0)")
    val scored = SparkEntry.queries("x36b_trained_classifier")(spark, sf)
      .join(docs.select(col("doc_id"),
        (size(TextOps.tokens(col("text"))) >= 60).as("truth")), "doc_id")
    val total = scored.count()
    val right = scored.filter((col("score") > 0) === col("truth")).count()
    assert(total > 0)
    assert(right.toDouble / total >= 0.95,
      s"training accuracy ${right.toDouble / total} below 0.95 ($right/$total)")
  }

  test("zero-weight baseline is beaten (the fit moved the boundary)") {
    val docs = Tables.documents(spark, sf).select(col("doc_id"), col("text"))
    val truth = docs.select(col("doc_id"),
      (size(TextOps.tokens(col("text"))) >= 60).as("truth"))
    val n = truth.count()
    val basePos = truth.filter(col("truth")).count()
    val baseline = math.max(basePos, n - basePos).toDouble / n
    val scored = SparkEntry.queries("x36b_trained_classifier")(spark, sf)
      .join(truth, "doc_id")
    val acc = scored.filter((col("score") > 0) === col("truth")).count().toDouble / n
    assert(acc > baseline,
      s"fit accuracy $acc does not beat the majority-class baseline $baseline")
  }

  test("weights persist as an artifact: fresh session loads, no refit") {
    val docs = Tables.documents(spark, sf).select(col("doc_id"), col("text"))
    val key = Seq(s"mlspec-${System.nanoTime()}")
    val fitsBefore = ArtifactStore.fits
    val w1 = HashedLogit.ensureWeights(spark, docs, "doc_id", "text",
      256, 60, 3, 20000L, 10L, key)
    assert(ArtifactStore.fits === fitsBefore + 1)
    SessionCache.clear() // "fresh JVM": only the parquet artifact remains
    val loadsBefore = ArtifactStore.loads
    val w2 = HashedLogit.ensureWeights(spark, docs, "doc_id", "text",
      256, 60, 3, 20000L, 10L, key)
    assert(ArtifactStore.fits === fitsBefore + 1, "reload refit instead of loading")
    assert(ArtifactStore.loads === loadsBefore + 1)
    assert(w1.toSeq === w2.toSeq, "loaded weights differ from fitted weights")
  }

  test("training is deterministic: two independent fits agree bit-for-bit") {
    val docs = Tables.documents(spark, sf).select(col("doc_id"), col("text"))
      .repartition(7) // different partitioning must not change the weights
    val a = HashedLogit.fit(docs, "doc_id", "text", 256, 60, 3, 20000L, 10L)
    val b = HashedLogit.fit(docs.repartition(3), "doc_id", "text",
      256, 60, 3, 20000L, 10L)
    assert(a.toSeq === b.toSeq)
  }

  test("empty-token docs score exactly the bias term") {
    import spark.implicits._
    val docs = Seq((1L, "some real tokens here extra words to pass along"),
      (2L, "   ")).toDF("doc_id", "text")
    val w = Array.fill(17)(0L); w(16) = -5L
    import org.apache.spark.sql.graft.ColumnBridge.{column => ccol, expression => cexp}
    val scored = docs.select(col("doc_id"),
      ccol(graft.expressions.HashedBagWeightedScore(
        cexp(TextOps.tokens(col("text"))), w, 10L)).as("score"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(scored(2L) === -50L, "blank doc must score biasCnt * w_bias")
    assert(scored(1L) === -50L, "zero token weights leave only the bias")
  }
}
