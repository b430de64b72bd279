package graft.sim

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.util.{ArtifactStore, SessionCache}

class PqSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def emb = spark.read.parquet(s"$sf/embeddings.parquet")
    .select(col("vec_id"), expr("CAST(embedding AS array<double>)").as("emb"))

  private lazy val cb = Pq.fit(emb, m = 8, k = 16, iters = 2)

  test("fit: codebook shape and finite centroids") {
    assert(cb.m === 8 && cb.k === 16 && cb.subDim === 8)
    assert(cb.tables.length === 8)
    assert(cb.tables.forall(_.length === 16))
    assert(cb.tables.forall(_.forall(c =>
      c.length === 8 && c.forall(x => !x.isNaN && !x.isInfinite))))
  }

  test("encode: one 1-based code per subspace, deterministic") {
    val codes = Pq.encode(emb, cb)
    val r = codes.orderBy(col("vec_id")).limit(5).collect()
    r.foreach { row =>
      val cs = row.getSeq[Long](1)
      assert(cs.length === 8)
      assert(cs.forall(c => c >= 1 && c <= 16))
    }
    val again = Pq.encode(emb, cb).orderBy(col("vec_id")).limit(5).collect()
    assert(r.map(_.toString).toSeq === again.map(_.toString).toSeq)
  }

  test("ADC + exact re-rank recovers most of the brute-force top-10") {
    val queries = emb.filter(col("vec_id") < 5)
    val got = Pq.topK(emb, queries, cb, k = 10, rerank = 60)
      .select("q_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val truth = SimSearch.bruteForceTopK(emb, queries, 10)
      .select("q_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (got intersect truth).size.toDouble / truth.size
    assert(recall >= 0.6, s"PQ recall@10 too low: $recall")
    // exact re-rank: every emitted sim is the true cosine (spot check one)
    val one = Pq.topK(emb, queries, cb, k = 1, rerank = 60)
      .filter(col("q_id") === 0).select("vec_id", "sim").head()
    val truthSim = emb.filter(col("vec_id") === 0).select(col("emb").as("__q"))
      .crossJoin(emb.filter(col("vec_id") === one.getLong(0))
        .select(col("emb").as("__v")))
      .select(SimSearch.cosine(col("__q"), col("__v"))).head().getDouble(0)
    assert(math.abs(one.getDouble(1) - truthSim) < 1e-12)
  }

  test("codebooks persist as an ArtifactStore index table: fresh session loads, no refit") {
    val key = s"pqspec-${System.nanoTime()}"
    val fitsBefore = ArtifactStore.fits
    Pq.ensureCodebooks(spark, emb, key, 8, 16, 1)
    assert(ArtifactStore.fits === fitsBefore + 1)
    SessionCache.clear()
    val loadsBefore = ArtifactStore.loads
    val reloaded = Pq.ensureCodebooks(spark, emb, key, 8, 16, 1)
    assert(ArtifactStore.fits === fitsBefore + 1, "second use refit instead of loading")
    assert(ArtifactStore.loads === loadsBefore + 1)
    assert(reloaded.tables.length === 8 && reloaded.subDim === 8)
  }
}
