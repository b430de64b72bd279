package graft.sim

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.tables.Tables

/** The IVF maintenance contract: a frozen quantizer makes an APPENDED
  * index bit-identical to a full rebuild over the grown corpus, so
  * incremental ingest never degrades search (beyond the quantizer's own
  * staleness, which is a versioned-rebuild decision, not an append).
  */
class VectorIndexSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.Sf0001

  private def emb() = Tables.embeddings(spark, sf)
    .select(col("vec_id"), SimSearch.castD(col("embedding")).as("emb"))

  test("append == rebuild: postings and query results match exactly") {
    val all = emb()
    val first = all.filter(col("vec_id") % 2 === 0)
    val second = all.filter(col("vec_id") % 2 =!= 0)
    val cents = SimSearch.fitCentroids(all, 8, iters = 2)
    val key = Seq("vindexspec", java.util.UUID.randomUUID().toString)

    // build on the first half, append the second
    VectorIndex.ensureIndex(spark, first, key, cents)
    VectorIndex.appendToIndex(spark, second, key, cents)
    val appended = VectorIndex.ensureIndex(spark, all, key, cents)

    // a from-scratch rebuild over the grown corpus
    val rebuilt = VectorIndex.postings(all, cents)
    val a = appended.select("cell", "vec_id").collect()
      .map(r => (r.getInt(0), r.getLong(1))).toSet
    val b = rebuilt.select("cell", "vec_id").collect()
      .map(r => (r.getInt(0), r.getLong(1))).toSet
    assert(a === b, s"appended != rebuilt: only-a=${(a -- b).take(5)} " +
      s"only-b=${(b -- a).take(5)}")

    // queries against the appended index == ivfTopK over the full corpus
    val queries = all.filter(col("vec_id") < 20)
    val viaIndex = VectorIndex.queryTopK(appended, queries, 5, cents, nProbe = 2)
      .select("q_id", "vec_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val direct = SimSearch.ivfTopK(all, queries, 5, cents, nProbe = 2)
      .select("q_id", "vec_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(viaIndex === direct,
      s"index/direct diverge: only-idx=${(viaIndex -- direct).take(5)} " +
        s"only-direct=${(direct -- viaIndex).take(5)}")
  }

  test("x59 entry equals the direct x4_ivf_topk entry row-for-row") {
    def rows(name: String) =
      graft.SparkEntry.queries(name)(spark, sf).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
        .toSet
    assert(rows("x59_vector_index_topk") === rows("x4_ivf_topk"))
  }

  test("append requires a built index; invalidate clears it") {
    val key = Seq("vindexspec_inv", java.util.UUID.randomUUID().toString)
    val cents = SimSearch.fitCentroids(emb(), 4, iters = 1)
    intercept[IllegalArgumentException] {
      VectorIndex.appendToIndex(spark, emb(), key, cents)
    }
    VectorIndex.ensureIndex(spark, emb(), key, cents)
    VectorIndex.invalidate(spark, key)
    assert(!new java.io.File(
      graft.util.ArtifactStore.artifactDir(spark, "vector_index", key),
      "_SUCCESS").exists())
  }
}
