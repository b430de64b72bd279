package graft.sim

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.tables.Tables
import graft.util.{ArtifactStore, SessionCache}

/** SemDeDup (embedding-space near-dup dedup) invariants the SQL oracle
  * cannot express: the clustered (approximate-by-design) path's relation
  * to the exact graph, and the centroid index artifact's lifecycle.
  */
class SemDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val Tau = 0.35

  private def emb = Tables.embeddings(spark, TestSpark.Sf0001)
    .select(col("vec_id"), SimSearch.castD(col("embedding")).as("emb"))

  private lazy val exactDropped: Set[Long] = {
    val pairs = SimSearch.allPairsCosinePairs(emb, Tau)
    val survivors = SimSearch.semDedupSurvivors(emb, pairs)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val all = emb.select("vec_id").collect().map(_.getLong(0)).toSet
    all -- survivors
  }

  private def clusteredDropped(k: Int, nProbe: Int = 1): Set[Long] = {
    val cents = SimSearch.fitCentroids(emb, k, iters = 3)
    val survivors = SimSearch.semDedupClustered(emb, Tau, cents, nProbe = nProbe)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val all = emb.select("vec_id").collect().map(_.getLong(0)).toSet
    all -- survivors
  }

  test("exact graph is non-trivial at the fixture (some pairs over tau)") {
    assert(exactDropped.nonEmpty,
      "fixture must contain semantic near-dup pairs for the suite to bite")
  }

  test("clustered drops are a SUBSET of exact drops (precision 1.0)") {
    // Every clustered drop comes from an exactly-verified within-cluster
    // pair, and min-label survivors of a SUBGRAPH can only drop vertices
    // the full graph also connects: no false drops, ever.
    val cl = clusteredDropped(8, nProbe = 2)
    assert(cl.subsetOf(exactDropped),
      s"clustered dropped ${cl -- exactDropped} that the exact graph keeps")
  }

  test("multi-probe recall is useful and improves on single-assignment") {
    val single = clusteredDropped(8, nProbe = 1)
    val multi = clusteredDropped(8, nProbe = 2)
    val recall = multi.size.toDouble / exactDropped.size
    assert(multi.size >= single.size,
      s"nProbe=2 found fewer drops (${multi.size}) than nProbe=1 (${single.size})")
    assert(recall >= 0.5, s"recall $recall < 0.5 (${multi.size}/${exactDropped.size})")
  }

  test("k=1 clustering degenerates to the exact answer") {
    // One cluster ⇒ the within-cluster graph IS the full graph.
    assert(clusteredDropped(1) === exactDropped)
  }

  test("centroid index artifact: second session loads, never refits") {
    val key = Seq("semdedup-spec-artifact", 8, 3)
    ArtifactStore.invalidate(spark, "semdedup_centroids", key)
    val fit0 = ArtifactStore.fits
    val c1 = ArtifactStore.getOrCompute(spark, "semdedup_centroids", key,
      ArtifactStore.CentroidsCodec) { SimSearch.fitCentroids(emb, 8, iters = 3) }
    assert(ArtifactStore.fits === fit0 + 1)
    // drop the memory layer only — the disk artifact must serve the reload
    SessionCache.invalidate(("artifact", "semdedup_centroids", key))
    val loads0 = ArtifactStore.loads
    val c2 = ArtifactStore.getOrCompute(spark, "semdedup_centroids", key,
      ArtifactStore.CentroidsCodec) {
      fail("refit ran despite persisted artifact"); Seq.empty
    }
    assert(ArtifactStore.loads === loads0 + 1 && c2 === c1)
    ArtifactStore.invalidate(spark, "semdedup_centroids", key)
  }
}
