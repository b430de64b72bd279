package graft.text

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Hot-bucket guard: the Σ B² candidate blowup from a boilerplate
  * mega-bucket must be convertible to a bounded cost without losing
  * organic near-dup pairs.
  */
class LshBucketCapSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // 200 near-identical "template" docs (same 12-token boilerplate, one
  // trailing serial token — J between any two ≈ 10/12 > 0.8 and every
  // band bucket is hot) + one organic near-dup pair + unrelated filler.
  private val template = "the quick brown fox jumps over the lazy dog again and again"
  private def corpus = {
    val boiler = (0 until 200).map(i => (i.toLong, s"$template v$i"))
    val organic = Seq(
      (1000L, "completely different content about spark catalyst planning here"),
      (1001L, "completely different content about spark catalyst planning here too"))
    val filler = (2000 until 2020).map(i =>
      (i.toLong, s"unrelated document number $i with its own words entirely distinct $i"))
    (boiler ++ organic ++ filler).toDF("doc_id", "text")
  }

  test("bucket stats expose the mega-bucket and its quadratic pair cost") {
    val hot = TextOps.lshBucketStats(corpus, minSize = 100)
      .collect()
    assert(hot.nonEmpty, "mega-bucket not surfaced")
    assert(hot.forall(_.getAs[Long]("pair_cost") >= 100L * 99 / 2))
  }

  test("cap removes the mega-clique's quadratic candidates, keeps organic pairs") {
    val capped = TextOps.nearDupPairs(corpus, 0.8, maxBucketSize = 50)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // the organic pair survives — none of ITS buckets is hot
    assert(capped.contains((1000L, 1001L)), s"organic pair lost: $capped")
    // the mega-clique's O(n²) pair list is gone
    assert(!capped.exists(p => p._1 < 200L && p._2 < 200L),
      "capped mega-bucket still produced clique pairs")

    // uncapped baseline: the clique explodes into thousands of pairs
    val uncapped = TextOps.nearDupPairs(corpus, 0.8)
      .filter(col("id_a") < 200 && col("id_b") < 200).count()
    assert(uncapped > 10000L,
      s"expected a quadratic clique pair list without the cap, got $uncapped")
  }

  test("fuzzy join cap bounds cross-bucket cost the same way") {
    val probe = corpus.filter(col("doc_id") === 1000L || col("doc_id") < 5)
      .select(col("doc_id").as("probe_id"), col("text"))
    val capped = TextOps.fuzzyJoin(probe, corpus, 0.8, maxBucketSize = 50)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // organic probe keeps its matches (itself + its near-dup)
    assert(capped.contains((1000L, 1001L)) && capped.contains((1000L, 1000L)),
      s"organic probe matches lost: $capped")
    // boilerplate probes keep their exact-text match (the serial token
    // gives each doc some NON-hot buckets — the documented contract) but
    // lose the cross-template mega-clique fan-out
    assert(!capped.exists(p => p._1 < 5L && p._2 < 200L && p._2 != p._1),
      s"capped fuzzy join still fanned out over the mega-bucket: $capped")
  }
}
