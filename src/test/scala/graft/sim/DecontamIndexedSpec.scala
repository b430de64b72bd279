package graft.sim

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, TestSpark}

/** x110b (IVF-index-probed semantic decontamination) vs the exact x110
  * scan — the invariants the SQL oracle cannot express for an
  * approximate-by-design operator (the SemDedupSpec discipline):
  * precision 1.0, plant recall 1.0, an overall recall floor, and
  * agreement of the reported similarity wherever both paths flag a row.
  */
class DecontamIndexedSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.Sf0001

  private def rows(name: String): Map[Long, Double] =
    SparkEntry.queries(name)(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

  private lazy val exact = rows("x110_semantic_decontam")
  private lazy val probed = rows("x110b_decontam_indexed")

  test("fixture bites: the exact scan flags contamination, incl. plants") {
    assert(exact.nonEmpty)
    assert(exact.keySet.exists(_ < 0L), "planted ids missing from exact flags")
  }

  test("precision 1.0: every probed flag is an exact flag, same similarity") {
    val falsePositives = probed.keySet -- exact.keySet
    assert(falsePositives.isEmpty,
      s"index path flagged ${falsePositives.take(5)} that the exact scan does not")
    // exact cosine re-rank: where both flag a row, the probed max can
    // only be ≤ the exact max (subset of candidates) — and for a flagged
    // row it must still clear τ; for plants (exact duplicates, sim 1.0)
    // the two agree to the rounded digit
    probed.foreach { case (id, sim) =>
      assert(sim <= exact(id) + 1e-9, s"vec $id: probed $sim > exact ${exact(id)}")
    }
  }

  test("plant recall 1.0: every planted duplicate is found through the index") {
    // a plant is byte-identical to its eval twin, so it lands in the
    // twin's own argmax cell — always inside the probe set
    val plantedExact = exact.keySet.filter(_ < 0L)
    val plantedProbed = probed.keySet.filter(_ < 0L)
    assert(plantedExact === plantedProbed,
      s"missed plants: ${(plantedExact -- plantedProbed).take(5)}")
    plantedProbed.foreach { id =>
      assert(probed(id) === exact(id), s"plant $id similarity drifted")
    }
  }

  test("overall recall floor at nProbe=4") {
    val recall = probed.size.toDouble / exact.size
    assert(recall >= 0.5, s"recall $recall (${probed.size}/${exact.size})")
  }
}
