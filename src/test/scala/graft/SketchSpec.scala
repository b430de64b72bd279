package graft

import org.scalatest.funsuite.AnyFunSuite

/** Mergeable-sketch invariants (x3_hll_merge): unioning per-partition
  * Datasketches HLL sketches must reproduce the single-pass global
  * estimate exactly — the property that makes incremental distinct-count
  * maintenance sound (build sketches per ingest batch, merge at query
  * time, never rescan).
  */
class SketchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.Sf0001

  test("per-type HLL sketches union to the exact same estimate as one global sketch") {
    val r = SparkEntry.queries("x3_hll_merge")(spark, sf)
      .select("merged_est", "global_est", "exact").head()
    val (merged, global, exact) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(merged === global,
      s"sketch union is not lossless: merged=$merged global=$global")
    // default lgK=12 keeps HLL error ~1.6%; the fixture has few hundred
    // distinct users, so the estimate should be within 5% of exact
    assert(math.abs(merged - exact).toDouble / exact < 0.05,
      s"HLL estimate off: est=$merged exact=$exact")
  }
}
