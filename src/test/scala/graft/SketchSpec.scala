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

  test("persisted sketch artifact serves the exact same estimate as a direct scan") {
    // VERDICT r4 #1: the sketch table written by x3_hll_artifact must be a
    // faithful stand-in for rescanning events — union of the STORED
    // sketches == estimate of one global in-query sketch, exactly.
    val direct = SparkEntry.queries("x3_hll_merge")(spark, sf)
      .select("global_est").head().getLong(0)
    val served = SparkEntry.queries("x3_hll_artifact")(spark, sf)
      .select("artifact_est", "exact").head()
    assert(served.getLong(0) === direct,
      s"artifact-served estimate ${served.getLong(0)} != direct $direct")
    // and a fresh session (memory memo gone, parquet artifact remains)
    // must LOAD the sketches, not rebuild them
    graft.util.SessionCache.clear()
    val fitsBefore = graft.util.ArtifactStore.fits
    val again = SparkEntry.queries("x3_hll_artifact")(spark, sf)
      .select("artifact_est").head().getLong(0)
    assert(again === direct)
    assert(graft.util.ArtifactStore.fits === fitsBefore,
      "fresh session rebuilt the sketch table instead of loading it")
  }

  test("sketch profile tracks the exact profile within HLL tolerance on every column") {
    // VERDICT r4 #3: x12_profile_sketch is the 100 TB twin of x12_profile —
    // row/null counts must be EXACT; approx distincts within ~5% (lgK=12
    // HLL on fixture cardinalities).
    val exact = SparkEntry.queries("x12_profile")(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    val approx = SparkEntry.queries("x12_profile_sketch")(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(approx.keySet === exact.keySet)
    exact.foreach { case (c, (nRows, nNull, nd)) =>
      val (aRows, aNull, aNd) = approx(c)
      assert(aRows === nRows, s"$c: row count must be exact")
      assert(aNull === nNull, s"$c: null count must be exact")
      assert(math.abs(aNd - nd).toDouble / math.max(nd, 1L) < 0.05,
        s"$c: approx distinct $aNd vs exact $nd out of tolerance")
    }
  }
}
