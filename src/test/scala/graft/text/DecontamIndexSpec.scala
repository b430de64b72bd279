package graft.text

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The decontamination index's durable-artifact lifecycle (VERDICT r8
  * #6): built once, reloaded thereafter, answers unchanged vs the
  * inline (unkeyed) path.
  */
class DecontamIndexSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def docs = graft.tables.Tables
    .documents(spark, TestSpark.Sf0001).select(col("doc_id"), col("text"))

  test("built once, reloaded on the second call; keyed == unkeyed result") {
    val key = Seq("decontam-spec", TestSpark.Sf0001,
      System.nanoTime().toString) // fresh key per run: exercise the build
    val evalSet = docs.filter(pmod(col("doc_id"), lit(10L)) === 0)
    try {
      val first = TextOps.ensureDecontamIndex(spark, evalSet, key)
    val dir = graft.util.ArtifactStore.artifactDir(spark, "decontam_index",
      key ++ Seq(3))
    assert(new java.io.File(dir, "_SUCCESS").exists(), "artifact not published")
    // second call must LOAD, not rebuild. mtime comparison is unreliable
    // on coarse-granularity filesystems (ADVICE r9), so pin the sorted
    // (name, length) listing — a rebuild writes fresh UUID part files —
    // plus a canary file the rebuild's dir-replace would delete.
    val canary = new java.io.File(dir, "_spec_canary")
    assert(canary.createNewFile(), "could not plant canary")
    val listingBefore = dir.listFiles().map(f => (f.getName, f.length())).sorted.toSeq
    // evalDocs is by-name; passing a failing thunk proves it is untouched
    val second = TextOps.ensureDecontamIndex(spark,
      sys.error("eval suite must not be re-read on the load path"), key)
    assert(canary.exists(), "second call replaced the artifact dir")
    assert(dir.listFiles().map(f => (f.getName, f.length())).sorted.toSeq === listingBefore,
      "second call rewrote the artifact")
    assert(second.count() === first.count())
    // the keyed path answers exactly like the inline path
    val keyed = TextOps.decontaminate(docs, evalSet, minOverlap = 3,
      indexKey = Some(key)).select("doc_id")
    val inline = TextOps.decontaminate(docs, evalSet, minOverlap = 3)
      .select("doc_id")
    assert(keyed.exceptAll(inline).count() === 0L)
    assert(inline.exceptAll(keyed).count() === 0L)
    } finally // the per-run key must not leak artifacts on a failure
      graft.util.ArtifactStore.invalidate(spark, "decontam_index", key ++ Seq(3))
  }
}
