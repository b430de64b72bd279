package graft.text

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.tables.Tables

class FuzzyJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def docs = Tables.documents(spark, sf)
    .select(col("doc_id"), col("text"))

  test("fuzzy join equals brute-force exact Jaccard at fixture scale") {
    val probe = docs.filter(col("doc_id") % 25 === 0)
      .select((col("doc_id") + lit(1000000L)).as("probe_id"),
        concat(col("text"), lit(" qq")).as("text"))

    val got = TextOps.fuzzyJoin(probe, docs, 0.8)
      .select("probe_id", "doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    // brute force: exact Jaccard over the full product (tiny here)
    val shP = probe.select(col("probe_id"),
      TextOps.distinctShingles(col("text"), 3).as("sp"))
      .filter(size(col("sp")) > 0)
    val shD = docs.select(col("doc_id"),
      TextOps.distinctShingles(col("text"), 3).as("sd"))
      .filter(size(col("sd")) > 0)
    val expected = shP.crossJoin(shD)
      .filter(TextOps.jaccard(col("sp"), col("sd")) >= 0.8)
      .select("probe_id", "doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    assert(got === expected,
      s"missing=${expected -- got} invented=${got -- expected}")
    assert(expected.nonEmpty, "fixture should plant at least one true pair")
  }

  test("every emitted pair is exact-verified at or above the threshold") {
    val probe = docs.filter(col("doc_id") % 25 === 0)
      .select((col("doc_id") + lit(1000000L)).as("probe_id"),
        concat(col("text"), lit(" qq")).as("text"))
    val bad = TextOps.fuzzyJoin(probe, docs, 0.8)
      .filter(col("jac") < 0.8).count()
    assert(bad === 0)
  }

  test("plan never forms the probe×corpus product") {
    val probe = docs.limit(10)
      .select(col("doc_id").as("probe_id"), col("text"))
    val p = TextOps.fuzzyJoin(probe, docs, 0.8)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"fuzzy join degenerated to a product:\n$p")
  }
}
