package graft.stats

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.tables.Tables

class IncrementalStatsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def docs = Tables.documents(spark, sf)
    .select(col("doc_id"), col("source"), col("n_chars"))

  test("merge of base+delta summaries equals the full recompute, sketches included") {
    val base = docs.filter(col("doc_id") % 3 =!= 0)
    val delta = docs.filter(col("doc_id") % 3 === 0)

    val merged = IncrementalStats.finish(
      IncrementalStats.merge(
        IncrementalStats.summarize(base, "source", "n_chars", "doc_id"),
        IncrementalStats.summarize(delta, "source", "n_chars", "doc_id"),
        "source"),
      "source")
    val full = IncrementalStats.finish(
      IncrementalStats.summarize(docs, "source", "n_chars", "doc_id"),
      "source")

    val m = merged.collect().map(r => r.getString(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val f = full.collect().map(r => r.getString(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(m === f,
      "incremental merge diverged from full recompute (counters or sketch)")
    assert(m.nonEmpty)
  }

  test("keys only in the delta insert; keys only in the base carry through") {
    import spark.implicits._
    val base = Seq(("a", 1L), ("a", 2L), ("b", 3L)).toDF("k", "v")
    val delta = Seq(("b", 4L), ("c", 5L)).toDF("k", "v")
    val got = IncrementalStats.finish(
      IncrementalStats.merge(
        IncrementalStats.summarize(base, "k", "v", "v"),
        IncrementalStats.summarize(delta, "k", "v", "v"), "k"), "k")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got === Map("a" -> (2L, 3L), "b" -> (2L, 7L), "c" -> (1L, 5L)))
  }

  test("absorbing a delta against a PERSISTED summary scans only the delta") {
    val dir = Files.createTempDirectory("incstats").toFile.getAbsolutePath + "/s"
    val base = docs.filter(col("doc_id") % 3 =!= 0)
    IncrementalStats.summarize(base, "source", "n_chars", "doc_id")
      .write.parquet(dir)

    val delta = docs.filter(col("doc_id") % 3 === 0)
    val merged = IncrementalStats.merge(
      spark.read.parquet(dir),
      IncrementalStats.summarize(delta, "source", "n_chars", "doc_id"),
      "source")

    val plan = merged.queryExecution.executedPlan.toString
    val corpusScans = "documents\\.parquet".r.findAllIn(plan).size
    assert(corpusScans == 1,
      s"expected ONE corpus scan (the delta), saw $corpusScans:\n$plan")

    // and the result is still exactly the full recompute (counters)
    val m = merged.select(IncrementalStats.exactCols("source"): _*)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val f = IncrementalStats.summarize(docs, "source", "n_chars", "doc_id")
      .select(IncrementalStats.exactCols("source"): _*)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(m === f)
  }
}
