package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

case class Doc(ts: Timestamp, docId: Long, text: String)

class StreamingDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def t(min: Int) = Timestamp.valueOf(f"2024-01-01 10:$min%02d:00")

  test("duplicates across micro-batches are dropped; first arrival wins") {
    implicit val sc = spark.sqlContext
    val input = MemoryStream[Doc]
    val out = StreamingDedup.dedupWithinWatermark(
      input.toDF(), "ts", withinUs = 3600L * 1000000L, col("text"))
    val q = out.writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try {
      // batch 1: two distinct docs + an in-batch duplicate
      input.addData(Doc(t(0), 1L, "alpha"), Doc(t(1), 2L, "beta"),
        Doc(t(2), 3L, "alpha"))
      q.processAllAvailable()
      // batch 2: cross-batch duplicate + one new doc
      input.addData(Doc(t(5), 4L, "beta"), Doc(t(6), 5L, "gamma"))
      q.processAllAvailable()

      val got = spark.table("dedup_out")
        .select("docId", "text").as[(Long, String)].collect().toSet
      assert(got === Set((1L, "alpha"), (2L, "beta"), (5L, "gamma")))
    } finally q.stop()
  }

  test("distinct payloads on a colliding route key both survive (VERDICT r2 #3)") {
    // A real 64-bit xxhash64 collision cannot be crafted, so force one
    // through the pluggable route: length(text) collides for any two
    // distinct same-length texts. Content columns are part of the dedup
    // key, so both must survive — while a true duplicate on the same
    // route is still dropped.
    implicit val sc = spark.sqlContext
    val input = MemoryStream[Doc]
    val out = StreamingDedup.dedupRouted(
      input.toDF(), "ts", withinUs = 3600L * 1000000L,
      length(col("text")).cast("long"), col("text"))
    val q = out.writeStream.format("memory").queryName("dedup_collide_out")
      .outputMode("append").start()
    try {
      // "alpha" and "gamma" share length 5 (route collision, distinct
      // content); the second "alpha" is a genuine duplicate
      input.addData(Doc(t(0), 1L, "alpha"), Doc(t(1), 2L, "gamma"))
      q.processAllAvailable()
      input.addData(Doc(t(2), 3L, "alpha"))
      q.processAllAvailable()
      val got = spark.table("dedup_collide_out")
        .select("docId", "text").as[(Long, String)].collect().toSet
      assert(got === Set((1L, "alpha"), (2L, "gamma")))
    } finally q.stop()
  }

  test("soak: dedup state plateaus at the watermark horizon (VERDICT r3 #8)") {
    // 8 micro-batches of 5 unique docs each, event time advancing 10 min
    // per batch against a 10-min dedup horizon. If eviction works, state
    // holds only rows still inside the horizon (~2 batches' worth, plus at
    // most one batch of cleanup lag) — NOT the 40-row cumulative total.
    // This is the property that makes the operator runnable forever at
    // ingest scale; with the RocksDB state store provider
    // (spark.sql.streaming.stateStore.providerClass =
    // ...RocksDBStateStoreProvider) the same bound holds off-heap at
    // billions of keys per executor.
    implicit val sc = spark.sqlContext
    val input = MemoryStream[Doc]
    val out = StreamingDedup.dedupWithinWatermark(
      input.toDF(), "ts", withinUs = 600L * 1000000L, col("text"))
    val q = out.writeStream.format("memory").queryName("dedup_soak_out")
      .outputMode("append").start()
    try {
      val perBatch = 5
      val rowsAfterBatch = (0 until 8).map { b =>
        input.addData((0 until perBatch).map(j =>
          Doc(t(10 * b), b * 100L + j, s"doc_b${b}_d$j")): _*)
        q.processAllAvailable()
        q.lastProgress.stateOperators(0).numRowsTotal
      }
      // every doc is unique → all 40 must come through
      assert(spark.table("dedup_soak_out").count() === 40L)
      // growth phase then plateau: the tail must stay within horizon+lag
      // (2 batches in horizon + 1 batch eviction lag), far below the
      // 40-row cumulative count an unbounded store would hold
      val bound = 3L * perBatch
      val tail = rowsAfterBatch.drop(4)
      assert(tail.forall(_ <= bound),
        s"state not bounded by the watermark horizon: $rowsAfterBatch")
      // and the store did actually evict: the final state is smaller than
      // everything ever inserted
      assert(rowsAfterBatch.last < 40L, s"no eviction: $rowsAfterBatch")
    } finally q.stop()
  }

  test("stream-static broadcast enrichment (streaming J1): every event joins the dim") {
    implicit val sc = spark.sqlContext
    val dim = Seq(("alpha", "pt"), ("beta", "en")).toDF("text", "lang")
    val input = MemoryStream[Doc]
    val out = input.toDF().join(broadcast(dim), Seq("text"), "left")
    val q = out.writeStream.format("memory").queryName("enrich_out")
      .outputMode("append").start()
    try {
      input.addData(Doc(t(0), 1L, "alpha"), Doc(t(1), 2L, "gamma"))
      q.processAllAvailable()
      val got = spark.table("enrich_out")
        .select("docId", "lang").collect()
        .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
      assert(got === Map(1L -> Some("pt"), 2L -> None))
    } finally q.stop()
  }
}
