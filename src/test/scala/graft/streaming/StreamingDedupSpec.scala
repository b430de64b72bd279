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
