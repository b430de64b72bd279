package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

case class WinEv(ts: Timestamp, user_id: Long)

/** W5 streaming twin: the same tumbling 1-hour aggregate as the batch
  * `w5_tumbling_agg`, run as a watermarked streaming query in append mode —
  * finalized windows must equal the batch group-by over the same events,
  * and no window may emit before the watermark passes its end (append-mode
  * correctness at scale: each window's state is dropped exactly once).
  */
class StreamingWindowSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def t(h: Int, min: Int) = Timestamp.valueOf(f"2024-01-01 $h%02d:$min%02d:00")

  test("streaming tumbling window equals the batch aggregate once watermark closes") {
    implicit val sc = spark.sqlContext
    val ev = MemoryStream[WinEv]
    val out = ev.toDF()
      .withWatermark("ts", "30 minutes")
      .groupBy(window(col("ts"), "1 hour").as("w"))
      .agg(count(lit(1)).as("n_events"))
      .select(unix_micros(col("w.start")).as("win_start_us"), col("n_events"))
    val q = out.writeStream.format("memory").queryName("w5_stream")
      .outputMode("append").start()
    try {
      val batch1 = Seq(WinEv(t(10, 0), 1), WinEv(t(10, 30), 2), WinEv(t(11, 15), 1))
      ev.addData(batch1: _*)
      q.processAllAvailable()
      // watermark ~10:45: the 10:00 window [10:00,11:00) is not provably
      // complete — nothing may have emitted yet
      assert(spark.table("w5_stream").count() === 0,
        "window emitted before the watermark passed its end")

      // late-but-in-watermark event for the 10:00 window, plus a sentinel
      // far ahead that closes both real windows
      val batch2 = Seq(WinEv(t(10, 55), 3), WinEv(t(15, 0), 9))
      ev.addData(batch2: _*)
      q.processAllAvailable()

      val got = spark.table("w5_stream")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val expected = (batch1 ++ batch2).filter(_.ts.before(t(12, 0))).toDF()
        .groupBy(window(col("ts"), "1 hour").as("w"))
        .agg(count(lit(1)).as("n"))
        .collect().map(r => r.getStruct(0).getTimestamp(0).getTime * 1000L -> r.getLong(1))
        .toMap
      assert(got === expected,
        s"streaming windows $got differ from batch $expected")
    } finally q.stop()
  }

  test("streaming SLIDING windows equal the batch aggregate; emission at window end") {
    implicit val sc = spark.sqlContext
    val ev = MemoryStream[WinEv]
    val out = ev.toDF()
      .withWatermark("ts", "30 minutes")
      .groupBy(window(col("ts"), "1 hour", "15 minutes").as("w"))
      .agg(count(lit(1)).as("n_events"))
      .select(unix_micros(col("w.start")).as("win_start_us"), col("n_events"))
    val q = out.writeStream.format("memory").queryName("w6_stream")
      .outputMode("append").start()
    try {
      val batch1 = Seq(WinEv(t(10, 0), 1), WinEv(t(10, 20), 2), WinEv(t(10, 50), 1))
      ev.addData(batch1: _*)
      q.processAllAvailable()
      // watermark 10:20: only windows ending <= 10:20 could emit, and the
      // earliest window containing 10:00 is [09:15, 10:15) — ends 10:15
      // < 10:20, so AT MOST that one window may have emitted; the window
      // [10:00, 11:00) must not have
      val early = spark.table("w6_stream")
        .collect().map(_.getLong(0)).toSet
      val tenAmUs = t(10, 0).getTime * 1000L
      assert(!early.contains(tenAmUs),
        "open sliding window emitted before the watermark passed its end")

      // sentinel far ahead closes every real window
      ev.addData(WinEv(t(15, 0), 9))
      q.processAllAvailable()

      val got = spark.table("w6_stream")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val expected = batch1.toDF()
        .groupBy(window(col("ts"), "1 hour", "15 minutes").as("w"))
        .agg(count(lit(1)).as("n"))
        .collect().map(r => r.getStruct(0).getTimestamp(0).getTime * 1000L -> r.getLong(1))
        .toMap
      assert(got === expected,
        s"streaming sliding windows $got differ from batch $expected")
      // sanity: a single 10:00 event really spans 4 slide instances
      assert(expected.count { case (w, _) => w <= tenAmUs && tenAmUs < w + 3600000000L } === 4)
    } finally q.stop()
  }
}
