package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

case class Click(click_ts: Timestamp, user: Long, click_id: Long)
case class Purchase(buy_ts: Timestamp, user: Long, buy_id: Long)

class StreamJoinsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def t(min: Int) = Timestamp.valueOf(f"2024-01-01 10:$min%02d:00")

  test("stream-stream interval join attributes purchases within the horizon only") {
    implicit val sc = spark.sqlContext
    val clicks = MemoryStream[Click]
    val buys = MemoryStream[Purchase]
    val out = StreamJoins.intervalJoin(
      clicks.toDF().withColumnRenamed("user", "user_id"),
      buys.toDF().withColumnRenamed("user", "user_id"),
      "user_id", "click_ts", "buy_ts",
      watermark = "5 minutes", horizon = "10 minutes")
    val q = out.writeStream.format("memory").queryName("attr_out")
      .outputMode("append").start()
    try {
      // user 1 clicks at 10:00; user 2 clicks at 10:02
      clicks.addData(Click(t(0), 1L, 100L), Click(t(2), 2L, 200L))
      // purchases: in-horizon for user 1 (10:05), OUT of horizon for
      // user 2 (10:20 > 10:02+10m), wrong-user purchase at 10:03
      buys.addData(Purchase(t(5), 1L, 900L), Purchase(t(20), 2L, 901L),
        Purchase(t(3), 3L, 902L))
      q.processAllAvailable()
      // advance both watermarks far enough that all joinable pairs emit
      clicks.addData(Click(t(50), 9L, 999L))
      buys.addData(Purchase(t(50), 9L, 998L))
      q.processAllAvailable()

      val got = spark.table("attr_out")
        .select("click_id", "buy_id").as[(Long, Long)].collect().toSet
      assert(got.contains((100L, 900L)), s"in-horizon match missing: $got")
      assert(!got.exists(_._1 == 200L), s"out-of-horizon purchase joined: $got")
      assert(!got.exists(_._2 == 902L), s"wrong-user purchase joined: $got")
      // the 10:50 pair also matches (same user, same instant, in horizon)
      assert(got.contains((999L, 998L)), s"same-batch match missing: $got")
    } finally q.stop()
  }

  test("interval-join state is watermark-bounded (numRowsTotal plateaus)") {
    implicit val sc = spark.sqlContext
    val clicks = MemoryStream[Click]
    val buys = MemoryStream[Purchase]
    val out = StreamJoins.intervalJoin(
      clicks.toDF().withColumnRenamed("user", "user_id"),
      buys.toDF().withColumnRenamed("user", "user_id"),
      "user_id", "click_ts", "buy_ts",
      watermark = "1 minutes", horizon = "2 minutes")
    val q = out.writeStream.format("memory").queryName("attr_soak_out")
      .outputMode("append").start()
    try {
      val rows = (0 until 6).map { b =>
        // 3 clicks + 3 purchases per batch, event time advancing 8 min
        // per batch — far past horizon+watermark, so old state must go
        clicks.addData((0 until 3).map(j => Click(t(8 * b), b * 10L + j, b * 100L + j)): _*)
        buys.addData((0 until 3).map(j => Purchase(t(8 * b), b * 10L + j, b * 100L + j)): _*)
        q.processAllAvailable()
        q.lastProgress.stateOperators(0).numRowsTotal
      }
      val tail = rows.drop(3)
      assert(tail.forall(_ <= 12L),
        s"join state not bounded by the watermark horizon: $rows")
    } finally q.stop()
  }
}
