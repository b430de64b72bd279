package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.etl.MarketEtl
import graft.streaming.StatefulRolling.BarIn

class StatefulRollingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def bar(a: String, day: Int, c: Double) =
    BarIn(a, Timestamp.valueOf(f"2024-01-$day%02d 00:00:00"), c)

  test("stateful rolling mean on a static dataset matches the batch window") {
    val bars = (1 to 12).map(d => bar("A", d, d.toDouble)) ++
      (1 to 5).map(d => bar("B", d, d * 10.0))
    val streamingStyle = StatefulRolling.withRollingMean(bars.toDS(), 7).toDF()
      .select(col("ativo"), col("date"), col("mm"))
    val batch = MarketEtl.rollingMean(bars.toDF(), Seq("ativo"),
        Seq(col("date"), col("close_price")), "close_price", 7, "mm")
      .select(col("ativo"), col("date"), col("mm"))
    assert(streamingStyle.exceptAll(batch).isEmpty &&
      batch.exceptAll(streamingStyle).isEmpty)
  }

  test("state carries across micro-batches (incremental == batch recompute)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[BarIn]
    val q = StatefulRolling.withRollingMean(input.toDS(), 3).toDF()
      .writeStream.format("memory").queryName("roll_out")
      .outputMode("append").start()
    try {
      input.addData((1 to 4).map(d => bar("A", d, d.toDouble)): _*)
      q.processAllAvailable()
      // rows 5..8 arrive later: their frames span the batch boundary
      input.addData((5 to 8).map(d => bar("A", d, d.toDouble)): _*)
      q.processAllAvailable()
      val got = spark.table("roll_out").orderBy("date")
        .select("mm").collect().map(r => Option(r.get(0)))
      val want = Seq(None, None, Some(2.0), Some(3.0), Some(4.0),
        Some(5.0), Some(6.0), Some(7.0))
      assert(got.toSeq === want.map(o => o: Option[Any]))
    } finally q.stop()
  }

  test("weekly windowed aggregate with watermark emits per-asset weeks") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[BarIn]
    val bars = input.toDS().toDF()
      .withColumn("trade_volume", lit(10L))
    val q = StreamingEtl.weeklyAssetAgg(bars)
      .writeStream.format("memory").queryName("weekly_out")
      .outputMode("complete").start()
    try {
      input.addData((1 to 14).map(d => bar("A", d, 100.0)): _*)
      q.processAllAvailable()
      val rows = spark.table("weekly_out").orderBy("week_start").collect()
      assert(rows.length >= 2, "14 daily bars must span >= 2 weekly windows")
      assert(rows.forall(_.getAs[Double]("avg_close") == 100.0))
      assert(rows.map(_.getAs[Long]("total_volume")).sum === 140L)
    } finally q.stop()
  }

  test("session_window groups events by activity gap (streaming X8)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[BarIn]
    // two activity bursts per asset, > 1 day apart → two sessions
    val q = input.toDS().toDF()
      .withWatermark("date", "0 seconds")
      .groupBy(col("ativo"), session_window(col("date"), "36 hours"))
      .agg(count(lit(1)).as("n"))
      .writeStream.format("memory").queryName("session_out")
      .outputMode("complete").start()
    try {
      input.addData(bar("A", 1, 1.0), bar("A", 2, 1.0), // burst 1: days 1-2
        bar("A", 10, 1.0), bar("A", 11, 1.0), bar("A", 12, 1.0)) // burst 2
      q.processAllAvailable()
      val sessions = spark.table("session_out")
        .orderBy("session_window.start")
        .select("n").collect().map(_.getLong(0)).toSeq
      assert(sessions === Seq(2L, 3L))
    } finally q.stop()
  }
}
