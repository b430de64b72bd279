package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

case class HHEvent(ts: Timestamp, key: String)

class StreamingHeavyHittersSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def t(sec: Long) = new Timestamp(sec * 1000L)

  test("closed window emits the batch top-k; sketch state, append mode") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    // window [0, 60): key frequencies 5x a, 3x b, 1x c
    val w1 = Seq.fill(5)(HHEvent(t(10), "a")) ++
      Seq.fill(3)(HHEvent(t(20), "b")) ++ Seq(HHEvent(t(30), "c"))
    val input = MemoryStream[HHEvent]
    val out = StreamingHeavyHitters.topK(
      input.toDF(), "ts", "key", "1 minute", "10 seconds", k = 2)
    val q = out.writeStream.format("memory").queryName("shh_out")
      .outputMode("append").start()
    try {
      input.addData(w1.toIndexedSeq: _*)
      q.processAllAvailable()
      // nothing emitted yet: window [0,60) is still open
      assert(spark.table("shh_out").count() === 0L)
      // an event far past the watermark horizon closes it
      input.addData(HHEvent(t(300), "z"))
      q.processAllAvailable()
      val rows = spark.table("shh_out").collect()
      assert(rows.length === 1, s"exactly the closed window: ${rows.toSeq}")
      val r = rows.head
      assert(r.getAs[Timestamp]("win_start") === t(0))
      assert(r.getAs[Long]("n_events") === 9L)
      val items: scala.collection.Seq[(String, Long)] = r.getAs[scala.collection.Seq[Row]]("top_items")
        .map(x => (x.getString(0), x.getLong(1)))
      // fixture cardinality (3 keys, map 1024): sketch is exact
      assert(items === Seq(("a", 5L), ("b", 3L)),
        s"top-2 must be exact here: $items")
      // state is bounded: one sketch row per open window
      val p = q.lastProgress
      assert(p.stateOperators.nonEmpty, "windowed agg must be stateful")
    } finally q.stop()
  }

  test("late data within the watermark still counts; beyond it is dropped") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val input = MemoryStream[HHEvent]
    val out = StreamingHeavyHitters.topK(
      input.toDF(), "ts", "key", "1 minute", "30 seconds", k = 3)
    val q = out.writeStream.format("memory").queryName("shh_late")
      .outputMode("append").start()
    try {
      input.addData(HHEvent(t(10), "a"), HHEvent(t(70), "b"))
      q.processAllAvailable()
      // watermark now 70-30=40: window [0,60) still open; a late 'a'
      // at t=50 (>= watermark) must still be absorbed
      input.addData(HHEvent(t(50), "a"))
      q.processAllAvailable()
      input.addData(HHEvent(t(500), "z")) // close everything up to [120,...)
      q.processAllAvailable()
      val w0 = spark.table("shh_late").collect()
        .find(_.getAs[Timestamp]("win_start") === t(0))
      assert(w0.isDefined, "window [0,60) must have closed")
      val items = w0.get.getAs[scala.collection.Seq[Row]]("top_items")
        .map(x => (x.getString(0), x.getLong(1)))
      assert(items.contains(("a", 2L)),
        s"the in-watermark late event must be counted: $items")
    } finally q.stop()
  }
}
