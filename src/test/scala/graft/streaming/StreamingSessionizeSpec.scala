package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.tables.Tables

case class SEvent(userId: Long, ts: Timestamp)

class StreamingSessionizeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.Sf0001
  private val GapUs = 3600L * 1000000L // 1 hour, matching batch x8

  test("closed streaming sessions equal a local gap-scan replay") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val evs = Tables.events(spark, sf)
      .select(col("user_id"), col("ts"))
      .as[(Long, Timestamp)].collect()
      .sortBy(e => (e._1, e._2.getTime))

    // reference sessions with session_window's >=-split convention
    val expected = evs.groupBy(_._1).toSeq.flatMap { case (u, es) =>
      val times = es.map(_._2.getTime * 1000L).sorted // micros
      val sessions = scala.collection.mutable.ArrayBuffer.empty[Long]
      var n = 0L
      var prev = Long.MinValue
      times.foreach { t =>
        if (prev != Long.MinValue && t - prev >= GapUs) { sessions += n; n = 0L }
        n += 1L
        prev = t
      }
      sessions += n
      sessions.map(u -> _)
    }.toSeq.groupBy(identity).view.mapValues(_.size).toMap

    val input = MemoryStream[SEvent]
    val out = StreamingSessionize.sessions(
      input.toDF().withColumnRenamed("userId", "user_id"),
      "user_id", "ts", "1 hour", "0 seconds")
    val q = out.writeStream.format("memory").queryName("ssess_out")
      .outputMode("append").start()
    try {
      input.addData(evs.map { case (u, t) => SEvent(u, t) }.toIndexedSeq: _*)
      q.processAllAvailable()
      // advance the watermark far past every session close so all emit
      val flushTs = new Timestamp(evs.map(_._2.getTime).max + 30L * 86400000L)
      input.addData(SEvent(-1L, flushTs))
      q.processAllAvailable()
      val got = spark.table("ssess_out")
        .where(col("user_id") =!= -1L)
        .select(col("user_id"), col("n_events"))
        .collect().map(r => (r.getLong(0), r.getLong(1)))
        .toSeq.groupBy(identity).view.mapValues(_.size).toMap
      assert(got === expected,
        s"missing=${(expected.keySet -- got.keySet).take(5)} " +
          s"extra=${(got.keySet -- expected.keySet).take(5)}")
      // every session's span is consistent: end - start >= gap always
      // (session_window extends the close one gap past the last event)
      val spans = spark.table("ssess_out").where(col("user_id") =!= -1L)
        .select((unix_micros(col("session_end")) -
          unix_micros(col("session_start"))).as("span"))
        .collect().map(_.getLong(0))
      assert(spans.forall(_ >= GapUs), "a session closed before start+gap")
    } finally q.stop()
  }

  test("session state is watermark-bounded, not history-bounded") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val input = MemoryStream[SEvent]
    val out = StreamingSessionize.sessions(
      input.toDF().withColumnRenamed("userId", "user_id"),
      "user_id", "ts", "1 hour", "0 seconds")
    val q = out.writeStream.format("memory").queryName("ssess_state")
      .outputMode("append").start()
    try {
      val base = 1700000000000L
      // 50 users, one burst each, then a flush far in the future
      input.addData((1L to 50L).map(u => SEvent(u, new Timestamp(base + u))): _*)
      q.processAllAvailable()
      input.addData(SEvent(999L, new Timestamp(base + 90L * 86400000L)))
      q.processAllAvailable()
      input.addData(SEvent(998L, new Timestamp(base + 91L * 86400000L)))
      q.processAllAvailable()
      val p = q.recentProgress.flatMap(_.stateOperators).lastOption
      assert(p.nonEmpty, "session_window produced no state operator")
      // after the watermark passed every burst session, state holds only
      // the open flush sessions — not the 50 closed ones
      assert(p.get.numRowsTotal <= 3,
        s"closed-session state not evicted: ${p.get.numRowsTotal} rows")
    } finally q.stop()
  }
}
