package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.streaming.StreamingRunningDistinct.{Ev, Out}

/** T13 — the streaming twin of x141's running distinct count: static ==
  * batch operator replay (tie and null edges included), multi-batch ==
  * one-shot, per-key state bounded by the key's DISTINCT value count.
  */
class StreamingRunningDistinctSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Time ties introducing several new values at once, re-seen values,
    * null x rows, a second key. */
  private def fixture: Seq[Ev] = Seq(
    Ev("a", 1, Some("u")), Ev("a", 1, Some("v")), Ev("a", 2, Some("u")),
    Ev("a", 2, None), Ev("a", 3, Some("w")), Ev("a", 3, Some("w")),
    Ev("b", 1, Some("u")), Ev("b", 4, Some("z")))

  /** The batch operator over the same rows (unique synthetic id). */
  private def batchTruth(rows: Seq[Ev]): Map[(String, Long, String), Long] = {
    val df = rows.zipWithIndex
      .map { case (e, i) => (e.key, e.t, e.x.orNull, i.toLong) }
      .toDF("key", "t", "x", "id")
    graft.stats.RunningDistinct.attach(df, "key", "t", "x", "id", "cum")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), Option(r.getString(2)).getOrElse("~")) ->
        r.getLong(4))
      .toMap
  }

  private def asMap(out: Seq[Out]): Map[(String, Long, String), Long] =
    out.map(o => (o.key, o.t, o.x.getOrElse("~")) -> o.cum).toMap

  test("static dataset matches the batch operator, ties and nulls included") {
    val got = StreamingRunningDistinct.withRunningDistinct(fixture.toDS())
      .collect().toSeq
    assert(asMap(got) === batchTruth(fixture))
    // peer law spot-check: both values first seen at t=1 are visible to
    // BOTH rows of the peer group
    assert(got.filter(o => o.key == "a" && o.t == 1).map(_.cum).toSet === Set(2L))
  }

  test("multi-batch == one-shot across a peer-safe boundary") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val q = StreamingRunningDistinct.withRunningDistinct(input.toDS())
      .writeStream.format("memory").queryName("srd_out")
      .outputMode("append").start()
    try {
      input.addData(fixture.filter(_.t <= 2))
      q.processAllAvailable()
      input.addData(fixture.filter(_.t > 2))
      q.processAllAvailable()
      val got = spark.table("srd_out").as[Out].collect().toSeq
      assert(asMap(got) === batchTruth(fixture))
    } finally q.stop()
  }

  test("state is the distinct-value set: bounded by ndv(x), not rows") {
    // 3 distinct values seen for key a across 6 rows; replaying many
    // more rows of the SAME values must not grow the state — asserted
    // through the public face: the cum value saturates at ndv
    val flood = fixture ++ (4 to 50).map(t => Ev("a", t.toLong, Some("u")))
    val got = StreamingRunningDistinct.withRunningDistinct(flood.toDS())
      .collect().toSeq
    assert(got.filter(_.key == "a").map(_.cum).max === 3L)
  }
}
