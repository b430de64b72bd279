package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.streaming.StreamingRunningDistinctSketch.{Ev, Out}

/** T13b — the bounded-state sketch twin of the streaming running
  * distinct count (VERDICT r14 #5): exact-under-capacity vs the exact
  * twin, multi-batch == one-shot (restart/replay stability through the
  * serialized sketch state), and the state-size bound the exact form
  * cannot give. No oracle by design: streaming + approximate.
  */
class StreamingRunningDistinctSketchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def fixture: Seq[Ev] = Seq(
    Ev("a", 1, Some("u")), Ev("a", 1, Some("v")), Ev("a", 2, Some("u")),
    Ev("a", 2, None), Ev("a", 3, Some("w")), Ev("a", 3, Some("w")),
    Ev("b", 1, Some("u")), Ev("b", 4, Some("z")))

  /** The EXACT twin over the same rows. */
  private def exactTruth(rows: Seq[Ev]): Map[(String, Long, String), Long] =
    StreamingRunningDistinct.withRunningDistinct(
      rows.map(e => StreamingRunningDistinct.Ev(e.key, e.t, e.x)).toDS())
      .collect().toSeq
      .map(o => (o.key, o.t, o.x.getOrElse("~")) -> o.cum).toMap

  private def asMap(out: Seq[Out]): Map[(String, Long, String), Long] =
    out.map(o => (o.key, o.t, o.x.getOrElse("~")) -> o.cumApprox).toMap

  test("exact under capacity: static dataset equals the exact twin (ties, nulls)") {
    // fixture ndv « 2^12: the sketch never enters estimation mode, so
    // the estimates must EQUAL the exact cumulative counts
    val got = StreamingRunningDistinctSketch.withRunningDistinct(fixture.toDS())
      .collect().toSeq
    assert(asMap(got) === exactTruth(fixture))
    assert(got.filter(o => o.key == "a" && o.t == 1).map(_.cumApprox).toSet === Set(2L))
  }

  test("multi-batch == one-shot: the serialized sketch state replays stably") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val q = StreamingRunningDistinctSketch.withRunningDistinct(input.toDS())
      .writeStream.format("memory").queryName("srds_out")
      .outputMode("append").start()
    try {
      input.addData(fixture.filter(_.t <= 2))
      q.processAllAvailable()
      input.addData(fixture.filter(_.t > 2))
      q.processAllAvailable()
      val got = spark.table("srds_out").as[Out].collect().toSeq
      assert(asMap(got) === exactTruth(fixture))
    } finally q.stop()
  }

  test("state is ONE compact sketch: bounded bytes at any cardinality") {
    // 30k distinct values through one key: the exact twin's state would
    // hold 30k strings (~hundreds of KB and growing); the sketch state
    // stays under the 8·2^12-byte compact bound — asserted directly on
    // the serialized form the operator stores
    val lgK = 12
    val union = graft.expressions.ThetaOps.newUnion(lgK)
    (1 to 30000).foreach(i => union.update(s"value_$i"))
    val bytes = union.getResult.toByteArray.length
    assert(bytes <= 8 * (1 << lgK) + 64,
      s"compact sketch state grew past the bound: $bytes bytes")
    // and the operator still runs at that cardinality with a sane
    // relative error (theta at lgK=12: ~2% rse; allow 10%)
    val flood = (1 to 30000).map(i => Ev("k", (i / 100).toLong, Some(s"v$i")))
    val got = StreamingRunningDistinctSketch.withRunningDistinct(flood.toDS())
      .collect().toSeq
    val finalEst = got.filter(_.t == 300L).head.cumApprox.toDouble
    assert(math.abs(finalEst - 30000.0) / 30000.0 < 0.1,
      s"estimate drifted: $finalEst vs 30000")
  }
}
