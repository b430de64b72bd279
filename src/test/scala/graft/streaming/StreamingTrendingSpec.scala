package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, TestSpark}
import StreamingTrending.Ev

/** The streaming trending head must equal the batch x91 recompute
  * bit-for-bit — the power-of-two decay makes the per-key ring state
  * exact, so there is no approximation to tolerate.
  */
class StreamingTrendingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def fixtureEvs = graft.tables.Tables
    .events(spark, TestSpark.Sf0001)
    .select(col("event_type"),
      expr("unix_micros(ts) div 86400000000").as("epoch_day"))
    .as[Ev]

  test("static backfill equals the batch x91 recompute on the fixture") {
    // x91 anchors every key at the GLOBAL max day; the streaming state
    // anchors per key. They coincide exactly when each key has events
    // on the global anchor day — assert that precondition, then parity.
    val evs = fixtureEvs
    val globalAnchor = evs.agg(max("epoch_day")).head().getLong(0)
    val keyAnchors = evs.groupBy("event_type").agg(max("epoch_day"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(keyAnchors.values.forall(_ == globalAnchor),
      "fixture precondition: every type active on the anchor day")

    val streamed = StreamingTrending.trending(evs).collect()
      .map(o => o.event_type -> ((o.n_recent, o.score))).toMap
    val batch = SparkEntry.queries("x91_decayed_trending")(
        spark, TestSpark.Sf0001).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(streamed === batch)
  }

  test("multi-batch arrival converges to the same head as one-shot") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = StreamingTrending.trending(mem.toDS())
      .writeStream.format("memory").queryName("trend_head")
      .outputMode("append").start()
    // batch 1: old days (some already beyond the final horizon)
    mem.addData(
      (Seq.fill(5)(Ev("a", 100L)) ++ Seq.fill(3)(Ev("a", 110L)) ++
        Seq.fill(2)(Ev("b", 112L))): _*)
    q.processAllAvailable()
    // batch 2: the horizon advances; day 100 (age 19) must fall out
    mem.addData(
      (Seq.fill(7)(Ev("a", 119L)) ++ Seq.fill(1)(Ev("a", 113L)) ++
        Seq.fill(4)(Ev("b", 118L))): _*)
    q.processAllAvailable()
    // head = the row with the most-advanced anchor per key (the anchor
    // strictly advances across triggers, so max_by is the latest head)
    val heads = spark.table("trend_head")
      .groupBy("event_type")
      .agg(expr("max_by(n_recent, anchor_day)").as("n"),
        expr("max_by(score, anchor_day)").as("s"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    q.stop()

    val oneShot = StreamingTrending.trending(
      (Seq.fill(5)(Ev("a", 100L)) ++ Seq.fill(3)(Ev("a", 110L)) ++
        Seq.fill(2)(Ev("b", 112L)) ++ Seq.fill(7)(Ev("a", 119L)) ++
        Seq.fill(1)(Ev("a", 113L)) ++ Seq.fill(4)(Ev("b", 118L))).toDS())
      .collect().map(o => o.event_type -> ((o.n_recent, o.score))).toMap
    assert(heads === oneShot)
    // hand-check 'a' at anchor 119: day 110 age 9 (3·2^5), 113 age 6
    // (1·2^8), 119 age 0 (7·2^14); day 100 aged out
    assert(heads("a") === ((11L, 3L * 32 + 256 + 7L * 16384)))
  }
}
