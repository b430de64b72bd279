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

  test("left-outer attribution: unmatched clicks emit null rows only after the horizon closes") {
    implicit val sc = spark.sqlContext
    val clicks = MemoryStream[Click]
    val buys = MemoryStream[Purchase]
    val out = StreamJoins.intervalJoinLeftOuter(
      clicks.toDF().withColumnRenamed("user", "user_id"),
      buys.toDF().withColumnRenamed("user", "user_id"),
      "user_id", "click_ts", "buy_ts",
      watermark = "5 minutes", horizon = "10 minutes")
    val q = out.writeStream.format("memory").queryName("attr_lo_out")
      .outputMode("append").start()
    try {
      def rows() = spark.table("attr_lo_out")
        .select("click_id", "buy_id")
        .collect().map(r => r.getLong(0) ->
          (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toSet

      // user 1 converts in-horizon; user 2 clicks and never buys
      clicks.addData(Click(t(0), 1L, 100L), Click(t(1), 2L, 200L))
      buys.addData(Purchase(t(5), 1L, 900L))
      q.processAllAvailable()
      // user 2's horizon [10:01, 10:11] is not yet provably over (the
      // watermark sits near 10:00) — emitting the null row NOW could be
      // wrong, a purchase at 10:10 may still arrive. Pin the timing.
      assert(!rows().exists(_._1 == 200L),
        s"null attribution emitted before the horizon closed: ${rows()}")

      // advance both watermarks past 10:01 + 10m horizon + 5m watermark
      clicks.addData(Click(t(40), 9L, 999L))
      buys.addData(Purchase(t(40), 9L, 998L))
      q.processAllAvailable()
      // one more nudge batch: unmatched-row eviction fires on the batch
      // AFTER the watermark advances
      clicks.addData(Click(t(45), 8L, 888L))
      buys.addData(Purchase(t(46), 7L, 777L))
      q.processAllAvailable()

      val got = rows()
      assert(got.contains(100L -> Some(900L)), s"matched row missing: $got")
      assert(got.contains(200L -> None),
        s"unmatched click never got its null attribution: $got")
      assert(got.count(_._1 == 200L) === 1,
        s"unmatched click must emit exactly once: $got")
    } finally q.stop()
  }

  test("left-outer join state plateaus at the watermark horizon") {
    implicit val sc = spark.sqlContext
    val clicks = MemoryStream[Click]
    val buys = MemoryStream[Purchase]
    // every click unmatched (disjoint users): pure null-emission load
    val out = StreamJoins.intervalJoinLeftOuter(
      clicks.toDF().withColumnRenamed("user", "user_id"),
      buys.toDF().withColumnRenamed("user", "user_id"),
      "user_id", "click_ts", "buy_ts",
      watermark = "1 minutes", horizon = "2 minutes")
    val q = out.writeStream.format("memory").queryName("attr_lo_soak")
      .outputMode("append").start()
    try {
      val rows = (0 until 6).map { b =>
        clicks.addData((0 until 3).map(j => Click(t(8 * b), 1000L + b * 10L + j, b * 100L + j)): _*)
        buys.addData((0 until 3).map(j => Purchase(t(8 * b), 2000L + b * 10L + j, b * 100L + j)): _*)
        q.processAllAvailable()
        q.lastProgress.stateOperators(0).numRowsTotal
      }
      val tail = rows.drop(3)
      assert(tail.forall(_ <= 12L),
        s"left-outer join state not watermark-bounded: $rows")
      // and the unmatched clicks did flow out as null rows
      val nulls = spark.table("attr_lo_soak").filter("buy_id IS NULL").count()
      assert(nulls >= 3, s"no null attributions emitted in the soak: $nulls")
    } finally q.stop()
  }

  test("malformed horizon strings are rejected at construction") {
    implicit val sc = spark.sqlContext
    val clicks = MemoryStream[Click]
    val buys = MemoryStream[Purchase]
    def build(h: String) = StreamJoins.intervalJoin(
      clicks.toDF().withColumnRenamed("user", "user_id"),
      buys.toDF().withColumnRenamed("user", "user_id"),
      "user_id", "click_ts", "buy_ts", watermark = "5 minutes", horizon = h)
    intercept[IllegalArgumentException](build("10 minutes'; DROP TABLE x"))
    intercept[IllegalArgumentException](build("soon"))
    intercept[IllegalArgumentException](build("-3 minutes"))
    build("10 minutes") // the valid shape still constructs
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

  test("stream-static enrichment joins each micro-batch against the dim, stateless") {
    implicit val sc = spark.sqlContext
    val clicks = MemoryStream[Click]
    val dim = Seq((1L, "gold"), (2L, "silver")).toDF("user", "tier")
    val out = StreamJoins.enrich(clicks.toDF(), dim, "user")
    val q = out.writeStream.format("memory").queryName("enrich_out")
      .outputMode("append").start()
    try {
      clicks.addData(Click(t(0), 1L, 100L), Click(t(1), 2L, 200L),
        Click(t(2), 7L, 700L)) // 7 has no dim row → null tier (left join)
      q.processAllAvailable()
      val got = spark.table("enrich_out")
        .select("click_id", "tier").collect()
        .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
      assert(got === Map(100L -> Some("gold"), 200L -> Some("silver"),
        700L -> None))
      // stateless: no state store operator participates at all
      assert(q.lastProgress.stateOperators.isEmpty,
        "enrichment must not allocate join state")
      // a later batch joins the same dim again
      clicks.addData(Click(t(3), 2L, 201L))
      q.processAllAvailable()
      val n = spark.table("enrich_out")
        .filter($"click_id" === 201L && $"tier" === "silver").count()
      assert(n === 1L)
    } finally q.stop()
  }
}
