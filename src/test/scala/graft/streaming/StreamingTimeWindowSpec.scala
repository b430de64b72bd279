package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.streaming.StreamingTimeWindow.EvIn

/** The streaming twin of the batch trailing-by-event-time value frame
  * (x124 / RangeAggExec): per-key value-retention deque state, peer runs
  * share frames, eviction past Δ — stream == batch bit-for-bit,
  * multi-batch == one-shot.
  */
class StreamingTimeWindowSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val DayUs = 86400000000L

  /** Tie-heavy two-key fixture: instants repeat within and across keys. */
  private def fixture: Seq[EvIn] =
    (0 until 120).map { i =>
      EvIn(if (i % 3 == 0) "B" else "A",
        (i % 40).toLong * (DayUs / 4) + (i % 5) * 17L,
        (i * 37 % 100).toLong)
    }

  private def batchTruth(rows: Seq[EvIn], deltaUs: Long) = {
    rows.toDS().createOrReplaceTempView("stw_t")
    spark.sql(
      s"""SELECT key, us, v,
         |  sum(v)   OVER w AS w_sum,
         |  count(*) OVER w AS w_n
         |FROM stw_t
         |WINDOW w AS (PARTITION BY key ORDER BY us
         |  RANGE BETWEEN $DayUs PRECEDING AND CURRENT ROW)""".stripMargin)
      .collect().map(_.toString).sorted.toSeq
  }

  test("static dataset matches the batch RANGE window bit-for-bit (peers included)") {
    val rows = fixture
    val got = StreamingTimeWindow.withTrailingSum(rows.toDS(), DayUs)
      .toDF().collect().map(_.toString).sorted.toSeq
    assert(got === batchTruth(rows, DayUs))
  }

  test("multi-batch == one-shot when instants do not straddle batches; eviction past delta") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EvIn]
    val q = StreamingTimeWindow.withTrailingSum(input.toDS(), DayUs).toDF()
      .writeStream.format("memory").queryName("stw_out")
      .outputMode("append").start()
    try {
      // split at an instant boundary (us strictly increases across the
      // split), with a > delta gap inside batch 2 to pin eviction
      val b1 = Seq(EvIn("A", 0L, 1), EvIn("A", 0L, 2), EvIn("A", DayUs / 2, 3))
      val b2 = Seq(EvIn("A", DayUs, 4),          // frame: all of b1 + this
        EvIn("A", 10L * DayUs, 7),               // > delta later: frame = itself
        EvIn("A", 10L * DayUs + 1, 5))           // + the row just before
      input.addData(b1: _*)
      q.processAllAvailable()
      input.addData(b2: _*)
      q.processAllAvailable()
      val got = spark.table("stw_out")
        .collect().map(_.toString).sorted.toSeq
      assert(got === batchTruth(b1 ++ b2, DayUs))
      // the eviction hand-check: the post-gap rows saw only themselves
      val gap = spark.table("stw_out").where(col("us") >= 10L * DayUs)
        .orderBy("us").select("w_sum", "w_n").collect()
      assert(gap.map(r => (r.getLong(0), r.getLong(1))).toSeq ===
        Seq((7L, 1L), (12L, 2L)))
    } finally q.stop()
  }

  test("multi-batch over the tie-heavy fixture == one-shot batch") {
    implicit val sqlCtx = spark.sqlContext
    // order by (us, v) and split at an instant boundary
    val ordered = fixture.sortBy(e => (e.us, e.v))
    val cut = {
      val mid = ordered.length / 2
      var c = mid
      while (c < ordered.length && ordered(c).us == ordered(mid - 1).us) c += 1
      c
    }
    val input = MemoryStream[EvIn]
    val q = StreamingTimeWindow.withTrailingSum(input.toDS(), DayUs).toDF()
      .writeStream.format("memory").queryName("stw_out2")
      .outputMode("append").start()
    try {
      input.addData(ordered.take(cut): _*)
      q.processAllAvailable()
      input.addData(ordered.drop(cut): _*)
      q.processAllAvailable()
      val got = spark.table("stw_out2").collect().map(_.toString).sorted.toSeq
      assert(got === batchTruth(fixture, DayUs))
    } finally q.stop()
  }
}
