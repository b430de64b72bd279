package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.streaming.StreamingInterp.PtIn

/** The streaming twin of x137's linear interpolation: one-point state
  * per key, a hole's interior emits exactly when its closing point
  * arrives — stream == batch replay, multi-batch == one-shot, and the
  * integer lerp matches the batch operator's floor division on negative
  * slopes.
  */
class StreamingInterpSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Two keys, holes of width 1–3, rising and falling slopes (the
    * falling segments pin the positive-mod floor division). */
  private def fixture: Seq[PtIn] =
    Seq(
      PtIn("A", 10, 10000L), PtIn("A", 11, 10100L), PtIn("A", 14, 9400L),
      PtIn("A", 15, 9500L), PtIn("A", 19, 10300L),
      PtIn("B", 10, 500L), PtIn("B", 12, 490L), PtIn("B", 13, 487L),
      PtIn("B", 17, 515L))

  /** Batch truth: the x137 spelling over the same points. */
  private def batchTruth(rows: Seq[PtIn]): Seq[String] = {
    rows.toDF("key", "day", "cents").createOrReplaceTempView("sint_t")
    spark.sql(
      """WITH seg AS (
        |  SELECT key, day, cents,
        |    lag(day) OVER (PARTITION BY key ORDER BY day) AS d0,
        |    lag(cents) OVER (PARTITION BY key ORDER BY day) AS v0
        |  FROM sint_t),
        |interp AS (
        |  SELECT key, d0 + off AS day,
        |    v0 + (n - pmod(n, dd)) div dd AS cents, 'interp' AS src
        |  FROM (SELECT key, d0, v0, off,
        |          (cents - v0) * CAST(off AS BIGINT) AS n,
        |          CAST(day - d0 AS BIGINT) AS dd
        |        FROM seg
        |        LATERAL VIEW explode(sequence(1, day - d0 - 1)) t AS off
        |        WHERE d0 IS NOT NULL AND day - d0 > 1))
        |SELECT key, day, cents, 'known' AS src FROM sint_t
        |UNION ALL SELECT * FROM interp""".stripMargin)
      .collect().map(_.toString).sorted.toSeq
  }

  test("static dataset matches the batch interpolation, negative slopes included") {
    val got = StreamingInterp.withInterpolation(fixture.toDS())
      .toDF().collect().map(_.toString).sorted.toSeq
    assert(got === batchTruth(fixture))
    // hand-check one falling hole: B 13→17 (487 → 515, +28 over 4 days)
    val b = StreamingInterp.withInterpolation(fixture.toDS())
      .filter(r => r.key == "B" && r.src == "interp").collect()
      .map(r => r.day -> r.cents).toMap
    assert(b(14) === 494L && b(15) === 501L && b(16) === 508L)
    // falling segment B 10→12 (500 → 490): floor division, not truncation
    assert(b(11) === 495L)
  }

  test("multi-batch == one-shot; holes emit when the closing point arrives") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[PtIn]
    val q = StreamingInterp.withInterpolation(input.toDS()).toDF()
      .writeStream.format("memory").queryName("sint_out")
      .outputMode("append").start()
    try {
      // batch 1 OPENS a hole (A: 11 then nothing): nothing interpolated
      input.addData(PtIn("A", 10, 10000L), PtIn("A", 11, 10100L))
      q.processAllAvailable()
      assert(spark.table("sint_out").where(col("src") === "interp").count() === 0)
      // batch 2 closes it across the batch boundary: interior emits now
      input.addData(PtIn("A", 14, 9400L), PtIn("B", 10, 500L))
      q.processAllAvailable()
      val interp = spark.table("sint_out").where(col("src") === "interp")
        .orderBy("day").select("day", "cents").collect()
      // floor((9400-10100)*1/3) = -234, floor(-1400/3) = -467
      assert(interp.map(r => (r.getInt(0), r.getLong(1))).toSeq ===
        Seq((12, 9866L), (13, 9633L)))
      // batch 3: the rest — total equals the one-shot static run
      input.addData(PtIn("A", 15, 9500L), PtIn("A", 19, 10300L),
        PtIn("B", 12, 490L), PtIn("B", 13, 487L), PtIn("B", 17, 515L))
      q.processAllAvailable()
      val got = spark.table("sint_out").collect().map(_.toString).sorted.toSeq
      assert(got === batchTruth(fixture))
    } finally q.stop()
  }

  test("state is one point per key: a restartless long stream cannot grow it") {
    // structural pin: the state type holds exactly (day, cents)
    val st = StreamingInterp.LastPoint(1, 2L)
    assert(st.productArity === 2)
  }
}
