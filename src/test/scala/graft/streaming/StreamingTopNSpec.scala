package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.streaming.StreamingTopN.{Ev, Out}

/** T14 — per-key leaderboard admission (the x145 family's streaming
  * twin): static == brute-force law, multi-batch == one-shot through
  * the bounded board state, board capped at n values per key.
  */
class StreamingTopNSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Ties at one t, values straddling the board edge, nulls, two keys. */
  private def fixture: Seq[Ev] = Seq(
    Ev("a", 1, Some(10.0)), Ev("a", 1, Some(10.0)), Ev("a", 2, Some(8.0)),
    Ev("a", 3, Some(12.0)), Ev("a", 4, Some(9.0)), Ev("a", 4, None),
    Ev("a", 5, Some(11.0)), Ev("a", 6, Some(7.0)),
    Ev("b", 1, Some(1.0)), Ev("b", 2, Some(2.0)), Ev("b", 3, Some(3.0)))

  private def asMap(out: Seq[Out]): Map[(String, Long, Option[Double]), (Int, Boolean)] =
    out.map(o => (o.key, o.t, o.v) -> (o.rankAtArrival, o.admitted)).toMap

  test("static dataset matches the brute-force admission law (ties, nulls, board edge)") {
    val got = StreamingTopN.withAdmission(fixture.toDS(), 2).collect().toSeq
    assert(asMap(got) === asMap(StreamingTopN.bruteForce(fixture, 2)))
    // peer law: the two t=1 ties are both judged against the EMPTY
    // pre-t board — both admitted at rank 1
    assert(got.filter(o => o.key == "a" && o.t == 1)
      .forall(o => o.rankAtArrival == 1 && o.admitted))
    // t=6's v=7 arrives below a full (12, 11) board: rank n+1, rejected
    val late = got.find(o => o.key == "a" && o.t == 6).get
    assert(late.rankAtArrival === 3 && !late.admitted)
  }

  test("multi-batch == one-shot across the board state") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val q = StreamingTopN.withAdmission(input.toDS(), 2)
      .writeStream.format("memory").queryName("stn_out")
      .outputMode("append").start()
    try {
      input.addData(fixture.filter(_.t <= 3))
      q.processAllAvailable()
      input.addData(fixture.filter(_.t > 3))
      q.processAllAvailable()
      val got = spark.table("stn_out").as[Out].collect().toSeq
      assert(asMap(got) === asMap(StreamingTopN.bruteForce(fixture, 2)))
    } finally q.stop()
  }

  test("board state is capped at n values whatever the stream length") {
    // 10k rows through one key: every emission's rank stays in [1, n+1]
    // and admissions equal the brute-force law — the board can never
    // have carried more than n values or the capped ranks would drift
    val n = 3
    val flood = (1 to 10000).map(i =>
      Ev("k", i.toLong, Some((i * 2654435761L % 997).toDouble)))
    val got = StreamingTopN.withAdmission(flood.toDS(), n).collect().toSeq
    assert(got.forall(o => o.rankAtArrival >= 1 && o.rankAtArrival <= n + 1))
    assert(asMap(got) === asMap(StreamingTopN.bruteForce(flood, n)))
    // seeded randomized battery across n
    val rnd = new scala.util.Random(4151)
    (1 to 4).foreach { round =>
      val nn = 1 + rnd.nextInt(4)
      val rows = (1 to 400).map(_ => Ev(s"k${rnd.nextInt(3)}",
        rnd.nextInt(40).toLong,
        if (rnd.nextInt(10) == 0) None else Some(rnd.nextInt(25).toDouble)))
      val g = StreamingTopN.withAdmission(rows.toDS(), nn).collect().toSeq
      // brute force is defined on the same multiset; compare as sorted seqs
      val want = StreamingTopN.bruteForce(rows, nn)
      assert(g.map(_.toString).sorted === want.map(_.toString).sorted,
        s"round $round (n=$nn) diverged")
    }
  }
}
