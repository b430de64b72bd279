package graft.text

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class EditDistanceJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val words = Seq("alpha", "bravo", "charlie", "delta", "echo", "fox", "golf")
  private def corpus = (0 until 300)
    .map(i => (i.toLong, s"record $i ${words(i % 7)}")).toDF("doc_id", "s")

  // probes: exact copy (d=0), mid-string substitution (d=1), two
  // substitutions (d=2), and an unrelated string
  private def probes = Seq(
    (9000L, "record 17 delta"),                  // == doc 17
    (9001L, "recXrd 42 alpha"),                  // 1 sub of doc 42
    (9002L, "rXcXrd 99 bravo"),                  // 2 subs of doc 99
    (9003L, "completely unrelated text")
  ).toDF("probe_id", "s")

  private def brute(maxD: Int): Set[(Long, Long)] =
    probes.select(col("probe_id"), col("s").as("__a"))
      .crossJoin(corpus.select(col("doc_id"), col("s").as("__b")))
      .filter(levenshtein(col("__a"), col("__b")) <= maxD)
      .select("probe_id", "doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("d=1: pigeonhole blocking + verify equals brute force exactly") {
    val got = EditDistanceJoin.join(probes, corpus, 1)
      .select("probe_id", "doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = brute(1)
    assert(got === expected, s"missing=${expected -- got} extra=${got -- expected}")
    assert(got.contains((9000L, 17L)) && got.contains((9001L, 42L)))
    assert(!got.exists(_._1 == 9002L), "2-edit probe must not match at d=1")
    assert(!got.exists(_._1 == 9003L))
  }

  test("d=2 widens exactly to the brute-force <=2 set") {
    val got = EditDistanceJoin.join(probes, corpus, 2)
      .select("probe_id", "doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === brute(2))
    assert(got.contains((9002L, 99L)), "2-edit probe must match at d=2")
  }

  test("reported distances are the true Levenshtein distances") {
    val d = EditDistanceJoin.join(probes, corpus, 2)
      .filter(col("probe_id") === 9002L && col("doc_id") === 99L)
      .select("dist").head().getLong(0)
    assert(d === 2L)
  }

  test("strings shorter than d+1 chars keep completeness (short-sliver branch)") {
    val l = Seq((1L, "a"), (2L, "ab"), (3L, "xyz")).toDF("probe_id", "s")
    val r = Seq((10L, "ab"), (11L, "b"), (12L, "abc"), (13L, "xxyz"),
      (14L, "zzzz")).toDF("doc_id", "s")
    val got = EditDistanceJoin.join(l, r, 1)
      .select("probe_id", "doc_id").collect()
      .map(x => (x.getLong(0), x.getLong(1))).toSet
    val expected = l.select(col("probe_id"), col("s").as("__a"))
      .crossJoin(r.select(col("doc_id"), col("s").as("__b")))
      .filter(levenshtein(col("__a"), col("__b")) <= 1)
      .select("probe_id", "doc_id").collect()
      .map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(got === expected, s"missing=${expected -- got} extra=${got -- expected}")
    assert(expected.contains((1L, 11L)), "sanity: 'a'~'b' is a 1-edit pair")
  }

  test("blocking join never plans a product") {
    val p = EditDistanceJoin.join(probes, corpus, 1)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"edit-distance join degenerated to a product:\n$p")
  }
}
