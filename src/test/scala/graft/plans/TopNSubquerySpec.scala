package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.Join
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The correlated-count top-n-per-group collapse (`TopNSubqueryRule`).
  *
  * Every parity test runs the SAME SQL twice — rule on (the session
  * default) vs `spark.graft.topn.rewrite=false` (Catalyst's domain-join
  * decorrelation) — and compares full row MULTISETS, so tie semantics
  * and null escapes are checked exactly.
  */
class TopNSubquerySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val fixture: Unit = {
    val dir = java.nio.file.Files.createTempDirectory("topn_").toString
    // null keys, null values, ties inside and straddling the cut
    val rows = Seq[(Option[Int], Option[Int], Long)](
      (Some(1), Some(10), 1L), (Some(1), Some(10), 2L), (Some(1), Some(8), 3L),
      (Some(1), Some(8), 4L), (Some(1), Some(3), 5L),
      (Some(2), Some(7), 6L), (Some(2), None, 7L),
      (Some(3), None, 8L),
      (None, Some(99), 9L),
      (Some(4), Some(0), 10L))
    rows.toDF("k", "v", "id").write.parquet(s"$dir/t")
    spark.read.parquet(s"$dir/t").createOrReplaceTempView("tpn")
    val big = (1 to 2000).map(i => (i % 23, i % 97, i.toLong))
    big.toDF("k", "v", "id").write.parquet(s"$dir/big")
    spark.read.parquet(s"$dir/big").createOrReplaceTempView("tpn_big")
  }

  private def multiset(df: DataFrame): Map[String, Int] =
    df.collect().map(_.toString).groupBy(identity).map { case (s, a) => s -> a.length }

  /** Runs sql rule-on and rule-off; asserts identical multisets, returns
    * whether the rule-on optimized plan is join-free (i.e. the rewrite
    * fired — the decorrelated form always joins).
    */
  private def parity(sql: String): Boolean = {
    fixture
    val on = spark.sql(sql)
    val joinFree = on.queryExecution.optimizedPlan.collect { case j: Join => j }.isEmpty
    val got = multiset(on)
    spark.conf.set(TopNSubqueryRule.RewriteConf, "false")
    try {
      val want = multiset(spark.sql(sql))
      assert(got === want, s"rule-on result diverged for:\n$sql")
    } finally spark.conf.set(TopNSubqueryRule.RewriteConf, "true")
    joinFree
  }

  test("top-3 per key: count < n collapses to a join-free rank filter") {
    assert(parity(
      """SELECT k, v, id FROM tpn_big t
        |WHERE (SELECT count(*) FROM tpn_big t2
        |       WHERE t2.k = t.k AND t2.v > t.v) < 3""".stripMargin),
      "expected the correlated count to collapse")
  }

  test("ties straddling the cut keep ALL peers, exactly like the count") {
    fixture
    // k=1 values: 10,10,8,8,3 — rows with fewer than 2 strictly greater:
    // both 10s (0 greater) and both 8s (2 greater? no: 2 greater → fails <2)
    val ids = spark.sql(
      """SELECT id FROM tpn t
        |WHERE (SELECT count(*) FROM tpn t2
        |       WHERE t2.k = t.k AND t2.v > t.v) < 2 AND t.k = 1""".stripMargin)
      .as[Long].collect().sorted
    assert(ids === Array(1L, 2L))
  }

  test("null keys and null values pass (count = 0), like the correlation") {
    fixture
    val ids = spark.sql(
      """SELECT id FROM tpn t
        |WHERE (SELECT count(*) FROM tpn t2
        |       WHERE t2.k = t.k AND t2.v > t.v) < 1""".stripMargin)
      .as[Long].collect().sorted
    // top-1 per key (10,10 tie for k=1; 7 for k=2) plus every null-k /
    // null-v row (their correlated count is 0)
    assert(ids === Array(1L, 2L, 6L, 7L, 8L, 9L, 10L))
  }

  test("<= n, reversed comparison, bottom-n (v2 < v), count(v2) all collapse") {
    for (sql <- Seq(
      // <= and the reversed literal-first spelling
      """SELECT k, v, id FROM tpn_big t
        |WHERE (SELECT count(*) FROM tpn_big t2
        |       WHERE t2.k = t.k AND t2.v > t.v) <= 2""".stripMargin,
      """SELECT k, v, id FROM tpn_big t
        |WHERE 3 > (SELECT count(*) FROM tpn_big t2
        |           WHERE t2.k = t.k AND t2.v > t.v)""".stripMargin,
      // bottom-n: strictly smaller
      """SELECT k, v, id FROM tpn_big t
        |WHERE (SELECT count(*) FROM tpn_big t2
        |       WHERE t2.k = t.k AND t2.v < t.v) < 3""".stripMargin,
      // count of the inequality column (non-null by the correlation)
      """SELECT k, v, id FROM tpn_big t
        |WHERE (SELECT count(t2.v) FROM tpn_big t2
        |       WHERE t2.k = t.k AND t2.v > t.v) < 3""".stripMargin))
      assert(parity(sql), s"expected collapse for:\n$sql")
  }

  test("count(DISTINCT v) correlation is a DENSE rank: top-n distinct levels (r14)") {
    fixture
    // k=1 values 10,10,8,8,3: fewer than 2 distinct greater values keeps
    // 10,10 (0 greater) and 8,8 (1 distinct greater) — NOT what plain
    // rank would keep
    val ids = spark.sql(
      """SELECT id FROM tpn t
        |WHERE (SELECT count(DISTINCT t2.v) FROM tpn t2
        |       WHERE t2.k = t.k AND t2.v > t.v) < 2 AND t.k = 1""".stripMargin)
      .as[Long].collect().sorted
    assert(ids === Array(1L, 2L, 3L, 4L))
    assert(parity(
      """SELECT k, v, id FROM tpn_big t
        |WHERE (SELECT count(DISTINCT t2.v) FROM tpn_big t2
        |       WHERE t2.k = t.k AND t2.v > t.v) < 3""".stripMargin),
      "expected the dense-rank collapse")
    // DISTINCT over a DIFFERENT column is not a rank: refusal + parity
    assert(parity(
      """SELECT k, v, id FROM tpn_big t
        |WHERE (SELECT count(DISTINCT t2.id) FROM tpn_big t2
        |       WHERE t2.k = t.k AND t2.v > t.v) < 3""".stripMargin) === false,
      "must refuse count(DISTINCT other-column)")
  }

  test("multi-key correlation partitions on all keys") {
    assert(parity(
      """SELECT k, v, id FROM tpn_big t
        |WHERE (SELECT count(*) FROM tpn_big t2
        |       WHERE t2.k = t.k AND t2.id % 2 = t.id % 2
        |         AND t2.v > t.v) < 2""".stripMargin) === false)
    // expression correlation (id % 2) is not a bare column twin → refusal
    // with parity; the bare two-column form collapses:
    spark.sql("SELECT k, v, id, CAST(id % 2 AS INT) AS par FROM tpn_big")
      .createOrReplaceTempView("tpn_par")
    assert(parity(
      """SELECT k, v, id FROM tpn_par t
        |WHERE (SELECT count(*) FROM tpn_par t2
        |       WHERE t2.k = t.k AND t2.par = t.par AND t2.v > t.v) < 2""".stripMargin),
      "expected the two-key collapse")
  }

  test("TWO correlated counts in one filter both collapse — stacked windows (r15, ADVICE r14)") {
    // top-2 by v AND top-5 by id, both as correlated counts in one
    // WHERE: r14 rewrote only the first conjunct, leaving the second to
    // the quadratic domain join; r15 stacks one rank window per
    // conjunct over the SAME single scan
    assert(parity(
      """SELECT k, v, id FROM tpn_big t
        |WHERE (SELECT count(*) FROM tpn_big t2
        |       WHERE t2.k = t.k AND t2.v > t.v) < 2
        |  AND (SELECT count(*) FROM tpn_big t3
        |       WHERE t3.k = t.k AND t3.id > t.id) < 5""".stripMargin),
      "expected BOTH correlated counts to collapse (join-free plan)")
    // and with an uncorrelated extra conjunct riding along
    assert(parity(
      """SELECT k, v, id FROM tpn_big t
        |WHERE (SELECT count(*) FROM tpn_big t2
        |       WHERE t2.k = t.k AND t2.v > t.v) < 3
        |  AND (SELECT count(*) FROM tpn_big t3
        |       WHERE t3.k = t.k AND t3.id > t.id) < 4
        |  AND k <> 5""".stripMargin),
      "expected both collapses with the residual predicate kept")
  }

  test("refusals: >= / <= correlations, aggregates besides count, extra filters, HAVING-less shape breaks") {
    fixture
    val refusals = Seq(
      // peer-inclusive >=: counts the row's own tie group — NOT a rank
      """SELECT k, v, id FROM tpn_big t
        |WHERE (SELECT count(*) FROM tpn_big t2
        |       WHERE t2.k = t.k AND t2.v >= t.v) <= 3""".stripMargin,
      // sum, not count
      """SELECT k, v, id FROM tpn_big t
        |WHERE (SELECT sum(t2.v) FROM tpn_big t2
        |       WHERE t2.k = t.k AND t2.v > t.v) < 100""".stripMargin,
      // count of a column that is NOT the inequality column
      """SELECT k, v, id FROM tpn_big t
        |WHERE (SELECT count(t2.id) FROM tpn_big t2
        |       WHERE t2.k = t.k AND t2.v > t.v) < 3""".stripMargin,
      // extra uncorrelated predicate inside the subquery: different rows
      """SELECT k, v, id FROM tpn_big t
        |WHERE (SELECT count(*) FROM tpn_big t2
        |       WHERE t2.k = t.k AND t2.v > t.v AND t2.id > 100) < 3""".stripMargin,
      // different lineage
      """SELECT k, v, id FROM tpn_big t
        |WHERE (SELECT count(*) FROM tpn t2
        |       WHERE t2.k = t.k AND t2.v > t.v) < 3""".stripMargin,
      // degenerate n = 0: no row can pass a 0-count check wrongly
      """SELECT k, v, id FROM tpn_big t
        |WHERE (SELECT count(*) FROM tpn_big t2
        |       WHERE t2.k = t.k AND t2.v > t.v) < 0""".stripMargin)
    refusals.foreach { sql =>
      assert(parity(sql) === false, s"rule must refuse but keep parity:\n$sql")
    }
  }

  test("randomized parity battery: seeded nullable data, on == off") {
    val dir = java.nio.file.Files.createTempDirectory("topn_rand_").toString
    for (seed <- 1 to 3) {
      val rnd = new scala.util.Random(seed * 7907)
      val rows = (1 to 500).map { i =>
        val k = if (rnd.nextInt(12) == 0) None else Some(rnd.nextInt(9))
        val v = if (rnd.nextInt(9) == 0) None else Some(rnd.nextInt(25))
        (k, v, i.toLong)
      }
      rows.toDF("k", "v", "id").write.mode("overwrite").parquet(s"$dir/t$seed")
      spark.read.parquet(s"$dir/t$seed").createOrReplaceTempView("tpn_rnd")
      for (n <- Seq(1, 2, 4); op <- Seq("<", "<=")) {
        assert(parity(
          s"""SELECT k, v, id FROM tpn_rnd t
             |WHERE (SELECT count(*) FROM tpn_rnd t2
             |       WHERE t2.k = t.k AND t2.v > t.v) $op $n""".stripMargin),
          s"seed=$seed n=$n op=$op did not collapse")
      }
    }
  }

  test("parquet-backed top-2 orders per customer plans one scan, no join") {
    val orders = spark.read.parquet(s"${TestSpark.Sf0001}/orders.parquet")
    orders.createOrReplaceTempView("tpn_orders")
    val sql =
      """SELECT o_orderkey, o_custkey, o_totalprice FROM tpn_orders t
        |WHERE (SELECT count(*) FROM tpn_orders t2
        |       WHERE t2.o_custkey = t.o_custkey
        |         AND t2.o_totalprice > t.o_totalprice) < 2""".stripMargin
    val q = spark.sql(sql)
    assert(q.queryExecution.optimizedPlan.collect { case j: Join => j }.isEmpty,
      s"join survived:\n${q.queryExecution.optimizedPlan}")
    val scans = q.queryExecution.executedPlan.toString
      .linesIterator.count(_.contains("Scan parquet"))
    assert(scans === 1, s"expected exactly one scan:\n${q.queryExecution.executedPlan}")
    spark.conf.set(TopNSubqueryRule.RewriteConf, "false")
    try assert(multiset(q) === multiset(spark.sql(sql)))
    finally spark.conf.set(TopNSubqueryRule.RewriteConf, "true")
  }

  test("opt-out conf keeps Catalyst's decorrelated plan") {
    fixture
    spark.conf.set(TopNSubqueryRule.RewriteConf, "false")
    try {
      val q = spark.sql(
        """SELECT k, v, id FROM tpn_big t
          |WHERE (SELECT count(*) FROM tpn_big t2
          |       WHERE t2.k = t.k AND t2.v > t.v) < 3""".stripMargin)
      assert(q.queryExecution.optimizedPlan.collect { case j: Join => j }.nonEmpty)
    } finally spark.conf.set(TopNSubqueryRule.RewriteConf, "true")
  }
}
