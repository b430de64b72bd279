package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class PlanLintSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("lint_").toString
    (1 to 500).map(i => (i.toLong, i % 7, i % 50)).toDF("id", "k", "v")
      .write.parquet(s"$d/t")
    d
  }

  private def t = spark.read.parquet(s"$dir/t")

  private def rules(df: org.apache.spark.sql.DataFrame): Seq[String] =
    PlanLint.findings(df).map(_.rule)

  test("a clean aggregate reports only the shuffle census") {
    val f = PlanLint.findings(t.groupBy("k").agg(sum("v")))
    assert(f.map(_.rule) === Seq("shuffle-census"))
    assert(f.head.detail.startsWith("1 shuffle"))
  }

  test("cartesian product is an error finding") {
    val big = t
    val other = t.withColumnRenamed("id", "id2")
      .withColumnRenamed("k", "k2").withColumnRenamed("v", "v2")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val f = PlanLint.findings(big.crossJoin(other))
      assert(f.exists(x => x.rule == "cartesian-product" && x.severity == "error"),
        f.mkString("\n"))
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("broadcast nested-loop join is a warn finding") {
    val small = Seq((1, "a")).toDF("sk", "sv")
    val f = PlanLint.findings(t.crossJoin(small))
    assert(f.exists(x => x.rule == "nested-loop-join" && x.severity == "warn"),
      f.mkString("\n"))
  }

  test("unpartitioned window is an error; healed plan is clean") {
    val w = Window.orderBy("id")
    val q = t.withColumn("rn", row_number().over(w))
    // with the extensions active the rewrite family heals it — no finding
    assert(!rules(q).contains("unpartitioned-window"), rules(q).mkString(","))
    spark.conf.set("spark.graft.globalRank.rewrite", "false")
    try {
      val f = PlanLint.findings(t.withColumn("rn", row_number().over(w)))
      assert(f.exists(x => x.rule == "unpartitioned-window" && x.severity == "error"),
        f.mkString("\n"))
    } finally spark.conf.set("spark.graft.globalRank.rewrite", "true")
  }

  test("a surviving keyed window is an info finding") {
    spark.conf.set("spark.graft.keyedWindow.rewrite", "false")
    try {
      val w = Window.partitionBy("k").orderBy("id")
      val f = PlanLint.findings(t.withColumn("s", sum("v").over(w)))
      assert(f.exists(x => x.rule == "keyed-window" && x.severity == "info"),
        f.mkString("\n"))
    } finally spark.conf.set("spark.graft.keyedWindow.rewrite", "true")
  }

  test("untranslatable scan predicate reports an unpushed filter; pushable one does not") {
    val f1 = PlanLint.findings(t.filter(abs($"v") > 30))
    assert(f1.exists(_.rule == "unpushed-scan-filter"), f1.mkString("\n"))
    val f2 = PlanLint.findings(t.filter($"v" > 30))
    assert(!f2.exists(_.rule == "unpushed-scan-filter"), f2.mkString("\n"))
  }

  test("self-join against its own aggregate is an info finding; healed plan is clean (r14)") {
    t.createOrReplaceTempView("lint_sj")
    val sql =
      """SELECT t.* FROM lint_sj t
        |JOIN (SELECT k, max(v) AS m FROM lint_sj GROUP BY k) a
        |ON t.k = a.k AND t.v = a.m""".stripMargin
    // stock-session shape: rule off → the two-scan join survives and the
    // linter names it, pointing at the rewrite confs
    spark.conf.set("spark.graft.argmaxJoin.rewrite", "false")
    try {
      val f = PlanLint.findings(spark.sql(sql))
      val hit = f.find(_.rule == "self-join-aggregate")
      assert(hit.exists(_.severity == "info"), f.mkString("\n"))
      assert(hit.exists(_.detail.contains("argmaxJoin")), f.mkString("\n"))
    } finally spark.conf.set("spark.graft.argmaxJoin.rewrite", "true")
    // with the extensions active the join is eliminated → no finding
    assert(!rules(spark.sql(sql)).contains("self-join-aggregate"),
      rules(spark.sql(sql)).mkString(","))
    // the DECORRELATED top-n domain join (topn rule off) is the same
    // anti-pattern shape — the aggregate side scans the probe relation —
    // and must be named too
    spark.conf.set("spark.graft.topn.rewrite", "false")
    try {
      val topn = spark.sql(
        """SELECT * FROM lint_sj t
          |WHERE (SELECT count(*) FROM lint_sj t2
          |       WHERE t2.k = t.k AND t2.v > t.v) < 2""".stripMargin)
      assert(rules(topn).contains("self-join-aggregate"),
        rules(topn).mkString(","))
    } finally spark.conf.set("spark.graft.topn.rewrite", "true")
    // a join against an aggregate of a DIFFERENT relation stays silent
    (1 to 40).map(i => (i % 7, i.toLong)).toDF("k2", "w")
      .write.mode("overwrite").parquet(s"$dir/u")
    val other = spark.read.parquet(s"$dir/u")
      .groupBy("k2").agg(sum("w").as("sw"))
    val diff = t.join(other, $"k" === $"k2")
    assert(!rules(diff).contains("self-join-aggregate"), rules(diff).mkString(","))
  }

  test("rank-subquery self-join is the self-join-window finding; collapsed plan is clean (r15)") {
    t.createOrReplaceTempView("lint_sjw")
    val sql =
      """SELECT t.* FROM lint_sjw t
        |JOIN (SELECT id, row_number() OVER (PARTITION BY k
        |        ORDER BY v DESC, id) AS rn FROM lint_sjw) r
        |ON t.id = r.id AND r.rn <= 2""".stripMargin
    // stock-session shape: rule off → two scans + join survive; the
    // linter names the windowed variant and points at the evidence hook
    spark.conf.set(graft.plans.RankJoinRule.RewriteConf, "false")
    try {
      val f = PlanLint.findings(spark.sql(sql))
      val hit = f.find(_.rule == "self-join-window")
      assert(hit.exists(_.severity == "info"), f.mkString("\n"))
      assert(hit.exists(_.detail.contains("rankJoin")), f.mkString("\n"))
    } finally spark.conf.set(graft.plans.RankJoinRule.RewriteConf, "true")
    // with the rule on AND measured uniqueness registered, the join is
    // eliminated → no finding
    graft.plans.RankJoinRule.registerUniqueHint(spark, "id")
    assert(!rules(spark.sql(sql)).contains("self-join-window"),
      rules(spark.sql(sql)).mkString(","))
  }

  test("gate: clean plans pass and return findings; error findings throw with the list") {
    val clean = PlanLint.gate(t.groupBy("k").agg(sum("v")))
    assert(clean.map(_.rule) === Seq("shuffle-census"))
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val other = t.withColumnRenamed("id", "id2")
        .withColumnRenamed("k", "k2").withColumnRenamed("v", "v2")
      val ex = intercept[org.apache.spark.SparkException] {
        PlanLint.gate(t.crossJoin(other))
      }
      assert(ex.getMessage.contains("cartesian-product"), ex.getMessage)
      assert(ex.getMessage.contains(PlanLint.GateConf), ex.getMessage)
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("findings are deterministic and exprId-free") {
    spark.conf.set("spark.graft.globalRank.rewrite", "false")
    try {
      def bad = t.filter(abs($"v") > 30)
        .withColumn("rn", row_number().over(Window.orderBy("id")))
      val a = PlanLint.findings(bad)
      val b = PlanLint.findings(bad)
      assert(a === b)
      assert(!a.exists(_.detail.matches(".*#\\d+.*")), a.mkString("\n"))
    } finally spark.conf.set("spark.graft.globalRank.rewrite", "true")
  }
}
