package graft.plans

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class RangeJoinRuleSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // vals: a fresh toDF per reference would mint new attribute ids and the
  // cross-frame join conditions below would not resolve
  private lazy val points = (0 to 500).map(i => (i.toLong, (i * 7 % 1000).toLong))
    .toDF("pid", "p")
  // overlapping intervals + one empty range (e <= s) that must not error
  private lazy val intervals = ((0 to 100).map(i => (i.toLong, i * 10L, i * 10L + 25L))
    :+ (999L, 50L, 40L)).toDF("iv", "s", "e")

  test("rewrites an inequality join to a hash join with identical results") {
    val cond = points("p") >= intervals("s") && points("p") < intervals("e")
    val plain = points.join(intervals, cond)
      .select("pid", "iv").as[(Long, Long)].collect().toSet
    assert(points.join(intervals, cond).queryExecution.executedPlan.toString
      .contains("BroadcastNestedLoopJoin"), "baseline should be a BNLJ")

    try {
      spark.experimental.extraOptimizations = Seq(RangeJoinRule(spark))
      spark.conf.set(RangeJoinRule.BucketWidthConf, "16")
      val opt = points.join(intervals, cond)
      val plan = opt.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin"),
        s"rewrite did not fire:\n$plan")
      assert(opt.select("pid", "iv").as[(Long, Long)].collect().toSet === plain)
    } finally {
      spark.conf.unset(RangeJoinRule.BucketWidthConf)
      spark.experimental.extraOptimizations = Nil
    }
  }

  test("leaves joins with an equi-conjunct alone") {
    val withKey = points.withColumn("k", points("pid") % 3)
    val ivWithKey = intervals.withColumn("k", intervals("iv") % 3)
    try {
      spark.experimental.extraOptimizations = Seq(RangeJoinRule(spark))
      spark.conf.set(RangeJoinRule.BucketWidthConf, "16")
      val j = withKey.join(ivWithKey,
        withKey("k") === ivWithKey("k") &&
          withKey("p") >= ivWithKey("s") && withKey("p") < ivWithKey("e"))
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("__graft_pb"), s"rule fired on an equi-join:\n$plan")
      assert(j.count() > 0)
    } finally {
      spark.conf.unset(RangeJoinRule.BucketWidthConf)
      spark.experimental.extraOptimizations = Nil
    }
  }

  test("an interval spanning more than maxReplication buckets fails fast (ADVICE r2)") {
    // width 16 with a 10^6-long interval → ~62500 buckets > the cap of 64:
    // must raise the guard's message, not materialize the explode
    val hugeIv = Seq((1L, 0L, 1000000L)).toDF("iv", "s", "e")
    try {
      spark.experimental.extraOptimizations = Seq(RangeJoinRule(spark))
      spark.conf.set(RangeJoinRule.BucketWidthConf, "16")
      spark.conf.set(RangeJoinRule.MaxReplicationConf, "64")
      val cond = points("p") >= hugeIv("s") && points("p") < hugeIv("e")
      val e = intercept[Exception] {
        points.join(hugeIv, cond).count()
      }
      def messages(t: Throwable): Seq[String] =
        Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
      assert(messages(e).exists(_.contains("spans more than 64 buckets")),
        s"unexpected error: $e")
    } finally {
      spark.conf.unset(RangeJoinRule.BucketWidthConf)
      spark.conf.unset(RangeJoinRule.MaxReplicationConf)
      spark.experimental.extraOptimizations = Nil
    }
  }

  test("rewrites an interval-OVERLAP inequality join; identical results incl. empty ranges") {
    // second interval set shifted so overlaps span bucket boundaries;
    // keeps its own empty range (e2 <= s2) — the raw predicate can still
    // match such rows, and the rewrite must preserve exactly that
    val others = ((0 to 80).map(i => (i.toLong, i * 13L + 5L, i * 13L + 40L))
      :+ (998L, 70L, 60L)).toDF("ov", "s2", "e2")
    val cond = intervals("s") < others("e2") && others("s2") < intervals("e")
    val plain = intervals.join(others, cond)
      .select("iv", "ov").as[(Long, Long)].collect()
    assert(intervals.join(others, cond).queryExecution.executedPlan.toString
      .contains("BroadcastNestedLoopJoin"), "baseline should be a BNLJ")
    // the baseline must exercise both degenerate rows (they CAN match
    // the raw inequalities even though the intervals are empty)
    assert(plain.exists(_._1 == 999L) && plain.exists(_._2 == 998L),
      "fixture lost its degenerate-interval matches")

    try {
      spark.experimental.extraOptimizations = Seq(RangeJoinRule(spark))
      spark.conf.set(RangeJoinRule.BucketWidthConf, "16")
      val opt = intervals.join(others, cond)
      val plan = opt.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin"),
        s"overlap rewrite did not fire:\n$plan")
      val got = opt.select("iv", "ov").as[(Long, Long)].collect()
      // owner-bucket emission: exact multiset equality, no dedup pass
      assert(got.sorted.toSeq === plain.sorted.toSeq)
    } finally {
      spark.conf.unset(RangeJoinRule.BucketWidthConf)
      spark.experimental.extraOptimizations = Nil
    }
  }

  test("no-op when the bucket width conf is unset") {
    try {
      spark.experimental.extraOptimizations = Seq(RangeJoinRule(spark))
      val cond = points("p") >= intervals("s") && points("p") < intervals("e")
      assert(points.join(intervals, cond).queryExecution.executedPlan.toString
        .contains("BroadcastNestedLoopJoin"))
    } finally {
      spark.experimental.extraOptimizations = Nil
    }
  }
}
