package graft.tools

import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, TestSpark}

/** Decorrelation pins for the subquery surface (SparkEntryR5b): every
  * EXISTS / NOT EXISTS / correlated-scalar-aggregate must be rewritten by
  * Catalyst into a hash join against a once-scanned (possibly aggregated)
  * subquery side. The failure mode these guard against is a per-outer-row
  * subquery execution or a nested-loop product — either one is quadratic
  * and unrunnable at 100 TB.
  */
class SubqueryPlanSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def plan(q: String): String =
    SparkEntry.queries(q)(spark, sf).queryExecution.executedPlan.toString

  private def noProduct(p: String, q: String): Unit =
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"$q plans a nested-loop product")

  test("q4 EXISTS decorrelates to a LeftSemi hash join") {
    val p = plan("q4_priority_exists")
    assert(p.contains("LeftSemi"), s"no semi join in:\n$p")
    noProduct(p, "q4")
  }

  test("q21 double correlation decorrelates to LeftSemi + LeftAnti hash joins") {
    val p = plan("q21_waiting_supplier")
    assert(p.contains("LeftSemi"), "EXISTS did not become a semi join")
    assert(p.contains("LeftAnti"), "NOT EXISTS did not become an anti join")
    noProduct(p, "q21")
  }

  test("q17 correlated scalar aggregates decorrelate to one per-part aggregate join") {
    val p = plan("q17_small_qty_revenue")
    // both correlated scalars (count, sum per part) fold into aggregate-
    // then-join — no subquery re-execution per outer row, no product
    assert(p.contains("HashAggregate"), "no decorrelated aggregate")
    noProduct(p, "q17")
  }

  test("q22 NOT EXISTS plans LeftAnti; scalar threshold is a one-row subquery") {
    val p = plan("q22_idle_rich_customers")
    assert(p.contains("LeftAnti"), "NOT EXISTS did not become an anti join")
    assert(p.contains("Subquery") || p.contains("scalar-subquery"),
      "uncorrelated threshold should run once as a scalar subquery")
    noProduct(p, "q22")
  }

  test("q2 per-nation max decorrelates to aggregate + equi-join") {
    val p = plan("q2_top_supplier_per_nation")
    assert(p.contains("HashAggregate"), "no decorrelated aggregate")
    noProduct(p, "q2")
  }

  test("subquery pack: every query returns rows at sf0.001") {
    for (q <- Seq("q17_small_qty_revenue", "q4_priority_exists",
      "q21_waiting_supplier", "q22_idle_rich_customers",
      "q2_top_supplier_per_nation")) {
      assert(SparkEntry.queries(q)(spark, sf).count() > 0, s"$q returned 0 rows")
    }
  }
}
