package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Theta distinct-set algebra: exact under capacity, union lifecycle,
  * intersection correctness against hand-built sets.
  */
class ThetaSketchSpec extends AnyFunSuite {
  private lazy val spark = {
    val s = TestSpark.spark
    org.apache.spark.sql.graft.ColumnBridge.registerFunctions(s)
    s
  }
  import spark.implicits._

  // A = {0..99}, B = {50..149} → |A|=|B|=100, |A∩B|=50
  private def sets = ((0 until 100).map(i => ("A", i.toLong)) ++
    (50 until 150).map(i => ("B", i.toLong))).toDF("grp", "uid")

  test("exact counts and exact intersection under capacity") {
    sets.createOrReplaceTempView("th_sets")
    val row = spark.sql("""
      WITH sk AS (SELECT grp, graft_theta_agg(uid, 12) AS sk
                  FROM th_sets GROUP BY grp)
      SELECT graft_theta_count(a.sk) AS na, graft_theta_count(b.sk) AS nb,
             graft_theta_intersect_count(a.sk, b.sk) AS nab
      FROM sk a JOIN sk b ON a.grp = 'A' AND b.grp = 'B'""").head()
    assert((row.getLong(0), row.getLong(1), row.getLong(2)) === ((100L, 100L, 50L)))
  }

  test("per-batch sketches union to the global distinct count") {
    sets.withColumn("batch", col("uid") % 5).createOrReplaceTempView("th_batches")
    val n = spark.sql("""
      WITH per_batch AS (
        SELECT batch, graft_theta_agg(uid, 12) AS sk
        FROM th_batches GROUP BY batch)
      SELECT graft_theta_count(graft_theta_union(sk, 12))
      FROM per_batch""").head().getLong(0)
    assert(n === 150L) // |A ∪ B|
  }

  test("string inputs hash consistently too") {
    Seq("x", "y", "x", "z").toDF("s").createOrReplaceTempView("th_str")
    val n = spark.sql(
      "SELECT graft_theta_count(graft_theta_agg(s, 12)) FROM th_str")
      .head().getLong(0)
    assert(n === 3L)
  }

  test("disjoint sets intersect to zero") {
    sets.createOrReplaceTempView("th_sets")
    val n = spark.sql("""
      WITH sk AS (
        SELECT graft_theta_agg(uid, 12) AS ska FROM th_sets WHERE uid < 50),
      sk2 AS (
        SELECT graft_theta_agg(uid, 12) AS skb FROM th_sets WHERE uid >= 100)
      SELECT graft_theta_intersect_count(ska, skb) FROM sk, sk2""")
      .head().getLong(0)
    assert(n === 0L)
  }
}
