package graft.quality

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class ChecksSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def report(df: org.apache.spark.sql.DataFrame,
                     checks: Seq[Checks.Check]): Map[String, Long] =
    Checks.run(df, checks).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap

  test("row checks count violations; all-pass rules report zero") {
    val df = Seq(
      (Some(1L), 0.05), (None, 0.2), (Some(3L), -0.1), (Some(4L), 0.0)
    ).toDF("k", "d")
    val got = report(df, Seq(
      Checks.notNull("k"),
      Checks.inRange("d", 0.0, 0.1),
      Checks.RowCheck("never_fires", lit(false))))
    assert(got === Map("not_null_k" -> 1L, "range_d" -> 2L, "never_fires" -> 0L))
  }

  test("uniqueness counts surplus rows; referential integrity counts orphans and null keys") {
    val child = Seq((1L, "a"), (1L, "b"), (1L, "c"), (2L, "d"), (99L, "e"))
      .toDF("fk", "v")
      .unionByName(Seq((Option.empty[Long], "f")).toDF("fk", "v"))
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val got = report(child, Seq(
      Checks.Unique("uniq_fk", Seq("fk")),
      Checks.RefIntegrity("fk_exists", "fk", parent, "pk")))
    // fk=1 has 3 rows → 2 surplus; orphans: 99 and the null key
    assert(got === Map("uniq_fk" -> 2L, "fk_exists" -> 2L))
  }

  test("empty input reports zero everywhere, never null") {
    val df = Seq.empty[(Long, Double)].toDF("k", "d")
    val got = report(df, Seq(
      Checks.notNull("k"),
      Checks.Unique("uniq_k", Seq("k"))))
    assert(got === Map("not_null_k" -> 0L, "uniq_k" -> 0L))
  }

  test("rule names with quotes are data, not SQL; empty check list is an empty report") {
    val df = Seq((1L, 0.5)).toDF("k", "d")
    val got = report(df, Seq(
      Checks.RowCheck("discount isn't `weird`", col("d") < 0)))
    assert(got === Map("discount isn't `weird`" -> 0L))
    assert(Checks.run(df, Seq.empty).collect().isEmpty)
  }

  test("all row-local rules fold into ONE scan of the input") {
    val df = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val plan = Checks.run(df, Seq(
      Checks.notNull("l_quantity"),
      Checks.inRange("l_discount", 0.0, 0.1),
      Checks.RowCheck("pos_price", col("l_extendedprice") <= 0)))
      .queryExecution.executedPlan.toString
    val scans = "lineitem\\.parquet".r.findAllIn(plan).size
    assert(scans == 1, s"expected one scan for all row rules, got $scans:\n$plan")
  }
}
