package graft.pipeline

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.tables.Tables

class ZOrderSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def freshDir(tag: String): String =
    Files.createTempDirectory(s"zorder_$tag").toFile.getAbsolutePath + "/t"

  // reference Morton interleave for the bit-math check
  private def morton2(x: Long, y: Long): Long =
    (0 until 16).map { i =>
      (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
    }.reduce(_ | _)

  test("z-value interleaves bits (2 dims, identity normalization)") {
    import spark.implicits._
    val rows = Seq((0L, 0L), (1L, 0L), (0L, 1L), (65535L, 0L),
      (0L, 65535L), (43690L, 21845L), (12345L, 54321L))
    val df = rows.toDF("x", "y")
    // lo=0, hi=65535 makes normalize the identity on [0, 65535]
    val got = df.select(
      ZOrder.zValue(Seq(col("x"), col("y")), Seq((0.0, 65535.0), (0.0, 65535.0)))
        .as("z"), col("x"), col("y"))
      .collect().map(r => (r.getLong(1), r.getLong(2)) -> r.getLong(0)).toMap
    for ((x, y) <- rows)
      assert(got((x, y)) === morton2(x, y), s"bad z for ($x, $y)")
  }

  test("clustered box read equals full-scan filter and prunes most files") {
    val dir = freshDir("events")
    val events = Tables.events(spark, sf)
    ZOrder.clusterWrite(events, Seq("user_id", "value"), dir, numFiles = 16)

    val ranges = Seq[(String, Any, Any)](
      ("user_id", 2L, 5L), ("value", 20.0, 80.0))
    val pred = col("user_id").between(2, 5) && col("value").between(20.0, 80.0)

    val expected = events.filter(pred).select("event_id").collect()
      .map(_.getLong(0)).toSet
    val got = ZOrder.prunedRead(spark, dir, ranges).filter(pred)
      .select("event_id").collect().map(_.getLong(0)).toSet
    assert(got === expected, "pruned read lost or invented rows")

    val (kept, total) = ZOrder.pruneStats(spark, dir, ranges)
    assert(total >= 12, s"expected ~16 files, got $total") // range-split tolerance
    assert(kept <= total / 2,
      s"box query should skip most files: kept $kept of $total")
  }

  test("single-dimension range also prunes on a 2-dim clustering") {
    val dir = freshDir("onedim")
    ZOrder.clusterWrite(Tables.events(spark, sf), Seq("user_id", "value"),
      dir, numFiles = 16)
    val (kept, total) = ZOrder.pruneStats(spark, dir,
      Seq(("user_id", 0L, 1L)))
    assert(kept < total,
      s"narrow single-dim range should skip some files: kept $kept of $total")
  }

  test("4-dim z-values never touch the sign bit (clustering order survives)") {
    import spark.implicits._
    // extreme corners in every dimension — the 4th dim's top bit is the
    // hazard: at 16 bits/dim it would land on bit 63 and flip the sign
    val df = Seq((0.0, 0.0, 0.0, 0.0), (1.0, 1.0, 1.0, 1.0),
      (0.0, 0.0, 0.0, 1.0), (1.0, 0.5, 0.25, 0.99))
      .toDF("a", "b", "c", "d")
    val stats = Seq((0.0, 1.0), (0.0, 1.0), (0.0, 1.0), (0.0, 1.0))
    val zs = df.select(ZOrder.zValue(
      Seq(col("a"), col("b"), col("c"), col("d")), stats).as("z"))
      .collect().map(_.getLong(0))
    assert(zs.forall(_ >= 0L), s"negative z-value leaked the sign bit: ${zs.toSeq}")
    assert(zs.distinct.length == zs.length, "corner z-values should differ")
  }

  test("all-null clustering column degrades gracefully (no NPE)") {
    val dir = freshDir("allnull")
    import spark.implicits._
    val df = (1 to 20).map(i => (i.toLong, Option.empty[Double])).toDF("k", "v")
    ZOrder.clusterWrite(df, Seq("k", "v"), dir, numFiles = 2)
    assert(spark.read.parquet(dir).count() === 20)
  }

  test("degenerate constant column does not break clustering") {
    val dir = freshDir("const")
    import spark.implicits._
    val df = (1 to 100).map(i => (i.toLong, 7.0)).toDF("k", "c")
    ZOrder.clusterWrite(df, Seq("k", "c"), dir, numFiles = 4)
    val back = spark.read.parquet(dir)
    assert(back.count() === 100)
    val got = ZOrder.prunedRead(spark, dir, Seq(("k", 10L, 20L)))
      .filter(col("k").between(10, 20)).count()
    assert(got === 11)
  }

  test("null keys route to the low end and never poison pruning") {
    val dir = freshDir("nulls")
    import spark.implicits._
    val df = ((1 to 50).map(i => (Some(i.toLong), i.toDouble)) ++
      Seq((None: Option[Long], 999.0))).toDF("k", "v")
    ZOrder.clusterWrite(df, Seq("k", "v"), dir, numFiles = 4)
    assert(spark.read.parquet(dir).count() === 51) // null row survives the write
    val got = ZOrder.prunedRead(spark, dir, Seq(("k", 40L, 50L)))
      .filter(col("k").between(40, 50)).count()
    assert(got === 11) // range semantics unaffected by the null row
  }

  test("clusterWrite is idempotent (second call trusts _SUCCESS)") {
    val dir = freshDir("idem")
    val events = Tables.events(spark, sf).limit(100)
    ZOrder.clusterWrite(events, Seq("user_id", "value"), dir, numFiles = 4)
    val before = spark.read.parquet(dir).count()
    ZOrder.clusterWrite(events, Seq("user_id", "value"), dir, numFiles = 4)
    assert(spark.read.parquet(dir).count() === before)
  }
}
