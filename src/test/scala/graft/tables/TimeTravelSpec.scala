package graft.tables

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class TimeTravelSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ts(s: String) = Timestamp.valueOf(s)
  private def freshRoot(tag: String): String =
    Files.createTempDirectory(s"tt_$tag").toFile.getAbsolutePath + "/t"

  private def history(root: String): Unit = {
    import spark.implicits._
    val v1 = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    val v2 = Seq((1L, "a"), (2L, "B"), (3L, "c")).toDF("k", "v")
    val v3 = Seq((1L, "a"), (2L, "B"), (4L, "d")).toDF("k", "v")
    assert(TimeTravel.commit(v1, root, ts("2026-01-01 00:00:00")) === 0L)
    assert(TimeTravel.commit(v2, root, ts("2026-01-02 00:00:00")) === 1L)
    assert(TimeTravel.commit(v3, root, ts("2026-01-03 00:00:00")) === 2L)
  }

  test("versions, exact-version and latest reads") {
    val root = freshRoot("basic")
    history(root)
    assert(TimeTravel.versions(spark, root).map(_._1) === Seq(0L, 1L, 2L))
    val v1 = TimeTravel.readVersion(spark, root, 1)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(v1 === Set((1L, "a"), (2L, "B"), (3L, "c")))
    val latest = TimeTravel.readLatest(spark, root)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(latest === Set((1L, "a"), (2L, "B"), (4L, "d")))
  }

  test("AS OF resolves to the latest snapshot at or before the timestamp") {
    val root = freshRoot("asof")
    history(root)
    // mid-history: between v1 (Jan 2) and v2 (Jan 3) → v1's content
    val mid = TimeTravel.readAsOf(spark, root, ts("2026-01-02 12:00:00"))
      .filter(col("k") === 2L).collect().map(_.getString(1)).toSeq
    assert(mid === Seq("B"))
    // exactly on a commit boundary → that commit
    val exact = TimeTravel.readAsOf(spark, root, ts("2026-01-01 00:00:00"))
      .filter(col("k") === 2L).collect().map(_.getString(1)).toSeq
    assert(exact === Seq("b"))
    // after the end → latest
    val late = TimeTravel.readAsOf(spark, root, ts("2027-06-01 00:00:00"))
      .collect().map(_.getLong(0)).toSet
    assert(late === Set(1L, 2L, 4L))
  }

  test("AS OF before history starts fails loudly") {
    val root = freshRoot("early")
    history(root)
    val e = intercept[IllegalArgumentException] {
      TimeTravel.readAsOf(spark, root, ts("2025-01-01 00:00:00"))
    }
    assert(e.getMessage.contains("history starts"))
  }

  test("snapshots are immutable: later commits never disturb a held version") {
    val root = freshRoot("iso")
    history(root)
    val held = TimeTravel.readVersion(spark, root, 0)
    import spark.implicits._
    TimeTravel.commit(Seq((9L, "z")).toDF("k", "v"), root,
      ts("2026-02-01 00:00:00"))
    assert(held.collect().map(_.getLong(0)).toSet === Set(1L, 2L, 3L))
    assert(TimeTravel.readLatest(spark, root).count() === 1)
  }

  test("out-of-order commit timestamps are rejected") {
    val root = freshRoot("order")
    history(root)
    import spark.implicits._
    val e = intercept[IllegalArgumentException] {
      TimeTravel.commit(Seq((1L, "x")).toDF("k", "v"), root,
        ts("2025-12-31 00:00:00"))
    }
    assert(e.getMessage.contains("history must be ordered"))
  }

  test("schema evolution across versions is visible per snapshot") {
    val root = freshRoot("schema")
    import spark.implicits._
    TimeTravel.commit(Seq((1L, "a")).toDF("k", "v"), root,
      ts("2026-01-01 00:00:00"))
    TimeTravel.commit(Seq((1L, "a", 10)).toDF("k", "v", "extra"), root,
      ts("2026-01-02 00:00:00"))
    assert(!TimeTravel.readVersion(spark, root, 0).columns.contains("extra"))
    assert(TimeTravel.readVersion(spark, root, 1).columns.contains("extra"))
  }
}
