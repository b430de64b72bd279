package graft.stats

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class EwmaSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(day: Int) = Timestamp.valueOf(f"2024-01-$day%02d 00:00:00")

  test("recurrence matches the hand fold; seeded from the first value") {
    val df = Seq(("A", ts(1), 10.0), ("A", ts(2), 20.0), ("A", ts(3), 30.0))
      .toDF("k", "dt", "x")
    val got = Ewma.perKey(df, 0.5, "k", "dt", "x")
      .orderBy("dt").collect().map(_.getDouble(2)).toSeq
    // 10; 0.5*20+0.5*10 = 15; 0.5*30+0.5*15 = 22.5
    assert(got === Seq(10.0, 15.0, 22.5))
  }

  test("keys fold independently and out-of-order input is sorted by time") {
    val df = Seq(
      ("B", ts(3), 1.0), ("A", ts(2), 200.0), ("B", ts(1), 3.0),
      ("A", ts(1), 100.0), ("B", ts(2), 2.0)
    ).toDF("k", "dt", "x")
    val got = Ewma.perKey(df, 0.5, "k", "dt", "x")
      .collect().map(r => (r.getString(0), r.getTimestamp(1), r.getDouble(2)))
      .groupBy(_._1).view.mapValues(_.sortBy(_._2.getTime).map(_._3).toSeq).toMap
    assert(got("A") === Seq(100.0, 150.0))
    assert(got("B") === Seq(3.0, 2.5, 1.75))
  }

  test("alpha = 1 degenerates to the raw series") {
    val df = Seq(("A", ts(1), 7.0), ("A", ts(2), 9.0)).toDF("k", "dt", "x")
    val got = Ewma.perKey(df, 1.0, "k", "dt", "x")
      .orderBy("dt").collect().map(_.getDouble(2)).toSeq
    assert(got === Seq(7.0, 9.0))
  }
}
