package graft.joins

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class JoinsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // -------- AsOfJoin --------

  private def trades = Seq(
    // (trade_id, sym, t)
    (1L, "A", 100L), (2L, "A", 205L), (3L, "A", 310L),
    (4L, "B", 150L), (5L, "C", 500L)
  ).toDF("trade_id", "sym", "t")

  private def quotes = Seq(
    // (sym, qt, px)
    ("A", 100L, 10.0), ("A", 200L, 11.0), ("A", 300L, 12.0),
    ("B", 160L, 20.0) // after B's only trade — no match
  ).toDF("sym", "qt", "px")

  test("backward as-of picks the greatest quote time <= trade time, ties inclusive") {
    val out = AsOfJoin.backward(trades, quotes, Seq("sym"), "t", "qt")
      .orderBy("trade_id").collect()
    // trade 1 at t=100 matches the t=100 quote exactly (tie inclusive)
    assert(out(0).getDouble(out(0).fieldIndex("px")) == 10.0)
    // trade 2 at t=205 -> quote at 200
    assert(out(1).getDouble(out(1).fieldIndex("px")) == 11.0)
    // trade 3 at t=310 -> quote at 300
    assert(out(2).getDouble(out(2).fieldIndex("px")) == 12.0)
    // trade 4 (B): only quote is later -> null match, row preserved
    assert(out(3).isNullAt(out(3).fieldIndex("px")))
    // trade 5 (C): no quotes at all -> null match, row preserved
    assert(out(4).isNullAt(out(4).fieldIndex("px")))
    assert(out.length == 5)
  }

  test("as-of tolerance nulls stale matches but keeps the row") {
    val out = AsOfJoin.backward(trades, quotes, Seq("sym"), "t", "qt",
        toleranceUs = Some(5L))
      .orderBy("trade_id").collect()
    // t=100 matches qt=100 (age 0 <= 5)
    assert(out(0).getDouble(out(0).fieldIndex("px")) == 10.0)
    // t=205 matched qt=200 (age 5 <= 5): kept
    assert(out(1).getDouble(out(1).fieldIndex("px")) == 11.0)
    // t=310 matched qt=300 (age 10 > 5): nulled, row kept
    assert(out(2).isNullAt(out(2).fieldIndex("px")))
    assert(out.length == 5)
  }

  test("as-of preserves every left column and row count under duplicates") {
    val dupTrades = trades.unionByName(trades) // same trades twice
    val out = AsOfJoin.backward(dupTrades, quotes, Seq("sym"), "t", "qt")
    assert(out.count() == 10)
    assert(out.columns.toSeq == Seq("trade_id", "sym", "t", "px"))
  }

  test("forward as-of picks the smallest quote time >= trade time") {
    val out = AsOfJoin.forward(trades, quotes, Seq("sym"), "t", "qt")
      .orderBy("trade_id").collect()
    // trade 1 at t=100 -> quote at 100 (tie inclusive)
    assert(out(0).getDouble(out(0).fieldIndex("px")) == 10.0)
    // trade 2 at t=205 -> next quote at 300
    assert(out(1).getDouble(out(1).fieldIndex("px")) == 12.0)
    // trade 3 at t=310 -> nothing later -> null
    assert(out(2).isNullAt(out(2).fieldIndex("px")))
    // trade 4 (B) at t=150 -> quote at 160
    assert(out(3).getDouble(out(3).fieldIndex("px")) == 20.0)
    // trade 5 (C): no quotes -> null
    assert(out(4).isNullAt(out(4).fieldIndex("px")))
  }

  // -------- RangeJoin --------

  test("pointInInterval matches half-open [start, end) across bucket boundaries") {
    val points = Seq((1L, 5L), (2L, 10L), (3L, 19L), (4L, 20L), (5L, 35L))
      .toDF("pid", "p")
    // interval 100 spans 3 buckets at width 10; interval 200 is empty-range safe
    val intervals = Seq((100L, 5L, 25L), (200L, 30L, 31L))
      .toDF("iv_id", "s", "e")
    val out = RangeJoin.pointInInterval(points, "p", intervals, "s", "e", 10L)
      .select("pid", "iv_id").as[(Long, Long)].collect().toSet
    // p=5 (start inclusive), 10, 19 in [5,25); p=20 in [5,25) too; p=35 nowhere
    assert(out == Set((1L, 100L), (2L, 100L), (3L, 100L), (4L, 100L)))
  }

  test("pointInInterval emits each matching pair exactly once") {
    val points = Seq((1L, 15L)).toDF("pid", "p")
    val intervals = Seq((1L, 0L, 100L)).toDF("iv_id", "s", "e") // spans 10 buckets
    val out = RangeJoin.pointInInterval(points, "p", intervals, "s", "e", 10L)
    assert(out.count() == 1)
  }

  test("overlapping intervals each match the shared point") {
    val points = Seq((1L, 15L)).toDF("pid", "p")
    val intervals = Seq((1L, 0L, 20L), (2L, 10L, 30L)).toDF("iv_id", "s", "e")
    val out = RangeJoin.pointInInterval(points, "p", intervals, "s", "e", 10L)
      .select("iv_id").as[Long].collect().toSet
    assert(out == Set(1L, 2L))
  }

  // -------- SkewJoin --------

  test("saltedEquiJoin equals the plain join: left, null keys, duplicate dim rows") {
    val big = Seq((1L, "A", 1.0), (2L, "A", 2.0), (3L, "B", 3.0),
      (4L, null, 4.0), (5L, "C", 5.0)).toDF("id", "k", "v")
    // duplicate dim rows per key: the matched MULTISET must be preserved
    val dim = Seq(("A", "x"), ("A", "y"), ("B", "z")).toDF("k", "tag")
    def canon(df: org.apache.spark.sql.DataFrame) = df.select("id", "k", "v", "tag")
    val plain = canon(big.join(dim, Seq("k"), "left"))
    val salted = canon(SkewJoin.saltedEquiJoin(big, dim, Seq("k"), 4, "left"))
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
    // inner variant too
    val pi = canon(big.join(dim, Seq("k"), "inner"))
    val si = canon(SkewJoin.saltedEquiJoin(big, dim, Seq("k"), 4, "inner"))
    assert(si.exceptAll(pi).isEmpty && pi.exceptAll(si).isEmpty)
  }

  test("saltedEquiJoin actually spreads a hot key across salts") {
    val big = Seq.tabulate(200)(i => (i.toLong, "HOT", i * 1.0)).toDF("id", "k", "v")
    val salts = big.withColumn("__salt",
        pmod(xxhash64(big.columns.map(col): _*), lit(8L)).cast("int"))
      .select("__salt").distinct().count()
    assert(salts >= 6, s"salt spread too narrow: $salts of 8 buckets hit")
  }

  test("saltedEquiJoin entropyCols: same multiset, hot key still spreads") {
    val big = Seq.tabulate(200)(i => (i.toLong, "HOT", i * 1.0)).toDF("id", "k", "v")
    val dim = Seq(("HOT", "x"), ("HOT", "y")).toDF("k", "tag")
    def canon(df: org.apache.spark.sql.DataFrame) = df.select("id", "k", "v", "tag")
    val plain = canon(big.join(dim, Seq("k"), "left"))
    val salted = canon(SkewJoin.saltedEquiJoin(big, dim, Seq("k"), 8, "left",
      entropyCols = Seq("id")))
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
    // the (key, id) hash must spread as well as the full-row hash did
    val spread = big.withColumn("__salt",
        pmod(xxhash64(col("k"), col("id")), lit(8L)).cast("int"))
      .select("__salt").distinct().count()
    assert(spread >= 6, s"entropy-salt spread too narrow: $spread of 8 buckets hit")
  }
}
