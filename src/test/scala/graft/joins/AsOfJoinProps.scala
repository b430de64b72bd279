package graft.joins

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import graft.TestSpark

/** ScalaCheck: the windowed as-of join equals the naive quadratic
  * definition (greatest right-time <= left-time per key) on arbitrary
  * small inputs.
  */
object AsOfJoinProps extends Properties("AsOfJoin") {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  override def overrideParameters(p: org.scalacheck.Test.Parameters): org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(10)

  private val keys = Gen.oneOf("A", "B", "C")
  private val lefts = Gen.listOf(Gen.zip(keys, Gen.choose(0L, 50L)))
  // right times drawn distinct per key via set to honor the uniqueness
  // precondition on (key, rightTime)
  private val rights = Gen.mapOf(Gen.zip(Gen.zip(keys, Gen.choose(0L, 50L)), Gen.choose(0.0, 1.0)))

  property("forward matches the naive smallest-time-at-or-after definition") =
    forAll(lefts, rights) { (ls, rsMap) =>
      val rs = rsMap.toSeq.map { case ((k, t), v) => (k, t, v) }
      val left = ls.zipWithIndex.map { case ((k, t), i) => (i.toLong, k, t) }
        .toDF("lid", "k", "t")
      val right = rs.toDF("k", "rt", "v")
      val out = AsOfJoin.forward(left, right, Seq("k"), "t", "rt")
        .select("lid", "v").collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
        .toMap
      val expect = ls.zipWithIndex.map { case ((k, t), i) =>
        val cand = rs.filter(r => r._1 == k && r._2 >= t)
        i.toLong -> (if (cand.isEmpty) None else Some(cand.minBy(_._2)._3))
      }.toMap
      out == expect
    }

  property("nearest matches the naive min-|distance| definition, ties backward") =
    forAll(lefts, rights) { (ls, rsMap) =>
      val rs = rsMap.toSeq.map { case ((k, t), v) => (k, t, v) }
      val left = ls.zipWithIndex.map { case ((k, t), i) => (i.toLong, k, t) }
        .toDF("lid", "k", "t")
      val right = rs.toDF("k", "rt", "v")
      val out = AsOfJoin.nearest(left, right, Seq("k"), "t", "rt")
        .select("lid", "v").collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
        .toMap
      val expect = ls.zipWithIndex.map { case ((k, t), i) =>
        val back = rs.filter(r => r._1 == k && r._2 <= t)
          .sortBy(_._2).lastOption
        val fwd = rs.filter(r => r._1 == k && r._2 >= t)
          .sortBy(_._2).headOption
        val pick = (back, fwd) match {
          case (Some(b), Some(f)) =>
            if (t - b._2 <= f._2 - t) Some(b) else Some(f)
          case (b, f) => b.orElse(f)
        }
        i.toLong -> pick.map(_._3)
      }.toMap
      out == expect
    }

  property("nearest with tolerance drops candidates beyond it, keeps the left row") =
    forAll(lefts, rights, Gen.choose(0L, 20L)) { (ls, rsMap, tol) =>
      val rs = rsMap.toSeq.map { case ((k, t), v) => (k, t, v) }
      val left = ls.zipWithIndex.map { case ((k, t), i) => (i.toLong, k, t) }
        .toDF("lid", "k", "t")
      val right = rs.toDF("k", "rt", "v")
      val out = AsOfJoin.nearest(left, right, Seq("k"), "t", "rt",
          toleranceUs = Some(tol))
        .select("lid", "v").collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
        .toMap
      val expect = ls.zipWithIndex.map { case ((k, t), i) =>
        val back = rs.filter(r => r._1 == k && r._2 <= t && t - r._2 <= tol)
          .sortBy(_._2).lastOption
        val fwd = rs.filter(r => r._1 == k && r._2 >= t && r._2 - t <= tol)
          .sortBy(_._2).headOption
        val pick = (back, fwd) match {
          case (Some(b), Some(f)) =>
            if (t - b._2 <= f._2 - t) Some(b) else Some(f)
          case (b, f) => b.orElse(f)
        }
        i.toLong -> pick.map(_._3)
      }.toMap
      out.keySet == expect.keySet && out == expect
    }

  property("matches the naive greatest-time-at-or-before definition") =
    forAll(lefts, rights) { (ls, rsMap) =>
      val rs = rsMap.toSeq.map { case ((k, t), v) => (k, t, v) }
      val left = ls.zipWithIndex.map { case ((k, t), i) => (i.toLong, k, t) }
        .toDF("lid", "k", "t")
      val right = rs.toDF("k", "rt", "v")
      val out = AsOfJoin.backward(left, right, Seq("k"), "t", "rt")
        .select("lid", "v").collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
        .toMap
      val expect = ls.zipWithIndex.map { case ((k, t), i) =>
        val cand = rs.filter(r => r._1 == k && r._2 <= t)
        i.toLong -> (if (cand.isEmpty) None else Some(cand.maxBy(_._2)._3))
      }.toMap
      out == expect
    }
}
