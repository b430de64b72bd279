package graft.joins

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import graft.TestSpark

/** ScalaCheck: the bucketed range join equals the naive inequality-join
  * definition for arbitrary points/intervals and bucket widths.
  */
object RangeJoinProps extends Properties("RangeJoin") {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  override def overrideParameters(p: org.scalacheck.Test.Parameters): org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(10)

  private val pointsGen = Gen.listOf(Gen.choose(0L, 100L))
  private val intervalsGen = Gen.listOf(Gen.zip(Gen.choose(0L, 100L), Gen.choose(1L, 40L)))
  private val widthGen = Gen.choose(1L, 50L)

  property("matches the naive point-in-interval definition") =
    forAll(pointsGen, intervalsGen, widthGen) { (ps, ivs0, w) =>
      val ivs = ivs0.zipWithIndex.map { case ((s, len), i) => (i.toLong, s, s + len) }
      if (ps.isEmpty || ivs.isEmpty) true
      else {
        val points = ps.zipWithIndex.map { case (p, i) => (i.toLong, p) }.toDF("pid", "p")
        val intervals = ivs.toDF("iv", "s", "e")
        val got = RangeJoin.pointInInterval(points, "p", intervals, "s", "e", w)
          .select("pid", "iv").as[(Long, Long)].collect().toSet
        val expect = (for {
          (pid, p) <- ps.zipWithIndex.map { case (p, i) => (i.toLong, p) }
          (iv, s, e) <- ivs if p >= s && p < e
        } yield (pid, iv)).toSet
        got == expect
      }
    }
}
