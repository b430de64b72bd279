package graft.stats

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import graft.TestSpark

/** ScalaCheck: GlobalRank equals the driver-side sort definition of
  * `row_number() OVER (ORDER BY v <dir>, id)` on arbitrary duplicate-
  * heavy inputs at arbitrary partition counts — the identity that lets
  * x86/x94/x98 swap their unpartitioned windows without moving an
  * oracle hash.
  */
object GlobalRankProps extends Properties("GlobalRank") {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  override def overrideParameters(p: org.scalacheck.Test.Parameters): org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(10)

  // small value domain → heavy ties, so the id tie-break is load-bearing
  private val rows = Gen.listOf(Gen.choose(0L, 9L))
  private val parts = Gen.choose(1, 9)
  private val descGen = Gen.oneOf(true, false)

  property("matches the sorted-sequence rank at any partition count") =
    forAll(rows, parts, descGen) { (vs, np, desc) =>
      val df = vs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
        .toDF("id", "v")
      val order =
        if (desc) Seq(col("v").desc, col("id")) else Seq(col("v"), col("id"))
      val got = GlobalRank.withRowNumber(df, order, "rn", numPartitions = np)
        .select("id", "rn").as[(Long, Long)].collect().toMap
      val expect = vs.zipWithIndex
        .map { case (v, i) => (i.toLong, v) }
        .sortBy { case (id, v) => (if (desc) -v else v, id) }
        .zipWithIndex.map { case ((id, _), r) => id -> (r + 1L) }
        .toMap
      got == expect
    }
}
