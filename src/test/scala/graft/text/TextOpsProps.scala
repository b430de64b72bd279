package graft.text

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import graft.TestSpark

/** ScalaCheck invariants (SURVEY §5.3). Runs under sbt's scalacheck
  * framework; the Spark work per case is a tiny local job.
  */
object TextOpsProps extends Properties("TextOps") {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // each case is a Spark job — 10 per property keeps the suite fast
  override def overrideParameters(p: org.scalacheck.Test.Parameters): org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(10)

  private val tokenGen = Gen.choose(3, 10)
    .flatMap(n => Gen.listOfN(n, Gen.oneOf("a", "b", "c", "d", "e", "f")))

  property("jaccard symmetric and within [0,1]") =
    forAll(tokenGen, tokenGen) { (xs, ys) =>
      val r = Seq((xs, ys)).toDF("x", "y")
        .select(TextOps.jaccard(col("x"), col("y")),
          TextOps.jaccard(col("y"), col("x"))).head()
      val (j1, j2) = (r.getDouble(0), r.getDouble(1))
      j1 == j2 && j1 >= 0.0 && j1 <= 1.0
    }

  property("identical texts always form exactly one near-dup pair") =
    forAll(tokenGen) { toks =>
      val text = toks.mkString(" ")
      val docs = Seq((1L, text), (2L, text)).toDF("doc_id", "text")
      TextOps.nearDupPairs(docs, 0.99).count() == 1L
    }

  property("exact dedup (distinct) is idempotent") =
    forAll(Gen.listOfN(12, Gen.oneOf("x", "y", "z"))) { texts =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val once = df.select("text").distinct()
      once.distinct().count() == once.count()
    }
}
