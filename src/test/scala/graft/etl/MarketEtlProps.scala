package graft.etl

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import graft.TestSpark

/** ScalaCheck invariants for the core transform (SURVEY §5.3). */
object MarketEtlProps extends Properties("MarketEtl") {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  override def overrideParameters(p: org.scalacheck.Test.Parameters): org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(10)

  private val barsGen = for {
    nA <- Gen.choose(0, 12)
    nB <- Gen.choose(0, 12)
    closes <- Gen.listOfN(nA + nB, Gen.choose(1.0, 1000.0))
  } yield {
    val (a, b) = closes.splitAt(nA)
    a.zipWithIndex.map { case (c, i) => ("A", i, c) } ++
      b.zipWithIndex.map { case (c, i) => ("B", i, c) }
  }

  /** Shrinking can produce duplicate (ativo, d) keys the generator never
    * emits; re-index per asset so window order stays total and positions
    * stay 0-based contiguous. */
  private def reindex(rows: Seq[(String, Int, Double)]): Seq[(String, Int, Double)] =
    rows.groupBy(_._1).toSeq.flatMap { case (a, rs) =>
      rs.map(_._3).zipWithIndex.map { case (c, i) => (a, i, c) }
    }

  property("mm_7d is null iff fewer than n rows precede in the partition") =
    forAll(barsGen, Gen.choose(2, 7)) { (rows0, n) =>
      val rows = reindex(rows0)
      if (rows.isEmpty) true
      else {
        val df = rows.toDF("ativo", "d", "close")
        val out = MarketEtl.rollingMean(df, Seq("ativo"), Seq(col("d")), "close", n, "mm")
          .select("ativo", "d", "mm").collect()
        out.forall { r =>
          val pos = r.getInt(1) // 0-based position within asset
          val isNull = r.isNullAt(2)
          isNull == (pos < n - 1)
        }
      }
    }

  property("rolling mean value equals the mean of the trailing n closes") =
    forAll(barsGen) { rows0 =>
      val rows = reindex(rows0)
      if (rows.isEmpty) true
      else {
        val n = 3
        val df = rows.toDF("ativo", "d", "close")
        val out = MarketEtl.rollingMean(df, Seq("ativo"), Seq(col("d")), "close", n, "mm")
          .select("ativo", "d", "mm").filter(col("mm").isNotNull).collect()
        val byAsset = rows.groupBy(_._1)
        out.forall { r =>
          val series = byAsset(r.getString(0)).sortBy(_._2).map(_._3)
          val pos = r.getInt(1)
          val expect = series.slice(pos - n + 1, pos + 1).sum / n
          math.abs(r.getDouble(2) - expect) < 1e-9
        }
      }
    }

  property("union-by-name column set is the union of the inputs'") =
    forAll(Gen.someOf("a", "b", "c"), Gen.someOf("b", "c", "d")) { (l, r) =>
      l.isEmpty || r.isEmpty || {
        def frame(cols: Seq[String]) =
          Seq(1).toDF("x").select(cols.map(c => lit(1).as(c)): _*)
        val u = frame(l.toSeq).unionByName(frame(r.toSeq), allowMissingColumns = true)
        u.columns.toSet == (l.toSet ++ r.toSet)
      }
    }
}
