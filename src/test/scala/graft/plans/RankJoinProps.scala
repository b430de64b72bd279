package graft.plans

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import graft.TestSpark

/** ScalaCheck over the rank-join collapse (`RankJoinRule`): on
  * arbitrary null-salted inputs, every generated combination of rank
  * kind (row_number/rank/dense_rank), bound shape (`<= n`, `< n`,
  * `= 1`, bound-less), bound placement (ON clause vs subquery WHERE),
  * join type (INNER vs the LEFT OUTER flag form), sort direction, and
  * an optional extra nullable pairing must (a) COLLAPSE — the
  * uniqueness evidence is registered for the generated id, so a
  * surviving join is a refusal bug — and (b) return EXACTLY the
  * multiset the two-scan join returns with the rule off, nulls and
  * ties included. The seeded battery in `RankJoinSpec` pins chosen
  * edges; this battery walks shapes nobody hand-picked.
  */
object RankJoinProps extends Properties("RankJoinCollapse") {
  private lazy val spark = TestSpark.spark
  private lazy val dir: String =
    java.nio.file.Files.createTempDirectory("rjprops_").toString + "/t"

  override def overrideParameters(p: org.scalacheck.Test.Parameters): org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(12)

  private val rows: Gen[List[(Int, Option[Int])]] =
    Gen.listOf(for {
      k <- Gen.choose(0, 3)
      v <- Gen.option(Gen.choose(0, 9))
    } yield (k, v))
  private val fnG = Gen.oneOf("row_number()", "rank()", "dense_rank()")
  private val boundG: Gen[Option[String]] = Gen.oneOf(
    Gen.choose(1, 4).map(n => Some(s"<= $n")),
    Gen.choose(1, 4).map(n => Some(s"< $n")),
    Gen.const(Some("= 1")),
    Gen.const(None))
  private val onClauseG = Gen.oneOf(true, false) // bound in ON vs WHERE
  private val leftG = Gen.oneOf(true, false)
  private val descG = Gen.oneOf("DESC", "ASC")
  private val extraPairG = Gen.oneOf(true, false)

  property("every generated shape collapses and matches the join, on == off") =
    forAll(rows, fnG, boundG, onClauseG, leftG, descG, extraPairG) {
      (data, fn, bound, onClause, left, dir, extraPair) =>
        val s = spark
        import s.implicits._
        // parquet-backed: the uniqueness proof matches the LEAF
        // column's own name, and a Dataset-backed view's leaf is the
        // tuple relation (whose `_1 AS rjp_id` rename the proof
        // rightly refuses); the parquet footer carries the real name
        data.zipWithIndex
          .map { case ((k, v), i) => (i.toLong, k, v) }
          .toDF("rjp_id", "k", "v")
          .write.mode("overwrite").parquet(RankJoinProps.dir)
        s.read.parquet(RankJoinProps.dir).createOrReplaceTempView("rjp")
        // rjp_id is unique BY CONSTRUCTION (the zipWithIndex) — the
        // bare caller-vouches registration the evidence model allows
        RankJoinRule.registerUniqueHint(s, "rjp_id")
        val subCols = if (extraPair) "rjp_id, v" else "rjp_id"
        val boundSql = bound.map(b => s"rn $b")
        val sub =
          s"""SELECT $subCols, $fn OVER (PARTITION BY k
             |  ORDER BY v $dir NULLS LAST, rjp_id) AS rn FROM rjp""".stripMargin
        val subWithWhere =
          if (!onClause && boundSql.nonEmpty)
            s"SELECT * FROM ($sub) WHERE ${boundSql.get}"
          else sub
        val onConds = Seq("t.rjp_id = r.rjp_id") ++
          (if (extraPair) Seq("t.v = r.v") else Nil) ++
          (if (onClause) boundSql.map(b => s"r.$b").toSeq else Nil)
        val jt = if (left) "LEFT JOIN" else "JOIN"
        val sql =
          s"""SELECT t.rjp_id, t.k, t.v, r.rn
             |FROM rjp t
             |$jt ($subWithWhere) r
             |ON ${onConds.mkString(" AND ")}""".stripMargin
        val on = s.sql(sql)
        val joinFree = on.queryExecution.optimizedPlan.collect {
          case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
        }.isEmpty
        val got = on.collect().map(_.toString).sorted.toSeq
        s.conf.set(RankJoinRule.RewriteConf, "false")
        val want =
          try s.sql(sql).collect().map(_.toString).sorted.toSeq
          finally s.conf.set(RankJoinRule.RewriteConf, "true")
        if (!joinFree) println(s"NOT COLLAPSED:\n$sql")
        if (got != want) println(s"DIVERGED:\n$sql")
        joinFree && got == want
    }
}
