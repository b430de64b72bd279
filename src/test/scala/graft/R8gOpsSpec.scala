package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for the round-8g model-evaluation suite (x98
  * classifier lift, x99 LID confusion) — properties the DuckDB oracle
  * proves by agreement but cannot NAME.
  */
class R8gOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.Sf0001

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("x98: deciles are balanced, cover the corpus, and lift DESCENDS") {
    val rows = q("x98_classifier_lift").collect()
    assert(rows.map(_.getLong(0)).sorted.toSeq === (1L to 10L))
    val docs = graft.tables.Tables.documents(spark, sf).count()
    assert(rows.map(_.getLong(1)).sum === docs)
    rows.foreach(r => assert(math.abs(r.getLong(1) - docs / 10) <= 1,
      s"decile ${r.getLong(0)} holds ${r.getLong(1)} of $docs"))
    // the trained ranker must actually rank: the top decile's positive
    // rate strictly exceeds the bottom decile's (x36b's own spec pins
    // training accuracy; this pins that the SCORES order the classes)
    val byDecile = rows.sortBy(_.getLong(0)).map(_.getLong(3))
    assert(byDecile.head > byDecile.last,
      s"no lift: decile 1 at ${byDecile.head}, decile 10 at ${byDecile.last}")
  }

  test("x99: matrix covers every doc; per-language recall is consistent") {
    val rows = q("x99_langid_confusion").collect()
    val docs = graft.tables.Tables.documents(spark, sf).count()
    assert(rows.map(_.getLong(2)).sum === docs)
    // recall appears exactly on diagonal cells, and recomputes from the
    // matrix itself
    rows.groupBy(_.getString(0)).foreach { case (lang, cells) =>
      val total = cells.map(_.getLong(2)).sum
      cells.foreach { c =>
        if (c.getString(1) == lang) {
          assert(!c.isNullAt(3))
          assert(c.getLong(3) === c.getLong(2) * 1000 / total)
        } else assert(c.isNullAt(3))
      }
    }
  }
}
