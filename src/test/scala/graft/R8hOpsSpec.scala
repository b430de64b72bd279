package graft

import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for x100, the calibrated-release capstone —
  * the selection semantics the DuckDB oracle proves by agreement but
  * cannot NAME.
  */
class R8hOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.Sf0001

  test("x100: released mass equals an independent replay of the selection") {
    val manifest = SparkEntry.queries("x100_calibrated_release")(spark, sf)
      .collect()
    val relDocs = manifest.map(_.getLong(1)).sum
    val relToks = manifest.map(_.getLong(2)).sum

    // independent replay from the x97 mapping + x5 token counts:
    // full levels in descending norm order, then a doc_id-ordered
    // PREFIX inside the single boundary level (cum <= remaining stops
    // at the first doc that does not fit)
    val norm = SparkEntry.queries("x97_quantile_normalize")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val toks = SparkEntry.queries("x5_token_count")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val budget = toks.values.sum / 2
    val byLevel = norm.groupBy(_._2).view
      .mapValues(_.keys.toSeq.sorted).toSeq.sortBy(-_._1)
    var spent = 0L
    var nKept = 0L
    var boundaryDone = false
    for ((_, ids) <- byLevel if !boundaryDone) {
      val levelToks = ids.map(toks).sum
      if (spent + levelToks <= budget) {
        spent += levelToks; nKept += ids.length
      } else {
        var cum = 0L
        val it = ids.iterator
        var go = true
        while (go && it.hasNext) {
          val id = it.next()
          if (cum + toks(id) <= budget - spent) {
            cum += toks(id); nKept += 1
          } else go = false
        }
        spent += cum
        boundaryDone = true
      }
    }
    assert(relDocs === nKept, "released doc count diverges from replay")
    assert(relToks === spent, "released token mass diverges from replay")
    assert(relToks <= budget, "release exceeds the token budget")
    // tightness: the boundary prefix stops at the first doc that does
    // not fit, so the slack is smaller than the largest document
    assert(budget - relToks < toks.values.max,
      s"release underfills: $relToks of $budget")
  }
}
