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
      } else if (spent < budget) {
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
      } else {
        // spent == budget exactly: the query marks this level neither
        // full nor boundary, so ALL its docs (even zero-token ones)
        // are dropped — admit nothing
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

  test("x104: TTR bounds and token-mass consistency with x5") {
    val rows = SparkEntry.queries("x104_source_ttr")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (toks, types, ttr) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(types >= 1L && types <= toks, "types bounded by tokens")
      assert(ttr >= 0L && ttr <= 1000L)
      assert(ttr === types * 1000 / toks)
    }
    // token mass agrees with the per-doc x5 counts aggregated by source
    val x5 = SparkEntry.queries("x5_token_count")(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val srcOf = graft.tables.Tables.documents(spark, sf)
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("source"))
      .collect().map(r => r.getLong(0) -> r.getString(1))
    val massBySrc = srcOf.groupBy(_._2).view
      .mapValues(_.map(p => x5(p._1)).sum).toMap
    rows.foreach(r => assert(r.getLong(1) === massBySrc(r.getString(0)),
      s"token mass(${r.getString(0)})"))
  }

  test("x103: observed metrics ride the consuming action's single pass") {
    // the observe() metrics must agree with a direct recompute, and the
    // piggy-backed action's own result must be carried through
    val r = SparkEntry.queries("x103_observed_audit")(spark, sf).head()
    val ev = graft.tables.Tables.events(spark, sf)
    assert(r.getLong(0) === ev.count())
    assert(r.getLong(5) ===
      ev.where(org.apache.spark.sql.functions.col("event_type") === "purchase")
        .count())
    assert(r.getLong(3) <= r.getLong(4), "day range ordered")
    assert(r.getLong(1) >= 0L && r.getLong(2) >= 0L)
  }

  test("x101: gap counts partition the panel; up/down/flat accounted") {
    val rows = SparkEntry.queries("x101_overnight_gaps")(spark, sf)
      .collect()
    assert(rows.length === 2)
    rows.foreach { r =>
      val (n, up, down) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(n === 119L, "120 bars - 1 lag row")
      assert(up + down <= n, "flat gaps are neither up nor down")
      assert(r.getLong(5) <= r.getLong(4),
        "max |gap| cannot exceed the |gap| sum")
    }
  }

  test("x102: spell structure is consistent with x75's drawdown depth") {
    val spells = SparkEntry.queries("x102_underwater_spells")(spark, sf)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(spells.size === 2)
    spells.values.foreach { case (nSpells, maxLen, total) =>
      assert(nSpells > 0L, "the synthetic walk must dip below its peak")
      assert(maxLen >= 1L && maxLen <= total)
      assert(total <= 119L, "day 1 can never be underwater")
      assert(nSpells <= total)
    }
    // depth and duration must agree on WHETHER drawdown happened
    SparkEntry.queries("x75_max_drawdown")(spark, sf).collect()
      .foreach { r =>
        val dd = r.getLong(1)
        assert((dd > 0L) === (spells(r.getString(0))._3 > 0L),
          "x75 depth and x102 duration disagree on drawdown existence")
      }
  }
}
