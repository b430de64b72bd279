package graft

import org.scalatest.funsuite.AnyFunSuite

class GraftExtensionsSpec extends AnyFunSuite {
  private lazy val spark = {
    val s = TestSpark.spark
    org.apache.spark.sql.graft.ColumnBridge.registerFunctions(s)
    s
  }

  test("native expressions are callable from SQL") {
    val sim = spark.sql(
      """SELECT graft_cosine_similarity(array(1.0D, 2.0D, 3.0D),
        |                               array(3.0D, 2.0D, 1.0D)) AS s""".stripMargin)
      .head().getDouble(0)
    assert(math.abs(sim - 10.0 / 14.0) < 1e-12)

    assert(spark.sql("SELECT graft_rolling_hash31('abc') AS h")
      .head().getLong(0) === 96354L)

    val sh = spark.sql("SELECT graft_word_shingles('a b c d', 3) AS sh")
      .head().getSeq[String](0)
    assert(sh === Seq("a b c", "b c d"))

    val keys = spark.sql(
      "SELECT graft_minhash_band_keys(array('a b c', 'b c d'), 8, 4, 2) AS k")
      .head().getSeq[Long](0)
    assert(keys.length === 4)

    assert(spark.sql("SELECT graft_simhash31(array('a b c')) AS s")
      .head().getLong(0) >= 0L)

    val rep = spark.sql(
      "SELECT graft_repetition_stats(array('a', 'b', 'a', 'b', 'a')) AS r")
      .selectExpr("r.dup_frac", "r.top_bigram_frac").head()
    assert(rep.getDouble(0) === 3.0 / 5.0 && rep.getDouble(1) === 2.0 / 4.0)

    val topk = spark.sql(
      """SELECT graft_topk(s, i, 2) AS t FROM VALUES
        |  (0.5D, 10L), (0.9D, 7L), (0.5D, 3L) AS v(s, i)""".stripMargin)
      .selectExpr("inline(t)")
      .collect().map(r => (r.getDouble(0), r.getLong(1))).toSeq
    assert(topk === Seq((0.9, 7L), (0.5, 3L)))
  }

  test("graft_topk: numeric inputs are cast; non-numeric fail at analysis (ADVICE r2)") {
    // float score / int id go through the builder's implicit casts
    val topk = spark.sql(
      """SELECT graft_topk(s, i, 2) AS t FROM VALUES
        |  (CAST(0.5 AS FLOAT), 10), (CAST(0.9 AS FLOAT), 7) AS v(s, i)""".stripMargin)
      .selectExpr("inline(t)")
      .collect().map(r => (r.getDouble(0), r.getLong(1))).toSeq
    assert(topk === Seq((0.9f.toDouble, 7L), (0.5f.toDouble, 10L)))
    // a string score is an ANALYSIS error, not a mid-job ClassCastException
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql(
        """SELECT graft_topk(s, i, 2) FROM VALUES ('x', 1L) AS v(s, i)""")
        .collect()
    }
    assert(e.getMessage.contains("graft_topk requires"))
  }

  test("KLL sketch functions are callable from SQL and exact under capacity") {
    // 5 values < k=200: the sketch holds them all, so quantiles are EXACT
    // (INCLUSIVE criteria: smallest value with rank >= r)
    val p50 = spark.sql(
      """SELECT graft_kll_quantile(graft_kll_agg(v, 200), 0.5D) AS q FROM VALUES
        |  (1.0D), (2.0D), (3.0D), (4.0D), (5.0D) AS t(v)""".stripMargin)
      .head().getDouble(0)
    assert(p50 === 3.0)
    // union of two part-sketches over a partitioned range is still exact
    // under capacity — the mergeable-lifecycle contract
    val merged = spark.sql(
      """SELECT graft_kll_quantile(graft_kll_union(sk), 1.0D) AS q FROM (
        |  SELECT graft_kll_agg(v, 200) AS sk FROM VALUES
        |    (1.0D), (2.0D) AS t(v)
        |  UNION ALL
        |  SELECT graft_kll_agg(v, 200) FROM VALUES
        |    (9.0D), (10.0D) AS t(v)
        |)""".stripMargin).head().getDouble(0)
    assert(merged === 10.0)
    // int input is cast by the builder; string fails at analysis
    assert(!spark.sql("SELECT graft_kll_agg(v, 200) FROM VALUES (1), (2) AS t(v)")
      .head().isNullAt(0))
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT graft_kll_agg(v, 200) FROM VALUES ('x') AS t(v)").collect()
    }
    assert(e.getMessage.contains("graft_kll_agg requires"))
  }

  test("non-literal config args are rejected with a clear error") {
    val e = intercept[Exception] {
      spark.sql("SELECT graft_word_shingles('a b c', 1 + 2)").collect()
    }
    assert(e.getMessage.contains("integer literal"))
  }
}
