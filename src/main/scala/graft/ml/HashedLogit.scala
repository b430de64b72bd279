package graft.ml

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.text.TextOps
import graft.util.ArtifactStore

/** Distributed training of a hashed-bag-of-words linear classifier — the
  * quality-filter fit stage of LLM corpus curation (a fastText-style
  * student distilling an integer teacher rule), expressed as pure
  * DataFrame aggregates in ALL-INTEGER fixed-point arithmetic so training
  * itself is engine-exact: any engine replaying the same rounds derives
  * bit-identical weights (the x36b DuckDB oracle does exactly that with
  * an unrolled CTE chain).
  *
  * Model: score(doc) = biasCnt·w[B] + Σ_tokens w[rollingHash31(tok) mod B]
  * (slot B is the bias — a virtual always-on feature with constant count
  * `biasCnt`, which puts its gradient on the same scale as the token
  * counts). Keep = score > 0.
  *
  * Training: batch subgradient descent on logistic loss with a HARD
  * sigmoid (p = clamp(500 + margin, 0, 1000) per-mill — saturating
  * integer add, no exp/division in the loop). Per round:
  *   1. margin per doc: one groupBy(doc) over the cached feature table,
  *      weights applied row-locally via a literal array lookup (no join);
  *   2. gradient per bucket g_b = Σ_docs err·cnt: ONE groupBy(bucket)
  *      into at most B+1 rows, collected to the driver (the Lloyd-rounds
  *      pattern: bounded model state crosses the driver, never data);
  *   3. w_b += trunc(g_b / etaDen) — truncation-toward-zero division,
  *      spelled identically in the oracle (floor of the negated absolute
  *      value), because Spark `div` truncates while DuckDB `//` floors.
  *
  * Scale shape: the feature table is (docs × distinct-buckets-per-doc)
  * rows, cached once; each round is two partial-aggregable shuffles and a
  * ≤(B+1)-row collect. Rounds are a fixed small constant — total cost
  * O(rounds · corpus), embarrassingly partition-parallel, no
  * per-doc driver work.
  */
object HashedLogit {

  /** Teacher label in per-mill: 1000 iff the doc has >= `thresh` tokens.
    * Deliberately a rule BOTH engines can evaluate exactly — the point of
    * x36b is oracle-checkable training machinery; any integer teacher
    * (an upstream model's keep bit, a human label column) plugs into the
    * same fit unchanged.
    */
  private def label(nTok: org.apache.spark.sql.Column, thresh: Int) =
    when(nTok >= thresh, lit(1000L)).otherwise(lit(0L))

  /** Per-doc hashed feature counts + the bias row, with labels. Schema:
    * (__doc, __y, __b, __cnt); bucket B is the bias feature.
    */
  def features(docs: DataFrame, idCol: String, textCol: String,
               buckets: Int, thresh: Int, biasCnt: Long): DataFrame = {
    val toks = docs
      .select(col(idCol).as("__doc"), explode(TextOps.tokens(col(textCol))).as("__t"))
    val labeled = toks.groupBy("__doc")
      .agg(count(lit(1)).as("__n"))
      .select(col("__doc"), label(col("__n"), thresh).as("__y"))
    val bucketed = toks
      .select(col("__doc"), pmod(TextOps.rollingHash(col("__t")), lit(buckets.toLong)).as("__b"))
      .groupBy("__doc", "__b").agg(count(lit(1)).as("__cnt"))
    val bias = labeled.select(col("__doc"), lit(buckets.toLong).as("__b"),
      lit(biasCnt).as("__cnt"))
    bucketed.unionByName(bias).join(labeled, "__doc")
  }

  /** Truncation-toward-zero integer division (Java/Scala `/` semantics),
    * the form the oracle mirrors with an explicit CASE.
    */
  private def tdiv(a: Long, d: Long): Long = a / d

  /** Fit weights (length buckets+1, last = bias) by `rounds` rounds of
    * integer batch GD. Deterministic: same corpus, same params → same
    * weights, on any engine.
    */
  def fit(docs: DataFrame, idCol: String, textCol: String, buckets: Int,
          thresh: Int, rounds: Int, etaDen: Long, biasCnt: Long): Array[Long] = {
    val feat = features(docs, idCol, textCol, buckets, thresh, biasCnt)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val w = new Array[Long](buckets + 1)
      for (_ <- 1 to rounds) {
        // weights as a row-local literal-array lookup (index = bucket+1)
        val wArr = lit(w)
        val margins = feat
          .groupBy("__doc", "__y")
          .agg(sum(col("__cnt") * element_at(wArr, col("__b").cast("int") + 1))
            .as("__m"))
          .select(col("__doc"),
            (col("__y") - least(greatest(lit(500L) + col("__m"), lit(0L)),
              lit(1000L))).as("__err"))
        val grad = feat.join(margins, "__doc")
          .groupBy("__b")
          .agg(sum(col("__err") * col("__cnt")).as("__g"))
          .collect()
        grad.foreach { r =>
          w(r.getLong(0).toInt) += tdiv(r.getLong(1), etaDen)
        }
      }
      w
    } finally { feat.unpersist(); () }
  }

  /** Fit-or-load via the durable artifact store, keyed by the corpus
    * fixture stamp + every hyperparameter — a fresh JVM (or a second
    * driver on a shared artifact dir) loads the tiny weight table instead
    * of re-scanning the corpus.
    */
  def ensureWeights(spark: SparkSession, docs: DataFrame, idCol: String,
                    textCol: String, buckets: Int, thresh: Int, rounds: Int,
                    etaDen: Long, biasCnt: Long,
                    key: Seq[Any]): Array[Long] =
    ArtifactStore.getOrCompute(spark, "hashed_logit",
      key ++ Seq(buckets, thresh, rounds, etaDen, biasCnt),
      ArtifactStore.LongsCodec) {
      fit(docs, idCol, textCol, buckets, thresh, rounds, etaDen, biasCnt).toSeq
    }.toArray

  /** The x36b DuckDB oracle: the SAME integer GD unrolled as a
    * MATERIALIZED-CTE chain (materialization is required — w_k is
    * referenced twice per round, so inlined CTEs would expand the scan
    * tree exponentially). Textual generation keeps the oracle in exact
    * lockstep with `fit`'s round structure.
    */
  def oracleSql(buckets: Int, thresh: Int, rounds: Int, etaDen: Long,
                biasCnt: Long): String = {
    val hash = "(list_reduce(list_transform(range(1, length(t)+1), " +
      "i -> CAST(ascii(t[i]) AS BIGINT)), (acc,c) -> (acc*31+c) % 2147483647)" +
      s" % $buckets)"
    def sdiv(g: String) =
      s"CASE WHEN $g >= 0 THEN $g // $etaDen ELSE -((-($g)) // $etaDen) END"
    val head = Seq(
      "tok AS MATERIALIZED (SELECT doc_id, unnest(string_split_regex(" +
        "trim(lower(text)), '\\s+')) AS t FROM documents WHERE trim(text) <> '')",
      s"lab AS MATERIALIZED (SELECT doc_id, CASE WHEN count(*) >= $thresh " +
        "THEN 1000 ELSE 0 END AS y FROM tok GROUP BY 1)",
      s"bf AS MATERIALIZED (SELECT doc_id, $hash AS b, " +
        "CAST(count(*) AS BIGINT) AS cnt FROM tok GROUP BY 1, 2)",
      "feat AS MATERIALIZED (SELECT f.doc_id, lab.y, f.b, f.cnt FROM " +
        s"(SELECT * FROM bf UNION ALL SELECT doc_id, $buckets AS b, " +
        s"$biasCnt AS cnt FROM lab) f JOIN lab USING (doc_id))",
      "g1 AS MATERIALIZED (SELECT b, SUM((y - 500) * cnt) AS g FROM feat GROUP BY b)",
      s"w1 AS MATERIALIZED (SELECT b, ${sdiv("g")} AS w FROM g1)")
    val loop = (2 to rounds).flatMap { k =>
      Seq(
        s"m$k AS MATERIALIZED (SELECT f.doc_id, f.y, SUM(f.cnt * COALESCE(w.w, 0)) AS m " +
          s"FROM feat f LEFT JOIN w${k - 1} w USING (b) GROUP BY 1, 2)",
        s"e$k AS MATERIALIZED (SELECT doc_id, y - LEAST(GREATEST(500 + m, 0), 1000) " +
          s"AS err FROM m$k)",
        s"g$k AS MATERIALIZED (SELECT f.b, SUM(e.err * f.cnt) AS g FROM feat f " +
          s"JOIN e$k e USING (doc_id) GROUP BY 1)",
        s"w$k AS MATERIALIZED (SELECT COALESCE(w.b, g.b) AS b, COALESCE(w.w, 0) + " +
          s"COALESCE(${sdiv("g.g")}, 0) AS w FROM w${k - 1} w FULL JOIN g$k g USING (b))")
    }
    val score = s"$biasCnt * COALESCE(wb.w, 0) + COALESCE(ts.s, 0)"
    s"""WITH ${(head ++ loop).mkString(",\n")}
       |SELECT d.doc_id,
       |       CAST($score AS BIGINT) AS score,
       |       CASE WHEN $score > 0 THEN 1 ELSE 0 END AS keep
       |FROM documents d
       |LEFT JOIN (SELECT bf.doc_id, SUM(bf.cnt * COALESCE(w.w, 0)) AS s
       |           FROM bf LEFT JOIN w$rounds w USING (b) GROUP BY 1) ts
       |  ON d.doc_id = ts.doc_id
       |LEFT JOIN (SELECT w FROM w$rounds WHERE b = $buckets) wb ON TRUE""".stripMargin
  }
}
