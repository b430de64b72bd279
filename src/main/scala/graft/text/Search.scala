package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ranked text retrieval over a document corpus — the "search the training
  * corpus" operator (find documents matching a term set, ranked by
  * relevance). LLM-corpus curation uses this for targeted inspection and
  * leakage hunts; the reference's users get the unranked half from Athena
  * LIKE scans (`/root/reference/README.md:274-296`).
  *
  * Scale design: the query's term set is small and fixed, so instead of the
  * classic posting-list shape (explode → groupBy (doc, term) → join per-term
  * stats → groupBy doc = THREE shuffles of posting-sized data), both
  * scorers pivot the terms into per-document conditional counts in ONE
  * aggregate: corpus scanned once, one doc-keyed shuffle of (k_terms + 1)
  * longs per matching doc, document frequencies reduced from that tiny
  * frame in a single-row aggregate that broadcasts back. The final ranking
  * is a true top-k (`TakeOrderedAndProject`, pinned in SubqueryPlanSpec) —
  * the full ranking never materializes.
  *
  * Scoring twins, same discipline as HLL/ANN:
  *  - [[tfidfTopK]]: integer-exact surrogate — idf as the scaled integer
  *    `(N * 1e6) DIV df` — every score a BIGINT, so the oracle row is
  *    hash-exact cross-engine (`x18_tfidf_search`).
  *  - [[bm25TopK]]: real BM25 (log idf, k1/b saturation) in doubles; the
  *    per-row score sums in fixed syntactic term order (no cross-row float
  *    fold), deterministic per engine but carrying `ln`, so it ships as a
  *    rows-only entry + `SearchSpec` ranking properties.
  */
object Search {

  /** Query terms the `x18_*` entries search the fixture corpus for —
    * mid-frequency engine vocabulary present at every SF.
    */
  val DefaultTerms: Seq[String] = Seq("join", "filter", "vector")

  /** Per-document pivoted term-frequency frame: one row per document that
    * contains at least one query term, columns `tf_0 .. tf_{n-1}` (BIGINT),
    * plus `dl` (document token length, for BM25's length normalization)
    * when `withDl`. One corpus scan, one doc-keyed aggregate — no
    * (doc, term) shuffle.
    *
    * `withDl` is a plan-identity knob, not just a convenience: the tf frame
    * feeds both the scoring rows and [[docFreqs]], and AQE only reuses the
    * shuffle stage if both consumers leave the subtree canonically
    * identical after column pruning. A scorer that needs `dl` must carry it
    * in BOTH branches (docFreqs aggregates it away), one that doesn't must
    * carry it in neither — `SearchSpec`'s reuse pin guards this.
    */
  private def pivotedTf(docs: DataFrame, terms: Seq[String],
                        withDl: Boolean): DataFrame = {
    val tok = col("tok")
    val base =
      if (withDl) docs.select(col("doc_id"), col("dl"), explode(col("toks")).as("tok"))
      else docs.select(col("doc_id"), explode(col("toks")).as("tok"))
    val tfAggs = terms.zipWithIndex.map { case (t, i) =>
      count(when(tok === t, 1)).as(s"tf_$i")
    }
    val aggs = if (withDl) first(col("dl")).as("dl") +: tfAggs else tfAggs
    base.filter(tok.isin(terms: _*))
      .groupBy(col("doc_id"))
      .agg(aggs.head, aggs.tail: _*)
  }

  private def withToks(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), TextOps.tokens(col("text")).as("toks"))
      .withColumn("dl", size(col("toks")).cast("long"))

  /** Integer-exact scaled tf-idf top-k: score(doc) = Σ_t tf_t · ⌊N·10⁶/df_t⌋
    * (all BIGINT; rarer terms weigh more, the 10⁶ scale keeps integer
    * precision). Ties cut deterministically by doc_id. Output:
    * (doc_id, score).
    */
  /** Document frequencies from the pivoted frame: df_t = #docs with tf_t>0.
    * A single-row aggregate over the (already tiny) per-doc tf frame.
    */
  private def docFreqs(tf: DataFrame, nTerms: Int): DataFrame = {
    val aggs = (0 until nTerms)
      .map(i => sum((col(s"tf_$i") > 0).cast("long")).as(s"df_$i"))
    tf.agg(aggs.head, aggs.tail: _*)
  }

  def tfidfTopK(docs: DataFrame, terms: Seq[String], k: Int): DataFrame = {
    val toks = withToks(docs)
    // no dl on either branch → the tf subtree canonicalizes identically
    // under the scoring AND df consumers, and AQE reuses the shuffle stage
    // (SearchSpec pin) — the corpus is scanned and shuffled once
    val tf = pivotedTf(toks, terms, withDl = false)
    val dfs = docFreqs(tf, terms.size)
    val nd = docs.agg(count(lit(1)).as("n_docs"))
    // BIGINT-exact scaled idf: SQL DIV (IntegralDivide) — a floor(double /)
    // would lose exactness once N*1e6 passes 2^53
    val score = terms.indices
      .map(i => expr(s"tf_$i * ((n_docs * 1000000) DIV df_$i)"))
      .reduce(_ + _)
    tf.crossJoin(broadcast(dfs))
      .crossJoin(broadcast(nd))
      .select(col("doc_id"), score.as("score"))
      .orderBy(col("score").desc, col("doc_id").asc)
      .limit(k)
  }

  /** Real BM25 top-k: score(doc) = Σ_t ln(1 + (N−df+0.5)/(df+0.5)) ·
    * tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl)). Same one-shuffle plan as
    * [[tfidfTopK]]; the float sum is row-local in fixed term order.
    * Output: (doc_id, score: double).
    */
  def bm25TopK(docs: DataFrame, terms: Seq[String], k: Int,
               k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val toks = withToks(docs)
    // the scoring branch needs per-doc dl but the df branch prunes it, so
    // the two tf subtrees canonicalize differently and AQE can NOT reuse
    // the shuffle stage — materialize the tiny pivoted frame once (lazy
    // local checkpoint, same device as the CC-dedup rounds) so both
    // consumers read it instead of re-scanning the corpus
    val tf = pivotedTf(toks, terms, withDl = true).localCheckpoint(false)
    val dfs = docFreqs(tf, terms.size)
    val stats = docs.agg(count(lit(1)).cast("double").as("n_docs"))
    val avgdl = toks.agg((sum(col("dl")).cast("double") / count(lit(1))).as("avgdl"))
    def termScore(i: Int): Column = {
      val tfD = col(s"tf_$i").cast("double")
      val dfD = col(s"df_$i").cast("double")
      val idf = log(lit(1.0) + (col("n_docs") - dfD + lit(0.5)) / (dfD + lit(0.5)))
      val sat = tfD * lit(k1 + 1.0) /
        (tfD + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl").cast("double") / col("avgdl")))
      idf * sat
    }
    tf.crossJoin(broadcast(dfs))
      .crossJoin(broadcast(stats))
      .crossJoin(broadcast(avgdl))
      .select(col("doc_id"),
        terms.indices.map(termScore).reduce(_ + _).as("score"))
      .orderBy(col("score").desc, col("doc_id").asc)
      .limit(k)
  }
}
