package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** N-gram language model over the corpus + per-document likelihood
  * scoring — the (simplified, exact-arithmetic) core of perplexity-based
  * quality filtering: train counts on a reference corpus, score documents
  * by how typical their trigram transitions are, drop the tails.
  *
  * Probability proxy: for trigram t = (w1 w2 w3),
  * p_scaled(t) = cnt3(t) · 10⁶ DIV cnt2(w1 w2) — the conditional
  * P(w3 | w1 w2) in fixed-point. All-integer (counts and floor division),
  * so scores are bit-identical in any engine — the same discipline as the
  * x18 tf-idf scaled idf. A real perplexity filter swaps the proxy for
  * log-probabilities and smoothing; the PLAN is identical.
  *
  * Scale shape: training is one corpus scan → explode trigrams → one
  * count shuffle on the fixed-width n-gram key; the context denominator
  * is an aggregate OVER THE LM TABLE (no second corpus scan). Scoring is
  * an equi-join of document trigrams against the LM — broadcast when the
  * vocabulary fits, hash join on the n-gram key otherwise; never a
  * product.
  */
object NgramLm {

  private def prefix2 = expr("substring_index(tri, ' ', 2)")

  /** Train: (tri, cnt3, cnt2) — trigram count and its 2-gram context
    * count (= Σ cnt3 over trigrams sharing the prefix, which equals the
    * count of CONTEXTS THAT CONTINUE — the correct conditional
    * denominator, free of document-tail miscounts).
    */
  /** @param minCount vocabulary pruning: trigrams seen fewer than
    *   `minCount` times are dropped from the LM TABLE (at web scale the
    *   singleton tail IS most of the table). Denominators are computed
    *   over the FULL counts first, so surviving conditionals are
    *   unchanged — pruned trigrams simply score as unseen (they drop out
    *   of the scoring join), the standard OOV treatment.
    */
  def train(docs: DataFrame, textCol: String = "text",
            minCount: Long = 1): DataFrame = {
    val tri = docs
      .select(explode(TextOps.allShingles(col(textCol), 3)).as("tri"))
      .groupBy(col("tri")).agg(count(lit(1)).as("cnt3"))
      .withColumn("__p2", prefix2)
    val ctx = tri.groupBy(col("__p2")).agg(sum(col("cnt3")).as("cnt2"))
    tri.join(ctx, "__p2")
      .filter(col("cnt3") >= minCount)
      .select(col("tri"), col("cnt3"), col("cnt2"))
  }

  /** Score every document against a trained LM: fixed-point likelihood
    * sum plus the trigram count (callers normalize as they see fit —
    * score/n_tri is the average transition typicality). Documents with
    * fewer than 3 tokens score (0, 0) rather than disappearing.
    */
  def score(docs: DataFrame, lm: DataFrame, idCol: String = "doc_id",
            textCol: String = "text"): DataFrame = {
    val docTri = docs.select(col(idCol),
      explode(TextOps.allShingles(col(textCol), 3)).as("tri"))
    val scored = docTri.join(lm, "tri")
      .groupBy(col(idCol))
      .agg(sum(expr("cnt3 * 1000000L div cnt2")).as("score"),
        count(lit(1)).as("n_tri"))
    docs.select(col(idCol))
      .join(scored, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("score"), lit(0L)).as("score"),
        coalesce(col("n_tri"), lit(0L)).as("n_tri"))
  }
}
