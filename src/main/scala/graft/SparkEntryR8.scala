package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.tables.Tables

/** Round-8 query entries: trained-model corpus curation. */
object SparkEntryR8 {

  // x36b hyperparameters — shared by the Spark fit and the generated
  // DuckDB oracle so the two engines replay identical rounds.
  private val Buckets = 1024
  private val Thresh = 60
  private val Rounds = 20
  private val EtaDen = 20000L
  private val BiasCnt = 10L

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ---- X36b: TRAINED hashed linear quality classifier ----
    //
    // x36's serving path with LEARNED weights: integer batch GD over the
    // hashed bag-of-words features (graft.ml.HashedLogit — per-round
    // gradient is one groupBy into <= buckets+1 rows, the Lloyd-rounds
    // pattern), weights persisted via ArtifactStore keyed by the corpus
    // fixture stamp, scoring one compiled codegen kernel pass
    // (HashedBagWeightedScore). Training is ALL-INTEGER fixed-point
    // (hard-sigmoid logistic), so the DuckDB oracle replays the same
    // rounds as an unrolled CTE chain and matches bit-for-bit — an
    // oracle-checked TRAINING loop, not just an oracle-checked scorer.
    // Teacher here: token-count >= Thresh (any integer label plugs in).
    "x36b_trained_classifier" -> ((s, d) => {
      import org.apache.spark.sql.graft.ColumnBridge.{column => ccol, expression => cexp}
      import graft.expressions.HashedBagWeightedScore
      import graft.text.TextOps
      val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
      val w = graft.ml.HashedLogit.ensureWeights(s, docs, "doc_id", "text",
        Buckets, Thresh, Rounds, EtaDen, BiasCnt,
        Seq(d, Tables.stamp(d, "documents")))
      docs.select(col("doc_id"),
          ccol(HashedBagWeightedScore(cexp(TextOps.tokens(col("text"))), w, BiasCnt))
            .as("score"))
        .select(col("doc_id"), col("score"),
          when(col("score") > 0, 1).otherwise(0).as("keep"))
    }))

  def oracleSql: Map[String, String] = Map(
    "x36b_trained_classifier" ->
      graft.ml.HashedLogit.oracleSql(Buckets, Thresh, Rounds, EtaDen, BiasCnt))
}
