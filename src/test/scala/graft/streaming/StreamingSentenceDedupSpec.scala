package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.tables.Tables
import graft.text.TextOps

/** Streaming corpus-wide sentence dedup (VERDICT r9 #7): two batches
  * processed through the persisted first-occurrence index must equal the
  * one-shot batch pass over the whole corpus, and the per-batch plan
  * must probe the index — never re-explode earlier batches.
  */
class StreamingSentenceDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** The x114 plant: shared boilerplate tails on two doc classes. */
  private def planted = Tables.documents(spark, TestSpark.Sf0001)
    .select(col("doc_id"),
      when(pmod(col("doc_id"), lit(5L)) === 0,
        concat(col("text"), lit(". all rights reserved. visit example dot com")))
        .when(pmod(col("doc_id"), lit(5L)) === 1,
          concat(col("text"), lit(". all rights reserved")))
        .otherwise(col("text")).as("text"))

  test("two-batch replay equals the one-shot batch dedup, index probed") {
    val key = Seq("sent-dedup-spec", TestSpark.Sf0001,
      System.nanoTime().toString)
    try {
      val cut = 400L // doc-id order split: batch boundary respects order
      val b1 = planted.where(col("doc_id") < cut)
      val b2 = planted.where(col("doc_id") >= cut)
      assert(b1.count() > 0 && b2.count() > 0)

      val out1 = StreamingSentenceDedup.processBatch(b1, key)
      // batch 1 must agree with a batch pass over batch 1 alone (no
      // prior corpus memory in a fresh index)
      val solo1 = TextOps.dedupSentences(b1, "doc_id", "text")
      assert(out1.exceptAll(solo1).count() === 0L)
      assert(solo1.exceptAll(out1).count() === 0L)

      val idxAfter1 = StreamingSentenceDedup.ensureIndex(spark, key).count()
      assert(idxAfter1 > 0, "batch 1 must populate the index")
      val out2 = StreamingSentenceDedup.processBatch(b2, key)
      // the O(batch) contract: the probe + explode ran batch-side into
      // the per-batch staging parquet, so the RETURNED plan contains no
      // generator at all (nothing — least of all an earlier batch — is
      // re-exploded to consume the result) and reads only the batch +
      // its own staging under the index artifact
      val plan2 = out2.queryExecution.optimizedPlan
      assert(plan2.collect {
        case g: org.apache.spark.sql.catalyst.plans.logical.Generate => g
      }.isEmpty, s"consuming batch 2 must not re-explode anything:\n$plan2")
      assert(out2.queryExecution.executedPlan.toString.contains("sentence_index"),
        "batch 2 must read its staging under the index artifact")
      // cross-batch memory grew: batch 2's new sentences appended
      assert(StreamingSentenceDedup.ensureIndex(spark, key).count() > idxAfter1)

      // stream == batch: concatenated outputs equal the one-shot pass
      val streamed = out1.unionByName(out2)
      val oneShot = TextOps.dedupSentences(planted, "doc_id", "text")
      assert(streamed.exceptAll(oneShot).count() === 0L)
      assert(oneShot.exceptAll(streamed).count() === 0L)
      // and the cross-batch memory actually bit: batch 2 contains docs
      // whose planted tail was stripped because batch 1 admitted it
      val tail = "all rights reserved"
      val strippedInB2 = out2.where(col("n_kept") < col("n_sent")).count()
      assert(strippedInB2 > 0, s"no cross-batch strip observed ($tail)")
    } finally StreamingSentenceDedup.invalidate(spark, key)
  }

  test("a sink-failure replay reuses the staged survivors — never an emptied batch (ADVICE r10)") {
    val key = Seq("sent-dedup-replay-spec", TestSpark.Sf0001,
      System.nanoTime().toString)
    try {
      val cut = 400L
      val b1 = planted.where(col("doc_id") < cut)
      val b2 = planted.where(col("doc_id") >= cut)
      // batch 0 commits; batch 1's sink fails AFTER processBatch ran
      // (index already contains batch 1's own append) and foreachBatch
      // replays the same batchId — the replay must return the first
      // attempt's survivors, NOT re-probe and strip them all
      val out1 = StreamingSentenceDedup.processBatch(b1, key, batchId = 0L)
        .collect()
      val attempt1 = StreamingSentenceDedup.processBatch(b2, key, batchId = 1L)
        .collect().map(_.toString).sorted
      val replay = StreamingSentenceDedup.processBatch(b2, key, batchId = 1L)
        .collect().map(_.toString).sorted
      assert(replay.toSeq === attempt1.toSeq,
        "replay must reproduce the first attempt bit for bit")
      val keptRows = replay.length
      assert(keptRows > 0 && StreamingSentenceDedup
        .processBatch(b2, key, batchId = 1L).where(col("n_kept") > 0)
        .count() > 0,
        "replay emptied the batch — the r10 append-before-commit loss")
    } finally StreamingSentenceDedup.invalidate(spark, key)
  }
}
