package graft.text

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Within-document substring dedup (VERDICT r8 #5): first occurrence of
  * each segment survives, later repeats are stripped, and the plan is
  * shuffle-free — the op never reassembles the corpus.
  */
class IntraDocDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("aligned repeats strip to the first occurrence, order preserved") {
    val docs = Seq(
      (1L, "a b c a b c"),            // exact doubled doc
      (2L, "x y z q r s x y z"),      // repeat of segment 1 at position 3
      (3L, "u v w all distinct here"),
      (4L, "")).toDF("doc_id", "text")
    val out = TextOps.dedupWithinDoc(docs, "doc_id", "text", segTokens = 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(out(1L) === ((2L, 1L, "a b c")))
    assert(out(2L) === ((3L, 2L, "x y z q r s")))
    assert(out(3L) === ((2L, 2L, "u v w all distinct here")))
    assert(out(4L) === ((0L, 0L, "")))
  }

  test("misaligned repeats survive (segment-grid semantics, like x48)") {
    // "a b c d a b c d": segments [a b c][d a b][c d] — the repeat does
    // not align to the grid, so nothing strips; the oracle replays the
    // same grid, so this is a semantic contract, not a bug
    val docs = Seq((1L, "a b c d a b c d")).toDF("doc_id", "text")
    val r = TextOps.dedupWithinDoc(docs, "doc_id", "text", segTokens = 3)
      .collect().head
    assert((r.getLong(1), r.getLong(2)) === ((3L, 3L)))
  }

  test("NFC parameter merges encoding-split repeats within a doc") {
    val doc = "caf\u00e9 con leche cafe\u0301 con leche"
    val docs = Seq((1L, doc)).toDF("doc_id", "text")
    val raw = TextOps.dedupWithinDoc(docs, "doc_id", "text", segTokens = 3)
      .collect().head
    assert(raw.getLong(2) === 2L, "raw path keeps both encodings")
    val normed = TextOps.dedupWithinDoc(docs, "doc_id", "text",
      segTokens = 3, normalizeNfc = true).collect().head
    assert(normed.getLong(2) === 1L, "NFC path strips the repeat")
    assert(normed.getString(3) === "caf\u00e9 con leche")
  }

  test("the plan is shuffle-free: scan -> project, no exchange at all") {
    val docs = graft.tables.Tables.documents(spark, TestSpark.Sf0001)
      .select(col("doc_id"), col("text"))
    val p = TextOps.dedupWithinDoc(docs, "doc_id", "text", segTokens = 3)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"intra-doc dedup plans a shuffle:\n$p")
  }
}
