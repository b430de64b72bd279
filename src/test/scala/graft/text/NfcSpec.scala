package graft.text

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** NFC normalization at the text-ingest front (VERDICT r8 #4): the
  * planted-NFD-variant proof that the normalized path merges what the
  * raw path misses, for each hashing consumer behind the parameter.
  */
class NfcSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // the same logical text, twice: precomposed U+00E9 vs 'e'+U+0301
  private val nfcText = "caf\u00e9 con leche y pan tostado para todos hoy"
  private val nfdText = "cafe\u0301 con leche y pan tostado para todos hoy"

  test("nfc(): NFD folds to precomposed; ASCII passes through unchanged") {
    val r = Seq((1L, nfdText), (2L, nfcText), (3L, "plain ascii text"))
      .toDF("id", "t")
      .select(col("id"), TextOps.nfc(col("t")).as("n")).collect()
      .map(x => x.getLong(0) -> x.getString(1)).toMap
    assert(r(1L) === nfcText, "NFD not folded to NFC")
    assert(r(2L) === nfcText)
    assert(r(3L) === "plain ascii text")
  }

  test("nearDupPairs: raw path misses the encoding-split pair; NFC path finds it") {
    val docs = Seq((1L, nfcText), (2L, nfdText), (3L, "a wholly unrelated document about ships"))
      .toDF("doc_id", "text")
    val raw = TextOps.nearDupPairs(docs, threshold = 0.9).collect()
    assert(raw.isEmpty,
      "byte-different encodings should defeat the RAW shingle path (that's the hazard)")
    val normed = TextOps.nearDupPairs(docs, threshold = 0.9, normalizeNfc = true)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(normed.toSeq === Seq((1L, 2L, 1.0)),
      s"NFC path must surface the pair with Jaccard 1: ${normed.toSeq}")
  }

  test("stripBoilerplate: an encoding-split boilerplate span counts as ONE segment") {
    // the same 3-token span in two encodings across 12 docs — under the
    // raw path each variant appears in only 6 docs (below minDocs=8);
    // NFC merges them to 12 and the strip fires. The span is EXACTLY one
    // segment and contains the é, so no ASCII sub-segment is organically
    // hot on the raw path.
    val span1 = "caf\u00e9 con leche"
    val span2 = "cafe\u0301 con leche"
    val docs = (0L until 12L).map { i =>
      val span = if (i % 2 == 0) span1 else span2
      (i, s"$span unique$i filler$i tail$i")
    }.toDF("doc_id", "text")
    val raw = TextOps.stripBoilerplate(docs, "doc_id", "text",
      segTokens = 3, minDocs = 8)
    assert(raw.where(col("n_kept") < col("n_seg")).count() === 0L,
      "raw path should NOT strip (each variant is below minDocs)")
    val normed = TextOps.stripBoilerplate(docs, "doc_id", "text",
      segTokens = 3, minDocs = 8, normalizeNfc = true)
    assert(normed.where(col("n_kept") < col("n_seg")).count() === 12L,
      "NFC path must strip the merged hot span from every doc")
  }
}
