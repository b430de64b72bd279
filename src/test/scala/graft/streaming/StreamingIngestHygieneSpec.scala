package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.tables.Tables
import graft.text.TextOps

case class HDoc(docId: Long, text: String)

/** Stream == batch for the stateless ingest-hygiene stage (x105+x106
  * twin): same rows in, bit-identical (n_seg, n_kept, text_kept) out,
  * and the stream plan carries no state store.
  */
class StreamingIngestHygieneSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.Sf0001

  test("stream output matches the batch dedupWithinDoc bit-for-bit") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    // the x106 plant: every 11th doc doubled, plus one NFD/NFC pair so
    // the normalization half provably fires inside the stream
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"),
        when(pmod(col("doc_id"), lit(11L)) === 0,
          concat(col("text"), lit(" "), col("text")))
          .otherwise(col("text")).as("text"))
      .limit(60)
    val batch = TextOps.dedupWithinDoc(docs.withColumnRenamed("doc_id", "docId"),
        "docId", "text", segTokens = 3, normalizeNfc = true)
      .as[(Long, Long, Long, String)].collect().map(r => r._1 -> r).toMap

    val sample = docs.as[(Long, String)].collect()
    val nfdDoc = HDoc(9000001L, "caf\u00e9 con leche cafe\u0301 con leche")
    val input = MemoryStream[HDoc]
    val out = StreamingIngestHygiene.clean(input.toDF(), "docId", "text")
    // stateless by construction: a pure projection — no aggregate, no
    // join, no dedup operator that would demand a state store
    val analyzed = out.queryExecution.analyzed.toString
    assert(!analyzed.contains("Aggregate") && !analyzed.contains("Join") &&
      !analyzed.contains("Deduplicate"),
      s"hygiene stage is not a pure projection:\n$analyzed")
    val q = out.writeStream.format("memory").queryName("hygiene_out")
      .outputMode("append").start()
    try {
      input.addData(sample.map { case (id, t) => HDoc(id, t) }.toIndexedSeq: _*)
      input.addData(nfdDoc)
      q.processAllAvailable()
      import spark.implicits._
      val got = spark.table("hygiene_out")
        .as[(Long, Long, Long, String)].collect().map(r => r._1 -> r).toMap
      assert(got.size === sample.length + 1)
      sample.foreach { case (id, _) =>
        assert(got(id) === batch(id), s"doc $id diverged from batch")
      }
      // the NFD half folded to the NFC half and deduped to one segment
      assert(got(9000001L) === ((9000001L, 2L, 1L, "caf\u00e9 con leche")))
    } finally q.stop()
  }
}
