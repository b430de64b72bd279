package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.text.{LshIndex, MembershipIndex}

case class IngestDoc(doc_id: Long, text: String)

/** End-to-end incremental corpus ingest: exact + near-dup dedup against
  * persisted, APPENDED indexes, exactly-once admission, replay healing.
  */
class IncrementalIngestSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshRoot(name: String): String =
    new java.io.File(
      s"${System.getProperty("java.io.tmpdir")}/graft_ingest/$name-${System.nanoTime()}")
      .getAbsolutePath

  // distinctive mid-length texts: near-dup pairs (base, base + " qq")
  // clear the 0.8 Jaccard bar, unrelated texts share no 3-shingles
  private def txt(i: Long): String =
    s"document number $i alpha bravo charlie delta echo foxtrot golf hotel india juliet"

  private def fresh(keyTag: String): (String, Seq[Any]) = {
    val key = Seq("ingest-spec", keyTag, System.nanoTime().toString)
    MembershipIndex.invalidate(spark, key)
    LshIndex.invalidate(spark, key)
    (freshRoot(keyTag), key)
  }

  test("batch pipeline: self-dup, exact member, near-dup of corpus all dropped; new docs admitted") {
    val (root, key) = fresh("stages")
    val base = (0L until 20L).map(i => IngestDoc(i, txt(i))).toDF()

    val batch = Seq(
      IngestDoc(100, txt(100)),            // genuinely new -> admitted
      IngestDoc(101, txt(100)),            // exact self-dup -> dropped (min-id 100 survives)
      IngestDoc(102, txt(3)),              // exact re-crawl of corpus -> dropped
      IngestDoc(103, txt(5) + " qq"),      // near-dup of corpus doc 5 -> dropped
      IngestDoc(104, txt(200)),            // new -> admitted
      IngestDoc(105, txt(200) + " qq")     // near-dup WITHIN batch of 104 -> dropped
    ).toDF()

    assert(IncrementalIngest.processBatch(batch, 0L, root, base, key))
    val admitted = SnapshotSink.readCommitted(spark, root)
      .select("doc_id").as[Long].collect().toSet
    assert(admitted === Set(100L, 104L))
  }

  test("admitted batches are visible to later batches via the appended indexes") {
    val (root, key) = fresh("append")
    val base = (0L until 20L).map(i => IngestDoc(i, txt(i))).toDF()

    assert(IncrementalIngest.processBatch(
      Seq(IngestDoc(100, txt(100))).toDF(), 0L, root, base, key))
    // batch 1 re-crawls batch 0's admission exactly AND nearly
    assert(IncrementalIngest.processBatch(Seq(
      IngestDoc(200, txt(100)),           // exact dup of admitted 100 -> dropped
      IngestDoc(201, txt(100) + " qq"),   // near-dup of admitted 100 -> dropped
      IngestDoc(202, txt(300))            // new -> admitted
    ).toDF(), 1L, root, base, key))

    val admitted = SnapshotSink.readCommitted(spark, root)
      .select("doc_id").as[Long].collect().toSet
    assert(admitted === Set(100L, 202L))
  }

  test("replayed batchId: table unchanged, indexes healed idempotently") {
    val (root, key) = fresh("replay")
    val base = (0L until 10L).map(i => IngestDoc(i, txt(i))).toDF()
    assert(IncrementalIngest.processBatch(
      Seq(IngestDoc(100, txt(100))).toDF(), 0L, root, base, key))
    // at-least-once delivery replays batch 0 with different stale rows
    assert(!IncrementalIngest.processBatch(
      Seq(IngestDoc(999, txt(999))).toDF(), 0L, root, base, key))
    assert(SnapshotSink.readCommitted(spark, root)
      .select("doc_id").as[Long].collect().toSet === Set(100L))
    // the replay re-appended admitted rows; probes still collapse dups —
    // a near-dup of 100 is still caught
    assert(IncrementalIngest.processBatch(
      Seq(IngestDoc(300, txt(100) + " qq")).toDF(), 1L, root, base, key))
    assert(SnapshotSink.readCommitted(spark, root)
      .select("doc_id").as[Long].collect().toSet === Set(100L))
  }

  test("e2e streaming query with checkpoint restart: no duplicates, dedup across restart") {
    val (root, key) = fresh("e2e")
    val ckpt = freshRoot("e2e-ckpt")
    val base = (0L until 10L).map(i => IngestDoc(i, txt(i))).toDF()
    implicit val sc = spark.sqlContext

    val in1 = MemoryStream[IngestDoc]
    in1.addData(IngestDoc(100, txt(100)), IngestDoc(101, txt(3)))
    val q1 = in1.toDF().writeStream
      .foreachBatch(IncrementalIngest.writer(root, base, key))
      .option("checkpointLocation", ckpt).start()
    try q1.processAllAvailable() finally q1.stop()

    // restart on the same checkpoint; offsets 0..1 replay, new data
    // includes a near-dup of the pre-restart admission
    val in2 = MemoryStream[IngestDoc]
    in2.addData(IngestDoc(100, txt(100)), IngestDoc(101, txt(3)))
    in2.addData(IngestDoc(200, txt(100) + " qq"), IngestDoc(201, txt(400)))
    val q2 = in2.toDF().writeStream
      .foreachBatch(IncrementalIngest.writer(root, base, key))
      .option("checkpointLocation", ckpt).start()
    try q2.processAllAvailable() finally q2.stop()

    val admitted = SnapshotSink.readCommitted(spark, root)
      .select("doc_id").as[Long].collect().toList
    assert(admitted.size === admitted.toSet.size, s"duplicated rows: $admitted")
    assert(admitted.toSet === Set(100L, 201L))
  }
}
