package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.text.ShardManifest
import graft.util.ArtifactStore

case class ManifestDoc(doc_id: Long, text: String)

/** Streaming shard-manifest maintenance: each micro-batch folds into a
  * persisted version chain whose head always equals a from-scratch
  * manifest of everything ingested — and replays change nothing.
  */
class StreamingManifestSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def txt(i: Long): String =
    s"streamed document $i with some representative token mass ${i % 7}"

  private def freshChain(tag: String): Seq[Any] = {
    val key = Seq("manifest-spec", tag, System.nanoTime().toString)
    for (b <- -1L to 3L)
      ArtifactStore.invalidate(spark, "shard_manifest",
        StreamingManifest.versionKey(key, b))
    key
  }

  test("chain head == from-scratch manifest after every micro-batch") {
    val key = freshChain("chain")
    val base = (0L until 30L).map(i => ManifestDoc(i, txt(i))).toDF()
    StreamingManifest.ensureBase(spark, base, key)

    val b0 = (100L until 120L).map(i => ManifestDoc(i, txt(i)))
    val b1 = (200L until 235L).map(i => ManifestDoc(i, txt(i)))
    StreamingManifest.processBatch(b0.toDF(), 0L, key)
    val all0 = base.unionByName(b0.toDF())
    assert(StreamingManifest.version(spark, key, 0L).orderBy("shard")
      .collect().toSeq ===
      ShardManifest.manifest(all0).orderBy("shard").collect().toSeq)

    StreamingManifest.processBatch(b1.toDF(), 1L, key)
    val all1 = all0.unionByName(b1.toDF())
    assert(StreamingManifest.version(spark, key, 1L).orderBy("shard")
      .collect().toSeq ===
      ShardManifest.manifest(all1).orderBy("shard").collect().toSeq)

    // replayed batchId: version already published, nothing changes —
    // even if the replay carried different rows (the checkpoint's
    // batchId, not the payload, is the identity)
    StreamingManifest.processBatch(
      Seq(ManifestDoc(999L, "should not be absorbed")).toDF(), 1L, key)
    assert(StreamingManifest.version(spark, key, 1L).orderBy("shard")
      .collect().toSeq ===
      ShardManifest.manifest(all1).orderBy("shard").collect().toSeq)
  }

  test("compaction preserves the manifest (physical rewrite, same content)") {
    // the point of the XOR checksum: ANY physical re-layout of the same
    // rows — here a small-files compaction of a shard-partitioned tree —
    // must reproduce the manifest bit-for-bit
    val docs = (0L until 200L).map(i => ManifestDoc(i, txt(i))).toDF()
    val dir = new java.io.File(
      s"${System.getProperty("java.io.tmpdir")}/graft_manifest_compact-${System.nanoTime()}")
      .getAbsolutePath
    docs.withColumn("shard",
        graft.text.ShardManifest.shardOf(org.apache.spark.sql.functions.col("text"),
          org.apache.spark.sql.functions.col("doc_id")))
      .repartition(16) // force many small files per partition
      .write.partitionBy("shard").parquet(dir)
    def manifestOf = {
      val back = spark.read.parquet(dir).select("doc_id", "text")
      ShardManifest.manifest(back).orderBy("shard").collect().toSeq
    }
    val before = manifestOf
    val (nBefore, nAfter) = graft.pipeline.Compaction.compact(
      spark, dir, targetBytes = 1L << 30, partitionCols = Seq("shard"))
    assert(nAfter < nBefore, "compaction must actually merge files")
    assert(manifestOf === before,
      "physical rewrite changed the content manifest")
  }

  test("drives from a real streaming query via foreachBatch") {
    val key = freshChain("stream")
    val base = (0L until 10L).map(i => ManifestDoc(i, txt(i))).toDF()
    StreamingManifest.ensureBase(spark, base, key)

    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[ManifestDoc]
    val query = mem.toDF()
      .writeStream
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .foreachBatch(StreamingManifest.writer(key))
      .start()
    mem.addData((100L until 140L).map(i => ManifestDoc(i, txt(i))): _*)
    query.awaitTermination(60000)

    val all = base.unionByName(
      (100L until 140L).map(i => ManifestDoc(i, txt(i))).toDF())
    assert(StreamingManifest.version(spark, key, 0L).orderBy("shard")
      .collect().toSeq ===
      ShardManifest.manifest(all).orderBy("shard").collect().toSeq)
  }
}
