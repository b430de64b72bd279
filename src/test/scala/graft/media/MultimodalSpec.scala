package graft.media

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def media = {
    val docs = Seq((1L, "hello world", 11L), (2L, "abc", 3L), (3L, "", 0L))
      .toDF("doc_id", "text", "n_chars")
    Multimodal.fakeMediaFromDocuments(docs)
  }

  test("media schema: opaque binary + typed metadata struct") {
    val m = media
    assert(m.schema("media").dataType.typeName === "binary")
    val meta = m.schema("meta").dataType.typeName
    assert(meta === "struct")
    assert(m.select("meta.width", "meta.height", "meta.format").count() === 3)
  }

  test("decode stub: deterministic byte stats, empty payload safe") {
    val feats = Multimodal.decodeStub(Multimodal.toRecords(media))
      .toDF().orderBy("media_id").collect()
    // "hello world": bytes sum = 1116, len 11
    assert(feats(0).getAs[Int]("n_bytes") === 11)
    assert(math.abs(feats(0).getAs[Double]("mean_byte") - 1116.0 / 11) < 1e-12)
    // "abc" → rolling 31-hash = 96354
    assert(feats(1).getAs[Long]("head_hash") === 96354L)
    // empty payload
    assert(feats(2).getAs[Int]("n_bytes") === 0)
    assert(feats(2).getAs[Double]("mean_byte") === 0.0)
  }

  test("decode stub preserves partitioning (mapPartitions, no shuffle)") {
    val recs = Multimodal.toRecords(media.repartition(3))
    val out = Multimodal.decodeStub(recs)
    assert(out.rdd.getNumPartitions === 3)
    val plan = out.queryExecution.executedPlan.toString()
    // exactly one Exchange: the explicit repartition(3) above — the decode
    // stage itself must not add a shuffle
    assert("Exchange".r.findAllIn(plan).size === 1, "decode must not shuffle")
  }

  test("resizeBytes truncates payloads; sampleFrames explodes every k-th byte") {
    val resized = Multimodal.resizeBytes(media, 4)
      .select(octet_length(col("media"))).collect().map(_.getInt(0))
    assert(resized.toSeq.sorted === Seq(0, 3, 4))
    val frames = Multimodal.sampleFrames(media.filter(col("media_id") === 1L), 5)
    // "hello world" (11 bytes) sampled every 5 → bytes at 1, 6, 11
    assert(frames.count() === 3)
    val heads = frames.orderBy("frame_idx")
      .select(col("frame").cast("string")).collect().map(_.getString(0))
    assert(heads.toSeq === Seq("h", " ", "d"))
  }
}
