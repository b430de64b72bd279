package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.media.{AudioDedup, ImageDedup, MediaHashIndex}

/** End-to-end incremental media ingest: perceptual near-dup gating
  * against the persisted, APPENDED hash index, exactly-once admission,
  * replay healing from the committed hashes — [[IncrementalIngestSpec]]'s
  * contract for binary media.
  */
class StreamingMediaIngestSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshRoot(name: String): String =
    new java.io.File(
      s"${System.getProperty("java.io.tmpdir")}/graft_media_ingest/$name-${System.nanoTime()}")
      .getAbsolutePath

  private def png(g: Long, shift: Int = 0): Array[Byte] =
    ImageDedup.encodePng(32, 32, ImageDedup.syntheticRgb(g, 32, 32, shift))
  private def bmp(g: Long, shift: Int = 0): Array[Byte] =
    ImageDedup.encodeBmp(32, 32, ImageDedup.syntheticRgb(g, 32, 32, shift))

  private def fresh(tag: String): (String, Seq[Any]) = {
    val key = Seq("media-ingest-spec", tag, System.nanoTime().toString)
    MediaHashIndex.invalidate(spark, key)
    (freshRoot(tag), key)
  }

  private def baseHashed = ImageDedup.hashed(
    (0L until 20L).map(g => (g, png(g))).toDF("media_id", "media"))

  test("batch pipeline: undecodable, self near-dup and corpus near-dup dropped; new media admitted") {
    val (root, key) = fresh("stages")
    val batch = Seq(
      100L -> png(100),              // genuinely new -> admitted
      101L -> bmp(100, shift = 6),   // re-encoded near-dup WITHIN batch of 100 -> dropped
      102L -> bmp(3, shift = 6),     // re-encode of corpus photo 3 -> dropped
      103L -> png(200),              // new -> admitted
      104L -> Array[Byte](1, 2, 3)   // undecodable -> dropped at the hash stage
    ).toDF("media_id", "media")
    assert(StreamingMediaIngest.processBatch(batch, 0L, root, baseHashed, key))
    val admitted = SnapshotSink.readCommitted(spark, root)
      .select("media_id").as[Long].collect().toSet
    assert(admitted === Set(100L, 103L))
  }

  test("admitted batches are visible to later batches via the appended index; replay heals") {
    val (root, key) = fresh("append")
    assert(StreamingMediaIngest.processBatch(
      Seq(100L -> png(100)).toDF("media_id", "media"), 0L, root, baseHashed, key))
    assert(StreamingMediaIngest.processBatch(Seq(
      200L -> bmp(100, shift = 6),   // re-encode of ADMITTED 100 -> dropped
      201L -> png(300)               // new -> admitted
    ).toDF("media_id", "media"), 1L, root, baseHashed, key))
    // at-least-once delivery replays batch 0 with stale rows: table
    // unchanged, index healed idempotently from the committed hashes —
    // and idempotently IN STORAGE: a restart loop (repeated replays)
    // must not grow the persisted index (ADVICE r12)
    val indexRows = MediaHashIndex.ensureIndex(spark, baseHashed, key).count()
    assert(!StreamingMediaIngest.processBatch(
      Seq(999L -> png(999)).toDF("media_id", "media"), 0L, root, baseHashed, key))
    assert(!StreamingMediaIngest.processBatch(
      Seq(999L -> png(999)).toDF("media_id", "media"), 0L, root, baseHashed, key))
    assert(MediaHashIndex.ensureIndex(spark, baseHashed, key).count() === indexRows)
    val admitted = SnapshotSink.readCommitted(spark, root)
      .select("media_id").as[Long].collect().toSet
    assert(admitted === Set(100L, 201L))
    // a third batch still sees batch 0/1 admissions through the index
    assert(StreamingMediaIngest.processBatch(Seq(
      300L -> png(400),              // new -> admitted
      301L -> png(100),              // exact re-crawl of admitted 100 -> dropped
      302L -> bmp(300, shift = 6)    // re-encode of admitted 201's photo -> dropped
    ).toDF("media_id", "media"), 2L, root, baseHashed, key))
    val after = SnapshotSink.readCommitted(spark, root)
      .select("media_id").as[Long].collect().toSet
    assert(after === Set(100L, 201L, 300L))
  }

  test("the audio modality rides the same operator via its hasher") {
    val (root, key) = fresh("audio")
    val wav = (g: Long) => AudioDedup.encodeWav(AudioDedup.syntheticPcm(g), 16000)
    val base = AudioDedup.hashed(
      (0L until 10L).map(g => (g, wav(g))).toDF("media_id", "media"))
    val batch = Seq(
      100L -> wav(100),                                  // new -> admitted
      101L -> AudioDedup.encodeWav(                      // half-gain re-master of corpus 3 -> dropped
        AudioDedup.syntheticPcm(3).map(_ / 2), 16000, channels = 2)
    ).toDF("media_id", "media")
    assert(StreamingMediaIngest.processBatch(batch, 0L, root, base, key,
      hasher = AudioDedup.hashed(_)))
    val admitted = SnapshotSink.readCommitted(spark, root)
      .select("media_id").as[Long].collect().toSet
    assert(admitted === Set(100L))
  }
}
