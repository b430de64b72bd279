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

  test("real decode parses hand-built PNG/BMP headers; other bytes fall back to stub") {
    def be(v: Int) = Array((v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)
    def png(w: Int, h: Int): Array[Byte] =
      Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte) ++
        be(13) ++ "IHDR".getBytes("US-ASCII") ++ be(w) ++ be(h)
    def bmp(w: Int, h: Int): Array[Byte] = {
      val b = Array.fill[Byte](26)(0)
      b(0) = 'B'; b(1) = 'M'
      def le(v: Int, off: Int): Unit = (0 until 4).foreach(i =>
        b(off + i) = ((v >> (8 * i)) & 0xff).toByte)
      le(w, 18); le(h, 22); b
    }
    // kernel level
    assert(Multimodal.decodeImageHeader(png(640, 480)) === Some((640, 480, "png")))
    assert(Multimodal.decodeImageHeader(bmp(12, 34)) === Some((12, 34, "bmp")))
    assert(Multimodal.decodeImageHeader(bmp(12, -34)) === Some((12, 34, "bmp")),
      "top-down BMP (negative height) reports magnitude")
    assert(Multimodal.decodeImageHeader(png(0, 480)) === None, "zero dim is corrupt")
    assert(Multimodal.decodeImageHeader("not an image".getBytes) === None)
    assert(Multimodal.decodeImageHeader(Array.empty[Byte]) === None)
    // Dataset stage: parsed header OVERRIDES declared metadata; non-image
    // payloads keep declared metadata and stub stats
    val ds = Seq(
      Multimodal.MediaRecord(1L, png(31, 17), 1, 1, "raw"),
      Multimodal.MediaRecord(2L, "plain".getBytes, 9, 8, "txt"),
      Multimodal.MediaRecord(3L, bmp(12, 34), 0, 0, "x")).toDS()
    val out = Multimodal.decode(ds).collect().sortBy(_.media_id)
    assert((out(0).width, out(0).height, out(0).format) === ((31, 17, "png")))
    assert(out(0).n_bytes === 24)
    assert((out(1).width, out(1).height, out(1).format) === ((9, 8, "txt")))
    assert((out(2).width, out(2).height, out(2).format) === ((12, 34, "bmp")))
  }

  test("JPEG SOF0/SOF2 parse: walker skips APP0, stops at SOS, rejects junk") {
    val base = Multimodal.jpegHeaderBytes(800, 600, progressive = false)
    assert(Multimodal.decodeImageHeader(base) === Some((800, 600, "jpeg")))
    val prog = Multimodal.jpegHeaderBytes(31, 17, progressive = true)
    assert(Multimodal.decodeImageHeader(prog) === Some((31, 17, "jpeg")))
    // SOI + SOS and no SOF: dimensions unavailable → fall back
    val sosOnly = Array(0xff, 0xd8, 0xff, 0xda, 0x00, 0x04, 0x01, 0x00).map(_.toByte)
    assert(Multimodal.decodeImageHeader(sosOnly) === None)
    // truncated mid-segment: no crash, no result
    assert(Multimodal.decodeImageHeader(base.take(20)) === None)
    // C4 (DHT) must NOT be mistaken for a frame header: DHT then SOF0
    val dhtFirst =
      Array(0xff, 0xd8, 0xff, 0xc4, 0x00, 0x04, 0x00, 0x00).map(_.toByte) ++
        Multimodal.jpegHeaderBytes(12, 34, progressive = false).drop(2)
    assert(Multimodal.decodeImageHeader(dhtFirst) === Some((12, 34, "jpeg")))
  }

  test("planted-image constructors invert through the parser (the oracle contract)") {
    val docs = Seq((0L, "a", 1L), (1L, "b", 1L), (2L, "c", 1L), (3L, "d", 1L),
      (100L, "e", 1L)).toDF("doc_id", "text", "n_chars")
    val out = Multimodal.decode(Multimodal.plantedImages(docs))
      .collect().map(f => f.media_id -> f).toMap
    Seq(0L, 1L, 2L, 3L, 100L).foreach { id =>
      val f = out(id)
      assert(f.width === (id % 64 + 1).toInt, s"id=$id width")
      assert(f.height === (id % 48 + 1).toInt, s"id=$id height")
      val fmt = (id % 4) match {
        case 0 => "png"; case 1 => "bmp"; case _ => "jpeg"
      }
      assert(f.format === fmt, s"id=$id format")
    }
  }

  test("WAV header parse: chunk walk skips junk, handles odd sizes, rejects junk bytes") {
    val ok = Multimodal.wavHeaderBytes(2, 44100, 16)
    assert(Multimodal.decodeWavHeader(ok) === Some((2, 44100, 16)))
    assert(Multimodal.decodeWavHeader(Multimodal.wavHeaderBytes(1, 16000, 8))
      === Some((1, 16000, 8)))
    // truncated / non-RIFF payloads
    assert(Multimodal.decodeWavHeader(ok.take(20)) === None)
    assert(Multimodal.decodeWavHeader("RIFFnope".getBytes) === None)
    assert(Multimodal.decodeWavHeader(Array.empty[Byte]) === None)
    // odd-size chunk before fmt must be pad-stepped, not mis-aligned
    val oddJunk = {
      val b = java.nio.ByteBuffer.allocate(49).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.put("RIFF".getBytes).putInt(41).put("WAVE".getBytes)
      b.put("JUNK".getBytes).putInt(3).put(Array[Byte](0, 0, 0, 0)) // 3 + pad
      b.put("fmt ".getBytes).putInt(16)
      b.putShort(1).putShort(2).putInt(8000).putInt(8000 * 2 * 2)
      b.putShort(4).putShort(16)
      b.array()
    }
    assert(Multimodal.decodeWavHeader(oddJunk) === Some((2, 8000, 16)))
  }

  test("planted audio inverts through the parser (the x7_audio_meta contract)") {
    val docs = Seq((0L, "a", 1L), (1L, "b", 1L), (2L, "c", 1L), (5L, "d", 1L))
      .toDF("doc_id", "text", "n_chars")
    val out = Multimodal.audioMeta(Multimodal.plantedAudio(docs))
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2), r.getInt(3)))).toMap
    Seq(0L, 1L, 2L, 5L).foreach { id =>
      val rate = if (id % 3 == 0) 44100 else if (id % 3 == 1) 22050 else 16000
      assert(out(id) === (((id % 2 + 1).toInt, rate, if (id % 2 == 0) 16 else 8)),
        s"id=$id")
    }
  }

  test("MP4 mvhd parse: v0 and v1 boxes, walker skips ftyp/free, rejects junk") {
    assert(Multimodal.decodeMp4Header(Multimodal.mp4HeaderBytes(600, 36000L, v1 = false))
      === Some((600, 36000L)))
    assert(Multimodal.decodeMp4Header(Multimodal.mp4HeaderBytes(90000, 123456789L, v1 = true))
      === Some((90000, 123456789L)))
    val full = Multimodal.mp4HeaderBytes(1000, 60L, v1 = false)
    assert(Multimodal.decodeMp4Header(full.take(30)) === None, "truncated moov")
    assert(Multimodal.decodeMp4Header("nonsense bytes here!".getBytes) === None)
    assert(Multimodal.decodeMp4Header(Array.empty[Byte]) === None)
  }

  test("planted video inverts through the parser (the x7_video_meta contract)") {
    val docs = Seq((0L, "a", 1L), (1L, "b", 1L), (2L, "c", 1L), (7L, "d", 1L))
      .toDF("doc_id", "text", "n_chars")
    val out = Multimodal.videoMeta(Multimodal.plantedVideo(docs))
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getLong(2), r.getLong(3)))).toMap
    Seq(0L, 1L, 2L, 7L).foreach { id =>
      val ts = if (id % 3 == 0) 600 else if (id % 3 == 1) 1000 else 90000
      val dur = (id % 1000 + 1) * 60L
      assert(out(id) === ((ts, dur, dur * 1000L / ts)), s"id=$id")
    }
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
