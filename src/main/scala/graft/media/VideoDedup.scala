package graft.media

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Content-level VIDEO near-dup detection (VERDICT r12 missing #2): the
  * video analogue of [[ImageDedup]]'s dHash and [[AudioDedup]]'s
  * envelope hash. The media family's `Multimodal` MP4 walk is
  * metadata-deep; an LLM data pipeline also needs SIGNAL-level duplicate
  * collapse — the same footage re-mastered (brightness shift, resolution
  * upsample, frame-rate resample) must bucket together, and distinct
  * footage must not.
  *
  * Pipeline (all pure JVM — no codec libraries in this sandbox, and none
  * needed for uncompressed frames; the planted-fixture discipline of the
  * WAV/BMP paths):
  *
  *   1. DECODE: RIFF/AVI chunk walk (`avih` main header for geometry,
  *      `movi` LIST with `00db` uncompressed-DIB frame chunks — bottom-up
  *      BGR24 rows, stride padded to 4, exactly a BMP payload without its
  *      file header) → per-frame grayscale [[ImageDedup.Raster]]s;
  *   2. TEMPORAL ENVELOPE HASH: per-frame MEAN LUMA, pooled onto 65 equal
  *      time slots (integer bounds — the dHash pooling), one bit per
  *      consecutive-slot comparison → a 64-bit difference hash over the
  *      brightness envelope. A uniform brightness shift adds the same
  *      constant to every slot mean and a resolution/frame-rate upsample
  *      preserves the means exactly, so re-masters land at Hamming
  *      distance 0 (frame drops uniform within a slot too — the 25%
  *      frame-rate downsample); distinct footage scatters ~32 bits
  *      apart. Unaligned END-trims shift every slot boundary and are out
  *      of scope, like a mid-song splice for the audio envelope.
  *      Per-frame SPATIAL
  *      dHashes ride [[ImageDedup.dHash]] on the same rasters and are
  *      exposed for frame-level analysis ([[frameDHashes]]);
  *   3. BUCKET + VERIFY: the shared [[Hamming64]] band join — recall
  *      exact to distance 7 by pigeonhole, hot buckets capped, exact
  *      verification, never all-pairs — and the shared [[MediaHashIndex]]
  *      lifecycle for the incremental O(batch) gate (one index module
  *      serves any 64-bit content hash).
  *
  * At 100 TB: decode+hash ride the scan row-locally (binary in, 8 bytes
  * out); the only exchange is the band-key equi-join.
  */
object VideoDedup {

  // ---------------------------------------------------------------- decode

  /** Decoded clip: per-frame grayscale rasters, all `w`×`h`. */
  final case class Clip(width: Int, height: Int,
                        frames: Array[ImageDedup.Raster])

  /** Decode a RIFF/AVI payload with uncompressed DIB (`00db`/`00dc`)
    * frames. Scope: one video stream, 24 bpp bottom-up BGR rows, stride
    * padded to 4; anything else → None. */
  def decodeClip(bytes: Array[Byte]): Option[Clip] = {
    def u8(i: Int): Int = bytes(i) & 0xff
    def le32(off: Int): Int =
      u8(off) | (u8(off + 1) << 8) | (u8(off + 2) << 16) | (u8(off + 3) << 24)
    def tag(off: Int): String =
      new String(bytes.slice(off, off + 4), "US-ASCII")
    if (bytes.length < 24 || tag(0) != "RIFF" || tag(8) != "AVI ") return None
    var w = 0; var h = 0
    val frameOffs = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    // outer chunk walk; LIST payloads are themselves chunk sequences
    def walk(from: Int, to: Int): Boolean = {
      var i = from
      while (i + 8 <= to) {
        val id = tag(i); val sz = le32(i + 4)
        if (sz < 0 || i + 8L + sz > to) return false
        if (id == "LIST" && sz >= 4) {
          val kind = tag(i + 8)
          if (kind == "hdrl" || kind == "movi") {
            if (!walk(i + 12, i + 8 + sz)) return false
          }
        } else if (id == "avih" && sz >= 40) {
          w = le32(i + 8 + 32)
          h = le32(i + 8 + 36)
        } else if (id == "00db" || id == "00dc") {
          frameOffs += ((i + 8, sz))
        }
        i += 8 + sz + (sz & 1) // RIFF chunks are word-aligned
      }
      true
    }
    if (!walk(12, bytes.length)) return None
    if (w <= 0 || h <= 0 || w > 4096 || h > 4096 || frameOffs.isEmpty)
      return None
    val rowBytes = (w * 3 + 3) & ~3
    val need = rowBytes.toLong * h
    val frames = new Array[ImageDedup.Raster](frameOffs.length)
    var f = 0
    while (f < frameOffs.length) {
      val (off, sz) = frameOffs(f)
      if (sz < need) return None
      val gray = new Array[Byte](w * h)
      var y = 0
      while (y < h) {
        val src = off + (h - 1 - y) * rowBytes // bottom-up
        var x = 0
        while (x < w) {
          val b = u8(src + x * 3); val g = u8(src + x * 3 + 1)
          val r = u8(src + x * 3 + 2)
          gray(y * w + x) = ((r * 299 + g * 587 + b * 114) / 1000).toByte
          x += 1
        }
        y += 1
      }
      frames(f) = ImageDedup.Raster(w, h, gray)
      f += 1
    }
    Some(Clip(w, h, frames))
  }

  // ---------------------------------------------------------------- encode
  // Constructor side for plants and specs: a real AVI a real player opens.

  /** Encode BGR24 frames (each `w*h*3`, row-major TOP-down RGB triples as
    * produced by [[ImageDedup.syntheticRgb]]) as an uncompressed-DIB AVI
    * at `fps`. */
  def encodeAvi(w: Int, h: Int, framesRgb: Seq[Array[Byte]],
                fps: Int = 10): Array[Byte] = {
    require(framesRgb.nonEmpty && framesRgb.forall(_.length == w * h * 3))
    val rowBytes = (w * 3 + 3) & ~3
    val frameLen = rowBytes * h
    val n = framesRgb.length
    def chunkLen(payload: Int) = 8 + payload + (payload & 1)
    val aviPayload =
      4 + // 'AVI '
        chunkLen(4 + chunkLen(56) + chunkLen(4 + chunkLen(56) + chunkLen(40))) + // hdrl
        chunkLen(4 + n * chunkLen(frameLen)) // movi
    val buf = java.nio.ByteBuffer.allocate(8 + aviPayload)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def putTag(t: String): Unit = { buf.put(t.getBytes("US-ASCII")); () }
    putTag("RIFF"); buf.putInt(aviPayload); putTag("AVI ")
    // hdrl LIST: avih + one strl (strh 'vids'/'DIB ' + strf BITMAPINFOHEADER)
    val hdrlPayload = 4 + chunkLen(56) + chunkLen(4 + chunkLen(56) + chunkLen(40))
    putTag("LIST"); buf.putInt(hdrlPayload); putTag("hdrl")
    putTag("avih"); buf.putInt(56)
    buf.putInt(1000000 / fps) // dwMicroSecPerFrame
      .putInt(frameLen * fps) // dwMaxBytesPerSec
      .putInt(0).putInt(0)
      .putInt(n) // dwTotalFrames
      .putInt(0)
      .putInt(1) // dwStreams
      .putInt(frameLen)
      .putInt(w).putInt(h)
      .putInt(0).putInt(0).putInt(0).putInt(0)
    val strlPayload = 4 + chunkLen(56) + chunkLen(40)
    putTag("LIST"); buf.putInt(strlPayload); putTag("strl")
    putTag("strh"); buf.putInt(56)
    putTag("vids"); putTag("DIB ")
    buf.putInt(0).putInt(0).putInt(0)
      .putInt(1).putInt(fps) // dwScale / dwRate
      .putInt(0).putInt(n).putInt(frameLen).putInt(-1).putInt(0)
      .putLong(0L) // rcFrame
    putTag("strf"); buf.putInt(40)
    buf.putInt(40).putInt(w).putInt(h)
      .putShort(1).putShort(24) // planes / bpp
      .putInt(0) // BI_RGB
      .putInt(frameLen)
      .putInt(0).putInt(0).putInt(0).putInt(0)
    // movi LIST with one 00db chunk per frame, bottom-up BGR, padded rows
    putTag("LIST"); buf.putInt(4 + n * chunkLen(frameLen)); putTag("movi")
    framesRgb.foreach { rgb =>
      putTag("00db"); buf.putInt(frameLen)
      var y = h - 1
      while (y >= 0) {
        var x = 0
        while (x < w) {
          val i = (y * w + x) * 3
          buf.put(rgb(i + 2)).put(rgb(i + 1)).put(rgb(i)) // BGR
          x += 1
        }
        var pad = rowBytes - w * 3
        while (pad > 0) { buf.put(0.toByte); pad -= 1 }
        y -= 1
      }
    }
    buf.array()
  }

  // -------------------------------------------------------- temporal hash

  /** 64-bit temporal brightness-envelope difference hash: per-frame mean
    * luma pooled onto 65 equal time slots (integer bounds partition the
    * frame sequence), one bit per consecutive-slot comparison. Uniform
    * brightness shifts and resolution / frame-rate upsamples preserve
    * every comparison. */
  def temporalHash(clip: Clip): Long = {
    val nw = 65
    val n = clip.frames.length
    val sum = new Array[Long](nw)
    val cnt = new Array[Long](nw)
    var f = 0
    while (f < n) {
      val r = clip.frames(f)
      var s = 0L
      var i = 0
      while (i < r.gray.length) { s += (r.gray(i) & 0xff); i += 1 }
      val slot = (f.toLong * nw / n).toInt
      sum(slot) += s / math.max(1, r.gray.length)
      cnt(slot) += 1
      f += 1
    }
    var hash = 0L
    var w = 0
    while (w < nw - 1) {
      val a = if (cnt(w) == 0) 0L else sum(w) / cnt(w)
      val b = if (cnt(w + 1) == 0) 0L else sum(w + 1) / cnt(w + 1)
      hash = (hash << 1) | (if (a > b) 1L else 0L)
      w += 1
    }
    hash
  }

  /** bytes → Some(temporal hash), None when undecodable — the family's
    * airtight Option/None contract: any decoder edge case degrades to a
    * dropped row, never a failed job. */
  def temporalHashOf(bytes: Array[Byte]): Option[Long] =
    scala.util.Try(decodeClip(bytes)).toOption.flatten.map(temporalHash)

  /** Per-frame SPATIAL dHashes ([[ImageDedup.dHash]] over each decoded
    * frame raster) — the frame-level handle for finer analysis (scene
    * matching, key-frame extraction). */
  def frameDHashes(bytes: Array[Byte]): Option[Array[Long]] =
    scala.util.Try(decodeClip(bytes)).toOption.flatten
      .map(_.frames.map(ImageDedup.dHash))

  // ------------------------------------------------------------ pair mining

  /** (media_id, media: binary AVI) → (id, h) temporal-hash table;
    * non-video rows drop out. Feeds both the pair miner and the
    * [[MediaHashIndex]] incremental lifecycle. */
  def hashed(media: DataFrame, idCol: String = "media_id",
             bytesCol: String = "media"): DataFrame = {
    val hashUdf = udf((bytes: Array[Byte]) =>
      if (bytes == null) None else temporalHashOf(bytes))
    media
      .select(col(idCol).cast("long").as("id"), hashUdf(col(bytesCol)).as("h"))
      .where(col("h").isNotNull)
  }

  /** (media_id, media: binary AVI) → near-dup pairs (a, b, dist), a < b,
    * via the shared [[Hamming64]] band join. */
  def nearDupPairs(media: DataFrame, idCol: String = "media_id",
                   bytesCol: String = "media", maxDist: Int = 6,
                   maxBucketSize: Int = 1000): DataFrame =
    Hamming64.nearDupPairs(hashed(media, idCol, bytesCol), maxDist, maxBucketSize)

  // ---------------------------------------------------------------- plants

  /** Deterministic synthetic clip for plant group `g`: 65 scenes of 4
    * solid-gray 8×8 frames, scene level a splitmix-style mix of
    * (g, scene) — so brightness shifts, 2× resolution upsamples and 2×
    * frame-duplication remasters preserve every slot mean EXACTLY
    * (distance 0) while different groups scatter ~32 bits apart. */
  def syntheticFrames(g: Long, w: Int = 8, h: Int = 8,
                      perScene: Int = 4, shift: Int = 0): Seq[Array[Byte]] = {
    (0 until 65).flatMap { scene =>
      var z = g * 0x9e3779b97f4a7c15L + scene * 0xbf58476d1ce4e5b9L
      z ^= z >>> 31; z *= 0xd6e8feb86659fd93L; z ^= z >>> 27
      val level = math.min(255, math.max(0, 32 + (((z % 180) + 180) % 180).toInt + shift))
      val frame = Array.fill(w * h * 3)(level.toByte)
      Seq.fill(perScene)(frame)
    }
  }

  /** Planted video corpus over the documents table: every doc gets a
    * distinct synthetic clip (REAL uncompressed-DIB AVI bytes); docs with
    * `doc_id % 10 == 1` instead carry a NEAR-DUP of doc_id-1's clip —
    * a +6-brightness re-master (g even) or a 2×-resolution, 2×-frame-rate
    * upsample (g odd), both envelope-exact. The expected pair set is thus
    * pure doc_id arithmetic — the constructor-inversion oracle contract
    * ([[ImageDedup.plantedCorpus]]'s x119 pattern). */
  def plantedCorpus(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id")).as[Long].mapPartitions { it =>
      it.map { id =>
        val dup = id % 10 == 1
        val g = if (dup) id - 1 else id
        val bytes =
          if (!dup) encodeAvi(8, 8, syntheticFrames(g))
          else if (g % 2 == 0)
            encodeAvi(8, 8, syntheticFrames(g, shift = 6))
          else {
            // 2x resolution + 2x frame rate: solid scenes upscale and
            // duplicate without changing any slot mean
            val up = syntheticFrames(g, w = 16, h = 16)
              .flatMap(f => Seq(f, f))
            encodeAvi(16, 16, up)
          }
        (id, bytes)
      }
    }.toDF("media_id", "media")
  }
}
