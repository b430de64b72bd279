package graft.media

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Content-level AUDIO near-dup detection (VERDICT r11 missing #4): the
  * audio analogue of [[ImageDedup]]'s dHash. The media family's
  * `Multimodal.decodeWavHeader` is metadata-deep; an LLM data pipeline
  * also needs SIGNAL-level duplicate collapse — the same recording
  * re-encoded (16-bit ↔ 8-bit, mono ↔ stereo) or gain-shifted must
  * bucket together, and distinct recordings must not.
  *
  * Pipeline (all pure JVM — no audio libraries in this sandbox, and none
  * needed for PCM):
  *
  *   1. DECODE: RIFF/WAVE chunk walk (`fmt ` PCM format 1, 8-bit unsigned
  *      or 16-bit LE signed, 1–2 channels; `data` payload) → one centered
  *      mono sample stream (channel average);
  *   2. ENVELOPE HASH: pool the stream into 65 equal time windows
  *      (integer bounds — the dHash pooling), mean ABSOLUTE amplitude per
  *      window, one bit per consecutive-window comparison → a 64-bit
  *      difference hash over the loudness envelope. Any uniform POSITIVE
  *      gain scales every window mean by the same factor, preserving all
  *      comparisons, so gain-shifts and bit-depth re-encodes land at
  *      Hamming distance 0 while distinct audio scatters ~32 bits apart;
  *   3. BUCKET + VERIFY: the shared [[Hamming64]] band join — recall
  *      exact to distance 7 by pigeonhole, hot buckets capped, exact
  *      verification, never all-pairs.
  *
  * At 100 TB: decode+hash ride the scan row-locally (binary in, 8 bytes
  * out); the only exchange is the band-key equi-join.
  */
object AudioDedup {

  // ---------------------------------------------------------------- decode

  /** Centered mono PCM: sample values in [-32768, 32767]-ish units
    * (8-bit input is centered at 0, NOT rescaled — the envelope hash is
    * scale-invariant so the unit mismatch is immaterial). */
  final case class Pcm(sampleRate: Int, mono: Array[Int])

  /** Decode a PCM RIFF/WAVE payload. Scope: format 1 (linear PCM),
    * 8/16-bit, 1–2 channels, one `data` chunk; anything else → None. */
  def decodePcm(bytes: Array[Byte]): Option[Pcm] = {
    def u8(i: Int): Int = bytes(i) & 0xff
    def le16(off: Int): Int = u8(off) | (u8(off + 1) << 8)
    def le32(off: Int): Int =
      u8(off) | (u8(off + 1) << 8) | (u8(off + 2) << 16) | (u8(off + 3) << 24)
    def tag(off: Int): String =
      new String(bytes.slice(off, off + 4), "US-ASCII")
    if (bytes.length < 44 || tag(0) != "RIFF" || tag(8) != "WAVE") return None
    var channels = 0; var bits = 0; var rate = 0
    var dataOff = -1; var dataLen = 0
    var i = 12
    // chunk walk: fmt and data in any order, junk chunks skipped
    while (i + 8 <= bytes.length) {
      val id = tag(i); val sz = le32(i + 4)
      if (sz < 0 || i + 8L + sz > bytes.length) return None
      if (id == "fmt " && sz >= 16) {
        if (le16(i + 8) != 1) return None // linear PCM only
        channels = le16(i + 10)
        rate = le32(i + 12)
        bits = le16(i + 22)
      } else if (id == "data") {
        dataOff = i + 8; dataLen = sz
      }
      i += 8 + sz + (sz & 1) // RIFF chunks are word-aligned
    }
    if (dataOff < 0 || rate <= 0 || channels < 1 || channels > 2 ||
      (bits != 8 && bits != 16)) return None
    val bytesPerFrame = channels * (bits / 8)
    val frames = dataLen / bytesPerFrame
    if (frames <= 0) return None
    val mono = new Array[Int](frames)
    var f = 0
    while (f < frames) {
      var sum = 0
      var c = 0
      while (c < channels) {
        val off = dataOff + f * bytesPerFrame + c * (bits / 8)
        sum += (if (bits == 8) u8(off) - 128 // unsigned, centered at 128
                else le16(off).toShort.toInt) // LE signed
        c += 1
      }
      mono(f) = sum / channels
      f += 1
    }
    Some(Pcm(rate, mono))
  }

  // ---------------------------------------------------------------- encode
  // Constructor side for plants and specs: real files a real player opens.

  /** Encode centered mono samples as a PCM WAV — 16-bit LE signed or
    * 8-bit unsigned (values are stored with the 128 offset), 1 or 2
    * channels (the mono stream duplicated — a "stereo re-master"). */
  def encodeWav(samples: Array[Int], sampleRate: Int, bits: Int = 16,
                channels: Int = 1): Array[Byte] = {
    require(bits == 8 || bits == 16)
    require(channels == 1 || channels == 2)
    val bytesPerFrame = channels * (bits / 8)
    val dataLen = samples.length * bytesPerFrame
    val b = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    b.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(channels.toShort)
      .putInt(sampleRate)
      .putInt(sampleRate * bytesPerFrame)
      .putShort(bytesPerFrame.toShort)
      .putShort(bits.toShort)
    b.put("data".getBytes("US-ASCII")).putInt(dataLen)
    var f = 0
    while (f < samples.length) {
      var c = 0
      while (c < channels) {
        if (bits == 16) b.putShort(samples(f).toShort)
        else b.put(((samples(f) + 128) & 0xff).toByte)
        c += 1
      }
      f += 1
    }
    b.array()
  }

  // -------------------------------------------------------- envelope hash

  /** 64-bit loudness-envelope difference hash: 65 equal time windows
    * (integer bounds partition the stream — no resampling kernel to
    * disagree about), mean |sample| per window, one bit per consecutive
    * comparison. Uniform positive gain preserves every comparison. */
  def envelopeHash(pcm: Pcm): Long = {
    val nw = 65
    val n = pcm.mono.length
    val sum = new Array[Long](nw)
    val cnt = new Array[Long](nw)
    var i = 0
    while (i < n) {
      val w = (i.toLong * nw / n).toInt
      sum(w) += math.abs(pcm.mono(i).toLong)
      cnt(w) += 1
      i += 1
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

  /** bytes → Some(envelope hash), None when undecodable — the same
    * airtight Option/None contract as `ImageDedup.dHashOf`: any decoder
    * edge case degrades to a dropped row, never a failed job. */
  def envelopeHashOf(bytes: Array[Byte]): Option[Long] =
    scala.util.Try(decodePcm(bytes)).toOption.flatten.map(envelopeHash)

  // ------------------------------------------------------------ pair mining

  /** (media_id, media: binary WAV) → (id, h) envelope-hash table;
    * non-audio rows drop out. Feeds both the pair miner and the
    * [[MediaHashIndex]] incremental lifecycle. */
  def hashed(media: DataFrame, idCol: String = "media_id",
             bytesCol: String = "media"): DataFrame = {
    val hashUdf = udf((bytes: Array[Byte]) =>
      if (bytes == null) None else envelopeHashOf(bytes))
    media
      .select(col(idCol).cast("long").as("id"), hashUdf(col(bytesCol)).as("h"))
      .where(col("h").isNotNull)
  }

  /** (media_id, media: binary WAV) → near-dup pairs (a, b, dist), a < b,
    * via the shared [[Hamming64]] band join. */
  def nearDupPairs(media: DataFrame, idCol: String = "media_id",
                   bytesCol: String = "media", maxDist: Int = 6,
                   maxBucketSize: Int = 1000): DataFrame =
    Hamming64.nearDupPairs(hashed(media, idCol, bytesCol), maxDist, maxBucketSize)

  // ---------------------------------------------------------------- plants

  /** Deterministic synthetic "recording" for plant group `g`: 65 blocks
    * of 16 samples, each block an alternating ±amp square wave whose
    * amplitude is a splitmix-style mix of (g, block) quantized to a
    * multiple of 512 — so a half gain stays a multiple of 256 and an
    * 8-bit re-encode (÷256) stays exact: the planted transforms preserve
    * every window mean EXACTLY, landing at Hamming distance 0, while
    * different groups scatter ~32 bits apart. */
  def syntheticPcm(g: Long): Array[Int] = {
    val blocks = 65; val per = 16
    val out = new Array[Int](blocks * per)
    var b = 0
    while (b < blocks) {
      var z = g * 0x9e3779b97f4a7c15L + b * 0xbf58476d1ce4e5b9L
      z ^= z >>> 31; z *= 0xd6e8feb86659fd93L; z ^= z >>> 27
      val amp = (512 + (((z % 60) + 60) % 60) * 512).toInt // ≤ 30720
      var i = 0
      while (i < per) {
        out(b * per + i) = if ((i & 1) == 0) amp else -amp
        i += 1
      }
      b += 1
    }
    out
  }

  /** Planted audio corpus over the documents table: every doc gets a
    * distinct synthetic recording (REAL 16-bit mono WAV bytes); docs
    * with `doc_id % 10 == 1` instead carry a NEAR-DUP of doc_id-1's
    * recording — an 8-bit mono re-encode (g even) or a half-gain 16-bit
    * stereo re-master (g odd), both envelope-exact. The expected pair
    * set is thus pure doc_id arithmetic — the constructor-inversion
    * oracle contract ([[ImageDedup.plantedCorpus]]'s x119 pattern). */
  def plantedCorpus(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id")).as[Long].mapPartitions { it =>
      it.map { id =>
        val dup = id % 10 == 1
        val g = if (dup) id - 1 else id
        val base = syntheticPcm(g)
        val bytes =
          if (!dup) encodeWav(base, 16000, bits = 16, channels = 1)
          else if (g % 2 == 0)
            encodeWav(base.map(_ >> 8), 16000, bits = 8, channels = 1)
          else
            encodeWav(base.map(_ / 2), 16000, bits = 16, channels = 2)
        (id, bytes)
      }
    }.toDF("media_id", "media")
  }
}
