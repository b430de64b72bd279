package graft.media

import java.util.zip.{CRC32, Deflater, Inflater}

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Content-level image near-dup detection (VERDICT r10 #5): the image
  * analogue of MinHash text dedup. The media family's header parsers
  * (`Multimodal.decodeImageHeader`) are metadata-deep; an LLM data
  * pipeline also needs PIXEL-level duplicate collapse — the same photo
  * re-encoded (PNG↔BMP), brightness-shifted, or re-saved must bucket
  * together, and visually distinct images must not.
  *
  * Pipeline (all pure JVM — no imaging libraries in this sandbox, and
  * none needed for these two formats):
  *
  *   1. DECODE: BMP (24 bpp BITMAPINFOHEADER, bottom-up rows, 4-byte row
  *      padding) and PNG (8-bit gray/RGB/RGBA, all five scanline filters
  *      None/Sub/Up/Average/Paeth, `java.util.zip.Inflater`) → a
  *      row-major grayscale raster (the ITU-R 601 integer luma);
  *   2. dHASH: average-pool the raster onto a 9×8 grid and emit one bit
  *      per horizontal neighbour comparison — a 64-bit difference hash.
  *      Any MONOTONE intensity shift (brightness, re-encode) preserves
  *      every comparison, so true re-encodes land at Hamming distance 0
  *      while distinct content scatters ~32 bits apart;
  *   3. BUCKET: split the 64-bit hash into 8 bands × 8 bits; images
  *      sharing ANY band bucket become candidate pairs (an equi-join on
  *      the band key — the `TextOps.nearDupPairs` LSH discipline, never
  *      all-pairs; a hot-bucket cap bounds degenerate content);
  *   4. VERIFY: exact Hamming distance over the full 64 bits ≤ maxDist.
  *      With 8-bit bands, every pair within Hamming 7 is GUARANTEED a
  *      shared band (pigeonhole), so recall at maxDist ≤ 7 is exact.
  *
  * At 100 TB: decode+hash ride the scan row-locally (binary in, 8 bytes
  * out); the only exchange is the band-key equi-join over 8 × |images|
  * key rows; verification touches candidate pairs only.
  */
object ImageDedup {

  // ---------------------------------------------------------------- decode

  /** Row-major grayscale raster. */
  final case class Raster(width: Int, height: Int, gray: Array[Byte])

  private def luma(r: Int, g: Int, b: Int): Byte =
    ((r * 299 + g * 587 + b * 114) / 1000).toByte

  /** Decode a 24 bpp bottom-up BITMAPINFOHEADER BMP with pixel data. */
  def decodeBmp(bytes: Array[Byte]): Option[Raster] = {
    def u8(i: Int): Int = bytes(i) & 0xff
    def le32(off: Int): Int =
      u8(off) | (u8(off + 1) << 8) | (u8(off + 2) << 16) | (u8(off + 3) << 24)
    def le16(off: Int): Int = u8(off) | (u8(off + 1) << 8)
    if (bytes.length < 54 || bytes(0) != 'B'.toByte || bytes(1) != 'M'.toByte)
      return None
    if (le32(14) != 40 || le16(28) != 24) return None // header + 24bpp only
    val w = le32(18); val h = le32(22)
    val off = le32(10)
    if (w <= 0 || h <= 0 || w > 8192 || h > 8192) return None
    // a crafted negative offset would pass the sum check below (the far-
    // negative off keeps off + rowBytes*h under length) and then index
    // out of bounds in the row loop — reject it before touching pixels
    if (off < 54 || off > bytes.length) return None
    val rowBytes = (w * 3 + 3) & ~3
    if (off + rowBytes.toLong * h > bytes.length) return None
    val gray = new Array[Byte](w * h)
    var y = 0
    while (y < h) {
      val src = off + (h - 1 - y) * rowBytes // bottom-up
      var x = 0
      while (x < w) {
        val b = u8(src + x * 3); val g = u8(src + x * 3 + 1)
        val r = u8(src + x * 3 + 2)
        gray(y * w + x) = luma(r, g, b)
        x += 1
      }
      y += 1
    }
    Some(Raster(w, h, gray))
  }

  /** Decode an 8-bit gray (color type 0), RGB (2) or RGBA (6) PNG. */
  def decodePng(bytes: Array[Byte]): Option[Raster] = {
    val sig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)
    if (bytes.length < 8 + 25 || !bytes.take(8).sameElements(sig)) return None
    def u8(i: Int): Int = bytes(i) & 0xff
    def be32(off: Int): Int =
      (u8(off) << 24) | (u8(off + 1) << 16) | (u8(off + 2) << 8) | u8(off + 3)
    def tag(off: Int): String =
      new String(bytes.slice(off, off + 4), "US-ASCII")
    // IHDR must be the first chunk
    if (be32(8) != 13 || tag(12) != "IHDR") return None
    val w = be32(16); val h = be32(20)
    val bitDepth = u8(24); val colorType = u8(25)
    if (w <= 0 || h <= 0 || w > 8192 || h > 8192 || bitDepth != 8) return None
    val channels = colorType match {
      case 0 => 1; case 2 => 3; case 6 => 4; case _ => return None
    }
    // concatenate IDAT payloads
    val idat = new java.io.ByteArrayOutputStream()
    var i = 8
    var sawEnd = false
    while (i + 8 <= bytes.length && !sawEnd) {
      val len = be32(i); val name = tag(i + 4)
      if (len < 0 || i + 12L + len > bytes.length) return None
      if (name == "IDAT") idat.write(bytes, i + 8, len)
      if (name == "IEND") sawEnd = true
      i += 12 + len
    }
    val inflater = new Inflater()
    inflater.setInput(idat.toByteArray)
    val stride = w * channels
    val raw = new Array[Byte]((stride + 1) * h)
    try {
      var got = 0
      while (got < raw.length && !inflater.finished()) {
        val n = inflater.inflate(raw, got, raw.length - got)
        if (n == 0 && inflater.needsInput()) return None // truncated
        got += n
      }
      if (got < raw.length) return None
    } catch { case _: java.util.zip.DataFormatException => return None }
    finally inflater.end()
    // unfilter scanlines in place into `img`
    val img = new Array[Byte](stride * h)
    val bpp = channels
    var y = 0
    while (y < h) {
      val ft = raw(y * (stride + 1)) & 0xff
      val src = y * (stride + 1) + 1
      val dst = y * stride
      var x = 0
      while (x < stride) {
        val rawv = raw(src + x) & 0xff
        val a = if (x >= bpp) img(dst + x - bpp) & 0xff else 0
        val b = if (y > 0) img(dst - stride + x) & 0xff else 0
        val c = if (x >= bpp && y > 0) img(dst - stride + x - bpp) & 0xff else 0
        val v = ft match {
          case 0 => rawv
          case 1 => rawv + a
          case 2 => rawv + b
          case 3 => rawv + ((a + b) >> 1)
          case 4 =>
            val p = a + b - c
            val pa = math.abs(p - a); val pb = math.abs(p - b)
            val pc = math.abs(p - c)
            rawv + (if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c)
          case _ => return None
        }
        img(dst + x) = (v & 0xff).toByte
        x += 1
      }
      y += 1
    }
    val gray = new Array[Byte](w * h)
    var j = 0
    while (j < w * h) {
      gray(j) =
        if (channels == 1) img(j)
        else luma(img(j * channels) & 0xff, img(j * channels + 1) & 0xff,
          img(j * channels + 2) & 0xff)
      j += 1
    }
    Some(Raster(w, h, gray))
  }

  /** Either format, routed by magic bytes. */
  def decodeRaster(bytes: Array[Byte]): Option[Raster] =
    if (bytes.length >= 2 && bytes(0) == 'B'.toByte && bytes(1) == 'M'.toByte)
      decodeBmp(bytes)
    else decodePng(bytes)

  // ---------------------------------------------------------------- encode
  // Constructor side for plants and specs: real files a real viewer opens.

  /** Encode a row-major RGB raster as a 24 bpp bottom-up BMP. */
  def encodeBmp(w: Int, h: Int, rgb: Array[Byte]): Array[Byte] = {
    require(rgb.length == w * h * 3)
    val rowBytes = (w * 3 + 3) & ~3
    val size = 54 + rowBytes * h
    val b = java.nio.ByteBuffer.allocate(size)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put('B'.toByte).put('M'.toByte).putInt(size).putInt(0).putInt(54)
    b.putInt(40).putInt(w).putInt(h).putShort(1).putShort(24)
    b.putInt(0).putInt(rowBytes * h).putInt(2835).putInt(2835)
    b.putInt(0).putInt(0)
    var y = 0
    while (y < h) {
      val srcRow = h - 1 - y // bottom-up
      var x = 0
      while (x < w) {
        val s = (srcRow * w + x) * 3
        b.put(rgb(s + 2)).put(rgb(s + 1)).put(rgb(s)) // BGR
        x += 1
      }
      var pad = rowBytes - w * 3
      while (pad > 0) { b.put(0.toByte); pad -= 1 }
      y += 1
    }
    b.array()
  }

  /** Encode a row-major RGB raster as an 8-bit truecolor PNG (filter 0
    * scanlines, one zlib stream, real CRCs — decodable by any viewer). */
  def encodePng(w: Int, h: Int, rgb: Array[Byte]): Array[Byte] = {
    require(rgb.length == w * h * 3)
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)
      .map(_.toByte))
    def chunk(name: String, payload: Array[Byte]): Unit = {
      val len = java.nio.ByteBuffer.allocate(4).putInt(payload.length).array()
      out.write(len)
      val body = name.getBytes("US-ASCII") ++ payload
      out.write(body)
      val crc = new CRC32(); crc.update(body)
      out.write(java.nio.ByteBuffer.allocate(4).putInt(crc.getValue.toInt).array())
    }
    val ihdr = java.nio.ByteBuffer.allocate(13)
      .putInt(w).putInt(h).put(8.toByte).put(2.toByte) // depth 8, RGB
      .put(0.toByte).put(0.toByte).put(0.toByte).array()
    chunk("IHDR", ihdr)
    val stride = w * 3
    val raw = new Array[Byte]((stride + 1) * h)
    var y = 0
    while (y < h) {
      raw(y * (stride + 1)) = 0 // filter: None
      System.arraycopy(rgb, y * stride, raw, y * (stride + 1) + 1, stride)
      y += 1
    }
    val deflater = new Deflater()
    deflater.setInput(raw); deflater.finish()
    val comp = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!deflater.finished()) comp.write(buf, 0, deflater.deflate(buf))
    deflater.end()
    chunk("IDAT", comp.toByteArray)
    chunk("IEND", Array.empty)
    out.toByteArray
  }

  // ----------------------------------------------------------------- dhash

  /** 64-bit difference hash: average-pool the grayscale raster onto a
    * 9×8 grid, one bit per horizontal neighbour comparison. Pool cells
    * partition the image (integer bounds), so the hash is exact — no
    * resampling kernel to disagree about. */
  def dHash(r: Raster): Long = {
    val gw = 9; val gh = 8
    val cell = new Array[Long](gw * gh)
    val cnt = new Array[Long](gw * gh)
    var y = 0
    while (y < r.height) {
      val gy = (y.toLong * gh / r.height).toInt
      var x = 0
      while (x < r.width) {
        val gx = (x.toLong * gw / r.width).toInt
        cell(gy * gw + gx) += (r.gray(y * r.width + x) & 0xff)
        cnt(gy * gw + gx) += 1
        x += 1
      }
      y += 1
    }
    var hash = 0L
    var gy = 0
    while (gy < gh) {
      var gx = 0
      while (gx < gw - 1) {
        val a = if (cnt(gy * gw + gx) == 0) 0L
                else cell(gy * gw + gx) / cnt(gy * gw + gx)
        val b = if (cnt(gy * gw + gx + 1) == 0) 0L
                else cell(gy * gw + gx + 1) / cnt(gy * gw + gx + 1)
        hash = (hash << 1) | (if (a > b) 1L else 0L)
        gx += 1
      }
      gy += 1
    }
    hash
  }

  /** bytes → Some(dHash), None when undecodable. The catch-all keeps the
    * Option/None contract airtight: any decoder edge case a malformed
    * blob slips past the explicit validations degrades to a dropped row,
    * never a failed job. */
  def dHashOf(bytes: Array[Byte]): Option[Long] =
    scala.util.Try(decodeRaster(bytes)).toOption.flatten.map(dHash)

  // ------------------------------------------------------------ pair mining

  /** (media_id, media: binary) → near-dup pairs (a, b, dist), a < b,
    * via the shared [[Hamming64]] band join (recall EXACT for
    * maxDist ≤ 7 by pigeonhole, hot buckets capped). Undecodable rows
    * drop out. */
  /** (media_id, media: binary) → (id, h) dHash table; undecodable rows
    * drop out. The decode+hash input of both the self-join pair miner
    * and the [[MediaHashIndex]] incremental lifecycle. */
  def hashed(media: DataFrame, idCol: String = "media_id",
             bytesCol: String = "media"): DataFrame = {
    val hashUdf = udf((bytes: Array[Byte]) =>
      if (bytes == null) None else dHashOf(bytes))
    media
      .select(col(idCol).cast("long").as("id"), hashUdf(col(bytesCol)).as("h"))
      .where(col("h").isNotNull)
  }

  def nearDupPairs(media: DataFrame, idCol: String = "media_id",
                   bytesCol: String = "media", maxDist: Int = 6,
                   maxBucketSize: Int = 1000): DataFrame =
    Hamming64.nearDupPairs(hashed(media, idCol, bytesCol), maxDist, maxBucketSize)

  // ---------------------------------------------------------------- plants

  /** Deterministic synthetic "photo" for plant group `g`: a per-group
    * pseudo-random block pattern (splitmix-style mix of (g, x, y)), so
    * different groups are ~32 dHash bits apart. */
  def syntheticRgb(g: Long, w: Int, h: Int, shift: Int): Array[Byte] = {
    val rgb = new Array[Byte](w * h * 3)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        // block-quantized mix → strong 8x8 structure for the pooled hash
        var z = g * 0x9e3779b97f4a7c15L + (x / 4) * 0xbf58476d1ce4e5b9L +
          (y / 4) * 0x94d049bb133111ebL
        z ^= z >>> 31; z *= 0xd6e8feb86659fd93L; z ^= z >>> 27
        val base = (z & 0xff).toInt
        val v = math.min(255, math.max(0, base / 2 + 64 + shift))
        val i = (y * w + x) * 3
        rgb(i) = v.toByte; rgb(i + 1) = v.toByte; rgb(i + 2) = v.toByte
        x += 1
      }
      y += 1
    }
    rgb
  }

  /** Planted image corpus over the documents table: every doc gets a
    * distinct 32×32 photo; docs with `doc_id % 10 == 1` instead carry a
    * NEAR-DUP of doc_id-1's photo — re-encoded in the OTHER format with
    * a +6 brightness shift (monotone → dHash-identical). The expected
    * pair set is thus pure doc_id arithmetic — the constructor-inversion
    * oracle contract (x7_decode_real pattern). */
  def plantedCorpus(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id")).as[Long].mapPartitions { it =>
      it.map { id =>
        val dup = id % 10 == 1
        val g = if (dup) id - 1 else id
        val rgb = syntheticRgb(g, 32, 32, if (dup) 6 else 0)
        val bytes =
          if ((g % 2 == 0) ^ dup) encodePng(32, 32, rgb)
          else encodeBmp(32, 32, rgb)
        (id, bytes)
      }
    }.toDF("media_id", "media")
  }
}
