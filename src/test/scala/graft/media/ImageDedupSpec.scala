package graft.media

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.tables.Tables

/** Content-level image near-dup (VERDICT r10 #5): real pixel codecs, a
  * monotone-invariant dHash, and the Hamming-band LSH join. The decode
  * side is pinned against hand-built files — including PNGs written
  * with every scanline filter the spec defines, not just the filter-0
  * files our own encoder emits.
  */
class ImageDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def rgbOf(id: Long, shift: Int = 0) =
    ImageDedup.syntheticRgb(id, 32, 32, shift)

  test("BMP and PNG encode→decode round-trip to the same grayscale raster") {
    val rgb = rgbOf(7L)
    val viaBmp = ImageDedup.decodeRaster(ImageDedup.encodeBmp(32, 32, rgb)).get
    val viaPng = ImageDedup.decodeRaster(ImageDedup.encodePng(32, 32, rgb)).get
    assert(viaBmp.width === 32 && viaBmp.height === 32)
    assert(viaBmp.gray.toSeq === viaPng.gray.toSeq,
      "the two codecs must agree on every luma byte")
  }

  test("PNG decoder handles all five scanline filters (Sub/Up/Average/Paeth)") {
    // hand-write a PNG whose row y uses filter (y % 5): the decoder must
    // invert each filter exactly
    val w = 16; val h = 10
    val rgb = rgbOf(11L).take(w * h * 3)
    val stride = w * 3
    val raw = new Array[Byte]((stride + 1) * h)
    def px(y: Int, x: Int): Int = rgb(y * stride + x) & 0xff
    for (y <- 0 until h) {
      val ft = y % 5
      raw(y * (stride + 1)) = ft.toByte
      for (x <- 0 until stride) {
        val a = if (x >= 3) px(y, x - 3) else 0
        val b = if (y > 0) px(y - 1, x) else 0
        val c = if (x >= 3 && y > 0) px(y - 1, x - 3) else 0
        val v = ft match {
          case 0 => px(y, x)
          case 1 => px(y, x) - a
          case 2 => px(y, x) - b
          case 3 => px(y, x) - ((a + b) >> 1)
          case 4 =>
            val p = a + b - c
            val pa = math.abs(p - a); val pb = math.abs(p - b)
            val pc = math.abs(p - c)
            px(y, x) - (if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c)
        }
        raw(y * (stride + 1) + 1 + x) = (v & 0xff).toByte
      }
    }
    // wrap raw in a real PNG container (reuse the encoder's chunk layout
    // by deflating our pre-filtered bytes)
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
    def chunk(name: String, payload: Array[Byte]): Unit = {
      out.write(java.nio.ByteBuffer.allocate(4).putInt(payload.length).array())
      val body = name.getBytes("US-ASCII") ++ payload
      out.write(body)
      val crc = new java.util.zip.CRC32(); crc.update(body)
      out.write(java.nio.ByteBuffer.allocate(4).putInt(crc.getValue.toInt).array())
    }
    chunk("IHDR", java.nio.ByteBuffer.allocate(13)
      .putInt(w).putInt(h).put(8.toByte).put(2.toByte)
      .put(0.toByte).put(0.toByte).put(0.toByte).array())
    val deflater = new java.util.zip.Deflater()
    deflater.setInput(raw); deflater.finish()
    val comp = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!deflater.finished()) comp.write(buf, 0, deflater.deflate(buf))
    deflater.end()
    chunk("IDAT", comp.toByteArray)
    chunk("IEND", Array.empty)
    val decoded = ImageDedup.decodePng(out.toByteArray).get
    val expected = ImageDedup.decodeRaster(
      ImageDedup.encodeBmp(w, h, rgb)).get.gray
    assert(decoded.gray.toSeq === expected.toSeq,
      "filtered scanlines must invert to the same pixels")
  }

  test("dHash is invariant under re-encode and monotone brightness shift, far for distinct content") {
    val base = ImageDedup.dHashOf(ImageDedup.encodePng(32, 32, rgbOf(3L))).get
    val asBmp = ImageDedup.dHashOf(ImageDedup.encodeBmp(32, 32, rgbOf(3L))).get
    val brighter = ImageDedup.dHashOf(
      ImageDedup.encodeBmp(32, 32, rgbOf(3L, shift = 6))).get
    assert(base === asBmp, "PNG↔BMP re-encode must not move the hash")
    assert(base === brighter, "a monotone brightness shift must not move the hash")
    val other = ImageDedup.dHashOf(ImageDedup.encodePng(32, 32, rgbOf(4L))).get
    val dist = java.lang.Long.bitCount(base ^ other)
    assert(dist > 10, s"distinct content should scatter, got Hamming $dist")
  }

  test("nearDupPairs finds exactly the planted pairs; the raw corpus pairs nothing") {
    val docs = Tables.documents(spark, graft.TestSpark.Sf0001).limit(120)
    val planted = ImageDedup.plantedCorpus(docs)
    val pairs = ImageDedup.nearDupPairs(planted).collect()
    val expected = docs.select("doc_id").collect().map(_.getLong(0)).toSet
      .filter(id => id % 10 == 1)
      .map(id => (id - 1, id))
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).toSet === expected,
      "pair set must be exactly the planted near-dups")
    assert(pairs.forall(_.getInt(2) === 0),
      "monotone re-encodes land at Hamming distance 0")
    // distinct-content corpus (the plants removed): zero pairs
    import spark.implicits._
    val raw = docs.select(col("doc_id")).as[Long].filter(_ % 10 != 1)
      .mapPartitions(_.map { id =>
        (id, ImageDedup.encodePng(32, 32, ImageDedup.syntheticRgb(id, 32, 32, 0)))
      }).toDF("media_id", "media")
    assert(ImageDedup.nearDupPairs(raw).count() === 0L)
  }

  test("hot-bucket cap bounds degenerate (flat) content") {
    import spark.implicits._
    // 300 identical flat images: every band bucket is one hot bucket; the
    // cap must bound candidate pairs to cap², not 300²
    val flat = spark.range(300).as[Long].mapPartitions(_.map { id =>
      val rgb = new Array[Byte](32 * 32 * 3) // all zeros
      (id, ImageDedup.encodeBmp(32, 32, rgb))
    }).toDF("media_id", "media")
    val capped = ImageDedup.nearDupPairs(flat, maxBucketSize = 16)
    val n = capped.count()
    assert(n <= 16L * 15L / 2L,
      s"cap 16 must bound pairs to the capped bucket, got $n")
    assert(n > 0L, "the capped bucket still pairs within itself")
  }

  test("undecodable and truncated bytes drop out instead of failing") {
    import spark.implicits._
    val junk = Seq(
      (1L, Array[Byte](1, 2, 3)),
      (2L, ImageDedup.encodePng(32, 32, rgbOf(9L)).take(40)), // truncated
      (3L, ImageDedup.encodeBmp(32, 32, rgbOf(9L))))
      .toDF("media_id", "media")
    // only id 3 decodes; no pair partner → empty result, no exception
    assert(ImageDedup.nearDupPairs(junk).count() === 0L)
    assert(ImageDedup.dHashOf(Array[Byte](1, 2, 3)).isEmpty)
  }
}
