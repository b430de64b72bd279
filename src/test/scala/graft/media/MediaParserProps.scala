package graft.media

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAllNoShrink

/** Totality fuzz for the binary header parsers: random bytes, truncated
  * valid headers, and bit-flipped valid headers must never throw — a
  * malformed blob in a 100 TB media corpus must fall back to the stub
  * path, not kill the task.
  */
object MediaParserProps extends Properties("MediaParsers") {

  override def overrideParameters(p: org.scalacheck.Test.Parameters): org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(200)

  private val junk: Gen[Array[Byte]] =
    Gen.choose(0, 200).flatMap(n => Gen.listOfN(n, Gen.choose(-128, 127))
      .map(_.map(_.toByte).toArray))

  private val validHeader: Gen[Array[Byte]] = Gen.oneOf(
    Gen.zip(Gen.choose(1, 4096), Gen.choose(1, 4096)).map { case (w, h) =>
      Multimodal.pngHeaderBytes(w, h) },
    Gen.zip(Gen.choose(1, 4096), Gen.choose(1, 4096)).map { case (w, h) =>
      Multimodal.bmpHeaderBytes(w, h) },
    Gen.zip(Gen.choose(1, 4096), Gen.choose(1, 4096), Gen.oneOf(true, false))
      .map { case (w, h, p) => Multimodal.jpegHeaderBytes(w, h, p) },
    Gen.zip(Gen.choose(1, 8), Gen.choose(8000, 192000), Gen.oneOf(8, 16, 24))
      .map { case (c, r, b) => Multimodal.wavHeaderBytes(c, r, b) },
    Gen.zip(Gen.choose(1, 90000), Gen.choose(0L, Int.MaxValue.toLong),
      Gen.oneOf(true, false)).map { case (ts, d, v1) =>
      Multimodal.mp4HeaderBytes(ts, d, v1) })

  private def parsersSurvive(bytes: Array[Byte]): Boolean = {
    Multimodal.decodeImageHeader(bytes)
    Multimodal.decodeWavHeader(bytes)
    Multimodal.decodeMp4Header(bytes)
    true
  }

  property("random bytes never throw") = forAllNoShrink(junk)(parsersSurvive)

  property("truncated valid headers never throw") =
    forAllNoShrink(validHeader, Gen.choose(0.0, 1.0)) { (bytes, frac) =>
      parsersSurvive(bytes.take((bytes.length * frac).toInt))
    }

  property("bit-flipped valid headers never throw") =
    forAllNoShrink(validHeader, Gen.choose(0, 1000), Gen.choose(0, 7)) {
      (bytes, pos, bit) =>
        val b = bytes.clone()
        val i = pos % b.length
        b(i) = (b(i) ^ (1 << bit)).toByte
        parsersSurvive(b)
    }

  property("valid headers parse to their constructor arguments") =
    forAllNoShrink(Gen.zip(Gen.choose(1, 4096), Gen.choose(1, 4096))) {
      case (w, h) =>
        Multimodal.decodeImageHeader(Multimodal.pngHeaderBytes(w, h))
          .contains((w, h, "png")) &&
        Multimodal.decodeImageHeader(Multimodal.bmpHeaderBytes(w, h))
          .contains((w, h, "bmp")) &&
        Multimodal.decodeImageHeader(Multimodal.jpegHeaderBytes(
          w.min(65535), h.min(65535), progressive = false))
          .contains((w.min(65535), h.min(65535), "jpeg"))
    }
}
