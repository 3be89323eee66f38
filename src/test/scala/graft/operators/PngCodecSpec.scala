package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** The real PNG codec: truecolor streams round-trip exactly through
  * zlib deflate + per-scanline prediction filters, every chunk CRC is
  * load-bearing, multi-IDAT splits and ancillary chunks are handled,
  * and corruption anywhere in the compressed layer fails loudly
  * instead of producing wrong pixels.
  */
class PngCodecSpec extends AnyFunSuite {

  private def pix(id: Long)(x: Int, y: Int): (Int, Int, Int) = (
    ((7 * id + 3 * x + 11 * y) % 256).toInt,
    ((13 * id + 5 * x + 2 * y) % 256).toInt,
    ((3 * id + x + 17 * y) % 256).toInt)

  private def assertPixels(id: Long, w: Int, h: Int, rgb: Array[Byte]): Unit =
    for (y <- 0 until h; x <- 0 until w) {
      val (r, g, b) = pix(id)(x, y)
      val q = 3 * (y * w + x)
      assert((rgb(q) & 0xFF, rgb(q + 1) & 0xFF, rgb(q + 2) & 0xFF) == ((r, g, b)),
        s"pixel ($x,$y) diverged")
    }

  test("round-trip: every filter type inverts exactly, alone and cycling") {
    for {
      ft <- -1 to 4 // -1 = cycle through all five per row
      (w, h) <- Seq((1, 1), (4, 3), (8, 6), (5, 7))
    } {
      val f: Int => Int = if (ft < 0) y => y % 5 else _ => ft
      val bytes = Multimodal.encodePng(w, h, pix(17L), filterForRow = f)
      val (gw, gh, rgb) = Multimodal.decodePng(bytes)
      assert((gw, gh) == ((w, h)), s"geometry diverged for filter $ft")
      assertPixels(17L, w, h, rgb)
    }
  }

  test("multi-IDAT splits and ancillary tEXt decode identically to canonical") {
    val canonical = Multimodal.decodePng(
      Multimodal.encodePng(8, 6, pix(23L), filterForRow = _ % 5))
    for ((split, text) <- Seq((3, None), (5, Some("x")), (1, Some("planted")))) {
      val got = Multimodal.decodePng(Multimodal.encodePng(8, 6, pix(23L),
        filterForRow = _ % 5, idatSplit = split, textChunk = text))
      assert(got._1 == canonical._1 && got._2 == canonical._2 &&
        java.util.Arrays.equals(got._3, canonical._3),
        s"split=$split text=$text diverged from canonical")
    }
  }

  test("corruption fails loudly: CRC, truncation, signature, zlib garbage") {
    val good = Multimodal.encodePng(6, 5, pix(9L), filterForRow = _ % 5)
    // flip one byte inside the first IDAT payload → its CRC must trip
    val idatAt = {
      var p = 8
      while (new String(good, p + 4, 4, "US-ASCII") != "IDAT")
        p += 12 + (((good(p) & 0xFF) << 24) | ((good(p + 1) & 0xFF) << 16) |
          ((good(p + 2) & 0xFF) << 8) | (good(p + 3) & 0xFF))
      p
    }
    val flipped = good.clone()
    flipped(idatAt + 8) = (flipped(idatAt + 8) ^ 0x5A).toByte
    assertThrows[IllegalArgumentException](Multimodal.decodePng(flipped))
    // truncation mid-chunk
    assertThrows[IllegalArgumentException](
      Multimodal.decodePng(java.util.Arrays.copyOfRange(good, 0, good.length - 6)))
    // wrong signature
    val sig = good.clone(); sig(0) = 'X'
    assertThrows[IllegalArgumentException](Multimodal.decodePng(sig))
    // valid CRC but garbage zlib: rebuild the IDAT chunk around noise
    // bytes — the inflate length contract must trip, not wrong pixels
    val pre = java.util.Arrays.copyOfRange(good, 8, idatAt)
    val garbage = Array.tabulate(16)(i => (37 * i + 5).toByte)
    val out = new java.io.ByteArrayOutputStream()
    out.write(good, 0, 8)
    out.write(pre)
    val chunk = new Array[Byte](12 + garbage.length)
    chunk(3) = garbage.length.toByte
    "IDAT".getBytes("US-ASCII").copyToArray(chunk, 4)
    garbage.copyToArray(chunk, 8)
    val crc = new java.util.zip.CRC32
    crc.update(chunk, 4, 4 + garbage.length)
    val cv = crc.getValue.toInt
    chunk(8 + garbage.length) = (cv >>> 24).toByte
    chunk(9 + garbage.length) = (cv >>> 16).toByte
    chunk(10 + garbage.length) = (cv >>> 8).toByte
    chunk(11 + garbage.length) = cv.toByte
    out.write(chunk)
    out.write(Multimodal.encodePng(1, 1, pix(0L)) // steal a valid IEND
      .takeRight(12))
    assertThrows[Exception](Multimodal.decodePng(out.toByteArray))
  }

  test("PngCodec features match BmpCodec on identical pixels") {
    // the two image codecs are feature-compatible: same checksum over
    // the same decoded pixels, whatever the container
    val id = 31L
    val bmp = Multimodal.MediaRecord(id, "image",
      Multimodal.encodeBmp(7, 5, pix(id)), "t")
    val png = Multimodal.MediaRecord(id, "image",
      Multimodal.encodePng(7, 5, pix(id), filterForRow = _ % 5,
        idatSplit = 2, textChunk = Some("t")), "t")
    val fb = Multimodal.BmpCodec.decode(bmp)
    val fp = Multimodal.PngCodec.decode(png)
    assert((fp.width, fp.height, fp.checksum) ==
      ((fb.width, fb.height, fb.checksum)),
      "PNG and BMP disagree on identical pixels")
    assert(fp.byte_size != fb.byte_size,
      "sanity: the containers themselves differ")
    val eb = Multimodal.BmpCodec.embed(bmp, 8)
    val ep = Multimodal.PngCodec.embed(png, 8)
    assert(eb.toSeq == ep.toSeq, "block-mean embeddings diverged")
  }
}
