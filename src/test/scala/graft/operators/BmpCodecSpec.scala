package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The real BMP codec: container bytes round-trip exactly, and the
  * byte layout details a lazy decoder gets wrong — bottom-up rows,
  * BGR channel order, 4-byte row padding — are each pinned by a
  * fixture that breaks if that detail breaks.
  */
class BmpCodecSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("header fields and byte layout: magic, geometry, padding, bottom-up BGR rows") {
    // 3x2 asymmetric fixture: pixel (x,y) = (x, y, 10x+y) — every
    // detail of the layout shows up somewhere in the bytes
    val bytes = Multimodal.encodeBmp(3, 2, (x, y) => (x, y, 10 * x + y))
    assert(bytes(0) == 'B' && bytes(1) == 'M')
    // rowSize = ((3*3+3)/4)*4 = 12 → fileSize = 54 + 2*12 = 78
    assert(bytes.length == 78)
    assert((bytes(2) & 0xFF) == 78 && bytes(3) == 0) // fileSize LE
    assert((bytes(10) & 0xFF) == 54)                 // pixel offset
    assert((bytes(18) & 0xFF) == 3)                  // width LE
    assert((bytes(22) & 0xFF) == 2)                  // height LE
    assert((bytes(28) & 0xFF) == 24)                 // bpp
    // file row 0 is the BOTTOM display row (y=1); channels BGR:
    // pixel (0,1) = (r=0, g=1, b=1) → file bytes at 54: b,g,r = 1,1,0
    assert(bytes(54) == 1 && bytes(55) == 1 && bytes(56) == 0)
    // pixel (2,1) = (2,1,21) → at 54+6: 21,1,2
    assert(bytes(60) == 21 && bytes(61) == 1 && bytes(62) == 2)
    // padding bytes (9..11 of each 12-byte row) are zero
    assert(bytes(63) == 0 && bytes(64) == 0 && bytes(65) == 0)
    // TOP display row (y=0) is the SECOND file row: pixel (0,0) =
    // (0,0,0), pixel (1,0) = (1,0,10) → at 66+3: 10,0,1
    assert(bytes(69) == 10 && bytes(70) == 0 && bytes(71) == 1)
  }

  test("round-trip: decode returns display-order RGB exactly, for padded and unpadded widths") {
    // width 4 → rowSize 12, no padding; width 3 → padding; width 5 →
    // rowSize 16, one pad byte
    for (w <- Seq(3, 4, 5); h <- Seq(1, 2, 3)) {
      def px(x: Int, y: Int) = ((x * 37 + y) % 256, (y * 91 + x) % 256, (x + y * 13) % 256)
      val (dw, dh, rgb) = Multimodal.decodeBmp(Multimodal.encodeBmp(w, h, px))
      assert(dw == w && dh == h)
      for (y <- 0 until h; x <- 0 until w) {
        val (r, g, b) = px(x, y)
        val q = 3 * (y * w + x)
        assert((rgb(q) & 0xFF) == r && (rgb(q + 1) & 0xFF) == g
          && (rgb(q + 2) & 0xFF) == b,
          s"pixel ($x,$y) of ${w}x$h diverged")
      }
    }
  }

  test("decode rejects what it cannot parse instead of returning plausible garbage") {
    val good = Multimodal.encodeBmp(2, 2, (_, _) => (1, 2, 3))
    intercept[IllegalArgumentException] {
      Multimodal.decodeBmp("JFIF-not-a-bmp".getBytes ++ good.drop(14))
    }
    val wrongBpp = good.clone(); wrongBpp(28) = 32
    intercept[IllegalArgumentException](Multimodal.decodeBmp(wrongBpp))
    intercept[IllegalArgumentException](Multimodal.decodeBmp(good.dropRight(3)))
  }

  test("BmpCodec checksum is position-weighted: an upside-down decode cannot pass") {
    // two images with the same pixel MULTISET but different layouts
    // (rows swapped) must checksum differently — that is exactly the
    // property that makes the m05 gate orientation-sensitive
    val a = Multimodal.MediaRecord(1L, "image",
      Multimodal.encodeBmp(2, 2, (x, y) => (x + 2 * y, 0, 0)), "t")
    val flipped = Multimodal.MediaRecord(1L, "image",
      Multimodal.encodeBmp(2, 2, (x, y) => (x + 2 * (1 - y), 0, 0)), "t")
    val fa = Multimodal.BmpCodec.decode(a)
    val fb = Multimodal.BmpCodec.decode(flipped)
    assert(fa.checksum != fb.checksum,
      "row order is invisible to the checksum — the oracle gate is blind")
    assert(fa.width == 2 && fa.height == 2 && fa.channels == 3
      && fa.byte_size == a.content.length)
  }

  test("declarative header parse + ByteSum blockBit agree with a JVM-side replay") {
    import spark.implicits._
    val recs = Seq(5L, 6L, 7L, 8L).map { id =>
      Multimodal.MediaRecord(id, "image", Multimodal.encodeBmp(
        (4 + id % 5).toInt, (3 + id % 4).toInt,
        (x, y) => (((7 * id + 3 * x + 11 * y) % 256).toInt,
          ((13 * id + 5 * x + 2 * y) % 256).toInt,
          ((3 * id + x + 17 * y) % 256).toInt)), "t")
    }
    val df = spark.createDataset(recs).toDF()
    // the pure-column header parse reads the offset every encoder wrote
    val offs = df.select(col("media_id"),
        Multimodal.bmpPixelOffset(col("content")).as("off"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(offs.values.forall(_ == 54L), s"header parse diverged: $offs")
    // blockBit over block 0 == "first 8 sample bytes sum to ≥ 1024",
    // replayed on the JVM from the raw bytes
    val got = Multimodal.perceptualHashes(
        spark.createDataset(recs), blockBytes = 8, codec = Multimodal.BmpCodec)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // exact replay of the column semantics: windows offset past the
    // parsed header; a window truncated by the payload end sums what
    // exists (an all-dark short tail — bit 0 either way)
    val expected = recs.map { r =>
      var h = 0L
      val blocks = (r.content.length - 1) / 8 // the sequence() bound
      for (b <- 0 to math.min(59, blocks)) {
        val from = 54 + b * 8
        if (from < r.content.length) {
          val win = r.content.slice(from, math.min(r.content.length, from + 8))
          if (win.map(_ & 0xFF).sum >= 8 * 128) h |= 1L << b
        }
      }
      r.media_id -> h
    }.toMap
    assert(got == expected,
      s"blockBit diverged from the byte replay: $got vs $expected")
  }
}
