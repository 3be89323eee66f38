package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Spatial and temporal resampling over real container bytes:
  * [[Multimodal.resizeBmp]] (integer box filter, display-coordinate
  * crop, padded input rows) and [[Multimodal.sampleFrames]] (rate-
  * parsed frame selection, upsampling repeats, floor timestamps).
  */
class MediaResampleSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("resizeBmp 2x2→1x1 floor-averages each channel") {
    val vals = Map((0, 0) -> (10, 20, 30), (1, 0) -> (11, 21, 31),
      (0, 1) -> (12, 22, 32), (1, 1) -> (13, 23, 33))
    val bmp = Multimodal.encodeBmp(2, 2, (x, y) => vals((x, y)))
    val (w, h, rgb) = Multimodal.decodeBmp(Multimodal.resizeBmp(bmp, 2))
    assert((w, h) == (1, 1))
    assert(rgb.map(_ & 0xFF).toSeq == Seq(11, 21, 31)) // floor(46/4)=11 …
  }

  test("resizeBmp odd dims crop the bottom display row and right column") {
    // p(x,y).r = 10x + y: the kept 2x2 block is display-top-left —
    // a file-order (bottom-up) cropper would average rows y=1,2 instead
    val bmp = Multimodal.encodeBmp(3, 3, (x, y) => (10 * x + y, 0, 0))
    val (w, h, rgb) = Multimodal.decodeBmp(Multimodal.resizeBmp(bmp, 2))
    assert((w, h) == (1, 1))
    assert((rgb(0) & 0xFF) == (0 + 10 + 1 + 11) / 4) // rows y=0,1 → 5
  }

  test("resizeBmp handles padded input rows (width not a multiple of 4)") {
    // width 5 → input row stride 16 with 1 pad byte; a raw-stride
    // reader would shear rows. Exact per-pixel values pin it.
    val bmp = Multimodal.encodeBmp(5, 4, (x, y) => (x, y, x + y))
    val (w, h, rgb) = Multimodal.decodeBmp(Multimodal.resizeBmp(bmp, 2))
    assert((w, h) == (2, 2))
    // out(X,Y).r = floor((2X + 2X+1 + 2X + 2X+1)/4) = 2X (r = x)
    for (yy <- 0 until 2; xx <- 0 until 2) {
      val q = 3 * (yy * 2 + xx)
      assert((rgb(q) & 0xFF) == 2 * xx, s"r at ($xx,$yy)")
      assert((rgb(q + 1) & 0xFF) == 2 * yy, s"g at ($xx,$yy)")
      assert((rgb(q + 2) & 0xFF) == 2 * xx + 2 * yy + 1, s"b at ($xx,$yy)")
    }
  }

  test("factor 1 is the identity for both resamplers (container-exact)") {
    val bmp = Multimodal.encodeBmp(5, 3, (x, y) => (x * 7, y * 5, x + y))
    assert(Multimodal.resizeBmp(bmp, 1).toSeq == bmp.toSeq)
    val wav = Multimodal.encodeWav(8000, Array[Short](3, -4, 5, -6))
    assert(Multimodal.decimateWav(wav, 1).toSeq == wav.toSeq)
  }

  test("resizeBmp rejects a resize to nothing") {
    val bmp = Multimodal.encodeBmp(2, 2, (_, _) => (1, 2, 3))
    intercept[IllegalArgumentException](Multimodal.resizeBmp(bmp, 3))
  }

  test("resizeImages passes non-image kinds through untouched") {
    import spark.implicits._
    val wav = Multimodal.encodeWav(8000, Array[Short](1, 2, 3))
    val ds = Seq(Multimodal.MediaRecord(1L, "audio", wav, "t")).toDS()
    val out = Multimodal.resizeImages(ds, 2).collect()
    assert(out.head.content.toSeq == wav.toSeq)
  }

  test("decimateWav box-averages with toward-zero division and drops the remainder") {
    // 9 samples by 4 → 2 outputs, 1 cropped; negative sums pin the
    // truncating (not floor) division: (-7-8-9-10)/4 = -8 (floor −9)
    val s = Array[Short](1, 2, 3, 5, -7, -8, -9, -10, 999)
    val out = Multimodal.decimateWav(Multimodal.encodeWav(8000, s), 4)
    val (rate, got) = Multimodal.decodeWav(out)
    assert(rate == 2000, "rate header must reflect the decimation")
    assert(got.toSeq == Seq[Short](2, -8)) // (1+2+3+5)/4=2; (-34)/4=-8
  }

  test("decimateWav walks chunks: a JUNK-bearing input decimates identically") {
    val s = Array.tabulate(16)(i => (100 * i - 500).toShort)
    val plain = Multimodal.decodeWav(
      Multimodal.decimateWav(Multimodal.encodeWav(8000, s), 4))._2
    val junked = Multimodal.decodeWav(
      Multimodal.decimateWav(Multimodal.encodeWav(8000, s, junkChunk = true), 4))._2
    assert(plain.toSeq == junked.toSeq)
  }

  test("decimateWav rejects non-divisible rates and degenerate outputs") {
    val bytes = Multimodal.encodeWav(8000, Array[Short](1, 2, 3))
    intercept[IllegalArgumentException](Multimodal.decimateWav(bytes, 3)) // 8000 % 3
    intercept[IllegalArgumentException](Multimodal.decimateWav(bytes, 4)) // 3/4 = 0
  }

  test("sampleFrames honors the parsed rate: stride on fast, repeat on slow") {
    import spark.implicits._
    def vid(id: Long, fps: Int) = Multimodal.MediaRecord(id, "video",
      Multimodal.encodeY4m(8, 6, fps, 1, 4,
        luma = (f, x, y) => (f + x + y) % 256), "t")
    val ds = Seq(vid(1L, 10), vid(2L, 30)).toDS()
    val rows = Multimodal.sampleFramesAtRate(ds, targetFps = 15)
      .orderBy("media_id", "sample_no")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3)))
    // 10 fps @ target 15: floor(10k/15) = 0,0,1,2,2,3 — frames REPEAT
    assert(rows.filter(_._1 == 1L).map(_._3).toSeq == Seq(0, 0, 1, 2, 2, 3))
    assert(rows.filter(_._1 == 1L).map(_._4).toSeq ==
      Seq(0L, 0L, 100L, 200L, 200L, 300L))
    // 30 fps @ target 15: floor(30k/15) = 0,2 (4 stops) — every 2nd frame
    assert(rows.filter(_._1 == 2L).map(_._3).toSeq == Seq(0, 2))
    assert(rows.filter(_._1 == 2L).map(_._4).toSeq == Seq(0L, 66L)) // ms floor
  }

  test("sampleFrames signatures equal y4mFrameSigs for the same frame") {
    import spark.implicits._
    val ds = Seq(Multimodal.MediaRecord(7L, "video",
      Multimodal.encodeY4m(8, 6, 25, 1, 3,
        luma = (f, x, y) => (31 * f + 5 * x + 11 * y) % 256), "t")).toDS()
    val all = Multimodal.y4mFrameSigs(ds).collect()
      .map(r => (r.getInt(1), r.getLong(2))).toMap
    val sampled = Multimodal.sampleFramesAtRate(ds, targetFps = 25).collect()
    assert(sampled.nonEmpty)
    sampled.foreach { r =>
      assert(r.getLong(4) == all(r.getInt(2)), s"frame ${r.getInt(2)}")
    }
  }
}
