package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The real Y4M codec: yuv4mpeg2 streams round-trip exactly, and the
  * header walk — frame rate honored, C-tag-sized frame boundaries,
  * FRAME marker parameters, order-free header tags — is pinned by
  * fixtures that break any reader hardcoding the canonical layout.
  */
class Y4mCodecSpec extends AnyFunSuite {

  private def luma(id: Long)(f: Int, x: Int, y: Int): Int =
    ((17 * id + 5 * f + 3 * x + 7 * y) % 256).toInt

  test("round-trip: Y planes decode exactly across every format variant") {
    for {
      c444 <- Seq(false, true)
      cFirst <- Seq(false, true)
      hx <- Seq(None, Some("Xgraft"))
      n <- Seq(1, 3, 5)
    } {
      val bytes = Multimodal.encodeY4m(8, 6, 25, 1, n, luma(9L),
        c444 = c444, cTagFirst = cFirst, headerX = hx,
        frameX = f => if (f % 2 == 1) "Xp" else "")
      val (w, h, num, den, frames) = Multimodal.decodeY4m(bytes)
      assert((w, h, num, den) == (8, 6, 25, 1))
      assert(frames.length == n, s"c444=$c444 cFirst=$cFirst hx=$hx n=$n")
      for (f <- 0 until n; y <- 0 until 6; x <- 0 until 8)
        assert((frames(f)(y * 8 + x) & 0xFF) == luma(9L)(f, x, y),
          s"pixel ($x,$y) frame $f diverged (c444=$c444)")
    }
  }

  test("frame-rate header is honored: same frames, different durations") {
    val fast = Multimodal.MediaRecord(1L, "video",
      Multimodal.encodeY4m(8, 6, 25, 1, 4, luma(1L)), "t")
    val slow = Multimodal.MediaRecord(1L, "video",
      Multimodal.encodeY4m(8, 6, 10, 1, 4, luma(1L)), "t")
    assert(Multimodal.Y4mCodec.decode(fast).duration_ms == 4L * 1000 / 25)
    assert(Multimodal.Y4mCodec.decode(slow).duration_ms == 4L * 1000 / 10)
    // non-unit denominator: 4 frames at 30000/1001 ≈ 133 ms, floor'd
    val ntsc = Multimodal.MediaRecord(1L, "video",
      Multimodal.encodeY4m(8, 6, 30000, 1001, 4, luma(1L)), "t")
    assert(Multimodal.Y4mCodec.decode(ntsc).duration_ms == 4L * 1000 * 1001 / 30000)
  }

  test("C444 frame boundaries: later frames survive the doubled chroma") {
    // a reader hardcoding 4:2:0 would advance 72 bytes per frame and
    // read frame 1's Y plane 72 bytes early, landing in frame 0 chroma
    val bytes = Multimodal.encodeY4m(8, 6, 25, 1, 3, luma(5L), c444 = true)
    val (_, _, _, _, frames) = Multimodal.decodeY4m(bytes)
    for (y <- 0 until 6; x <- 0 until 8)
      assert((frames(2)(y * 8 + x) & 0xFF) == luma(5L)(2, x, y),
        "frame 2 misread — chroma-plane size not taken from the C tag")
  }

  test("byte sizes match the per-class layout constants the m09 oracle uses") {
    // class 0: canonical header 39 B, 4:2:0 frames 78 B each
    assert(Multimodal.encodeY4m(8, 6, 25, 1, 3, luma(0L)).length == 39 + 3 * 78)
    // class 1: C-first C444 header 35 B, frames 150 B each
    assert(Multimodal.encodeY4m(8, 6, 10, 1, 3, luma(1L),
      c444 = true, cTagFirst = true).length == 35 + 3 * 150)
    // class 2: X-param header 46 B, +3 B marker param on odd frames
    assert(Multimodal.encodeY4m(8, 6, 30, 1, 4, luma(2L),
      headerX = Some("Xgraft"),
      frameX = f => if (f % 2 == 1) "Xg" else "").length == 46 + 4 * 78 + 3 * 2)
  }

  test("decode rejects what it cannot parse") {
    val good = Multimodal.encodeY4m(8, 6, 25, 1, 2, luma(3L))
    intercept[IllegalArgumentException](
      Multimodal.decodeY4m("MPEG4not-a-y4m\n".getBytes("US-ASCII")))
    // unsupported colorspace: legal Y4M, not this decoder's contract
    val c422 = new String(good, 0, 39, "US-ASCII")
      .replace("C420jpeg", "C422xxxx").getBytes("US-ASCII") ++ good.drop(39)
    intercept[IllegalArgumentException](Multimodal.decodeY4m(c422))
    // truncated frame data
    intercept[IllegalArgumentException](Multimodal.decodeY4m(good.dropRight(4)))
    // corrupt frame marker
    val bad = good.clone()
    bad(39) = 'G' // first FRAME marker's F
    intercept[IllegalArgumentException](Multimodal.decodeY4m(bad))
  }

  test("Y4mCodec checksum: frame-and-position weighted, order sensitive") {
    val r = Multimodal.MediaRecord(7L, "video",
      Multimodal.encodeY4m(8, 6, 25, 1, 3, luma(7L)), "t")
    val feats = Multimodal.Y4mCodec.decode(r)
    assert(feats.width == 8 && feats.height == 6 && feats.channels == 3)
    assert(feats.byte_size == r.content.length)
    val expected = (for (f <- 0 until 3; y <- 0 until 6; x <- 0 until 8)
      yield luma(7L)(f, x, y).toLong * (1 + x + y * 8 + f * 48)).sum
    assert(feats.checksum == expected, "checksum formula diverged")
    // swapping two frames must change the checksum (frame weighting)
    val swapped = Multimodal.MediaRecord(7L, "video",
      Multimodal.encodeY4m(8, 6, 25, 1, 3,
        (f, x, y) => luma(7L)(2 - f, x, y)), "t")
    assert(Multimodal.Y4mCodec.decode(swapped).checksum != feats.checksum)
  }

  test("y4mFrameSigs + samePositionPairs: decoded-frame near-dup semantics") {
    val spark: SparkSession = SparkSession.builder()
      .master("local[4]").config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    import spark.implicits._
    def vid(id: Long, seed: Long, perturb: Boolean) =
      Multimodal.MediaRecord(id, "video",
        Multimodal.encodeY4m(8, 6, 25, 1, 6, (f, x, y) =>
          if (perturb && f == 2 && x == 0 && y == 0) 255
          else ((17 * seed + 5 * f + 3 * x + 7 * y +
            (seed * (x + 8 * y + 48 * f + 1)) % 211) % 256).toInt), "t")
    val recs = Seq(
      vid(1L, 10L, perturb = false),   // base
      vid(2L, 10L, perturb = false),   // exact copy: 6 shared frames
      vid(3L, 10L, perturb = true),    // near copy: frame 2 differs
      vid(4L, 999L, perturb = false))  // unrelated
    val sigs = Multimodal.y4mFrameSigs(spark.createDataset(recs))
    // exact replay of frame 0's weighted luma sum from the formula
    val got = sigs.collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    val expect0 = (for (y <- 0 until 6; x <- 0 until 8) yield
      ((17 * 10 + 3 * x + 7 * y + (10 * (x + 8 * y + 1)) % 211) % 256).toLong *
        (1 + x + 8 * y)).sum
    assert(got((1L, 0)) == expect0, "frame-sig formula diverged")
    val pairs = Multimodal.samePositionPairs(
        Multimodal.y4mFrameSigs(spark.createDataset(recs)), minShared = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(pairs == Set((1L, 2L, 6L), (1L, 3L, 5L), (2L, 3L, 5L)),
      s"planted structure not recovered: $pairs")
  }

  test("m14 semantics: head-trimmed copies escape same-position, align at the trim delta") {
    val spark: SparkSession = SparkSession.builder()
      .master("local[4]").config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    import spark.implicits._
    def vid(id: Long, seed: Long, off: Int, n: Int, perturb: Boolean) =
      Multimodal.MediaRecord(id, "video",
        Multimodal.encodeY4m(8, 6, 25, 1, n, (f, x, y) =>
          if (perturb && f == 3 && x == 0 && y == 0) 255
          else ((17 * seed + 5 * (f + off) + 3 * x + 7 * y +
            (seed * (x + 8 * y + 48 * (f + off) + 1)) % 211) % 256).toInt), "t")
    val recs = Seq(
      vid(1L, 10L, off = 0, n = 8, perturb = false), // base, 8 frames
      vid(2L, 10L, off = 2, n = 6, perturb = false), // head-trim 2: frames 2..7
      vid(3L, 10L, off = 1, n = 6, perturb = true),  // trim 1 + frame damage
      vid(4L, 999L, off = 0, n = 8, perturb = false)) // unrelated
    val sigs = Multimodal.y4mFrameSigs(spark.createDataset(recs))
      .select(org.apache.spark.sql.functions.col("media_id"),
        org.apache.spark.sql.functions.col("frame_no").as("win_no"),
        org.apache.spark.sql.functions.col("frame_sig").as("sig"))
    // the motivating negative: same-position agreement is ZERO for a
    // trimmed copy, so m10's join cannot pair it...
    val samePos = Multimodal.samePositionPairs(
        Multimodal.y4mFrameSigs(spark.createDataset(recs)), minShared = 4)
      .collect()
    assert(samePos.isEmpty, s"trimmed copies must not share positions: ${samePos.toSeq}")
    // ...and the delta-consistent landmark join pairs both: the pure
    // trim with ALL its frames at delta +2, the damaged trim with 5
    // of 6 at delta +1
    val aligned = Multimodal.landmarkAlignPairs(sigs, minAligned = 4, maxSigDf = 64)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3))).toSet
    // (2,3): 5 frame overlaps at delta −1, minus the one clip-3 frame
    // the damage broke → 4, exactly at the least(4,·,·) floor
    assert(aligned == Set((1L, 2L, 2, 6L), (1L, 3L, 1, 5L), (2L, 3L, -1, 4L)),
      s"alignment structure not recovered: $aligned")
  }
}
