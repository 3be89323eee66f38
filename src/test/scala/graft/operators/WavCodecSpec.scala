package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The real WAV codec: RIFF containers round-trip exactly, and the
  * chunk walk — the part a lazy fixed-offset reader skips — is pinned
  * by junk-chunk and odd-size-padding fixtures.
  */
class WavCodecSpec extends AnyFunSuite {

  private def samplesOf(id: Long, n: Int): Array[Short] =
    Array.tabulate(n)(i => (((31 * id + 7L * i * i) % 65536) - 32768).toShort)

  test("round-trip: PCM samples decode exactly, with and without a JUNK chunk") {
    for (junk <- Seq(false, true); n <- Seq(1, 40, 71)) {
      val s = samplesOf(9L, n)
      val bytes = Multimodal.encodeWav(8000, s, junkChunk = junk)
      assert(bytes.length == 44 + (if (junk) 20 else 0) + 2 * n)
      val (rate, got) = Multimodal.decodeWav(bytes)
      assert(rate == 8000)
      assert(got.toSeq == s.toSeq, s"junk=$junk n=$n: samples diverged")
    }
  }

  test("header fields: tags, PCM fmt, little-endian sizes") {
    val bytes = Multimodal.encodeWav(8000, samplesOf(1L, 4))
    assert(new String(bytes, 0, 4, "US-ASCII") == "RIFF")
    assert(new String(bytes, 8, 4, "US-ASCII") == "WAVE")
    assert(new String(bytes, 12, 4, "US-ASCII") == "fmt ")
    assert((bytes(20) & 0xFF) == 1 && (bytes(22) & 0xFF) == 1) // PCM, mono
    assert((bytes(34) & 0xFF) == 16)                           // bits/sample
    assert(new String(bytes, 36, 4, "US-ASCII") == "data")
    assert((bytes(40) & 0xFF) == 8)                            // 4 samples
  }

  test("chunk walk pads ODD-sized chunks to even, per the RIFF spec") {
    // hand-splice a 3-byte chunk between fmt and data: the walker must
    // advance 8 + 3 + 1 bytes past it or it lands mid-stream
    val base = Multimodal.encodeWav(8000, samplesOf(3L, 5))
    val odd = new Array[Byte](4 + 4 + 3 + 1) // "oddc" + size + payload + pad
    "oddc".getBytes("US-ASCII").copyToArray(odd, 0)
    odd(4) = 3 // size 3 LE
    val spliced = base.take(36) ++ odd ++ base.drop(36)
    // RIFF size field covers everything after byte 8
    spliced(4) = ((spliced.length - 8) & 0xFF).toByte
    spliced(5) = (((spliced.length - 8) >> 8) & 0xFF).toByte
    val (rate, got) = Multimodal.decodeWav(spliced)
    assert(rate == 8000 && got.toSeq == samplesOf(3L, 5).toSeq,
      "the chunk walk misparsed an odd-sized chunk's padding")
  }

  test("decode rejects what it cannot parse") {
    val good = Multimodal.encodeWav(8000, samplesOf(2L, 4))
    intercept[IllegalArgumentException] {
      Multimodal.decodeWav("OGGSnot-a-wav".getBytes ++ good.drop(12))
    }
    val stereo = good.clone(); stereo(22) = 2
    intercept[IllegalArgumentException](Multimodal.decodeWav(stereo))
    intercept[IllegalArgumentException](Multimodal.decodeWav(good.dropRight(2)))
  }

  test("pcmWindowSigs: full-window rule, exact sig replay, shift aligns at nonzero delta") {
    val spark: SparkSession = SparkSession.builder()
      .master("local[4]").config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    import spark.implicits._
    implicit val cs: CacheScope = CacheScope.processOwned
    val base = samplesOf(5L, 70) // (70-32)/16+1 = 3 full windows
    val junk = Array.tabulate(16)(t => (t * 100 - 800).toShort)
    val recs = Seq(
      Multimodal.MediaRecord(1L, "audio", Multimodal.encodeWav(8000, base), "t"),
      Multimodal.MediaRecord(2L, "audio",
        Multimodal.encodeWav(8000, junk ++ base), "t"))
    val sigs = Multimodal.pcmWindowSigs(spark.createDataset(recs),
        windowSamples = 32, hop = 16)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    // full windows only: 3 for the base, (86-32)/16+1 = 4 for the copy
    assert(sigs.keys.count(_._1 == 1L) == 3 && sigs.keys.count(_._1 == 2L) == 4)
    // exact replay of window 0's weighted sum from the raw samples
    val expect0 = (0 until 32).map(i => base(i).toLong * (1 + i)).sum
    assert(sigs((1L, 0)) == expect0, "sig formula diverged from the samples")
    // shift compatibility: copy window k+1 equals base window k
    (0 until 3).foreach(k => assert(sigs((2L, k + 1)) == sigs((1L, k)),
      s"window $k did not survive the 16-sample shift"))
    // ...and the alignment join finds the pair at the SHIFT delta
    val pairs = Multimodal.landmarkAlignPairs(
        Multimodal.pcmWindowSigs(spark.createDataset(recs), 32, 16),
        minAligned = 3, maxSigDf = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3)))
    assert(pairs.toSeq == Seq((1L, 2L, -1, 3L)),
      s"shifted pair must align at delta -1 on 3 windows: ${pairs.toSeq}")
  }

  test("WavCodec features: duration from the parsed rate, position-weighted checksum") {
    val s = samplesOf(7L, 48)
    val r = Multimodal.MediaRecord(7L, "audio",
      Multimodal.encodeWav(8000, s, junkChunk = true), "t")
    val f = Multimodal.WavCodec.decode(r)
    assert(f.channels == 1 && f.width == 0)
    assert(f.duration_ms == 48L * 1000 / 8000)
    assert(f.byte_size == r.content.length)
    val expected = s.zipWithIndex.map { case (v, i) => v.toLong * (1 + i) }.sum
    assert(f.checksum == expected)
    // order sensitivity: reversing the samples must change the checksum
    val rev = Multimodal.MediaRecord(7L, "audio",
      Multimodal.encodeWav(8000, s.reverse), "t")
    assert(Multimodal.WavCodec.decode(rev).checksum != f.checksum)
  }

  test("wavDataOffset column walk: 44 plain, 64 past a JUNK chunk, null past depth") {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.ui.enabled", "false").getOrCreate()
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val s = samplesOf(3L, 16)
    val rows = Seq(
      (1L, Multimodal.encodeWav(8000, s)),
      (2L, Multimodal.encodeWav(8000, s, junkChunk = true)))
      .toDF("id", "content")
    val offs = rows.select(col("id"),
        Multimodal.WavCodec.wavDataOffset(col("content")).as("off"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(offs == Map(1L -> 44L, 2L -> 64L))
    // depth exhausted → null, not a silent header-window
    val shallow = rows.filter(col("id") === 2L)
      .select(Multimodal.WavCodec.wavDataOffset(col("content"), maxChunks = 2))
      .head()
    assert(shallow.isNullAt(0), "beyond-depth walk must be null")
  }

  test("G.711 μ-law: ITU reference points and the round-trip law") {
    // spec anchors: both zero codes decode to 0, the extremes to ±32124
    assert(Multimodal.mulawDecode(0xFF) == 0)
    assert(Multimodal.mulawDecode(0x7F) == 0)
    assert(Multimodal.mulawDecode(0x80) == 32124)
    assert(Multimodal.mulawDecode(0x00) == -32124)
    assert(Multimodal.mulawEncode(0) == 0xFF)
    // decode ∘ encode ∘ decode = decode, over the whole code space
    for (c <- 0 until 256) {
      val s = Multimodal.mulawDecode(c)
      assert(Multimodal.mulawDecode(Multimodal.mulawEncode(s)) == s,
        s"round-trip broke at code $c (sample $s)")
    }
    // the +132 bias makes encode a ROUNDING quantizer on the first
    // 8-wide step: |s| ≤ 3 rounds to 0, |s| ≥ 4 rounds to ±8 and
    // keeps its sign
    for (s <- Seq(1, 3, -3))
      assert(Multimodal.mulawDecode(Multimodal.mulawEncode(s)) == 0,
        s"|s|<=3 must round to 0, broke at $s")
    for (s <- Seq(4, 8, 100, 5000, 32124, -32124, -100, -4))
      assert(Multimodal.mulawDecode(Multimodal.mulawEncode(s)).sign == s.sign,
        s"sign lost at $s")
  }

  test("decodeWavExpanded dispatches on the fmt tag; strict decode refuses μ-law") {
    val pcm = samplesOf(5L, 50)
    val pcmBytes = Multimodal.encodeWav(8000, pcm, junkChunk = true)
    // PCM path: expanded decode ≡ strict decode
    val (r1, s1) = Multimodal.decodeWavExpanded(pcmBytes)
    val (r2, s2) = Multimodal.decodeWav(pcmBytes)
    assert(r1 == r2 && s1.toSeq == s2.toSeq)
    // μ-law path: expansion matches mulawDecode per code; odd count
    // exercises the RIFF pad byte
    val codes = Array.tabulate(41)(i => ((37 * i + 11) % 256).toByte)
    val mu = Multimodal.encodeWavMulaw(8000, codes, junkChunk = true)
    assert(mu.length == 44 + 20 + 41 + 1, "odd data chunk must be padded")
    val (r3, s3) = Multimodal.decodeWavExpanded(mu)
    assert(r3 == 8000 && s3.length == 41)
    for (i <- codes.indices)
      assert(s3(i) == Multimodal.mulawDecode(codes(i) & 0xFF).toShort,
        s"expansion diverged at sample $i")
    // the strict 16-bit decoder fails LOUDLY on format 7
    assertThrows[IllegalArgumentException](Multimodal.decodeWav(mu))
  }

  test("decodeWavExpanded survives fmt-after-data chunk order") {
    // legal RIFF: data before fmt. Hand-build it: RIFF hdr, data, fmt.
    val codes = Array.tabulate(8)(i => (40 * i + 3).toByte)
    val canonical = Multimodal.encodeWavMulaw(8000, codes)
    val (_, want) = Multimodal.decodeWavExpanded(canonical)
    val out = new java.io.ByteArrayOutputStream()
    out.write(canonical, 0, 12)            // RIFF....WAVE
    out.write(canonical, 36, 8 + 8)        // data chunk (8 hdr + 8 codes)
    out.write(canonical, 12, 24)           // fmt chunk
    val swapped = out.toByteArray
    val (rate, got) = Multimodal.decodeWavExpanded(swapped)
    assert(rate == 8000 && got.toSeq == want.toSeq,
      "chunk order changed the decode")
  }

  test("blockBit block 0 is PCM-aligned: identical samples give identical bits across layouts") {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.ui.enabled", "false").getOrCreate()
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, lit}
    val s = samplesOf(11L, 64)
    val rows = Seq(
      (1L, Multimodal.encodeWav(8000, s)),
      (2L, Multimodal.encodeWav(8000, s, junkChunk = true)))
      .toDF("id", "content")
    val bits = rows.select(col("id"),
        Multimodal.WavCodec.blockBit(col("content"), lit(0L), 16).as("b0"),
        Multimodal.WavCodec.blockBit(col("content"), lit(3L), 16).as("b3"))
      .collect().map(r => r.getLong(0) -> (r.getBoolean(1), r.getBoolean(2))).toMap
    assert(bits(1L) == bits(2L),
      "a JUNK chunk shifted the feature windows: blockBit is not sample-aligned")
    // replay block 0's bit from the raw sample bytes (LE pairs)
    val sum0 = (0 until 8).map { i =>
      (s(i) & 0xFF) + ((s(i) >> 8) & 0xFF)
    }.sum
    assert(bits(1L)._1 == (sum0 >= 16 * 128), "block-0 bit diverged from samples")
  }
}
