package graft.operators

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
}
