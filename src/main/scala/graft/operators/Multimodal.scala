package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoder, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video payloads as opaque
  * `binary` columns with typed metadata, processed per-partition in
  * batches.
  *
  * The Spark-side machinery — schema, partition-batched iteration, typed
  * encoders, metadata structs — is real and tested. The *codec* step
  * (actual JPEG/WAV/MP4 decoding) is STUBBED with a deterministic fake
  * (this container has no image/audio libraries), injected through the
  * [[MediaCodec]] trait with [[StubCodec]] as the default: a real
  * deployment implements the trait once and passes it to the operators
  * — the distribution, batching, schema, and join/aggregation plans
  * are unchanged (spec-proven by running a non-default codec through
  * the same operators).
  *
  * Why Scala-native rather than `mapInPandas`: the batch contract here
  * (per-partition iterator of fixed-size record batches in, feature
  * batches out) is exactly the `mapInPandas` shape, but staying on the
  * JVM keeps the typed encoders, avoids the Python-worker serialization
  * round-trip for the (dominant) payload bytes, and is testable in this
  * container (no pyspark on the library side). A deployment whose codec
  * only exists in Python swaps [[processBatches]] for `mapInPandas`
  * with the same schema and batch size — no other operator changes.
  */
object Multimodal {

  /** Typed media record: payload + envelope metadata. */
  final case class MediaRecord(
      media_id: Long,
      kind: String,          // "image" | "audio" | "video"
      content: Array[Byte],
      source: String)

  final case class MediaFeatures(
      media_id: Long,
      kind: String,
      byte_size: Long,
      width: Int,            // image/video; 0 for audio
      height: Int,
      channels: Int,
      duration_ms: Long,     // audio/video; 0 for image
      checksum: Long)        // content hash for dedup joins

  val mediaSchema: StructType = Encoders.product[MediaRecord].schema
  val featureSchema: StructType = Encoders.product[MediaFeatures].schema

  /** The codec injection point: everything that TOUCHES media bytes,
    * separated from the distribution/plan machinery that moves them.
    * A real deployment implements this once (JPEG/WAV/MP4 decoding,
    * an encoder model, decoded-pixel block luma, decoded-frame
    * signatures) and passes it to the operators below — every plan
    * (batching, explodes, banded joins, aggregations) is unchanged,
    * which is what keeps the m01-m03 oracle gates meaningful for a
    * real codec.
    *
    * Two hook shapes on purpose: row-level functions ([[decode]],
    * [[embed]]) run inside the partition-batched `mapPartitions`
    * contract where a real codec amortizes init per batch; COLUMN-
    * level hooks ([[blockBit]], [[frameSig]]) keep the perceptual-hash
    * and frame-signature plans fully declarative — a real codec
    * supplies its own expression (typically a compiled Catalyst
    * expression or, at worst, a UDF column) without altering the
    * explode → feature → aggregate shape around it.
    */
  trait MediaCodec extends Serializable {
    /** Parse container metadata + content checksum for one record. */
    def decode(r: MediaRecord): MediaFeatures
    /** Fixed-dim embedding of one record (encoder model in real life). */
    def embed(r: MediaRecord, dim: Int): Array[Float]
    /** Binary feature of the payload's `block`-th `blockBytes`-byte
      * window ("block luma above the mean" in a real aHash).
      */
    def blockBit(content: Column, block: Column, blockBytes: Int): Column
    /** Content signature of the frame at `byteOffset` (decoded-pixel
      * hash in real life).
      */
    def frameSig(content: Column, byteOffset: Column, stride: Int): Column
  }

  /** ═══ STUB ═══ the in-container default codec: deterministic fakes
    * (no media libraries here) with the exact signatures a real codec
    * implements — see [[decodeStub]]/[[embedStub]] and the expression
    * bodies for what each fake derives.
    */
  object StubCodec extends MediaCodec {
    def decode(r: MediaRecord): MediaFeatures = decodeStub(r)
    def embed(r: MediaRecord, dim: Int): Array[Float] = embedStub(r, dim)._2
    // high leading md5 nibble of the raw byte window — deterministic
    // stand-in for "block luma above the mean" over decoded pixels
    def blockBit(content: Column, block: Column, blockBytes: Int): Column =
      conv(substring(md5(
          substring(content, block * blockBytes + 1, lit(blockBytes))), 1, 1),
        16, 10).cast(IntegerType) >= 8
    // md5 of the raw byte window standing in for a decoded-frame hash
    def frameSig(content: Column, byteOffset: Column, stride: Int): Column =
      md5(substring(content, byteOffset + 1, lit(stride)))
  }

  /** Wrap a text table as fake media payloads (test/demo corpus): the
    * document bytes become the "image" content. Deterministic.
    */
  def syntheticMedia(docs: DataFrame, idCol: String, textCol: String,
      sourceCol: String): Dataset[MediaRecord] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(
        col(idCol).cast(LongType).as("media_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (pmod(col(idCol), lit(3)) + 1).cast(IntegerType)).as("kind"),
        encode(col(textCol), "UTF-8").as("content"),
        col(sourceCol).as("source"))
      .as[MediaRecord]
  }

  /** ═══ STUB ═══ deterministic fake decode: derives plausible media
    * dimensions arithmetically from the byte payload. A real
    * implementation would parse the container format here.
    */
  def decodeStub(r: MediaRecord): MediaFeatures = {
    val n = r.content.length.toLong
    // cheap rolling checksum over the bytes (deterministic, order-aware)
    var h = 1125899906842597L
    var i = 0
    while (i < r.content.length) { h = 31 * h + r.content(i); i += 1 }
    r.kind match {
      case "image" =>
        MediaFeatures(r.media_id, r.kind, n,
          width = (64 + n % 577).toInt, height = (64 + n % 419).toInt,
          channels = 3, duration_ms = 0L, checksum = h)
      case "audio" =>
        MediaFeatures(r.media_id, r.kind, n,
          width = 0, height = 0, channels = 2,
          duration_ms = n * 8, checksum = h)
      case _ =>
        MediaFeatures(r.media_id, r.kind, n,
          width = (64 + n % 577).toInt, height = (64 + n % 419).toInt,
          channels = 3, duration_ms = n * 40, checksum = h)
    }
  }

  /** Partition-batched feature extraction: the Scala analogue of the
    * arrow-batched UDF pattern — the codec fn sees one batch (partition
    * iterator chunk) at a time, so a real decoder can amortize model/
    * codec init per batch instead of per row.
    */
  def processBatches(
      media: Dataset[MediaRecord],
      batchSize: Int = 64,
      codec: MediaCodec = StubCodec): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // per-batch init hook would go here (codec/session setup)
        batch.iterator.map(codec.decode)
      }
    }
  }

  /** ═══ STUB ═══ resize planning: target dimensions preserving aspect
    * ratio, capped at `maxDim` (a real impl would transform pixels; the
    * dimension arithmetic and schema are the real contract).
    */
  def resizePlan(features: Dataset[MediaFeatures], maxDim: Int): DataFrame = {
    features.toDF()
      .filter(col("width") > 0)
      .withColumn("__scale",
        when(greatest(col("width"), col("height")) <= maxDim, lit(1.0))
          .otherwise(lit(maxDim.toDouble) / greatest(col("width"), col("height"))))
      .select(col("media_id"), col("width"), col("height"),
        floor(col("width") * col("__scale")).cast("int").as("target_width"),
        floor(col("height") * col("__scale")).cast("int").as("target_height"))
  }

  /** ═══ STUB ═══ feature extraction: a deterministic pseudo-embedding
    * derived from the payload bytes (a real impl runs an encoder model
    * per batch). Output plugs straight into [[VectorSearch]]:
    * (media_id, embedding: Array[Float]).
    */
  def embedStub(r: MediaRecord, dim: Int = 16): (Long, Array[Float]) = {
    val vec = new Array[Float](dim)
    var h = 0x9E3779B97F4A7C15L * (r.media_id + 1)
    var i = 0
    while (i < r.content.length) { h = 31 * h + r.content(i); i += 1 }
    i = 0
    while (i < dim) {
      h = h * 6364136223846793005L + 1442695040888963407L
      vec(i) = ((h >>> 40).toInt / 8388608.0f) - 1.0f // [-1, 1)
      i += 1
    }
    (r.media_id, vec)
  }

  /** Batched embedding extraction (same partition-batch shape as
    * [[processBatches]]).
    */
  def embedBatches(media: Dataset[MediaRecord], dim: Int = 16,
      codec: MediaCodec = StubCodec): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions(_.grouped(64).flatMap(
        _.iterator.map(r => (r.media_id, codec.embed(r, dim)))))
      .toDF("media_id", "embedding")
  }

  /** Frame sampling for "video" payloads: every `stride`-th byte window
    * stands in for a frame (STUB — a real impl samples decoded frames).
    * Demonstrates the explode-to-frames schema: one row per sampled frame.
    */
  def sampleFrames(media: Dataset[MediaRecord], stride: Int = 1000,
      maxFrames: Int = 8): DataFrame = {
    media.toDF()
      .filter(col("kind") === "video" && length(col("content")) > 0)
      .select(col("media_id"),
        posexplode(slice(
          sequence(lit(0), ((length(col("content")) - 1) / stride).cast(IntegerType)),
          1, maxFrames)))
      .select(col("media_id"), col("pos").as("frame_no"),
        (col("col") * stride).as("byte_offset"))
  }

  /** Per-frame content signatures: md5 of each sampled frame's byte
    * window — the dedup key space for video near-dup. (With a real
    * decoder the hash would cover decoded pixels; the byte-window STUB
    * keeps the join/aggregation shape identical.)
    */
  def frameSignatures(media: Dataset[MediaRecord], stride: Int = 1000,
      maxFrames: Int = 8, codec: MediaCodec = StubCodec): DataFrame =
    sampleFrames(media, stride, maxFrames)
      .join(media.toDF().select(col("media_id"), col("content")), "media_id")
      .select(col("media_id"), col("frame_no"),
        codec.frameSig(col("content"), col("byte_offset"), stride).as("frame_sig"))

  /** ═══ STUB ═══ 60-bit perceptual hash for "image" payloads: bit `b`
    * is a binary feature of the payload's b-th fixed `blockBytes`-byte
    * window (high leading md5 nibble — a deterministic stand-in for
    * "block luma above the mean"; a real aHash/pHash downsamples
    * decoded pixels to an 8×8 grid, but the hash width, the per-block
    * independence, and every downstream join are identical). 60 bits
    * (not 64) keeps the value clear of the sign bit so `1 << b` is
    * portable arithmetic on both engines — the repo's md5-60
    * convention. Images shorter than `b·blockBytes` leave bit b at 0
    * on both engines.
    *
    * Declarative end-to-end: block fan-out is a sequence explode, the
    * bit is codegen'd md5/substring arithmetic, the hash one map-side-
    * combined sum — no UDF, no driver loop.
    */
  def perceptualHashes(media: Dataset[MediaRecord], blockBytes: Int = 16,
      codec: MediaCodec = StubCodec): DataFrame =
    media.toDF()
      .filter(col("kind") === "image" && length(col("content")) > 0)
      .select(col("media_id"), col("content"),
        posexplode(sequence(lit(0),
          least(lit(59), ((length(col("content")) - 1) / blockBytes)
            .cast(IntegerType)))).as(Seq("__p", "block")))
      .select(col("media_id"), col("block"),
        codec.blockBit(col("content"), col("block"), blockBytes).as("bit"))
      .groupBy(col("media_id"))
      .agg(sum(when(col("bit"), expr("shiftleft(cast(1 as bigint), block)"))
        .otherwise(0L)).as("phash"))

  /** Near-dup images: pairs within hamming distance `maxHamming` of
    * their perceptual hashes, found by banded chunk collision (4 chunks
    * of 15 bits — pigeonhole: ≤ 3 differing bits cannot touch all 4
    * chunks), never all-pairs; the exact popcount filter runs on
    * colliding candidates only. Same banding scheme as the SimHash text
    * path ([[TextDedup.simhashPairs]]) — near-dup detection over ANY
    * 64-bit-signature modality reduces to this join.
    */
  def imageNearDupPairs(media: Dataset[MediaRecord], blockBytes: Int = 16,
      maxHamming: Int = 3, codec: MediaCodec = StubCodec)(
      implicit cs: CacheScope): DataFrame = {
    // persist the (tiny: id + one long) hash relation before the banded
    // self-join — each side would otherwise re-hash every image
    // (self-join sides compute independently; measured, CcPlanCheck)
    val hashes = cs.persist(perceptualHashes(media, blockBytes, codec))
    val chunkBits = 15
    val mask = (1L << chunkBits) - 1
    val chunks = hashes.select(col("media_id"), col("phash"),
      explode(array((0 until 4).map(c =>
        struct(lit(c).as("chunk"),
          shiftright(col("phash"), c * chunkBits).bitwiseAND(mask).as("ckey"))): _*)).as("ck"))
      .select(col("media_id"), col("phash"),
        col("ck.chunk").as("chunk"), col("ck.ckey").as("ckey"))
    chunks.as("a").join(chunks.as("b"),
        col("a.chunk") === col("b.chunk") &&
        col("a.ckey") === col("b.ckey") &&
        col("a.media_id") < col("b.media_id"))
      .select(col("a.media_id").as("id_a"), col("b.media_id").as("id_b"),
        bit_count(col("a.phash").bitwiseXOR(col("b.phash"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Overlapping-window fingerprints for "audio" payloads: one signature
    * per `windowBytes`-byte window every `hop` bytes (hop < windowBytes ⇒
    * overlap), ≤ `maxWins` windows per payload. The codec supplies the
    * window signature ([[MediaCodec.frameSig]] — a spectral landmark
    * hash in real life; the md5 byte-window STUB keeps the shape).
    * Window fan-out is an explode of (id, win_no, offset) only; payload
    * bytes join back once per window row, never ride the explode.
    */
  def audioFingerprints(media: Dataset[MediaRecord], windowBytes: Int = 32,
      hop: Int = 16, maxWins: Int = 16, codec: MediaCodec = StubCodec): DataFrame =
    media.toDF()
      .filter(col("kind") === "audio" && length(col("content")) > 0)
      .select(col("media_id"),
        posexplode(slice(
          sequence(lit(0), ((length(col("content")) - 1) / hop).cast(IntegerType)),
          1, maxWins)).as(Seq("__p", "win_no")))
      .select(col("media_id"), col("win_no"),
        (col("win_no") * hop).as("byte_offset"))
      .join(media.toDF().select(col("media_id"), col("content")), "media_id")
      .select(col("media_id"), col("win_no"),
        codec.frameSig(col("content"), col("byte_offset"), windowBytes).as("sig"))

  /** Shift-invariant audio near-dup — the landmark-ALIGNMENT shape
    * (Shazam/chromaprint): two audios match when ≥ `least(minAligned,
    * wins_a, wins_b)` fingerprints agree at ONE CONSISTENT window
    * offset delta. Unlike the video path ([[videoNearDupPairs]]), which
    * requires same-POSITION agreement, this pairs a clip with a copy
    * embedded at any hop-aligned offset (ads cut into streams, silence
    * padding, re-muxed intros): fingerprints join on the signature
    * ALONE, the (id_a, id_b, delta = win_a − win_b) aggregate counts
    * each candidate alignment, and the best delta per pair (most
    * matches, ties to the lower delta) is kept. Output: one row per
    * near-dup pair — (id_a, id_b, offset_delta, aligned_matches).
    *
    * Scale shape: ONE shuffle of the (id, win_no, sig) relation on sig
    * for the match join — payloads never move. The df cap (`maxSigDf`)
    * is the skew guard: a landmark shared by s windows would emit s²
    * match rows (digital silence, encoder padding — the classic hot
    * key), so signatures with df > maxSigDf are dropped BEFORE the join
    * on both sides, the standard over-common-landmark cut in audio
    * matching (documented approximation: matches riding only on
    * over-common windows are lost — by design, on both engines). The
    * per-pair best-delta window ranks ≤ 2·maxWins−1 delta rows per
    * pair, partitioned by the pair key — never a global sort.
    */
  def audioNearDupPairs(media: Dataset[MediaRecord], windowBytes: Int = 32,
      hop: Int = 16, maxWins: Int = 16, minAligned: Int = 4,
      maxSigDf: Int = 64, codec: MediaCodec = StubCodec)(
      implicit cs: CacheScope): DataFrame = {
    require(hop > 0 && windowBytes > 0 && maxWins > 0)
    landmarkAlignPairs(
      audioFingerprints(media, windowBytes, hop, maxWins, codec),
      minAligned, maxSigDf)
  }

  /** The landmark-ALIGNMENT join on any (media_id, win_no, sig)
    * fingerprint relation — extracted from [[audioNearDupPairs]] so
    * the m04 container-byte path and the m08 decoded-PCM path share
    * one implementation of the df cap, the delta-consistent count,
    * and the shorter-clip bound.
    */
  def landmarkAlignPairs(raw: DataFrame, minAligned: Int = 4,
      maxSigDf: Int = 64)(implicit cs: CacheScope): DataFrame = {
    require(minAligned > 0 && maxSigDf > 0)
    val dfreq = raw.groupBy(col("sig")).agg(count(lit(1)).as("__df"))
    // persisted: both self-join sides + the per-audio counts read it
    // (self-join sides compute independently; measured, CcPlanCheck)
    val f = cs.persist(raw.join(dfreq.filter(col("__df") <= maxSigDf), "sig")
      .select(col("media_id"), col("win_no"), col("sig")))
    val counts = f.groupBy(col("media_id")).agg(count(lit(1)).as("__nw"))
    val aligned = f.as("a").join(f.as("b"),
        col("a.sig") === col("b.sig") &&
        col("a.media_id") < col("b.media_id"))
      .select(col("a.media_id").as("id_a"), col("b.media_id").as("id_b"),
        (col("a.win_no") - col("b.win_no")).as("offset_delta"))
      .groupBy(col("id_a"), col("id_b"), col("offset_delta"))
      .agg(count(lit(1)).as("aligned_matches"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id_a"), col("id_b"))
      .orderBy(col("aligned_matches").desc, col("offset_delta").asc)
    aligned.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .join(counts.select(col("media_id").as("id_a"), col("__nw").as("__nw_a")), "id_a")
      .join(counts.select(col("media_id").as("id_b"), col("__nw").as("__nw_b")), "id_b")
      .filter(col("aligned_matches") >=
        least(lit(minAligned.toLong), col("__nw_a"), col("__nw_b")))
      .select(col("id_a"), col("id_b"), col("offset_delta"),
        col("aligned_matches"))
  }

  /** Landmark fingerprints from REAL DECODED PCM: overlapping
    * `windowSamples`-sample windows every `hop` samples (full windows
    * only — a truncated tail window would hash differently on a
    * sample-shifted copy and break alignment), signature = the
    * position-weighted sample sum Σ s_i·(1+i) over the window — an
    * exact integer the oracle replays from the sample formula, unlike
    * an md5 over container bytes DuckDB cannot rebuild. Weighting
    * within the window makes the signature discriminative (a plain
    * sum would collide permutations) while staying shift-COMPATIBLE:
    * the same samples at a different window index produce the same
    * signature, which is exactly what delta-consistent alignment
    * needs.
    */
  def pcmWindowSigs(media: Dataset[MediaRecord],
      windowSamples: Int = 32, hop: Int = 16): DataFrame = {
    require(windowSamples > 0 && hop > 0)
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions(_.flatMap { r =>
      val (_, samples) = decodeWav(r.content)
      val nWins = if (samples.length < windowSamples) 0
        else (samples.length - windowSamples) / hop + 1
      (0 until nWins).iterator.map { w =>
        var sig = 0L
        var i = 0
        while (i < windowSamples) {
          sig += samples(w * hop + i).toLong * (1 + i)
          i += 1
        }
        (r.media_id, w, sig)
      }
    }).toDF("media_id", "win_no", "sig")
  }

  /** Near-dup videos: pairs agreeing on ≥ `least(minShared, frames_a,
    * frames_b)` same-position frame signatures — the bound shrinks to
    * the shorter video's frame count so byte-identical SHORT videos
    * (fewer than `minShared` sampled frames) still pair. One shuffle on
    * (frame_no, signature) — videos only meet where frames collide,
    * never all-pairs.
    */
  def videoNearDupPairs(media: Dataset[MediaRecord], stride: Int = 1000,
      maxFrames: Int = 8, minShared: Int = 4,
      codec: MediaCodec = StubCodec)(implicit cs: CacheScope): DataFrame =
    samePositionPairs(frameSignatures(media, stride, maxFrames, codec),
      minShared)

  /** The same-POSITION near-dup join on any (media_id, frame_no,
    * frame_sig) relation — extracted from [[videoNearDupPairs]] so the
    * m02 container-byte path and the m10 decoded-Y-plane path
    * ([[y4mFrameSigs]]) share one implementation of the positional
    * equi-join, the shared count, and the shorter-video bound.
    */
  def samePositionPairs(sigs: DataFrame, minShared: Int = 4)(
      implicit cs: CacheScope): DataFrame = {
    // three references below (both join sides + the per-video counts):
    // uncached, each would re-run the signature pipeline
    val f = cs.persist(sigs)
    val counts = f.groupBy(col("media_id")).agg(count(lit(1)).as("__nf"))
    f.as("a").join(f.as("b"),
        col("a.frame_no") === col("b.frame_no") &&
        col("a.frame_sig") === col("b.frame_sig") &&
        col("a.media_id") < col("b.media_id"))
      .groupBy(col("a.media_id").as("id_a"), col("b.media_id").as("id_b"))
      .agg(count(lit(1)).as("shared_frames"))
      .join(counts.select(col("media_id").as("id_a"), col("__nf").as("__nf_a")), "id_a")
      .join(counts.select(col("media_id").as("id_b"), col("__nf").as("__nf_b")), "id_b")
      .filter(col("shared_frames") >=
        least(lit(minShared), col("__nf_a"), col("__nf_b")))
      .select(col("id_a"), col("id_b"), col("shared_frames"))
  }

  // ── BMP: the one REAL pure-JVM codec behind the MediaCodec trait ────
  //
  // m01-m04 prove the distribution/plan machinery around a stubbed
  // decode; this closes the loop for one modality with zero native
  // deps: uncompressed 24-bit BMP (BITMAPFILEHEADER + BITMAPINFOHEADER,
  // bottom-up rows, 4-byte row padding — the format every platform
  // ships because it needs no codec library). Encode builds real
  // container bytes, decode parses them back header-first, and the
  // features come from DECODED PIXELS in display (top-down) order — a
  // decoder that ignores padding or row order produces a different
  // checksum, so the m05 oracle gate genuinely exercises the byte
  // layout, not just the plumbing around it.

  /** Row stride of a 24-bit BMP: 3 bytes/pixel padded to 4. */
  private def bmpRowSize(width: Int): Int = ((3 * width + 3) / 4) * 4

  private def putLe32(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = (v & 0xFF).toByte
    b(off + 1) = ((v >>> 8) & 0xFF).toByte
    b(off + 2) = ((v >>> 16) & 0xFF).toByte
    b(off + 3) = ((v >>> 24) & 0xFF).toByte
  }

  private def le32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xFF) | ((b(off + 1) & 0xFF) << 8) |
      ((b(off + 2) & 0xFF) << 16) | ((b(off + 3) & 0xFF) << 24)

  private def le16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xFF) | ((b(off + 1) & 0xFF) << 8)

  /** Encode a real 24-bit bottom-up BMP from a pixel function
    * `(x, y) → (r, g, b)` over DISPLAY coordinates (y=0 is the top
    * row; the encoder writes rows bottom-up and channels BGR, as the
    * format demands).
    */
  def encodeBmp(width: Int, height: Int,
      pixel: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    require(width > 0 && height > 0, s"degenerate BMP ${width}x$height")
    val rowSize = bmpRowSize(width)
    val imageSize = rowSize * height
    val fileSize = 54 + imageSize
    val out = new Array[Byte](fileSize) // zero-filled → padding bytes 0
    out(0) = 'B'; out(1) = 'M'
    putLe32(out, 2, fileSize)
    putLe32(out, 10, 54)          // pixel-data offset
    putLe32(out, 14, 40)          // BITMAPINFOHEADER size
    putLe32(out, 18, width)
    putLe32(out, 22, height)      // positive height = bottom-up rows
    out(26) = 1                   // planes
    out(28) = 24                  // bpp
    putLe32(out, 30, 0)           // BI_RGB (uncompressed)
    putLe32(out, 34, imageSize)
    var y = 0
    while (y < height) {
      val rowBase = 54 + (height - 1 - y) * rowSize // file rows bottom-up
      var x = 0
      while (x < width) {
        val (r, g, b) = pixel(x, y)
        val p = rowBase + 3 * x
        out(p) = b.toByte; out(p + 1) = g.toByte; out(p + 2) = r.toByte
        x += 1
      }
      y += 1
    }
    out
  }

  /** Decoded 24-bit pixels in display order: `(width, height, rgb)`
    * with `rgb(3*(y*width+x) + {0,1,2}) = r,g,b` of pixel (x, y).
    * Validates magic/bpp/compression and walks the padded bottom-up
    * rows — the parse a real consumer does, failing loudly on
    * anything but the uncompressed 24-bit layout it claims to read.
    */
  def decodeBmp(bytes: Array[Byte]): (Int, Int, Array[Byte]) = {
    require(bytes.length >= 54 && bytes(0) == 'B' && bytes(1) == 'M',
      "not a BMP payload")
    val off = le32(bytes, 10)
    val width = le32(bytes, 18)
    val height = le32(bytes, 22)
    require(le16(bytes, 28) == 24, s"unsupported bpp ${le16(bytes, 28)}")
    require(le32(bytes, 30) == 0, "unsupported compression (not BI_RGB)")
    require(width > 0 && height > 0, s"unsupported geometry ${width}x$height")
    val rowSize = bmpRowSize(width)
    require(bytes.length >= off + rowSize * height, "truncated pixel data")
    val rgb = new Array[Byte](3 * width * height)
    var y = 0
    while (y < height) {
      val rowBase = off + (height - 1 - y) * rowSize
      var x = 0
      while (x < width) {
        val p = rowBase + 3 * x
        val q = 3 * (y * width + x)
        rgb(q) = bytes(p + 2)     // R (file order is BGR)
        rgb(q + 1) = bytes(p + 1) // G
        rgb(q + 2) = bytes(p)     // B
        x += 1
      }
      y += 1
    }
    (width, height, rgb)
  }

  /** The REAL image codec: decode parses actual BMP bytes; features
    * derive from decoded pixels. `checksum` is the position-weighted
    * pixel sum Σ (r + 2g + 3b)·(1 + x + y·w) over display coordinates
    * — weighting by position makes it sensitive to row order and
    * padding (a plain sum would forgive a decoder that served the
    * image upside down), and it is integer arithmetic the m05 oracle
    * replays exactly. Non-image kinds delegate to the stub (one
    * modality real is the contract; audio/video codecs remain the
    * documented boundary).
    */
  object BmpCodec extends MediaCodec {
    def decode(r: MediaRecord): MediaFeatures =
      if (r.kind != "image") decodeStub(r)
      else {
        val (w, h, rgb) = decodeBmp(r.content)
        var sum = 0L
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val q = 3 * (y * w + x)
            sum += ((rgb(q) & 0xFF) + 2 * (rgb(q + 1) & 0xFF) +
              3 * (rgb(q + 2) & 0xFF)).toLong * (1 + x + y * w)
            x += 1
          }
          y += 1
        }
        MediaFeatures(r.media_id, r.kind, r.content.length.toLong,
          w, h, channels = 3, duration_ms = 0L, checksum = sum)
      }

    /** Mean decoded-pixel intensity per contiguous block — a real
      * (if crude) downsampled-luma embedding.
      */
    def embed(r: MediaRecord, dim: Int): Array[Float] =
      if (r.kind != "image") embedStub(r, dim)._2
      else {
        val (_, _, rgb) = decodeBmp(r.content)
        val out = new Array[Float](dim)
        val block = math.max(1, rgb.length / dim)
        var d = 0
        while (d < dim) {
          val from = d * block
          val to = math.min(rgb.length, from + block)
          var s = 0L; var i = from
          while (i < to) { s += rgb(i) & 0xFF; i += 1 }
          out(d) = if (to > from) s.toFloat / (to - from) / 255f else 0f
          d += 1
        }
        out
      }

    /** "Block brighter than mid-gray" over the REAL sample bytes: the
      * pixel-data offset is parsed from the header DECLARATIVELY
      * (little-endian u32 at byte 10, byte-swapped via per-byte hex),
      * the window sum is the codegen'd [[graft.functions.ByteSum]]
      * kernel — BMP samples are raw BGR, so the byte sum IS
      * proportional to mean intensity. Padding bytes inside a window
      * bias toward dark — a documented approximation a real aHash
      * resamples away; the hash width and banding are unchanged.
      */
    def blockBit(content: Column, block: Column, blockBytes: Int): Column = {
      val off = bmpPixelOffset(content)
      graft.functions.ByteSum(
        substring(content, (off + block * blockBytes + 1).cast(IntegerType),
          lit(blockBytes))) >= lit(blockBytes.toLong * 128)
    }

    /** Frame signature over real sample bytes (window offset past the
      * parsed header, md5 of the raw BGR run).
      */
    def frameSig(content: Column, byteOffset: Column, stride: Int): Column =
      md5(substring(content,
        (bmpPixelOffset(content) + byteOffset + 1).cast(IntegerType),
        lit(stride)))
  }

  /** The BMP pixel-data offset, parsed from the container header in
    * pure builtin columns: bytes 10-13 little-endian — each byte
    * hex'd separately and concatenated most-significant-first, then
    * one base-16 conv. Header parsing without leaving codegen.
    */
  def bmpPixelOffset(content: Column): Column =
    conv(concat(
        hex(substring(content, 14, 1)), hex(substring(content, 13, 1)),
        hex(substring(content, 12, 1)), hex(substring(content, 11, 1))),
      16, 10).cast(LongType)

  /** Integer box-filter downsample of a real 24-bit BMP by `factor`:
    * decode → average each factor×factor block per channel (floor
    * division — exact, oracle-replayable) → re-encode. Output geometry
    * is `w/factor × h/factor`; remainder columns/rows that don't fill
    * a block are CROPPED (the standard crop-to-multiple convention),
    * and crop is in DISPLAY coordinates — odd heights drop the bottom
    * display row, which lives at the START of the bottom-up pixel
    * array, so a resizer that averages file-order rows crops the wrong
    * row and mis-pairs every vertical neighborhood on those images.
    * The round trip (decode → integer resample → encode) is the
    * feature-extraction shape a real thumbnail/vision-preprocessing
    * pass runs; only the pixel math here is fixture-simple.
    */
  def resizeBmp(bytes: Array[Byte], factor: Int): Array[Byte] = {
    require(factor >= 1, s"bad resize factor $factor")
    val (w, h, rgb) = decodeBmp(bytes)
    val ow = w / factor
    val oh = h / factor
    require(ow > 0 && oh > 0, s"resize ${w}x$h by $factor is degenerate")
    val n = factor * factor
    encodeBmp(ow, oh, (xx, yy) => {
      var r = 0; var g = 0; var b = 0
      var dy = 0
      while (dy < factor) {
        var dx = 0
        while (dx < factor) {
          val q = 3 * ((yy * factor + dy) * w + (xx * factor + dx))
          r += rgb(q) & 0xFF
          g += rgb(q + 1) & 0xFF
          b += rgb(q + 2) & 0xFF
          dx += 1
        }
        dy += 1
      }
      (r / n, g / n, b / n)
    })
  }

  /** Dataset-level resize at the sanctioned codec boundary: image
    * payloads are decoded, box-filtered and re-encoded row-locally
    * (constant work per record — the map distributes like any other
    * narrow transformation, no shuffle); non-image kinds pass through
    * untouched. This is the "resize" stage of a multimodal training-
    * data pipeline: runs BEFORE near-dup/embedding passes to normalize
    * geometry, and its output is again a valid container every
    * downstream codec path accepts.
    */
  def resizeImages(media: Dataset[MediaRecord], factor: Int): Dataset[MediaRecord] = {
    implicit val enc: Encoder[MediaRecord] = Encoders.product[MediaRecord]
    media.map(r =>
      if (r.kind != "image") r
      else r.copy(content = resizeBmp(r.content, factor)))
  }

  // ── WAV: the REAL audio codec (RIFF chunk walk, 16-bit PCM) ─────────

  private def putLe16(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = (v & 0xFF).toByte
    b(off + 1) = ((v >>> 8) & 0xFF).toByte
  }

  private def putTag(b: Array[Byte], off: Int, tag: String): Unit = {
    var i = 0
    while (i < 4) { b(off + i) = tag.charAt(i).toByte; i += 1 }
  }

  /** Encode a real RIFF/WAVE container: 16-bit mono PCM. With
    * `junkChunk` a 12-byte JUNK chunk lands between `fmt ` and `data`
    * — legal RIFF that real files carry (padding, editor metadata), so
    * a decoder that hardcodes "samples start at byte 44" instead of
    * walking chunks reads garbage for exactly those payloads.
    */
  def encodeWav(sampleRate: Int, samples: Array[Short],
      junkChunk: Boolean = false): Array[Byte] = {
    require(sampleRate > 0 && samples.nonEmpty, "degenerate WAV")
    val junk = if (junkChunk) 20 else 0 // "JUNK" + size + 12 payload
    val dataBytes = 2 * samples.length
    val out = new Array[Byte](44 + junk + dataBytes)
    putTag(out, 0, "RIFF"); putLe32(out, 4, out.length - 8)
    putTag(out, 8, "WAVE")
    putTag(out, 12, "fmt "); putLe32(out, 16, 16)
    putLe16(out, 20, 1)                  // PCM
    putLe16(out, 22, 1)                  // mono
    putLe32(out, 24, sampleRate)
    putLe32(out, 28, sampleRate * 2)     // byte rate
    putLe16(out, 32, 2)                  // block align
    putLe16(out, 34, 16)                 // bits/sample
    var p = 36
    if (junkChunk) {
      putTag(out, p, "JUNK"); putLe32(out, p + 4, 12)
      p += 20 // 12 zero payload bytes
    }
    putTag(out, p, "data"); putLe32(out, p + 4, dataBytes)
    p += 8
    var i = 0
    while (i < samples.length) {
      putLe16(out, p + 2 * i, samples(i) & 0xFFFF)
      i += 1
    }
    out
  }

  /** Decode a RIFF/WAVE container by WALKING ITS CHUNKS (the parse a
    * real consumer does — `fmt ` and `data` can sit anywhere after the
    * WAVE tag, with odd-sized chunks padded to even per the RIFF
    * spec). 16-bit PCM mono only; anything else fails loudly.
    * Returns (sampleRate, samples) with samples in signed int16.
    */
  def decodeWav(bytes: Array[Byte]): (Int, Array[Short]) = {
    require(bytes.length >= 44, "truncated WAV")
    def tag(off: Int) = new String(bytes, off, 4, "US-ASCII")
    require(tag(0) == "RIFF" && tag(8) == "WAVE", "not a RIFF/WAVE payload")
    var p = 12
    var rate = -1
    var samples: Array[Short] = null
    while (p + 8 <= bytes.length && (rate < 0 || samples == null)) {
      val id = tag(p); val size = le32(bytes, p + 4)
      require(size >= 0 && p + 8 + size <= bytes.length,
        s"chunk $id overruns the payload")
      id match {
        case "fmt " =>
          // a 14-byte (WAVEFORMAT) or truncated fmt chunk would otherwise
          // be read past its declared boundary (ADVICE r13)
          require(size >= 16, s"short fmt chunk ($size)")
          require(le16(bytes, p + 8) == 1, "not PCM")
          require(le16(bytes, p + 10) == 1, "not mono")
          require(le16(bytes, p + 22) == 16, "not 16-bit")
          rate = le32(bytes, p + 12)
        case "data" =>
          require(size % 2 == 0, "odd PCM data size")
          samples = new Array[Short](size / 2)
          var i = 0
          while (i < samples.length) {
            samples(i) = (le16(bytes, p + 8 + 2 * i)).toShort
            i += 1
          }
        case _ => () // JUNK/LIST/etc — skip
      }
      p += 8 + size + (size & 1) // RIFF pads odd chunks
    }
    require(rate > 0, "no fmt chunk")
    require(samples != null, "no data chunk")
    (rate, samples)
  }

  /** Encode G.711 μ-law codes into a RIFF/WAVE container: fmt tag 7,
    * 8 bits/sample, block align 1 — one code byte per sample, the
    * telephony layout. An ODD sample count leaves an odd-sized data
    * chunk, which RIFF pads to even: the pad byte is in the container
    * but not the data size field, so readers that advance by the raw
    * size misparse any chunk after data (and byte_size oracles must
    * add the pad).
    */
  def encodeWavMulaw(sampleRate: Int, codes: Array[Byte],
      junkChunk: Boolean = false): Array[Byte] = {
    require(sampleRate > 0 && codes.nonEmpty, "degenerate WAV")
    val junk = if (junkChunk) 20 else 0
    val pad = codes.length & 1
    val out = new Array[Byte](44 + junk + codes.length + pad)
    putTag(out, 0, "RIFF"); putLe32(out, 4, out.length - 8)
    putTag(out, 8, "WAVE")
    putTag(out, 12, "fmt "); putLe32(out, 16, 16)
    putLe16(out, 20, 7)              // WAVE_FORMAT_MULAW
    putLe16(out, 22, 1)              // mono
    putLe32(out, 24, sampleRate)
    putLe32(out, 28, sampleRate)     // byte rate = rate (1 byte/sample)
    putLe16(out, 32, 1)              // block align
    putLe16(out, 34, 8)              // bits/sample
    var p = 36
    if (junkChunk) {
      putTag(out, p, "JUNK"); putLe32(out, p + 4, 12)
      p += 20
    }
    putTag(out, p, "data"); putLe32(out, p + 4, codes.length)
    System.arraycopy(codes, 0, out, p + 8, codes.length)
    out // trailing pad byte (if any) stays zero
  }

  /** G.711 μ-law expansion, exact ITU integer arithmetic: invert the
    * stored byte, split sign/exponent/mantissa, reconstruct the
    * biased magnitude `((mant·8 + 132) << exp) − 132`. Pure integer
    * CASE math — the m17 oracle replays it verbatim in SQL.
    */
  def mulawDecode(code: Int): Int = {
    val u = ~code & 0xFF
    val mag = (((u & 0x0F) << 3) + 0x84 << ((u >> 4) & 7)) - 0x84
    if ((u & 0x80) != 0) -mag else mag
  }

  /** G.711 μ-law compression (the encode direction, spec-pinned via
    * the round-trip law decode∘encode∘decode = decode).
    */
  def mulawEncode(sample: Int): Int = {
    val sign = if (sample < 0) 0x80 else 0
    val x = math.min(if (sample < 0) -sample else sample, 32635) + 0x84
    var exp = 7
    var mask = 0x4000
    while (exp > 0 && (x & mask) == 0) { exp -= 1; mask >>= 1 }
    ~(sign | (exp << 4) | ((x >> (exp + 3)) & 0x0F)) & 0xFF
  }

  /** The format-DISPATCHING wav decode: the same RIFF chunk walk as
    * [[decodeWav]], but fmt fields and raw data bytes are collected
    * FIRST and interpreted after the walk — chunk order cannot break
    * the dispatch (fmt after data is legal RIFF). Format 1/16-bit
    * returns PCM verbatim; format 7/8-bit expands each μ-law code
    * through [[mulawDecode]]. Anything else fails loudly, like every
    * decoder here.
    */
  def decodeWavExpanded(bytes: Array[Byte]): (Int, Array[Short]) = {
    require(bytes.length >= 44, "truncated WAV")
    def tag(off: Int) = new String(bytes, off, 4, "US-ASCII")
    require(tag(0) == "RIFF" && tag(8) == "WAVE", "not a RIFF/WAVE payload")
    var p = 12
    var fmt = -1; var bits = -1; var rate = -1
    var dataAt = -1; var dataLen = -1
    while (p + 8 <= bytes.length && (rate < 0 || dataAt < 0)) {
      val id = tag(p); val size = le32(bytes, p + 4)
      require(size >= 0 && p + 8 + size <= bytes.length,
        s"chunk $id overruns the payload")
      id match {
        case "fmt " =>
          require(size >= 16, s"short fmt chunk ($size)")
          fmt = le16(bytes, p + 8)
          require(le16(bytes, p + 10) == 1, "not mono")
          bits = le16(bytes, p + 22)
          rate = le32(bytes, p + 12)
        case "data" =>
          dataAt = p + 8; dataLen = size
        case _ => ()
      }
      p += 8 + size + (size & 1)
    }
    require(rate > 0, "no fmt chunk")
    require(dataAt >= 0, "no data chunk")
    (fmt, bits) match {
      case (1, 16) =>
        require(dataLen % 2 == 0, "odd PCM data size")
        val samples = new Array[Short](dataLen / 2)
        var i = 0
        while (i < samples.length) {
          samples(i) = le16(bytes, dataAt + 2 * i).toShort
          i += 1
        }
        (rate, samples)
      case (7, 8) =>
        val samples = new Array[Short](dataLen)
        var i = 0
        while (i < samples.length) {
          samples(i) = mulawDecode(bytes(dataAt + i) & 0xFF).toShort
          i += 1
        }
        (rate, samples)
      case other =>
        throw new IllegalArgumentException(s"unsupported wav encoding $other")
    }
  }

  /** The format-dispatching audio codec: PCM and G.711 μ-law payloads
    * through ONE decode ([[decodeWavExpanded]]), features over the
    * EXPANDED samples — so the fmt tag is load-bearing corpus-wide (a
    * reader assuming PCM turns μ-law bytes into noise and fails the
    * hash on half the corpus). Same checksum shape as [[WavCodec]].
    */
  object TelephonyCodec extends MediaCodec {
    def decode(r: MediaRecord): MediaFeatures =
      if (r.kind != "audio") decodeStub(r)
      else {
        val (rate, samples) = decodeWavExpanded(r.content)
        var sum = 0L
        var i = 0
        while (i < samples.length) {
          sum += samples(i).toLong * (1 + i)
          i += 1
        }
        MediaFeatures(r.media_id, r.kind, r.content.length.toLong,
          width = 0, height = 0, channels = 1,
          duration_ms = samples.length.toLong * 1000 / rate, checksum = sum)
      }

    def embed(r: MediaRecord, dim: Int): Array[Float] = WavCodec.embed(r, dim)

    def blockBit(content: Column, block: Column, blockBytes: Int): Column =
      WavCodec.blockBit(content, block, blockBytes)

    def frameSig(content: Column, byteOffset: Column, stride: Int): Column =
      WavCodec.frameSig(content, byteOffset, stride)
  }

  /** The REAL audio codec: decode walks actual RIFF chunks; features
    * derive from decoded PCM samples. `checksum` is the position-
    * weighted sample sum Σ s_i·(1+i) — sensitive to sample order and
    * to any header/offset misparse (a fixed-offset-44 reader fails on
    * the JUNK-chunk payloads), in integer arithmetic the m06 oracle
    * replays exactly. Non-audio kinds delegate to the stub.
    */
  object WavCodec extends MediaCodec {
    def decode(r: MediaRecord): MediaFeatures =
      if (r.kind != "audio") decodeStub(r)
      else {
        val (rate, samples) = decodeWav(r.content)
        var sum = 0L
        var i = 0
        while (i < samples.length) {
          sum += samples(i).toLong * (1 + i)
          i += 1
        }
        MediaFeatures(r.media_id, r.kind, r.content.length.toLong,
          width = 0, height = 0, channels = 1,
          duration_ms = samples.length.toLong * 1000 / rate,
          checksum = sum)
      }

    /** Block-mean |amplitude| per contiguous sample block. */
    def embed(r: MediaRecord, dim: Int): Array[Float] =
      if (r.kind != "audio") embedStub(r, dim)._2
      else {
        val (_, samples) = decodeWav(r.content)
        val out = new Array[Float](dim)
        val block = math.max(1, samples.length / dim)
        var d = 0
        while (d < dim) {
          val from = d * block
          val to = math.min(samples.length, from + block)
          var s = 0L; var i = from
          while (i < to) { s += math.abs(samples(i).toInt); i += 1 }
          out(d) = if (to > from) s.toFloat / (to - from) / 32768f else 0f
          d += 1
        }
        out
      }

    /** Little-endian u32 at 0-based byte `off`, in pure columns
      * (per-byte hex concatenated most-significant-first, one base-16
      * conv — the [[bmpPixelOffset]] technique generalized to a
      * column offset).
      */
    private def le32At(c: Column, off: Column): Column =
      conv(concat(
          hex(substring(c, (off + 4).cast(IntegerType), lit(1))),
          hex(substring(c, (off + 3).cast(IntegerType), lit(1))),
          hex(substring(c, (off + 2).cast(IntegerType), lit(1))),
          hex(substring(c, (off + 1).cast(IntegerType), lit(1)))),
        16, 10).cast(LongType)

    /** Declarative RIFF chunk walk to the `data` payload: from the
      * first chunk (byte 12) read each 8-byte chunk header — 4-byte
      * tag, le32 size — and step over non-`data` chunks (odd sizes
      * padded, per RIFF) up to `maxChunks` deep. A when-chain is a
      * BOUNDED walk by construction; depth 4 covers `fmt ` plus two
      * metadata chunks (JUNK/LIST/fact — more than real encoders put
      * before `data`). Beyond the depth the column is null, so a
      * downstream bit/signature is null rather than silently computed
      * over header bytes — the loud-failure contract, column-side.
      */
    def wavDataOffset(content: Column, maxChunks: Int = 4): Column = {
      val dataTag = lit("data".getBytes("US-ASCII"))
      def walk(off: Column, depth: Int): Column =
        if (depth == 0) lit(null).cast(LongType)
        else {
          val size = le32At(content, off + 4)
          when(substring(content, (off + 1).cast(IntegerType), lit(4)) === dataTag,
            off + 8)
            .otherwise(walk(off + 8 + size + size % 2, depth - 1))
        }
      walk(lit(12L), maxChunks)
    }

    /** "Block louder than the byte-sum midpoint" over the REAL PCM
      * bytes: the window starts at the [[wavDataOffset]]-parsed sample
      * data (block 0 is samples, never header — a JUNK chunk shifts
      * the offset, not the features), summed by the codegen'd
      * [[graft.functions.ByteSum]]. The bit itself stays the crude
      * byte-sum heuristic every codec's column hook uses; what the
      * parse guarantees is ALIGNMENT.
      */
    def blockBit(content: Column, block: Column, blockBytes: Int): Column =
      graft.functions.ByteSum(
        substring(content,
          (wavDataOffset(content) + block * blockBytes + 1).cast(IntegerType),
          lit(blockBytes))) >= lit(blockBytes.toLong * 128)

    def frameSig(content: Column, byteOffset: Column, stride: Int): Column =
      md5(substring(content,
        (wavDataOffset(content) + byteOffset + 1).cast(IntegerType),
        lit(stride)))
  }

  // ── Y4M: the REAL video codec (yuv4mpeg2 stream walk, planar YCbCr) ─
  //
  // The last stubbed modality (r13 verdict item 4): yuv4mpeg2 is the
  // uncompressed interchange format the ffmpeg/mjpegtools world speaks —
  // an ASCII stream header (`YUV4MPEG2 W… H… F… …\n`, parameters
  // space-separated in ANY order), then per frame an ASCII `FRAME`
  // marker line (optionally carrying its own parameters) followed by
  // raw planar YCbCr whose size depends on the header's colorspace tag.
  // Three codec-level traps make the parse load-bearing, like m06's
  // JUNK chunk: (1) the frame RATE header is honored (duration derives
  // from F, which varies per payload); (2) frame-data boundaries depend
  // on the C tag (C444 frames are twice the size of C420 — a reader
  // hardcoding 4:2:0 subsampling misreads every frame after the first);
  // (3) some FRAME marker lines carry parameters (a fixed 6-byte-stride
  // reader lands mid-plane).

  /** Bytes per frame of raw plane data for a parsed colorspace tag. */
  private def y4mFrameBytes(cs: String, w: Int, h: Int): Int = cs match {
    case "420jpeg" | "420mpeg2" | "420paldv" | "420" =>
      w * h + 2 * ((w + 1) / 2) * ((h + 1) / 2)
    case "444" => 3 * w * h
    case other => throw new IllegalArgumentException(
      s"unsupported colorspace C$other")
  }

  /** Encode a real yuv4mpeg2 stream: `nFrames` frames of `width`×
    * `height` at `fpsNum`/`fpsDen`, luma from `(frame, x, y) → Y` in
    * raster order, chroma planes filled deterministically (subsampled
    * 4:2:0 by default; full-resolution 4:4:4 with `c444`). Style knobs
    * exercise the format's legal variability: `cTagFirst` reorders the
    * header parameters (they are order-free per the spec), `headerX`
    * adds an application X parameter, and `frameX` puts parameters on
    * individual FRAME marker lines.
    */
  def encodeY4m(width: Int, height: Int, fpsNum: Int, fpsDen: Int,
      nFrames: Int, luma: (Int, Int, Int) => Int, c444: Boolean = false,
      cTagFirst: Boolean = false, headerX: Option[String] = None,
      frameX: Int => String = _ => ""): Array[Byte] = {
    require(width > 0 && height > 0 && fpsNum > 0 && fpsDen > 0 &&
      nFrames > 0, "degenerate Y4M")
    val cTag = if (c444) "C444" else "C420jpeg"
    val core = Seq(s"W$width", s"H$height", s"F$fpsNum:$fpsDen", "Ip", "A1:1")
    val tags = (if (cTagFirst) cTag +: core else core :+ cTag) ++ headerX
    val header = ("YUV4MPEG2" +: tags).mkString(" ") + "\n"
    val out = new java.io.ByteArrayOutputStream()
    out.write(header.getBytes("US-ASCII"))
    val (cw, ch) = if (c444) (width, height) else ((width + 1) / 2, (height + 1) / 2)
    var f = 0
    while (f < nFrames) {
      val xp = frameX(f)
      val marker = if (xp.isEmpty) "FRAME\n" else s"FRAME $xp\n"
      out.write(marker.getBytes("US-ASCII"))
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) { out.write(luma(f, x, y) & 0xFF); x += 1 }
        y += 1
      }
      // chroma planes: deterministic fill (features derive from luma;
      // the SIZES are what the decoder must honor per the C tag)
      var plane = 0
      while (plane < 2) {
        var cy = 0
        while (cy < ch) {
          var cx = 0
          while (cx < cw) {
            out.write((9 + plane + f + cx + 2 * cy) & 0xFF)
            cx += 1
          }
          cy += 1
        }
        plane += 1
      }
      f += 1
    }
    out.toByteArray
  }

  /** Decode a yuv4mpeg2 stream by PARSING ITS HEADERS (the walk a real
    * consumer does): the stream header's space-separated parameters in
    * any order (W/H/F required; C defaults to 420jpeg per the spec;
    * I/A/X skipped), then per frame a FRAME marker line — parameters
    * after the tag legal and skipped — followed by C-tag-sized plane
    * data. Returns (width, height, fpsNum, fpsDen, Y planes in raster
    * order, one per frame). 4:2:0 and 4:4:4 only; anything else fails
    * loudly.
    */
  def decodeY4m(bytes: Array[Byte]): (Int, Int, Int, Int, Vector[Array[Byte]]) = {
    def lineEnd(from: Int): Int = {
      var i = from
      while (i < bytes.length && bytes(i) != '\n') i += 1
      require(i < bytes.length, "unterminated Y4M header line")
      i
    }
    val hEnd = lineEnd(0)
    val header = new String(bytes, 0, hEnd, "US-ASCII")
    val parts = header.split(" ")
    require(parts.nonEmpty && parts(0) == "YUV4MPEG2", "not a Y4M payload")
    var w = -1; var h = -1; var num = -1; var den = -1
    var cs = "420jpeg"
    parts.iterator.drop(1).filter(_.nonEmpty).foreach { t =>
      (t.charAt(0), t.substring(1)) match {
        case ('W', v) => w = v.toInt
        case ('H', v) => h = v.toInt
        case ('F', v) =>
          val Array(n, d) = v.split(":", 2)
          num = n.toInt; den = d.toInt
        case ('C', v) => cs = v
        case _ => () // Ip/A/X — legal, irrelevant here
      }
    }
    require(w > 0 && h > 0, s"missing or bad geometry ${w}x$h")
    require(num > 0 && den > 0, "missing or bad frame rate")
    val frameBytes = y4mFrameBytes(cs, w, h)
    val frames = Vector.newBuilder[Array[Byte]]
    var p = hEnd + 1
    while (p < bytes.length) {
      val mEnd = lineEnd(p)
      val marker = new String(bytes, p, mEnd - p, "US-ASCII")
      require(marker == "FRAME" || marker.startsWith("FRAME "),
        s"bad frame marker '$marker'")
      p = mEnd + 1
      require(p + frameBytes <= bytes.length, "truncated frame data")
      frames += java.util.Arrays.copyOfRange(bytes, p, p + w * h)
      p += frameBytes
    }
    val fs = frames.result()
    require(fs.nonEmpty, "no frames")
    (w, h, num, den, fs)
  }

  /** The REAL video codec: decode walks actual yuv4mpeg2 headers;
    * features derive from decoded Y planes. `duration_ms` comes from
    * the parsed frame-rate header (nFrames·1000·den/num in integer
    * arithmetic — a decoder ignoring F fails on mixed-rate corpora)
    * and `checksum` is the position-AND-frame-weighted luma sum
    * Σ_f Σ_i y_i·(1 + i + f·w·h) — sensitive to frame order, frame
    * boundaries (a C-tag misparse shifts every later frame), and
    * raster order, in integer arithmetic the m09 oracle replays
    * exactly. Non-video kinds delegate to the stub.
    */
  object Y4mCodec extends MediaCodec {
    def decode(r: MediaRecord): MediaFeatures =
      if (r.kind != "video") decodeStub(r)
      else {
        val (w, h, num, den, frames) = decodeY4m(r.content)
        var sum = 0L
        var f = 0
        while (f < frames.length) {
          val plane = frames(f)
          val base = f.toLong * w * h
          var i = 0
          while (i < plane.length) {
            sum += (plane(i) & 0xFF).toLong * (1 + base + i)
            i += 1
          }
          f += 1
        }
        MediaFeatures(r.media_id, r.kind, r.content.length.toLong,
          w, h, channels = 3,
          duration_ms = frames.length.toLong * 1000 * den / num,
          checksum = sum)
      }

    /** Block-mean luma over the concatenated decoded Y planes. */
    def embed(r: MediaRecord, dim: Int): Array[Float] =
      if (r.kind != "video") embedStub(r, dim)._2
      else {
        val (_, _, _, _, frames) = decodeY4m(r.content)
        val ys = frames.toArray.flatten
        val out = new Array[Float](dim)
        val block = math.max(1, ys.length / dim)
        var d = 0
        while (d < dim) {
          val from = d * block
          val to = math.min(ys.length, from + block)
          var s = 0L; var i = from
          while (i < to) { s += ys(i) & 0xFF; i += 1 }
          out(d) = if (to > from) s.toFloat / (to - from) / 255f else 0f
          d += 1
        }
        out
      }

    /** Documented approximation for the COLUMN hooks, as in
      * [[WavCodec]]: windows over raw container bytes (the variable-
      * length ASCII headers have no cheap pure-column parse). The
      * row-level paths above — and [[y4mFrameSigs]] — decode properly.
      */
    def blockBit(content: Column, block: Column, blockBytes: Int): Column =
      graft.functions.ByteSum(
        substring(content, block * blockBytes + 1, lit(blockBytes))) >=
        lit(blockBytes.toLong * 128)

    def frameSig(content: Column, byteOffset: Column, stride: Int): Column =
      md5(substring(content, byteOffset + 1, lit(stride)))
  }

  /** Per-frame signatures from REAL DECODED Y planes: one row per
    * (media_id, frame_no), signature = the position-weighted luma sum
    * Σ y_i·(1+i) over the frame's raster-order plane — an exact
    * integer the m10 oracle replays from the pixel formula, unlike an
    * md5 over container bytes. Same-position near-dup join input
    * ([[samePositionPairs]]); the decode is the sanctioned row-level
    * codec boundary, as in [[pcmWindowSigs]].
    */
  def y4mFrameSigs(media: Dataset[MediaRecord]): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions(_.flatMap { r =>
      val (_, _, _, _, frames) = decodeY4m(r.content)
      frames.iterator.zipWithIndex.map { case (plane, f) =>
        var sig = 0L
        var i = 0
        while (i < plane.length) {
          sig += (plane(i) & 0xFF).toLong * (1 + i)
          i += 1
        }
        (r.media_id, f, sig)
      }
    }).toDF("media_id", "frame_no", "frame_sig")
  }

  /** Frame-sampling at a target rate — the temporal-downsample stage a
    * video training pipeline runs before per-frame feature extraction
    * ("take k frames per second, whatever the source rate"). Sample
    * instants are t_k = k/targetFps; the frame shown at t_k under the
    * PARSED rate header is floor(k·num/(den·targetFps)), emitted while
    * it exists — so a 30 fps source at target 15 keeps every second
    * frame, and a 10 fps source at target 15 emits some frames TWICE
    * (upsampling repeats the nearest-earlier frame: real resampler
    * semantics, and a cardinality trap for implementations that
    * ignore the F header or dedup by frame). One row per (media_id,
    * sample_no): the frame index, its source timestamp (ms, floor),
    * and the same position-weighted luma signature as
    * [[y4mFrameSigs]] from the decoded plane. Row-local decode at the
    * sanctioned codec boundary; constant work per record, no shuffle.
    */
  def sampleFramesAtRate(media: Dataset[MediaRecord], targetFps: Int): DataFrame = {
    require(targetFps > 0, s"bad target rate $targetFps")
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions(_.filter(_.kind == "video").flatMap { r =>
      val (_, _, num, den, frames) = decodeY4m(r.content)
      val n = frames.length
      val sigs = new Array[Long](n) // memoize: upsampling revisits frames
      java.util.Arrays.fill(sigs, -1L)
      def sig(f: Int): Long = {
        if (sigs(f) < 0) {
          val plane = frames(f)
          var s = 0L
          var i = 0
          while (i < plane.length) { s += (plane(i) & 0xFF).toLong * (1 + i); i += 1 }
          sigs(f) = s
        }
        sigs(f)
      }
      Iterator.from(0)
        .map(k => (k, (k.toLong * num / (den.toLong * targetFps)).toInt))
        .takeWhile(_._2 < n)
        .map { case (k, f) =>
          (r.media_id, k, f, f.toLong * 1000 * den / num, sig(f))
        }
    }).toDF("media_id", "sample_no", "frame_no", "frame_ts_ms", "frame_sig")
  }

  /** A corpus of REAL Y4M payloads, one per row of `docs`:
    * deterministic from the id alone — n = 2 + id%4 frames of 8×6
    * luma y(f,x,y) = (17·id + 5f + 3x + 7y) mod 256, with the format's
    * legal variability planted so every trap is live on a third of
    * the corpus each: id%3=0 → F25:1 C420jpeg canonical header;
    * id%3=1 → C444 (double-size frames) with the C tag REORDERED
    * before the geometry; id%3=2 → F30:1 with an X header parameter
    * and parameters on every odd FRAME marker line. Integer arithmetic
    * the m09 oracle replays in SQL, byte sizes included (the header
    * and marker lengths are fixed per class).
    */
  def y4mMedia(docs: DataFrame, idCol: String): Dataset[MediaRecord] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast(LongType)).as[Long].map { id =>
      val n = (2 + id % 4).toInt
      val c = (id % 3).toInt
      val num = c match { case 0 => 25; case 1 => 10; case _ => 30 }
      val bytes = encodeY4m(8, 6, num, 1, n,
        luma = (f, x, y) => ((17 * id + 5 * f + 3 * x + 7 * y) % 256).toInt,
        c444 = c == 1, cTagFirst = c == 1,
        headerX = if (c == 2) Some("Xgraft") else None,
        frameX = f => if (c == 2 && f % 2 == 1) "Xg" else "")
      MediaRecord(id, "video", bytes, "y4m-synth")
    }
  }

  /** Integer pixel-block features from REAL decoded BMP pixels: one
    * row per image, `array<int>` of per-block sample sums over the
    * DISPLAY-ORDER RGB stream — the integer-exact feature vector a
    * cross-modal index rider carries (w42). Exact integers (≤
    * blockBytes·255 per component) so similarity scoring via
    * [[graft.functions.IntDot]] replays bit-identically in the
    * oracle, unlike a float embedding. Fixed-geometry corpora only:
    * ragged vectors would poison the dot product downstream.
    */
  def bmpBlockSums(media: Dataset[MediaRecord], blockBytes: Int = 16): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions(_.map { r =>
      val (_, _, rgb) = decodeBmp(r.content)
      val n = (rgb.length + blockBytes - 1) / blockBytes
      val sums = Array.tabulate(n) { b =>
        var s = 0
        var i = b * blockBytes
        val to = math.min(rgb.length, i + blockBytes)
        while (i < to) { s += rgb(i) & 0xFF; i += 1 }
        s
      }
      (r.media_id, sums)
    }).toDF("id", "pixsums")
  }

  /** A corpus of REAL WAV payloads, one per row of `docs`:
    * deterministic PCM from the id alone —
    *   n = 40 + id%32 samples at 8 kHz,
    *   s_i = ((31·id + 7·i²) mod 65536) − 32768
    * — and every id ≡ 0 (mod 3) carries a JUNK chunk before `data`,
    * so the decoder's chunk walk is load-bearing for a third of the
    * corpus. Integer arithmetic the m06 oracle replays in SQL. The
    * row-local `map` is the ENCODE half of the codec boundary, as in
    * [[bmpMedia]].
    */
  /** Integer decimation of a real WAV by `factor`: decode, average
    * each run of `factor` consecutive samples (truncating integer
    * division — the exact arithmetic DuckDB's `//` replays, including
    * toward-zero on negative sums), re-encode at `rate/factor`.
    * Trailing samples that don't fill a block are cropped. The crude
    * box average is the honest cheap anti-alias (a plain every-k-th
    * pick would fold noise); the CONTRACT being pinned is the
    * round trip — chunk-walked decode (JUNK-bearing inputs keep their
    * samples), exact resample arithmetic, and a re-encoded container
    * whose rate header reflects the decimation.
    */
  def decimateWav(bytes: Array[Byte], factor: Int): Array[Byte] = {
    require(factor >= 1, s"bad decimation factor $factor")
    val (rate, samples) = decodeWav(bytes)
    require(rate % factor == 0, s"rate $rate not divisible by $factor")
    val outN = samples.length / factor
    require(outN > 0, s"decimating ${samples.length} samples by $factor is degenerate")
    val out = new Array[Short](outN)
    var i = 0
    while (i < outN) {
      var s = 0
      var j = 0
      while (j < factor) { s += samples(i * factor + j); j += 1 }
      out(i) = (s / factor).toShort
      i += 1
    }
    encodeWav(rate / factor, out)
  }

  /** Dataset-level audio decimation at the codec boundary — the
    * temporal counterpart of [[resizeImages]]: row-local decode →
    * resample → re-encode, non-audio kinds untouched, no shuffle.
    */
  def decimateAudio(media: Dataset[MediaRecord], factor: Int): Dataset[MediaRecord] = {
    implicit val enc: Encoder[MediaRecord] = Encoders.product[MediaRecord]
    media.map(r =>
      if (r.kind != "audio") r
      else r.copy(content = decimateWav(r.content, factor)))
  }

  def wavMedia(docs: DataFrame, idCol: String): Dataset[MediaRecord] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast(LongType)).as[Long].map { id =>
      val n = (40 + id % 32).toInt
      val samples = Array.tabulate(n)(i =>
        (((31 * id + 7L * i * i) % 65536) - 32768).toShort)
      MediaRecord(id, "audio",
        encodeWav(8000, samples, junkChunk = id % 3 == 0), "wav-synth")
    }
  }

  /** The seed-decorrelated fixture pixel formula shared by the
    * fixed-geometry BMP corpora (m07 near-dup, w42 cross-modal rider,
    * d59 cross-modal groups): per-channel linear terms plus a
    * seed×position CROSS term mod distinct primes — without the cross
    * term the formula is 256-periodic in the seed and seeds 256 apart
    * render IDENTICAL images (m07's measured ~8M-chance-pair failure).
    * Every oracle replays this arithmetic verbatim in SQL.
    */
  /** md5-scramble a raw fixture seed to a 32-bit value (first four
    * digest bytes of the seed's decimal string, big-endian) — replayed
    * in SQL as `CAST(('0x' || substr(md5(CAST(s AS VARCHAR)), 1, 8))
    * AS BIGINT)`. Needed wherever seed-derived images feed a GRAPH
    * operator: [[seedPixel]] is (deliberately cheap) modular
    * arithmetic, so nearby raw seeds render hamming-ADJACENT hashes —
    * fine for pair queries (m07's chance tail is linear and
    * oracle-matched) but fatal for connected components, where the
    * corpus becomes one giant hamming chain whose diameter defeats
    * any bounded fixpoint (measured: d59's CC blew past its round cap
    * at sf1 before this scramble; ~3 rounds after).
    */
  def scrambleSeed(raw: Long): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(raw.toString.getBytes("US-ASCII"))
    ((d(0) & 0xFFL) << 24) | ((d(1) & 0xFFL) << 16) |
      ((d(2) & 0xFFL) << 8) | (d(3) & 0xFFL)
  }

  def seedPixel(seed: Long)(x: Int, y: Int): (Int, Int, Int) = (
    ((7 * seed + 3 * x + 11 * y + (seed * (x + 40 * y + 1)) % 251) % 256).toInt,
    ((13 * seed + 5 * x + 2 * y + (seed * (x + 40 * y + 2)) % 241) % 256).toInt,
    ((3 * seed + x + 17 * y + (seed * (x + 40 * y + 3)) % 239) % 256).toInt)

  /** A corpus of REAL BMP payloads, one per row of `docs`:
    * deterministic geometry and pixels from the id alone —
    *   w = 4 + id%5, h = 3 + id%4,
    *   r = (7·id + 3x + 11y) mod 256, g = (13·id + 5x + 2y) mod 256,
    *   b = (3·id + x + 17y) mod 256
    * — integer arithmetic the m05 oracle replays in SQL, so the gate
    * checks encode → container bytes → decode against the formula
    * directly. The row-local `map` here is the ENCODE half of the
    * sanctioned codec boundary (fixture synthesis; real deployments
    * read media bytes from storage instead).
    */
  def bmpMedia(docs: DataFrame, idCol: String): Dataset[MediaRecord] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast(LongType)).as[Long].map { id =>
      val w = (4 + id % 5).toInt
      val h = (3 + id % 4).toInt
      val bytes = encodeBmp(w, h, (x, y) => (
        ((7 * id + 3 * x + 11 * y) % 256).toInt,
        ((13 * id + 5 * x + 2 * y) % 256).toInt,
        ((3 * id + x + 17 * y) % 256).toInt))
      MediaRecord(id, "image", bytes, "bmp-synth")
    }
  }

  // ── PNG: the REAL compressed image codec (zlib DEFLATE + filters) ───
  //
  // The fourth container, and the first COMPRESSED one — the storage
  // path real corpora actually use. BMP/WAV/Y4M proved chunk walks and
  // plane math over bytes that sit in the container verbatim; PNG adds
  // the two layers every production format has: an entropy-coded
  // payload (zlib — the pixel bytes do NOT exist in the container, so
  // no offset arithmetic can fake the decode; inflation is the JDK's
  // `Inflater`) and per-scanline prediction FILTERS (None/Sub/Up/
  // Average/Paeth) that must be inverted byte-exactly. Every chunk is
  // CRC-verified. Layout variability stays plantable: caller-chosen
  // filter type per row, the zlib stream split across several IDAT
  // chunks (readers assuming one IDAT fail), an ancillary tEXt chunk
  // sitting before the image data (fixed-offset readers land inside
  // it). Public byte layout: the PNG spec (RFC 2083 / ISO 15948).

  private val PngSig: Array[Byte] =
    Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte)

  private def putBe32(out: Array[Byte], at: Int, v: Int): Unit = {
    out(at) = (v >>> 24).toByte; out(at + 1) = (v >>> 16).toByte
    out(at + 2) = (v >>> 8).toByte; out(at + 3) = v.toByte
  }

  private def be32(bytes: Array[Byte], at: Int): Int =
    ((bytes(at) & 0xFF) << 24) | ((bytes(at + 1) & 0xFF) << 16) |
      ((bytes(at + 2) & 0xFF) << 8) | (bytes(at + 3) & 0xFF)

  /** PNG filter-4 predictor (exact spec arithmetic: nearest of the
    * three neighbors to the linear estimate a + b − c, ties broken
    * a, then b).
    */
  private def paethPredict(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  private def pngPredict(ft: Int, a: Int, b: Int, c: Int): Int = ft match {
    case 0 => 0
    case 1 => a
    case 2 => b
    case 3 => (a + b) / 2
    case 4 => paethPredict(a, b, c)
    case other => throw new IllegalArgumentException(s"bad filter type $other")
  }

  private def pngChunk(tag: String, data: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](12 + data.length)
    putBe32(out, 0, data.length)
    var i = 0
    while (i < 4) { out(4 + i) = tag.charAt(i).toByte; i += 1 }
    System.arraycopy(data, 0, out, 8, data.length)
    val c = new java.util.zip.CRC32
    c.update(out, 4, 4 + data.length)
    putBe32(out, 8 + data.length, c.getValue.toInt)
    out
  }

  /** Encode an 8-bit truecolor-RGB PNG. `filterForRow` picks each
    * scanline's filter type (0-4 — the encoder COMPUTES the filtered
    * residuals, so the decoder must invert them exactly),
    * `idatSplit` > 1 splits the one zlib stream across that many IDAT
    * chunks, `textChunk` plants an ancillary tEXt chunk before the
    * image data. Container internals (deflate output) are NOT oracle
    * surface — only decoded pixels are — so the compression level is
    * unconstrained.
    */
  def encodePng(width: Int, height: Int, pixel: (Int, Int) => (Int, Int, Int),
      filterForRow: Int => Int = _ => 0, idatSplit: Int = 1,
      textChunk: Option[String] = None): Array[Byte] = {
    require(width > 0 && height > 0, s"degenerate PNG ${width}x$height")
    require(idatSplit >= 1, s"bad idatSplit $idatSplit")
    val stride = 3 * width
    val raw = new Array[Byte]((stride + 1) * height)
    val prev = new Array[Byte](stride)
    val cur = new Array[Byte](stride)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val (r, g, b) = pixel(x, y)
        cur(3 * x) = r.toByte; cur(3 * x + 1) = g.toByte; cur(3 * x + 2) = b.toByte
        x += 1
      }
      val ft = filterForRow(y)
      require(ft >= 0 && ft <= 4, s"bad filter type $ft for row $y")
      val rowBase = y * (stride + 1)
      raw(rowBase) = ft.toByte
      var i = 0
      while (i < stride) {
        val a = if (i >= 3) cur(i - 3) & 0xFF else 0
        val b0 = if (y > 0) prev(i) & 0xFF else 0
        val c0 = if (i >= 3 && y > 0) prev(i - 3) & 0xFF else 0
        raw(rowBase + 1 + i) =
          ((cur(i) & 0xFF) - pngPredict(ft, a, b0, c0)).toByte
        i += 1
      }
      System.arraycopy(cur, 0, prev, 0, stride)
      y += 1
    }
    val defl = new java.util.zip.Deflater()
    defl.setInput(raw); defl.finish()
    val zbuf = new Array[Byte](raw.length + raw.length / 2 + 64)
    val zlen = defl.deflate(zbuf)
    require(defl.finished(), "deflate did not finish in one pass")
    defl.end()
    val ihdr = new Array[Byte](13)
    putBe32(ihdr, 0, width); putBe32(ihdr, 4, height)
    ihdr(8) = 8 // bit depth
    ihdr(9) = 2 // color type: truecolor RGB
    // bytes 10-12 stay 0: compression, filter method, interlace
    val chunks = scala.collection.mutable.ArrayBuffer[Array[Byte]]()
    chunks += pngChunk("IHDR", ihdr)
    textChunk.foreach(t => chunks += pngChunk("tEXt",
      ("comment".getBytes("US-ASCII") :+ 0.toByte) ++ t.getBytes("US-ASCII")))
    val per = (zlen + idatSplit - 1) / idatSplit
    var off = 0
    while (off < zlen) {
      val n = math.min(per, zlen - off)
      chunks += pngChunk("IDAT", java.util.Arrays.copyOfRange(zbuf, off, off + n))
      off += n
    }
    chunks += pngChunk("IEND", Array.emptyByteArray)
    PngSig ++ chunks.toArray.flatten
  }

  /** Parse + inflate + un-filter a truecolor-RGB PNG: walks the chunk
    * stream with CRC VERIFICATION on every chunk (ancillary chunks are
    * checked and skipped), concatenates ALL IDAT payloads (the spec
    * allows any split), inflates via the JDK `Inflater` with an exact
    * length contract, then inverts each scanline's filter against the
    * RECONSTRUCTED neighbors. Returns `(width, height, rgb)` in
    * display order, exactly like [[decodeBmp]] — PNG rows are already
    * top-down.
    */
  def decodePng(bytes: Array[Byte]): (Int, Int, Array[Byte]) = {
    require(bytes.length >= 8 && java.util.Arrays.equals(
      java.util.Arrays.copyOfRange(bytes, 0, 8), PngSig), "not a PNG payload")
    var p = 8
    var width = 0; var height = 0
    var seenIhdr = false; var seenEnd = false
    val idat = new java.io.ByteArrayOutputStream()
    while (!seenEnd) {
      require(p + 8 <= bytes.length, "truncated chunk header")
      val len = be32(bytes, p)
      require(len >= 0 && p + 12 + len <= bytes.length, s"truncated chunk at $p")
      val tag = new String(bytes, p + 4, 4, "US-ASCII")
      val c = new java.util.zip.CRC32
      c.update(bytes, p + 4, 4 + len)
      require(c.getValue.toInt == be32(bytes, p + 8 + len),
        s"CRC mismatch in $tag chunk")
      tag match {
        case "IHDR" =>
          require(!seenIhdr, "duplicate IHDR")
          require(len == 13, s"bad IHDR length $len")
          width = be32(bytes, p + 8); height = be32(bytes, p + 12)
          require(width > 0 && height > 0,
            s"unsupported geometry ${width}x$height")
          require(bytes(p + 16) == 8, s"unsupported bit depth ${bytes(p + 16)}")
          require(bytes(p + 17) == 2, s"unsupported color type ${bytes(p + 17)}")
          require(bytes(p + 18) == 0 && bytes(p + 19) == 0 && bytes(p + 20) == 0,
            "unsupported compression/filter/interlace method")
          seenIhdr = true
        case "IDAT" =>
          require(seenIhdr, "IDAT before IHDR")
          idat.write(bytes, p + 8, len)
        case "IEND" =>
          require(len == 0, "bad IEND")
          seenEnd = true
        case _ => () // ancillary: CRC-checked above, content skipped
      }
      p += 12 + len
    }
    require(seenIhdr, "no IHDR chunk")
    val stride = 3 * width
    val raw = new Array[Byte]((stride + 1) * height)
    val infl = new java.util.zip.Inflater()
    infl.setInput(idat.toByteArray)
    var got = 0
    while (got < raw.length && !infl.finished()) {
      val n = infl.inflate(raw, got, raw.length - got)
      require(n > 0 || infl.finished(),
        s"zlib stream stalled at $got of ${raw.length} bytes")
      got += n
    }
    require(got == raw.length,
      s"filtered stream is $got bytes, expected ${raw.length}")
    infl.end()
    val rgb = new Array[Byte](stride * height)
    var y = 0
    while (y < height) {
      val ft = raw(y * (stride + 1)) & 0xFF
      require(ft <= 4, s"bad filter type $ft in row $y")
      var i = 0
      while (i < stride) {
        val fx = raw(y * (stride + 1) + 1 + i) & 0xFF
        val a = if (i >= 3) rgb(y * stride + i - 3) & 0xFF else 0
        val b0 = if (y > 0) rgb((y - 1) * stride + i) & 0xFF else 0
        val c0 = if (i >= 3 && y > 0) rgb((y - 1) * stride + i - 3) & 0xFF else 0
        rgb(y * stride + i) = (fx + pngPredict(ft, a, b0, c0)).toByte
        i += 1
      }
      y += 1
    }
    (width, height, rgb)
  }

  /** The compressed-image codec behind the [[MediaCodec]] trait:
    * decode/embed run the REAL PNG parse over decoded pixels (same
    * checksum and block-mean shapes as [[BmpCodec]], so the two image
    * codecs are feature-compatible). The COLUMN hooks delegate to the
    * stub forms deliberately: a compressed container has no pixel
    * bytes at any column-computable offset — perceptual features for
    * PNG route through the row-level decode (the [[bmpBlockSums]]
    * pattern), which is the honest boundary.
    */
  object PngCodec extends MediaCodec {
    def decode(r: MediaRecord): MediaFeatures =
      if (r.kind != "image") decodeStub(r)
      else {
        val (w, h, rgb) = decodePng(r.content)
        var sum = 0L
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val q = 3 * (y * w + x)
            sum += ((rgb(q) & 0xFF) + 2 * (rgb(q + 1) & 0xFF) +
              3 * (rgb(q + 2) & 0xFF)).toLong * (1 + x + y * w)
            x += 1
          }
          y += 1
        }
        MediaFeatures(r.media_id, r.kind, r.content.length.toLong,
          w, h, channels = 3, duration_ms = 0L, checksum = sum)
      }

    def embed(r: MediaRecord, dim: Int): Array[Float] =
      if (r.kind != "image") embedStub(r, dim)._2
      else {
        val (_, _, rgb) = decodePng(r.content)
        val out = new Array[Float](dim)
        val block = math.max(1, rgb.length / dim)
        var d = 0
        while (d < dim) {
          val from = d * block
          val to = math.min(rgb.length, from + block)
          var s = 0L; var i = from
          while (i < to) { s += rgb(i) & 0xFF; i += 1 }
          out(d) = if (to > from) s.toFloat / (to - from) / 255f else 0f
          d += 1
        }
        out
      }

    def blockBit(content: Column, block: Column, blockBytes: Int): Column =
      StubCodec.blockBit(content, block, blockBytes)

    def frameSig(content: Column, byteOffset: Column, stride: Int): Column =
      StubCodec.frameSig(content, byteOffset, stride)
  }

  /** Container-independent CONTENT KEYS from decoded pixels: two
    * independent position-weighted integer sums per image —
    * c1 = Σ (r+2g+3b)·(1 + x + y·w) (the m05 checksum) and
    * c2 = Σ (3r+2g+b)·(1 + y + x·h) (transposed weights) — computed
    * over DISPLAY-order pixels through whatever decoder the container
    * needs. This is the row-level decode route the compressed
    * containers require (a PNG has no pixel bytes at any
    * column-computable offset), shared with [[bmpBlockSums]]'s
    * pattern; exact integers, so the oracle replays both sums from
    * the pixel formula and a cross-CONTAINER identity join stays
    * engine-portable. Two independent keys because either sum alone
    * spans only ~2²² values on small fixtures — jointly with the
    * geometry the chance-collision expectation stays ≪ 1 at sf1, and
    * any survivor replicates identically in the oracle.
    */
  def imageContentKeys(media: Dataset[MediaRecord],
      decode: Array[Byte] => (Int, Int, Array[Byte])): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions(_.map { r =>
      val (w, h, rgb) = decode(r.content)
      var c1 = 0L; var c2 = 0L
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val q = 3 * (y * w + x)
          val rr = rgb(q) & 0xFF
          val gg = rgb(q + 1) & 0xFF
          val bb = rgb(q + 2) & 0xFF
          c1 += (rr + 2 * gg + 3 * bb).toLong * (1 + x + y * w)
          c2 += (3 * rr + 2 * gg + bb).toLong * (1 + y + x * h)
          x += 1
        }
        y += 1
      }
      (r.media_id, w, h, c1, c2)
    }).toDF("media_id", "width", "height", "c1", "c2")
  }

  /** A corpus of REAL PNG payloads, one per row of `docs`: the SAME
    * geometry and pixel formula as [[bmpMedia]] (so the m05 oracle
    * arithmetic carries over), with every compression-layer trap live
    * across the corpus — scanline filters CYCLE through all five
    * types (row y of image id uses type (id + y) mod 5, so every
    * filter inversion is load-bearing on every image taller than
    * four rows), a third of the corpus splits its zlib stream across
    * THREE IDAT chunks, and another third carries an ancillary tEXt
    * chunk before the image data.
    */
  def pngMedia(docs: DataFrame, idCol: String): Dataset[MediaRecord] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast(LongType)).as[Long].map { id =>
      val w = (4 + id % 5).toInt
      val h = (3 + id % 4).toInt
      val bytes = encodePng(w, h, (x, y) => (
          ((7 * id + 3 * x + 11 * y) % 256).toInt,
          ((13 * id + 5 * x + 2 * y) % 256).toInt,
          ((3 * id + x + 17 * y) % 256).toInt),
        filterForRow = y => ((id + y) % 5).toInt,
        idatSplit = if (id % 3 == 1) 3 else 1,
        textChunk = if (id % 3 == 2) Some("graft-fixture") else None)
      MediaRecord(id, "image", bytes, "png-synth")
    }
  }
}
