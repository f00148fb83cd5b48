package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (north-star extension): treat image/audio/
  * video payloads as opaque `binary` columns with typed metadata, and run
  * decode/feature-extraction as a partition-batched pass.
  *
  * The container has no image/audio codecs, so the *decode* step is a
  * clearly-marked deterministic fake ([[fakeDecodeFeatures]] — a byte
  * histogram standing in for "decode then embed"); everything around it —
  * schema, binary column handling, partition batching, feature-vector
  * shape — is real and tested. Swapping in a real codec means replacing
  * only the body of [[fakeDecodeFeatures]].
  *
  * Scale notes: payloads stay in executor memory one partition batch at a
  * time (`mapPartitions` — the Scala analog of `mapInPandas` batch
  * processing); metadata-only queries never touch the payload column
  * (Parquet column pruning), which is the point of splitting meta from
  * bytes.
  */
object Multimodal {

  /** A multimodal record: opaque payload + typed metadata. */
  final case class MediaRecord(
      media_id: Long,
      payload: Array[Byte],
      media_type: String,
      width: Int,
      height: Int,
      n_bytes: Long)

  final case class MediaFeatures(
      media_id: Long,
      media_type: String,
      n_bytes: Long,
      checksum: String,
      features: Array[Float])

  val FeatureDim = 16

  /** Wrap a text corpus as fake media: payload = UTF-8 bytes, metadata
    * derived deterministically from content. Pure column expressions.
    */
  def asMedia(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      col(idCol).cast("long").as("media_id"),
      col(textCol).cast("binary").as("payload"),
      when(pmod(col(idCol), lit(3)) === 0, "image")
        .when(pmod(col(idCol), lit(3)) === 1, "audio")
        .otherwise("video").as("media_type"),
      (pmod(abs(xxhash64(col(textCol))), lit(1280)) + lit(64)).cast("int").as("width"),
      (pmod(abs(xxhash64(col(textCol), lit(1))), lit(720)) + lit(64)).cast("int").as("height"),
      length(col(textCol).cast("binary")).cast("long").as("n_bytes"))

  /** True-binary media synthesis: payload = `unhex` of a deterministic
    * md5 hex chain seeded by the content (one 16-byte block per 16
    * chars of text, minimum one), giving full-range 0x00–0xFF bytes
    * that are NOT valid UTF-8 — so the decode boundary
    * ([[extractFeatures]], [[extractFrames]]) handles real binary —
    * while both engines can reconstruct the identical bytes for the
    * checksum oracle (DuckDB hashes VARCHAR only, hence the hex-chain
    * construction and the hex-encoded checksum contract below).
    */
  def asBinaryMedia(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val nblocks = greatest(lit(1), ceil(length(col(textCol)) / 16.0)).cast("int")
    val hexChain = array_join(
      transform(sequence(lit(0), nblocks - 1),
        i => md5(concat(col(textCol), lit(":"), i.cast("string")))), "")
    docs.select(
      col(idCol).cast("long").as("media_id"),
      unhex(hexChain).as("payload"),
      when(pmod(col(idCol), lit(3)) === 0, "image")
        .when(pmod(col(idCol), lit(3)) === 1, "audio")
        .otherwise("video").as("media_type"),
      (pmod(abs(xxhash64(col(textCol))), lit(1280)) + lit(64)).cast("int").as("width"),
      (pmod(abs(xxhash64(col(textCol), lit(1))), lit(720)) + lit(64)).cast("int").as("height"),
      (nblocks * 16).cast("long").as("n_bytes"))
  }

  /** STUB decode: a real implementation would decode the payload with a
    * codec and run a vision/audio model; here a deterministic byte
    * histogram (16 buckets, L1-normalized) so tests have exact expected
    * values. The partition-batched iteration pattern is the real part.
    */
  def fakeDecodeFeatures(payload: Array[Byte]): Array[Float] = {
    val counts = new Array[Int](FeatureDim)
    var i = 0
    while (i < payload.length) {
      counts((payload(i) & 0xff) % FeatureDim) += 1
      i += 1
    }
    val total = math.max(1, payload.length).toFloat
    counts.map(_ / total)
  }

  /** Feature extraction over media records: one partition at a time, the
    * decode stub applied per record inside the batch. Returns a typed
    * Dataset so downstream similarity ops get `Array[Float]` columns.
    *
    * Checksum contract: MD5 over the payload's UPPERCASE-HEX transport
    * encoding (not the raw bytes) — the features decode the raw bytes,
    * but the checksum must be independently computable by a VARCHAR-only
    * SQL engine for the cross-engine oracle, and hex is the lossless
    * encoding both sides produce identically.
    */
  private val HexUpper = "0123456789ABCDEF".toCharArray
  private val HexLower = "0123456789abcdef".toCharArray

  private def hexEncode(bytes: Array[Byte], table: Array[Char]): Array[Byte] = {
    // table-driven, allocation-light (ASCII hex is 1 byte/char): the
    // per-byte String.format spelling cost ~6× on the bench corpus
    val out = new Array[Byte](bytes.length * 2)
    var i = 0
    while (i < bytes.length) {
      val v = bytes(i) & 0xff
      out(i * 2) = table(v >>> 4).toByte
      out(i * 2 + 1) = table(v & 0x0f).toByte
      i += 1
    }
    out
  }

  def extractFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] =
    extractWith(spark, media, fakeDecodeFeatures)

  /** STUB perceptual embedding: a block-hash histogram — MD5 each
    * fixed-size byte block, count hash buckets, L1-normalize. Unlike
    * the plain byte histogram (which collapses to the language's
    * character profile — every same-language payload looks alike, no
    * separation), shared CONTENT means shared blocks land in the same
    * buckets while distinct content scatters independently: on the
    * harness corpus background pairs sit at cosine ≈ 0.70 (p99 0.89)
    * and planted near-dup payloads at ≈ 0.99 — a usable perceptual
    * gap. A real system swaps this for a pHash/CLIP-style model; the
    * locality-by-shared-substructure contract is the same.
    */
  def fakeDecodeBlockFeatures(payload: Array[Byte]): Array[Float] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val counts = new Array[Int](FeatureDim)
    var o = 0
    var n = 0
    while (o < payload.length) {
      md.reset()
      md.update(payload, o, math.min(BlockSize, payload.length - o))
      val d = md.digest()
      val h = ((d(0) & 0xff) << 24) | ((d(1) & 0xff) << 16) |
        ((d(2) & 0xff) << 8) | (d(3) & 0xff)
      counts(math.floorMod(h, FeatureDim)) += 1
      n += 1
      o += BlockSize
    }
    val total = math.max(1, n).toFloat
    counts.map(_ / total)
  }

  val BlockSize = 8

  /** Feature extraction with the perceptual (block-hash) stub — the
    * decode boundary a payload near-dup pipeline runs ([[fakeDecodeBlockFeatures]]).
    */
  def extractPerceptualFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] =
    extractWith(spark, media, fakeDecodeBlockFeatures)

  private def extractWith(spark: SparkSession, media: DataFrame,
                          decode: Array[Byte] => Array[Float]): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { batch =>
      // per-partition setup: the codec/model (here: the digest) opens ONCE
      val md = java.security.MessageDigest.getInstance("MD5")
      batch.map { rec =>
        md.reset()
        val digest = md.digest(hexEncode(rec.payload, HexUpper))
        MediaFeatures(
          media_id = rec.media_id,
          media_type = rec.media_type,
          n_bytes = rec.n_bytes,
          checksum = new String(hexEncode(digest, HexLower), "US-ASCII"),
          features = decode(rec.payload))
      }
    }
  }

  /** Frame-sampling analog: deterministic stride over the payload,
    * emitting one row per sampled "frame" offset — the explode-shaped
    * operation a video pipeline needs (one input row → many samples).
    */
  def sampleFrames(media: DataFrame, stride: Int): DataFrame =
    media.select(col("media_id"), col("n_bytes"),
      posexplode(sequence(lit(0), greatest(col("n_bytes") - 1, lit(0)), lit(stride))))
      .withColumnRenamed("pos", "frame_idx")
      .withColumnRenamed("col", "byte_offset")

  /** Frame extraction: split the payload into fixed-size frames and emit
    * every `stride`-th frame as its own row (`posexplode` — the
    * Generator/UDTF surface; one input row → many frame rows). Works on
    * binary or string payload columns (`substring` handles both).
    */
  def extractFrames(media: DataFrame, idCol: String, payloadCol: String,
                    frameSize: Int, stride: Int): DataFrame =
    media.select(col(idCol),
      posexplode(expr(
        s"""transform(
           |  sequence(0, cast(floor((length($payloadCol) - 1) / $frameSize) as int)),
           |  i -> substring($payloadCol, i * $frameSize + 1, $frameSize))""".stripMargin)))
      .where(pmod(col("pos"), lit(stride)) === 0)
      .select(col(idCol), col("pos").as("frame_idx"), col("col").as("frame"))

  /** STUB resize: deterministic byte decimation standing in for a codec
    * resize — payload truncated proportionally to the pixel-count ratio,
    * dimensions and byte-count metadata updated. Swapping in a real
    * codec replaces only the payload expression.
    */
  def fakeResize(media: DataFrame, targetW: Int, targetH: Int): DataFrame =
    media
      .withColumn("payload", expr(
        s"""substring(payload, 1, greatest(1,
           |  cast(n_bytes * $targetW * $targetH / (width * height) as int)))""".stripMargin))
      .withColumn("width", lit(targetW))
      .withColumn("height", lit(targetH))
      .withColumn("n_bytes", length(col("payload")).cast("long"))
}
