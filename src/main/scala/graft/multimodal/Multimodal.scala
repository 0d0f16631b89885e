package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column handling for training-data
  * pipelines. Media is carried as an opaque `binary` column plus a typed
  * metadata struct; decode / feature-extraction run as `mapPartitions`
  * over typed Datasets so heavyweight decoder state is initialized once
  * per partition (the Scala analogue of a pandas UDF over mapInPandas —
  * same batch shape: iterator-in / iterator-out, no per-row setup).
  *
  * Decode is REAL for images (javax.imageio: PNG/JPEG/BMP/GIF ship in
  * every JDK) and WAV audio (plain RIFF/PCM parse) via
  * [[RealCodecs.SniffingCodec]], which sniffs container magic and
  * dispatches. Video has no in-JDK decoder, so video payloads (and any
  * unrecognized bytes) fall through to [[StubCodec]] — a DETERMINISTIC
  * FAKE (byte-level statistics standing in for pixels) kept as the one
  * documented stub; swapping in a JNI/FFmpeg decoder changes only the
  * codec object.
  */
object Multimodal {

  /** Typed media row: id, modality (image|audio|video), raw bytes, and
    * parse-free metadata. */
  final case class MediaRow(
      media_id: Long,
      modality: String,
      content: Array[Byte],
      width: Int,
      height: Int,
      sample_rate: Int,
      duration_ms: Long)

  final case class MediaFeatures(
      media_id: Long,
      modality: String,
      n_bytes: Long,
      // decoded-domain features (from the codec; see StubCodec)
      mean_intensity: Double,
      intensity_variance: Double,
      edge_density: Double,
      // resize/frame-sample plumbing outputs
      thumb_width: Int,
      thumb_height: Int,
      n_frames_sampled: Int,
      feature_vector: Array[Float])

  /** Decoder interface: one instance per partition. */
  trait MediaCodec extends Serializable {
    def decode(row: MediaRow): MediaFeatures
  }

  /** Deterministic fake decode: byte statistics in place of pixel math.
    * Reached only for payloads no JDK codec handles (non-GIF video and
    * unrecognized blobs — see [[RealCodecs.SniffingCodec]]); the seam to
    * swap in a JNI/FFmpeg decoder off-container. */
  object StubCodec extends MediaCodec {
    override def decode(row: MediaRow): MediaFeatures = {
      val bytes = row.content
      val n = bytes.length.max(1)
      var sum = 0.0
      var sumSq = 0.0
      var edges = 0
      var i = 0
      while (i < bytes.length) {
        val v = bytes(i) & 0xff
        sum += v
        sumSq += v.toDouble * v
        if (i > 0 && math.abs(v - (bytes(i - 1) & 0xff)) > 32) edges += 1
        i += 1
      }
      val mean = sum / n
      val variance = sumSq / n - mean * mean
      // resize plumbing: target thumbnail bounded at 64px, aspect preserved
      val scale = if (row.width > 0) math.min(1.0, 64.0 / row.width) else 1.0
      val (tw, th) = ((row.width * scale).toInt.max(1), (row.height * scale).toInt.max(1))
      // frame sampling: 1 fps for video, 1 frame for stills
      val frames = if (row.modality == "video") (row.duration_ms / 1000).toInt.max(1) else 1
      // fixed-width feature vector from strided byte means (batch shape that
      // a downstream embedding model would consume)
      val dim = 16
      val vec = Array.tabulate(dim) { k =>
        val start = k * bytes.length / dim
        val end = ((k + 1) * bytes.length / dim).max(start + 1)
        var s = 0.0
        var j = start
        while (j < end && j < bytes.length) { s += (bytes(j) & 0xff); j += 1 }
        (s / (end - start) / 255.0).toFloat
      }
      MediaFeatures(row.media_id, row.modality, bytes.length.toLong,
        mean, variance, edges.toDouble / n, tw, th, frames, vec)
    }
  }

  /** Decode + featurize a media Dataset. mapPartitions: the codec is
    * instantiated once per partition; rows stream through it. At 100 TB
    * this stage is a pure map — no shuffle — and parallelism is governed
    * by input-split size (`spark.sql.files.maxPartitionBytes` should be
    * LOWERED for binary-heavy tables so a partition of ~128 MB of media
    * doesn't decode on one core while others idle). */
  def extractFeatures(media: Dataset[MediaRow],
      codec: MediaCodec = RealCodecs.SniffingCodec): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      val c = codec // per-partition init seam (real codecs open handles here)
      rows.map(c.decode)
    }
  }

  /** Synthesize a deterministic media table from the documents table:
    * text bytes stand in for media payloads (this container ships no
    * codecs or media fixtures). */
  def syntheticMediaFromDocuments(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    graft.queries.Tables.load(spark, dir, "documents")
      .select(
        col("doc_id").as("media_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (col("doc_id") % 3 + 1).cast("int")).as("modality"),
        col("text").cast("binary").as("content"),
        (col("n_chars") % 640 + 64).cast("int").as("width"),
        (col("n_chars") % 480 + 48).cast("int").as("height"),
        when(col("doc_id") % 3 === 1, 16000).otherwise(0).cast("int").as("sample_rate"),
        (col("n_chars") * 100).cast("long").as("duration_ms"))
      .as[MediaRow]
  }

  // =====================================================================
  // Perceptual image dedup — aHash over decoded pixels + hamming bands
  // =====================================================================

  /** 64-bit average-hash of a decoded image: luminance means over an 8×8
    * cell grid, each cell thresholded at the grid's global mean. Pure
    * integer accumulation + one fixed comparison per cell — deterministic
    * across JVMs (no Graphics2D resampling, whose interpolation is
    * implementation-defined). Bit (8·cy + cx) is set when cell (cx, cy)
    * is brighter than average. Robust to re-encoding and mild edits —
    * the perceptual signal byte-identical hashing (q27-style) misses. */
  def aHash(img: java.awt.image.BufferedImage): Long = {
    val w = img.getWidth
    val h = img.getHeight
    val sums = new Array[Long](64)
    val counts = new Array[Long](64)
    var y = 0
    while (y < h) {
      val cy = math.min(y * 8 / h, 7)
      var x = 0
      while (x < w) {
        val cx = math.min(x * 8 / w, 7)
        val rgb = img.getRGB(x, y)
        val lum = 299L * ((rgb >> 16) & 0xff) + 587L * ((rgb >> 8) & 0xff) +
          114L * (rgb & 0xff) // ×1000, exact
        val c = 8 * cy + cx
        sums(c) += lum
        counts(c) += 1
        x += 1
      }
      y += 1
    }
    // cell means compared to the mean of cell means, all in exact
    // rational arithmetic: mean_c > grandMean  ⇔  64·sums_c·N > counts_c·S
    // with S = Σ(sums_i·N/counts_i) — avoided by comparing against the
    // PIXEL-global mean instead (the standard aHash variant):
    // sums_c · totalCount > totalSum · counts_c
    var totalSum = 0L
    var totalCount = 0L
    var c = 0
    while (c < 64) { totalSum += sums(c); totalCount += counts(c); c += 1 }
    var bits = 0L
    c = 0
    while (c < 64) {
      if (counts(c) > 0 &&
        java.math.BigInteger.valueOf(sums(c))
          .multiply(java.math.BigInteger.valueOf(totalCount))
          .compareTo(java.math.BigInteger.valueOf(totalSum)
            .multiply(java.math.BigInteger.valueOf(counts(c)))) > 0)
        bits |= 1L << c
      c += 1
    }
    bits
  }

  /** Perceptual hash per decodable image row: (media_id, hash_lo,
    * hash_hi) — the 64-bit aHash carried as two non-negative 32-bit
    * halves (the q31 convention: later shifts/masks stay on non-negative
    * longs). Undecodable payloads drop. Pure mapPartitions — no shuffle;
    * this is the table a media-curation deployment persists next to the
    * binary store. */
  def imageHashes(media: Dataset[MediaRow]): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        val img = try javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(r.content))
        catch { case _: Throwable => null }
        if (img == null) Iterator.empty
        else {
          val hsh = aHash(img)
          Iterator((r.media_id, hsh & 0xFFFFFFFFL, (hsh >>> 32) & 0xFFFFFFFFL))
        }
      }
    }.toDF("media_id", "hash_lo", "hash_hi")
  }

  /** Near-dup pairs for ANY 64-bit-signature frame (media_id, hash_lo,
    * hash_hi — non-negative 32-bit halves): candidates from C(8,2)=28
    * byte-chunk-pair keys — pigeonhole-complete for hamming <= 6 (<= 6
    * differing bits touch at most 6 of the 8 bytes, so some PAIR of
    * bytes is untouched and the pair shares that candidate key) — then
    * the exact popcount filter INSIDE the join, before the pair-dedup
    * shuffle (the q31 plan shape generalized to any perceptual
    * signature: image aHash, audio envelope hash, a video frame hash).
    * Never all-pairs. */
  def hammingPairs(hashes: DataFrame, maxHamming: Int = 6): DataFrame = {
    require(maxHamming <= 6,
      s"chunk-pair keys are pigeonhole-complete only to hamming 6 (got $maxHamming)")
    def byteOf(c: Int): Column =
      shiftright(col(if (c < 4) "hash_lo" else "hash_hi"), 8 * (c % 4))
        .bitwiseAND(lit(255L))
    val chunkPairs = for { c1 <- 0 until 8; c2 <- c1 + 1 until 8 } yield (c1, c2)
    val keyed = hashes.select(col("media_id"), col("hash_lo"), col("hash_hi"),
      explode(array(chunkPairs.map { case (c1, c2) =>
        struct(lit(c1 * 8 + c2).as("k"), byteOf(c1).as("v1"), byteOf(c2).as("v2"))
      }: _*)).as("e"))
      .select(col("media_id"), col("hash_lo"), col("hash_hi"),
        col("e.k").as("k"), col("e.v1").as("v1"), col("e.v2").as("v2"))
    val a = keyed.select(col("media_id").as("id_a"), col("hash_lo").as("lo_a"),
      col("hash_hi").as("hi_a"), col("k"), col("v1"), col("v2"))
    val b = keyed.select(col("media_id").as("id_b"), col("hash_lo").as("lo_b"),
      col("hash_hi").as("hi_b"), col("k"), col("v1"), col("v2"))
    val ham = expr("bit_count(lo_a ^ lo_b) + bit_count(hi_a ^ hi_b)")
    a.join(b, Seq("k", "v1", "v2"))
      .filter(col("id_a") < col("id_b") && ham <= maxHamming)
      .select(col("id_a"), col("id_b"), col("lo_a"), col("hi_a"),
        col("lo_b"), col("hi_b"))
      .distinct()
      .select(col("id_a"), col("id_b"), ham.cast("long").as("hamming"))
  }

  /** Perceptual near-duplicate image pairs: [[imageHashes]] +
    * [[hammingPairs]]. */
  def nearDuplicateImages(media: Dataset[MediaRow],
      maxHamming: Int = 6): DataFrame =
    hammingPairs(imageHashes(media), maxHamming)

  /** Energy-envelope hash per decodable PCM-WAV row — the audio twin of
    * [[imageHashes]] ([[RealCodecs.audioHash64]] per payload, carried as
    * the same two non-negative halves). Pure mapPartitions, no shuffle. */
  def audioHashes(media: Dataset[MediaRow]): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        val h = try RealCodecs.audioHash64(r.content)
        catch { case _: Throwable => None }
        h.iterator.map(v =>
          (r.media_id, v & 0xFFFFFFFFL, (v >>> 32) & 0xFFFFFFFFL))
      }
    }.toDF("media_id", "hash_lo", "hash_hi")
  }

  /** Perceptual near-duplicate audio pairs: [[audioHashes]] +
    * [[hammingPairs]]. */
  def nearDuplicateAudio(media: Dataset[MediaRow],
      maxHamming: Int = 6): DataFrame =
    hammingPairs(audioHashes(media), maxHamming)

  /** Modality-level feature aggregate — the query a curation pipeline runs
    * after extraction. */
  def featureSummary(features: Dataset[MediaFeatures]): DataFrame =
    features.groupBy(col("modality"))
      .agg(count(lit(1)).as("n"),
        round(avg("mean_intensity"), 4).as("avg_intensity"),
        round(avg("edge_density"), 4).as("avg_edge_density"),
        sum("n_frames_sampled").as("total_frames"),
        round(avg(element_at(col("feature_vector"), 1)), 4).as("avg_f0"))
      .orderBy("modality")
}
