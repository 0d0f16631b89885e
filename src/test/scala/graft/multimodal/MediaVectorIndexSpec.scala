package graft.multimodal

import graft.SparkSpec
import graft.queries.VectorIndex
import org.apache.spark.sql.functions._

/** Multimodal → vector-index END-TO-END bridge (r14 verdict item 6):
  * decoded-media feature vectors flow through the SAME persisted ANN
  * serving stack as text embeddings — one pipeline, no seams:
  *
  *   real PNG/WAV encode → [[RealCodecs.SniffingCodec]] decode (JDK
  *   codecs, in `mapPartitions`) → 16-dim feature vectors →
  *   [[VectorIndex.build]] → a FRESH session (the new-JVM scenario)
  *   attaches the persisted artifact, re-decodes the arriving batch
  *   bytes, and serves ingest verdicts + ANN top-k bit-identically.
  *
  * Fixtures are pixel/sample-domain, not vector-domain: corpus images are
  * 4×4 block patterns with hash-derived per-cell luma (the grid-luma
  * featurizer reads them back exactly), audio is square-wave with a
  * hash-derived 16-window amplitude envelope (the envelope featurizer
  * reads it back). Near-dup batch members are RE-RENDERED media — a +4
  * global brightness shift / a 0.97 amplitude rescale, i.e. the
  * re-encoding edits perceptual dedup exists to catch (cos ≥ 0.998
  * against the source, far above the 0.98 τ) — while novel members use
  * fresh hash seeds (independent 16-dim patterns, cos ~0.8, far below). */
class MediaVectorIndexSpec extends SparkSpec {

  import Multimodal.MediaRow

  private val Tau = 0.98
  private val Prefix = "media_idx"

  // ---- pixel/sample-domain fixture generators ---------------------------

  /** Hash-derived value in [lo, hi] for (seed, id, k) — deterministic
    * across JVMs (MurmurHash3 is unseeded). */
  private def hv(seed: Int, id: Long, k: Int, lo: Int, hi: Int): Int = {
    val h = scala.util.hashing.MurmurHash3.productHash((seed, id, k))
    lo + (h & 0x7fffffff) % (hi - lo + 1)
  }

  /** 64×64 grayscale PNG of 16×16 constant-luma blocks: cell (cx,cy) luma
    * = hv(...). The grid-luma featurizer recovers exactly these 16 values. */
  private def pngOf(seed: Int, id: Long, shift: Int = 0): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(64, 64,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 64; x <- 0 until 64) {
      val cell = (x / 16) + 4 * (y / 16)
      val v = math.min(255, hv(seed, id, cell, 16, 240) + shift)
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** 16-bit PCM WAV: square wave whose amplitude over window k of 16 is
    * scale·hv(...)∈[0.1,0.9] — the envelope featurizer recovers ~these. */
  private def wavOf(seed: Int, id: Long, scale: Double = 1.0): Array[Byte] = {
    val n = 1600
    val samples = Array.tabulate[Short](n) { i =>
      val a = hv(seed, id, math.min(15, i * 16 / n), 100, 900) / 1000.0
      val s = if (i % 2 == 0) 1 else -1
      (s * a * scale * 32767).toShort
    }
    val dataLen = n * 2
    val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes); buf.putInt(36 + dataLen); buf.put("WAVE".getBytes)
    buf.put("fmt ".getBytes); buf.putInt(16); buf.putShort(1); buf.putShort(1)
    buf.putInt(16000); buf.putInt(32000); buf.putShort(2); buf.putShort(16)
    buf.put("data".getBytes); buf.putInt(dataLen)
    samples.foreach(buf.putShort)
    buf.array()
  }

  private def imageRow(id: Long, bytes: Array[Byte]) =
    MediaRow(id, "image", bytes, 64, 64, 0, 0L)
  private def audioRow(id: Long, bytes: Array[Byte]) =
    MediaRow(id, "audio", bytes, 0, 0, 16000, 100L)

  /** Corpus media: 48 images (ids 0–47) + 24 WAVs (ids 5000–5023). */
  private def corpusMedia(s: org.apache.spark.sql.SparkSession) = {
    import s.implicits._
    val rows = (0L until 48L).map(i => imageRow(i, pngOf(1, i))) ++
      (0L until 24L).map(j => audioRow(5000L + j, wavOf(2, j)))
    s.createDataset(rows).repartition(4)
  }

  /** Arriving batch: RE-RENDERED near-dups of corpus media (brightness
    * +4 / amplitude ×0.97, re-idded +10000) plus genuinely novel media
    * (fresh hash seeds, re-idded +20000). */
  private def batchMedia(s: org.apache.spark.sql.SparkSession) = {
    import s.implicits._
    val rows =
      (0L until 48L by 6L).map(i => imageRow(10000L + i, pngOf(1, i, shift = 4))) ++
        (0L until 24L by 6L).map(j => audioRow(15000L + j, wavOf(2, j, scale = 0.97))) ++
        (0L until 6L).map(i => imageRow(20000L + i, pngOf(3, i))) ++
        (0L until 4L).map(j => audioRow(25000L + j, wavOf(4, j)))
    s.createDataset(rows).repartition(3)
  }

  private def featVecs(media: org.apache.spark.sql.Dataset[MediaRow]) =
    Multimodal.extractFeatures(media, RealCodecs.SniffingCodec)
      .toDF().select(col("media_id"), col("feature_vector"))

  // probe outputs use the canonical serving names: vec_id / query_id
  private def isRerendered = col("media_id") >= 10000L && col("media_id") < 20000L

  private lazy val indexDir = {
    val d = java.nio.file.Files.createTempDirectory("media_vec_idx").toString
    VectorIndex.build(featVecs(corpusMedia(spark)), "media_id",
      "feature_vector", d, minCos = Tau, prefix = Prefix, dims = 16)
    d
  }

  private def freshServingSession() = {
    indexDir // ensure built
    Seq("meta", "cents", "pqbooks", "vecs", "cells", "bands", "pqcodes")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS ${Prefix}_$t"))
    val fresh = spark.newSession()
    assert(!fresh.catalog.tableExists(s"${Prefix}_bands"),
      "catalog entry survived the drop; the test would not prove re-attach")
    fresh
  }

  test("decoded media probe the persisted index: re-rendered media read near_dup, novel media read new") {
    val verdicts = {
      indexDir // ensure built in THIS session (registers the tables)
      VectorIndex.incrementalDedup(featVecs(batchMedia(spark)),
        "media_id", "feature_vector", Prefix)
        .collect()
        .map(r => r.getAs[Long]("vec_id") -> r.getAs[String]("verdict")).toMap
    }
    val rerendered = verdicts.filter { case (id, _) => id >= 10000L && id < 20000L }
    val novel = verdicts.filter { case (id, _) => id >= 20000L }
    assert(rerendered.nonEmpty && novel.nonEmpty)
    assert(rerendered.values.forall(_ == "near_dup"),
      s"a re-rendered (brightness/amplitude-edited) media item escaped: $rerendered")
    assert(novel.values.forall(_ == "new"),
      s"a novel media item false-matched at tau=$Tau: $novel")
  }

  test("a fresh session re-decodes the batch and serves verdicts + ANN bit-identically off the persisted index") {
    val wantVerdicts = {
      indexDir
      VectorIndex.incrementalDedup(featVecs(batchMedia(spark)),
        "media_id", "feature_vector", Prefix)
        .orderBy("vec_id").collect().map(_.toString).toSeq
    }
    val wantKnn = VectorIndex.knn(
      featVecs(batchMedia(spark)).filter(isRerendered),
      "media_id", "feature_vector", k = 3, Prefix)
      .orderBy("query_id", "rank").collect().map(_.toString).toSeq
    assert(wantKnn.nonEmpty)

    val fresh = freshServingSession()
    VectorIndex.attach(fresh, indexDir, Prefix)
    val gotVerdicts = VectorIndex.incrementalDedup(featVecs(batchMedia(fresh)),
      "media_id", "feature_vector", Prefix)
      .orderBy("vec_id").collect().map(_.toString).toSeq
    assert(gotVerdicts == wantVerdicts,
      "persisted-index media verdicts diverged across sessions")

    val gotKnn = VectorIndex.knn(
      featVecs(batchMedia(fresh)).filter(isRerendered),
      "media_id", "feature_vector", k = 3, Prefix)
      .orderBy("query_id", "rank").collect().map(_.toString).toSeq
    assert(gotKnn == wantKnn, "persisted-index media ANN diverged across sessions")
  }

  test("ANN top-1 for each re-rendered media item is its source media item") {
    val fresh = freshServingSession()
    VectorIndex.attach(fresh, indexDir, Prefix)
    val top1 = VectorIndex.knn(
      featVecs(batchMedia(fresh)).filter(isRerendered),
      "media_id", "feature_vector", k = 1, Prefix)
      .select("query_id", "vec_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(top1.nonEmpty)
    top1.foreach { case (q, got) =>
      val want = if (q >= 15000L) q - 15000L + 5000L else q - 10000L
      assert(got == want,
        s"nearest neighbor of re-rendered media $q was $got, expected source $want")
    }
  }
}
