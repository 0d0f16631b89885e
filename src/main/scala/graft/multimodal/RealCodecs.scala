package graft.multimodal

import Multimodal.{MediaCodec, MediaFeatures, MediaRow, StubCodec}
import java.io.ByteArrayInputStream

/** REAL decoders on top of the JDK — no external codec libraries needed:
  * `javax.imageio` ships PNG/JPEG/BMP/GIF readers in every standard JDK
  * (headless-safe), WAV is a plain RIFF/PCM container parsed by hand, and
  * MJPEG-in-AVI video is a RIFF walk whose frame chunks are JPEG stills.
  * Video CODECS with inter-frame compression (H.264/VP9/AV1) have no
  * in-JDK decoder, so those (and any unrecognized payload) fall back to
  * [[Multimodal.StubCodec]] — the one remaining documented stub.
  *
  * Features keep the [[MediaFeatures]] contract across modalities:
  * `mean_intensity`/`intensity_variance` are pixel luma (0-255) for
  * images and |amplitude| scaled to 0-255 for audio; `edge_density` is
  * the horizontal-gradient fraction for images and the zero-crossing
  * rate for audio; `feature_vector` is a 16-dim grid/window summary a
  * downstream embedding model would consume.
  */
object RealCodecs {

  /** Container sniffing on magic bytes (what a real pipeline does — the
    * declared modality is metadata, the bytes are the truth). */
  def sniff(b: Array[Byte]): String =
    if (b.length >= 8 && (b(0) & 0xff) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G') "png"
    else if (b.length >= 3 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8) "jpeg"
    else if (b.length >= 2 && b(0) == 'B' && b(1) == 'M') "bmp"
    else if (b.length >= 6 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F') "gif"
    else if (b.length >= 12 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
      b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E') "wav"
    else if (b.length >= 12 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
      b(8) == 'A' && b(9) == 'V' && b(10) == 'I' && b(11) == ' ') "avi"
    else "unknown"

  /** Production codec: sniff → real decode where the JDK has one, stub
    * otherwise. One instance per partition via `extractFeatures`.
    * GIF and MJPEG-AVI go through the multi-frame paths, so frame
    * SAMPLING is real for both; video codecs the JDK cannot decode
    * remain stubbed. */
  object SniffingCodec extends MediaCodec {
    override def decode(row: MediaRow): MediaFeatures = {
      val real = sniff(row.content) match {
        case "png" | "jpeg" | "bmp" => safely(decodeImage(row))
        case "gif"                  => safely(decodeGifFrames(row))
        case "wav"                  => safely(decodeWav(row))
        case "avi"                  => safely(decodeAviFrames(row))
        case _                      => None
      }
      real.getOrElse(StubCodec.decode(row))
    }

    /** A payload that passes the magic sniff can still be truncated or
      * corrupt and make the underlying reader throw; one bad blob in a
      * large media table must degrade to the stub, not kill the batch. */
    private def safely(f: => Option[MediaFeatures]): Option[MediaFeatures] =
      try f catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Pixel stats for one frame: (mean, variance, edgeDensity, 4x4 grid). */
  private def imageStats(img: java.awt.image.BufferedImage)
      : (Double, Double, Double, Array[Float]) = {
    val w = img.getWidth
    val h = img.getHeight
    var sum = 0.0
    var sumSq = 0.0
    var edges = 0L
    var horiz = 0L
    val grid = new Array[Double](16)
    val gridN = new Array[Long](16)
    var y = 0
    while (y < h) {
      var prev = -1000.0
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        val luma = (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)) / 3.0
        sum += luma
        sumSq += luma * luma
        if (prev > -999 && math.abs(luma - prev) > 32) edges += 1
        if (prev > -999) horiz += 1
        prev = luma
        val cell = math.min(3, x * 4 / w) + 4 * math.min(3, y * 4 / h)
        grid(cell) += luma
        gridN(cell) += 1
        x += 1
      }
      y += 1
    }
    val n = (w.toLong * h).max(1L).toDouble
    val mean = sum / n
    val vec = Array.tabulate(16)(k =>
      if (gridN(k) == 0) 0f else (grid(k) / gridN(k) / 255.0).toFloat)
    (mean, sumSq / n - mean * mean,
      if (horiz == 0) 0.0 else edges.toDouble / horiz, vec)
  }

  /** Pixel-domain decode via javax.imageio. Luma = (r+g+b)/3. */
  def decodeImage(row: MediaRow): Option[MediaFeatures] = {
    val img = javax.imageio.ImageIO.read(new ByteArrayInputStream(row.content))
    if (img == null) return None
    val (mean, variance, edges, vec) = imageStats(img)
    val scale = math.min(1.0, 64.0 / img.getWidth)
    Some(MediaFeatures(row.media_id, row.modality, row.content.length.toLong,
      mean, variance, edges,
      (img.getWidth * scale).toInt.max(1), (img.getHeight * scale).toInt.max(1),
      /*n_frames_sampled=*/ 1, vec))
  }

  /** Multi-frame GIF decode: REAL frame sampling — up to `maxFrames`
    * frames evenly spaced across the animation, per-frame pixel stats
    * averaged, feature vector from the first sampled frame. */
  def decodeGifFrames(row: MediaRow, maxFrames: Int = 4): Option[MediaFeatures] = {
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new ByteArrayInputStream(row.content))
    val readers = javax.imageio.ImageIO.getImageReaders(iis)
    if (!readers.hasNext) { iis.close(); return None }
    val reader = readers.next()
    try {
      reader.setInput(iis)
      val total = reader.getNumImages(true)
      if (total <= 0) return None
      val idxs =
        if (total <= maxFrames) 0 until total
        else (0 until maxFrames).map(k => k * (total - 1) / (maxFrames - 1))
      val stats = idxs.map(i => imageStats(reader.read(i)))
      val first = reader.read(idxs.head)
      val scale = math.min(1.0, 64.0 / first.getWidth)
      Some(MediaFeatures(row.media_id, row.modality, row.content.length.toLong,
        stats.map(_._1).sum / stats.size,
        stats.map(_._2).sum / stats.size,
        stats.map(_._3).sum / stats.size,
        (first.getWidth * scale).toInt.max(1), (first.getHeight * scale).toInt.max(1),
        /*n_frames_sampled=*/ idxs.size, stats.head._4))
    } finally {
      reader.dispose()
      iis.close()
    }
  }

  /** MJPEG-in-AVI video: the one general video container a pure JDK can
    * truly decode — the RIFF chunk walk yields `##dc`/`##db` stream
    * chunks whose payloads are complete JPEG images, decoded via
    * javax.imageio like any still; frame SAMPLING picks up to `maxFrames`
    * evenly spaced frames (same policy as the GIF path). Codecs with
    * inter-frame compression (H.264 etc.) have no JDK decoder and fall
    * through to the stub. Same corrupt-input discipline as the WAV walk:
    * non-positive chunk sizes stop the walk, advances happen in Long
    * space, and per-frame decode failures are skipped. */
  def decodeAviFrames(row: MediaRow, maxFrames: Int = 4): Option[MediaFeatures] = {
    val b = row.content
    def le32(o: Int): Int =
      (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
        ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)
    val frames = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    def isFrameChunk(id: String): Boolean =
      id.length == 4 && id(0).isDigit && id(1).isDigit &&
        (id.substring(2) == "dc" || id.substring(2) == "db")
    // depth-capped: real AVIs nest <= ~4 LISTs deep; an adversarial chain
    // of nested LISTs must not StackOverflowError (which NonFatal does NOT
    // catch — it would escape the per-row fallback and kill the job)
    def walk(start: Int, end: Int, depth: Int): Unit = {
      if (depth > 16) return
      var off = start
      var walking = true
      while (walking && off + 8 <= end) {
        val id = new String(b, off, 4, "US-ASCII")
        val size = le32(off + 4)
        if (size < 0) walking = false
        else {
          val body = off + 8
          val bodyEnd = math.min(end.toLong, body.toLong + size).toInt
          if (id == "RIFF" || id == "LIST") {
            if (body + 4 <= bodyEnd) walk(body + 4, bodyEnd, depth + 1) // skip subtype fourcc
          } else if (isFrameChunk(id) && size > 0 && body + size <= b.length)
            frames += ((body, size))
          val next = off.toLong + 8L + size.toLong + (size & 1).toLong
          if (next > end.toLong) walking = false else off = next.toInt
        }
      }
    }
    walk(0, b.length, 0)
    val jpegs = frames.filter { case (o, n) =>
      n >= 2 && (b(o) & 0xff) == 0xff && (b(o + 1) & 0xff) == 0xd8
    }
    if (jpegs.isEmpty) return None
    val idxs =
      if (jpegs.size <= maxFrames) jpegs.indices.toSeq
      else (0 until maxFrames).map(k => k * (jpegs.size - 1) / (maxFrames - 1))
    val imgs = idxs.flatMap { i =>
      val (o, n) = jpegs(i)
      Option(javax.imageio.ImageIO.read(new ByteArrayInputStream(b, o, n)))
    }
    if (imgs.isEmpty) return None
    val stats = imgs.map(imageStats)
    val first = imgs.head
    val scale = math.min(1.0, 64.0 / first.getWidth)
    Some(MediaFeatures(row.media_id, row.modality, b.length.toLong,
      stats.map(_._1).sum / stats.size,
      stats.map(_._2).sum / stats.size,
      stats.map(_._3).sum / stats.size,
      (first.getWidth * scale).toInt.max(1), (first.getHeight * scale).toInt.max(1),
      /*n_frames_sampled=*/ imgs.size, stats.head._4))
  }

  /** RIFF/PCM WAV parse: walks the chunk list to `fmt ` (channels, bits)
    * and `data` (samples); supports 8/16-bit PCM. */
  /** RIFF walk shared by [[decodeWav]] and [[audioHash64]]: locate the
    * PCM payload — (bits, dataOff, nSamples) — or None for non-PCM /
    * corrupt containers. */
  private def pcmData(b: Array[Byte]): Option[(Int, Int, Int)] = {
    def le16(o: Int): Int = (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
    def le32(o: Int): Int = le16(o) | (le16(o + 2) << 16)
    if (b.length < 44) return None
    var off = 12
    var bits = 0
    var dataOff = -1
    var dataLen = 0
    var walking = true
    while (walking && off + 8 <= b.length && (dataOff < 0 || bits == 0)) {
      val id = new String(b, off, 4, "US-ASCII")
      val size = le32(off + 4)
      if (size <= 0) walking = false // corrupt: a non-positive chunk size cannot advance the walk
      else {
        if (id == "fmt " && off + 24 <= b.length) bits = le16(off + 22)
        else if (id == "data") { dataOff = off + 8; dataLen = math.min(size, b.length - dataOff) }
        // advance in Long space so a near-MaxValue chunk size cannot wrap negative
        val next = off.toLong + 8L + size.toLong + (size & 1).toLong
        if (next > b.length.toLong) walking = false else off = next.toInt
      }
    }
    if (dataOff < 0 || (bits != 8 && bits != 16)) return None
    val nSamples = if (bits == 16) dataLen / 2 else dataLen
    if (nSamples <= 0) return None
    Some((bits, dataOff, nSamples))
  }

  /** 64-bit energy-envelope hash of a PCM WAV: |amplitude| sums over 64
    * equal time windows, each thresholded at the global mean (exact
    * integer accumulation, BigInteger cross-multiply — no division, no
    * floats). The audio twin of [[Multimodal.aHash]]: robust to gain-
    * preserving re-containering and small edits, sensitive to envelope
    * structure. Returns None for undecodable payloads. */
  def audioHash64(b: Array[Byte]): Option[Long] = pcmData(b).map {
    case (bits, dataOff, nSamples) =>
      def le16(o: Int): Int = (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
      def amp(i: Int): Long =
        if (bits == 16) math.abs(le16(dataOff + 2 * i).toShort.toLong)
        else math.abs((b(dataOff + i) & 0xff) - 128).toLong
      val sums = new Array[Long](64)
      val counts = new Array[Long](64)
      var i = 0
      while (i < nSamples) {
        val k = math.min(63, (i.toLong * 64 / nSamples).toInt)
        sums(k) += amp(i)
        counts(k) += 1
        i += 1
      }
      var totalSum = 0L
      var k = 0
      while (k < 64) { totalSum += sums(k); k += 1 }
      var out = 0L
      k = 0
      while (k < 64) {
        if (counts(k) > 0 &&
          java.math.BigInteger.valueOf(sums(k))
            .multiply(java.math.BigInteger.valueOf(nSamples.toLong))
            .compareTo(java.math.BigInteger.valueOf(totalSum)
              .multiply(java.math.BigInteger.valueOf(counts(k)))) > 0)
          out |= 1L << k
        k += 1
      }
      out
  }

  def decodeWav(row: MediaRow): Option[MediaFeatures] = {
    val b = row.content
    def le16(o: Int): Int = (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
    val parsed = pcmData(b)
    if (parsed.isEmpty) return None
    val (bits, dataOff, nSamples) = parsed.get
    def sample(i: Int): Double =
      if (bits == 16) le16(dataOff + 2 * i).toShort / 32768.0
      else ((b(dataOff + i) & 0xff) - 128) / 128.0
    var sumAbs = 0.0
    var sumSq = 0.0
    var crossings = 0L
    val win = new Array[Double](16)
    val winN = new Array[Long](16)
    var prev = 0.0
    var i = 0
    while (i < nSamples) {
      val s = sample(i)
      sumAbs += math.abs(s)
      sumSq += s * s
      if (i > 0 && (s > 0) != (prev > 0)) crossings += 1
      prev = s
      val k = math.min(15, i * 16 / nSamples)
      win(k) += math.abs(s)
      winN(k) += 1
      i += 1
    }
    val meanAbs = sumAbs / nSamples
    val vec = Array.tabulate(16)(k =>
      if (winN(k) == 0) 0f else (win(k) / winN(k)).toFloat)
    Some(MediaFeatures(row.media_id, row.modality, b.length.toLong,
      meanAbs * 255.0, (sumSq / nSamples - meanAbs * meanAbs) * 255.0 * 255.0,
      crossings.toDouble / nSamples,
      /*thumb dims n/a for audio*/ 0, 0, /*n_frames_sampled=*/ 1, vec))
  }
}
