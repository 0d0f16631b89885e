package graft.multimodal

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {

  test("media synthesis assigns modalities and carries binary payloads") {
    val media = Multimodal.syntheticMediaFromDocuments(spark, sfDir).collect()
    assert(media.length == 500)
    assert(media.map(_.modality).distinct.toSet == Set("image", "audio", "video"))
    assert(media.forall(_.content.nonEmpty))
  }

  test("feature extraction runs per-partition and is deterministic") {
    val media = Multimodal.syntheticMediaFromDocuments(spark, sfDir)
    val f1 = Multimodal.extractFeatures(media).collect().sortBy(_.media_id)
    val f2 = Multimodal.extractFeatures(media.repartition(7)).collect().sortBy(_.media_id)
    assert(f1.length == 500)
    // partitioning must not change results (pure map)
    f1.zip(f2).foreach { case (a, b) =>
      assert(a.media_id == b.media_id)
      assert(a.mean_intensity == b.mean_intensity)
      assert(a.feature_vector.sameElements(b.feature_vector))
    }
    // feature vectors are fixed-width and normalized
    f1.foreach { f =>
      assert(f.feature_vector.length == 16)
      assert(f.feature_vector.forall(v => v >= 0f && v <= 1f))
      assert(f.thumb_width <= 64)
    }
  }

  test("video frame sampling scales with duration; stills sample one frame") {
    val feats = Multimodal.extractFeatures(
      Multimodal.syntheticMediaFromDocuments(spark, sfDir)).collect()
    val byMod = feats.groupBy(_.modality)
    assert(byMod("video").forall(_.n_frames_sampled >= 1))
    assert(byMod("image").forall(_.n_frames_sampled == 1))
    assert(byMod("video").exists(_.n_frames_sampled > 1))
  }

  test("feature summary aggregates per modality") {
    val df = Multimodal.featureSummary(
      Multimodal.extractFeatures(Multimodal.syntheticMediaFromDocuments(spark, sfDir)))
    val rows = df.collect()
    assert(rows.length == 3)
    assert(rows.map(_.getAs[Long]("n")).sum == 500)
  }

  // ---- real decode (JDK codecs) ----------------------------------------

  private def pngBytes(w: Int, h: Int)(pixel: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val v = pixel(x, y) & 0xff
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  private def wavBytes(samples: Array[Short]): Array[Byte] = {
    val dataLen = samples.length * 2
    val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes); buf.putInt(36 + dataLen); buf.put("WAVE".getBytes)
    buf.put("fmt ".getBytes); buf.putInt(16)
    buf.putShort(1); buf.putShort(1) // PCM, mono
    buf.putInt(16000); buf.putInt(16000 * 2)
    buf.putShort(2); buf.putShort(16) // block align, bits
    buf.put("data".getBytes); buf.putInt(dataLen)
    samples.foreach(buf.putShort)
    buf.array()
  }

  private def mediaRow(id: Long, modality: String, bytes: Array[Byte]): Multimodal.MediaRow =
    Multimodal.MediaRow(id, modality, bytes, 0, 0, 0, 0)

  test("PNG decode is real: dimensions, mean luma, edges from pixels") {
    val flat = mediaRow(1, "image", pngBytes(80, 40)((_, _) => 100))
    val half = mediaRow(2, "image", pngBytes(64, 64)((x, _) => if (x < 32) 0 else 255))
    val f1 = RealCodecs.SniffingCodec.decode(flat)
    assert(math.abs(f1.mean_intensity - 100.0) < 1e-9) // exact pixel math
    assert(f1.intensity_variance < 1e-9)
    assert(f1.edge_density == 0.0)
    assert(f1.thumb_width == 64 && f1.thumb_height == 32) // real 80x40, bounded
    val f2 = RealCodecs.SniffingCodec.decode(half)
    assert(math.abs(f2.mean_intensity - 127.5) < 1e-9)
    assert(f2.edge_density > 0.0) // one edge per row
    assert(f2.feature_vector(0) == 0f && f2.feature_vector(3) == 1f) // grid left/right
  }

  test("JPEG decode goes through the same imageio path") {
    val img = new java.awt.image.BufferedImage(32, 32, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 32; x <- 0 until 32) img.setRGB(x, y, 0x646464)
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", out)
    assert(RealCodecs.sniff(out.toByteArray) == "jpeg")
    val f = RealCodecs.SniffingCodec.decode(mediaRow(3, "image", out.toByteArray))
    assert(math.abs(f.mean_intensity - 100.0) < 3.0) // lossy tolerance
  }

  test("WAV decode is real: amplitude, zero-crossing rate from PCM") {
    // square wave, period 8 samples, amplitude 0.5
    val sq = Array.tabulate[Short](8000)(i =>
      (if ((i / 4) % 2 == 0) 16384 else -16384).toShort)
    val f = RealCodecs.SniffingCodec.decode(mediaRow(4, "audio", wavBytes(sq)))
    assert(math.abs(f.mean_intensity - 0.5 * 255.0) < 1.0) // |amp| = 0.5 scaled
    assert(math.abs(f.edge_density - 0.25) < 0.01) // crossing every 4th sample
    f.feature_vector.foreach(v => assert(math.abs(v - 0.5f) < 0.01f))
  }

  test("animated GIF decode samples real frames") {
    // 6-frame GIF, frame i uniformly gray at 40*i: multi-image write via
    // the JDK's GIF writer sequence API
    val out = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(out)
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    (0 until 6).foreach { i =>
      val img = new java.awt.image.BufferedImage(20, 10, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val v = 40 * i
      for (y <- 0 until 10; x <- 0 until 20) img.setRGB(x, y, (v << 16) | (v << 8) | v)
      writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
    }
    writer.endWriteSequence(); ios.close()
    val bytes = out.toByteArray
    assert(RealCodecs.sniff(bytes) == "gif")
    val f = RealCodecs.SniffingCodec.decode(mediaRow(6, "video", bytes))
    assert(f.n_frames_sampled == 4) // capped even sampling over 6 frames
    // sampled frames 0,1,3,5 -> lumas 0,40,120,200; GIF palette may shift
    // values slightly, so assert the mean within a tolerance
    assert(math.abs(f.mean_intensity - (0 + 40 + 120 + 200) / 4.0) < 8.0)
    assert(f.thumb_width == 20 && f.thumb_height == 10)
  }

  test("sniffing dispatch: unknown payloads fall back to the stub") {
    val blob = mediaRow(5, "video", Array.tabulate[Byte](256)(_.toByte))
    val viaSniff = RealCodecs.SniffingCodec.decode(blob)
    val viaStub = Multimodal.StubCodec.decode(blob)
    assert(viaSniff.mean_intensity == viaStub.mean_intensity)
    assert(viaSniff.intensity_variance == viaStub.intensity_variance)
    assert(viaSniff.edge_density == viaStub.edge_density)
    assert(viaSniff.feature_vector.sameElements(viaStub.feature_vector))
    assert(RealCodecs.sniff(blob.content) == "unknown")
  }

  private def jpegBytes(w: Int, h: Int, v: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, (v << 16) | (v << 8) | v)
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", out)
    out.toByteArray
  }

  /** Minimal structurally-valid MJPEG AVI: RIFF(AVI  LIST(hdrl avih)
    * LIST(movi 00dc*)) — the container our decoder walks. */
  private def aviMjpegBytes(frames: Seq[Array[Byte]]): Array[Byte] = {
    def chunk(id: String, body: Array[Byte]): Array[Byte] = {
      val pad = body.length & 1
      val buf = java.nio.ByteBuffer.allocate(8 + body.length + pad)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      buf.put(id.getBytes("US-ASCII")); buf.putInt(body.length); buf.put(body)
      buf.array()
    }
    def list(subtype: String, children: Array[Byte]): Array[Byte] =
      chunk("LIST", subtype.getBytes("US-ASCII") ++ children)
    val hdrl = list("hdrl", chunk("avih", new Array[Byte](56)))
    val movi = list("movi", frames.flatMap(f => chunk("00dc", f)).toArray)
    chunk("RIFF", "AVI ".getBytes("US-ASCII") ++ hdrl ++ movi)
  }

  test("MJPEG AVI decode samples real video frames") {
    // 6 frames, frame i uniformly gray at 30*i
    val avi = aviMjpegBytes((0 until 6).map(i => jpegBytes(24, 12, 30 * i)))
    assert(RealCodecs.sniff(avi) == "avi")
    val f = RealCodecs.SniffingCodec.decode(mediaRow(11, "video", avi))
    assert(f.n_frames_sampled == 4) // capped even sampling over 6 frames
    // sampled frames 0,1,3,5 -> lumas 0,30,90,150 (JPEG lossy tolerance)
    assert(math.abs(f.mean_intensity - (0 + 30 + 90 + 150) / 4.0) < 6.0)
    assert(f.thumb_width == 24 && f.thumb_height == 12)
    // flat frames: essentially no edges
    assert(f.edge_density < 0.05)
    // truncated mid-container: must degrade to the stub, not throw
    val cut = avi.take(avi.length / 2)
    assert(RealCodecs.sniff(cut) == "avi")
    val g = RealCodecs.SniffingCodec.decode(mediaRow(12, "video", cut))
    assert(g.n_frames_sampled >= 1) // either sampled surviving frames or stub
  }

  test("corrupt payloads terminate and degrade to the stub, never throw") {
    import java.nio.{ByteBuffer, ByteOrder}
    // RIFF/WAVE magic with a NEGATIVE fmt chunk size: without the size
    // guard the chunk walk's step is zero and the loop never terminates
    val negFmt = ByteBuffer.allocate(64).order(ByteOrder.LITTLE_ENDIAN)
    negFmt.put("RIFF".getBytes); negFmt.putInt(56); negFmt.put("WAVE".getBytes)
    negFmt.put("fmt ".getBytes); negFmt.putInt(-8)
    assert(RealCodecs.sniff(negFmt.array()) == "wav")
    assert(RealCodecs.decodeWav(mediaRow(7, "audio", negFmt.array())).isEmpty)

    // a valid fmt but a NEGATIVE data size: nSamples must not go negative
    // and leak NaN/garbage features out of a Some(...)
    val negData = ByteBuffer.allocate(52).order(ByteOrder.LITTLE_ENDIAN)
    negData.put("RIFF".getBytes); negData.putInt(44); negData.put("WAVE".getBytes)
    negData.put("fmt ".getBytes); negData.putInt(16)
    negData.putShort(1); negData.putShort(1); negData.putInt(16000)
    negData.putInt(32000); negData.putShort(2); negData.putShort(16)
    negData.put("data".getBytes); negData.putInt(-4)
    assert(RealCodecs.decodeWav(mediaRow(8, "audio", negData.array())).isEmpty)

    // fmt chunk header at the very tail: reading the bits field would run
    // past the buffer without the bounds check
    val tailFmt = ByteBuffer.allocate(44).order(ByteOrder.LITTLE_ENDIAN)
    tailFmt.put("RIFF".getBytes); tailFmt.putInt(36); tailFmt.put("WAVE".getBytes)
    tailFmt.put("JUNK".getBytes); tailFmt.putInt(16); tailFmt.put(new Array[Byte](16))
    tailFmt.put("fmt ".getBytes); tailFmt.putInt(16)
    assert(RealCodecs.decodeWav(mediaRow(9, "audio", tailFmt.array())).isEmpty)

    // adversarially nested AVI LISTs: the walk must depth-cap, not
    // StackOverflowError (which NonFatal would not catch)
    var nested: Array[Byte] = Array.fill[Byte](8)(0)
    (0 until 20000).foreach { _ => // deep enough to overflow without the cap
      val body = "LIST".getBytes("US-ASCII") ++ nested
      val buf = java.nio.ByteBuffer.allocate(8 + body.length).order(ByteOrder.LITTLE_ENDIAN)
      buf.put("LIST".getBytes("US-ASCII")); buf.putInt(body.length); buf.put(body)
      nested = buf.array()
    }
    val bomb = {
      val body = "AVI ".getBytes("US-ASCII") ++ nested
      val buf = java.nio.ByteBuffer.allocate(8 + body.length).order(ByteOrder.LITTLE_ENDIAN)
      buf.put("RIFF".getBytes("US-ASCII")); buf.putInt(body.length); buf.put(body)
      buf.array()
    }
    assert(RealCodecs.sniff(bomb) == "avi")
    assert(RealCodecs.decodeAviFrames(mediaRow(13, "video", bomb)).isEmpty)

    // truncated image/GIF payloads pass the magic sniff but make the JDK
    // readers throw; SniffingCodec must degrade per row, not kill the job
    for ((bytes, kind) <- Seq(
        pngBytes(32, 32)((_, _) => 99).take(40) -> "png",
        { val out = new java.io.ByteArrayOutputStream()
          val img = new java.awt.image.BufferedImage(8, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
          javax.imageio.ImageIO.write(img, "gif", out)
          out.toByteArray.take(20) } -> "gif")) {
      assert(RealCodecs.sniff(bytes) == kind)
      val row = mediaRow(10, "image", bytes)
      val f = RealCodecs.SniffingCodec.decode(row)
      val stub = Multimodal.StubCodec.decode(row)
      assert(f.mean_intensity == stub.mean_intensity)
      assert(f.feature_vector.sameElements(stub.feature_vector))
    }
  }

  test("real decode runs distributed through extractFeatures") {
    val s = spark
    import s.implicits._
    val rows = Seq(
      mediaRow(1, "image", pngBytes(16, 16)((_, _) => 50)),
      mediaRow(2, "audio", wavBytes(Array.tabulate[Short](800)(i =>
        (if ((i / 2) % 2 == 0) 8192 else -8192).toShort))),
      mediaRow(3, "video", Array.fill[Byte](64)(7)))
    val feats = Multimodal.extractFeatures(s.createDataset(rows).repartition(3))
      .collect().sortBy(_.media_id)
    assert(feats.length == 3)
    assert(math.abs(feats(0).mean_intensity - 50.0) < 1e-9) // pixel-exact PNG
    assert(math.abs(feats(1).mean_intensity - 0.25 * 255.0) < 1.0) // |amp|=0.25
    assert(feats(2).mean_intensity == 7.0) // stub byte stats
  }

  // a structured 64x64 test pattern with per-cell contrast: diagonal
  // gradient + a bright quadrant, parameterized so variants perturb it
  private def patterned(bright: Int, noiseAt: Option[(Int, Int)] = None)
      : (Int, Int) => Int = { (x, y) =>
    val base = if (x < 32 && y < 32) bright else (x + y) * 2
    val v0 = math.min(base, 255)
    val v = noiseAt match {
      case Some((nx, ny)) if nx == x && ny == y => 255 - v0
      case _ => v0
    }
    (v << 16) | (v << 8) | v
  }

  test("aHash: deterministic, re-encoding-invariant, edit-tolerant, content-sensitive") {
    def imgOf(pixel: (Int, Int) => Int): java.awt.image.BufferedImage = {
      val img = new java.awt.image.BufferedImage(64, 64,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 64; x <- 0 until 64) img.setRGB(x, y, pixel(x, y))
      img
    }
    val base = Multimodal.aHash(imgOf(patterned(220)))
    assert(base == Multimodal.aHash(imgOf(patterned(220))), "not deterministic")
    // single-pixel edit: hamming small (perceptually identical)
    val edited = Multimodal.aHash(imgOf(patterned(220, Some((5, 5)))))
    assert(java.lang.Long.bitCount(base ^ edited) <= 2, "pixel edit moved the hash")
    // inverted quadrant: many cells flip relative to the mean
    val different = Multimodal.aHash(imgOf(patterned(0)))
    assert(java.lang.Long.bitCount(base ^ different) > 6, "distinct content too close")
  }

  test("nearDuplicateImages finds perceptual dups via banded candidates, never all-pairs") {
    val s = spark
    // 1+2: the same pattern, one as PNG one re-encoded lossily-but-mildly
    // as a second PNG with a single-pixel edit; 3: inverted quadrant;
    // 4: a flat image (undecodable noise dropped: 5)
    val rows = Seq(
      mediaRow(1, "image", pngBytes(64, 64)(patterned(220))),
      mediaRow(2, "image", pngBytes(64, 64)(patterned(220, Some((5, 5))))),
      mediaRow(3, "image", pngBytes(64, 64)(patterned(0))),
      mediaRow(4, "image", pngBytes(64, 64)((_, _) => 0x505050)),
      mediaRow(5, "image", Array.fill[Byte](32)(1)))
    val media = s.createDataset(rows)(
      org.apache.spark.sql.Encoders.product[Multimodal.MediaRow])
    val hashes = Multimodal.imageHashes(media).collect()
    assert(hashes.length == 4, "undecodable payload should drop")
    val got = Multimodal.nearDuplicateImages(media, maxHamming = 6).collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"),
        r.getAs[Long]("hamming")))
    // brute-force oracle over the hashes: banded candidates must find
    // EXACTLY the pairs within the bound (pigeonhole completeness)
    val hs = hashes.map(r => r.getLong(0) ->
      (r.getLong(1) | (r.getLong(2) << 32))).toMap
    val want = (for {
      a <- hs.keys; b <- hs.keys if a < b
      d = java.lang.Long.bitCount(hs(a) ^ hs(b)) if d <= 6
    } yield (a, b, d.toLong)).toSet
    assert(got.toSet == want, s"got ${got.toSet}; want $want")
    assert(want.contains((1L, 2L, want.find(p => p._1 == 1L && p._2 == 2L).get._3)),
      "the single-pixel-edit pair must be found")
    assert(!want.exists(p => p._1 == 3L || p._2 == 3L),
      "inverted-quadrant image must not pair")
  }

  test("audio envelope hash: deterministic, edit-tolerant, structure-sensitive") {
    // a loud-soft-loud-soft envelope over 6400 samples (100/window)
    def env(flip: Boolean, glitchAt: Int = -1): Array[Short] =
      Array.tabulate[Short](6400) { i =>
        val loud = ((i / 1600) % 2 == 0) != flip
        val base = if (loud) 12000 else 500
        val v = if (i == glitchAt) 30000 else base
        (if (i % 2 == 0) v else -v).toShort
      }
    val base = RealCodecs.audioHash64(wavBytes(env(false))).get
    assert(base == RealCodecs.audioHash64(wavBytes(env(false))).get)
    assert(base != 0L && base != -1L, "degenerate hash")
    val glitched = RealCodecs.audioHash64(wavBytes(env(false, glitchAt = 7))).get
    assert(java.lang.Long.bitCount(base ^ glitched) <= 2,
      "one-sample glitch moved the envelope hash")
    val flipped = RealCodecs.audioHash64(wavBytes(env(true))).get
    assert(java.lang.Long.bitCount(base ^ flipped) > 6,
      "inverted envelope too close")
    assert(RealCodecs.audioHash64(Array.fill[Byte](32)(3)).isEmpty)
  }

  test("nearDuplicateAudio pairs glitched copies, not inverted envelopes") {
    val s = spark
    def env(flip: Boolean, glitchAt: Int = -1): Array[Short] =
      Array.tabulate[Short](6400) { i =>
        val loud = ((i / 1600) % 2 == 0) != flip
        val base = if (loud) 12000 else 500
        val v = if (i == glitchAt) 30000 else base
        (if (i % 2 == 0) v else -v).toShort
      }
    val rows = Seq(
      mediaRow(1, "audio", wavBytes(env(false))),
      mediaRow(2, "audio", wavBytes(env(false, glitchAt = 7))),
      mediaRow(3, "audio", wavBytes(env(true))),
      mediaRow(4, "audio", Array.fill[Byte](16)(9))) // undecodable drops
    val media = s.createDataset(rows)(
      org.apache.spark.sql.Encoders.product[Multimodal.MediaRow])
    assert(Multimodal.audioHashes(media).count() == 3)
    val got = Multimodal.nearDuplicateAudio(media).collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    assert(got == Set((1L, 2L)), s"got $got")
  }
}
