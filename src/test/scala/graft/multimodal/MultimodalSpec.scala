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
}
