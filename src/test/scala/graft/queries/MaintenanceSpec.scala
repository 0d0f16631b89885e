package graft.queries

import graft.SparkSpec
import graft.operators.Bucketing
import org.apache.spark.sql.functions._

/** [[Maintenance]] — the stats → action decision function (r15 verdict
  * item 2): one index is driven through build → append×n → remove →
  * crash → compact/rebuild and the recommendation at each transition is
  * asserted against the documented rules. Plus the wave-set hygiene pair
  * (r15 item 6): the committed-wave-count compact rule, and the proof
  * that probe plans STAY pruned at a few hundred waves (the rule is
  * planning-time hygiene, not a correctness cliff). */
class MaintenanceSpec extends SparkSpec {

  private lazy val docs = Tables.load(spark, sfDir, "documents")
    .select("doc_id", "text")
  private lazy val emb = Tables.load(spark, sfDir, "embeddings")
    .select("vec_id", "embedding")

  test("vector index lifecycle: none -> rebuild (ANN) / drift-immune (dedup) -> +compact reasons -> none after rebuild") {
    val d = java.nio.file.Files.createTempDirectory("mnt_vec").toString
    val prefix = "mnt_vec"
    val corpus = emb.filter(col("vec_id") % 7 =!= 3)
    val corpusN = corpus.count()
    VectorIndex.build(corpus, "vec_id", "embedding", d, minCos = 0.35,
      prefix = prefix)

    // fresh build: nothing to do, grain at the auto size
    val r0 = Maintenance.forVectors(spark, prefix)
    assert(r0.action == "none" && r0.reasons.isEmpty, s"$r0")
    assert(r0.currentGrain == r0.recommendedGrain, s"$r0")

    // a small append (~14% of build mass): under the measured knee
    val small = corpus.filter(col("vec_id") % 7 === 1)
      .select((col("vec_id") + 300000L).as("vec_id"), col("embedding"))
    VectorIndex.append(small, "vec_id", "embedding", prefix)
    assert(Maintenance.forVectors(spark, prefix).action == "none")

    // push appended fraction past 0.3: rebuild for an ANN-serving index,
    // measured drift-IMMUNE (warning only) for a dedup-verdict index
    val big = corpus.filter(col("vec_id") % 3 === 0)
      .select((col("vec_id") + 310000L).as("vec_id"), col("embedding"))
    VectorIndex.append(big, "vec_id", "embedding", prefix)
    val frac = VectorIndex.stats(spark, prefix).appendedRows.toDouble / corpusN
    assert(frac >= Maintenance.RebuildAppendedFraction,
      s"fixture degenerate: appended fraction $frac under the knee")
    val r1 = Maintenance.forVectors(spark, prefix)
    assert(r1.action == "rebuild" &&
      r1.reasons.exists(_.contains("appended fraction")), s"$r1")
    val r1d = Maintenance.forVectors(spark, prefix, servesAnn = false)
    assert(r1d.action == "none" &&
      r1d.warnings.exists(_.contains("drift-immune")), s"$r1d")

    // tombstone a slice that stays >10% of the GROWN total (the appends
    // above added ~47% mass): the compact rule fires; rebuild still wins
    // for ANN (it subsumes compact), dedup-only now says compact
    val removed = corpus.filter(col("vec_id") % 4 === 1)
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    VectorIndex.remove(spark, removed, prefix)
    val r2 = Maintenance.forVectors(spark, prefix)
    assert(r2.action == "rebuild" &&
      r2.reasons.exists(_.contains("tombstone fraction")), s"$r2")
    val r2d = Maintenance.forVectors(spark, prefix, servesAnn = false)
    assert(r2d.action == "compact", s"$r2d")

    // crash mid-append: abandoned-wave garbage joins the reasons
    VectorIndex.appendStaged(
      emb.filter(col("vec_id") % 50 === 9)
        .select((col("vec_id") + 320000L).as("vec_id"), col("embedding")),
      "vec_id", "embedding", prefix, maxTables = 1)
    val r3 = Maintenance.forVectors(spark, prefix, servesAnn = false)
    assert(r3.action == "compact" &&
      r3.reasons.exists(_.contains("abandoned")), s"$r3")

    // rebuild (the recommended action): retrains over live rows, clears
    // tombstones/waves, resets appended mass — back to "none". force:
    // the crashed appendStaged above left a YOUNG lease this spec knows
    // is dead (requireQuiesced would otherwise presume it live)
    val dR = java.nio.file.Files.createTempDirectory("mnt_vec_rb").toString
    VectorIndex.rebuild(spark, dR, prefix = prefix, force = true)
    val r4 = Maintenance.forVectors(spark, prefix)
    assert(r4.action == "none" && r4.reasons.isEmpty, s"$r4")
  }

  test("text index lifecycle: tombstones and crashed appends drive compact; compact resets to none") {
    val d = java.nio.file.Files.createTempDirectory("mnt_txt").toString
    val prefix = "mnt_txt"
    val corpus = docs.filter(col("doc_id") % 10 =!= 3)
    DedupIndex.build(corpus, "doc_id", "text", d, prefix = prefix)
    val r0 = Maintenance.forText(spark, prefix)
    assert(r0.action == "none" && r0.reasons.isEmpty, s"$r0")

    // >10% takedown: the tombstone rule
    val removed = corpus.filter(col("doc_id") % 8 === 1)
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    DedupIndex.remove(spark, removed, prefix)
    val r1 = Maintenance.forText(spark, prefix)
    assert(r1.action == "compact" &&
      r1.reasons.exists(_.contains("tombstone fraction")), s"$r1")

    // crash mid-append: abandoned garbage
    DedupIndex.appendStaged(
      docs.filter(col("doc_id") % 10 === 3).limit(5)
        .select((col("doc_id") + 330000L).as("doc_id"), col("text")),
      "doc_id", "text", prefix, maxTables = 1)
    val r2 = Maintenance.forText(spark, prefix)
    assert(r2.reasons.exists(_.contains("abandoned")), s"$r2")

    // the recommended compact (auto grain) clears everything (force: the
    // crashed appendStaged left a young lease this spec knows is dead)
    val d2 = java.nio.file.Files.createTempDirectory("mnt_txt_c").toString
    DedupIndex.compact(spark, d2, prefix, pvals = DedupIndex.AutoPvals,
      force = true)
    val r3 = Maintenance.forText(spark, prefix)
    assert(r3.action == "none" && r3.reasons.isEmpty, s"$r3")
  }

  test("grain rules: a too-fine grain and an outgrown grain both recommend a re-graining compact") {
    val corpus = docs.filter(col("doc_id") % 10 =!= 3)
    // too fine: 512 partitions over ~450 live docs (recommended 16)
    val dF = java.nio.file.Files.createTempDirectory("mnt_fine").toString
    DedupIndex.build(corpus, "doc_id", "text", dF, prefix = "mnt_fine",
      pvals = 512)
    val rF = Maintenance.forText(spark, "mnt_fine")
    assert(rF.action == "compact" &&
      rF.reasons.exists(_.contains("grain too fine")) &&
      rF.recommendedGrain == 16, s"$rF")
    // outgrown: 2 partitions where the live rows want 16
    val dO = java.nio.file.Files.createTempDirectory("mnt_out").toString
    DedupIndex.build(corpus, "doc_id", "text", dO, prefix = "mnt_out",
      pvals = 2)
    val rO = Maintenance.forText(spark, "mnt_out")
    assert(rO.action == "compact" &&
      rO.reasons.exists(_.contains("grain outgrown")), s"$rO")
    // the recommended fix converges: an AutoPvals compact lands at the
    // recommendation and the next maintain() is clean
    val d2 = java.nio.file.Files.createTempDirectory("mnt_out2").toString
    DedupIndex.compact(spark, d2, "mnt_out", pvals = DedupIndex.AutoPvals)
    val r2 = Maintenance.forText(spark, "mnt_out")
    assert(r2.action == "none" && r2.currentGrain == rO.recommendedGrain,
      s"$r2")
  }

  test("runText executes the recommendation: compact + re-grain when the grain rule fired, no-op when clean") {
    val corpus = docs.filter(col("doc_id") % 10 =!= 3)
    val probeBatch = docs.filter(col("doc_id") % 10 === 3)
    val d = java.nio.file.Files.createTempDirectory("mntr_txt").toString
    val prefix = "mntr_txt"
    // outgrown grain (2 where live rows want 16) + >10% tombstones: both
    // compact reasons live, so ONE runText must fix both
    DedupIndex.build(corpus, "doc_id", "text", d, prefix = prefix,
      pvals = 2)
    val removed = corpus.filter(col("doc_id") % 8 === 1)
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    DedupIndex.remove(spark, removed, prefix)
    def verdicts() = DedupIndex
      .incrementalDedup(probeBatch, "doc_id", "text", prefix)
      .collect().map(_.toString).sorted.toSeq
    val want = verdicts()

    val d2 = java.nio.file.Files.createTempDirectory("mntr_txt2").toString
    val (rec, acted) = Maintenance.runText(spark, prefix, d2)
    assert(acted && rec.action == "compact" &&
      rec.reasons.exists(_.startsWith("grain ")), s"$rec")
    assert(DedupIndex.pvalsOf(spark, prefix) == rec.recommendedGrain,
      "runText must re-grain to the recommendation when the rule fired")
    assert(verdicts() == want, "maintenance changed verdicts")
    // clean index: second run is a no-op (outDir unconsumed)
    val d3 = java.nio.file.Files.createTempDirectory("mntr_txt3").toString
    val (rec2, acted2) = Maintenance.runText(spark, prefix, d3)
    assert(!acted2 && rec2.action == "none", s"$rec2")
    assert(!new java.io.File(d3, "hashes").exists(),
      "a no-op run must not write the out dir")
  }

  test("runVectors executes a rebuild past the knee and is clean after") {
    val d = java.nio.file.Files.createTempDirectory("mntr_vec").toString
    val prefix = "mntr_vec"
    val corpus = emb.filter(col("vec_id") % 7 =!= 3)
    VectorIndex.build(corpus, "vec_id", "embedding", d, minCos = 0.35,
      prefix = prefix)
    val big = corpus.filter(col("vec_id") % 3 === 0)
      .select((col("vec_id") + 350000L).as("vec_id"), col("embedding"))
    VectorIndex.append(big, "vec_id", "embedding", prefix)
    val d2 = java.nio.file.Files.createTempDirectory("mntr_vec2").toString
    val (rec, acted) = Maintenance.runVectors(spark, prefix, d2)
    assert(acted && rec.action == "rebuild", s"$rec")
    val (rec2, acted2) = Maintenance.runVectors(spark, prefix,
      java.nio.file.Files.createTempDirectory("mntr_vec3").toString)
    assert(!acted2 && rec2.action == "none", s"$rec2")
  }

  test("garbage-only state recommends the in-place reclaim, not a full-rewrite compact") {
    val d = java.nio.file.Files.createTempDirectory("mnt_rcl").toString
    val prefix = "mnt_rcl"
    val corpus = docs.filter(col("doc_id") % 10 =!= 3)
    DedupIndex.build(corpus, "doc_id", "text", d, prefix = prefix)
    val probeBatch = docs.filter(col("doc_id") % 10 === 3).limit(5)
    def verdicts() = DedupIndex
      .incrementalDedup(probeBatch, "doc_id", "text", prefix)
      .collect().map(_.toString).sorted.toSeq
    val want = verdicts()
    // crash an append: abandoned-wave garbage is now the ONLY problem —
    // at 100 TB a compact rewrites every live byte for what is a
    // deletion-sized fix
    DedupIndex.appendStaged(
      docs.filter(col("doc_id") % 10 === 3).limit(5)
        .select((col("doc_id") + 860000L).as("doc_id"), col("text")),
      "doc_id", "text", prefix, maxTables = 1)
    spark.conf.set("spark.graft.writerLiveTtlMs", "0") // spec killed it
    try {
      val r = Maintenance.forText(spark, prefix)
      assert(r.action == "reclaim" &&
        r.reasons.forall(_.contains("abandoned")), s"$r")
      val outDir = java.nio.file.Files.createTempDirectory("mnt_rcl2")
        .toString
      val (rec, acted) = Maintenance.runText(spark, prefix, outDir)
      assert(acted && rec.action == "reclaim", s"$rec")
      assert(!new java.io.File(outDir, "hashes").exists(),
        "reclaim must act in place, not write the out dir")
      assert(DedupIndex.stats(spark, prefix).abandonedWaves == 0,
        "reclaim left the abandoned wave on disk")
      assert(Maintenance.forText(spark, prefix).action == "none")
      assert(verdicts() == want, "reclaim changed verdicts")
    } finally spark.conf.unset("spark.graft.writerLiveTtlMs")
  }

  test("wave-set hygiene: the count rule fires at the threshold; probe plans stay pruned at 200 waves") {
    val d = java.nio.file.Files.createTempDirectory("mnt_wave").toString
    val prefix = "mnt_wave"
    val corpus = docs.filter(col("doc_id") % 10 =!= 3)
    val batch = docs.filter(col("doc_id") % 10 === 3).unionAll(
      corpus.filter(col("doc_id") % 100 === 4)
        .select((col("doc_id") + 340000L).as("doc_id"), col("text")))
    DedupIndex.build(corpus, "doc_id", "text", d, prefix = prefix)
    def probe() = DedupIndex
      .incrementalDedup(batch, "doc_id", "text", prefix)
      .collect().map(_.toString).sorted.toSeq
    val want = probe()

    // simulate a long append history cheaply: empty committed waves are
    // exactly what the marker protocol produces for appends whose rows
    // all landed in other partitions than a given probe touches
    (1 until Maintenance.CompactWaveCount)
      .foreach(w => Bucketing.commitWave(spark, d, w))
    val r1 = Maintenance.forText(spark, prefix)
    assert(r1.action == "compact" &&
      r1.reasons.exists(_.contains("committed waves")), s"$r1")
    assert(DedupIndex.stats(spark, prefix).committedWaveCount ==
      Maintenance.CompactWaveCount)

    // 200 committed waves: verdicts identical AND every index scan still
    // carries partition filters with a pruned read — the rule above is
    // hygiene, not a correctness or pruning cliff
    (Maintenance.CompactWaveCount until 200)
      .foreach(w => Bucketing.commitWave(spark, d, w))
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val served = DedupIndex.incrementalDedup(batch, "doc_id", "text",
        prefix)
      val scans = served.queryExecution.executedPlan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec
            if f.tableIdentifier.exists(_.table.startsWith(prefix)) => f
      }
      assert(scans.nonEmpty && scans.forall(_.partitionFilters.nonEmpty),
        "an index scan lost its partition filters under a long wave history")
      assert(served.collect().map(_.toString).sorted.toSeq == want,
        "a long wave history changed verdicts")
    } finally spark.conf.unset("spark.sql.adaptive.enabled")
    // compact folds the history back to a single wave
    val d2 = java.nio.file.Files.createTempDirectory("mnt_wave_c").toString
    DedupIndex.compact(spark, d2, prefix)
    assert(DedupIndex.stats(spark, prefix).committedWaveCount == 1)
    assert(probe() == want)
  }
}
