package graft.queries

import graft.SparkSpec
import graft.operators.Bucketing
import org.apache.spark.sql.functions._

/** The ENFORCED writer-quiesce contract (r16 verdict item 2): compact /
  * rebuild / the Maintenance executors snapshot the committed wave set
  * once, so a wave committing mid-window is silently absent from the
  * output — until r17 the "quiesce writers" requirement lived only in
  * scaladoc while the machinery to check it (wave leases) was already on
  * disk. [[Bucketing.requireQuiesced]] refuses when a lease younger than
  * `spark.graft.writerLiveTtlMs` exists (a writer presumed mid-append);
  * `force = true` or a stale (crashed) lease proceeds. The r16 advisor's
  * companion hole is pinned too: a HEALTHY in-flight rename-mode append
  * (a young `.stage_*` root) must never alone flip the Maintenance
  * recommendation to an executed compact — only STALE roots are a compact
  * reason; young ones are a warning. */
class QuiesceSpec extends SparkSpec {

  private lazy val docs = Tables.load(spark, sfDir, "documents")
    .select("doc_id", "text")
  private lazy val emb = Tables.load(spark, sfDir, "embeddings")
    .select("vec_id", "embedding")

  test("compact refuses while a writer holds a live lease; force or release proceeds") {
    val d = java.nio.file.Files.createTempDirectory("qsc_txt").toString
    val prefix = "qsc_txt"
    val corpus = docs.filter(col("doc_id") % 10 =!= 3)
    DedupIndex.build(corpus, "doc_id", "text", d, prefix = prefix)

    // the writer's first act is claiming a lease — this IS the mid-append
    // state (deterministic stand-in for a Future caught mid-write)
    val w = Bucketing.acquireWave(spark, d,
      Seq("hashes", "bands", "shingles"))
    val d2 = java.nio.file.Files.createTempDirectory("qsc_txt2").toString
    val e = intercept[IllegalStateException](
      DedupIndex.compact(spark, d2, prefix))
    assert(e.getMessage.contains(s"_lease_$w") &&
      e.getMessage.contains("force"), e.getMessage)

    // force: the operator asserting the writer is dead/drained
    DedupIndex.compact(spark, d2, prefix, force = true)
    // the lease belongs to the RETIRED history now (compact flipped the
    // catalog to d2 and started a fresh wave history there)
    assert(Bucketing.leasedWaves(spark, d2).isEmpty)

    // released lease: no refusal — the normal maintenance path
    val w2 = Bucketing.acquireWave(spark, d2,
      Seq("hashes", "bands", "shingles"))
    Bucketing.releaseWave(spark, d2, w2)
    val d3 = java.nio.file.Files.createTempDirectory("qsc_txt3").toString
    DedupIndex.compact(spark, d3, prefix)
  }

  test("a genuinely concurrent appender overlapping compact: guard fires mid-append; after the writer lands, compact keeps its wave") {
    val d = java.nio.file.Files.createTempDirectory("qsc_ovl").toString
    val prefix = "qsc_ovl"
    val corpus = docs.filter(col("doc_id") % 10 =!= 3)
    DedupIndex.build(corpus, "doc_id", "text", d, prefix = prefix)
    val batch = docs.filter(col("doc_id") % 20 === 3).limit(8)
      .select((col("doc_id") + 870000L).as("doc_id"), col("text"))
      .localCheckpoint(true)

    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val writer = Future(DedupIndex.append(batch, "doc_id", "text", prefix))
    // catch the writer mid-append (lease claimed, wave not yet committed)
    val deadline = System.nanoTime + 60e9.toLong
    while (Bucketing.leasedWaves(spark, d).isEmpty &&
        !writer.isCompleted && System.nanoTime < deadline) Thread.sleep(5)
    val dOut = java.nio.file.Files.createTempDirectory("qsc_ovl2").toString
    if (Bucketing.leasedWaves(spark, d).nonEmpty)
      // the guard protects the window: either it fires (writer still
      // mid-append when compact checks) or the writer committed in the
      // gap — both are CONSISTENT outcomes; the forbidden one (compact
      // proceeding while the lease is live) can only surface as a lost
      // wave, asserted below
      try DedupIndex.compact(spark, dOut, prefix)
      catch { case e: IllegalStateException =>
        assert(e.getMessage.contains("_lease_"), e.getMessage) }
    Await.result(writer, 5.minutes)
    // after the writer lands, a compact must carry its wave
    val dOut2 = java.nio.file.Files.createTempDirectory("qsc_ovl3").toString
    DedupIndex.compact(spark, dOut2, prefix)
    val st = DedupIndex.stats(spark, prefix)
    assert(st.docs == corpus.count() + batch.count(),
      s"the writer's wave was lost across the maintenance window: $st")
  }

  test("runText/runVectors enforce the guard; force executes") {
    val d = java.nio.file.Files.createTempDirectory("qsc_run").toString
    val prefix = "qsc_run"
    val corpus = docs.filter(col("doc_id") % 10 =!= 3)
    DedupIndex.build(corpus, "doc_id", "text", d, prefix = prefix)
    // >10% takedown: a real compact reason, so runText will try to act
    val removed = corpus.filter(col("doc_id") % 8 === 1)
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    DedupIndex.remove(spark, removed, prefix)
    val w = Bucketing.acquireWave(spark, d,
      Seq("hashes", "bands", "shingles"))
    val d2 = java.nio.file.Files.createTempDirectory("qsc_run2").toString
    intercept[IllegalStateException](Maintenance.runText(spark, prefix, d2))
    val (rec, acted) = Maintenance.runText(spark, prefix, d2, force = true)
    assert(acted && rec.action == "compact", s"$rec")
    assert(w >= 1) // silence unused warning; the lease did its job

    val dv = java.nio.file.Files.createTempDirectory("qsc_vec").toString
    val vPrefix = "qsc_vec"
    val vCorpus = emb.filter(col("vec_id") % 7 =!= 3)
    VectorIndex.build(vCorpus, "vec_id", "embedding", dv, minCos = 0.35,
      prefix = vPrefix)
    val big = vCorpus.filter(col("vec_id") % 3 === 0)
      .select((col("vec_id") + 880000L).as("vec_id"), col("embedding"))
    VectorIndex.append(big, "vec_id", "embedding", vPrefix)
    Bucketing.acquireWave(spark, dv, Seq("vecs", "bands", "cells",
      "pqcodes"))
    val dv2 = java.nio.file.Files.createTempDirectory("qsc_vec2").toString
    intercept[IllegalStateException](
      Maintenance.runVectors(spark, vPrefix, dv2))
    val (vRec, vActed) = Maintenance.runVectors(spark, vPrefix, dv2,
      force = true)
    assert(vActed && vRec.action == "rebuild", s"$vRec")
  }

  test("a young staging root warns but never alone triggers compact; a stale one is a reason") {
    val d = java.nio.file.Files.createTempDirectory("qsc_stg").toString
    val prefix = "qsc_stg"
    val corpus = docs.filter(col("doc_id") % 10 =!= 3)
    DedupIndex.build(corpus, "doc_id", "text", d, prefix = prefix)
    // a healthy in-flight rename-mode append looks like this: a young
    // .stage_* root (plus a lease, released here to isolate the staging
    // signal)
    val p = new org.apache.hadoop.fs.Path(s"$d/.stage_w99/${prefix}_hashes")
    p.getFileSystem(spark.sessionState.newHadoopConf()).mkdirs(p)

    val fresh = Maintenance.forText(spark, prefix)
    assert(fresh.action == "none" &&
      !fresh.reasons.exists(_.contains("staging")),
      s"a live append alone triggered an executed compact: $fresh")
    assert(fresh.warnings.exists(_.contains("in flight")), s"$fresh")
    val st = DedupIndex.stats(spark, prefix)
    assert(st.stagingDirs == 1 && st.staleStagingDirs == 0, s"$st")

    // the same root past the TTL is crash garbage — a reason to act, and
    // being garbage-ONLY, the cheap in-place reclaim (not a full-rewrite
    // compact) is the recommended lever
    spark.conf.set("spark.graft.writerLiveTtlMs", "0")
    try {
      val stale = Maintenance.forText(spark, prefix)
      assert(stale.action == "reclaim" &&
        stale.reasons.exists(_.contains("STALE staging")), s"$stale")
      assert(DedupIndex.stats(spark, prefix).staleStagingDirs == 1)
    } finally spark.conf.unset("spark.graft.writerLiveTtlMs")
  }
}
