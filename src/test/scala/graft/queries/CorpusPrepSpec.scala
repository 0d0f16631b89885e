package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** End-to-end pipeline: each stage's survivors satisfy that stage's
  * contract when re-checked independently, and the whole thing is one
  * lazy DAG (nothing runs until acted on). */
class CorpusPrepSpec extends SparkSpec {

  private lazy val docs = spark.read.parquet(s"$sfDir/documents.parquet")
  private lazy val bench = docs.filter(col("doc_id") % 97 === 0)
    .select(col("doc_id"), col("text"))

  private lazy val prep = CorpusPrep.prepare(
    docs, "doc_id", "text", "source", Some(bench))

  test("stage stats are monotone non-increasing from the input count") {
    val stats = prep.stats.orderBy("stage_ord").collect()
      .map(r => r.getAs[String]("stage") -> r.getAs[Long]("n_docs"))
    assert(stats.head == ("input" -> docs.count()))
    stats.sliding(2).foreach { case Array((s1, n1), (s2, n2)) =>
      assert(n2 <= n1, s"$s2 ($n2) grew over $s1 ($n1)")
    }
    // the pipeline actually dropped something at each meaningful stage
    val byName = stats.toMap
    assert(byName("quality") < byName("input"))
    assert(byName("near_dedup") < byName("exact_dedup"))
    assert(byName("decontaminated") < byName("near_dedup"))
  }

  test("survivors are clean under every stage's own re-check") {
    val surv = prep.survivors.cache()
    try {
      // no exact duplicates remain
      assert(TextOps.exactDedup(surv, "doc_id", "text")
        .filter(col("n_copies") > 1).count() === 0)
      // no near-dup pair at the pipeline threshold remains (cluster
      // representatives come one per component, so no edge can survive)
      assert(TextDedup.jaccardPairsOf(
        surv.select(col("doc_id"), col("text")), 0.5).count() === 0)
      // no surviving document shares a 3-gram with the eval set
      assert(TextOps.decontaminate(surv, bench, "doc_id", "text")
        .filter(col("contaminated") === 1L).count() === 0)
      // no un-scrubbed PII pattern survives
      val pii = TextPipeline.PiiPatterns.map(_._2)
        .map(p => regexp_count(col("text"), lit(p)).cast("long"))
        .reduce(_ + _)
      assert(surv.filter(pii > 0).count() === 0)
    } finally surv.unpersist()
  }

  test("release drops the run's dedup caches without disturbing results") {
    val before = prep.survivors.count()
    prep.release()
    // results recompute identically after the caches are gone
    assert(prep.survivors.count() === before)
  }

  test("graded contamination tolerance is monotone and re-checks clean") {
    val tolerant = CorpusPrep.prepare(docs, "doc_id", "text", "source",
      Some(bench), CorpusPrep.Config(contaminationMaxFrac = 0.05))
    val nStrict = prep.survivors.count()
    val nTolerant = tolerant.survivors.count()
    assert(nTolerant >= nStrict,
      s"tolerant policy ($nTolerant) kept fewer docs than strict ($nStrict)")
    // every tolerated survivor is within the configured fraction
    val over = TextOps.contaminationScore(tolerant.survivors, bench,
      "doc_id", "text").filter(col("overlap_frac") > 0.05).count()
    assert(over === 0, s"$over survivors exceed the contamination tolerance")
    tolerant.release()
  }

  test("vocab normalization stage equals fit+rewrite of the unnormalized survivors") {
    val plain = CorpusPrep.prepare(docs, "doc_id", "text", "source",
      Some(bench))
    val normed = CorpusPrep.prepare(docs, "doc_id", "text", "source",
      Some(bench), CorpusPrep.Config(vocabKeepK = Some(10)))
    val d5 = plain.survivors.select(col("doc_id"), col("text"))
    val want = TextPipeline.vocabRewriteOf(d5,
        TextPipeline.vocabKeepOf(d5, 10))
      .select(col("doc_id"), col("text"))
      .join(plain.survivors.select(col("doc_id"), col("source")), Seq("doc_id"))
    val got = normed.survivors
    assert(got.count() === plain.survivors.count(), "vocab stage changed the doc set")
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
      "normalized survivors differ from fit+rewrite of the plain survivors")
    plain.release(); normed.release()
  }

  test("importance stage drops target-unlike docs; every survivor passed its gate") {
    val target = docs.filter(col("doc_id") % 19 === 0)
      .select(col("doc_id"), col("text"))
    val sel = CorpusPrep.prepare(docs, "doc_id", "text", "source", Some(bench),
      CorpusPrep.Config(importanceTarget = Some(target)))
    try {
      val stats = sel.stats.orderBy("stage_ord").collect()
        .map(r => r.getAs[String]("stage") -> r.getAs[Long]("n_docs")).toMap
      assert(stats.contains("importance_select"), "stage missing from stats")
      assert(stats("importance_select") < stats("quality"),
        "importance stage dropped nothing — fixture degenerate")
      // reconstruct the stage's own keep set (model fitted target-vs-pool
      // on the post-quality survivors, exactly as the pipeline does) and
      // check every pipeline survivor was marked keep by it. NOT a
      // subset-of-plain-run check: removing docs before dedup can change
      // which cluster member is the min-id representative.
      val pool = docs.select(col("doc_id"), col("text")).join(
        TextDedup.qualityFilterOf(docs.select(col("doc_id"), col("text")))
          .filter(col("keep") === 1L).select(col("doc_id")),
        Seq("doc_id"), "left_semi")
      val keep = Curation.importanceScoreOf(pool,
        Curation.fitImportanceModel(target, pool, "text"), "text")
        .filter(col("keep")).select(col("doc_id"))
      val escaped = sel.survivors.select(col("doc_id"))
        .join(keep, Seq("doc_id"), "left_anti").count()
      assert(escaped == 0L, s"$escaped survivors never passed the importance gate")
    } finally sel.release()
  }

  test("length gate trims each stratum's short tail, subset of the ungated run") {
    val gated = CorpusPrep.prepare(docs, "doc_id", "text", "source",
      Some(bench), CorpusPrep.Config(lengthGatePct = Some((1, 10))))
    val plain = prep // shared ungated fixture
    val stats = gated.stats.orderBy("stage_ord").collect()
      .map(r => r.getAs[String]("stage") -> r.getAs[Long]("n_docs")).toMap
    assert(stats.contains("length_gate"), "gate stage missing from stats")
    assert(stats("length_gate") < stats("quality"),
      "gate dropped nothing — fixture degenerate")
    // gated survivors ⊆ plain survivors (the gate only removes)
    val extra = gated.survivors.select(col("doc_id"))
      .exceptAll(plain.survivors.select(col("doc_id"))).count()
    assert(extra == 0L, s"gated run admitted $extra docs the plain run dropped")
    // per stratum, the gate raised (or kept) the minimum surviving length
    val minLen = (p: org.apache.spark.sql.DataFrame) => p
      .select(col("source"), length(col("text")).as("l"))
      .groupBy("source").agg(min("l").as("m"))
    val cmp = minLen(gated.survivors).withColumnRenamed("m", "mg")
      .join(minLen(plain.survivors), Seq("source"))
    assert(cmp.filter(col("mg") < col("m")).count() == 0L,
      "a stratum's minimum length DROPPED under the gate")
    gated.release()
  }

  test("semantic stage drops exactly the embedding-dedup non-keepers of the near-dup survivors") {
    // embeddings cover ~4/5 of the corpus (vec_id ≅ doc_id, TESTDATA.md);
    // the %5==2 slice has NO embedding and must pass through unjudged
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id").as("doc_id"), col("embedding"))
      .filter(col("doc_id") % 5 =!= 2)
    // no bench/vocab stages → survivors ARE the near-dup survivors (d4),
    // so the stage contract is directly reconstructable
    val plain = CorpusPrep.prepare(docs, "doc_id", "text", "source", None)
    val sem = CorpusPrep.prepare(docs, "doc_id", "text", "source", None,
      CorpusPrep.Config(semantic =
        Some(CorpusPrep.SemanticStage(emb, minCos = 0.35))))
    try {
      val d4 = plain.survivors.select(col("doc_id"))
      val vecs = emb.join(d4, Seq("doc_id"), "left_semi")
      val keep = VectorOps.semanticDedupCells(vecs, "doc_id", "embedding",
        minCos = 0.35)
        .filter(col("is_kept") === 1L).select(col("vec_id").as("doc_id"))
      val expect = d4.join(vecs.select(col("doc_id")), Seq("doc_id"),
        "left_anti").unionByName(keep)
      val got = sem.survivors.select(col("doc_id"))
      assert(got.exceptAll(expect).count() == 0L &&
        expect.exceptAll(got).count() == 0L,
        "semantic-stage survivors diverge from the reconstructed contract")
      val stats = sem.stats.orderBy("stage_ord").collect()
        .map(r => r.getAs[String]("stage") -> r.getAs[Long]("n_docs")).toMap
      assert(stats.contains("semantic_dedup"), "stage missing from stats")
      assert(stats("semantic_dedup") < stats("near_dedup"),
        "semantic stage dropped nothing — fixture degenerate")
      // unjudged docs (no embedding) all survive the semantic stage
      val unjudgedLost = d4.filter(col("doc_id") % 5 === 2)
        .join(got, Seq("doc_id"), "left_anti").count()
      assert(unjudgedLost == 0L,
        s"$unjudgedLost docs without embeddings were dropped by the stage")
    } finally { plain.release(); sem.release() }
  }

  test("index-routed prep drops already-ingested content and restarts bit-identically") {
    // the restartable production shape (r14 verdict item 4): the dedup
    // stages probe ATTACHED persisted indexes, so a prep run drops
    // anything ALREADY INGESTED by previous runs — and a restarted run
    // (new session, re-attach, nothing retrained) is bit-identical
    val embsT = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val joined = docs.select(col("doc_id"), col("text"))
      .join(embsT, col("doc_id") === col("vec_id"))
      .select(col("doc_id"), col("text"), col("embedding"))
    val corpus = joined.filter(col("doc_id") % 2 === 0) // already ingested
    val tdir = java.nio.file.Files.createTempDirectory("prep_txt").toString
    val vdir = java.nio.file.Files.createTempDirectory("prep_vec").toString
    DedupIndex.build(corpus, "doc_id", "text", tdir, prefix = "prep_txt")
    VectorIndex.build(corpus, "doc_id", "embedding", vdir, minCos = 0.999,
      prefix = "prep_vec")

    // the pool: the odd half plus RE-IDDED copies of ingested docs — the
    // copies are in-pool unique (no within-run dup drops them), so only
    // the index stages can catch them
    val copies = docs.filter(col("doc_id") % 2 === 0 &&
        col("doc_id") % 20 === 4)
      .select((col("doc_id") + 800000L).as("doc_id"), col("text"),
        col("source"))
    val pool = docs.filter(col("doc_id") % 2 === 1)
      .select(col("doc_id"), col("text"), col("source"))
      .unionAll(copies)
    assert(copies.count() >= 3, "fixture degenerate: no corpus copies")
    // pool embeddings: natural ids keep their own vector; copies carry
    // their SOURCE doc's vector (exact cos-1.0 twins of ingested rows)
    val poolEmb = embsT.select(col("vec_id").as("doc_id"), col("embedding"))
      .join(pool.select(col("doc_id")), Seq("doc_id"), "left_semi")
      .unionAll(embsT.filter(col("vec_id") % 2 === 0 &&
          col("vec_id") % 20 === 4)
        .select((col("vec_id") + 800000L).as("doc_id"), col("embedding")))

    def localDf(s: org.apache.spark.sql.SparkSession,
        df: org.apache.spark.sql.DataFrame) =
      s.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](
          scala.jdk.CollectionConverters.SeqHasAsJava(
            df.collect().toSeq).asJava), df.schema)
    def run(s: org.apache.spark.sql.SparkSession) = {
      val p = localDf(s, pool)
      val e = localDf(s, poolEmb)
      CorpusPrep.prepare(p, "doc_id", "text", "source", None,
        CorpusPrep.Config(
          textIndexPrefix = Some("prep_txt"),
          semantic = Some(CorpusPrep.SemanticStage(e, minCos = 0.999,
            indexPrefix = Some("prep_vec")))))
    }
    val first = run(spark)
    val stats = first.stats.orderBy("stage_ord").collect()
      .map(r => r.getAs[String]("stage") -> r.getAs[Long]("n_docs")).toMap
    assert(stats.contains("index_text_dedup") &&
      stats.contains("index_semantic_dedup"), s"stages missing: $stats")
    assert(stats("index_text_dedup") < stats("semantic_dedup"),
      "index text stage dropped nothing — the corpus copies got through")
    val survIds = first.survivors.select("doc_id").collect()
      .map(_.getLong(0)).toSet
    // every re-idded ingested copy dropped (in-pool stages can't see them)
    val survivedCopies = copies.select("doc_id").collect()
      .map(_.getLong(0)).filter(survIds)
    assert(survivedCopies.isEmpty,
      s"already-ingested copies survived: ${survivedCopies.take(5).toSeq}")
    // stage contract: every survivor re-checks as NEW against both indexes
    val textRecheck = DedupIndex.incrementalDedup(
      first.survivors.select(col("doc_id"), col("text")), "doc_id", "text",
      "prep_txt").filter(col("verdict") =!= "new").count()
    assert(textRecheck == 0, s"$textRecheck survivors are text-dups of the corpus")
    val vecRecheck = VectorIndex.incrementalDedup(
      poolEmb.join(first.survivors.select(col("doc_id")), Seq("doc_id"),
        "left_semi"),
      "doc_id", "embedding", "prep_vec", minCos = 0.999)
      .filter(col("verdict") =!= "new").count()
    assert(vecRecheck == 0, s"$vecRecheck survivors are vector-dups of the corpus")
    first.release()

    // RESTART: a fresh session whose catalog forgot everything re-attaches
    // and prepares the same pool — survivors bit-identical, zero retraining
    (Seq("hashes", "bands", "shingles", "meta", "tombs").map(t => s"prep_txt_$t") ++
      Seq("meta", "cents", "pqbooks", "vecs", "cells", "bands", "pqcodes",
        "tombs").map(t => s"prep_vec_$t"))
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    val fresh = spark.newSession()
    assert(!fresh.catalog.tableExists("prep_txt_bands"))
    DedupIndex.attach(fresh, tdir, "prep_txt")
    VectorIndex.attach(fresh, vdir, "prep_vec")
    val second = run(fresh)
    val survIds2 = second.survivors.select("doc_id").collect()
      .map(_.getLong(0)).toSet
    assert(survIds2 == survIds,
      "restarted prep diverged from the original run")
    second.release()
  }

  test("packed output covers every survivor with valid bin assignments") {
    val p = prep.packed.cache()
    try {
      assert(p.count() === prep.survivors.count())
      assert(p.filter(col("bin_offset") < 0 ||
        col("bin_offset") >= TextPipeline.PackBudget).count() === 0)
      // bins are dense per stratum
      val bins = p.groupBy("source").agg(
        countDistinct(col("bin_id")).as("n_bins"), max("bin_id").as("mx"))
      assert(bins.filter(col("mx") =!= col("n_bins") - 1).count() === 0)
    } finally p.unpersist()
  }
}
