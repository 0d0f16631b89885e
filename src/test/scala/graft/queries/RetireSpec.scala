package graft.queries

import graft.SparkSpec
import graft.operators.Bucketing
import org.apache.spark.sql.functions._

/** Old-artifact RETIREMENT (r17 verdict item 2): an in-place
  * compact/rebuild flips the catalog to a fresh directory and — before
  * r18 — stranded the old location forever: a full dead copy of the
  * index per maintenance cycle, nobody's job to delete. The rewrite now
  * records the stranded location (`_prior` at the new dir, chains carried
  * forward), stats/Maintenance surface it, and `retirePrior` deletes it
  * under the same guard discipline as every destructive op: live writer
  * leases and live READER markers (a replica still serving off the old
  * artifact) refuse the delete; force overrides. */
class RetireSpec extends SparkSpec {

  private lazy val docs = Tables.load(spark, sfDir, "documents")
    .select("doc_id", "text")
  private lazy val emb = Tables.load(spark, sfDir, "embeddings")
    .select("vec_id", "embedding")

  private def exists(p: String): Boolean = {
    val path = new org.apache.hadoop.fs.Path(p)
    path.getFileSystem(spark.sessionState.newHadoopConf()).exists(path)
  }

  /** Most arms test the MARKER guards, not the stranded-age grace (its
    * own test below) — disable the grace so a just-compacted prior is
    * immediately retirable once unblocked. */
  private def withRetireGrace0[A](body: => A): A = {
    spark.conf.set("spark.graft.retireGraceMs", "0")
    try body finally spark.conf.unset("spark.graft.retireGraceMs")
  }

  test("text: compact records the stranded prior; retire is guarded by readers and leases, then deletes; probes unaffected") { withRetireGrace0 {
    val a = java.nio.file.Files.createTempDirectory("ret_txt_a").toString
    val b = java.nio.file.Files.createTempDirectory("ret_txt_b").toString
    val prefix = "ret_txt"
    val corpus = docs.filter(col("doc_id") % 10 =!= 3).limit(80)
    DedupIndex.build(corpus, "doc_id", "text", a, prefix = prefix)
    val batch = docs.filter(col("doc_id") % 10 === 3).limit(6)
      .select((col("doc_id") + 400000L).as("doc_id"), col("text"))
      .localCheckpoint(true)
    DedupIndex.append(batch, "doc_id", "text", prefix)

    val twins = batch.select((col("doc_id") + 10000L).as("doc_id"),
      col("text"))
    def probe() = DedupIndex.incrementalDedup(twins, "doc_id", "text",
      prefix).collect().map(_.toString).sorted.toSeq
    val before = probe()
    assert(before.forall(_.contains("exact_dup")), s"fixture: $before")

    DedupIndex.compact(spark, b, prefix)
    // the old location is recorded as stranded, surfaced by stats AND the
    // maintenance advisory
    val st = DedupIndex.stats(spark, prefix)
    assert(st.priorDirs.size == 1 && st.priorDirs.head.contains("ret_txt_a"),
      s"priorDirs: ${st.priorDirs}")
    val rec = Maintenance.forText(spark, prefix)
    assert(rec.warnings.exists(_.contains("stranded prior")), s"$rec")

    // a live READER on the old artifact refuses the retire
    val token = Bucketing.registerReader(spark, a)
    val e1 = intercept[IllegalStateException](
      DedupIndex.retirePrior(spark, prefix))
    assert(e1.getMessage.contains("_reader_") && exists(a), e1.getMessage)
    Bucketing.unregisterReader(spark, a, token)

    // a live writer LEASE on the old artifact refuses too
    val w = Bucketing.acquireWave(spark, a, Seq("hashes"))
    val e2 = intercept[IllegalStateException](
      DedupIndex.retirePrior(spark, prefix))
    assert(e2.getMessage.contains(s"_lease_$w") && exists(a), e2.getMessage)
    Bucketing.releaseWave(spark, a, w)

    // unblocked: the old copy is deleted and the inventory cleared
    val retired = DedupIndex.retirePrior(spark, prefix)
    assert(retired.size == 1 && retired.head.contains("ret_txt_a"),
      s"$retired")
    assert(!exists(a), "old index location still on disk after retire")
    assert(DedupIndex.stats(spark, prefix).priorDirs.isEmpty)
    assert(DedupIndex.retirePrior(spark, prefix).isEmpty) // idempotent

    // the live index is untouched: a fresh-catalog attach at the new
    // location serves the SAME verdicts
    DedupIndex.attach(spark, b, prefix)
    assert(probe() == before, "retire changed live verdicts")
  } }

  test("chained compacts carry the stranded inventory forward; one retire reclaims the whole chain") { withRetireGrace0 {
    val a = java.nio.file.Files.createTempDirectory("ret_ch_a").toString
    val b = java.nio.file.Files.createTempDirectory("ret_ch_b").toString
    val c = java.nio.file.Files.createTempDirectory("ret_ch_c").toString
    val prefix = "ret_ch"
    DedupIndex.build(docs.limit(40), "doc_id", "text", a, prefix = prefix)
    DedupIndex.compact(spark, b, prefix)
    DedupIndex.compact(spark, c, prefix)
    // C knows about BOTH stranded copies, oldest first — retiring B alone
    // must not orphan A's record (the chain rides the _prior file)
    val priors = Bucketing.priorLocations(spark, c)
    assert(priors.size == 2 && priors(0).contains("ret_ch_a") &&
      priors(1).contains("ret_ch_b"), s"$priors")
    val retired = DedupIndex.retirePrior(spark, prefix)
    assert(retired.size == 2 && !exists(a) && !exists(b), s"$retired")
    assert(Bucketing.priorLocations(spark, c).isEmpty)
  } }

  test("vector: rebuild records the prior; retire deletes it with knn/verdict parity") { withRetireGrace0 {
    val a = java.nio.file.Files.createTempDirectory("ret_vec_a").toString
    val b = java.nio.file.Files.createTempDirectory("ret_vec_b").toString
    val prefix = "ret_vec"
    val corpus = emb.filter(col("vec_id") % 7 =!= 3)
    VectorIndex.build(corpus, "vec_id", "embedding", a, minCos = 0.35,
      prefix = prefix)
    val queries = emb.filter(col("vec_id") % 14 === 3).limit(5)
      .select((col("vec_id") + 500000L).as("vec_id"), col("embedding"))
      .localCheckpoint(true)
    VectorIndex.rebuild(spark, b, prefix)
    val st = VectorIndex.stats(spark, prefix)
    assert(st.priorDirs.size == 1 && st.priorDirs.head.contains("ret_vec_a"),
      s"${st.priorDirs}")
    assert(Maintenance.forVectors(spark, prefix).warnings
      .exists(_.contains("stranded prior")))
    // parity frame BEFORE the retire, served off the rebuilt location
    def serve() = (
      VectorIndex.incrementalDedup(queries, "vec_id", "embedding", prefix)
        .collect().map(_.toString).sorted.toSeq,
      VectorIndex.knn(queries, "vec_id", "embedding", 3, prefix)
        .collect().map(_.toString).sorted.toSeq)
    val before = serve()
    val retired = VectorIndex.retirePrior(spark, prefix)
    assert(retired.size == 1 && !exists(a), s"$retired")
    assert(VectorIndex.stats(spark, prefix).priorDirs.isEmpty)
    assert(serve() == before, "retire changed vector serving")
  } }

  test("a reused output directory does not inherit a past experiment's prior inventory") {
    // retire acting on a STALE _prior from an earlier failed run could
    // delete live directories — the output-dir reset must clear it
    val a = java.nio.file.Files.createTempDirectory("ret_rs_a").toString
    val out = java.nio.file.Files.createTempDirectory("ret_rs_o").toString
    val fs = new org.apache.hadoop.fs.Path(out)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val stale = new org.apache.hadoop.fs.Path(s"$out/_prior")
    val os = fs.create(stale, true)
    os.write("/tmp/somebody-elses-live-dir".getBytes("UTF-8")); os.close()
    fs.create(new org.apache.hadoop.fs.Path(s"$out/_reader_deadbeef"), true)
      .close()
    val prefix = "ret_rs"
    DedupIndex.build(docs.limit(30), "doc_id", "text", a, prefix = prefix)
    DedupIndex.compact(spark, out, prefix)
    val priors = Bucketing.priorLocations(spark, out)
    assert(priors.size == 1 && priors.head.contains("ret_rs_a"),
      s"stale inventory survived the rewrite: $priors")
    assert(Bucketing.readerAges(spark, out).isEmpty,
      "stale reader marker survived the rewrite")
  }

  test("minimum-stranded-age grace refuses a fresh retire — even forced — until the inventory ages") {
    // r18 verdict item 3: reader markers are opt-in, so force could
    // delete the copy an UNREGISTERED replica still serves mid-rollover;
    // the stranded-age grace (default = writerLiveTtlMs) is the one
    // guard independent of markers, and force does not override it
    val a = java.nio.file.Files.createTempDirectory("ret_gr_a").toString
    val b = java.nio.file.Files.createTempDirectory("ret_gr_b").toString
    val prefix = "ret_gr"
    DedupIndex.build(docs.limit(30), "doc_id", "text", a, prefix = prefix)
    DedupIndex.compact(spark, b, prefix)
    val e = intercept[graft.operators.ConflictException](
      DedupIndex.retirePrior(spark, prefix, force = true))
    assert(e.getMessage.contains("minimum-stranded-age") && exists(a),
      e.getMessage)
    // age the inventory past the grace (the catalog flip happened long
    // ago) — the same forced retire now proceeds
    val p = new org.apache.hadoop.fs.Path(s"$b/_prior")
    p.getFileSystem(spark.sessionState.newHadoopConf())
      .setTimes(p, System.currentTimeMillis() -
        Bucketing.retireGraceMs(spark) - 1000L, -1)
    val retired = DedupIndex.retirePrior(spark, prefix, force = true)
    assert(retired.size == 1 && !exists(a), s"$retired")
  }

  test("a compact nested under the old root never records the ancestor; retire never deletes an overlapping prior") {
    // r18 advisor (medium): /data/idx -> /data/idx/v2 would inventory an
    // ANCESTOR of the live index — retiring it recursively deletes the
    // live data, and the marker guards sit under the nested dir where
    // they never fire. Both ends now filter containment.
    val a = java.nio.file.Files.createTempDirectory("ret_ov_a").toString
    val nested = s"$a/v2"
    val prefix = "ret_ov"
    DedupIndex.build(docs.limit(30), "doc_id", "text", a, prefix = prefix)
    DedupIndex.compact(spark, nested, prefix)
    assert(Bucketing.priorLocations(spark, nested).isEmpty,
      "ancestor of the live dir was recorded as a retirable prior")
    // belt: a hand-written inventory naming the ancestor is skipped too
    val fs = new org.apache.hadoop.fs.Path(nested)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val inv = new org.apache.hadoop.fs.Path(s"$nested/_prior")
    val os = fs.create(inv, true)
    os.write(a.getBytes("UTF-8")); os.close()
    spark.conf.set("spark.graft.retireGraceMs", "0")
    try {
      assert(Bucketing.retirePriors(spark, nested, force = true).isEmpty)
      assert(exists(nested) && exists(a), "retire deleted the live index")
    } finally spark.conf.unset("spark.graft.retireGraceMs")
    // the normalized containment check itself, both directions + non-overlap
    assert(Bucketing.pathOverlaps(spark, a, nested))
    assert(Bucketing.pathOverlaps(spark, nested, a))
    assert(!Bucketing.pathOverlaps(spark, s"${a}x", a),
      "sibling with a shared string prefix must not read as nested")
  }
}
