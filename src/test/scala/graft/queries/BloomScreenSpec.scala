package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The map-only Bloom decontamination screen
  * ([[TextOps.decontaminationScreen]]): its one hard guarantee — no
  * false negatives at ANY filter size — plus the join-free plan shape
  * and the screen→exact composition it exists for. */
class BloomScreenSpec extends SparkSpec {

  private lazy val docs = Tables.load(spark, sfDir, "documents")
  // q61's deterministic split: %97==0 is the eval set
  private lazy val corpus = docs.filter(col("doc_id") % 97 =!= 0)
  private lazy val bench = docs.filter(col("doc_id") % 97 === 0)

  private lazy val exactContaminated: Set[Long] =
    TextOps.contaminationScore(corpus, bench, "doc_id", "text")
      .filter(col("n_overlap") > 0)
      .collect().map(_.getAs[Long]("doc_id")).toSet

  test("no false negatives: the screen flags every exactly-contaminated doc, even tiny filters") {
    for (bits <- Seq(1L << 22, 1L << 12)) { // 512 KiB and 0.5 KiB filters
      val flagged = TextOps.decontaminationScreen(
        corpus, bench, "doc_id", "text", numBits = bits)
        .filter(col("flagged") === 1L)
        .collect().map(_.getAs[Long]("doc_id")).toSet
      val missed = exactContaminated -- flagged
      assert(missed.isEmpty, s"bits=$bits missed $missed")
    }
  }

  test("false positives shrink with filter size; a roomy filter is near-exact on the fixtures") {
    def fp(bits: Long): Int = {
      val flagged = TextOps.decontaminationScreen(
        corpus, bench, "doc_id", "text", numBits = bits)
        .filter(col("flagged") === 1L)
        .collect().map(_.getAs[Long]("doc_id")).toSet
      (flagged -- exactContaminated).size
    }
    val roomy = fp(1L << 22)
    val tiny = fp(1L << 12)
    info(s"false positives: roomy(512KiB)=$roomy tiny(0.5KiB)=$tiny " +
      s"of ${corpus.count()} docs (${exactContaminated.size} truly contaminated)")
    assert(roomy <= tiny, s"more FPs at MORE bits: $roomy > $tiny")
    assert(roomy == 0, s"512 KiB filter should be FP-free on ~15k eval shingles: $roomy")
  }

  test("the screen plan is join-free and shuffle-free (pure projection over the cached sets)") {
    val df = TextOps.decontaminationScreen(corpus, bench, "doc_id", "text")
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("Join"), s"screen grew a join:\n${p.take(1500)}")
    // no DATA-MOVEMENT shuffle (join/aggregation exchanges); the explicit
    // input-parallelism repartition Tables.parallelized places under the
    // shingle derivation (REPARTITION_BY_NUM origin) is allowed — it is
    // the identity at production split counts
    val exec = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.executedPlan
      case other => other
    }
    val moves = exec.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
          if e.shuffleOrigin != org.apache.spark.sql.execution.exchange.REPARTITION_BY_NUM => e
    }
    assert(moves.isEmpty, s"screen shuffled:\n${p.take(1500)}")
  }

  test("screen -> exact composition reproduces the exact contaminated set") {
    // the production shape: exact pass runs only over the flagged sliver
    val flagged = TextOps.decontaminationScreen(
      corpus, bench, "doc_id", "text")
      .filter(col("flagged") === 1L).select("doc_id")
    val sliver = corpus.join(flagged, Seq("doc_id"), "left_semi")
    val got = TextOps.contaminationScore(sliver, bench, "doc_id", "text")
      .filter(col("n_overlap") > 0)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(got == exactContaminated)
  }

  test("buildSized derives bits from (item count, target fpp) and holds the measured FP rate") {
    val d = java.nio.file.Files.createTempDirectory("bloom_scr_sz").toString
    val prefix = "bloom_screen_sz"
    val fpp = 1e-4
    val numBits = BloomScreen.buildSized(bench, "doc_id", "text", d,
      prefix = prefix, fpp = fpp)
    // the persisted row carries the sizing inputs, and the bit count is
    // exactly the standard formula at the persisted item count
    val row = spark.table(prefix).head()
    val nItems = row.getAs[Long]("n_items")
    assert(nItems > 100L, s"fixture degenerate: $nItems eval shingles")
    assert(row.getAs[Double]("fpp") == fpp)
    assert(numBits == BloomScreen.bitsFor(nItems, fpp) &&
      numBits == row.getAs[Long]("num_bits"),
      s"sized bits $numBits != formula ${BloomScreen.bitsFor(nItems, fpp)}")

    val flagged = BloomScreen.screen(corpus, "doc_id", "text", prefix)
      .filter(col("flagged") === 1L)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    // the hard guarantee survives auto-sizing: no false negatives
    assert((exactContaminated -- flagged).isEmpty,
      s"sized screen missed ${(exactContaminated -- flagged).take(5)}")
    // measured doc-level false-flag rate: a clean doc with s distinct
    // shingles false-flags at ≈ s·fpp, so the corpus-level expectation is
    // meanShingles·fpp. The slack is 10×: at this fixture's TINY filter
    // (≈7k bits, k≈13 hashes) the double-hashing (Kirsch–Mitzenmacher)
    // scheme Spark's BloomFilter uses runs a measured ~6× over the ideal
    // per-shingle rate — an artifact of small m with many derived hashes
    // that vanishes at production sizes (n in the millions ⇒ m in the
    // tens of MBits); the bound still catches a mis-sized filter, which
    // would blow past it by orders of magnitude.
    val cleanDocs = corpus.count() - exactContaminated.size
    val falseFlags = (flagged -- exactContaminated).size
    val meanShingles = TextOps
      .decontaminate(corpus, bench, "doc_id", "text")
      .agg(avg(col("n_shingles"))).head().getDouble(0)
    val bound = math.max(10.0 * meanShingles * fpp, 0.002)
    info(f"measured doc FP rate ${falseFlags.toDouble / cleanDocs}%.5f " +
      f"(bound $bound%.5f at fpp=$fpp, mean $meanShingles%.0f shingles/doc, " +
      f"$numBits bits for $nItems items)")
    assert(falseFlags.toDouble / cleanDocs <= bound,
      s"$falseFlags false flags of $cleanDocs clean docs exceeds $bound")
  }

  test("a fresh catalog screens bit-identically off the persisted filter, map-only") {
    val want = TextOps.decontaminationScreen(corpus, bench,
      "doc_id", "text").collect().map(_.toString).sorted.toSeq
    assert(want.exists(_.contains(",1]")) && want.exists(_.contains(",0]")),
      s"degenerate fixture: both flags should occur (${want.take(3)})")

    val d = java.nio.file.Files.createTempDirectory("bloom_scr").toString
    BloomScreen.build(bench, "doc_id", "text", d)

    // new-JVM scenario: catalog forgets the table, files survive
    spark.sql("DROP TABLE IF EXISTS bloom_screen")
    val fresh = spark.newSession()
    assert(!fresh.catalog.tableExists("bloom_screen"))
    BloomScreen.attach(fresh, d)

    // LOCAL-relation corpus: any file scan in the served plan would be
    // benchmark recomputation; the screen must also plan NO exchange
    // (pure map — the 100 TB shape: bits broadcast as a literal)
    val rows = corpus.select("doc_id", "text").collect().toSeq
    val local = fresh.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](
        scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava),
      corpus.select("doc_id", "text").schema)
    fresh.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val screened = BloomScreen.screen(local, "doc_id", "text")
      val exec = screened.queryExecution.executedPlan
      assert(exec.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }.isEmpty, "screen plan scans files — benchmark recomputation?")
      assert(exec.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
      }.isEmpty, "screen plan shuffles — must be map-only")
      val got = screened.collect().map(_.toString).sorted.toSeq
      assert(got == want,
        "persisted screen diverged from the in-session screen")
    } finally fresh.conf.unset("spark.sql.adaptive.enabled")
  }
}
