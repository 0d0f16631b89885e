package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The generic column-parameterized operators must produce EXACTLY what
  * the oracle-checked queries produce on the same data — this is what
  * lets TextOps inherit the DuckDB-verified semantics. Inputs are fed
  * with RENAMED columns to prove real genericity. */
class TextOpsSpec extends SparkSpec {

  /** documents with renamed columns, as an arbitrary user frame. */
  private def renamed: DataFrame =
    Tables.load(spark, sfDir, "documents")
      .select(col("doc_id").as("id"), col("text").as("body"))

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).toSeq

  test("nearDupPairs == q28 on the documents table") {
    assert(rows(TextOps.nearDupPairs(renamed, "id", "body")) ==
      rows(TextDedup.q28JaccardPairs(spark, sfDir)))
  }

  test("cappedNearDupPairs == q41 on the documents table") {
    assert(rows(TextOps.cappedNearDupPairs(renamed, "id", "body", 0.5, 100L)) ==
      rows(TextDedup.q41JaccardCapped(spark, sfDir)))
  }

  test("dedupClusters == q40 on the documents table") {
    assert(rows(TextOps.dedupClusters(renamed, "id", "body")) ==
      rows(TextDedup.q40DedupClusters(spark, sfDir)))
  }

  test("dedupClusters with dfCap above the corpus max df is identical to uncapped") {
    // sf corpus max shingle df is 25, so cap=100 changes nothing — the
    // capped candidate path must converge to the exact same clusters
    assert(rows(TextOps.dedupClusters(renamed, "id", "body",
      dfCap = Some(100L))) ==
      rows(TextDedup.q40DedupClusters(spark, sfDir)))
  }

  test("softDedupWeights == q83 on the documents table") {
    val got = TextOps.softDedupWeights(renamed, "id", "body")
    assert(rows(got) == rows(TextDedup.q83SoftDedupWeights(spark, sfDir)))
    // every member of a cluster carries the same weight = round(1/n, 6)
    got.collect().foreach { r =>
      val n = r.getAs[Long]("n_members")
      assert(r.getAs[Double]("weight") ==
        BigDecimal(1.0 / n).setScale(6, BigDecimal.RoundingMode.HALF_UP)
          .toDouble)
    }
  }

  test("exactDedup == q27 keepers and copy counts") {
    val got = TextOps.exactDedup(renamed, "id", "body").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val want = TextDedup.q27ExactDedup(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("keeper_id"), r.getAs[Long]("n_copies"))).toSeq
    assert(got == want)
  }

  test("incrementalDedup == q48 on the hash-mod split") {
    val bucket = conv(substring(md5(col("id").cast("string")), 1, 8), 16, 10)
      .cast("long") % 1000
    val batch = renamed.filter(bucket < 100)
    val corpus = renamed.filter(bucket >= 100)
    assert(rows(TextOps.incrementalDedup(batch, corpus, "id", "body")) ==
      rows(TextDedup.q48IncrementalDedup(spark, sfDir)))
  }

  test("rollingStats == q64 on renamed columns") {
    val r = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id").as("id"), col("lang"), col("n_chars").as("len"))
    assert(rows(TextOps.rollingStats(r, "id", "lang", col("len"))) ==
      rows(TextPipeline.q64RollingStats(spark, sfDir)))
  }

  test("decontaminate == q49 on the modulo split") {
    val corpus = renamed.filter(col("id") % 97 =!= 0)
    val bench = renamed.filter(col("id") % 97 === 0)
    assert(rows(TextOps.decontaminate(corpus, bench, "id", "body")) ==
      rows(TextDedup.q49Decontamination(spark, sfDir)))
  }

  test("evalNovelty == q93 on the modulo split") {
    val corpus = renamed.filter(col("id") % 97 =!= 0)
    val bench = renamed.filter(col("id") % 97 === 0)
    assert(rows(TextOps.evalNovelty(bench, corpus, "id", "body")) ==
      rows(TextDedup.q93EvalNovelty(spark, sfDir)))
  }

  test("evalNovelty counts corpus-seen shingles per bench doc") {
    val s = spark
    import s.implicits._
    // bench doc 0: "a b c d" -> shingles {a_b_c, b_c_d}; corpus doc 1
    // contains a_b_c (twice, to prove distinct-collapse) but not b_c_d
    val bench = Seq((0L, "a b c d")).toDF("id", "body")
    val corpus = Seq((1L, "x a b c y a b c z")).toDF("id", "body")
    val r = TextOps.evalNovelty(bench, corpus, "id", "body").collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getAs[Long]("n_shingles") == 2L)
    assert(row.getAs[Long]("n_seen") == 1L)
    assert(row.getAs[Double]("novelty_frac") == 0.5)
  }

  test("nGrams parameterizes the decontamination window (2-gram and 8-gram)") {
    val s = spark
    import s.implicits._
    val bench = Seq((0L, "a b c")).toDF("id", "body") // 2-grams: {a b, b c}
    val corpus = Seq((1L, "x a b y")).toDF("id", "body") // contains "a b"
    // 2-gram window: one of corpus doc1's three 2-grams overlaps bench
    val d2 = TextOps.decontaminate(corpus, bench, "id", "body", nGrams = 2)
      .collect().head
    assert(d2.getAs[Long]("n_shingles") == 3L)
    assert(d2.getAs[Long]("n_overlap") == 1L)
    assert(d2.getAs[Long]("contaminated") == 1L)
    // 3-gram window (default): "x a b" / "a b y" share nothing with "a b c"
    val d3 = TextOps.decontaminate(corpus, bench, "id", "body").collect().head
    assert(d3.getAs[Long]("n_overlap") == 0L && d3.getAs[Long]("contaminated") == 0L)
    // window longer than every doc: zero shingles everywhere, all clean
    val d8 = TextOps.decontaminate(corpus, bench, "id", "body", nGrams = 8)
      .collect().head
    assert(d8.getAs[Long]("n_shingles") == 0L && d8.getAs[Long]("contaminated") == 0L)
    // the eval-side view agrees at the same window
    val nv = TextOps.evalNovelty(bench, corpus, "id", "body", nGrams = 2)
      .collect().head
    assert(nv.getAs[Long]("n_shingles") == 2L && nv.getAs[Long]("n_seen") == 1L)
    assert(nv.getAs[Double]("novelty_frac") == 0.5)
  }

  test("contaminationScore == q61 on the modulo split") {
    val corpus = renamed.filter(col("id") % 97 =!= 0)
    val bench = renamed.filter(col("id") % 97 === 0)
    assert(rows(TextOps.contaminationScore(corpus, bench, "id", "body")) ==
      rows(TextDedup.q61ContaminationScore(spark, sfDir)))
  }

  test("contaminationScore severity buckets follow the rounded fraction") {
    val corpus = renamed.filter(col("id") % 97 =!= 0)
    val bench = renamed.filter(col("id") % 97 === 0)
    val got = TextOps.contaminationScore(corpus, bench, "id", "body").collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val f = r.getAs[Double]("overlap_frac")
      val want =
        if (f >= TextDedup.ContamHigh) "high"
        else if (f >= TextDedup.ContamMedium) "medium"
        else if (f > 0.0) "low"
        else "clean"
      assert(r.getAs[String]("severity") == want, s"row $r")
    }
  }

  test("contaminationAttribution == q78 on the modulo split") {
    val corpus = renamed.filter(col("id") % 97 =!= 0)
    val bench = renamed.filter(col("id") % 97 === 0)
    assert(rows(TextOps.contaminationAttribution(corpus, bench, "id", "body")) ==
      rows(TextDedup.q78ContaminationAttribution(spark, sfDir)))
  }

  test("minhashCalibration == q79 on the documents table") {
    assert(rows(TextOps.minhashCalibration(renamed, "id", "body")) ==
      rows(TextDedup.q79MinhashCalibration(spark, sfDir)))
  }

  test("pruneVocabulary == q62 on the documents table") {
    assert(rows(TextOps.pruneVocabulary(renamed, "id", "body")) ==
      rows(TextPipeline.q62VocabPrune(spark, sfDir)))
  }

  test("pruneVocabulary keeping the whole vocabulary rebuilds the text verbatim") {
    // with keepK >= |vocab| nothing is replaced, so the rebuilt-text hash
    // must equal md5(text) — proving the position-exact reassembly
    val got = TextOps.pruneVocabulary(renamed, "id", "body", keepK = 100000)
    val want = renamed.select(col("id").cast("long").as("doc_id"),
      md5(col("body")).as("want_hash"))
    val joined = got.join(want, "doc_id").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      assert(r.getAs[Long]("n_unk") == 0L, s"row $r")
      assert(r.getAs[String]("pruned_hash") == r.getAs[String]("want_hash"),
        s"row $r")
    }
  }

  test("qualityFilter == q50 on the documents table") {
    assert(rows(TextOps.qualityFilter(renamed, "id", "body")) ==
      rows(TextDedup.q50QualityFilter(spark, sfDir)))
  }

  test("qualityFilter verdict composes exactly its rule flags") {
    val got = TextOps.qualityFilter(renamed, "id", "body").collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val flags = Seq("r_len", "r_word_len", "r_stopwords", "r_repetition",
        "r_dup_3gram").map(r.getAs[Long])
      assert(r.getAs[Long]("n_rules_failed") == 5L - flags.sum)
      assert(r.getAs[Long]("keep") == (if (flags.sum == 5L) 1L else 0L))
    }
    // the filter must actually split this corpus, else thresholds are dead
    assert(got.exists(_.getAs[Long]("keep") == 1L))
    assert(got.exists(_.getAs[Long]("keep") == 0L))
  }

  test("weightedMix == q51 on the documents table") {
    val src = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id").as("id"), col("source"))
    val quota = when(expr("CAST(substring(source, 4) AS INT)") % 2 === 0,
      lit(14L)).otherwise(lit(6L))
    assert(rows(TextOps.weightedMix(src, "id", "source", quota)) ==
      rows(TextDedup.q51CorpusMix(spark, sfDir)))
  }

  test("weightedMix fills every stratum to exactly its quota") {
    val src = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id").as("id"), col("source"))
    val mix = TextOps.weightedMix(src, "id", "source", lit(5L)).collect()
    val bySrc = mix.groupBy(_.getAs[String]("source"))
    assert(bySrc.values.forall(_.length == 5))
    // deterministic: a second run picks the identical documents
    val again = TextOps.weightedMix(src, "id", "source", lit(5L)).collect()
    assert(mix.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }

  test("vocabulary == q52 on the documents table") {
    assert(rows(TextOps.vocabulary(renamed, "id", "body", 100)) ==
      rows(TextDedup.q52VocabTopK(spark, sfDir)))
    // k is honored and df <= tf always
    val top5 = TextOps.vocabulary(renamed, "id", "body", 5).collect()
    assert(top5.length == 5)
    top5.foreach(r =>
      assert(r.getAs[Long]("n_docs") <= r.getAs[Long]("n_occurrences")))
  }

  test("keepBestPerCluster picks the max-quality member per cluster") {
    val kept = TextOps.keepBestPerCluster(renamed, "id", "body",
      length(col("body")).cast("double")).collect()
    val clusters = TextOps.dedupClusters(renamed, "id", "body").collect()
      .groupBy(_.getAs[Long]("cluster_id"))
    val lengths = renamed.collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[String]("body").length.toDouble).toMap
    assert(kept.length == clusters.size)
    kept.foreach { k =>
      val members = clusters(k.getAs[Long]("cluster_id")).map(_.getAs[Long]("doc_id"))
      assert(k.getAs[Double]("best_quality") == members.map(lengths).max)
      assert(k.getAs[Long]("n_members") == members.length)
    }
  }
}
