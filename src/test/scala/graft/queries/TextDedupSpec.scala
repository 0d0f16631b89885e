package graft.queries

import graft.SparkSpec

/** Semantic checks for the text-pipeline operators at sf0.001; value-level
  * equality is enforced by the DuckDB oracle gate (tools/check_oracle.py). */
class TextDedupSpec extends SparkSpec {

  for ((name, fn) <- TextDedup.queries.toSeq.sortBy(_._1)) {
    test(s"$name runs and returns rows") {
      assert(fn(spark, sfDir).count() > 0, s"$name returned no rows")
    }
  }

  test("q24 ratios are in range and token counts positive") {
    val rows = TextDedup.q24DocStats(spark, sfDir).collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("n_tokens") > 0)
      val ttr = r.getAs[Double]("ttr")
      assert(ttr > 0.0 && ttr <= 1.0)
      assert(r.getAs[Long]("n_distinct") <= r.getAs[Long]("n_tokens"))
    }
  }

  test("q74 bitmask driver path == distributed fallback == wide collect_set path") {
    val d = Tables.load(spark, sfDir, "documents")
    def rowsOf(df: org.apache.spark.sql.DataFrame): Seq[Seq[Any]] =
      df.orderBy("src_a", "src_b").collect().toSeq.map(_.toSeq)
    val driverPath = rowsOf(TextDedup.sourceOverlapOf(d))
    val widePath = rowsOf(TextDedup.sourceOverlapWideOf(d))
    assert(driverPath.nonEmpty)
    assert(driverPath == widePath,
      "bitmask driver-tail result diverged from the collect_set fallback")
    // force the >cap distributed-expansion branch and compare again
    spark.conf.set("spark.graft.sourceOverlap.maskCap", "1")
    try {
      val distributed = rowsOf(TextDedup.sourceOverlapOf(d))
      assert(distributed == widePath,
        "distributed mask-expansion result diverged from the collect_set fallback")
    } finally spark.conf.unset("spark.graft.sourceOverlap.maskCap")
  }

  test("q27 exact dedup keeps one keeper per content hash") {
    val rows = TextDedup.q27ExactDedup(spark, sfDir).collect()
    val keepers = rows.map(_.getAs[Long]("keeper_id"))
    assert(keepers.distinct.length == keepers.length)
    rows.foreach(r => assert(r.getAs[Long]("n_copies") >= 1))
  }

  test("q28 jaccard pairs are all above the 0.5 threshold and ordered") {
    val rows = TextDedup.q28JaccardPairs(spark, sfDir).collect()
    rows.foreach { r =>
      val j = r.getAs[Double]("jaccard")
      assert(j >= 0.5 && j <= 1.0)
      assert(r.getAs[Long]("id_a") < r.getAs[Long]("id_b"))
    }
  }

  test("q30 LSH recall: every true near-dup pair (J>=0.8) is a candidate") {
    val trueDups = TextDedup.q28JaccardPairs(spark, sfDir).collect()
      .filter(_.getAs[Double]("jaccard") >= 0.8)
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    val lsh = TextDedup.q30LshPairs(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    val missed = trueDups -- lsh
    assert(missed.isEmpty, s"LSH missed true near-dups: $missed")
  }

  test("q31 simhash pairs are within the hamming bound") {
    val rows = TextDedup.q31SimhashPairs(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getAs[Long]("hamming") <= 6))
  }

  test("q41 capped candidates recover exactly q28's pairs (cap invisible here)") {
    val uncapped = TextDedup.q28JaccardPairs(spark, sfDir).collect().map(_.toString)
    val capped = TextDedup.q41JaccardCapped(spark, sfDir).collect().map(_.toString)
    assert(capped.nonEmpty)
    assert(capped.sameElements(uncapped)) // max shingle df << cap on this corpus
  }

  test("q42 sampling is a pure function of doc_id (stable under repartition)") {
    val a = TextDedup.q42StratifiedSample(spark, sfDir).collect()
    assert(a.nonEmpty)
    a.foreach { r =>
      assert(r.getAs[Long]("bucket") < r.getAs[Long]("rate_permille"))
      if (r.getAs[String]("lang") == "en") assert(r.getAs[Long]("rate_permille") == 100L)
    }
    val b = TextDedup.q42StratifiedSample(spark, sfDir).collect()
    assert(a.map(_.getAs[Long]("doc_id")).sameElements(b.map(_.getAs[Long]("doc_id"))))
  }

  test("q43 picks exactly one keeper per cluster with the max quality") {
    val clusters = TextDedup.q40DedupClusters(spark, sfDir).collect()
    val keepers = TextDedup.q43KeepBest(spark, sfDir).collect()
    assert(keepers.length == clusters.map(_.getAs[Long]("cluster_id")).distinct.length)
    val qual = TextDedup.q24DocStats(spark, sfDir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("quality")).toMap
    val members = clusters.groupBy(_.getAs[Long]("cluster_id"))
    keepers.foreach { k =>
      val cid = k.getAs[Long]("cluster_id")
      val best = members(cid).map(r => qual(r.getAs[Long]("doc_id"))).max
      assert(k.getAs[Double]("best_quality") == best)
    }
  }

  test("q48 verdicts are batch-vs-corpus consistent") {
    val docs = Tables.load(spark, sfDir, "documents").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    def isBatch(id: Long): Boolean = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
      val hex = h.map(b => f"$b%02x").mkString.take(8)
      java.lang.Long.parseLong(hex, 16) % 1000 < 100
    }
    val rows = TextDedup.q48IncrementalDedup(spark, sfDir).collect()
    // exactly the batch slice, once each
    assert(rows.map(_.getAs[Long]("doc_id")).toSeq ==
      docs.keys.filter(isBatch).toSeq.sorted)
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      r.getAs[String]("verdict") match {
        case "exact_dup" =>
          val p = r.getAs[Long]("partner_id")
          assert(!isBatch(p), "partner must be a corpus doc")
          assert(docs(p) == docs(id), "exact_dup partner text differs")
          assert(r.getAs[Double]("jaccard") == 1.0)
        case "near_dup" =>
          val p = r.getAs[Long]("partner_id")
          assert(!isBatch(p), "partner must be a corpus doc")
          assert(docs(p) != docs(id), "near_dup should not be byte-identical")
          assert(r.getAs[Double]("jaccard") >= 0.5)
        case "new" =>
          assert(r.isNullAt(r.fieldIndex("partner_id")))
          assert(r.isNullAt(r.fieldIndex("jaccard")))
        case other => fail(s"unknown verdict $other")
      }
    }
    // the planted dup structure must actually surface some dups
    assert(rows.exists(_.getAs[String]("verdict") != "new"))
  }

  test("q49 overlap counts match a driver-side recount") {
    val docs = Tables.load(spark, sfDir, "documents").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    def sh3(t: String): Set[String] = {
      val w = t.split(" ")
      if (w.length < 3) Set.empty
      else (0 to w.length - 3).map(i => s"${w(i)} ${w(i + 1)} ${w(i + 2)}").toSet
    }
    val bench = docs.collect { case (id, t) if id % 97 == 0 => sh3(t) }
      .foldLeft(Set.empty[String])(_ ++ _)
    val rows = TextDedup.q49Decontamination(spark, sfDir).collect()
    assert(rows.map(_.getAs[Long]("doc_id")).toSet == docs.keys.filter(_ % 97 != 0).toSet)
    rows.foreach { r =>
      val expected = (sh3(docs(r.getAs[Long]("doc_id"))) & bench).size.toLong
      assert(r.getAs[Long]("n_overlap") == expected,
        s"doc ${r.getAs[Long]("doc_id")}: got ${r.getAs[Long]("n_overlap")}, want $expected")
      assert(r.getAs[Long]("contaminated") == (if (expected > 0) 1L else 0L))
    }
  }

  test("q69 containment catches a subset-dup that Jaccard misses") {
    val sp2 = spark
    import sp2.implicits._
    // doc 1 is fully contained in doc 2 (2 shared shingles of 2), but the
    // host is long enough that Jaccard = 2/12 < any sane threshold
    val df = Seq(
      (1L, "a b c d"),
      (2L, "a b c d " + (1 to 12).map(i => s"w$i").mkString(" ")))
      .toDF("doc_id", "text")
    val cont = TextDedup.containmentPairsOf(df, 0.7).collect()
    assert(cont.length == 1)
    assert(cont.head.getAs[Double]("containment") == 1.0)
    assert(TextDedup.jaccardPairsOf(df, 0.7).count() == 0,
      "fixture broken: Jaccard should miss the subset pair")
  }

  test("q69 containment is a superset of Jaccard pairs at the same threshold") {
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))
    val d = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("text"))
    val jac = TextDedup.jaccardPairsOf(d, 0.5).collect().map(key).toSet
    val con = TextDedup.containmentPairsOf(d, 0.5).collect().map(key).toSet
    assert(jac.subsetOf(con),
      s"missing from containment: ${(jac -- con).take(5)}")
  }

  test("q70 normalized dedup collapses case/punctuation variants") {
    val sp2 = spark
    import sp2.implicits._
    val df = Seq(
      (3L, "Hello, World!"),
      (7L, "hello world"),
      (9L, "hello  WORLD..."),
      (11L, "goodbye world")).toDF("doc_id", "text")
    val rows = TextDedup.normalizedDedupOf(df).orderBy("keeper_id").collect()
    assert(rows.length == 2)
    assert(rows.head.getAs[Long]("keeper_id") == 3L)
    assert(rows.head.getAs[Long]("n_variants") == 3L)
    assert(rows.last.getAs[Long]("keeper_id") == 11L)
    assert(rows.last.getAs[Long]("n_variants") == 1L)
  }

  test("q75 leakage pairs are exactly the q28 pairs that straddle splits") {
    val leak = TextDedup.q75SplitLeakage(spark, sfDir).collect()
    val pairKeys = TextDedup.q28JaccardPairs(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    val splits = Set("train", "val", "test")
    leak.foreach { r =>
      assert(pairKeys((r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))),
        "leakage pair not a q28 near-dup pair")
      val (a, b) = (r.getAs[String]("split_a"), r.getAs[String]("split_b"))
      assert(splits(a) && splits(b) && a != b)
    }
    // non-degenerate: some pairs straddle, some don't (else the report
    // proves nothing about the assignment)
    assert(leak.nonEmpty && leak.length < pairKeys.size)
  }

  test("splitByCluster assignment has zero leakage and sane proportions") {
    import org.apache.spark.sql.functions.col
    val d = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val asg = TextDedup.splitByClusterOf(d, 0.5)
    val leak = TextDedup.jaccardPairsOf(d, 0.5)
      .join(asg.select(col("doc_id").as("id_a"), col("split").as("sa")),
        Seq("id_a"))
      .join(asg.select(col("doc_id").as("id_b"), col("split").as("sb")),
        Seq("id_b"))
      .filter(col("sa") =!= col("sb")).count()
    assert(leak == 0L, s"cluster-aware split leaked $leak near-dup pairs")
    assert(asg.count() == d.count(), "assignment must be total")
    val bySplit = asg.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySplit.keySet == Set("train", "val", "test"))
    assert(bySplit("train") > bySplit("val") && bySplit("train") > bySplit("test"),
      s"80/10/10 proportions off: $bySplit")
  }

  test("q76 coverage is monotone in k and bounded by 1") {
    val rows = TextDedup.q76VocabCoverage(spark, sfDir).collect()
    assert(rows.length == 3)
    val cov = rows.map(_.getAs[Double]("coverage"))
    assert(cov.sameElements(cov.sorted), "coverage must grow with k")
    cov.foreach(c => assert(c > 0.0 && c <= 1.0))
    rows.foreach(r => assert(
      r.getAs[Long]("cum_tokens") <= r.getAs[Long]("total_tokens")))
  }

  test("q77 per-source dup stats satisfy their own inequalities") {
    val rows = TextDedup.q77SourceDupStats(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (docs, uniq, cross) = (r.getAs[Long]("n_docs"),
        r.getAs[Long]("n_unique"), r.getAs[Long]("n_cross"))
      assert(uniq <= docs, "more unique hashes than docs")
      assert(cross <= uniq, "more cross-source hashes than the source has")
      val ratio = r.getAs[Double]("exact_dup_ratio")
      assert(ratio >= 0.0 && ratio < 1.0)
    }
  }

  test("SparkEntry query and oracle key sets are identical") {
    assert(graft.SparkEntry.queries.keySet == graft.SparkEntry.oracleSql.keySet)
  }
}
