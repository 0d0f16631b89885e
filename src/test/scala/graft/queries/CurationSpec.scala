package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Edge-case correctness for the curation batch (q65–q68). The oracle
  * gate proves the corpus-level bindings; these pin the boundary
  * behaviors the corpus doesn't exercise — empty/short documents, exact
  * budget hits, percentile rank boundaries — and the winnowing density
  * guarantee. */
class CurationSpec extends SparkSpec {

  private val sp = spark
  import sp.implicits._

  private val Md5Empty = "d41d8cd98f00b204e9800998ecf8427e"

  private def winnow(rows: Seq[(Long, String)], k: Int = 3, w: Int = 4) =
    Curation.winnowedOf(
      rows.toDF("doc_id", "text"), k, w).orderBy("doc_id").collect()

  test("q85 divergence: identical distributions score zero, disjoint score t_s") {
    // both sources emit the same token multiset -> every observed cell
    // has o = e, the remainder telescopes, chi2 is exactly 0
    val same = Seq((1L, "a b", "s1"), (2L, "a b", "s2"))
      .toDF("doc_id", "text", "source")
    Curation.sourceDivergenceOf(same, "source", "text").collect()
      .foreach(r => assert(r.getAs[Long]("chi2_micro") == 0L))
    // fully disjoint vocabularies of equal mass: chi2 = t_s exactly
    // (each source: own cell contributes n/2, the other's zero cell n/2)
    val disjoint = Seq((1L, "a a a", "s1"), (2L, "b b b", "s2"))
      .toDF("doc_id", "text", "source")
    Curation.sourceDivergenceOf(disjoint, "source", "text").collect()
      .foreach { r =>
        assert(r.getAs[Long]("n_tokens") == 3L)
        assert(r.getAs[Long]("chi2_micro") == 3000000L)
      }
    // corpus binding is the same pipeline on (source, text)
    val renamedDocs = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("text").as("body"), col("source").as("src"))
    val got = Curation.sourceDivergenceOf(renamedDocs, "src", "body")
    assert(got.collect().toSeq.map(_.toString) ==
      Curation.q85SourceDivergence(spark, sfDir).collect().toSeq.map(_.toString))
  }

  test("token drift: self-drift == q85, fit round-trips, unseen reported exactly") {
    val docsDf = Tables.load(spark, sfDir, "documents")
    val fitted = Curation.fitTokenDistribution(docsDf, "text")
    val self = Curation.tokenDriftOf(docsDf, fitted, "source", "text")
    // applying a corpus against its own fit IS q85's statistic
    assert(self.select("source", "n_tokens", "chi2_micro").collect()
      .map(_.toString).toSeq ==
      Curation.q85SourceDivergence(spark, sfDir)
        .select("source", "n_tokens", "chi2_micro").collect()
        .map(_.toString).toSeq)
    val z = self.agg(sum("n_unseen_tokens"), sum("unseen_mass")).head()
    assert(z.getLong(0) == 0L && z.getLong(1) == 0L)
    // the fitted table is a serving artifact: parquet round-trip is
    // bit-identical through the apply half
    val dir = java.nio.file.Files.createTempDirectory("fit-dist").toString
    fitted.write.mode("overwrite").parquet(dir)
    assert(Curation.tokenDriftOf(docsDf, spark.read.parquet(dir),
      "source", "text").collect().map(_.toString).toSeq ==
      self.collect().map(_.toString).toSeq)
    // unseen tokens: excluded from the statistic, reported as mass
    // fit "a a b": g=3; batch "a zzz zzz": t_s=3, e_a=2,
    // term_a=(1-2)^2/2-2=-1.5 -> chi2 = -1.5e6 + 3e6
    val ref = Curation.fitTokenDistribution(
      Seq((1L, "a a b")).toDF("doc_id", "text"), "text")
    val out = Curation.tokenDriftOf(
      Seq((1L, "a zzz zzz", "s1")).toDF("doc_id", "text", "source"),
      ref, "source", "text").head()
    assert(out.getAs[Long]("n_tokens") == 3L)
    assert(out.getAs[Long]("n_unseen_tokens") == 1L)
    assert(out.getAs[Long]("unseen_mass") == 2L)
    assert(out.getAs[Long]("chi2_micro") == 1500000L)
  }

  test("q89 capped-vocab probe: unseen mass is real and matches an independent recount") {
    val r = Curation.q89TokenDrift(spark, sfDir)
    val t = r.agg(sum("n_unseen_tokens").as("u"), sum("unseen_mass").as("m")).head()
    assert(t.getLong(0) > 0L, "the capped binding produced no unseen tokens")
    assert(t.getLong(1) >= t.getLong(0))
    // independent recount of the unseen mass via an anti-join
    val d = Tables.load(spark, sfDir, "documents")
    val vocab = Curation.capVocabulary(
      Curation.fitTokenDistribution(d.filter(col("doc_id") % 2 === 0), "text"),
      Curation.DriftVocabCap).select("token")
    val recount = d.filter(col("doc_id") % 2 === 1)
      .select(col("source"), explode(split(col("text"), " ")).as("token"))
      .join(vocab, Seq("token"), "left_anti")
      .groupBy("source").agg(count(lit(1)).as("m2"))
    assert(r.join(recount, Seq("source"), "left")
      .filter(col("unseen_mass") =!= coalesce(col("m2"), lit(0L)))
      .count() == 0L)
  }

  test("q86 temperature weights: sqrt smoothing up-weights small sources, integer-exact") {
    // sources with 1 and 4 tokens: p = 1/5, 4/5; sqrt(4·x) = 2·sqrt(x)
    // exactly in IEEE, so the weights are exactly 1/3 and 2/3 (floored
    // to micro units) — replicate the fixed-point formula in the JVM
    val d = Seq((1L, "a", "s1"), (2L, "b b b b", "s2"))
      .toDF("doc_id", "text", "source")
    val out = Curation.temperatureWeightsOf(d, "source", "text")
      .collect().map(r => r.getAs[String]("source") -> r).toMap
    val fpA = Math.round(Math.sqrt(1.0 / 5.0) * 1e9)
    val fpB = Math.round(Math.sqrt(4.0 / 5.0) * 1e9)
    val tot = fpA + fpB
    assert(out("s1").getAs[Long]("w_micro") == fpA * 1000000L / tot)
    assert(out("s2").getAs[Long]("w_micro") == fpB * 1000000L / tot)
    assert(out("s1").getAs[Long]("w_micro") == 333333L)
    assert(out("s2").getAs[Long]("w_micro") == 666666L)
    // plain-proportional would give quotas (0.4, 1.6) -> sqrt narrows
    // the gap: quotas (2·1/3, 2·2/3) floored
    assert(out("s1").getAs[Long]("doc_quota") == 0L)
    assert(out("s2").getAs[Long]("doc_quota") == 1L)
    // corpus binding == library form on renamed columns
    val renamedDocs = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("text").as("body"), col("source").as("src"))
    assert(Curation.temperatureWeightsOf(renamedDocs, "src", "body")
      .collect().toSeq.map(_.toString) ==
      Curation.q86TemperatureWeights(spark, sfDir)
        .collect().toSeq.map(_.toString))
  }

  test("winnow: doc shorter than k tokens has zero grams and the empty digest") {
    val r = winnow(Seq((1L, "a b"), (2L, "")))
    assert(r.forall(_.getAs[Long]("n_grams") == 0L))
    assert(r.forall(_.getAs[Long]("n_fp") == 0L))
    assert(r.forall(_.getAs[String]("fp_digest") == Md5Empty))
  }

  test("winnow: doc with fewer grams than one window keeps exactly one fingerprint") {
    // 4 tokens, k=3 -> 2 grams < w=4 -> one truncated window -> 1 fp
    val r = winnow(Seq((1L, "a b c d")))
    assert(r.head.getAs[Long]("n_grams") == 2L)
    assert(r.head.getAs[Long]("n_fp") == 1L)
  }

  test("winnow: guarantee — docs sharing a w+k-1 token run share a fingerprint") {
    // any shared run of w+k-1 = 6 tokens must yield a shared selected hash
    val shared = "q w e r t y"
    val df = Seq(
      (1L, s"a b c d $shared u i o p"),
      (2L, s"z x v n m $shared l j h g")).toDF("doc_id", "text")
    val fp = Curation.winnowedOf(df, 3, 4)
    // recompute the selected SETS (not just the digest) via the same path
    val sets = df.select(col("doc_id"), split(col("text"), " ").as("toks"))
      .withColumn("n_grams", greatest(size(col("toks")) - 2, lit(0)))
      .withColumn("hashes", transform(sequence(lit(1), col("n_grams")),
        i => md5(concat_ws(" ", slice(col("toks"), i, lit(3))))))
      .withColumn("sel", array_distinct(transform(
        sequence(lit(1), greatest(col("n_grams") - 3, lit(1))),
        i => array_min(slice(col("hashes"), i, lit(4))))))
      .select(col("doc_id"), explode(col("sel")).as("fp"))
    val byDoc = sets.collect().groupBy(_.getLong(0))
      .map { case (d, rs) => d -> rs.map(_.getString(1)).toSet }
    assert((byDoc(1L) & byDoc(2L)).nonEmpty,
      "no shared fingerprint despite a 6-token shared run")
    assert(fp.count() == 2)
  }

  test("winnow: density is ~2/(w+1) of grams, never more than full-window count") {
    val r = Curation.winnowedOf(
      Tables.load(spark, sfDir, "documents"), 3, 4).collect()
    r.filter(_.getAs[Long]("n_grams") >= 8).foreach { row =>
      val g = row.getAs[Long]("n_grams"); val f = row.getAs[Long]("n_fp")
      assert(f >= 1 && f <= g - 3, s"fp count $f outside (0, ${g - 3}]")
    }
  }

  test("snapshotDiff classifies all four statuses on a generic frame") {
    val old = Seq((1L, "same"), (2L, "old text"), (3L, "gone")).toDF("id", "body")
    val nu = Seq((1L, "same"), (2L, "new text"), (4L, "fresh")).toDF("id", "body")
    val got = Curation.snapshotDiff(old, nu, "id", col("body"))
      .orderBy("doc_id").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "unchanged", 2L -> "changed",
      3L -> "deleted", 4L -> "added"))
  }

  test("tokenBudget: cumulative cap keeps the exact-hit doc and drops the next") {
    // quality order within src: a (3 distinct/3), b (2/2)... construct:
    // doc 1: 4 tokens all distinct (q=1e6), doc 2: 4 tokens all distinct
    // (q=1e6, later id), doc 3: 4 tokens 2 distinct (q=5e5).
    // budget=8 -> docs 1,2 (cum 4,8) kept; doc 3 (cum 12) dropped.
    val df = Seq(
      (1L, "a b c d", "s"), (2L, "e f g h", "s"), (3L, "i i j j", "s"))
      .toDF("doc_id", "text", "src")
    val got = Curation.tokenBudgetOf(df, "src", budget = 8L)
      .orderBy("doc_id").collect()
    assert(got.map(_.getAs[Long]("doc_id")).toSeq == Seq(1L, 2L))
    assert(got.last.getAs[Long]("cum_tokens") == 8L)
  }

  test("tokenBudget: selection is quality-first, not id-first") {
    // doc 2 has higher unique-token ratio than doc 1 -> wins the budget
    val df = Seq(
      (1L, "x x x x", "s"), (2L, "a b c d", "s")).toDF("doc_id", "text", "src")
    val got = Curation.tokenBudgetOf(df, "src", budget = 4L).collect()
    assert(got.map(_.getAs[Long]("doc_id")).toSeq == Seq(2L))
  }

  test("percentileGate: integer rank math hits the exact boundary (n=10, n=11)") {
    // n=10, p=9/10 -> rank (90+9) DIV 10 = 9 -> thr = 9th smallest = 90
    val ten = (1L to 10L).map(i => (i, "en", i * 10L))
      .toDF("doc_id", "lang", "score")
    val g10 = Curation.percentileGateOf(ten, "lang", "score", 9, 10)
      .orderBy("doc_id").collect()
    assert(g10.map(_.getAs[Long]("doc_id")).toSeq == Seq(9L, 10L))
    assert(g10.head.getAs[Long]("thr") == 90L)
    // n=11 -> rank (99+9) DIV 10 = 10 -> thr = 10th smallest = 100
    val eleven = (1L to 11L).map(i => (i, "en", i * 10L))
      .toDF("doc_id", "lang", "score")
    val g11 = Curation.percentileGateOf(eleven, "lang", "score", 9, 10)
      .orderBy("doc_id").collect()
    assert(g11.map(_.getAs[Long]("doc_id")).toSeq == Seq(10L, 11L))
  }

  test("sketch-mode fit: high accuracy matches the exact thresholds; low accuracy is rank-bounded") {
    val docs = graft.queries.Tables.load(spark, sfDir, "documents")
    val exact = Curation
      .fitPercentileThresholds(docs, "lang", "n_chars", 9, 10)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // accuracy >= stratum size => the GK sketch is lossless
    val hi = Curation
      .fitPercentileThresholdsApprox(docs, "lang", "n_chars", 9, 10,
        accuracy = 100000)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(hi == exact, s"lossless sketch diverged: $hi vs $exact")
    // coarse sketch: each threshold is a real data value whose RANK is
    // within n/accuracy + 1 of the exact target rank, per stratum
    val lo = Curation
      .fitPercentileThresholdsApprox(docs, "lang", "n_chars", 9, 10,
        accuracy = 50)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val byLang = docs.select("lang", "n_chars").collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    lo.foreach { case (lang, thr) =>
      val vals = byLang(lang)
      val n = vals.length
      val target = (9 * n + 9) / 10
      // rank range of thr among the sorted values (ties give a span)
      val lo0 = vals.count(_ < thr) + 1
      val hi0 = vals.count(_ <= thr)
      val tol = n / 50 + 1
      assert(lo0 - tol <= target && target <= hi0 + tol,
        s"$lang: thr=$thr rank [$lo0,$hi0] vs target $target ±$tol (n=$n)")
    }
  }

  test("percentileGate: threshold is per-stratum, ties at the boundary kept") {
    val df = Seq(
      (1L, "en", 5L), (2L, "en", 9L), (3L, "en", 9L), (4L, "en", 9L),
      (5L, "de", 1L), (6L, "de", 2L)).toDF("doc_id", "lang", "score")
    // en: n=4 -> rank (36+9) DIV 10 = 4 -> thr=9 (asc 5,9,9,9) -> keeps 2,3,4
    // de: n=2 -> rank (18+9) DIV 10 = 2 -> thr=2 -> keeps 6
    val got = Curation.percentileGateOf(df, "lang", "score", 9, 10)
      .orderBy("doc_id").collect().map(_.getAs[Long]("doc_id")).toSeq
    assert(got == Seq(2L, 3L, 4L, 6L))
  }

  test("balancedSample: every stratum is cut to the smallest stratum's size") {
    val df = Seq(
      (1L, "s1"), (2L, "s1"), (3L, "s1"),
      (4L, "s2"), (5L, "s2"),
      (6L, "s3"), (7L, "s3"), (8L, "s3"), (9L, "s3")).toDF("doc_id", "source")
    val got = Curation.balancedSampleOf(df, "source", "doc_id").collect()
    assert(got.length == 6)
    assert(got.forall(_.getAs[Long]("quota") == 2L))
    val bySrc = got.groupBy(_.getAs[String]("source")).view.mapValues(_.length)
    assert(bySrc.toMap == Map("s1" -> 2, "s2" -> 2, "s3" -> 2))
    got.foreach(r => assert(r.getAs[Long]("pick_rank") <= 2L))
  }

  test("balancedSample: equal strata keep everything") {
    val df = Seq((1L, "a"), (2L, "a"), (3L, "b"), (4L, "b"))
      .toDF("doc_id", "source")
    assert(Curation.balancedSampleOf(df, "source", "doc_id").count() == 4L)
  }

  test("rareTokenScore: df counts DOCUMENTS, repeats inside one doc don't help") {
    val df = Seq(
      (1L, "aaa bbb bbb bbb"), // bbb repeats in doc 1 only: df=1, rare
      (2L, "aaa ccc"),
      (3L, "aaa ddd")).toDF("doc_id", "text")
    val rows = Curation.rareTokenScoreOf(df, "doc_id", "text", rareDf = 1L)
      .orderBy("doc_id").collect()
    // aaa: df=3 (common); bbb/ccc/ddd: df=1 (rare)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_distinct_tokens") == 2L)
      assert(r.getAs[Long]("n_rare") == 1L)
      assert(r.getAs[Double]("rare_ratio") == 0.5)
    }
  }

  test("DSIR: hand-computed ratios, OOV neutral prior, null-text floor") {
    // target: {good: 2}; raw: {bad: 3, good: 1}; V = 2, N_t = 2, N_r = 4
    // w(good) = round(1e6 * (2+1) * (4+2) / ((1+1) * (2+2))) = 2_250_000
    // w(bad)  = round(1e6 * (0+1) * 6 / ((3+1) * 4))         =   375_000
    val target = Seq((0L, "good good")).toDF("doc_id", "text")
    val raw = Seq((1L, "bad good"), (2L, "bad bad")).toDF("doc_id", "text")
    val model = Curation.fitImportanceModel(target, raw, "text")
    val byTok = model.collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(byTok == Map("good" -> ((2L, 1L)), "bad" -> ((0L, 3L))))
    val got = Curation.importanceScoreOf(raw, model, "text")
      .orderBy("doc_id").collect()
    assert(got(0).getAs[Long]("sum_w_fp") == 2250000L + 375000L)
    assert(got(0).getAs[Long]("mean_w_fp") == 1312500L)
    assert(got(0).getAs[Boolean]("keep"))
    assert(got(1).getAs[Long]("sum_w_fp") == 750000L)
    assert(!got(1).getAs[Boolean]("keep"))
    // serving a batch with a token unseen at fit time: the smoothed
    // neutral-prior ratio (N_r+V)/(N_t+V) = 6/4 -> 1_500_000, keep=true
    val novel = Seq((9L, "zzz")).toDF("doc_id", "text")
    val n = Curation.importanceScoreOf(novel, model, "text").head()
    assert(n.getAs[Long]("sum_w_fp") == 1500000L)
    assert(n.getAs[Boolean]("keep"))
    // null text never reaches the explode: scores (0, 0, 0, keep=false)
    val nul = Seq((7L, null: String)).toDF("doc_id", "text")
    val z = Curation.importanceScoreOf(nul, model, "text").head()
    assert(z.getAs[Long]("n_tokens") == 0L &&
      z.getAs[Long]("mean_w_fp") == 0L && !z.getAs[Boolean]("keep"))
  }

  test("DSIR: model round-trips through parquet; TextOps form == q99 binding") {
    val d = Tables.load(spark, sfDir, "documents")
    val target = d.filter(col("doc_id") % Curation.DsirTargetMod === 0)
    val raw = d.filter(col("doc_id") % Curation.DsirTargetMod =!= 0)
    val model = Curation.fitImportanceModel(target, raw, "text")
    val dir = java.nio.file.Files.createTempDirectory("dsir_model").toString
    model.write.mode("overwrite").parquet(dir)
    val reloaded = spark.read.parquet(dir)
    val direct = Curation.importanceScoreOf(raw, model, "text")
      .orderBy("doc_id").collect().map(_.toString).toSeq
    assert(Curation.importanceScoreOf(raw, reloaded, "text")
      .orderBy("doc_id").collect().map(_.toString).toSeq == direct)
    // generic (id, text)-parameterized form on renamed columns is the
    // same pipeline: inherits the q99 oracle verification
    val renamed = raw.select(col("doc_id").as("k"), col("text").as("body"))
    assert(TextOps.importanceScore(renamed, "k", "body", model)
      .collect().map(_.toString).toSeq == direct)
    assert(TextOps.fitImportanceModel(
      target.select(col("doc_id").as("k"), col("text").as("body")),
      renamed, "k", "body").orderBy("token").collect().map(_.toString).toSeq
      == model.orderBy("token").collect().map(_.toString).toSeq)
  }
}
