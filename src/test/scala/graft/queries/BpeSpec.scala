package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the distributed BPE trainer against an independent plain-Scala
  * reference implementation (the HofReferenceSpec pattern): same word
  * histogram, same (count desc, l, r) argmax, same leftmost-greedy merge
  * scan. The registered q98 covers iteration-0 pair counts via DuckDB; this
  * spec covers the LOOP the oracle can't express.
  */
class BpeSpec extends SparkSpec {
  private lazy val s = spark
  import s.implicits._

  // the classic Sennrich-style corpus: shared stems + suffixes so merges
  // have real structure, plus repetition so counts differ
  private val corpus = Seq(
    (1L, "lower lower lowest low low low"),
    (2L, "newer newest new new newer"),
    (3L, "wider widest wide wider"),
    (4L, "low lower newest widest"),
    (5L, "newer wider lowest low"))
  private lazy val df = corpus.toDF("doc_id", "text")

  // ---- plain-Scala reference BPE --------------------------------------

  private def refHistogram(c: Seq[(Long, String)]): Map[String, Long] =
    c.flatMap(_._2.split(" ").filter(_.nonEmpty))
      .groupBy(identity).map { case (w, ws) => w -> ws.size.toLong }

  private def refInit(w: String): Vector[String] =
    w.map(_.toString).toVector :+ Bpe.Eow

  private def refApply(syms: Vector[String], a: String, b: String): Vector[String] =
    syms.foldLeft(Vector.empty[String]) { (acc, x) =>
      if (acc.nonEmpty && acc.last == a && x == b) acc.init :+ (a + b)
      else acc :+ x
    }

  /** (merges, final word→syms) after up to n merges with minCount 2. */
  private def refTrain(c: Seq[(Long, String)], n: Int)
      : (Seq[(String, String)], Map[String, Vector[String]]) = {
    val hist = refHistogram(c)
    var syms = hist.map { case (w, _) => w -> refInit(w) }
    val merges = Seq.newBuilder[(String, String)]
    var stop = false
    var i = 0
    while (!stop && i < n) {
      val pairs = syms.toSeq.flatMap { case (w, ss) =>
        ss.zip(ss.tail).map(p => p -> hist(w))
      }.groupBy(_._1).map { case (p, xs) => p -> xs.map(_._2).sum }
      if (pairs.isEmpty) stop = true
      else {
        val ((a, b), pc) = pairs.minBy { case ((l, r), pc) => (-pc, l, r) }
        if (pc < 2) stop = true
        else {
          merges += ((a, b))
          syms = syms.map { case (w, ss) => w -> refApply(ss, a, b) }
          i += 1
        }
      }
    }
    (merges.result(), syms)
  }

  // ---- tests ----------------------------------------------------------

  test("train matches the plain-Scala reference: merges AND final vocab") {
    val n = 12
    val model = Bpe.train(df, n)
    val (wantMerges, wantSyms) = refTrain(corpus, n)
    assert(model.merges == wantMerges,
      s"merge sequences differ:\n got=${model.merges}\nwant=$wantMerges")
    val gotSyms = model.vocab.select("word", "syms").collect()
      .map(r => r.getString(0) -> r.getSeq[String](1).toVector).toMap
    assert(gotSyms == wantSyms)
    model.vocab.unpersist()
  }

  test("training is deterministic across runs") {
    val m1 = Bpe.train(df, 6)
    val m2 = Bpe.train(df, 6)
    assert(m1.merges == m2.merges)
    m1.vocab.unpersist(); m2.vocab.unpersist()
  }

  test("tokenCounts: vocabulary words use trained lengths, OOV falls back to chars+1") {
    val model = Bpe.train(df, 8)
    val lens = model.vocab.select("word", "n_tokens").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val probe = Seq((10L, "low lowest zebra")).toDF("doc_id", "text")
    val out = Bpe.tokenCounts(probe, model).collect()
    assert(out.length == 1)
    val want = lens("low") + lens("lowest") + ("zebra".length + 1)
    assert(out(0).getAs[Long]("bpe_tokens") == want,
      s"got ${out(0).getAs[Long]("bpe_tokens")}, want $want (lens=$lens)")
    assert(out(0).getAs[Long]("words") == 3L)
    model.vocab.unpersist()
  }

  test("encode: word-order-preserving subword stream, consistent with tokenCounts") {
    val model = Bpe.train(df, 8)
    val (_, refSyms) = refTrain(corpus, 8)
    val probe = Seq((7L, "lowest zebra low")).toDF("doc_id", "text")
    val out = Bpe.encode(probe, model).collect()
    assert(out.length == 1)
    val got = out(0).getSeq[String](1)
    val want = refSyms("lowest") ++ refInit("zebra") ++ refSyms("low")
    assert(got == want, s"got $got, want $want")
    val counted = Bpe.tokenCounts(probe, model).collect()(0).getAs[Long]("bpe_tokens")
    assert(counted == got.size.toLong, "encode length disagrees with tokenCounts")
    model.vocab.unpersist()
  }

  test("tokenIds: dense, deterministic, covers every produced symbol") {
    val model = Bpe.train(df, 8)
    val ids = Bpe.tokenIds(model).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val produced = model.vocab.select("syms").collect()
      .flatMap(_.getSeq[String](0)).toSet
    assert(ids.keySet == produced)
    assert(ids.values.toSeq.sorted == (0L until ids.size).toSeq, "ids not dense from 0")
    val sortedTokens = ids.keys.toSeq.sorted
    sortedTokens.zipWithIndex.foreach { case (t, i) =>
      assert(ids(t) == i.toLong, s"token $t id ${ids(t)} != lexicographic rank $i")
    }
    model.vocab.unpersist()
  }

  test("encode(exactOov): novel words fold the merge list exactly; in-vocab unchanged") {
    val model = Bpe.train(df, 10)
    // "lowerest" is OOV but shares trained structure with lower/lowest
    val probe = Seq((1L, "lower lowerest zebra")).toDF("doc_id", "text")
    val got = Bpe.encode(probe, model, exactOov = true).collect()(0).getSeq[String](1)
    // independent expectation: sequential rank-order application per word
    def fold(w: String) = {
      var syms = refInit(w)
      model.merges.foreach { case (a, b) => syms = refApply(syms, a, b) }
      syms
    }
    val want = fold("lower") ++ fold("lowerest") ++ fold("zebra")
    assert(got == want, s"got $got, want $want")
    // exact OOV must differ from char-level for the structured novel word
    val charLevel = Bpe.encode(probe, model).collect()(0).getSeq[String](1)
    assert(got != charLevel, "exactOov should merge subwords inside OOV words")
    // on all-in-vocab input the two modes agree
    val inVocab = Seq((2L, "low newest wider")).toDF("doc_id", "text")
    assert(Bpe.encode(inVocab, model, exactOov = true).collect()(0).getSeq[String](1) ==
      Bpe.encode(inVocab, model).collect()(0).getSeq[String](1))
    model.vocab.unpersist()
  }

  test("encode(exactOov): the distinct-OOV cap fails loudly") {
    val model = Bpe.train(df, 4)
    val probe = Seq((1L, "aaa bbb ccc ddd")).toDF("doc_id", "text")
    spark.conf.set(Bpe.OovCapConf, "2")
    try {
      val e = intercept[IllegalArgumentException] {
        Bpe.encode(probe, model, exactOov = true).collect()
      }
      assert(e.getMessage.contains(Bpe.OovCapConf))
    } finally spark.conf.unset(Bpe.OovCapConf)
    model.vocab.unpersist()
  }

  test("saveModel/loadModel: parquet round-trip preserves merges and encode output") {
    val model = Bpe.train(df, 8)
    val dir = java.nio.file.Files.createTempDirectory("bpe-model").toString
    Bpe.saveModel(model, dir)
    val loaded = Bpe.loadModel(spark, dir)
    assert(loaded.merges == model.merges)
    val probe = Seq((1L, "lower newest zebra")).toDF("doc_id", "text")
    val a = Bpe.encode(probe, model).collect()(0).getSeq[String](1)
    val b = Bpe.encode(probe, loaded).collect()(0).getSeq[String](1)
    assert(a == b)
    model.vocab.unpersist(); loaded.vocab.unpersist()
  }

  test("merges terminate early when no pair repeats") {
    val tiny = Seq((1L, "ab cd")).toDF("doc_id", "text")
    val model = Bpe.train(tiny, 50)
    assert(model.merges.isEmpty, s"unexpected merges: ${model.merges}")
    model.vocab.unpersist()
  }

  test("q98 pair counts run on the real corpus with the documented order") {
    val rows = Bpe.q98BpePairs(spark, sfDir).collect()
    assert(rows.length == 20)
    val pcs = rows.map(_.getAs[Long]("pc"))
    assert(pcs.sameElements(pcs.sortBy(-_)), "not ordered by pc desc")
    // the EOW pair of the corpus's most common word-final char must appear
    assert(rows.exists(_.getAs[String]("r") == Bpe.Eow))
  }

  test("detokenization is lossless: join tokens, split at </w>, recover the words") {
    val model = Bpe.train(df, 8)
    val out = Bpe.encode(df, model).collect()
    val texts = corpus.toMap
    assert(out.length == corpus.size)
    out.foreach { r =>
      val rebuilt = r.getSeq[String](1).mkString
        .split(java.util.regex.Pattern.quote(Bpe.Eow)).toSeq.filter(_.nonEmpty)
      val want = texts(r.getLong(0)).split(" ").toSeq.filter(_.nonEmpty)
      assert(rebuilt == want, s"doc ${r.getLong(0)}: $rebuilt != $want")
    }
    model.vocab.unpersist()
  }

  test("seeded-random corpora: train matches the plain-Scala reference") {
    val rnd = new scala.util.Random(42)
    (1 to 3).foreach { trial =>
      val alphabet = "abcd"
      val c = (1L to 6L).map { id =>
        val words = (0 until 4 + rnd.nextInt(5)).map { _ =>
          (0 until 1 + rnd.nextInt(6))
            .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
        }
        (id, words.mkString(" "))
      }
      val cdf = c.toDF("doc_id", "text")
      val model = Bpe.train(cdf, 6)
      val (wantMerges, wantSyms) = refTrain(c, 6)
      assert(model.merges == wantMerges, s"trial $trial corpus $c")
      val gotSyms = model.vocab.select("word", "syms").collect()
        .map(r => r.getString(0) -> r.getSeq[String](1).toVector).toMap
      assert(gotSyms == wantSyms, s"trial $trial corpus $c")
      model.vocab.unpersist()
    }
  }

  test("fertilityReport: hand-computed milli ratios per stratum, null on empty") {
    val model = Bpe.train(df, 8)
    val lens = model.vocab.select("word", "n_tokens").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    def tok(w: String): Long = lens.getOrElse(w, w.length.toLong + 1L)
    val probe = Seq(
      (1L, "low lowest", "s1"),
      (2L, "zebra", "s1"),
      (3L, "low low low", "s2")).toDF("doc_id", "text", "source")
    val got = Bpe.fertilityReport(probe, model).collect()
      .map(r => r.getAs[String]("source") -> r).toMap
    val s1Tokens = tok("low") + tok("lowest") + tok("zebra")
    val s1Chars = "low lowest".length.toLong + "zebra".length
    assert(got("s1").getAs[Long]("n_docs") == 2L)
    assert(got("s1").getAs[Long]("n_tokens") == s1Tokens)
    assert(got("s1").getAs[Long]("n_words") == 3L)
    assert(got("s1").getAs[Long]("n_chars") == s1Chars)
    assert(got("s1").getAs[Long]("chars_per_token_milli") ==
      s1Chars * 1000L / s1Tokens)
    assert(got("s1").getAs[Long]("tokens_per_word_milli") ==
      s1Tokens * 1000L / 3L)
    val s2Tokens = 3L * tok("low")
    assert(got("s2").getAs[Long]("tokens_per_word_milli") ==
      s2Tokens * 1000L / 3L)
    // a stratum with only empty text has zero tokens: null ratios, no
    // divide-by-zero
    val empty = Seq((9L, "", "sx")).toDF("doc_id", "text", "source")
    val ex = Bpe.fertilityReport(empty, model).collect()(0)
    assert(ex.getAs[Long]("n_tokens") == 0L && ex.isNullAt(5))
    model.vocab.unpersist()
  }

  test("round-trip bindings: OracleMerges merges all land at the gate SFs") {
    // the q101-q104 DuckDB replay has no early-stop branch, so the loop
    // must genuinely run all OracleMerges merges on the gate corpora
    for (dir <- Seq(sfDir, "/root/testdata/sf0.01")) {
      val docs = Tables.load(spark, dir, "documents")
      val m = Bpe.train(docs, Bpe.OracleMerges)
      assert(m.merges.length == Bpe.OracleMerges,
        s"$dir stopped early: ${m.merges}")
      m.vocab.unpersist()
    }
  }

  test("q101-q104 are mutually consistent on the real corpus") {
    val vocab = Bpe.q101BpeVocab(spark, sfDir).collect()
    val words = Tables.load(spark, sfDir, "documents")
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0).select("w").distinct().count()
    assert(vocab.length == words, "one vocab row per distinct corpus word")
    vocab.foreach { r =>
      assert(r.getAs[String]("syms_str").split(" ").length ==
        r.getAs[Long]("n_tokens"), s"n_tokens disagrees for $r")
    }
    val merges = Bpe.q102BpeMerges(spark, sfDir).collect()
    assert(merges.length == Bpe.OracleMerges)
    assert(merges.map(_.getAs[Long]("mrank")).toSeq ==
      (0L until Bpe.OracleMerges.toLong))
    val ids = Bpe.q104BpeTokenIds(spark, sfDir).collect()
    val toks = ids.map(_.getAs[String]("token"))
    assert(ids.map(_.getAs[Long]("token_id")).toSeq ==
      (0L until ids.length.toLong), "ids not dense")
    assert(toks.sameElements(toks.sorted), "ids not lexicographic")
    val produced = vocab.flatMap(_.getAs[String]("syms_str").split(" ")).toSet
    assert(produced == toks.toSet, "token table != produced symbols")
    val fert = Bpe.q103BpeFertility(spark, sfDir).collect()
    fert.foreach { r =>
      assert(r.getAs[Long]("chars_per_token_milli") ==
        r.getAs[Long]("n_chars") * 1000L / r.getAs[Long]("n_tokens"))
      assert(r.getAs[Long]("tokens_per_word_milli") ==
        r.getAs[Long]("n_tokens") * 1000L / r.getAs[Long]("n_words"))
    }
  }

  test("applyMerge is leftmost-greedy on overlapping pairs (aaa + (a,a) -> [aa, a])") {
    val out = Seq(Tuple1(Seq("a", "a", "a")))
      .toDF("syms")
      .select(Bpe.applyMerge(col("syms"), "a", "a").as("m"))
      .collect()(0).getSeq[String](0)
    assert(out == Seq("aa", "a"))
  }
}
