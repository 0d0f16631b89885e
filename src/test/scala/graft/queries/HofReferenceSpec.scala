package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Independent-reimplementation checks for the nested-HOF projections —
  * the code whose correctness is hardest to see by inspection (let-bound
  * lambda arrays, slice/sequence boundary arithmetic, array_distinct
  * first-occurrence semantics). Each operator runs over a seeded-random
  * ADVERSARIAL corpus (empty docs, single tokens, double spaces =
  * empty-string tokens, lengths pinned to every boundary: k−1, k, w+k−1,
  * chunk multiples ±1, planted repeated blocks) and every row is
  * compared against a plain-Scala reference written from the SPEC, not
  * the implementation. The DuckDB oracle already cross-checks these on
  * the driver corpus; this spec covers the edge shapes a realistic
  * corpus never hits. */
class HofReferenceSpec extends SparkSpec {

  private def md5hex(s: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    d.map("%02x".format(_)).mkString
  }

  /** Seeded corpus: deterministic across runs and boxes. */
  private lazy val corpus: Seq[(Long, String)] = {
    val rnd = new scala.util.Random(421331)
    val vocab = Vector("the", "a", "of", "x", "yy", "zzz", "data", "model",
      "train", "eval", "loss", "token", "α", "ß", "", "q")
    def word(): String = vocab(rnd.nextInt(vocab.length))
    val edge = Seq(
      "",                       // empty text
      "one",                    // single token
      "a b",                    // k-1 grams boundary (k=3)
      "a b c",                  // exactly one gram
      "a b c d e f",            // w+k-1 = 6: one full window
      "x  y",                   // double space -> empty-string token
      " lead", "trail ",        // leading/trailing space
      Seq.fill(8)("dup dup dup dup").mkString(" ")) // heavy repetition
    val rand = (0 until 120).map { _ =>
      val n = rnd.nextInt(40)
      val base = Seq.fill(n)(word())
      // plant a repeated block in ~1/3 of docs
      val t = if (n > 8 && rnd.nextInt(3) == 0) {
        val blk = base.take(4 + rnd.nextInt(4))
        base ++ blk ++ base.drop(n / 2) ++ blk
      } else base
      t.mkString(" ")
    }
    (edge ++ rand).zipWithIndex.map { case (t, i) => (i.toLong, t) }
  }

  private lazy val df = {
    val s = spark
    import s.implicits._
    corpus.toDF("doc_id", "text")
  }

  // ---- q65 winnowing (Curation.winnowedOf, k=3, w=4) ----

  private def naiveWinnow(text: String, k: Int, w: Int): (Long, Long, String) = {
    val toks = text.split(" ", -1)
    val nGrams = math.max(toks.length - (k - 1), 0)
    val sel: Seq[String] =
      if (nGrams == 0) Seq.empty
      else {
        val grams = (0 until nGrams)
          .map(i => md5hex(toks.slice(i, i + k).mkString(" ")))
        // positions 1..max(nGrams-w+1, 1); a short doc contributes its
        // single truncated window (slice truncates at the end)
        (0 until math.max(nGrams - (w - 1), 1))
          .map(i => grams.slice(i, i + w).min).distinct
      }
    val digest = md5hex(sel.sorted.mkString(","))
    (nGrams.toLong, sel.size.toLong, digest)
  }

  test("winnowedOf == plain-Scala reference on the adversarial corpus") {
    val got = Curation.winnowedOf(df, 3, 4)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(got.size == corpus.size)
    corpus.foreach { case (id, text) =>
      assert(got(id) == naiveWinnow(text, 3, 4),
        s"doc $id ${text.take(60).mkString}: got ${got(id)}, " +
          s"want ${naiveWinnow(text, 3, 4)}")
    }
  }

  // ---- q84 intra-doc dedup (TextPipeline.intraDocDedupOf) ----

  private def naiveIntraDedup(text: String,
      chunkLen: Int): (Long, Long, Long, String) = {
    val toks = text.split(" ", -1)
    // starts 1, 1+chunkLen, ... up to max(len, 1): an empty token list
    // still yields one (empty) chunk, mirroring sequence(1, greatest(n,1))
    val starts = 1 to math.max(toks.length, 1) by chunkLen
    val chunks = starts.map(st => toks.slice(st - 1, st - 1 + chunkLen)
      .mkString(" "))
    val kept = chunks.distinct // first-occurrence order, the keep rule
    val nClean = kept.map(_.split(" ", -1).length.toLong).sum
    (chunks.size.toLong, (chunks.size - kept.size).toLong, nClean,
      md5hex(kept.mkString(" ")))
  }

  test("intraDocDedupOf == plain-Scala reference on the adversarial corpus") {
    val chunkLen = TextPipeline.IntraChunkLen
    val got = TextPipeline.intraDocDedupOf(df, chunkLen)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))).toMap
    assert(got.size == corpus.size)
    corpus.foreach { case (id, text) =>
      assert(got(id) == naiveIntraDedup(text, chunkLen),
        s"doc $id '${text.take(60)}': got ${got(id)}, " +
          s"want ${naiveIntraDedup(text, chunkLen)}")
    }
  }

  // ---- q58 span grouping keys (the 128-bit xxhash pair refactor) ----

  test("duplicatedSpansOf finds exactly the naive duplicated spans (positions + counts)") {
    val spanLen = TextPipeline.SpanLen
    // naive: every spanLen-token run by (doc, pos), grouped by content
    val all = corpus.flatMap { case (id, text) =>
      val toks = text.split(" ", -1)
      if (toks.length < spanLen) Seq.empty
      else (0 to toks.length - spanLen).map(i =>
        (toks.slice(i, i + spanLen).mkString(" "), id, (i + 1).toLong))
    }
    val dupGroups = all.groupBy(_._1).filter(_._2.size > 1)
    val want = dupGroups.values.flatMap { occ =>
      val canon = occ.map(o => (o._2, o._3)).min
      occ.map(o => (o._2, o._3, md5hex(o._1), occ.size.toLong,
        if ((o._2, o._3) == canon) 1L else 0L))
    }.toSet
    val rows = TextOps.duplicatedSpans(df, "doc_id", "text", spanLen)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getLong(3), r.getLong(4))).toSet
    assert(rows == want,
      s"span sets differ: extra=${(rows -- want).take(3)} missing=${(want -- rows).take(3)}")
  }

  // ---- q92 span scrub (the transform: excise + verbatim rebuild) ----

  test("spanScrub == plain-Scala reference: excised positions and rebuilt text") {
    val spanLen = TextPipeline.SpanLen
    // duplicated spans, naive (same derivation as the q58 check above)
    val all = corpus.flatMap { case (id, text) =>
      val toks = text.split(" ", -1)
      if (toks.length < spanLen) Seq.empty
      else (0 to toks.length - spanLen).map(i =>
        (toks.slice(i, i + spanLen).mkString(" "), id, i + 1))
    }
    val cuts: Map[Long, Set[Int]] = all.groupBy(_._1).values
      .filter(_.size > 1)
      .flatMap { occ =>
        val canon = occ.map(o => (o._2, o._3)).min
        occ.filter(o => (o._2, o._3) != canon)
          .flatMap(o => (o._3 until o._3 + spanLen).map(p => (o._2, p)))
      }
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val want = corpus.map { case (id, text) =>
      val toks = text.split(" ", -1)
      val cut = cuts.getOrElse(id, Set.empty)
      val kept = toks.zipWithIndex.collect {
        case (t, i) if !cut.contains(i + 1) => t
      }
      id -> ((toks.length.toLong, kept.length.toLong,
        (toks.length - kept.length).toLong, md5hex(kept.mkString(" "))))
    }.toMap
    val got = TextOps.spanScrub(df, "doc_id", "text", spanLen)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))).toMap
    assert(got.size == corpus.size)
    corpus.foreach { case (id, text) =>
      assert(got(id) == want(id),
        s"doc $id '${text.take(60)}': got ${got(id)}, want ${want(id)}")
    }
  }

  // ---- q99 DSIR importance scoring (Curation.importanceScoreOf) ----

  test("importanceScoreOf == plain-Scala reference on the adversarial corpus") {
    // denser target slice (%3) than the corpus binding's %19 so the
    // 128-doc adversarial corpus exercises both keep outcomes broadly
    val targetRows = corpus.filter(_._1 % 3 == 0)
    val rawRows = corpus.filter(_._1 % 3 != 0)
    def toks(t: String): Seq[String] = t.split(" ", -1).toSeq
    val cT = targetRows.flatMap(r => toks(r._2))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val cR = rawRows.flatMap(r => toks(r._2))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val nT = cT.values.sum
    val nR = cR.values.sum
    val v = (cT.keySet ++ cR.keySet).size.toLong
    // EXACT double evaluation order of the implementation/oracle:
    // ((1e6 * (c_t+1)) * (n_r+v)) / ((c_r+1) * (n_t+v)), one round
    def wFp(tok: String): Long = math.round(
      1e6 * (cT.getOrElse(tok, 0L) + 1L).toDouble * (nR + v).toDouble /
        ((cR.getOrElse(tok, 0L) + 1L).toDouble * (nT + v).toDouble))
    val want = rawRows.map { case (id, text) =>
      val ws = toks(text).map(wFp)
      val sum = ws.sum
      val mean = math.round(sum.toDouble / ws.length)
      id -> ((ws.length.toLong, sum, mean, mean >= 1000000L))
    }.toMap
    val s = spark
    import s.implicits._
    val targetDf = targetRows.toDF("doc_id", "text")
    val rawDf = rawRows.toDF("doc_id", "text")
    val got = Curation.importanceScoreOf(rawDf,
      Curation.fitImportanceModel(targetDf, rawDf, "text"), "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))).toMap
    assert(got.size == rawRows.size)
    rawRows.foreach { case (id, text) =>
      assert(got(id) == want(id),
        s"doc $id '${text.take(60)}': got ${got(id)}, want ${want(id)}")
    }
    // sanity: the adversarial corpus produces both verdicts
    assert(want.values.exists(_._4) && want.values.exists(!_._4))
  }
}
