package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed BPE tokenizer training (Sennrich et al. 2016, the
  * word-histogram formulation) — the "train a tokenizer on the corpus" leg
  * of an LLM data pipeline, built so the CORPUS-scale cost is exactly one
  * `groupBy(word)` pass:
  *
  *  - `wordHistogram` reduces the corpus to (word, count) — bounded by the
  *    natural-language vocabulary (Heaps' law: ~millions of rows at 100 TB,
  *    not trillions), with map-side partial aggregation collapsing repeats
  *    before the one shuffle.
  *  - every merge iteration then runs on the HISTOGRAM only: adjacent-pair
  *    counts are a `zip_with`+`explode` two-phase aggregate weighted by
  *    word count (output bounded by |observed symbol pairs|), the argmax is
  *    a 1-row `orderBy(...).limit(1)` with a total (count desc, l, r)
  *    tie-break so training is deterministic, and the merge applies as a
  *    leftmost-greedy `aggregate` HOF fold over each word's symbol array —
  *    a pure projection, no shuffle. Each step materializes into the cache
  *    and releases its parent, so plan depth stays O(1) per merge instead
  *    of accumulating N chained projections.
  *  - applying the trained tokenizer to a corpus never re-runs BPE per
  *    document: the final word→symbols vocabulary (a training byproduct)
  *    broadcast-joins against the corpus words, so apply cost is
  *    O(corpus words) + O(|vocab| · merges) — the second term independent
  *    of corpus size. OOV words fall back to character-level (chars +
  *    end-of-word), the worst case BPE itself degenerates to.
  *
  * The driver holds only the merge list (numMerges rows) and the loop's
  * 1-row argmax results — no corpus data. Oracle: q98 pins the iteration-0
  * pair statistics (SQL-expressible); the merge LOOP is pinned against a
  * plain-Scala reference implementation in BpeSpec (the HofReferenceSpec
  * pattern), since its iterated argmax is not expressible in one DuckDB
  * query.
  */
object Bpe {

  /** End-of-word marker (Sennrich et al.'s `</w>`): lets the tokenizer
    * distinguish word-final subwords and makes detokenization lossless. */
  val Eow = "</w>"

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")

  /** (word, wc) — the ONE corpus-scale pass. */
  def wordHistogramOf(d: DataFrame, textCol: String = "text"): DataFrame =
    d.select(explode(split(col(textCol), " ")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("wc"))

  /** Initial symbol sequence of a word: its characters plus `</w>`. */
  private[queries] def initSyms(word: Column): Column =
    concat(filter(split(word, ""), c => length(c) > 0), array(lit(Eow)))

  /** Adjacent-symbol pairs weighted by word count, over a histogram frame
    * carrying a `syms` array column. Output bounded by distinct observed
    * pairs — two-phase aggregate, map-side combine does the heavy lifting
    * on skewed vocabularies. */
  def pairCountsOf(hist: DataFrame): DataFrame = {
    val n = size(col("syms"))
    hist
      .filter(n >= 2)
      .select(col("wc"), explode(zip_with(
        slice(col("syms"), lit(1), n - 1),
        slice(col("syms"), lit(2), n - 1),
        (a, b) => struct(a.as("l"), b.as("r")))).as("p"))
      .groupBy(col("p.l").as("l"), col("p.r").as("r"))
      .agg(sum(col("wc")).as("pc"))
  }

  /** Leftmost-greedy application of ONE merge (a,b)→ab to a symbol array —
    * the standard BPE scan as an `aggregate` fold: a pair consumed by a
    * merge cannot seed an overlapping one ("aaa" + (a,a) → [aa, a]). Pure
    * projection: no shuffle, no UDF. */
  private[queries] def applyMerge(syms: Column, a: String, b: String): Column =
    aggregate(syms, typedLit(Seq.empty[String]),
      (acc, x) => when(size(acc) > 0 &&
          element_at(acc, -1) === lit(a) && x === lit(b),
        concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
        .otherwise(concat(acc, array(x))))

  /** Trained tokenizer: ranked merges plus the word→symbols vocabulary the
    * training loop produced (the serving artifact — broadcastable). */
  final case class BpeModel(merges: Seq[(String, String)], vocab: DataFrame)

  /** Learn `numMerges` merges (stopping early when no pair repeats —
    * `minCount` floor). Each iteration: one bounded-histogram aggregate +
    * a 1-row argmax + a checkpointed fold projection.
    *
    * Lineage is cut with [[Caching.cutLineage]] (eager localCheckpoint;
    * reliable `checkpoint()` under `spark.graft.dedup.checkpointDir`)
    * rather than chained `cache()`: an InMemoryRelation EMBEDS its child's
    * whole physical tree (AQE stages included), so k chained cache steps
    * nest k plan trees and plan stringification / analysis grows
    * superlinearly — measured pathological (minutes, then a blown render)
    * at 20 merges before this was a checkpoint loop, the same reason the
    * connected-components fixpoint checkpoints. A checkpointed step is a
    * flat LogicalRDD scan: plan depth stays O(1) however many merges run.
    * The loop keeps ≤2 step snapshots alive (the superseded one is
    * unpersisted and its blocks reclaimed by the context cleaner). */
  def train(d: DataFrame, numMerges: Int, minCount: Long = 2,
      textCol: String = "text"): BpeModel = {
    var hist = Caching.cutLineage(
      wordHistogramOf(d, textCol).withColumn("syms", initSyms(col("word"))),
      eager = true)
    val merges = Seq.newBuilder[(String, String)]
    var done = false
    var step = 0
    while (!done && step < numMerges) {
      val top = pairCountsOf(hist)
        .orderBy(desc("pc"), asc("l"), asc("r")).limit(1).collect()
      if (top.isEmpty || top(0).getAs[Long]("pc") < minCount) done = true
      else {
        val (a, b) = (top(0).getAs[String]("l"), top(0).getAs[String]("r"))
        merges += ((a, b))
        val next = Caching.cutLineage(
          hist.withColumn("syms", applyMerge(col("syms"), a, b)), eager = true)
        hist.unpersist()
        hist = next
        step += 1
      }
    }
    BpeModel(merges.result(),
      hist.withColumn("n_tokens", size(col("syms")).cast("long")))
  }

  /** Per-document token counts under a trained model: corpus words
    * broadcast-join the bounded vocabulary; OOV words cost chars+1
    * (character-level fallback). No per-document BPE scan. */
  def tokenCounts(d: DataFrame, model: BpeModel, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    d.select(col(idCol), explode(split(col(textCol), " ")).as("word"))
      .filter(length(col("word")) > 0)
      .join(broadcast(model.vocab.select(col("word"), col("n_tokens"))),
        Seq("word"), "left")
      .withColumn("n_tokens",
        coalesce(col("n_tokens"), length(col("word")).cast("long") + 1L))
      .groupBy(col(idCol))
      .agg(sum(col("n_tokens")).as("bpe_tokens"), count(lit(1)).as("words"))

  /** Per-stratum tokenizer FERTILITY report under a trained model — the
    * standard tokenizer-health metric reviewed before committing a
    * vocabulary: characters per token (low ⇒ the vocabulary fragments
    * this stratum into char-level pieces — the classic symptom of a
    * tokenizer trained on the wrong register/language) and tokens per
    * word (fertility proper; 1.0 ⇒ every word is a single symbol).
    * Ratios are fixed-point milli integers (`x·1000 div y` — exact,
    * order-independent, the house determinism contract); a stratum with
    * zero tokens reports null ratios rather than dividing by zero.
    *
    * Output per stratum: (source, n_docs, n_tokens, n_words, n_chars,
    * chars_per_token_milli, tokens_per_word_milli), ordered by source.
    *
    * Scale: [[tokenCounts]]'s broadcast-vocabulary join (the corpus
    * never shuffles for it) into a per-doc aggregate, then one
    * |strata|-row rollup — two two-phase aggregates, model-bounded
    * broadcast, corpus-linear. */
  def fertilityReport(d: DataFrame, model: BpeModel,
      idCol: String = "doc_id", textCol: String = "text",
      strata: String = "source"): DataFrame = {
    val counts = tokenCounts(d.select(col(idCol), col(textCol)), model,
      idCol, textCol)
    d.select(col(idCol), col(strata).as("source"),
        length(col(textCol)).cast("long").as("doc_chars"))
      .join(counts, Seq(idCol), "left")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(coalesce(col("bpe_tokens"), lit(0L))).as("n_tokens"),
        sum(coalesce(col("words"), lit(0L))).as("n_words"),
        sum(col("doc_chars")).as("n_chars"))
      .select(col("source"), col("n_docs"), col("n_tokens"), col("n_words"),
        col("n_chars"),
        // nullif: ANSI div raises on zero; an empty stratum reports null
        expr("(n_chars * 1000) div nullif(n_tokens, 0)")
          .as("chars_per_token_milli"),
        expr("(n_tokens * 1000) div nullif(n_words, 0)")
          .as("tokens_per_word_milli"))
      .orderBy("source")
  }

  /** Applies the full merge list to one word, driver-side — EXACT BPE.
    * Sequential application in rank order equals greedy
    * lowest-rank-first (the reference tokenizer algorithm): a merge only
    * creates adjacencies involving its brand-new symbol, and no pair
    * containing a symbol born at rank j can have rank < j, so earlier
    * merges never become applicable again once passed. This is also
    * exactly how training evolved the vocabulary, so in-vocab words
    * reproduce their trained symbol sequences bit-for-bit. */
  private[queries] def applyAll(word: String,
      merges: Seq[(String, String)]): Vector[String] =
    merges.foldLeft(word.map(_.toString).toVector :+ Eow) { case (syms, (a, b)) =>
      syms.foldLeft(Vector.empty[String]) { (acc, x) =>
        if (acc.nonEmpty && acc.last == a && x == b) acc.init :+ (a + b)
        else acc :+ x
      }
    }

  /** Distinct-OOV cap for [[encode]]'s `exactOov` path (session conf):
    * the OOV words of a batch are collected to the driver for exact
    * merge-folding — bounded by DISTINCT novel words, the same
    * bounded-collect discipline as the k-means seed collect. Beyond the
    * cap the call fails loudly (an adversarial all-novel corpus should
    * surface, not OOM the driver); raise the conf or use the default
    * char-level fallback for such corpora. */
  val OovCapConf = "spark.graft.bpe.oovMaxDistinct"

  /** Full order-preserving tokenization: (id, tokens array) per document.
    * Same broadcast-vocab shape as [[tokenCounts]] — corpus words join the
    * bounded word→symbols table, then ONE groupBy reassembles each
    * document's subword stream in word order (`array_sort` on (pos, syms)
    * structs — no window, no second shuffle).
    *
    * OOV handling: by default char-level symbols (chars + `</w>`,
    * consistent with [[tokenCounts]]' fallback length). With
    * `exactOov = true` the batch's DISTINCT novel words are merge-folded
    * driver-side ([[applyAll]] — exact reference-tokenizer semantics) and
    * broadcast back, capped by [[OovCapConf]] (default 100000): the
    * serving-time contract where any input word tokenizes exactly as a
    * trained tokenizer would. */
  def encode(d: DataFrame, model: BpeModel, idCol: String = "doc_id",
      textCol: String = "text", exactOov: Boolean = false): DataFrame = {
    val words = d
      .select(col(idCol), posexplode(split(col(textCol), " ")).as(Seq("pos", "word")))
      .filter(length(col("word")) > 0)
    val joined = words
      .join(broadcast(model.vocab.select(col("word"), col("syms"))),
        Seq("word"), "left")
    val resolved =
      if (!exactOov)
        joined.withColumn("syms", coalesce(col("syms"), initSyms(col("word"))))
      else {
        val s = d.sparkSession
        val cap = s.conf.get(OovCapConf, "100000").toInt
        val oov = joined.filter(col("syms").isNull)
          .select(col("word")).distinct().limit(cap + 1).collect()
          .map(_.getString(0))
        require(oov.length <= cap,
          s"encode(exactOov=true): > $cap distinct OOV words in this batch " +
            s"($OovCapConf); raise the conf or use the char-level fallback")
        if (oov.isEmpty) joined
        else {
          val folded = s.createDataFrame(
            oov.toSeq.map(w => (w, applyAll(w, model.merges))))
            .toDF("word", "oov_syms")
          joined.join(broadcast(folded), Seq("word"), "left")
            .withColumn("syms", coalesce(col("syms"), col("oov_syms")))
            .drop("oov_syms")
        }
      }
    resolved
      .groupBy(col(idCol))
      .agg(flatten(array_sort(collect_list(struct(col("pos"), col("syms"))))
        .getField("syms")).as("tokens"))
  }

  /** Persist a trained model as two parquet tables — the serving contract
    * a fresh cluster starts from (same pattern as the percentile gate's
    * fit/apply round-trip): the word→symbols vocabulary (the broadcast
    * apply artifact) and the ranked merge list (the audit trail + the
    * input an exact-OOV serving tokenizer would fold). */
  def saveModel(model: BpeModel, dir: String): Unit = {
    val s = model.vocab.sparkSession
    model.vocab.write.mode("overwrite").parquet(s"$dir/vocab.parquet")
    s.createDataFrame(model.merges.zipWithIndex.map {
      case ((a, b), i) => (i.toLong, a, b)
    }).toDF("rank", "left", "right")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/merges.parquet")
  }

  /** Load a persisted model; the vocabulary comes back cached (it is the
    * per-batch broadcast side of [[encode]]/[[tokenCounts]]). */
  def loadModel(s: SparkSession, dir: String): BpeModel = {
    val vocab = s.read.parquet(s"$dir/vocab.parquet").cache()
    val merges = s.read.parquet(s"$dir/merges.parquet")
      .orderBy("rank").collect()
      .map(r => (r.getAs[String]("left"), r.getAs[String]("right"))).toSeq
    BpeModel(merges, vocab)
  }

  /** Bounded token→id table (the vocabulary artifact a trainer ships):
    * every distinct symbol the trained vocabulary produces, densely
    * numbered in lexicographic order so ids are deterministic across
    * engines and runs. The global-order window is safe here by
    * construction — the frame is the FINAL subword vocabulary (bounded by
    * |merges| + alphabet, not corpus size). */
  def tokenIds(model: BpeModel): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.orderBy("token")
    model.vocab.select(explode(col("syms")).as("token")).distinct()
      .withColumn("token_id", row_number().over(w).cast("long") - 1L)
  }

  // ---- registered oracle-checked slice ---------------------------------

  /** Merge count of the train round-trip bindings (q101–q104): small
    * enough that the DuckDB replay (8 materialized CTE iterations) stays
    * sub-second, large enough that merged symbols feed later merges
    * (rank-3 `er</w>` consumes rank-0's `er` on this corpus). BpeSpec
    * pins that all 8 merges clear the `minCount` floor at the gate SF, so
    * the replay never needs the early-stop branch. */
  val OracleMerges = 8

  /** Bounded memo of the trained oracle model per (session, dir):
    * training runs driver-side merge iterations at call time, so
    * plan-identity caching alone cannot stop the four train-derived
    * bindings (and Bench's 3 runs of each) from re-paying the loop.
    * Evicted models become unreachable and the ContextCleaner reclaims
    * their checkpoint blocks; a lost concurrent build race adopts the
    * winner ([[BoundedMemo]], r13 advisor). */
  private val trainMemo = new BoundedMemo[(SparkSession, String), BpeModel](8)

  private def trainedModel(s: SparkSession, dir: String): BpeModel =
    trainMemo.getOrBuild((s, dir))(train(docs(s, dir), OracleMerges))

  /** q101: the TRAINED vocabulary after [[OracleMerges]] merges — the
    * round-trip artifact [[saveModel]] persists, cross-engine-checked
    * (VERDICT r12 #3: q98 pins only iteration-0 pair stats; this pins
    * the whole loop's output). Symbols join with ' ' so the compare
    * stays scalar. */
  def q101BpeVocab(s: SparkSession, dir: String): DataFrame =
    trainedModel(s, dir).vocab
      .select(col("word"), col("wc"),
        array_join(col("syms"), " ").as("syms_str"), col("n_tokens"))
      .orderBy("word")

  /** q102: the ranked merge list (the audit-trail half of the model). */
  def q102BpeMerges(s: SparkSession, dir: String): DataFrame = {
    val m = trainedModel(s, dir)
    s.createDataFrame(m.merges.zipWithIndex.map {
      case ((a, b), i) => (i.toLong, a, b)
    }).toDF("mrank", "l", "r").orderBy("mrank")
  }

  /** q103: [[fertilityReport]] under the trained model — per-stratum
    * chars/token + tokens/word fixed-point ratios. */
  def q103BpeFertility(s: SparkSession, dir: String): DataFrame =
    fertilityReport(docs(s, dir), trainedModel(s, dir))

  /** q104: [[tokenIds]] under the trained model — the dense
    * lexicographic token→id table. */
  def q104BpeTokenIds(s: SparkSession, dir: String): DataFrame =
    tokenIds(trainedModel(s, dir)).orderBy("token")

  // ---- DuckDB replay of the merge loop ---------------------------------

  /** DuckDB twin of [[train]] for [[OracleMerges]] merges, as a CTE
    * prefix ending in the final word state `s<N>`. Each word's symbol
    * list is PACKED as chr(30)||sym||chr(31) per symbol (control chars,
    * absent from any space-split token), so applying merge (a,b)→ab is
    * one `replace()` — SQL's left-to-right non-overlapping replace is
    * exactly the leftmost-greedy fold [[applyMerge]] runs ("aaa"+(a,a) →
    * [aa,a] in both), and the wrappers make partial-symbol matches
    * impossible. Every CTE is MATERIALIZED: the iteration chain
    * otherwise re-expands s0 exponentially (measured: >2 min unhinted,
    * 0.6 s materialized). */
  private def oracleTrainPrefix: String = {
    val o = "chr(30)"
    val c = "chr(31)"
    val b = new StringBuilder
    b ++= s"""WITH words AS MATERIALIZED (
      |  SELECT w AS word, count(*) AS wc
      |  FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
      |  WHERE len(w) > 0 GROUP BY 1),
      |s0 AS MATERIALIZED (
      |  SELECT word, wc,
      |    regexp_replace(word, '(.)', $o||'\\1'||$c, 'g')
      |      || $o||'</w>'||$c AS packed
      |  FROM words)""".stripMargin
    for (i <- 1 to OracleMerges) {
      b ++= s""",
        |t$i AS MATERIALIZED (
        |  SELECT l, r FROM (
        |    SELECT syms[g.i] AS l, syms[g.i + 1] AS r, sum(wc) AS pc
        |    FROM (SELECT wc, string_split(substr(packed, 2, len(packed) - 2),
        |            $c||$o) AS syms FROM s${i - 1}) u,
        |      LATERAL (SELECT unnest(generate_series(1, len(syms) - 1)) AS i) g
        |    GROUP BY 1, 2)
        |  ORDER BY pc DESC, l, r LIMIT 1),
        |s$i AS MATERIALIZED (
        |  SELECT word, wc, replace(packed, $o||t.l||$c||$o||t.r||$c,
        |    $o||t.l||t.r||$c) AS packed
        |  FROM s${i - 1}, t$i t)""".stripMargin
    }
    b.result()
  }

  private def oracleQ101: String = {
    val o = "chr(30)"
    val c = "chr(31)"
    oracleTrainPrefix + s""",
      |unp AS (SELECT word, wc, replace(packed, $c||$o, ' ') AS j, packed
      |  FROM s$OracleMerges)
      |SELECT word, CAST(wc AS BIGINT) AS wc,
      |  substr(j, 2, len(j) - 2) AS syms_str,
      |  CAST(len(string_split(substr(packed, 2, len(packed) - 2), $c||$o))
      |    AS BIGINT) AS n_tokens
      |FROM unp ORDER BY word""".stripMargin
  }

  private def oracleQ102: String = {
    val union = (1 to OracleMerges)
      .map(i => s"SELECT CAST(${i - 1} AS BIGINT) AS mrank, l, r FROM t$i")
      .mkString("\n  UNION ALL ")
    oracleTrainPrefix + s""",
      |mrg AS ($union)
      |SELECT mrank, l, r FROM mrg ORDER BY mrank""".stripMargin
  }

  private def oracleQ103: String = {
    val o = "chr(30)"
    val c = "chr(31)"
    oracleTrainPrefix + s""",
      |vocabn AS (SELECT word,
      |    CAST(len(string_split(substr(packed, 2, len(packed) - 2), $c||$o))
      |      AS BIGINT) AS n_tokens
      |  FROM s$OracleMerges),
      |toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word
      |  FROM documents),
      |tokw AS (SELECT doc_id, COALESCE(v.n_tokens, len(t.word) + 1) AS nt
      |  FROM toks t LEFT JOIN vocabn v USING (word) WHERE len(t.word) > 0),
      |perdoc AS (SELECT doc_id, CAST(sum(nt) AS BIGINT) AS bpe_tokens,
      |  CAST(count(*) AS BIGINT) AS words FROM tokw GROUP BY doc_id),
      |strata AS (
      |  SELECT d.source, CAST(count(*) AS BIGINT) AS n_docs,
      |    CAST(sum(COALESCE(p.bpe_tokens, 0)) AS BIGINT) AS n_tokens,
      |    CAST(sum(COALESCE(p.words, 0)) AS BIGINT) AS n_words,
      |    CAST(sum(len(d.text)) AS BIGINT) AS n_chars
      |  FROM documents d LEFT JOIN perdoc p USING (doc_id)
      |  GROUP BY d.source)
      |SELECT source, n_docs, n_tokens, n_words, n_chars,
      |  (n_chars * 1000) // nullif(n_tokens, 0) AS chars_per_token_milli,
      |  (n_tokens * 1000) // nullif(n_words, 0) AS tokens_per_word_milli
      |FROM strata ORDER BY source""".stripMargin
  }

  private def oracleQ104: String = {
    val o = "chr(30)"
    val c = "chr(31)"
    oracleTrainPrefix + s""",
      |symsu AS (SELECT DISTINCT
      |    unnest(string_split(substr(packed, 2, len(packed) - 2), $c||$o))
      |      AS token
      |  FROM s$OracleMerges)
      |SELECT token,
      |  CAST(row_number() OVER (ORDER BY token) - 1 AS BIGINT) AS token_id
      |FROM symsu ORDER BY token""".stripMargin
  }

  /** q98: iteration-0 BPE pair statistics — the top-20 adjacent symbol
    * pairs (chars + `</w>`) by corpus-weighted count, the exact frame the
    * first merge argmax reads. Total (pc desc, l, r) order makes the
    * LIMIT deterministic. */
  def q98BpePairs(s: SparkSession, dir: String): DataFrame =
    pairCountsOf(wordHistogramOf(docs(s, dir))
      .withColumn("syms", initSyms(col("word"))))
      .orderBy(desc("pc"), asc("l"), asc("r"))
      .limit(20)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q98_bpe_pairs" -> q98BpePairs _,
    "q101_bpe_vocab" -> q101BpeVocab _,
    "q102_bpe_merges" -> q102BpeMerges _,
    "q103_bpe_fertility" -> q103BpeFertility _,
    "q104_bpe_token_ids" -> q104BpeTokenIds _)

  val oracle: Map[String, String] = Map(
    // same derivation declaratively: per word of length n, pairs
    // (c_i, c_{i+1}) for i<n plus (c_n, '</w>') — n pairs, weighted by wc
    "q98_bpe_pairs" ->
      """WITH words AS (
        |  SELECT w AS word, count(*) AS wc
        |  FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
        |  WHERE len(w) > 0 GROUP BY 1),
        |pairs AS (
        |  SELECT wc, substr(word, i, 1) AS l,
        |    CASE WHEN i = len(word) THEN '</w>'
        |         ELSE substr(word, i + 1, 1) END AS r
        |  FROM words, LATERAL (SELECT unnest(generate_series(1, len(word))) AS i) g)
        |SELECT l, r, CAST(sum(wc) AS BIGINT) AS pc FROM pairs
        |GROUP BY 1, 2 ORDER BY pc DESC, l, r LIMIT 20""".stripMargin,
    "q101_bpe_vocab" -> oracleQ101,
    "q102_bpe_merges" -> oracleQ102,
    "q103_bpe_fertility" -> oracleQ103,
    "q104_bpe_token_ids" -> oracleQ104)
}
