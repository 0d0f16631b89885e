package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Bucketing

/** PERSISTED decontamination screen — the serving artifact for
  * [[TextOps.decontaminationScreen]]: eval suites are stable for months,
  * so the eval-side Bloom filter is fit ONCE ([[build]]: shingle + hash +
  * bloom-aggregate the benchmark, a few MB of bits) and persisted as a
  * one-row table; any later session — or a different cluster —
  * [[attach]]es it and [[screen]]s arbitrary corpora with ZERO benchmark
  * recomputation. The apply side stays what makes the screen the right
  * 100 TB shape: a pure MAP-ONLY projection (the bits ride as a literal
  * into the closure — no join, no shuffle, no scan beyond the corpus),
  * with no false negatives by Bloom construction (every doc the exact
  * [[TextOps.decontaminate]] would flag is flagged) and false positives
  * at the filter's rate — feed only the flagged sliver to the exact pass.
  *
  * Bit-parity: parquet binary round-trips the filter bytes exactly, so a
  * persisted screen flags bit-identically to the in-session
  * [[TextOps.decontaminationScreen]] over the same benchmark
  * (spec-pinned across a catalog wipe). */
object BloomScreen {

  /** Fit the benchmark's Bloom filter and persist it under `dir` (also
    * registering `<prefix>` in this session's catalog). `nGrams` is the
    * overlap window (3 = the oracle-checked binding; production
    * decontamination runs 8–13); `numBits` sizes the filter (false-
    * positive rate, not recall, is what it buys). */
  def build(bench: DataFrame, id: String, text: String, dir: String,
      prefix: String = "bloom_screen", nGrams: Int = 3,
      numBits: Long = 1L << 22): Unit = {
    val s = bench.sparkSession
    val nb = bench.select(col(id).cast("long").as("doc_id"),
      col(text).cast("string").as("text"))
    val bytes = TextDedup.bloomScreenBytes(nb, nGrams, numBits)
    import s.implicits._
    Bucketing.writePlainExternal(
      Seq((nGrams, numBits, bytes)).toDF("n_grams", "num_bits", "bits")
        .coalesce(1),
      prefix, dir)
    TextDedup.unpersistDerivationsNOf(nb, nGrams)
  }

  /** The standard Bloom sizing: bits for `nItems` distinct members at
    * target false-positive rate `fpp` — m = ⌈−n·ln p / (ln 2)²⌉. The
    * matching optimal hash count k ≈ m/n·ln2 = log₂(1/p) is what the
    * aggregate derives when handed the true item count. */
  def bitsFor(nItems: Long, fpp: Double): Long = {
    require(fpp > 0.0 && fpp < 1.0, s"fpp must be in (0,1), got $fpp")
    require(nItems > 0L, s"need a positive item count, got $nItems")
    math.ceil(-nItems * math.log(fpp) / (math.log(2) * math.log(2))).toLong
  }

  /** [[build]] with the filter SIZED from the data instead of a guessed
    * bit count (r14 verdict item 7): counts the benchmark's distinct
    * `nGrams`-gram shingles once, derives `numBits` via [[bitsFor]] at
    * the target SHINGLE-level false-positive rate `fpp`, and hands the
    * aggregate the true item count so it picks the optimal hash count.
    * The persisted row carries (n_items, fpp) alongside the bits for
    * observability; [[attach]]/[[screen]] read both layouts.
    *
    * Calibration note (BloomScreenSpec measures this): `fpp` is the
    * PER-SHINGLE rate; a clean document probing the filter with s
    * distinct shingles false-flags at ≈ 1−(1−fpp)^s ≈ s·fpp, so pick
    * fpp ≪ 1 / (expected shingles per doc) — e.g. 1e-4 holds doc-level
    * false flags near 2% for 200-shingle documents. Returns the sized
    * bit count. */
  def buildSized(bench: DataFrame, id: String, text: String, dir: String,
      prefix: String = "bloom_screen", nGrams: Int = 3,
      fpp: Double = 1e-4): Long = {
    val s = bench.sparkSession
    val nb = bench.select(col(id).cast("long").as("doc_id"),
      col(text).cast("string").as("text"))
    val nItems = TextDedup.distinctShingleCount(nb, nGrams)
    val numBits = bitsFor(nItems, fpp)
    val bytes = TextDedup.bloomScreenBytes(nb, nGrams, numBits, nItems)
    import s.implicits._
    Bucketing.writePlainExternal(
      Seq((nGrams, numBits, bytes, nItems, fpp))
        .toDF("n_grams", "num_bits", "bits", "n_items", "fpp")
        .coalesce(1),
      prefix, dir)
    TextDedup.unpersistDerivationsNOf(nb, nGrams)
    numBits
  }

  /** Register a persisted screen — metadata only (the bits load lazily
    * at first [[screen]] call). */
  def attach(spark: SparkSession, dir: String,
      prefix: String = "bloom_screen"): Unit =
    Bucketing.attachPlain(spark, prefix, dir)

  /** Flag `corpus` against the attached screen: (doc_id, flagged 0/1),
    * map-only — one tiny driver read of the bits row, then a projection
    * over the corpus. */
  def screen(corpus: DataFrame, id: String, text: String,
      prefix: String = "bloom_screen"): DataFrame = {
    val s = corpus.sparkSession
    val r = s.table(prefix).head()
    TextDedup.bloomScreenApply(
      corpus.select(col(id).cast("long").as("doc_id"),
        col(text).cast("string").as("text")),
      r.getAs[Array[Byte]]("bits"), r.getAs[Int]("n_grams"))
  }
}
