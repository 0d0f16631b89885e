package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Bucketing

/** PERSISTED text-dedup serving index — the q48 counterpart of the proven
  * vector-index parquet round-trip (`AnnRecallSpec`): the three corpus-side
  * artifacts [[TextOps.incrementalDedup]] derives per session
  *
  *   - `<prefix>_hashes`   (ch, exact_partner)   — min-id per content hash
  *   - `<prefix>_bands`    (doc_id, b, h)        — the MinHash band index
  *   - `<prefix>_shingles` (doc_id, ts)          — 3-gram sets for the
  *                                                 exact-Jaccard re-rank
  *
  * written ONCE as bucketed+sorted external tables ([[Bucketing]]), each
  * bucketed on its probe-join key (ch / (b, h) / doc_id). A fresh session —
  * or a different cluster entirely — [[attach]]es the artifact (metadata
  * only) and serves ingest verdicts with ZERO corpus recomputation: no
  * shingling, no signature pass, not even a scan of the corpus text. The
  * bucket layout means the probe joins need no exchange on the corpus
  * side — the batch side broadcasts (inner candidate join) or shuffles its
  * own batch-proportional rows into the bucket layout; the 100 TB index
  * never moves.
  *
  * Serving output is bit-identical to the in-session
  * [[TextOps.incrementalDedup]] by construction: both feed the SAME
  * verdict core ([[TextOps.incrementalVerdicts]]), and the persisted
  * frames are exactly the in-session derivations (parquet round-trips of
  * long/string/array columns are exact). `DedupIndexSpec` pins this.
  */
object DedupIndex {

  /** Default number of buckets per table. At 100 TB raise it so each
    * bucket file stays executor-sized (buckets are the unit of probe-join
    * parallelism on the corpus side). */
  val DefaultBuckets = 8

  private def tables(prefix: String): Seq[(String, Seq[String], String)] = Seq(
    (s"${prefix}_hashes", Seq("ch"), "hashes"),
    (s"${prefix}_bands", Seq("b", "h"), "bands"),
    (s"${prefix}_shingles", Seq("doc_id"), "shingles"))

  /** Derive the corpus artifacts and persist them under `dir` (also
    * registering `<prefix>_*` in this session's catalog). One corpus pass
    * per artifact; the shared shingle cache ([[TextDedup]]) means the
    * expensive 3-gram derivation is computed once across the three. */
  def build(corpus: DataFrame, id: String, text: String, dir: String,
      prefix: String = "dedup_idx", buckets: Int = DefaultBuckets): Unit = {
    val nc = corpus.select(col(id).cast("long").as("doc_id"),
      col(text).cast("string").as("text"))
    val frames = Map(
      "hashes" -> nc.select(col("doc_id"), md5(col("text")).as("ch"))
        .groupBy("ch").agg(min("doc_id").as("exact_partner")),
      "bands" -> TextDedup.bandRowsOf(nc),
      "shingles" -> TextDedup.shingleSetsOf(nc))
    tables(prefix).foreach { case (table, keys, sub) =>
      Bucketing.writeBucketedExternal(frames(sub), table, keys,
        s"$dir/$sub", buckets)
    }
    // release the derivation caches build() itself populated: the index
    // is on disk now, and a long-lived builder session should not keep
    // the corpus-sized shingle/band plans pinned
    TextDedup.unpersistDerivationsOf(nc)
  }

  /** APPEND a batch of documents to an attached/built index — the text
    * twin of [[VectorIndex.append]], and STRONGER: the MinHash/shingle
    * derivations are model-free (no quantizer to freeze), so an appended
    * index serves verdicts bit-identical to a full rebuild over
    * corpus ∪ batch whenever the appended content is novel (the admitted
    * ingest stream — spec-pinned in DedupIndexSpec). The one divergence:
    * a batch doc whose content hash ALREADY exists keeps the corpus's
    * exact-partner row (its novel-ch filter skips the collision), where a
    * rebuild would re-minimize over both ids — irrelevant for admitted
    * (verdict `new`) docs, which have no existing partner by definition.
    * Each append adds one file set per bucket; rebuild to compact. */
  def append(batch: DataFrame, id: String, text: String,
      prefix: String = "dedup_idx"): Unit = {
    val s = batch.sparkSession
    val nc = batch.select(col(id).cast("long").as("doc_id"),
      col(text).cast("string").as("text"))
    def bucketsOf(table: String): Int =
      s.sessionState.catalog
        .getTableMetadata(
          org.apache.spark.sql.catalyst.TableIdentifier(table))
        .bucketSpec.map(_.numBuckets).getOrElse(DefaultBuckets)
    def appendTo(df: DataFrame, table: String, keys: Seq[String]): Unit =
      df.repartition(bucketsOf(table), keys.map(col): _*)
        .write.mode(org.apache.spark.sql.SaveMode.Append)
        .bucketBy(bucketsOf(table), keys.head, keys.tail: _*)
        .sortBy(keys.head, keys.tail: _*)
        .option("compression", "snappy")
        .saveAsTable(table)
    val hashes = nc.select(col("doc_id"), md5(col("text")).as("ch"))
      .groupBy("ch").agg(min("doc_id").as("exact_partner"))
      // novel-ch only: a second row per ch would multiply the probe join
      .join(s.table(s"${prefix}_hashes").select("ch"), Seq("ch"),
        "left_anti")
    appendTo(hashes, s"${prefix}_hashes", Seq("ch"))
    appendTo(TextDedup.bandRowsOf(nc), s"${prefix}_bands", Seq("b", "h"))
    appendTo(TextDedup.shingleSetsOf(nc), s"${prefix}_shingles",
      Seq("doc_id"))
    TextDedup.unpersistDerivationsOf(nc)
  }

  /** COMPACT an attached index into `outDir` — the [[VectorIndex.compact]]
    * twin: every [[append]] adds one file set per bucket, compaction
    * rewrites the three tables (collapsing them) with identical content,
    * so serving is bit-identical (the derivations are data, not model —
    * nothing to freeze). Refuses the live location. */
  def compact(spark: SparkSession, outDir: String,
      prefix: String = "dedup_idx", outPrefix: String = "dedup_idx",
      buckets: Int = DefaultBuckets): Unit = {
    val oldLoc = spark.sessionState.catalog
      .getTableMetadata(
        org.apache.spark.sql.catalyst.TableIdentifier(s"${prefix}_hashes"))
      .location.toString.stripSuffix("/")
    require(!oldLoc.endsWith(
        new java.io.File(s"$outDir/hashes").getAbsolutePath.stripSuffix("/")),
      s"compact target $outDir is the live index location — compaction " +
        "rewrites tables while reading them, so it needs a fresh directory")
    tables(prefix).zip(tables(outPrefix)).foreach {
      case ((src, keys, sub), (dst, _, _)) =>
        Bucketing.writeBucketedExternal(spark.table(src), dst, keys,
          s"$outDir/$sub", buckets)
    }
  }

  /** Register an existing index written by [[build]] in `spark`'s catalog
    * — metadata only (no data job, no corpus recomputation); `buckets`
    * must match the build-time value for the planner to prove the
    * layout. */
  def attach(spark: SparkSession, dir: String,
      prefix: String = "dedup_idx", buckets: Int = DefaultBuckets): Unit =
    tables(prefix).foreach { case (table, keys, sub) =>
      Bucketing.attachBucketed(spark, table, keys, s"$dir/$sub", buckets)
    }

  /** q48-semantics ingest verdicts for `batch`, served entirely off the
    * persisted `<prefix>_*` tables ([[build]] or [[attach]] must have
    * registered them in `batch`'s session). Batch-proportional: the batch
    * derives its own hashes/bands/shingles; the corpus contributes only
    * bucketed table scans. */
  def incrementalDedup(batch: DataFrame, id: String, text: String,
      prefix: String = "dedup_idx", threshold: Double = 0.5): DataFrame = {
    val s = batch.sparkSession
    TextOps.incrementalVerdicts(
      batch.select(col(id).cast("long").as("doc_id"),
        col(text).cast("string").as("text")),
      s.table(s"${prefix}_hashes"),
      s.table(s"${prefix}_bands"),
      s.table(s"${prefix}_shingles"), threshold)
  }
}
