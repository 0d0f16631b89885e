package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** r20 optimization-round measurement probe: same-window, same-JVM A/B
  * of the round's vector-side changes at stress scale, on a corpus dir
  * REPLICATED by [[graft.ServingScaleProbe]] (`<work>/x<reps>e`).
  *
  *  - semantic trio sharing (VERDICT item 3): OLD shape = per-consumer
  *    UNCACHED band derivations (the r19 code's plans, reconstructed
  *    from the same primitives); NEW shape = the shipped
  *    `lshCandidatePairs` (cached self-join) + `semanticIncrementalById`
  *    (one shared cached band artifact, filtered per side). Both arms
  *    time the candidate derivation + re-rank — the part the change
  *    touches; the component/label tail is identical code either way.
  *  - PQ codes sharing (VERDICT item 5): OLD = fresh sampled books +
  *    a lazy uncached codes frame per consumer; NEW = the shipped
  *    `knnPqIndexed` (memoized books + cached codes frame). Each arm
  *    runs TWO probes — the q96 ADC scan and the q81 audit leg's
  *    re-derivation pattern.
  *
  * Caches are cleared between arms; each arm is min-of-N. Noop-free:
  * every timing ends in count() like the bench. Not on any query path.
  *
  * Usage: runMain graft.queries.R20Probe <replicatedDir> [cpus] [runs]
  */
object R20Probe {
  private def timed[A](s: SparkSession, label: String, runs: Int)(
      body: => Long): Unit = {
    val ts = (1 to runs).map { _ =>
      s.sparkContext.setJobDescription(label)
      val t0 = System.nanoTime()
      val n = body
      val dt = (System.nanoTime() - t0) / 1e9
      s.sparkContext.setJobDescription(null)
      (dt, n)
    }
    println(f"""{"probe":"$label","sec":${ts.map(_._1).min}%.3f,"rows":${ts.head._2}}""")
  }

  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val cpus = if (args.length > 1) args(1) else sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val runs = if (args.length > 2) args(2).toInt else 2
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "2000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.register(spark)
    val minCos = 0.35

    val all = VectorOps.index(
      spark.read.parquet(s"$dir/embeddings.parquet"), "vec_id", "embedding")
    val nAll = all.count()
    val pred = col("vec_id") % 7 === 3
    val corpus = all.filter(!pred)
    val batch = all.filter(pred)
    val nCorpus = corpus.count()
    // the global-regime shape for this corpus size (what auto resolves
    // below the cell-route occupancy; pinned explicitly so both arms and
    // any decade run the same plan family)
    val (p, b) = VectorOps.autoShape(nCorpus, minCos)
    println(s"""{"probe":"shape","rows":$nAll,"planes":$p,"bands":$b}""")

    // ---- OLD trio shape: per-consumer uncached band derivations ----
    spark.catalog.clearCache()
    def oldBands(idx: DataFrame) = VectorOps.lshBandRows(idx, p, b, 64)
    timed(spark, "trio_old_q60_cand", runs) {
      val bb = oldBands(all)
      bb.select(col("vec_id").as("id_a"), col("k"), col("v"))
        .join(bb.select(col("vec_id").as("id_b"), col("k"), col("v")),
          Seq("k", "v"))
        .filter(col("id_a") < col("id_b"))
        .select("id_a", "id_b").distinct().count()
    }
    timed(spark, "trio_old_q63_verdicts", runs) {
      val cb = oldBands(corpus)
        .select(col("vec_id").as("partner_id"), col("k"), col("v"))
      val cand = oldBands(batch).join(cb, Seq("k", "v"))
        .select(col("vec_id"), col("partner_id")).distinct()
      VectorOps.bestPartnerOf(corpus, batch, cand, minCos).count()
    }
    timed(spark, "trio_old_q63b_verdicts", runs) {
      val cb = oldBands(corpus)
        .select(col("vec_id").as("partner_id"), col("k"), col("v"))
      val cand = oldBands(batch).join(cb, Seq("k", "v"))
        .select(col("vec_id"), col("partner_id")).distinct()
      VectorOps.bestPartnerOf(corpus, batch, cand, minCos).count()
    }

    // ---- NEW trio shape: one shared cached band artifact ----
    spark.catalog.clearCache()
    timed(spark, "trio_new_q60_cand", runs)(
      VectorOps.lshCandidatePairs(all, p, b, 64).count())
    timed(spark, "trio_new_q63_verdicts", runs)(
      VectorOps.semanticIncrementalById(all, pred, minCos, p, b).count())
    timed(spark, "trio_new_q63b_verdicts", runs)(
      VectorOps.semanticIncrementalById(all, pred, minCos, p, b).count())

    // ---- OLD PQ shape: fresh books + uncached codes per consumer ----
    spark.catalog.clearCache()
    def oldPq(): Long = {
      val books = VectorOps.pqBooksSampled(corpus, 8, 16)
      val enc = VectorOps.pqEncodeIndexed(corpus, books)
        .withColumn("rnorm2", VectorOps.pqRnorm2Col(col("codes"), books))
      VectorOps.knnPqWithIndex(corpus, VectorOps.PqIndex(books, enc),
        batch.limit(5), 5, 50).count()
    }
    timed(spark, "pq_old_q96_scan", runs)(oldPq())
    timed(spark, "pq_old_q81_leg", runs)(oldPq())

    // ---- NEW PQ shape: memoized books + shared cached codes ----
    spark.catalog.clearCache()
    timed(spark, "pq_new_q96_scan", runs)(
      VectorOps.knnPqIndexed(corpus, batch.limit(5), 5, 8, 16, 50).count())
    timed(spark, "pq_new_q81_leg", runs)(
      VectorOps.knnPqIndexed(corpus, batch.limit(5), 5, 8, 16, 50).count())

    spark.stop()
  }
}
