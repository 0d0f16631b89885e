package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Frozen-quantizer DRIFT calibration (r14 verdict item 2): measure how
  * [[graft.queries.VectorIndex]] serving quality degrades as appended
  * mass drawn from a SHIFTED distribution grows — the number that turns
  * `stats.appendedRows / corpusRowsAtBuild`'s rebuild rule-of-thumb from
  * folklore into a measured knee.
  *
  * Design: build the index on the natural sf0.1 embeddings, then append
  * cumulative waves sampled from a PLANTED cluster the build never saw —
  * every sample is `u + σ·r_id` where `u` is one fixed hash-derived
  * direction (a genuinely new content mode, far from every build
  * centroid) and `r_id` is a per-id hash-derived perturbation; σ = 0.33
  * puts typical intra-cluster cosines around the 0.9 near-dup regime, so
  * the cluster carries real boundary structure, not exact copies. After
  * each wave, FRESH samples from the same shifted distribution probe the
  * index and both serving paths are scored against exact brute force
  * over corpus ∪ appended:
  *
  *   - `verdict_recall` — of the probes whose TRUE best cosine ≥ τ,
  *     the fraction [[graft.queries.VectorIndex.incrementalDedup]]
  *     reports as `near_dup` (the ingest-gate miss rate under drift);
  *   - `ann_recall@10` — mean overlap of
  *     [[graft.queries.VectorIndex.knn]]'s top-10 with the brute-force
  *     top-10 (PQ codebooks + IVF cells trained pre-shift score the
  *     shifted mass — the codebook-distortion axis of drift).
  *
  * Output: one JSON line, `{"metric":"drift_calibration","points":[
  * {"appended_frac":f,"verdict_recall":r,"ann_recall":a,...},...]}` —
  * the BENCH_NOTES table's source, cited by `VectorIndex.stats`'
  * scaladoc.
  *
  * Usage: SPARK_GRAFT_CPUS=32 sbt "runMain graft.DriftCalibration [sfDir]"
  */
object DriftCalibration {

  private val Dims = 64
  private val Sigma = 0.33
  private val Tau = 0.9
  private val ProbeN = 60

  /** Deterministic shifted-cluster sample for each id in `ids`:
    * u[j] = hash(j) ∈ [−1,1) fixed across ids; r[id][j] = hash(id,j). */
  private def shiftedVecs(spark: SparkSession, ids: Seq[Long]): DataFrame = {
    import spark.implicits._
    val base = ids.toDF("vec_id")
    val j = sequence(lit(0), lit(Dims - 1))
    def h01(c: org.apache.spark.sql.Column) =
      pmod(xxhash64(c), lit(2000L)).cast("double") / 1000.0 - 1.0
    base.select(col("vec_id"),
      transform(j, jj =>
        (h01(jj + 7777L) + lit(Sigma) * h01(col("vec_id") * 64 + jj))
          .cast("float")).as("embedding"))
  }

  /** Exact best partners of `queries` against `corpus` by true cosine —
    * the ground truth both serving paths are scored against; one
    * broadcast cross join + window per call. Returns
    * (query_id, Seq[(vec_id, cos)] top-k desc). */
  private def bruteTopK(corpus: DataFrame, queries: DataFrame,
      k: Int): Map[Long, Seq[(Long, Double)]] = {
    def dot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      aggregate(zip_with(a, b, (x, y) => x.cast("double") * y),
        lit(0.0d), (acc, v) => acc + v)
    val q = queries.select(col("vec_id").as("query_id"),
      col("embedding").as("qe"))
    val scored = corpus.crossJoin(broadcast(q))
      .select(col("query_id"), col("vec_id"),
        (dot(col("embedding"), col("qe")) /
          (sqrt(dot(col("embedding"), col("embedding"))) *
            sqrt(dot(col("qe"), col("qe"))))).as("cos"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("cos").desc, col("vec_id").asc)
    scored.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
      .collect()
      .groupBy(_.getLong(0))
      .map { case (qid, rs) =>
        qid -> rs.sortBy(_.getInt(3))
          .map(r => (r.getLong(1), r.getDouble(2))).toSeq
      }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "2000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // cell granularity is the experiment's second axis: the default
    // 4096-row cells collapse sf0.1's 2000 vectors into ONE cell (pure
    // LSH+PQ drift — no routing error possible); 128-row cells give ~15
    // live cells so shifted mass actually exercises the frozen coarse
    // quantizer's routing. Run both; the delta isolates the IVF axis.
    val cellRows = sys.env.getOrElse("SPARK_GRAFT_DRIFT_CELLROWS", "128").toInt
    val corpus = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val corpusN = corpus.count()
    val dir = java.nio.file.Files.createTempDirectory("drift_idx").toString
    graft.queries.VectorIndex.build(corpus, "vec_id", "embedding", dir,
      minCos = Tau, prefix = "drift_idx", targetCellRows = cellRows)

    // fresh shifted probes (ids disjoint from every wave)
    val probes = shiftedVecs(spark, (0L until ProbeN).map(_ + 90000000L))
      .cache()
    probes.count()

    // cumulative waves: after wave i the appended fraction is fracs(i)
    val fracs = Seq(0.0, 0.1, 0.25, 0.35, 0.5, 1.0, 2.0)
    var appended = 0L
    var all = corpus
    val points = fracs.map { f =>
      val target = (f * corpusN).toLong
      if (target > appended) {
        val wave = shiftedVecs(spark,
          (appended until target).map(_ + 80000000L))
        graft.queries.VectorIndex.append(wave, "vec_id", "embedding",
          "drift_idx")
        all = all.unionAll(wave)
        appended = target
      }
      val allC = all.cache()
      allC.count()
      val truth = bruteTopK(allC, probes, 10)

      // verdict recall: probes whose true best cos is CLEARLY above the
      // threshold must read dup (the +0.005 margin keeps float-vs-
      // fixed-point rounding at the exact boundary out of the measurement)
      val served = graft.queries.VectorIndex.incrementalDedup(probes,
        "vec_id", "embedding", "drift_idx")
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      val eligible = truth.filter(_._2.headOption.exists(_._2 >= Tau + 0.005))
      val hit = eligible.count { case (qid, _) => served(qid) == "near_dup" }
      val vRecall =
        if (eligible.isEmpty) Double.NaN
        else hit.toDouble / eligible.size

      // ANN recall@10 vs brute
      def annRecall(prefix: String): Double = {
        val ann = graft.queries.VectorIndex.knn(probes, "vec_id", "embedding",
          k = 10, prefix)
          .select(col("query_id"), col("vec_id")).collect()
          .groupBy(_.getLong(0)).map { case (q, rs) =>
            q -> rs.map(_.getLong(1)).toSet
          }
        truth.keys.toSeq.map { q =>
          val want = truth(q).map(_._1).toSet
          if (want.isEmpty) 1.0
          else (want & ann.getOrElse(q, Set.empty)).size.toDouble / want.size
        }.sum / truth.size
      }
      val aRecall = annRecall("drift_idx")

      // the COUNTERFACTUAL the rebuild trigger decides between: a fresh
      // index whose quantizer/codebooks trained on corpus ∪ appended.
      // The knee is where frozen recall falls away from THIS curve —
      // absolute recall conflates drift with the probe set's intrinsic
      // difficulty (dense-cluster fine-ranking is hard for PQ even
      // retrained).
      val rbPrefix = s"drift_rb_${(f * 100).toInt}"
      val rbDir = java.nio.file.Files.createTempDirectory(rbPrefix).toString
      graft.queries.VectorIndex.build(allC, "vec_id", "embedding", rbDir,
        minCos = Tau, prefix = rbPrefix, targetCellRows = cellRows)
      val aRecallRebuilt = annRecall(rbPrefix)

      val st = graft.queries.VectorIndex.stats(spark, "drift_idx")
      allC.unpersist()
      (f, st.appendedRows.toDouble / st.corpusRowsAtBuild, vRecall, aRecall,
        aRecallRebuilt, eligible.size, st.cellSkew, st.maxCellRows)
    }

    val js = points.map { case (f, af, vr, ar, arb, n, skew, maxc) =>
      f"""{"target_frac":$f%.2f,"appended_frac":$af%.3f,""" +
        f""""verdict_recall":$vr%.4f,"ann_recall":$ar%.4f,""" +
        f""""ann_recall_rebuilt":$arb%.4f,""" +
        f""""eligible_probes":$n,"cell_skew":$skew%.2f,"max_cell_rows":$maxc}"""
    }.mkString("[", ",", "]")
    println(s"""{"metric":"drift_calibration","sigma":$Sigma,"tau":$Tau,"cell_rows":$cellRows,"corpus_rows":$corpusN,"points":$js}""")
    spark.stop()
  }
}
