package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** THREE-DECADE serving-index scale series (r14 verdict item 3): the
  * near-scale-invariant partitioned-probe claim rested on a 1× vs 100×
  * A/B (≤200k-row indexes); this main adds the 1000×-class decade —
  * ~5M-doc text index / ~2M-vector index — and times, per decade,
  *
  *   - the one-time `build` wall (context, not the claim under test),
  *   - the constant-batch PROBE wall (min of 3 warm runs — the serving
  *     contract: a ~14-doc / ~6-vector batch against 1×/100×/1000×),
  *   - the `compact` wall (the maintenance op whose cost IS corpus-sized
  *     by design — it should grow ~linearly, unlike the probe).
  *
  * Corpus replication follows ScaleStress's dup-structure-preserving
  * schemes (stopword-preserving token salting for documents, circular
  * shifts for embeddings) but replicates ONLY documents + embeddings
  * (scheme dir `x<reps>e`) — the relational star is irrelevant here and
  * 1000× of it would be pure build cost. Replica generation is a
  * crossJoin with a range (a 1000-way union would bloat the plan).
  *
  * Output: one JSON line `{"metric":"serving_scale_decades","points":
  * [...]}` — the BENCH_NOTES 3-point growth table's source.
  *
  * Usage:
  *   SPARK_GRAFT_CPUS=32 SPARK_GRAFT_DECADES=1,100,1000 \
  *     sbt "runMain graft.ServingScaleProbe [baseSfDir] [workDir]"
  *
  * SPARK_GRAFT_PVALS / SPARK_GRAFT_PCELLS (default 0 = library defaults)
  * override the hash-partition grain of the text/vector indexes — the
  * fixed-grain series showed probe growth RESUMES at the third decade
  * when pvals stays at 64 (the probed fraction of the index is
  * |batch partitions|/pvals, so a fixed pvals means a linearly growing
  * scan residual); a scaled-grain point (512 at 1000×) is the measured
  * validation of the "raise pvals with index size" design rule. Non-zero
  * grains build under grain-suffixed dirs/prefixes, so both operating
  * points coexist in one work dir. */
object ServingScaleProbe {

  private val RepOff = 1000000L
  private val Stopwords = Seq("the", "a", "of", "to", "and", "in")

  /** documents + embeddings replicated `reps`× under `<work>/x<reps>e`
    * (idempotent): same salting/shift schemes as ScaleStress, so the
    * dup-rate and neighborhood structure are replica-invariant. */
  private def buildCorpus(spark: SparkSession, baseDir: String,
      work: String, reps: Int): String = {
    val rd = s"$work/x${reps}e"
    if (Seq("documents", "embeddings")
      .forall(t => new java.io.File(s"$rd/$t.parquet").exists())) return rd
    val ks = spark.range(reps).select(col("id").cast("long").as("k"))

    val d = spark.read.parquet(s"$baseDir/documents.parquet")
      .select("doc_id", "text", "source")
    d.crossJoin(ks).select(
      (col("doc_id") + col("k") * RepOff).as("doc_id"),
      when(col("k") === 0L, col("text")).otherwise(
        array_join(transform(split(col("text"), " "), w =>
          when(w.isin(Stopwords: _*), w)
            .otherwise(concat(w, lit("_"), col("k")))), " ")).as("text"),
      col("source"))
      .repartition(64)
      .write.mode("overwrite").parquet(s"$rd/documents.parquet")

    val e = spark.read.parquet(s"$baseDir/embeddings.parquet")
      .select("vec_id", "embedding")
    val dims = e.select(size(col("embedding"))).head().getInt(0)
    val kk = pmod(col("k"), lit(dims.toLong)).cast("int")
    e.crossJoin(ks).select(
      (col("vec_id") + col("k") * RepOff).as("vec_id"),
      when(kk === 0, col("embedding")).otherwise(
        concat(
          slice(col("embedding"), kk + 1, size(col("embedding")) - kk),
          slice(col("embedding"), lit(1), kk))).as("embedding"))
      .repartition(64)
      .write.mode("overwrite").parquet(s"$rd/embeddings.parquet")
    rd
  }

  private def timed[A](body: => A): (Double, A) = {
    val t0 = System.nanoTime()
    val a = body
    ((System.nanoTime() - t0) / 1e9, a)
  }

  def main(args: Array[String]): Unit = {
    val baseDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val work = args.lift(1).getOrElse("/tmp/graft_scale")
    val decades = sys.env.getOrElse("SPARK_GRAFT_DECADES", "1,100,1000")
      .split(",").map(_.trim.toInt).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "2000")
      // the shared shingle/band derivations of a 5M-doc build outgrow
      // executor memory fractions — spill straight to disk
      .config("spark.graft.dedup.storageLevel", "DISK_ONLY")
      .config("spark.graft.vector.storageLevel", "DISK_ONLY")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // -1 = AutoPvals/AutoPcells (autoGrain of the corpus rows at build —
    // the r19 half-decade point's operating mode; 0 = library defaults)
    val pvals = sys.env.getOrElse("SPARK_GRAFT_PVALS", "0").toInt
    val pcells = sys.env.getOrElse("SPARK_GRAFT_PCELLS", "0").toInt
    // SPARK_GRAFT_REGRAIN=1: compact with AutoPvals/AutoPcells instead of
    // inheriting, then probe the COMPACTED index — the r15 verdict's
    // item 1(c): a wrongly-grained (e.g. legacy pvals=64) decade index
    // must recover the scaled-grain probe wall through the maintenance
    // path alone, no scratch rebuild. The compacted-index probe is
    // emitted in all modes (inherit mode doubles as a same-grain control).
    val regrain = sys.env.get("SPARK_GRAFT_REGRAIN").contains("1")
    // SPARK_GRAFT_PREP=1: time the INDEX-ROUTED CorpusPrep (r15 verdict
    // item 3) — a constant pool (the replica-0 %7 slice the corpus
    // excludes) prepared with textIndexPrefix/indexPrefix pointing at the
    // decade indexes; the wall must track the POOL, not the corpus.
    // SPARK_GRAFT_PREP_FULL=1 additionally times the in-session contrast
    // (pool ∪ corpus prepared with NO indexes — the non-restartable shape
    // whose cost IS corpus-sized); skipped above 100× where the full prep
    // would dominate the series for a number whose growth law is already
    // the point.
    val prepMode = sys.env.get("SPARK_GRAFT_PREP").contains("1")
    val prepFull = sys.env.get("SPARK_GRAFT_PREP_FULL").contains("1")
    // SPARK_GRAFT_PREP_SMALL=1: shrink the prep pool to the serving-batch
    // size (~14 docs) — isolates how much of the indexed-prep wall is the
    // POOL-proportional partition coverage (a 714-doc pool probes most
    // partitions; a 14-doc pool prunes hard) vs fixed pipeline floor
    val prepSmall = sys.env.get("SPARK_GRAFT_PREP_SMALL").contains("1")

    // SPARK_GRAFT_STATS=1: time stats() per decade in BOTH modes (r19
    // verdict item 2) — the full aggregate (min of 2), the first folded
    // call (sidecar backfill, pays the aggregate once), the folded
    // steady state (min of 2), and the folded call after ONE append (the
    // base-scan + broadcast-delta merge path) — with a docs/rows parity
    // assert between the modes at every decade.
    val statsMode = sys.env.get("SPARK_GRAFT_STATS").contains("1")
    // SPARK_GRAFT_HOTCELL=1: plant a hot cell on the vector index (10%
    // of corpus mass perturbed around ONE corpus vector, all landing in
    // the same cell neighborhood), then measure the skewed probe wall —
    // a hot-cell-landing batch vs the balanced batch — and stats skew:
    // the r18 verdict item 4 decision measurement.
    val hotCell = sys.env.get("SPARK_GRAFT_HOTCELL").contains("1")

    val points = decades.map { reps =>
      val rd = buildCorpus(spark, baseDir, work, reps)
      val tg = if (pvals > 0) s"p$pvals" else if (pvals < 0) "pa" else ""
      val vg = if (pcells > 0) s"p$pcells" else if (pcells < 0) "pa" else ""
      val tpfx = s"decade_txt_x$reps$tg"
      val vpfx = s"decade_vec_x$reps$vg"
      val tdir = s"$work/$tpfx"
      val vdir = s"$work/$vpfx"

      val docs = spark.read.parquet(s"$rd/documents.parquet")
        .select("doc_id", "text")
      val embs = spark.read.parquet(s"$rd/embeddings.parquet")
      // replica-0 %7 slice is the (constant) serving batch; the corpus
      // excludes it so probes measure genuine lookups, not self-hits
      def docCorpus = docs.filter(col("doc_id") >= RepOff ||
        col("doc_id") % 7 =!= 3)
      def docBatch = docs.filter(col("doc_id") < RepOff &&
        col("doc_id") % 7 === 3 && col("doc_id") % 100 < 2)
      def vecCorpus = embs.filter(col("vec_id") >= RepOff ||
        col("vec_id") % 7 =!= 3)
      def vecBatch = embs.filter(col("vec_id") < RepOff &&
        col("vec_id") % 7 === 3 && col("vec_id") % 100 < 2)

      val (tBuild, _) = timed {
        if (!new java.io.File(s"$tdir/hashes").exists())
          graft.queries.DedupIndex.build(docCorpus, "doc_id", "text", tdir,
            prefix = tpfx,
            pvals = if (pvals > 0) pvals
              else if (pvals < 0) graft.queries.DedupIndex.AutoPvals
              else graft.queries.DedupIndex.DefaultPvals)
        else if (!spark.catalog.tableExists(s"${tpfx}_hashes"))
          graft.queries.DedupIndex.attach(spark, tdir, tpfx)
      }
      val (vBuild, _) = timed {
        if (!new java.io.File(s"$vdir/meta").exists())
          graft.queries.VectorIndex.build(vecCorpus, "vec_id", "embedding",
            vdir, minCos = 0.9, prefix = vpfx, targetCellRows = 512,
            pcells = if (pcells > 0) pcells
              else if (pcells < 0) graft.queries.VectorIndex.AutoPcells
              else graft.queries.VectorIndex.DefaultPcells)
        else if (!spark.catalog.tableExists(s"${vpfx}_meta"))
          graft.queries.VectorIndex.attach(spark, vdir, vpfx)
      }

      // SPARK_GRAFT_WARM=1: time warm() right after build/attach (page
      // cache warm here — the number records the listing walk + read
      // path at this grain, not cold-bytes wall; ColdWarmProbe owns the
      // drop_caches measurement)
      val warmStr =
        if (!sys.env.get("SPARK_GRAFT_WARM").contains("1")) ""
        else {
          val (tw, _) = timed(graft.queries.DedupIndex.warm(spark, tpfx))
          val (vw, _) = timed(graft.queries.VectorIndex.warm(spark, vpfx))
          f""","text_warm":$tw%.2f,"vec_warm":$vw%.2f"""
        }

      def probeText() = graft.queries.DedupIndex
        .incrementalDedup(docBatch, "doc_id", "text", tpfx).count()
      def probeVec() = graft.queries.VectorIndex
        .incrementalDedup(vecBatch, "vec_id", "embedding", vpfx,
          minCos = 0.9).count()
      probeText(); probeVec() // warm file listings + codegen
      val tProbe = (1 to 3).map(_ => timed(probeText())._1).min
      val vProbe = (1 to 3).map(_ => timed(probeVec())._1).min

      val statsStr = if (!statsMode) "" else {
        import graft.queries.{DedupIndex, VectorIndex}
        def tSt(mode: String): (Double, DedupIndex.IndexStats) = {
          spark.conf.set("spark.graft.stats.mode", mode)
          try timed(DedupIndex.stats(spark, tpfx))
          finally spark.conf.unset("spark.graft.stats.mode")
        }
        def vSt(mode: String): (Double, VectorIndex.IndexStats) = {
          spark.conf.set("spark.graft.stats.mode", mode)
          try timed(VectorIndex.stats(spark, vpfx))
          finally spark.conf.unset("spark.graft.stats.mode")
        }
        val (tFull1, stFull) = tSt("full")
        val tFull = math.min(tFull1, tSt("full")._1)
        val (tFold1, stFold1) = tSt("folded") // sidecar backfill
        val tFold = math.min(tSt("folded")._1, tSt("folded")._1)
        require(stFold1.docs == stFull.docs &&
          stFold1.maxBandBucket == stFull.maxBandBucket,
          s"text fold parity: $stFold1 vs $stFull")
        val (vFull1, vstFull) = vSt("full")
        val vFull = math.min(vFull1, vSt("full")._1)
        val (vFold1, vstFold1) = vSt("folded")
        val vFold = math.min(vSt("folded")._1, vSt("folded")._1)
        require(vstFold1.totalRows == vstFull.totalRows &&
          vstFold1.maxCellRows == vstFull.maxCellRows,
          s"vec fold parity: $vstFold1 vs $vstFull")
        // ONE small append each, then the folded DELTA path (new wave's
        // sidecar backfill + the base-scan/broadcast-delta merge)
        val tb = docs.filter(col("doc_id") < RepOff &&
          col("doc_id") % 7 === 3 && col("doc_id") % 100 >= 2 &&
          col("doc_id") % 100 < 4)
          .select((col("doc_id") + 8000000000L).as("doc_id"), col("text"))
          .localCheckpoint(true)
        DedupIndex.append(tb, "doc_id", "text", tpfx)
        val tFoldD1 = tSt("folded")._1 // backfills the appended wave
        val tFoldD = math.min(tSt("folded")._1, tSt("folded")._1)
        val (tFullD, stFullD) = tSt("full")
        require(tSt("folded")._2.docs == stFullD.docs, "delta parity")
        val vb = embs.filter(col("vec_id") < RepOff &&
          col("vec_id") % 7 === 3 && col("vec_id") % 100 >= 2 &&
          col("vec_id") % 100 < 4)
          .select((col("vec_id") + 8000000000L).as("vec_id"),
            col("embedding")).localCheckpoint(true)
        VectorIndex.append(vb, "vec_id", "embedding", vpfx)
        val vFoldD1 = vSt("folded")._1
        val vFoldD = math.min(vSt("folded")._1, vSt("folded")._1)
        val (vFullD, vstFullD) = vSt("full")
        require(vSt("folded")._2.totalRows == vstFullD.totalRows,
          "vec delta parity")
        f""","text_stats_full":$tFull%.2f,"text_stats_fold_first":$tFold1%.2f,""" +
          f""""text_stats_fold":$tFold%.2f,"text_stats_fold_delta_first":$tFoldD1%.2f,""" +
          f""""text_stats_fold_delta":$tFoldD%.2f,"text_stats_full_delta":$tFullD%.2f,""" +
          f""""vec_stats_full":$vFull%.2f,"vec_stats_fold_first":$vFold1%.2f,""" +
          f""""vec_stats_fold":$vFold%.2f,"vec_stats_fold_delta_first":$vFoldD1%.2f,""" +
          f""""vec_stats_fold_delta":$vFoldD%.2f,"vec_stats_full_delta":$vFullD%.2f"""
      }

      val (tCompact, _) = timed {
        graft.queries.DedupIndex.compact(spark,
          s"$work/${tpfx}_cmp", tpfx, s"${tpfx}c",
          pvals = if (regrain) graft.queries.DedupIndex.AutoPvals else 0)
      }
      val (vCompact, _) = timed {
        graft.queries.VectorIndex.compact(spark,
          s"$work/${vpfx}_cmp", vpfx, s"${vpfx}c",
          pcells = if (regrain) graft.queries.VectorIndex.AutoPcells else 0)
      }

      // probe the COMPACTED index: under regrain this is the re-grained
      // operating point; under inherit it is the same-grain control
      def probeTextC() = graft.queries.DedupIndex
        .incrementalDedup(docBatch, "doc_id", "text", s"${tpfx}c").count()
      def probeVecC() = graft.queries.VectorIndex
        .incrementalDedup(vecBatch, "vec_id", "embedding", s"${vpfx}c",
          minCos = 0.9).count()
      probeTextC(); probeVecC()
      val tProbeC = (1 to 3).map(_ => timed(probeTextC())._1).min
      val vProbeC = (1 to 3).map(_ => timed(probeVecC())._1).min
      val tgvC = graft.queries.DedupIndex.pvalsOf(spark, s"${tpfx}c")
      val vgvC = graft.queries.VectorIndex.meta(spark, s"${vpfx}c").pcells

      val hotStr = if (!hotCell) "" else {
        import graft.queries.VectorIndex
        // PLANT a hot cell: 10% of corpus mass perturbed around ONE
        // corpus vector (σ=0.02/dim, hash-deterministic) — every row
        // routes to that vector's cell neighborhood and sits inside the
        // 0.9-cosine near-dup regime, the worst case for both candidate
        // volume and re-rank width
        val baseV = vecCorpus.orderBy("vec_id").select("embedding")
          .head().getSeq[Float](0)
        val dims = baseV.size
        val corpusVecRows = vecCorpus.count()
        val hotN = math.max(1000L, corpusVecRows / 10)
        def shifted(from: Long, n: Long) = spark.range(n)
          .select((col("id") + from).as("vec_id"),
            array((0 until dims).map { j =>
              (lit(baseV(j).toDouble) +
                (pmod(xxhash64(col("id") + from, lit(j)), lit(2000L))
                  .cast("double") / 1000.0 - 1.0) * 0.02).cast("float")
            }: _*).as("embedding"))
        val stBefore = VectorIndex.stats(spark, vpfx)
        VectorIndex.append(shifted(8100000000L, hotN), "vec_id",
          "embedding", vpfx)
        val stAfter = VectorIndex.stats(spark, vpfx)
        // hot batch: 6 FRESH samples from the same shifted distribution;
        // the balanced batch re-measures on the grown index as control
        val hotBatch = shifted(8200000000L, 6).localCheckpoint(true)
        def probeHot() = VectorIndex.incrementalDedup(hotBatch, "vec_id",
          "embedding", vpfx, minCos = 0.9).count()
        probeHot()
        val tHot = (1 to 3).map(_ => timed(probeHot())._1).min
        val tBal = (1 to 3).map(_ => timed(probeVec())._1).min
        f""","hot_mass":$hotN,"cell_skew_before":${stBefore.cellSkew}%.2f,""" +
          f""""cell_skew_hot":${stAfter.cellSkew}%.2f,""" +
          f""""max_cell_rows_hot":${stAfter.maxCellRows},""" +
          f""""vec_probe_hot":$tHot%.3f,"vec_probe_balanced_hot":$tBal%.3f"""
      }

      val prepStr = if (!prepMode) "" else {
        import graft.queries.CorpusPrep
        // the constant pool: the full replica-0 %7 slice (the corpus
        // excludes it, so index probes are genuine lookups); embeddings
        // keyed by the same id space cover a subset of the pool — docs
        // without one pass through unjudged, the stage's contract
        val poolSlice = (c: org.apache.spark.sql.Column) =>
          if (prepSmall) c < RepOff && c % 7 === 3 && c % 100 < 2
          else c < RepOff && c % 7 === 3
        val pool = spark.read.parquet(s"$rd/documents.parquet")
          .filter(poolSlice(col("doc_id")))
        val poolEmb = embs.filter(poolSlice(col("vec_id")))
          .select(col("vec_id").as("doc_id"), col("embedding"))
        def runPrep(df: DataFrame, cfg: CorpusPrep.Config): Double = timed {
          val p = CorpusPrep.prepare(df, "doc_id", "text", "source",
            cfg = cfg)
          p.survivors.count(); p.packed.count(); p.release()
        }._1
        val idxCfg = CorpusPrep.Config(
          textIndexPrefix = Some(s"${tpfx}c"),
          semantic = Some(CorpusPrep.SemanticStage(poolEmb, minCos = 0.9,
            indexPrefix = Some(s"${vpfx}c"))))
        val poolDocs = pool.count()
        val tPrepIdx = (1 to 2).map(_ => runPrep(pool, idxCfg)).min
        val fullStr =
          if (!prepFull || reps > 100) ""
          else {
            // in-session contrast: prep EVERYTHING (pool ∪ corpus) with
            // no indexes — the corpus-sized cost the indexed route avoids
            val all = spark.read.parquet(s"$rd/documents.parquet")
            val allEmb = embs
              .select(col("vec_id").as("doc_id"), col("embedding"))
            val t = runPrep(all, CorpusPrep.Config(
              semantic = Some(CorpusPrep.SemanticStage(allEmb,
                minCos = 0.9))))
            f""","prep_full_insession":$t%.2f"""
          }
        f""","prep_pool_docs":$poolDocs,"prep_indexed":$tPrepIdx%.2f""" +
          fullStr
      }

      val docRows = docCorpus.count()
      val vecRows = vecCorpus.count()
      spark.catalog.clearCache()
      // report the grain the index actually carries (AutoPvals/AutoPcells
      // builds resolve it from the corpus row count)
      val tgv = graft.queries.DedupIndex.pvalsOf(spark, tpfx)
      val vgv = graft.queries.VectorIndex.meta(spark, vpfx).pcells
      f"""{"reps":$reps,"doc_rows":$docRows,"vec_rows":$vecRows,""" +
        f""""pvals":$tgv,"pcells":$vgv,""" +
        f""""text_build":$tBuild%.2f,"text_probe":$tProbe%.3f,""" +
        f""""text_compact":$tCompact%.2f,"vec_build":$vBuild%.2f,""" +
        f""""vec_probe":$vProbe%.3f,"vec_compact":$vCompact%.2f,""" +
        f""""pvals_c":$tgvC,"pcells_c":$vgvC,""" +
        f""""text_probe_c":$tProbeC%.3f,"vec_probe_c":$vProbeC%.3f""" +
        warmStr + statsStr + hotStr + prepStr + "}"
    }
    println(s"""{"metric":"serving_scale_decades","points":${points.mkString("[", ",", "]")}}""")
    spark.stop()
  }
}
