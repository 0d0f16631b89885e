package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dedup-family scale stress: times q28/q30/q31/q40/q41/q48 on the sf0.1
  * documents (1×) and on a deterministically REPLICATED corpus (~10×,
  * `SPARK_GRAFT_REPS`), printing one JSON line with both series — the
  * empirical check that the banded/bucketed plans grow near-linearly
  * rather than quadratically.
  *
  * Replication preserves the dup structure instead of inflating it:
  * replica k re-ids every document (`doc_id + k·1e6`) and SALTS every
  * token with `_k` (k>0), so shingles never collide across replicas —
  * each replica reproduces the same internal near-dup graph and the
  * corpus-wide dup RATE stays constant as the corpus grows (the realistic
  * scaling). Naive replication (identical text) would instead make every
  * document a 10-way exact dup and grow candidate pairs ×R² by
  * construction — measuring that would stress a different corpus, not the
  * algorithms. Per-document token/shingle counts are unchanged, so 10×
  * rows means 10× shingle volume exactly.
  *
  * q40 completing at 10× also certifies the fixpoint round count stays
  * bounded: component diameters are replica-invariant (each replica's
  * graph is isomorphic to the 1× graph), and `propagateLabels` throws
  * rather than returning unconverged labels.
  *
  * Usage:
  *   SPARK_GRAFT_CPUS=32 sbt "runMain graft.ScaleStress [baseSfDir] [outDir]"
  */
object ScaleStress {

  val Queries: Seq[String] = Seq("q28_jaccard_pairs", "q30_lsh_pairs",
    "q31_simhash_pairs", "q40_dedup_clusters", "q41_jaccard_capped",
    "q48_incremental_dedup",
    // round-10 pair generators: q69 shares q28's join (and its uncapped
    // hot-key exposure under the x<reps>b collision regime — the
    // documented contrast); q73 joins over the winnow-thinned key space;
    // q74's output is bounded by distinct-shingles × |sources|²
    "q69_containment_pairs", "q73_winnow_match", "q74_source_overlap",
    // q75 rides the cached q28 pair frame + two id joins; q76/q77 are
    // aggregate reports whose output is fixed (3 curve points /
    // |sources| rows) while input grows
    "q75_split_leakage", "q76_vocab_coverage", "q77_source_dup_stats",
    // q78's train×eval shingle join is bounded by the (fixed-size) eval
    // side; q79 rides the q30 band-join candidates + the cached
    // signature frame, and its output is ≤11 decile rows regardless of
    // corpus size
    "q78_contamination_attribution", "q79_minhash_calibration",
    // q80 rides q31's chunk-pair join; output bounded at HAMMAX+1 rows
    "q80_simhash_calibration",
    // q83 rides q40's memoized cluster labels (the fixpoint is the q40
    // cost; the reweight itself is one per-cluster window + projection)
    "q83_soft_dedup_weights",
    // q93's eval side is the %97 id slice (~1/97 of the corpus at any
    // scale, so the broadcast side grows ~R× but stays a bounded
    // fraction); the corpus streams map-side through the broadcast
    // probe — cost should track corpus rows, no sh-only shuffle
    "q93_eval_novelty")

  /** ANN family measured against the replicated EMBEDDINGS corpus. The
    * query side of each is pinned to replica-0 ids (vec_id 0 / < 5), so
    * replication grows ONLY the corpus — the serving contract whose cost
    * should be ~linear in corpus size for the bucketed paths. q33 (the
    * blocked exact all-pairs baseline) is deliberately excluded: it is
    * quadratic within blocks by design. */
  val VectorQueries: Seq[String] = Seq("q34_knn_lsh", "q37_knn_ivf",
    "q45_knn_batch",
    // q81 runs brute+LSH+IVF for the pinned query batch and reports
    // recall@5 — output fixed at 10 rows while the corpus grows
    "q81_ann_recall",
    // q82 scans the whole corpus once against broadcast per-cell
    // centroids (cells grow 10x in membership, not count) — the cost
    // should track corpus rows; the rank window partitions by cell
    "q82_prototypicality",
    // q87 is one exploded two-phase aggregate to dims rows — output
    // constant while the corpus grows
    "q87_dimension_stats",
    // q91 joins BOTH replicated tables on the id key after collapsing
    // the vector side to one row per id — cost tracks rows, payloads
    // never shuffle (the size() projection rides the scan)
    "q91_referential_audit")

  /** Round-9 corpus-preparation operators over the replicated documents.
    * Salted replication grows the vocabulary ~R× (each replica's tokens
    * are distinct), which is the realistic regime for q54's df table and
    * q56's bigram model: the MODEL side grows with the corpus, so these
    * time the aggregate + (broadcast|shuffled) model join at 10× on both
    * axes. q53/q55 ride along as the linear-map baselines. q61 stresses
    * the broadcast eval-probe (eval side grows ~R× too under the %97
    * split); q62's keep-list stays top-20 of an R×-grown vocabulary. */
  val PipelineQueries: Seq[String] = Seq("q53_doc_chunks", "q54_tfidf_topk",
    "q55_seq_packing", "q56_bigram_lm", "q57_pii_redact", "q58_span_dedup",
    "q61_contamination_score", "q62_vocab_prune",
    // q84's window partitions WITHIN documents (replica-invariant
    // partition sizes); q85's (source, token) table grows ~R x with the
    // salted vocabulary — the two-phase aggregate + token join at 10x
    // on both axes, like q54; q86 collapses to |sources| rows in one
    // aggregate — the cost IS the corpus scan
    "q84_intradoc_dedup", "q85_source_divergence",
    "q86_temperature_weights",
    // q88's two-level prefix sum: replication grows the BUCKET frame 10×
    // (replica ids spread over k·1e6 offsets) while within-bucket window
    // partitions stay ≤ span rows — cost should track corpus rows; q89's
    // probe side and fitted vocabulary both grow ~R× (salted tokens), so
    // the capped top-25 reference pushes ~all salted mass through the
    // unseen path — the aggregate + anti-ish left-join at 10× volume
    "q88_stream_layout", "q89_token_drift",
    // q90 rides q88's layout + one (block_id)-keyed two-phase aggregate;
    // fan-out is |docs| + tokens/L rows — output grows ~10× with the
    // corpus but each row is 6 integers
    "q90_block_manifest",
    // q92 rides q58's span aggregate for the cut set, then pays two
    // token-mass shuffles (unique-key anti-join + per-doc rebuild) —
    // salted replicas keep the dup rate constant, so cut volume and
    // token volume both grow ~R× and the wall should track corpus rows
    "q92_span_scrub")

  /** Deliberately excluded from the full sweep: q33 is the blocked EXACT
    * all-pairs baseline — quadratic within blocks by design (its scaladoc
    * says so, and [[graft.queries.VectorOps.blockedPairsIndexed]] refuses
    * >100k-row blocks unless unguarded). Everything else in
    * [[SparkEntry.queries]] runs at both sizes. */
  val Excluded: Set[String] = Set("q33_neardup_pairs")

  /** Every registered query not already named in the annotated family
    * lists above — relational/window/set-op (q01–q19, q22/q23/q35/q36/
    * q39/q95), the events family (q20/q21/q38/q46/q47/q64), and the
    * remaining map-shaped or bounded-output text ops. The replicated
    * dir carries 10× twins of ALL tables (see [[buildReplicated]]), so
    * the whole suite times at both sizes: per-user/per-doc window
    * partitions stay replica-invariant (each replica brings its own
    * users/orders/docs), group-by outputs keep constant cardinality
    * while per-group rows grow R× — the realistic scaling regime. */
  def remainingQueries: Seq[String] =
    SparkEntry.queries.keys.toSeq.sorted
      .filterNot((Queries ++ VectorQueries ++ PipelineQueries).toSet)
      .filterNot(Excluded)

  /** Semantic dedup at the SCALE parameterization, not q60's oracle
    * binding: 16-plane/4-bit bands have only 16 values per band, so at
    * 10× the replicated corpus every band bucket holds ~3k vectors and
    * the candidate join output grows quadratically-in-bucket — exactly
    * the regime [[graft.queries.VectorOps.lshCandidatePairs]]'s scaladoc
    * says to leave by raising planes. The stress therefore times the
    * 32-plane/8-bit-band configuration (256 values per band) on BOTH
    * sizes — the like-for-like pair whose growth should be near-linear. */
  /** Shared body of the vec_index_tiny_probe A/B entries: a ~6-vector
    * batch served off a persisted small-cell index built with the given
    * `pcells` (partitioned vs flat layout — the only variable). */
  private def tinyProbe(s: SparkSession, dir: String,
      pcells: Int): DataFrame = {
    import org.apache.spark.sql.functions.col
    val tag = java.lang.Integer.toHexString(dir.hashCode) +
      (if (pcells > 0) "p" else "f")
    val pfx = s"vecidx_t$tag"
    val idxDir = s"/tmp/graft_scale/vecidx_t$tag"
    val e = s.read.parquet(s"$dir/embeddings.parquet")
    val corpus = e.filter(col("vec_id") >= 1000000L || col("vec_id") % 7 =!= 3)
    val batch = e.filter(col("vec_id") < 1000000L && col("vec_id") % 7 === 3
      && col("vec_id") % 100 < 2)
    if (!new java.io.File(s"$idxDir/meta").exists())
      graft.queries.VectorIndex.build(corpus, "vec_id", "embedding",
        idxDir, minCos = 0.9, prefix = pfx, targetCellRows = 512,
        pcells = pcells)
    else if (!s.catalog.tableExists(s"${pfx}_meta"))
      graft.queries.VectorIndex.attach(s, idxDir, pfx)
    graft.queries.VectorIndex.incrementalDedup(batch, "vec_id",
      "embedding", pfx, minCos = 0.9)
  }

  /** Text twin of [[tinyProbe]]: a ~14-doc batch served off a persisted
    * text dedup index built with the given `pvals` (hash-partitioned vs
    * flat layout — the only variable). Small batches are the text serving
    * regime where partition pruning shows: the batch probes ≤14 of 64
    * hash partitions and its candidates a handful of shingle partitions,
    * while the flat layout reads all three corpus-sized tables. */
  private def textTinyProbe(s: SparkSession, dir: String,
      pvals: Int): DataFrame = {
    import org.apache.spark.sql.functions.col
    val tag = java.lang.Integer.toHexString(dir.hashCode) +
      (if (pvals > 0) "p" else "f")
    val pfx = s"dedupidx_t$tag"
    val idxDir = s"/tmp/graft_scale/dedupidx_t$tag"
    val d = s.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text")
    val corpus = d.filter(col("doc_id") >= 1000000L || col("doc_id") % 7 =!= 3)
    val batch = d.filter(col("doc_id") < 1000000L && col("doc_id") % 7 === 3
      && col("doc_id") % 100 < 2)
    if (!new java.io.File(s"$idxDir/hashes").exists())
      graft.queries.DedupIndex.build(corpus, "doc_id", "text", idxDir,
        prefix = pfx, pvals = pvals)
    else if (!s.catalog.tableExists(s"${pfx}_hashes"))
      graft.queries.DedupIndex.attach(s, idxDir, pfx)
    graft.queries.DedupIndex.incrementalDedup(batch, "doc_id", "text", pfx)
  }

  val CustomVector: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
    // text-index serving A/B over the hash-PARTITIONED vs FLAT layouts —
    // the DedupIndex twin of vec_index_tiny_probe: same batch, same
    // verdicts (spec-pinned parity); the wall-clock gap is pure scan
    // pruning on the three corpus-sized tables
    "dedup_index_tiny_probe" -> ((s, dir) =>
      textTinyProbe(s, dir, pvals = graft.queries.DedupIndex.DefaultPvals)),
    "dedup_index_tiny_probe_flat" -> ((s, dir) =>
      textTinyProbe(s, dir, pvals = 0)),
    "q60_semantic_dedup_p32" -> ((s, dir) =>
      graft.queries.VectorOps.semanticDedup(
        s.read.parquet(s"$dir/embeddings.parquet"), "vec_id", "embedding",
        minCos = 0.35, planes = 32, bands = 4)),
    // the LIBRARY-DEFAULT knobs (autoShape): (planes, bands) derive from
    // corpus rows AND the threshold, so the 1× and 10× runs pick
    // different recall-preserving shapes automatically — the acceptance
    // check that default-knob dedup callers neither enter the
    // fixed-16-plane bucket-growth regime NOR silently lose recall
    // (BENCH_NOTES r12: occupancy-only growth measured recall 0.48 →
    // 0.06). 0.9 is the production near-dup threshold where the shape
    // stays selective; at 0.35 autoShape converges toward
    // baseline-width buckets BY DESIGN (the S-curve demands it), so a
    // standing sweep entry there would just re-measure that intent.
    "semantic_dedup_auto09" -> ((s, dir) =>
      graft.queries.VectorOps.semanticDedup(
        s.read.parquet(s"$dir/embeddings.parquet"), "vec_id", "embedding",
        minCos = 0.9)),
    // the cell-sharded SemDeDup path at BOTH sizes (auto09 above routes
    // to it only past the DeepenMinBits boundary, so its ratio mixes
    // regimes): within-cell candidate volume is corpus-size-invariant,
    // so this is the like-for-like pair whose growth should be ~linear
    // in rows plus the (linear) k-means build
    "semantic_dedup_cells09" -> ((s, dir) =>
      graft.queries.VectorOps.semanticDedupCells(
        s.read.parquet(s"$dir/embeddings.parquet"), "vec_id", "embedding",
        minCos = 0.9)),
    // same path with the OPT-IN Lloyd-update sample cap forced below the
    // 100× corpus size: times the build-vs-balance trade the cap's
    // scaladoc records (sampled centroids train iters×O(16k) instead of
    // iters×O(corpus), but their cell balance DOUBLED the dedup wall on
    // this clustered fixture — why sampling is NOT the dedup default).
    // Identical-vector dups co-assign under ANY centroid set (equal
    // scores ⇒ same argmax), so true-dup recall is cap-invariant.
    "semantic_dedup_cells09_s16k" -> ((s, dir) =>
      graft.queries.VectorOps.semanticDedupCells(
        s.read.parquet(s"$dir/embeddings.parquet"), "vec_id", "embedding",
        minCos = 0.9, trainSampleCap = 16384L)),
    // top-2-centroid soft assignment (the boundary-recall mitigation,
    // CellBoundarySpec): candidate volume ≤ 2× the single-probe path —
    // this times the recall/cost trade the probes=2 scaladoc quotes
    "semantic_dedup_cells09_p2" -> ((s, dir) =>
      graft.queries.VectorOps.semanticDedupCells(
        s.read.parquet(s"$dir/embeddings.parquet"), "vec_id", "embedding",
        minCos = 0.9, probes = 2)),
    // margin-GATED top-2 (adaptive multi-probe): only boundary-ambiguous
    // vectors (cos gap to the 2nd centroid ≤ 0.3) get the second cell —
    // the mitigation for the unconditional path's 5.1× (cluster-core
    // vectors, the overwhelming mass here, keep single assignment)
    "semantic_dedup_cells09_p2m03" -> ((s, dir) =>
      graft.queries.VectorOps.semanticDedupCells(
        s.read.parquet(s"$dir/embeddings.parquet"), "vec_id", "embedding",
        minCos = 0.9, probes = 2, probeMargin = 0.3)),
    // the PERSISTED-index serving probe (VectorIndex): run 1 pays the
    // one-time build (written under /tmp/graft_scale, keyed by data dir,
    // reused across sweeps); the min-of-N signal is the warm probe —
    // batch fixed at the replica-0 %7 slice, so growth measures the
    // corpus-side cost of serving OFF DISK: the bucketed candidate join
    // shuffles nothing corpus-sized, but the narrow band/vecs table
    // scans are honestly linear in index size (bucketing prunes
    // exchanges, not scans) — the expected shape is a small linear term,
    // nowhere near the batch-quadratic regimes the index exists to avoid
    "vec_index_probe09" -> ((s, dir) => {
      import org.apache.spark.sql.functions.col
      val tag = java.lang.Integer.toHexString(dir.hashCode)
      val pfx = s"vecidx_$tag"
      val idxDir = s"/tmp/graft_scale/vecidx_$tag"
      val e = s.read.parquet(s"$dir/embeddings.parquet")
      val corpus = e.filter(col("vec_id") >= 1000000L || col("vec_id") % 7 =!= 3)
      val batch = e.filter(col("vec_id") < 1000000L && col("vec_id") % 7 === 3)
      if (!new java.io.File(s"$idxDir/meta").exists())
        graft.queries.VectorIndex.build(corpus, "vec_id", "embedding",
          idxDir, minCos = 0.9, prefix = pfx)
      else if (!s.catalog.tableExists(s"${pfx}_meta"))
        graft.queries.VectorIndex.attach(s, idxDir, pfx)
      graft.queries.VectorIndex.incrementalDedup(batch, "vec_id",
        "embedding", pfx, minCos = 0.9)
    }),
    // TINY-batch probe A/B over the pcell-PARTITIONED vs FLAT layouts:
    // the 286-vector batch above probes ~every cell, so directory
    // pruning can't show there — a ~6-vector batch probes a handful of
    // the ~42 cells at 100×, and the partitioned layout's scan is pruned
    // to those pcell dirs while the flat layout still reads the whole
    // band/vec tables. Small targetCellRows (512) keeps multiple cells
    // even at 1×. Same batch, same verdicts (spec-pinned parity); the
    // wall-clock gap is pure scan pruning.
    "vec_index_tiny_probe" -> ((s, dir) =>
      tinyProbe(s, dir, pcells = graft.queries.VectorIndex.DefaultPcells)),
    "vec_index_tiny_probe_flat" -> ((s, dir) =>
      tinyProbe(s, dir, pcells = 0)),
    // q54 alternative plan shape (r13 verdict item 4): ONE doc_id
    // exchange shared by the tf aggregate and the top-k window, at the
    // price of shuffling RAW exploded tokens (no map-side combine) —
    // timed against q54_tfidf_topk at both sizes; bit-equal output
    // (TextPipelineSpec)
    "q54_one_shuffle" -> ((s, dir) =>
      graft.queries.TextPipeline.tfidfTopKOneShuffle(
        s.read.parquet(s"$dir/documents.parquet"), 5)
        .orderBy("doc_id", "rank")),
    // incremental probe at the same scale parameterization; the batch is
    // the replica-0 %7 slice (fixed at ~1/70th of the 10× corpus), so
    // replication grows ONLY the corpus index — the serving contract
    "q63_semantic_incremental_p32" -> ((s, dir) => {
      import org.apache.spark.sql.functions.col
      val e = s.read.parquet(s"$dir/embeddings.parquet")
      graft.queries.VectorOps.semanticIncremental(
        e.filter(col("vec_id") >= 1000000L || col("vec_id") % 7 =!= 3),
        e.filter(col("vec_id") < 1000000L && col("vec_id") % 7 === 3),
        "vec_id", "embedding", minCos = 0.35, planes = 32, bands = 4)
    }),
    // the cell-sharded incremental probe (the serving path auto-knob
    // callers route to past DeepenMinBits): the same fixed replica-0 %7
    // batch probes the corpus's (cell, band, value) buckets — per-batch-
    // vector probe volume is pinned to ~targetCellRows, so wall should
    // track the batch plus the (memoized) cell build, not the corpus
    "semantic_incr_cells09" -> ((s, dir) => {
      import org.apache.spark.sql.functions.col
      val e = s.read.parquet(s"$dir/embeddings.parquet")
      graft.queries.VectorOps.semanticIncrementalCells(
        e.filter(col("vec_id") >= 1000000L || col("vec_id") % 7 =!= 3),
        e.filter(col("vec_id") < 1000000L && col("vec_id") % 7 === 3),
        "vec_id", "embedding", minCos = 0.9)
    }),
    // serving-scale IVF build: k=1024 exceeds kmeansLiteralMaxK, so this
    // exercises the BROADCAST-table assignment path (k×dims plan literals
    // would blow janino method limits at this k) — cost should scale with
    // corpus rows, not explode with k
    // BPE trainer: corpus-scale cost is ONE word-histogram groupBy; the
    // 20-merge loop then runs on the bounded histogram (~31·R salted
    // words here; Heaps-law-bounded in real corpora), so 10× wall should
    // track the histogram pass while the per-merge argmax jobs stay
    // constant-time
    "bpe_train20" -> ((s, dir) => {
      val m = graft.queries.Bpe.train(
        s.read.parquet(s"$dir/documents.parquet"), numMerges = 20)
      m.vocab
    }),
    // corpus-side tokenization under a trained model: one broadcast vocab
    // join + one groupBy reassembly — wall should track corpus rows (the
    // train prefix is the bpe_train20 cost, measured separately above)
    "bpe_encode20" -> ((s, dir) => {
      val d = s.read.parquet(s"$dir/documents.parquet")
      val m = graft.queries.Bpe.train(d, numMerges = 20)
      graft.queries.Bpe.encode(d, m)
    }),
    "kmeans_build_k1024" -> ((s, dir) => {
      val idx = graft.queries.VectorOps.index(
        s.read.parquet(s"$dir/embeddings.parquet"), "vec_id", "embedding")
      graft.queries.VectorOps.kmeansCells(idx, k = 1024, iters = 1)
    }),
    // the broadcast-path build with sampled Lloyd updates (floor is
    // 16·k = 16384 rows here): the k-way fan-out aggregate — the build's
    // dominant cost — runs over the sample; only the final assignment
    // fans out over the whole corpus
    "kmeans_build_k1024_s16k" -> ((s, dir) => {
      val idx = graft.queries.VectorOps.index(
        s.read.parquet(s"$dir/embeddings.parquet"), "vec_id", "embedding")
      graft.queries.VectorOps.kmeansCells(idx, k = 1024, iters = 1,
        trainSampleCap = 16384L)
    }),
    // full residual IVF-PQ serving probe (label cells): per-query cost
    // is (touched vectors)·m LUT lookups + the rerank-bounded exact
    // pool — wall should track the probed cells' row count, never pay
    // dims-wide dots over the whole corpus
    "knn_ivfpq_batch" -> ((s, dir) => {
      import org.apache.spark.sql.functions.col
      val e = s.read.parquet(s"$dir/embeddings.parquet")
      graft.queries.VectorOps.knnIvfPq(
        e.filter(col("vec_id") >= 5), e.filter(col("vec_id") < 5),
        "vec_id", "embedding", cell = "label", k = 10, nprobe = 2)
    }),
    // the df-capped cluster derivation — the production counterpart of
    // q40's uncapped oracle binding: under the stopword-collision corpus
    // the uncapped join pays O(hot²) buckets; this times the q41-guarded
    // path end-to-end (pairs -> components -> member counts)
    "dedup_clusters_capped" -> ((s, dir) =>
      graft.queries.TextOps.dedupClusters(
        s.read.parquet(s"$dir/documents.parquet"), "doc_id", "text",
        dfCap = Some(100L))),
    // the COMPOSED end-to-end pipeline (left-semi survivor chains +
    // shared dedup caches + driver-side near-dup fixpoint): the stages
    // are individually stressed above; this times their composition.
    // The eval set is the %97 slice (grows with the corpus, like q61)
    "corpus_prep_e2e" -> ((s, dir) => {
      val d = s.read.parquet(s"$dir/documents.parquet")
      // nearDupDfCap: the replicated corpus shares stopword-only shingles
      // ACROSS replicas (see buildReplicated), so the uncapped candidate
      // join would go quadratic on those boilerplate keys — the cap is
      // the deployment setting this fixture exists to exercise
      val prep = graft.queries.CorpusPrep.prepare(
        d.filter(col("doc_id") % 97 =!= 0), "doc_id", "text", "source",
        bench = Some(d.filter(col("doc_id") % 97 === 0)
          .select(col("doc_id"), col("text"))),
        cfg = graft.queries.CorpusPrep.Config(
          vocabKeepK = Some(graft.queries.TextPipeline.VocabKeepK),
          nearDupDfCap = Some(100L)))
      prep.packed
    }))

  /** The replicated corpus lives under a reps+scheme-encoded directory
    * (`<outDir>/x<reps>c`), so a rerun with a different `SPARK_GRAFT_REPS`
    * — or against a corpus built by an older salting scheme — never
    * silently reuses a stale corpus. (`c` = all-tables replication for
    * the full-suite sweep; `b` was the documents/embeddings-only
    * stopword-preserving salting; the original everything-salted scheme
    * was `x<reps>`.) */
  // `d` scheme suffix: events replicas are TIME-SHIFTED (see
  // buildReplicated) — bump invalidates stale cached builds
  def replicatedDir(outDir: String, reps: Int): String = s"$outDir/x${reps}d"

  /** Key offset between replicas: every base key (l_orderkey 600k,
    * event_id 100k, doc_id, vec_id, ...) is < 1e6 at sf0.1, so replica
    * k's ids live in [k·1e6, (k+1)·1e6) with no cross-replica collision
    * and all FK joins resolve within a replica. */
  private val RepOff = 1000000L

  /** Build the salted replicated corpus under [[replicatedDir]]
    * (idempotent per reps value). Replicates EVERY table: documents get
    * token salting (dup structure preserved — see below), embeddings get
    * circular shifts (neighborhoods preserved), the relational star
    * re-keys all FK columns by the replica offset (each replica is a
    * self-contained copy of the star: join fan-outs and per-key group
    * sizes are replica-invariant, total volume grows R×), events re-key
    * event_id/user_id (per-user session shapes replica-invariant).
    * region/nation stay 1× — they are broadcast dims whose realistic
    * cardinality is fixed. */
  def buildReplicated(spark: SparkSession, baseDir: String, outDir: String,
      reps: Int): Unit = {
    val rd = replicatedDir(outDir, reps)
    if (Seq("documents", "embeddings", "lineitem", "events")
      .forall(t => new java.io.File(s"$rd/$t.parquet").exists())) return
    val d = spark.read.parquet(s"$baseDir/documents.parquet")
    // STOPWORDS stay unsalted: the q50 quality gate requires >=2 distinct
    // stopwords, so salting them would fail every salted replica at the
    // quality stage and the e2e pipeline would only ever process 1×
    // volume downstream (measured: replicas 1-9 contributed ZERO
    // survivors under the original everything-salted scheme). Leaving
    // them intact preserves the per-replica quality statistics
    // (word-length shifts +2 chars, inside the [3,10] rule) at the cost
    // of stopword-only 3-grams colliding ACROSS replicas — the
    // boilerplate-hot-shingle regime real corpora exhibit, which is
    // exactly what the df-cap guard (q41 / CorpusPrep.nearDupDfCap)
    // exists for.
    val Stopwords = Seq("the", "a", "of", "to", "and", "in")
    val replicas = (0 until reps).map { k =>
      val text =
        if (k == 0) col("text")
        else array_join(
          transform(split(col("text"), " "), w =>
            when(w.isin(Stopwords: _*), w)
              .otherwise(concat(w, lit(s"_$k")))), " ")
      d.select((col("doc_id") + lit(k * 1000000L)).as("doc_id"),
        text.as("text"), col("lang"), col("source"), col("n_chars"))
    }
    replicas.reduce(_.unionAll(_))
      .repartition(32)
      .write.mode("overwrite")
      .parquet(s"${replicatedDir(outDir, reps)}/documents.parquet")

    // embeddings: replica k circular-shifts every vector by k positions —
    // inner products WITHIN a replica are exactly preserved (both operands
    // shift together), so each replica reproduces the 1× neighborhood
    // structure, while cross-replica cosines decorrelate; labels (the IVF
    // cells) are preserved, so cells grow 10× in membership, not in count.
    // The shift is k MOD dims: beyond reps > dims a raw k would drive
    // slice length negative (runtime error — hit at the first 100×/64-dim
    // build); replicas at k ≡ 0 (mod dims) shift by 0 and stay correlated
    // with replica 0, which only makes the stress HARDER (denser ANN
    // buckets), never easier.
    val e = spark.read.parquet(s"$baseDir/embeddings.parquet")
    val eDims = e.select(size(col("embedding"))).head().getInt(0)
    val eReplicas = (0 until reps).map { rk =>
      val k = rk % eDims
      val emb =
        if (k == 0) col("embedding")
        else concat(
          slice(col("embedding"), lit(k + 1), size(col("embedding")) - k),
          slice(col("embedding"), lit(1), lit(k)))
      e.select((col("vec_id") + lit(rk * 1000000L)).as("vec_id"),
        emb.as("embedding"), col("label"))
    }
    eReplicas.reduce(_.unionAll(_))
      .repartition(32)
      .write.mode("overwrite")
      .parquet(s"${replicatedDir(outDir, reps)}/embeddings.parquet")

    // Relational star + events: replica k shifts every key column by
    // k·RepOff; non-key columns ride unchanged, so value distributions
    // (dates, prices, flags) — and therefore group-by cardinalities and
    // filter selectivities — are exactly preserved while row volume
    // grows R×.
    def replicateKeyed(table: String, keyCols: Seq[String],
        tsShift: Seq[String] = Seq.empty): Unit = {
      val t = spark.read.parquet(s"$baseDir/$table.parquet")
      val reps10 = (0 until reps).map { k =>
        t.select(t.columns.toSeq.map { c =>
          if (keyCols.contains(c)) (col(c) + lit(k * RepOff)).as(c)
          else if (tsShift.contains(c))
            (col(c) + expr(s"INTERVAL ${k * 32} DAYS")).as(c)
          else col(c)
        }: _*)
      }
      reps10.reduce(_.unionAll(_))
        .repartition(32)
        .write.mode("overwrite").parquet(s"$rd/$table.parquet")
    }
    replicateKeyed("customer", Seq("c_custkey"))
    replicateKeyed("supplier", Seq("s_suppkey"))
    replicateKeyed("part", Seq("p_partkey"))
    replicateKeyed("orders", Seq("o_orderkey", "o_custkey"))
    replicateKeyed("lineitem", Seq("l_orderkey", "l_partkey", "l_suppkey"))
    // events: replica k shifts ts by k·32 days (the 30-day base span +
    // margin, so replica windows never overlap). A 10× event stream in
    // the SAME window would be 10× traffic DENSITY — which genuinely
    // multiplies time-window join volume (q97's per-anchor matches) and
    // per-hour group sizes quadratically/linearly in density; the
    // realistic "corpus grew 10×" regime for an event log is a 10×
    // LONGER history at the same density, which keeps per-window
    // concurrency, per-user session shapes, and hourly group sizes
    // replica-invariant while hour-spine/group-output cardinality grows
    // R× — matching the star-schema doctrine above.
    replicateKeyed("events", Seq("event_id", "user_id"), tsShift = Seq("ts"))
    Seq("region", "nation").foreach { t =>
      spark.read.parquet(s"$baseDir/$t.parquet")
        .write.mode("overwrite").parquet(s"$rd/$t.parquet")
    }
  }

  def main(args: Array[String]): Unit = {
    val baseDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val outDir = args.lift(1).getOrElse("/tmp/graft_scale")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "10").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "2000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    buildReplicated(spark, baseDir, outDir, reps)

    // codegen warm-up at the smallest SF (plan shapes identical across
    // dirs), so timed runs measure data processing, not janino
    val all = (Queries ++ VectorQueries ++ PipelineQueries ++ remainingQueries)
      .map(q => q -> SparkEntry.queries(q)) ++ CustomVector
    // SPARK_GRAFT_STRESS_QUERIES=q28_jaccard_pairs,corpus_prep_e2e runs a
    // subset (re-measuring one family without paying the full suite);
    // unset runs everything
    val named = sys.env.get("SPARK_GRAFT_STRESS_QUERIES") match {
      case Some(sel) =>
        val want = sel.split(",").map(_.trim).filter(_.nonEmpty).toSet
        val unknown = want -- all.map(_._1).toSet
        if (unknown.nonEmpty)
          System.err.println(s"unknown stress queries ignored: ${unknown.mkString(",")}")
        all.filter { case (q, _) => want(q) }
      case None => all
    }

    val warmDir = "/root/testdata/sf0.001"
    if (java.nio.file.Files.isDirectory(java.nio.file.Paths.get(warmDir)))
      named.foreach { case (_, fn) =>
        try fn(spark, warmDir).count()
        catch { case _: Throwable => () }
      }
    spark.catalog.clearCache()

    // SPARK_GRAFT_STRESS_RUNS=N takes the per-query MIN of N runs per
    // dir (the Bench discipline): single-shot ratios conflate one-time
    // janino compilation with data cost — e.g. AutoPlanes resolves a NEW
    // plane count at 10×, so its signature codegen is cold exactly when
    // the fixed-knob entries next to it are warm. Default 1 (the
    // historical single-shot sweep).
    val runs = sys.env.getOrElse("SPARK_GRAFT_STRESS_RUNS", "1").toInt
    def timeSuite(dir: String,
        qs: Seq[(String, (SparkSession, String) => DataFrame)]): Seq[(String, Double, Long)] = {
      val r = qs.map { case (q, fn) =>
        val timed = (1 to runs).map { _ =>
          val t0 = System.nanoTime()
          val n = try fn(spark, dir).count()
            catch { case e: Throwable => System.err.println(s"$q: $e"); -1L }
          ((System.nanoTime() - t0) / 1e9, n)
        }
        val best = timed.minBy(_._1)
        (q, best._1, best._2)
      }
      spark.catalog.clearCache() // dirs must not share cache memory
      r
    }

    val repDir = replicatedDir(outDir, reps)
    val base = timeSuite(baseDir, named)
    val big = timeSuite(repDir, named)
    def js(rs: Seq[(String, Double, Long)]) = rs
      .map { case (q, t, n) => s"""\"$q\":{\"sec\":$t,\"rows\":$n}""" }
      .mkString("{", ",", "}")
    println(s"""{"metric":"scale_stress","reps":$reps,"base":${js(base)},"replicated":${js(big)}}""")
    spark.stop()
  }
}
