package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Product-quantization ANN audit ([[VectorOps.knnPq]], q96): the
  * structural exactness guarantee (rerank ≥ corpus ⇒ identical to the
  * brute batch scan, for ANY codebooks — re-ranking is exact, so the
  * approximation can only choose the pool, never the scores), measured
  * recall floors for the default shape, and the determinism/purity
  * contracts (sampled+refined codebooks reproduce bit-exactly; encoding
  * is a pure projection). Floors follow AnnRecallSpec's convention: set
  * just below values measured on the deterministic near-uniform test
  * embeddings — the adversarial case for ANN — so a candidate-generation
  * regression trips box-independently. */
class PqAnnSpec extends SparkSpec {

  private val K = 10
  private val NQueries = 20

  private lazy val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
  private lazy val corpus = emb.filter(col("vec_id") >= NQueries)
  private lazy val queries = emb.filter(col("vec_id") < NQueries)
  private lazy val corpusIdx = VectorOps.index(corpus, "vec_id", "embedding")
  private lazy val queryIdx = VectorOps.index(queries, "vec_id", "embedding")
  private lazy val corpusN = corpusIdx.count().toInt

  private def topSets(df: DataFrame): Map[Long, Set[Long]] =
    df.select("query_id", "vec_id").collect()
      .groupBy(_.getLong(0)).map { case (q, rs) =>
        q -> rs.map(_.getLong(1)).toSet
      }

  private lazy val exactRows: Array[String] =
    VectorOps.knnBatchIndexed(corpusIdx, queryIdx, K)
      .collect().map(_.toString)
  private lazy val exact: Map[Long, Set[Long]] = topSets(
    VectorOps.knnBatchIndexed(corpusIdx, queryIdx, K))

  private def recallOf(approx: Map[Long, Set[Long]]): Double = {
    assert(exact.size == NQueries)
    val per = exact.map { case (q, ids) =>
      approx.getOrElse(q, Set.empty).intersect(ids).size.toDouble / K
    }
    per.sum / per.size
  }

  private def pq(rerank: Int, iters: Int = 0, m: Int = 8,
      ksub: Int = 16): DataFrame =
    VectorOps.knnPqIndexed(corpusIdx, queryIdx, K, m = m, ksub = ksub,
      rerank = rerank, iters = iters)

  test("repeat PQ probes share the memoized books and the cached codes frame (r20)") {
    // two probes over the same (corpus, m, ksub, iters): the codebooks
    // come from the driver memo (no second sampling job is observable
    // from here, but the OUTPUT must be bit-identical), and both plans
    // must read ONE cached codes relation (vec_id, codes, rnorm2) — the
    // artifact q96's ADC scan and q81's PQ audit leg now share
    val a = pq(rerank = 50)
    val b = pq(rerank = 50)
    def codeIms(df: DataFrame) = df.queryExecution.optimizedPlan.collect {
      case im: org.apache.spark.sql.execution.columnar.InMemoryRelation
          if im.cacheBuilder.cachedPlan.schema.fieldNames.toSeq ==
            Seq("vec_id", "codes", "rnorm2") =>
        im.cacheBuilder
    }
    val (ia, ib) = (codeIms(a), codeIms(b))
    assert(ia.nonEmpty && ib.nonEmpty,
      s"codes frame not cached (a=${ia.size}, b=${ib.size} relations)")
    assert((ia ++ ib).distinct.size == 1,
      "the two probes built separate codes caches")
    assert(a.collect().map(_.toString) sameElements
      b.collect().map(_.toString))
  }

  test("rerank >= corpus size makes PQ EXACT — equal to the brute batch scan") {
    // the two-stage contract: ADC only selects the pool; scores come
    // from the exact integer cosine, so a full pool is brute force
    val full = pq(rerank = corpusN).collect().map(_.toString)
    assert(full.sameElements(exactRows))
  }

  test("refined codebooks keep the exactness guarantee (re-rank is book-independent)") {
    val full = pq(rerank = corpusN, iters = 2).collect().map(_.toString)
    assert(full.sameElements(exactRows))
  }

  test("measured recall floors: default shape, and monotone in the rerank pool") {
    val r50 = recallOf(topSets(pq(rerank = 50)))
    val r25 = recallOf(topSets(pq(rerank = 25)))
    val r150 = recallOf(topSets(pq(rerank = 150)))
    info(f"PQ recall@$K m=8 ksub=16: rerank25=$r25%.3f rerank50=$r50%.3f rerank150=$r150%.3f")
    assert(r150 >= r50 && r50 >= r25,
      s"recall not monotone in rerank: $r25 / $r50 / $r150")
    // measured on the fixtures (deterministic): 0.340 / 0.470 / 0.810
    assert(r50 >= 0.40, s"default-shape recall regressed: $r50")
  }

  test("k-means refinement of the codebooks improves (or holds) measured recall") {
    val r0 = recallOf(topSets(pq(rerank = 50)))
    val r2 = recallOf(topSets(pq(rerank = 50, iters = 2)))
    info(f"PQ recall@$K rerank=50: sampled=$r0%.3f refined(iters=2)=$r2%.3f")
    // measured on the fixtures (deterministic): 0.470 -> 0.595
    assert(r2 >= r0, s"refined books regressed recall: $r0 -> $r2")
  }

  // ---- residual IVF-PQ (the full FAISS-style composition) ----

  private lazy val labeledIdx =
    VectorOps.index(corpus, "vec_id", "embedding", Seq("label"))

  test("IVF-PQ with a full pool equals plain IVF at the same nprobe (residual ADC only picks the pool)") {
    for (nprobe <- Seq(1, 2)) {
      val ivf = VectorOps.knnIvfIndexed(labeledIdx, queryIdx, "label", K,
        nprobe).drop("label").collect().map(_.toString)
      val ivfpq = VectorOps.knnIvfPqIndexed(labeledIdx, queryIdx, "label",
        K, nprobe, rerank = corpusN).collect().map(_.toString)
      assert(ivfpq.sameElements(ivf), s"diverged at nprobe=$nprobe")
    }
  }

  test("IVF-PQ with every cell probed and a full pool equals the brute batch scan") {
    val full = VectorOps.knnIvfPqIndexed(labeledIdx, queryIdx, "label", K,
      nprobe = 1000, rerank = corpusN).collect().map(_.toString)
    assert(full.sameElements(exactRows))
  }

  test("measured IVF-PQ recall: residual books, default shape") {
    def r(nprobe: Int, rerank: Int, iters: Int = 0): Double =
      recallOf(topSets(VectorOps.knnIvfPqIndexed(labeledIdx, queryIdx,
        "label", K, nprobe, rerank = rerank, iters = iters)))
    val r2 = r(2, 50)
    val r4 = r(4, 50)
    info(f"IVF-PQ recall@$K rerank=50: nprobe2=$r2%.3f nprobe4=$r4%.3f")
    assert(r4 >= r2, s"recall not monotone in nprobe: $r2 / $r4")
    // measured (deterministic): 0.265 / 0.375 — bounded above by plain
    // IVF's own probe recall at the same nprobe (0.53 / 0.765, see
    // AnnRecallSpec): the composition inherits the coarse quantizer's
    // misses and adds ADC pool selectivity on top. The near-uniform
    // fixtures are the adversarial case; floors sit just below.
    assert(r2 >= 0.25, s"IVF-PQ default-shape recall regressed: $r2")
  }

  test("the cached serving index (pqIndexOf + knnPqWithIndex) probes bit-identically") {
    val srv = VectorOps.pqIndexOf(corpusIdx)
    try {
      val served = VectorOps.knnPqWithIndex(corpusIdx, srv, queryIdx, K,
        rerank = 50).collect().map(_.toString)
      val oneShot = pq(rerank = 50).collect().map(_.toString)
      assert(served.sameElements(oneShot))
    } finally srv.enc.unpersist(false)
  }

  test("knnIvfPqAuto one-call build: all cells probed + full pool equals brute") {
    // exactness holds for ANY trained coarse quantizer — k-means only
    // partitions the corpus; with every cell probed and a full pool the
    // composition must collapse to the exact scan
    val a = VectorOps.knnIvfPqAuto(corpus, queries, "vec_id", "embedding",
      K, nCells = 8, nprobe = 8, rerank = corpusN)
    assert(a.collect().map(_.toString).sameElements(exactRows))
  }

  test("codebook training is deterministic and encoding is a pure projection") {
    val b1 = VectorOps.pqBooksSampled(corpusIdx, 8, 16)
    val b2 = VectorOps.pqBooksSampled(corpusIdx, 8, 16)
    assert(b1.flatten.map(_.toSeq) == b2.flatten.map(_.toSeq))
    val r1 = VectorOps.pqRefineBooks(corpusIdx, b1, 2)
    val r2 = VectorOps.pqRefineBooks(corpusIdx, b2, 2)
    assert(r1.flatten.map(_.toSeq) == r2.flatten.map(_.toSeq))
    assert(r1.flatten.map(_.toSeq) != b1.flatten.map(_.toSeq),
      "refinement was a no-op on the fixtures")
    // encode: codewords ride as literals — no exchange, no join
    val plan = VectorOps.pqEncodeIndexed(corpusIdx, b1)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") && !plan.contains("Join"),
      s"PQ encode is not a pure projection:\n${plan.take(1500)}")
  }
}
