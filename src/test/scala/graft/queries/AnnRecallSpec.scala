package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Measured recall@k for the approximate KNN paths against the exact
  * batch scan — "measure, don't guess" for the quality half of the
  * speed/quality trade the LSH/IVF operators make. The floors are set
  * from observed values on the deterministic test embeddings (no RNG
  * anywhere: hyperplanes are md5-derived, k-means is seeded by stable
  * ids), so a refactor that silently degrades candidate generation
  * fails here even while the score-agreement specs still pass. */
class AnnRecallSpec extends SparkSpec {

  private val K = 10
  private val NQueries = 20

  private lazy val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
  private lazy val queries = emb.filter(col("vec_id") < NQueries)

  /** query_id -> top-K vec_ids. */
  private def topSets(df: DataFrame): Map[Long, Set[Long]] =
    df.select("query_id", "vec_id").collect()
      .groupBy(_.getLong(0)).map { case (q, rs) =>
        q -> rs.map(_.getLong(1)).toSet
      }

  private lazy val exact: Map[Long, Set[Long]] = topSets(
    VectorOps.knnBatch(emb, queries, "vec_id", "embedding", K))

  private def recallOf(approx: Map[Long, Set[Long]]): Double = {
    assert(exact.size == NQueries)
    val per = exact.map { case (q, ids) =>
      approx.getOrElse(q, Set.empty).intersect(ids).size.toDouble / K
    }
    per.sum / per.size
  }

  // The test embeddings are near-uniform synthetic vectors — the
  // ADVERSARIAL case for ANN (no cluster structure to exploit), so the
  // absolute numbers are a floor on real-corpus behavior, not a ceiling.
  // Measured on the deterministic fixtures: LSH 0.495 (16p/4b), 0.980
  // (16p/8b); IVF 0.415/0.530/0.765 at nprobe 1/2/4. Floors sit just
  // below so a candidate-generation regression trips, box-independent.

  test("the vector index parquet round-trips and serves bit-identically") {
    // the scaladoc claim: at scale, index() is the table you persist and
    // scan per query batch — so a reloaded index must serve exactly
    val idx = VectorOps.index(emb, "vec_id", "embedding")
    val tmp = java.nio.file.Files.createTempDirectory("graft-vidx").toString
    idx.write.mode("overwrite").parquet(tmp)
    val reloaded = spark.read.parquet(tmp)
    val qIdx = VectorOps.index(queries, "vec_id", "embedding")
    val live = VectorOps.knnBatchIndexed(idx, qIdx, K).collect().map(_.toString)
    val served = VectorOps.knnBatchIndexed(reloaded, qIdx, K).collect().map(_.toString)
    assert(served.sameElements(live))
    // and the k-means cell assignment is stable across the round-trip
    val liveCells = VectorOps.kmeansCells(idx, 8).collect().map(_.toString).sorted
    val servedCells = VectorOps.kmeansCells(reloaded, 8).collect().map(_.toString).sorted
    assert(servedCells.sameElements(liveCells))
  }

  test("hyperplane-LSH recall@10 over the query batch") {
    val r = recallOf(topSets(
      VectorOps.knnLsh(emb, queries, "vec_id", "embedding", K)))
    info(f"LSH recall@10 = $r%.3f (16 planes / 4 bands)")
    assert(r >= 0.40, f"LSH recall collapsed: $r%.3f")
  }

  test("LSH recall rises with band count (the serving knob behaves)") {
    val r4 = recallOf(topSets(
      VectorOps.knnLsh(emb, queries, "vec_id", "embedding", K,
        planes = 16, bands = 4)))
    val r8 = recallOf(topSets(
      VectorOps.knnLsh(emb, queries, "vec_id", "embedding", K,
        planes = 16, bands = 8)))
    info(f"LSH recall@10: 4 bands $r4%.3f -> 8 bands $r8%.3f")
    assert(r8 >= r4, "shorter bands (more candidates) must never lose recall")
    assert(r8 >= 0.85, f"8-band recall too low: $r8%.3f")
  }

  test("IVF (k-means auto) recall@10 over the query batch") {
    val r = recallOf(topSets(
      VectorOps.knnIvfAuto(emb, queries, "vec_id", "embedding", K,
        nCells = 8, nprobe = 2)))
    info(f"IVF recall@10 = $r%.3f (8 cells, nprobe 2)")
    assert(r >= 0.40, f"IVF recall collapsed: $r%.3f")
  }

  test("IVF recall rises with nprobe (the serving knob behaves)") {
    val r1 = recallOf(topSets(
      VectorOps.knnIvfAuto(emb, queries, "vec_id", "embedding", K,
        nCells = 8, nprobe = 1)))
    val r4 = recallOf(topSets(
      VectorOps.knnIvfAuto(emb, queries, "vec_id", "embedding", K,
        nCells = 8, nprobe = 4)))
    info(f"IVF recall@10: nprobe=1 $r1%.3f -> nprobe=4 $r4%.3f")
    assert(r4 >= r1, "more probes must never lose recall")
    assert(r4 >= 0.65, f"nprobe=4 recall too low: $r4%.3f")
  }
}
