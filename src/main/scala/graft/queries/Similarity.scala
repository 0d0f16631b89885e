package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table (vec_id, embedding:
  * array<float>, label). Three operators: brute-force cosine top-k (the
  * correctness baseline), all-pairs near-dup ranking, and a random-
  * hyperplane-LSH bucketed variant (the 100 TB path: candidates come from
  * an equi-join on signature bands, then only candidates pay the exact
  * cosine).
  *
  * Determinism contract: dot products and norms are fixed-point — each
  * float product is widened to double (exact), scaled by 1e6, rounded to a
  * BIGINT, and summed exactly; the final cosine is a fixed sequence of IEEE
  * double ops from those exact integers, so round(cos, 6) is bit-identical
  * in Spark and DuckDB regardless of partitioning/summation order.
  */
object Similarity {

  private def emb(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "embeddings")

  /** Σ round(a_i * b_i * 1e6) as exact BIGINT (see scaladoc). */
  private def fpDot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) =>
        round(x.cast("double") * y.cast("double") * 1e6).cast("long")),
      lit(0L), (acc, v) => acc + v)

  /** cos = dot / (sqrt(na)*sqrt(nb)) from the fixed-point integers — the
    * 1e6 scales cancel. */
  private def fpCos(dot: Column, na: Column, nb: Column): Column =
    dot.cast("double") / (sqrt(na.cast("double")) * sqrt(nb.cast("double")))

  /** Oracle twins (DuckDB list comprehension; elements widened the same way). */
  private def oFpDot(a: String, b: String): String =
    s"list_sum([CAST(round(CAST($a[i] AS DOUBLE)*CAST($b[i] AS DOUBLE)*1000000.0) AS BIGINT) for i in range(1, len($a)+1)])"
  private def oFpCos(dot: String, na: String, nb: String): String =
    s"CAST($dot AS DOUBLE)/(sqrt(CAST($na AS DOUBLE))*sqrt(CAST($nb AS DOUBLE)))"

  // =====================================================================
  // q32: brute-force cosine top-k (ANN baseline)
  // =====================================================================

  /** Top-10 nearest neighbors of vec_id=0 by cosine. Scale: the query
    * vector broadcasts to every partition and each row computes one
    * codegen'd zip_with/aggregate — a single scan, no shuffle except the
    * final TakeOrderedAndProject. This is the exact-scan baseline the LSH
    * variant (q34) is measured against. */
  def q32KnnBrute(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    val q = e.filter(col("vec_id") === 0).select(col("embedding").as("qemb"))
    val dot = fpDot(col("embedding"), col("qemb"))
    val na = fpDot(col("embedding"), col("embedding"))
    val nb = fpDot(col("qemb"), col("qemb"))
    e.filter(col("vec_id") =!= 0)
      .crossJoin(broadcast(q))
      .select(col("vec_id"), col("label"),
        round(fpCos(dot, na, nb), 6).as("cos"))
      .orderBy(col("cos").desc, col("vec_id"))
      .limit(10)
  }

  val oracleQ32: String = {
    val dot = oFpDot("e.embedding", "q.qemb")
    val na = oFpDot("e.embedding", "e.embedding")
    val nb = oFpDot("q.qemb", "q.qemb")
    s"""SELECT e.vec_id, e.label,
       |  round(${oFpCos(dot, na, nb)}, 6) AS cos
       |FROM embeddings e
       |CROSS JOIN (SELECT embedding AS qemb FROM embeddings WHERE vec_id = 0) q
       |WHERE e.vec_id <> 0
       |ORDER BY cos DESC, e.vec_id LIMIT 10""".stripMargin
  }

  // =====================================================================
  // q33: embedding near-dup pairs (all-pairs, top-20 by cosine)
  // =====================================================================

  /** Top-20 most-similar embedding pairs. The corpus has no planted
    * embedding dups (max cos ≈ 0.51), so this ranks rather than
    * thresholds. Deliberately the exact quadratic formulation — the scale
    * path is q34; at 100 TB you would run THIS shape only within LSH/IVF
    * buckets. Blocked here by label (10 blocks) to show the bucketed join
    * pattern: pairs are only formed inside a block.
    * NOTE: blocking by label means cross-label pairs are out of scope by
    * design (documented semantics, same in the oracle). */
  def q33NearDupPairs(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    val a = e.select(col("label").as("blk"), col("vec_id").as("id_a"), col("embedding").as("ea"))
    val b = e.select(col("label").as("blk"), col("vec_id").as("id_b"), col("embedding").as("eb"))
    val dot = fpDot(col("ea"), col("eb"))
    val na = fpDot(col("ea"), col("ea"))
    val nb = fpDot(col("eb"), col("eb"))
    a.join(b, Seq("blk")).filter(col("id_a") < col("id_b"))
      .select(col("blk").as("label"), col("id_a"), col("id_b"),
        round(fpCos(dot, na, nb), 6).as("cos"))
      .orderBy(col("cos").desc, col("id_a"), col("id_b"))
      .limit(20)
  }

  val oracleQ33: String = {
    val dot = oFpDot("a.embedding", "b.embedding")
    val na = oFpDot("a.embedding", "a.embedding")
    val nb = oFpDot("b.embedding", "b.embedding")
    s"""SELECT a.label AS label, a.vec_id AS id_a, b.vec_id AS id_b,
       |  round(${oFpCos(dot, na, nb)}, 6) AS cos
       |FROM embeddings a JOIN embeddings b
       |  ON a.label = b.label AND a.vec_id < b.vec_id
       |ORDER BY cos DESC, id_a, id_b LIMIT 20""".stripMargin
  }

  // =====================================================================
  // q34: LSH-bucketed ANN (random hyperplane signatures)
  // =====================================================================

  private val PLANES = 16
  private val DIMS = 64
  private val NIBBLES = 4 // 4 bands of 4 sign bits

  /** Hyperplane weights ±1 derived from md5(p + "_" + i) — a deterministic
    * pseudo-random source both engines reproduce exactly. */
  private def weightCase(pCol: String, iCol: String): String =
    s"CASE WHEN (instr('0123456789abcdef', substring(md5(concat(CAST($pCol AS STRING), '_', CAST($iCol AS STRING))), 1, 1)) - 1) % 2 = 0 THEN 1 ELSE -1 END"

  /** ANN via random-hyperplane LSH: 16 sign bits per vector (sign of the
    * fixed-point projection onto each pseudo-random ±1 hyperplane), banded
    * into 4 nibbles; candidates share >= 1 nibble with the query vector's
    * signature; only candidates pay the exact cosine; output the top-10.
    * Scale: signatures are one explode + groupBy(vec_id) pass (16
    * conditional sums); the candidate set is an equi-join on (band, nibble)
    * — per-bucket work replaces the full scan of q32. */
  def q34KnnLsh(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    // ±1 weight table: PLANES×DIMS rows, broadcast to the projection join
    val weights = s.range(PLANES.toLong).select(col("id").as("p"))
      .crossJoin(s.range(DIMS.toLong).select(col("id").as("i")))
      .withColumn("w", expr(weightCase("p", "i")))
    val exploded = e.select(col("vec_id"), posexplode(col("embedding")).as(Seq("i", "x")))
      .withColumn("xfp", round(col("x").cast("double") * 1e6).cast("long"))
    val proj = exploded.join(broadcast(weights), Seq("i"))
      .groupBy("vec_id", "p")
      .agg(sum(col("w") * col("xfp")).as("s"))
    val sig = proj.groupBy("vec_id")
      .agg((0 until PLANES).map(p =>
        max(when(col("p") === p && col("s") > 0, 1).otherwise(0)).as(s"bit$p")).head,
        (0 until PLANES).map(p =>
          max(when(col("p") === p && col("s") > 0, 1).otherwise(0)).as(s"bit$p")).tail: _*)
    val nib = (0 until NIBBLES).map { k =>
      (0 until 4).map(j => col(s"bit${4 * k + j}") * lit(1 << j)).reduce(_ + _).as(s"nib$k")
    }
    val sigN = sig.select(col("vec_id") +: nib: _*).cache()
    val bands = sigN.select(col("vec_id"),
      explode(array((0 until NIBBLES).map(k =>
        struct(lit(k).as("k"), col(s"nib$k").as("v"))): _*)).as("e"))
      .select(col("vec_id"), col("e.k").as("k"), col("e.v").as("v"))
    val qBands = bands.filter(col("vec_id") === 0)
      .select(col("k"), col("v"))
    val candIds = bands.filter(col("vec_id") =!= 0)
      .join(broadcast(qBands), Seq("k", "v"))
      .select(col("vec_id")).distinct()
    val q = e.filter(col("vec_id") === 0).select(col("embedding").as("qemb"))
    val dot = fpDot(col("embedding"), col("qemb"))
    val na = fpDot(col("embedding"), col("embedding"))
    val nb = fpDot(col("qemb"), col("qemb"))
    e.join(candIds, Seq("vec_id"))
      .crossJoin(broadcast(q))
      .select(col("vec_id"), col("label"),
        round(fpCos(dot, na, nb), 6).as("cos"))
      .orderBy(col("cos").desc, col("vec_id"))
      .limit(10)
  }

  val oracleQ34: String = {
    val sigBits = (0 until PLANES)
      .map(p => s"max(CASE WHEN p = $p AND s > 0 THEN 1 ELSE 0 END) AS bit$p").mkString(", ")
    val nibs = (0 until NIBBLES).map { k =>
      (0 until 4).map(j => s"bit${4 * k + j}*${1 << j}").mkString(" + ") + s" AS nib$k"
    }.mkString(", ")
    val bandUnion = (0 until NIBBLES)
      .map(k => s"SELECT vec_id, $k AS k, nib$k AS v FROM sign").mkString(" UNION ALL ")
    val dot = oFpDot("e.embedding", "q.qemb")
    val na = oFpDot("e.embedding", "e.embedding")
    val nb = oFpDot("q.qemb", "q.qemb")
    s"""WITH weights AS (
       |  SELECT p, i,
       |    CASE WHEN (strpos('0123456789abcdef', substr(md5(CAST(p AS VARCHAR)||'_'||CAST(i AS VARCHAR)), 1, 1)) - 1) % 2 = 0 THEN 1 ELSE -1 END AS w
       |  FROM range(0, $PLANES) t(p), range(0, $DIMS) u(i)),
       |exploded AS (
       |  SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS i,
       |         CAST(round(CAST(unnest(embedding) AS DOUBLE)*1000000.0) AS BIGINT) AS xfp
       |  FROM embeddings),
       |proj AS (
       |  SELECT vec_id, p, sum(w * xfp) AS s
       |  FROM exploded JOIN weights ON exploded.i = weights.i
       |  GROUP BY vec_id, p),
       |sig AS (SELECT vec_id, $sigBits FROM proj GROUP BY vec_id),
       |sign AS (SELECT vec_id, $nibs FROM sig),
       |bands AS ($bandUnion),
       |cand AS (
       |  SELECT DISTINCT b.vec_id
       |  FROM bands b JOIN bands qb ON b.k = qb.k AND b.v = qb.v
       |  WHERE qb.vec_id = 0 AND b.vec_id <> 0)
       |SELECT e.vec_id, e.label,
       |  round(${oFpCos(dot, na, nb)}, 6) AS cos
       |FROM embeddings e
       |JOIN cand ON e.vec_id = cand.vec_id
       |CROSS JOIN (SELECT embedding AS qemb FROM embeddings WHERE vec_id = 0) q
       |ORDER BY cos DESC, e.vec_id LIMIT 10""".stripMargin
  }

  // =====================================================================
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q32_knn_brute" -> q32KnnBrute _,
    "q33_neardup_pairs" -> q33NearDupPairs _,
    "q34_knn_lsh" -> q34KnnLsh _,
  )

  val oracle: Map[String, String] = Map(
    "q32_knn_brute" -> oracleQ32,
    "q33_neardup_pairs" -> oracleQ33,
    "q34_knn_lsh" -> oracleQ34,
  )
}
