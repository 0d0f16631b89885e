package graft.queries

import graft.SparkSpec

class SimilaritySpec extends SparkSpec {

  for ((name, fn) <- Similarity.queries.toSeq.sortBy(_._1)) {
    test(s"$name runs and returns rows") {
      assert(fn(spark, sfDir).count() > 0, s"$name returned no rows")
    }
  }

  test("q32 cosines are valid and sorted descending") {
    val cos = Similarity.q32KnnBrute(spark, sfDir).collect().map(_.getAs[Double]("cos"))
    assert(cos.length == 10)
    cos.foreach(c => assert(c >= -1.000001 && c <= 1.000001))
    assert(cos.sameElements(cos.sortBy(-_: Double)))
  }

  test("q33 pairs are within one label block and ordered by cosine") {
    val rows = Similarity.q33NearDupPairs(spark, sfDir).collect()
    assert(rows.length == 20)
    val cos = rows.map(_.getAs[Double]("cos"))
    assert(cos.sameElements(cos.sortBy(-_: Double)))
    rows.foreach(r => assert(r.getAs[Long]("id_a") < r.getAs[Long]("id_b")))
  }

  test("q37 IVF re-rank scores agree with brute force for shared candidates") {
    val brute = Similarity.q32KnnBrute(spark, sfDir).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Double]("cos")).toMap
    val ivf = Similarity.q37KnnIvf(spark, sfDir).collect()
    assert(ivf.length == 10)
    ivf.foreach { r =>
      brute.get(r.getAs[Long]("vec_id"))
        .foreach(bc => assert(math.abs(bc - r.getAs[Double]("cos")) < 1e-9))
    }
    // probed-cell containment: at most NPROBE distinct labels in results
    assert(ivf.map(_.getAs[Int]("label")).distinct.length <= 2)
  }

  test("q34 LSH candidates score exactly like the brute-force scan") {
    // every vector the LSH variant returns must carry the same cosine the
    // brute-force query computes for it (the re-rank is exact)
    val brute = Similarity.q32KnnBrute(spark, sfDir).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Double]("cos")).toMap
    val lsh = Similarity.q34KnnLsh(spark, sfDir).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Double]("cos"))
    lsh.foreach { case (id, c) =>
      brute.get(id).foreach(bc => assert(math.abs(bc - c) < 1e-9))
    }
  }
}
