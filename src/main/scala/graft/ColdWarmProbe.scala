package graft

import org.apache.spark.sql.functions._

/** Cold-start decomposition of the serving probe wall (the r16
  * contaminated-window lesson turned into a number): attach the decade
  * indexes in a FRESH session and time N successive identical probes.
  * Probe #1 pays the session's one-time terms — partition RECOVER was
  * already paid by attach, but the first probe pays file-index
  * materialization (O(grain×waves) listing), codegen, and cold page
  * cache; #2+ are the steady-state serving wall every BENCH_NOTES table
  * reports (min of warm runs). The #1−#2 gap is the term a production
  * deployment amortizes via a shared metastore / FileStatusCache — and
  * what a fine grain (512+) inflates on a cold local FS.
  *
  * Usage: graft.ColdWarmProbe [workDir] [probesPerIndex]
  */
object ColdWarmProbe {
  def main(args: Array[String]): Unit = {
    val work = args.headOption.getOrElse("/tmp/graft_scale")
    val n = args.lift(1).map(_.toInt).getOrElse(4)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "2000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timed(body: => Long): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    val docs = spark.read.parquet(s"$work/x1000e/documents.parquet")
      .select("doc_id", "text")
    val embs = spark.read.parquet(s"$work/x1000e/embeddings.parquet")
    val docBatch = docs.filter(col("doc_id") < 1000000L &&
      col("doc_id") % 7 === 3 && col("doc_id") % 100 < 2)
    val vecBatch = embs.filter(col("vec_id") < 1000000L &&
      col("vec_id") % 7 === 3 && col("vec_id") % 100 < 2)

    def series(kind: String, dir: String, pfx: String): String = {
      if (!new java.io.File(dir).exists()) return s""""$pfx":"absent""""
      val (attachT, _) = {
        val t0 = System.nanoTime()
        if (kind == "text") graft.queries.DedupIndex.attach(spark, dir, pfx)
        else graft.queries.VectorIndex.attach(spark, dir, pfx)
        ((System.nanoTime() - t0) / 1e9, ())
      }
      val times = (1 to n).map { _ =>
        timed(
          if (kind == "text") graft.queries.DedupIndex
            .incrementalDedup(docBatch, "doc_id", "text", pfx).count()
          else graft.queries.VectorIndex
            .incrementalDedup(vecBatch, "vec_id", "embedding", pfx,
              minCos = 0.9).count())
      }
      f""""$pfx":{"attach":$attachT%.2f,"probes":[${
        times.map(t => f"$t%.3f").mkString(",")}]}"""
    }
    val out = Seq(
      series("text", s"$work/decade_txt_x1000_cmp", "cw_txt512"),
      series("vec", s"$work/decade_vec_x1000_cmp", "cw_vec256"),
      series("text", s"$work/decade_txt_x1000", "cw_txt64"),
      series("vec", s"$work/decade_vec_x1000", "cw_vec64"))
    println(s"""{"metric":"cold_warm_probe",${out.mkString(",")}}""")
    spark.stop()
  }
}
