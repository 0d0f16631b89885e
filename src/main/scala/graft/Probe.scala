package graft

import org.apache.spark.sql.SparkSession

/** Throwaway profiling main (not part of the library surface). */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warmup
    graft.queries.Relational.q01Agg(spark, sfDir).count()

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"PROBE $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s  rows=$n")
    }

    val q = sys.env.getOrElse("PROBE_QUERIES",
      "q30_lsh_pairs,q31_simhash_pairs,q28_jaccard_pairs,q37_knn_ivf,q05_join_broadcast,q32_knn_brute,q19_rollup,q34_knn_lsh")
      .split(",")
    for (name <- q; fn <- SparkEntry.queries.get(name)) {
      time(name) { fn(spark, sfDir).count() }
      time(name + " (2nd)") { fn(spark, sfDir).count() }
    }

    if (sys.env.contains("PROBE_STAGES")) {
      import org.apache.spark.sql.functions._
      spark.catalog.clearCache()
      val docs = graft.queries.Tables.load(spark, sfDir, "documents")
      time("docs scan") { docs.count() }
      val toks = split(col("text"), " ")
      time("shingles3") {
        docs.select(col("doc_id"), graft.queries.TextDedup.shinglesForProbe(toks).as("ts")).count()
      }
      time("shingle explode+md5") {
        docs.select(col("doc_id"),
          explode(graft.queries.TextDedup.shinglesForProbe(toks)).as("sh"))
          .select(md5(col("sh"))).count()
      }
      time("q31 packed sums agg") {
        val ex = docs
          .select(col("doc_id"), explode(graft.queries.TextDedup.shinglesForProbe(toks)).as("sh"))
          .withColumn("h", md5(col("sh")))
          .select(col("doc_id") +: (0 until 12).map(p =>
            expr(s"instr('0123456789abcdef', substring(h, ${p + 1}, 1)) - 1").as(s"d$p")): _*)
        ex.groupBy("doc_id").agg(count(lit(1)), (0 until 12).map(p => sum(col(s"d$p"))): _*).count()
      }
    }
    spark.stop()
  }
}
