package graft

import org.apache.spark.sql.functions._

/** Cold-start decomposition AND mitigation A/B of the serving probe wall
  * (r16 measured the problem, r17 adds the fix's measurement): for each
  * decade index, two arms, each from a genuinely cold page cache
  * (`sync; echo 3 > /proc/sys/vm/drop_caches` — requires root; skipped
  * with a note otherwise):
  *
  *   - COLD arm: attach → N identical probes. Probe #1 pays cold bytes +
  *     codegen + file-index materialization (the r16 measurement: 2.8–9×
  *     of warm, dominated by BYTES);
  *   - WARM-ATTACH arm: attach → `warm()` (timed, sequential prefetch of
  *     the index bytes — [[graft.queries.DedupIndex.warm]]) → N probes.
  *     The claim under test: probe #1 lands near the warm steady state,
  *     because the bytes were paid up front at sequential bandwidth
  *     instead of as scattered reads inside the first request's latency.
  *
  * Production note: steady-state serving is the warm row either way; a
  * shared metastore/FileStatusCache amortizes the LISTING half for free,
  * and `warm()` is the deploy-time lever for the BYTES half.
  *
  * Usage: graft.ColdWarmProbe [workDir] [probesPerIndex]
  */
object ColdWarmProbe {
  def main(args: Array[String]): Unit = {
    val work = args.headOption.getOrElse("/tmp/graft_scale")
    val n = args.lift(1).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "2000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timed(body: => Any): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    def dropCaches(): Boolean =
      try new ProcessBuilder("sh", "-c",
        "sync; echo 3 > /proc/sys/vm/drop_caches").start().waitFor() == 0
      catch { case _: Exception => false }

    val docs = spark.read.parquet(s"$work/x1000e/documents.parquet")
      .select("doc_id", "text")
    val embs = spark.read.parquet(s"$work/x1000e/embeddings.parquet")
    val docBatch = docs.filter(col("doc_id") < 1000000L &&
      col("doc_id") % 7 === 3 && col("doc_id") % 100 < 2)
      .localCheckpoint(true) // probes must not re-touch the corpus files
    val vecBatch = embs.filter(col("vec_id") < 1000000L &&
      col("vec_id") % 7 === 3 && col("vec_id") % 100 < 2)
      .localCheckpoint(true)

    def arm(kind: String, dir: String, pfx: String,
        warmFirst: Boolean): String = {
      val dropped = dropCaches()
      val attachT = timed(
        if (kind == "text") graft.queries.DedupIndex.attach(spark, dir, pfx)
        else graft.queries.VectorIndex.attach(spark, dir, pfx))
      val (warmT, warmBytes) =
        if (!warmFirst) (0.0, 0L)
        else {
          var b = 0L
          val t = timed {
            b = if (kind == "text")
              graft.queries.DedupIndex.warm(spark, pfx)
            else graft.queries.VectorIndex.warm(spark, pfx)
          }
          (t, b)
        }
      val times = (1 to n).map { _ =>
        timed(
          if (kind == "text") graft.queries.DedupIndex
            .incrementalDedup(docBatch, "doc_id", "text", pfx).count()
          else graft.queries.VectorIndex
            .incrementalDedup(vecBatch, "vec_id", "embedding", pfx,
              minCos = 0.9).count())
      }
      f"""{"dropped":$dropped,"attach":$attachT%.2f,"warm":$warmT%.2f,""" +
        f""""warm_gb":${warmBytes / 1e9}%.2f,"probes":[${
          times.map(t => f"$t%.3f").mkString(",")}]}"""
    }

    def series(kind: String, dir: String, pfx: String): String = {
      if (!new java.io.File(dir).exists()) return s""""$pfx":"absent""""
      s""""$pfx":{"cold":${arm(kind, dir, pfx, warmFirst = false)},""" +
        s""""warm_attach":${arm(kind, dir, pfx, warmFirst = true)}}"""
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
