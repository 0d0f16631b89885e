package graft

import org.apache.spark.sql.functions._

/** Publish-primitive tax A/B (r17): the object-store `manifest` mode
  * replaces rename-mode's one-directory-rename publish with per-FILE
  * moves + a listing-derived conditional-put manifest. This probe
  * measures what that swap costs at a real decade index: copy the 100×
  * text index (≈500k docs, partitioned grain) to scratch, append the
  * SAME batch once per mode (fresh copy each time, same window), and
  * time append + the post-append probe. The expected answer is "ε": an
  * append's wave carries batch-proportional files, so the per-file move
  * count is small regardless of index size, and the manifest listing
  * walks only the wave's own directories.
  *
  * Usage: graft.PublishModeProbe [workDir] [batchDocs]
  */
object PublishModeProbe {
  def main(args: Array[String]): Unit = {
    val work = args.headOption.getOrElse("/tmp/graft_scale")
    val nBatch = args.lift(1).map(_.toInt).getOrElse(500)
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
    val src = s"$work/decade_txt_x100_cmp"
    require(new java.io.File(src).exists(), s"$src absent")
    val docs = spark.read.parquet(s"$work/x100e/documents.parquet")
      .select("doc_id", "text")
    val batch = docs.filter(col("doc_id") % 7 === 3).limit(nBatch)
      .select((col("doc_id") + 90000000L).as("doc_id"), col("text"))
      .localCheckpoint(true)
    val twins = batch.limit(50)
      .select((col("doc_id") + 1000L).as("doc_id"), col("text"))
      .localCheckpoint(true)

    def arm(mode: String): String = {
      val scratch = java.nio.file.Files
        .createTempDirectory(s"pub_$mode").toString
      // fresh physical copy per arm: identical starting state, no
      // cross-arm cache or file-set advantage
      new ProcessBuilder("cp", "-r", src, s"$scratch/idx")
        .inheritIO().start().waitFor()
      spark.conf.set("spark.graft.append.staging", mode)
      try {
        graft.queries.DedupIndex.attach(spark, s"$scratch/idx", s"pm_$mode")
        val appendT = timed(graft.queries.DedupIndex.append(
          batch, "doc_id", "text", s"pm_$mode"))
        val probeT = timed(graft.queries.DedupIndex.incrementalDedup(
          twins, "doc_id", "text", s"pm_$mode").count())
        val served = graft.queries.DedupIndex.incrementalDedup(
          twins, "doc_id", "text", s"pm_$mode")
          .where(col("verdict") === "exact_dup").count()
        f""""$mode":{"append":$appendT%.2f,"probe":$probeT%.2f,""" +
          f""""served":$served}"""
      } finally spark.conf.unset("spark.graft.append.staging")
    }
    val out = Seq(arm("rename"), arm("manifest"))
    println(s"""{"metric":"publish_mode_probe","batch":$nBatch,${
      out.mkString(",")}}""")
    spark.stop()
  }
}
