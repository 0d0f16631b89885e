package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** r19 optimization-round measurement probe: times the dedup family's
  * shared cached derivations one node at a time (each stage's wall is
  * the INCREMENTAL cost on top of the already-cached parents — the
  * in-session materialization order a bench pass pays). Noop-sink
  * timed (guide §1.4); not part of any query path.
  *
  * Usage: runMain graft.queries.R19Probe /root/testdata/sf0.1 [cpus]
  */
object R19Probe {
  private def noop(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  private def timed(s: SparkSession, label: String)(df: => DataFrame): Unit = {
    s.sparkContext.setJobDescription(label)
    val t0 = System.nanoTime()
    noop(df)
    println(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s")
    s.sparkContext.setJobDescription(null)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = if (args.length > 1) args(1) else sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "2000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = Tables.load(spark, sfDir, "documents")
    // codegen/JIT warmup at the smallest SF, like Bench
    val warmDir = "/root/testdata/sf0.001"
    val dw = Tables.load(spark, warmDir, "documents")
    Seq(TextDedup.shingleSetsOf(dw), TextDedup.hashedShingleRowsOf(dw),
      TextDedup.cappedPairStatsOf(dw, 100L),
      TextDedup.containmentPairsOf(dw, 0.7)).foreach(noop)
    spark.catalog.clearCache()

    timed(spark, "scan only")(d.selectExpr("doc_id", "length(text)"))
    timed(spark, "shingleSets (cache build)")(TextDedup.shingleSetsOf(d))
    timed(spark, "hashedShingleRows (+cache)")(TextDedup.hashedShingleRowsOf(d))
    timed(spark, "dfAnnotated (+cache)")(TextDedup.dfAnnotatedProbe(d))
    timed(spark, "cappedPairStats (+cache)")(TextDedup.cappedPairStatsOf(d, 100L))
    timed(spark, "q69 scoring tail")(TextDedup.containmentPairsOf(d, 0.7))
    spark.stop()
  }
}
