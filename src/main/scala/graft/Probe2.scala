package graft

import org.apache.spark.sql.SparkSession

/** Scratch profiler for q31 cost attribution (deleted before round end). */
object Probe2 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.queries.Relational.q01Agg(spark, sfDir).count()

    def time(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PROBE2 $name%-36s ${(System.nanoTime() - t0) / 1e9}%8.3f s  ($r)")
    }

    // warm like Bench does: run at sf0.001, then clear cache
    time("q31 warm @sf0.001") {
      graft.queries.TextDedup.q31SimhashPairs(spark, "/root/testdata/sf0.001").count()
    }
    spark.catalog.clearCache()
    // planning only (analysis + optimization + physical planning + codegen source gen)
    time("q31 plan-only @sf0.1") {
      val df = graft.queries.TextDedup.q31SimhashPairs(spark, sfDir)
      df.queryExecution.executedPlan.toString.length
    }
    spark.catalog.clearCache()
    time("q31 run1 @sf0.1 (bench-like)") {
      graft.queries.TextDedup.q31SimhashPairs(spark, sfDir).count()
    }
    time("q31 run2 @sf0.1 (cache warm)") {
      graft.queries.TextDedup.q31SimhashPairs(spark, sfDir).count()
    }
    spark.catalog.clearCache()
    time("q31 run3 @sf0.1 (cache cleared)") {
      graft.queries.TextDedup.q31SimhashPairs(spark, sfDir).count()
    }
    spark.stop()
  }
}
