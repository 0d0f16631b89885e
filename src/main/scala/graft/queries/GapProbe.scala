package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway diagnostic: the distribution of per-vector top-2 centroid
  * cosine GAPS (cos to nearest − cos to second-nearest) on a corpus, at
  * the same auto cell count semanticDedupCells would pick — the number
  * that decides whether a margin-gated second probe
  * ([[VectorOps.assignCellsMulti]] maxMargin) spares anything. */
object GapProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_scale/x100d")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "2000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val idx = VectorOps.index(
      spark.read.parquet(s"$dir/embeddings.parquet"), "vec_id", "embedding")
    val rows = idx.count()
    val k = VectorOps.autoCellCount(rows, VectorOps.AutoCells,
      VectorOps.DefaultCellRows)
    val cents = VectorOps.kmeansCentroids(idx, k, iters = 2)
    // per-vector: best and second-best score over the broadcast centroid
    // table; gap in cosine units = (s1 - s2) / |v|
    val centsDf = spark.createDataFrame(
      spark.sparkContext.parallelize(cents.zipWithIndex.map {
        case (c, i) => (i, c.toSeq)
      }, 1).map(t => org.apache.spark.sql.Row(t._1, t._2)),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("cell",
          org.apache.spark.sql.types.IntegerType),
        org.apache.spark.sql.types.StructField("cefp",
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.LongType)))))
      .withColumn("cn", sqrt(aggregate(col("cefp"), lit(0.0),
        (a, x) => a + x.cast("double") * x.cast("double"))))
    val scored = idx.select(col("vec_id"), col("efp"), col("nrm"))
      .crossJoin(broadcast(centsDf))
      .select(col("vec_id"), col("nrm"),
        (graft.functions.GraftFunctions.intDot(col("efp"), col("cefp"))
          .cast("double") / col("cn")).as("s"))
    val gaps = scored.groupBy("vec_id")
      .agg(sort_array(collect_list(col("s")), asc = false).as("ss"),
        first(col("nrm")).as("nrm"))
      .select(((col("ss")(0) - col("ss")(1)) /
        sqrt(col("nrm").cast("double"))).as("gap"))
    val q = gaps.agg(
      expr("percentile_approx(gap, array(0.1,0.25,0.5,0.75,0.9,0.95,0.99), 10000)")
        .as("p"), avg("gap").as("mean"), max("gap").as("mx"))
      .head()
    println(s"""{"k":$k,"rows":$rows,"deciles":${q.getSeq[Double](0).mkString("[", ",", "]")},"mean":${q.getDouble(1)},"max":${q.getDouble(2)}}""")
    spark.stop()
  }
}
