package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Test-table loaders over the driver-provided parquet dirs (TESTDATA.md).
  * Every loader both returns the DataFrame and registers a same-named temp
  * view so SQL-path queries (GraftEngine) see the same catalog.
  */
object Tables {
  val names = Seq("region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    // The events table carries TIMESTAMP(NANOS) — illegal for Spark's
    // parquet reader. Read nanos as Long (conf set once in GraftSession /
    // the entrypoint mains) and convert to micros (Spark's native timestamp
    // precision) with exact integer division: epoch-nanos (~1.7e18) exceed
    // double's 53-bit exact range, so `/ 1000.0` could be off by ~1us.
    val df = if (name == "events") {
      if (spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong").isEmpty)
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$dir/$name.parquet")
        .withColumn("ts",
          org.apache.spark.sql.functions.timestamp_micros(
            org.apache.spark.sql.functions.expr("ts div 1000")))
    } else spark.read.parquet(s"$dir/$name.parquet")
    df.createOrReplaceTempView(name)
    df
  }

  def loadAll(spark: SparkSession, dir: String): Map[String, DataFrame] =
    names.map(n => n -> load(spark, dir, n)).toMap
}
