package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table helpers for co-located joins (SURVEY.md §4 shuffle row;
  * builder directive "repartition/bucketing for co-located joins").
  *
  * Joining two tables bucketed into the same number of buckets on the
  * join key lets Spark plan a SortMergeJoin with NO exchange on either
  * side — at 100 TB this converts the recurring fact⋈fact join (e.g.
  * lineitem⋈orders on orderkey) from two full shuffles per query into a
  * one-time layout cost at ingest. The write itself shuffles once
  * (repartition by key keeps one file per bucket per partition writer).
  */
object Bucketing {

  /** Persist `df` as a bucketed+sorted catalog table (drops any previous
    * registration first — Overwrite alone does not reclaim a managed
    * location orphaned by a prior session). */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int): Unit = {
    df.sparkSession.sql(s"DROP TABLE IF EXISTS $table")
    // an in-memory catalog forgets managed tables across JVMs but their
    // warehouse directories survive; reclaim the orphaned location so
    // Overwrite semantics hold (unqualified default-db names only)
    if (!table.contains(".")) {
      val wh = df.sparkSession.conf.get("spark.sql.warehouse.dir")
        .stripPrefix("file:")
      val loc = new java.io.File(wh, table.toLowerCase)
      if (loc.exists()) {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rm))
          f.delete()
        }
        rm(loc)
      }
    }
    df.repartition(buckets, org.apache.spark.sql.functions.col(key))
      .write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, key)
      .sortBy(key)
      .option("compression", "snappy")
      .saveAsTable(table)
  }

  /** Join two same-bucketed tables on their bucket key — shuffle-free by
    * construction (verified in BucketingSpec's plan assertion). */
  def coLocatedJoin(spark: SparkSession, leftTable: String, rightTable: String,
      leftKey: String, rightKey: String): DataFrame = {
    val l = spark.table(leftTable)
    val r = spark.table(rightTable)
    l.join(r, l(leftKey) === r(rightKey))
  }
}
