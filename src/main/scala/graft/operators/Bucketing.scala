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

  /** Persist `df` as a bucketed+sorted EXTERNAL table at `location` —
    * the serving-artifact form: the data outlives the session, and
    * [[attachBucketed]] re-registers it in any later session (even a new
    * JVM, whose in-memory catalog forgot the table) without touching the
    * data. Multi-column keys bucket on the tuple, so an equi-join on
    * exactly those keys needs no exchange on this side. */
  def writeBucketedExternal(df: DataFrame, table: String, keys: Seq[String],
      location: String, buckets: Int): Unit = {
    require(keys.nonEmpty, "need at least one bucket key")
    df.sparkSession.sql(s"DROP TABLE IF EXISTS $table")
    df.repartition(buckets, keys.map(org.apache.spark.sql.functions.col): _*)
      .write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .option("path", location)
      .option("compression", "snappy")
      .saveAsTable(table)
  }

  /** [[writeBucketedExternal]] with Hive-style PARTITION directories on
    * `partCols` layered above the bucket files — the layout for a table
    * whose probes are scoped to a data-dependent key subset (e.g. the
    * IVF cells a serving batch actually lands in): a literal
    * partition-column predicate prunes whole directories at planning
    * time, so the probe's scan touches |probed partitions|/|partitions|
    * of the data instead of all of it, while the bucket spec still
    * proves the exchange-free side of the probe join. `partCols` must be
    * present in `df`; they land LAST in the on-disk schema (Spark moves
    * partition columns to the end). */
  def writePartitionedBucketedExternal(df: DataFrame, table: String,
      partCols: Seq[String], keys: Seq[String], location: String,
      buckets: Int): Unit = {
    require(partCols.nonEmpty && keys.nonEmpty,
      "need at least one partition column and one bucket key")
    df.sparkSession.sql(s"DROP TABLE IF EXISTS $table")
    df.repartition(buckets, keys.map(org.apache.spark.sql.functions.col): _*)
      .write.mode(SaveMode.Overwrite)
      .partitionBy(partCols: _*)
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .option("path", location)
      .option("compression", "snappy")
      .saveAsTable(table)
  }

  /** Register an existing [[writePartitionedBucketedExternal]] artifact —
    * metadata plus one RECOVER PARTITIONS file listing (no data read):
    * partition discovery is what re-arms planning-time pruning in the
    * fresh session. */
  def attachPartitionedBucketed(spark: SparkSession, table: String,
      partCols: Seq[String], keys: Seq[String], location: String,
      buckets: Int): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val schema = spark.read.parquet(location).schema.toDDL
    spark.sql(
      s"""CREATE TABLE $table ($schema) USING PARQUET
         |PARTITIONED BY (${partCols.mkString(", ")})
         |CLUSTERED BY (${keys.mkString(", ")})
         |SORTED BY (${keys.mkString(", ")})
         |INTO $buckets BUCKETS
         |LOCATION '$location'""".stripMargin)
    spark.sql(s"ALTER TABLE $table RECOVER PARTITIONS")
  }

  /** Register an existing [[writeBucketedExternal]] artifact in `spark`'s
    * catalog — metadata only (schema read from the parquet footers, no
    * data job): the bucket spec in the DDL is what lets the planner prove
    * the layout and skip the exchange, exactly as at write time. */
  def attachBucketed(spark: SparkSession, table: String, keys: Seq[String],
      location: String, buckets: Int): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val schema = spark.read.parquet(location).schema.toDDL
    spark.sql(
      s"""CREATE TABLE $table ($schema) USING PARQUET
         |CLUSTERED BY (${keys.mkString(", ")})
         |SORTED BY (${keys.mkString(", ")})
         |INTO $buckets BUCKETS
         |LOCATION '$location'""".stripMargin)
  }

  /** Persist `df` as a plain (unbucketed, unpartitioned) external table —
    * the single-row meta / small-dimension artifact form next to the
    * bucketed tables above. */
  def writePlainExternal(df: DataFrame, table: String,
      location: String): Unit = {
    df.sparkSession.sql(s"DROP TABLE IF EXISTS $table")
    df.write.mode(SaveMode.Overwrite)
      .option("path", location).option("compression", "snappy")
      .saveAsTable(table)
  }

  /** Register an existing [[writePlainExternal]] artifact — metadata only. */
  def attachPlain(spark: SparkSession, table: String,
      location: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val schema = spark.read.parquet(location).schema.toDDL
    spark.sql(
      s"CREATE TABLE $table ($schema) USING PARQUET LOCATION '$location'")
  }

  /** Recursive `part-` data-file count under `location` (any Hadoop FS
    * scheme) — the file-hygiene signal: each append adds one file set,
    * and a count far above buckets × partitions says compact. */
  def partFileCount(spark: SparkSession, location: String): Int = {
    val path = new org.apache.hadoop.fs.Path(location)
    val fs = path.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(path)) 0
    else {
      val it = fs.listFiles(path, true)
      var n = 0
      while (it.hasNext)
        if (it.next().getPath.getName.startsWith("part-")) n += 1
      n
    }
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
