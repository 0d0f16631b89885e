package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Queries live in graft.queries.*; this object only assembles the maps.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    graft.queries.Relational.q06MultiJoin(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2 plus the
    * training-data pipeline (dedup / similarity / text analysis). */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Relational.queries ++
      graft.queries.TextDedup.queries ++
      graft.queries.TextPipeline.queries ++
      graft.queries.Curation.queries ++
      graft.queries.Similarity.queries ++
      graft.queries.Bpe.queries

  /** For each key in `queries`, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys get a rows-only check. */
  def oracleSql: Map[String, String] =
    graft.queries.Relational.oracle ++
      graft.queries.TextDedup.oracle ++
      graft.queries.TextPipeline.oracle ++
      graft.queries.Curation.oracle ++
      graft.queries.Similarity.oracle ++
      graft.queries.Bpe.oracle
}
