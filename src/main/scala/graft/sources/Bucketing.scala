package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table materialization — the co-located-join layout for
  * repeatedly-joined big tables.
  *
  * A shuffle on the join key is the dominant cost of a big-big join; when
  * the same tables join on the same key query after query (fact-to-fact
  * patterns like CUR line items vs. a usage ledger, or documents vs. a
  * signature table), paying that shuffle per query is wrong. Writing both
  * sides bucketed by the key into the warehouse pins rows to buckets by
  * `hash(key) % buckets` AT WRITE TIME; Spark's bucketed scan then
  * reports the partitioning to the planner and a join of two tables with
  * the SAME key and bucket count needs NO exchange at all — the join
  * runs bucket-by-bucket, and `sortBy` additionally pre-orders rows so
  * sort-merge join skips its per-task sort. This is the Spark-native
  * equivalent of a co-partitioned warehouse layout; at 100 TB it turns
  * every repeat join from a full-network shuffle into a local merge.
  *
  * `BucketingSpec` proves the contract by plan: the join of two tables
  * written here contains ZERO shuffle exchanges.
  */
object Bucketing {

  /** Write `df` as a bucketed parquet table in the session warehouse
    * (bucketed writes are catalog-only in Spark — a bare path cannot
    * carry bucket metadata). Buckets and key must match across the
    * tables that will join. */
  def writeBucketed(df: DataFrame, table: String, buckets: Int, key: String,
      sortCols: Seq[String] = Nil, mode: String = "overwrite"): Unit = {
    val w = df.write.format("parquet").mode(mode).bucketBy(buckets, key)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .saveAsTable(table)
  }

  /** Join two same-bucketed tables on their bucket key — exchange-free
    * when both were written via [[writeBucketed]] with equal bucket
    * counts. (A plain `spark.table(a).join(spark.table(b), key)`; the
    * planner derives the co-location from catalog bucket metadata — this
    * helper exists to name the pattern and carry the contract docs.) */
  def coLocatedJoin(spark: SparkSession, left: String, right: String,
      key: String, joinType: String = "inner"): DataFrame =
    spark.table(left).join(spark.table(right), Seq(key), joinType)
}
