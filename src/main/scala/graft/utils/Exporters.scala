package graft.utils

import org.apache.spark.sql.DataFrame

/** Result exporters, mirroring de_polars/utils/exports.py (S8-S11 in
  * SURVEY.md §2.1). Two shapes:
  *  - distributed sinks (parquet/csv writers) for large results;
  *  - driver-side strings (JSON rows / CSV text) for API-sized results —
  *    the reference always collects (its results are post-aggregation and
  *    small); we keep that split explicit so nobody collects a 100 TB scan.
  */
object Exporters {

  /** Distributed snappy-parquet sink (data_partitioner.py:38-52). */
  def writeParquet(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("compression", "snappy").parquet(path)

  /** Partition-layout parquet sink: `<col>=<value>/` directories matching
    * the CUR export layout (S6's mirrored structure, data_config.py:18-23).
    * Repartitioned on the partition column first so each partition writes
    * one file per shuffle task that holds it — at scale, set
    * `spark.sql.shuffle.partitions` (or add a salt column) to control
    * file counts per partition. */
  def writePartitioned(df: DataFrame, path: String, partitionCol: String): Unit =
    df.repartition(org.apache.spark.sql.functions.col(partitionCol))
      .write.mode("overwrite")
      .option("compression", "snappy")
      .partitionBy(partitionCol)
      .parquet(path)

  /** Distributed CSV sink (exports.py:46-68). */
  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("header", "true").csv(path)

  /** Driver-side JSON array string (exports.py:16-44: df.to_dicts →
    * json.dumps). Caller is responsible for having limited the result. */
  def toJsonString(df: DataFrame): String =
    df.toJSON.collect().mkString("[", ",", "]")

  /** Driver-side CSV string with header (exports.py:46-68 StringIO path). */
  def toCsvString(df: DataFrame): String = {
    val cols = df.columns
    def cell(v: Any): String = v match {
      case null => ""
      case s: String if s.contains(",") || s.contains("\"") || s.contains("\n") =>
        "\"" + s.replace("\"", "\"\"") + "\""
      case other => other.toString
    }
    val header = cols.mkString(",")
    val rows = df.collect().map(r => cols.indices.map(i => cell(r.get(i))).mkString(","))
    (header +: rows).mkString("\n")
  }

  /** Markdown table (exports.py report path). */
  def toMarkdown(df: DataFrame): String = {
    val cols = df.columns
    val header = cols.mkString("| ", " | ", " |")
    val sep = cols.map(_ => "---").mkString("| ", " | ", " |")
    val rows = df.collect().map(r =>
      cols.indices.map(i => Option(r.get(i)).map(_.toString).getOrElse("")).mkString("| ", " | ", " |"))
    (Seq(header, sep) ++ rows).mkString("\n")
  }
}
