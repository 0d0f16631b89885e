package graft.sources

import graft.engine.GraftEngine
import org.apache.spark.sql.SparkSession
import java.io.File
import java.nio.file.{Files, Paths}

/** Batch query-library runner, mirroring `DataPartitioner`
  * (reference data_partitioner.py:79-180, S5/S12 in SURVEY.md §2.1): run
  * every `.sql` under a library directory, write each result as snappy
  * parquet mirroring the library's directory structure, and surface the
  * `-- Description:` / `-- Partitioning:` / `-- Output:` header metadata.
  *
  * SQL files are in the reference dialect (e.g. `::date` casts —
  * cur2_query_library/compute/lambda.sql:11) and go through the engine's
  * dialect translator. Each result is written distributed (no collect).
  */
object QueryLibrary {

  final case class QueryMeta(
      description: Option[String],
      partitioning: Option[String],
      output: Option[String])

  final case class RunResult(sqlFile: String, outputPath: String, rows: Long, meta: QueryMeta)

  /** Header-comment parse (data_partitioner.py:89-103). */
  def extractMetadata(sql: String): QueryMeta = {
    def grab(tag: String): Option[String] =
      sql.linesIterator.map(_.trim)
        .collectFirst { case l if l.startsWith(s"-- $tag:") => l.stripPrefix(s"-- $tag:").trim }
    QueryMeta(grab("Description"), grab("Partitioning"), grab("Output"))
  }

  /** Run one library file; returns the parquet output path
    * (data_partitioner.py:105-150). */
  def runSqlFile(spark: SparkSession, libraryRoot: String, relPath: String,
      outputRoot: String): RunResult = {
    val sqlPath = Paths.get(libraryRoot).resolve(relPath)
    val sql = new String(Files.readAllBytes(sqlPath), "UTF-8")
    val df = new GraftEngine(spark).query(sql)
    val outPath = Paths.get(outputRoot)
      .resolve(relPath.stripSuffix(".sql") + ".parquet").toString
    df.write.mode("overwrite").option("compression", "snappy").parquet(outPath)
    val rows = spark.read.parquet(outPath).count()
    RunResult(relPath, outPath, rows, extractMetadata(sql))
  }

  /** Run every `.sql` under the library (data_partitioner.py:152-180).
    * Failures are collected, not fatal — the reference logs and continues. */
  def runAll(spark: SparkSession, libraryRoot: String, outputRoot: String)
      : (Seq[RunResult], Seq[(String, String)]) = {
    val root = new File(libraryRoot)
    def walk(d: File): Seq[File] = {
      val fs = Option(d.listFiles()).getOrElse(Array.empty)
      fs.toSeq.flatMap(f => if (f.isDirectory) walk(f) else Seq(f))
    }
    val sqlFiles = walk(root).filter(_.getName.endsWith(".sql"))
      .map(f => root.toPath.relativize(f.toPath).toString).sorted
    val results = Seq.newBuilder[RunResult]
    val errors = Seq.newBuilder[(String, String)]
    sqlFiles.foreach { rel =>
      try results += runSqlFile(spark, libraryRoot, rel, outputRoot)
      catch { case e: Throwable => errors += (rel -> e.getMessage) }
    }
    (results.result(), errors.result())
  }
}
