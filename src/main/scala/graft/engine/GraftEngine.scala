package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import java.nio.file.{Files, Paths}

/** The query workhorse, mirroring `FinOpsEngine.query` / `DuckDBEngine.query`
  * (finops_engine.py:147-168, duckdb_engine.py:234-313) Spark-first:
  *
  *   - `.sql`-suffixed argument → load file contents (S5).
  *   - dialect translation (SqlTranslator) before `spark.sql`.
  *   - results stay lazy DataFrames; callers decide when to collect.
  *
  * Unlike the reference there is no per-query connection, no Arrow/pandas
  * conversion fallback, and no eager materialization — Catalyst plans a
  * distributed scan with pushdown each time.
  */
class GraftEngine(val spark: SparkSession,
    referenceDate: Option[java.time.LocalDate] = None) {

  /** Execute SQL text or a `.sql` file path. */
  def query(sqlOrFile: String): DataFrame = {
    val sql =
      if (sqlOrFile.trim.endsWith(".sql")) loadSqlFile(sqlOrFile.trim)
      else sqlOrFile
    spark.sql(SqlTranslator.translate(sql, referenceDate))
  }

  /** Guarded ad-hoc endpoint semantics (sql_endpoints.py:89-233): firewall +
    * LIMIT injection. Returns Left(reason) on rejected SQL. */
  def guardedQuery(sql: String, maxRows: Int = 1000): Either[String, DataFrame] =
    SqlTranslator.validateReadOnly(sql).map { ok =>
      spark.sql(SqlTranslator.translate(
        SqlTranslator.injectLimit(ok, maxRows), referenceDate))
    }

  /** Load a SQL file, trying absolute then cwd-relative path
    * (finops_engine.py:152-160). */
  def loadSqlFile(path: String): String = {
    val p = Paths.get(path)
    val resolved =
      if (Files.exists(p)) p
      else Paths.get(System.getProperty("user.dir")).resolve(path)
    new String(Files.readAllBytes(resolved), "UTF-8")
  }

  def schema(table: String): Map[String, String] = Catalog.schema(spark, table)
  def sample(table: String, n: Int = 10): DataFrame = Catalog.sample(spark, table, n)
}
