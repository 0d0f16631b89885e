package graft.engine

/** Dialect translation: reference (DuckDB/Postgres-flavored) SQL → Spark SQL.
  *
  * The reference patches SQL with ad-hoc string rewrites
  * (kpi_summary.py:123-124,194-198); we centralize every observed delta
  * (SURVEY.md §7.1) in one pure pre-processing pass. Deliberately NOT a
  * Catalyst rule: these are lexical dialect gaps, not plan transformations.
  */
object SqlTranslator {

  /** `expr::TYPE` → `CAST(expr AS TYPE)` (lambda.sql:11, allocation.py:170).
    * Handles identifiers, quoted identifiers, function calls and parenthesized
    * expressions immediately preceding `::`.
    */
  private val castRe =
    """(\w+\([^()]*\)|"[^"]+"|`[^`]+`|\w+(?:\.\w+)*|\([^()]*\))::([A-Za-z]+(?:\([0-9, ]*\))?)""".r

  def rewriteCasts(sql: String): String =
    castRe.replaceAllIn(sql, m =>
      java.util.regex.Matcher.quoteReplacement(
        s"CAST(${m.group(1)} AS ${m.group(2)})"))

  /** `SUBSTRING(col FROM 'regex')` → `regexp_extract(col, 'regex', 1)`
    * (allocation.py:264-266 uses the Postgres regex form). */
  private val substrFromRe =
    """(?i)SUBSTRING\s*\(\s*([^()]+?)\s+FROM\s+'((?:[^']|'')*)'\s*\)""".r

  def rewriteSubstringFrom(sql: String): String =
    substrFromRe.replaceAllIn(sql, m =>
      java.util.regex.Matcher.quoteReplacement(
        s"regexp_extract(${m.group(1)}, '${m.group(2)}', 1)"))

  /** `'path/to/file.parquet'` used as a relation (README.md:340-368, a DuckDB
    * dialect feature) → Spark-native ``parquet.`path` ``. Only rewrites the
    * quoted literal when it appears in relation position (after FROM/JOIN).
    */
  private val pathRelRe =
    """(?i)(FROM|JOIN)\s+'([^']+\.parquet)'""".r

  def rewritePathRelations(sql: String): String =
    pathRelRe.replaceAllIn(sql, m =>
      java.util.regex.Matcher.quoteReplacement(
        s"${m.group(1)} parquet.`${m.group(2)}`"))

  /** `INTERVAL '3 months'` / `INTERVAL '3' MONTH` → `INTERVAL 3 MONTH`
    * (spend_analytics.py:40 emits the lowercase-plural f-string form). */
  private val intervalRe =
    """(?i)INTERVAL\s+'(\d+)(?:\s*(year|month|week|day|hour|minute|second)s?)?'(?:\s+(year|month|week|day|hour|minute|second)s?)?""".r

  def rewriteIntervals(sql: String): String =
    intervalRe.replaceAllIn(sql, m => {
      val unit = Option(m.group(2)).orElse(Option(m.group(3)))
      unit match {
        case Some(u) => java.util.regex.Matcher.quoteReplacement(
          s"INTERVAL ${m.group(1)} ${u.toUpperCase.stripSuffix("S")}")
        case None => java.util.regex.Matcher.quoteReplacement(m.matched)
      }
    })

  /** `ROW (` → `(` — the reference's own patch for its mapping view
    * (kpi_summary.py:123-124). */
  def rewriteRowConstructor(sql: String): String =
    sql.replaceAll("""(?i)\bROW\s*\(""", "(")

  /** Full pipeline. Pure; order matters (casts before intervals is safe). */
  def translate(sql: String): String = {
    var s = sql
    s = rewritePathRelations(s)
    s = rewriteSubstringFrom(s)
    s = rewriteCasts(s)
    s = rewriteIntervals(s)
    s = rewriteRowConstructor(s)
    s
  }

  // --- API-layer guards, mirroring sql_endpoints.py ----------------------

  /** SQL firewall (sql_endpoints.py:42-69): read-only statements only.
    * EXECUTE/MERGE added beyond the reference list: Spark 4 supports
    * EXECUTE IMMEDIATE and MERGE INTO, and `\bEXEC\b` does not match
    * EXECUTE — defense-in-depth beyond the SELECT/WITH prefix check. */
  private val banned = Seq("DROP", "DELETE", "INSERT", "UPDATE", "CREATE",
    "ALTER", "TRUNCATE", "GRANT", "REVOKE", "EXEC", "EXECUTE", "MERGE")

  def validateReadOnly(sql: String): Either[String, String] = {
    val upper = sql.toUpperCase
    val trimmed = upper.trim
    if (!(trimmed.startsWith("SELECT") || trimmed.startsWith("WITH")))
      Left("Only SELECT queries are allowed")
    else banned.find(k => upper.matches(s"(?s).*\\b$k\\b.*")) match {
      case Some(k) => Left(s"Query contains banned keyword: $k")
      case None => Right(sql)
    }
  }

  /** LIMIT injection if absent (sql_endpoints.py:144-147). Mirrors the
    * reference: skip whenever LIMIT appears ANYWHERE in the query — a
    * trailing `LIMIT 5 OFFSET 10` or a subquery LIMIT must not receive a
    * second, syntactically invalid LIMIT suffix. */
  def injectLimit(sql: String, limit: Int): String =
    if (sql.toUpperCase.matches("(?s).*\\bLIMIT\\b.*")) sql
    else sql.trim.stripSuffix(";") + s" LIMIT $limit"
}
