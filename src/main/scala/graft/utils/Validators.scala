package graft.utils

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data-quality checks over the billing fact table, mirroring
  * `DataValidator.validate_cost_data` (reference validators.py:13-110) —
  * the one place the reference uses DataFrame ops directly (SURVEY.md
  * §2.11). Spark-first: all counts come back from ONE aggregation job
  * (a single pass over the data) instead of the reference's one-job-per-
  * check loop — the difference between 1 and ~3+N scans at 100 TB.
  */
object Validators {

  final case class ValidationReport(
      rowCount: Long,
      negativeCostRows: Long,
      nullCounts: Map[String, Long],
      maxUsageStartDate: Option[java.sql.Timestamp],
      duplicateRows: Long,
      qualityScore: Double,
      issues: Seq[String])

  /** Columns the reference requires (validators.py:36). */
  val RequiredColumns: Seq[String] =
    Seq("line_item_unblended_cost", "line_item_usage_start_date")

  def validateCostData(
      df: DataFrame,
      costCol: String = "line_item_unblended_cost",
      dateCol: String = "line_item_usage_start_date"): ValidationReport = {
    val missing = RequiredColumns.filterNot(df.columns.contains)
    if (missing.nonEmpty)
      return ValidationReport(0, 0, Map.empty, None, 0, 0.0,
        missing.map(c => s"missing required column: $c"))

    val checkCols = df.columns.toSeq
    // one pass: negatives + per-column null counts + max date (validators.py:45-67)
    val aggs =
      Seq(count(lit(1)).as("_n"),
        count(when(col(costCol) < 0, 1)).as("_neg"),
        max(col(dateCol)).as("_maxd")) ++
        checkCols.map(c => count(when(col(c).isNull, 1)).as(s"_null_$c"))
    val row = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    val n = row.getAs[Long]("_n")
    val neg = row.getAs[Long]("_neg")
    val nulls = checkCols.map(c => c -> row.getAs[Long](s"_null_$c")).toMap
    // duplicate check (validators.py:81): n - distinct. Spark cannot run
    // set operations over MAP columns (the CUR `product` map), so those are
    // canonicalized to JSON for the comparison only.
    val dedupeCols = df.schema.fields.toSeq.map { f =>
      f.dataType match {
        case _: org.apache.spark.sql.types.MapType => to_json(col(f.name)).as(f.name)
        case _ => col(f.name)
      }
    }
    val dups = n - df.select(dedupeCols: _*).dropDuplicates().count()

    val issues = Seq.newBuilder[String]
    if (neg > 0) issues += s"$neg rows with negative $costCol (credits?)"
    nulls.collect { case (c, k) if k > 0 => issues += s"$c has $k nulls" }
    if (dups > 0) issues += s"$dups duplicate rows"

    // quality score (validators.py:98-110): start at 100, deduct per issue class
    var score = 100.0
    if (n == 0) score = 0.0
    else {
      if (neg > 0) score -= math.min(20.0, 100.0 * neg / n)
      val nullRate = if (nulls.isEmpty) 0.0 else nulls.values.sum.toDouble / (n.toDouble * nulls.size)
      score -= math.min(30.0, nullRate * 100.0)
      if (dups > 0) score -= math.min(20.0, 100.0 * dups / n)
    }
    ValidationReport(n, neg, nulls,
      Option(row.getAs[java.sql.Timestamp]("_maxd")),
      dups, math.max(score, 0.0), issues.result())
  }
}
