package graft.views

import graft.SparkSpec
import graft.engine.GraftEngine
import graft.fixtures.CurFixture
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}
import java.time.LocalDate

/** The strongest available parity check: execute the REFERENCE'S OWN view
  * SQL (read at test time from the read-only snapshot, never copied into
  * this repo) through the dialect translator against the CUR fixture, and
  * compare aggregate results with the Spark-first DataFrame
  * reimplementation in [[KpiViews]]. */
class ReferenceViewParitySpec extends SparkSpec {

  val asOf: LocalDate = LocalDate.of(2025, 7, 15)
  val refSql = "/root/reference/cur2_views/level_2_dependent/kpi_instance_all.sql"

  test("reference kpi_instance_all.sql runs through the translator and matches KpiViews") {
    assume(Files.exists(Paths.get(refSql)), "reference snapshot not present")
    CurFixture.df(spark).createOrReplaceTempView("CUR")
    KpiViews.registerInstanceMapping(spark)

    // reference SQL (strip the CREATE VIEW comment header like
    // kpi_summary.py:116-146 does)
    val raw = new String(Files.readAllBytes(Paths.get(refSql)), "UTF-8")
      .linesIterator.filterNot(_.trim.startsWith("--")).mkString("\n")
    val engine = new GraftEngine(spark, referenceDate = Some(asOf))
    val refDf = engine.query(raw)

    val mine = KpiViews.registerKpiInstanceAll(spark, asOf)

    // compare EVERY numeric column both sides share — a hand-picked list
    // previously let three derived-column divergences slip through
    val numeric = Set[org.apache.spark.sql.types.DataType](
      org.apache.spark.sql.types.DoubleType)
    val cols = refDf.schema.fields.filter(f => numeric(f.dataType)).map(_.name)
      .toSeq.intersect(mine.schema.fields.filter(f => numeric(f.dataType)).map(_.name).toSeq)
    assert(cols.size > 60, s"expected the full derived-column surface, got ${cols.size}")
    def agg(df: org.apache.spark.sql.DataFrame): Map[String, Double] = {
      val r = df.agg(cols.map(c => sum(col(c)).as(c)).head, cols.map(c => sum(col(c)).as(c)).tail: _*)
        .collect()(0)
      cols.map(c => c -> (if (r.isNullAt(r.fieldIndex(c))) 0.0 else r.getAs[Double](c))).toMap
    }
    val refAgg = agg(refDf)
    val myAgg = agg(mine)
    cols.foreach { c =>
      assert(math.abs(refAgg(c) - myAgg(c)) < 1e-6,
        s"$c: reference=${refAgg(c)} mine=${myAgg(c)}")
    }
    // same grain: row counts match
    assert(refDf.count() == mine.count())
  }

  val refTrackerSql = "/root/reference/cur2_views/level_3_final/kpi_tracker.sql"

  test("reference kpi_tracker.sql over our level-1/2 views matches the DataFrame tracker") {
    assume(Files.exists(Paths.get(refTrackerSql)), "reference snapshot not present")
    CurFixture.df(spark).createOrReplaceTempView("CUR")
    KpiViews.registerAll(spark, asOf) // registers levels 1-3 as temp views

    val raw = graft.engine.SqlTranslator.applyReferenceViewPatches(
      new String(Files.readAllBytes(Paths.get(refTrackerSql)), "UTF-8")
        .linesIterator.filterNot(_.trim.startsWith("--")).mkString("\n"))
    val engine = new GraftEngine(spark, referenceDate = Some(asOf))
    val refDf = engine.query(raw)
    val mine = spark.table("kpi_tracker")

    val cols = Seq("spend_all_cost", "ec2_all_cost", "ec2_spot_cost",
      "ec2_graviton_cost", "ec2_amd_cost", "rds_all_cost", "lambda_all_cost",
      "dynamodb_all_cost", "compute_all_cost", "ebs_gp2_cost", "ebs_gp3_cost",
      "ebs_gp3_potential_savings", "ebs_snapshot_cost", "s3_all_storage_cost",
      "ec2_spot_potential_savings", "ec2_graviton_potential_savings")
    def agg(df: org.apache.spark.sql.DataFrame): Map[String, Double] = {
      val r = df.agg(cols.map(c => sum(col(c)).as(c)).head, cols.map(c => sum(col(c)).as(c)).tail: _*)
        .collect()(0)
      cols.map(c => c -> (if (r.isNullAt(r.fieldIndex(c))) 0.0 else r.getAs[Double](c))).toMap
    }
    val refAgg = agg(refDf)
    val myAgg = agg(mine)
    cols.foreach { c =>
      assert(math.abs(refAgg(c) - myAgg(c)) < 1e-6,
        s"$c: reference=${refAgg(c)} mine=${myAgg(c)}")
    }
    assert(refDf.count() == mine.count())
  }

  test("reference kpi_tracker_restructured.sql (CTE variant, LIMIT 1) runs and agrees") {
    val p = "/root/reference/cur2_views/level_3_final/kpi_tracker_restructured.sql"
    assume(Files.exists(Paths.get(p)), "reference snapshot not present")
    CurFixture.df(spark).createOrReplaceTempView("CUR")
    KpiViews.registerAll(spark, asOf)
    val raw = new String(Files.readAllBytes(Paths.get(p)), "UTF-8")
      .linesIterator.filterNot(_.trim.startsWith("--")).mkString("\n")
    val row = new GraftEngine(spark, referenceDate = Some(asOf)).query(raw).collect()
    assert(row.length == 1) // trailing LIMIT 1 (kpi_tracker_restructured.sql:203)
    val spend = row(0).getAs[Double]("spend_all_cost")
    // the single row is one (month, account) cell of our tracker
    val mine = spark.table("kpi_tracker")
      .select("spend_all_cost").collect().map(_.getDouble(0)).toSet
    assert(mine.exists(v => math.abs(v - spend) < 1e-6),
      s"restructured spend $spend not found among tracker rows")
  }
}
