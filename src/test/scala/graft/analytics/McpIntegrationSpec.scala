package graft.analytics

import graft.SparkSpec
import graft.fixtures.CurFixture
import java.time.LocalDate

class McpIntegrationSpec extends SparkSpec {

  def mcp: McpIntegration = {
    CurFixture.df(spark).createOrReplaceTempView("CUR")
    new McpIntegration(spark, "CUR", LocalDate.of(2025, 7, 15))
  }

  test("resources and tools catalogs") {
    val m = mcp
    assert(m.listResources().size == 6)
    assert(m.listTools().map(_("name")).toSet == Set("sql_query", "ask"))
  }

  test("ask routes NL questions to modules") {
    val m = mcp
    assert(m.ask("any unusual spend spikes?").exists(_.columns.contains("anomaly_type")))
    assert(m.ask("top services by spend").exists(_.columns.contains("service_name")))
    assert(m.ask("show idle resources").exists(_.columns.contains("potential_savings")))
  }

  test("sql tool enforces the firewall and limit") {
    val m = mcp
    assert(m.sqlQuery("DROP TABLE CUR").isLeft)
    val r = m.sqlQuery("SELECT line_item_product_code FROM CUR", maxRows = 5)
    assert(r.exists(_.count() == 5))
  }

  test("advanced golden-shape queries produce the reference schemas") {
    CurFixture.df(spark).createOrReplaceTempView("CUR")
    val f = new FinOps(spark, "CUR", LocalDate.of(2025, 7, 15))
    val a1 = f.spend.advancedQuery1()
    assert(a1.columns.toSeq == Seq("billing_period", "product_servicecode",
      "current_cost", "previous_cost", "cost_change_percent"))
    // 5%-growth fixture: every non-first month shows a positive change
    val changed = a1.filter(a1("cost_change_percent").isNotNull).collect()
    assert(changed.nonEmpty)
    val a2 = f.spend.advancedQuery2()
    assert(a2.columns.toSeq == Seq("line_item_usage_account_id", "total_cost",
      "cost_percentage", "cost_rank"))
    val rows = a2.collect()
    assert(rows.map(_.getAs[Long]("cost_rank")).head == 1L)
    assert(math.abs(rows.map(_.getAs[Double]("cost_percentage")).sum - 100.0) < 0.1)
  }
}
