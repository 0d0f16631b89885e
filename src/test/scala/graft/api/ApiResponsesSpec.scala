package graft.api

import graft.SparkSpec
import graft.engine.GraftEngine
import graft.fixtures.CurFixture

class ApiResponsesSpec extends SparkSpec {

  def engine: GraftEngine = {
    CurFixture.df(spark).createOrReplaceTempView("CUR")
    new GraftEngine(spark)
  }

  test("success envelope carries rows, schema, counts, timing") {
    val json = ApiResponses.sqlQueryResponse(engine,
      "SELECT line_item_product_code, line_item_unblended_cost FROM CUR", maxRows = 5)
    assert(json.contains("\"success\":true"))
    assert(json.contains("\"row_count\":5"))
    assert(json.contains("\"line_item_product_code\":\"string\""))
    assert(json.contains("\"execution_time_ms\""))
  }

  test("firewall rejection produces a VALIDATION_ERROR envelope") {
    val json = ApiResponses.sqlQueryResponse(engine, "DROP TABLE CUR")
    assert(json.contains("\"success\":false"))
    assert(json.contains("VALIDATION_ERROR"))
  }

  test("execution failure maps through the error taxonomy") {
    val json = ApiResponses.sqlQueryResponse(engine,
      "SELECT nope_col FROM CUR")
    assert(json.contains("\"success\":false"))
    assert(json.contains("COLUMN_NOT_FOUND"))
    val json2 = ApiResponses.sqlQueryResponse(engine,
      "SELECT * FROM table_that_is_not_there")
    assert(json2.contains("TABLE_NOT_FOUND"))
  }

  test("timestamps serialize as strings in rows") {
    val json = ApiResponses.sqlQueryResponse(engine,
      "SELECT bill_billing_period_start_date AS bp FROM CUR", maxRows = 1)
    assert(json.contains("\"bp\":\"2024-06-01 00:00:00"))
  }
}
