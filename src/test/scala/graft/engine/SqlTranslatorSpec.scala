package graft.engine

import org.scalatest.funsuite.AnyFunSuite

class SqlTranslatorSpec extends AnyFunSuite {

  test("`::` casts rewrite to CAST") {
    assert(SqlTranslator.rewriteCasts("SELECT a::DATE FROM t") ==
      "SELECT CAST(a AS DATE) FROM t")
    assert(SqlTranslator.rewriteCasts("SELECT resource_count::FLOAT AS rc") ==
      "SELECT CAST(resource_count AS FLOAT) AS rc")
    assert(SqlTranslator.rewriteCasts("SELECT x::DECIMAL(10,2) FROM t") ==
      "SELECT CAST(x AS DECIMAL(10,2)) FROM t")
    assert(SqlTranslator.rewriteCasts("SELECT f(a, b)::date FROM t") ==
      "SELECT CAST(f(a, b) AS date) FROM t")
  }

  test("SUBSTRING FROM regex rewrites to regexp_extract") {
    val in = """SELECT SUBSTRING(resource_tags FROM 'Project[":]*([^,}"]*)') FROM t"""
    val out = SqlTranslator.rewriteSubstringFrom(in)
    assert(out.contains("""regexp_extract(resource_tags, 'Project[":]*([^,}"]*)', 1)"""))
  }

  test("quoted parquet paths become parquet.`path` relations") {
    assert(SqlTranslator.rewritePathRelations("SELECT * FROM 'out/x.parquet'") ==
      "SELECT * FROM parquet.`out/x.parquet`")
    assert(SqlTranslator.rewritePathRelations(
      "SELECT * FROM a JOIN 'b.parquet' ON a.id = b.id").contains("JOIN parquet.`b.parquet`"))
    // string literal NOT in relation position is untouched
    assert(SqlTranslator.rewritePathRelations("SELECT 'x.parquet' AS name FROM t") ==
      "SELECT 'x.parquet' AS name FROM t")
  }

  test("interval forms normalize") {
    assert(SqlTranslator.rewriteIntervals("x - INTERVAL '3 months'") == "x - INTERVAL 3 MONTH")
    assert(SqlTranslator.rewriteIntervals("x - INTERVAL '6' MONTH") == "x - INTERVAL 6 MONTH")
    assert(SqlTranslator.rewriteIntervals("x - INTERVAL '1 day'") == "x - INTERVAL 1 DAY")
  }

  test("ROW ( patch from kpi_summary.py:123-124") {
    assert(SqlTranslator.rewriteRowConstructor("SELECT ROW ('a','b')") == "SELECT ('a','b')")
  }

  test("firewall blocks mutations, allows SELECT/WITH") {
    assert(SqlTranslator.validateReadOnly("SELECT 1").isRight)
    assert(SqlTranslator.validateReadOnly("WITH x AS (SELECT 1) SELECT * FROM x").isRight)
    assert(SqlTranslator.validateReadOnly("DROP TABLE t").isLeft)
    assert(SqlTranslator.validateReadOnly("SELECT 1; DELETE FROM t").isLeft)
    assert(SqlTranslator.validateReadOnly("UPDATE t SET a=1").isLeft)
  }

  test("LIMIT injection only when absent") {
    assert(SqlTranslator.injectLimit("SELECT * FROM t", 100) == "SELECT * FROM t LIMIT 100")
    assert(SqlTranslator.injectLimit("SELECT * FROM t LIMIT 5", 100) == "SELECT * FROM t LIMIT 5")
    assert(SqlTranslator.injectLimit("SELECT * FROM t;", 10) == "SELECT * FROM t LIMIT 10")
  }
}
