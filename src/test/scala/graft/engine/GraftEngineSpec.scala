package graft.engine

import graft.SparkSpec
import java.nio.file.Files

class GraftEngineSpec extends SparkSpec {

  test("quoted parquet path used as a relation reads the file (S4 end-to-end)") {
    val out = Files.createTempDirectory("pathrel").toString + "/result.parquet"
    graft.queries.Tables.load(spark, sfDir, "region")
      .write.mode("overwrite").parquet(out)
    val engine = new GraftEngine(spark)
    val n = engine.query(s"SELECT count(*) AS n FROM '$out'").collect()(0).getLong(0)
    assert(n == 5)
    // joinable against a registered view (README.md:359-368 pattern)
    graft.queries.Tables.load(spark, sfDir, "nation")
    val joined = engine.query(
      s"""SELECT n_name FROM nation JOIN '$out' r ON nation.n_regionkey = r.r_regionkey
         |ORDER BY n_name LIMIT 3""".stripMargin).collect()
    assert(joined.length == 3)
  }

  test("sql file loading executes the file contents (S5 end-to-end)") {
    val f = Files.createTempFile("query", ".sql")
    Files.writeString(f,
      "SELECT r_regionkey::BIGINT AS rk FROM region ORDER BY rk")
    graft.queries.Tables.load(spark, sfDir, "region")
    val rows = new GraftEngine(spark).query(f.toString).collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(0L, 1L, 2L, 3L, 4L))
  }

  test("referenceDate pins relative windows") {
    graft.queries.Tables.load(spark, sfDir, "orders")
    // orders end 2001-08; pin inside a window that still sees them
    val pinned = new GraftEngine(spark,
      Some(java.time.LocalDate.of(2002, 1, 1)))
    val n = pinned.query(
      """SELECT count(*) AS n FROM orders
        |WHERE o_orderdate >= CURRENT_DATE - INTERVAL '12 months'""".stripMargin)
      .collect()(0).getLong(0)
    // a 2002-pinned window sees rows; a real-now window sees zero
    assert(n > 0)
    val real = new GraftEngine(spark).query(
      """SELECT count(*) AS n FROM orders
        |WHERE o_orderdate >= CURRENT_DATE - INTERVAL '12 months'""".stripMargin)
      .collect()(0).getLong(0)
    assert(real == 0)
  }
}
