package graft.utils

import graft.SparkSpec
import graft.fixtures.CurFixture

class UtilsSpec extends SparkSpec {

  test("validator flags credits, counts nulls, scores quality in one pass") {
    val rep = Validators.validateCostData(CurFixture.df(spark))
    assert(rep.rowCount == CurFixture.rows.size)
    // one Credit + one SavingsPlanNegation row per month are negative
    assert(rep.negativeCostRows == 2 * CurFixture.months.size)
    assert(rep.duplicateRows == 0)
    assert(rep.qualityScore > 80.0 && rep.qualityScore <= 100.0)
    assert(rep.issues.exists(_.contains("negative")))
    assert(rep.maxUsageStartDate.nonEmpty)
  }

  test("validator reports missing required columns") {
    val rep = Validators.validateCostData(CurFixture.df(spark).drop("line_item_unblended_cost"))
    assert(rep.qualityScore == 0.0)
    assert(rep.issues.exists(_.contains("missing required column")))
  }

  test("exporters round-trip csv/json/markdown") {
    val df = spark.createDataFrame(Seq(("a", 1.5), ("b,with comma", 2.0))).toDF("name", "v")
    val csv = Exporters.toCsvString(df)
    assert(csv.startsWith("name,v"))
    assert(csv.contains("\"b,with comma\""))
    val json = Exporters.toJsonString(df)
    assert(json.startsWith("[{") && json.contains("\"name\":\"a\""))
    val md = Exporters.toMarkdown(df)
    assert(md.contains("| name | v |"))
  }

  test("excel sink writes a valid OOXML package with typed cells") {
    val df = spark.createDataFrame(Seq(("a & <b>", 1.5), ("plain", 2.0))).toDF("name", "v")
    val path = java.nio.file.Files.createTempDirectory("xlsx").resolve("out.xlsx").toString
    Exporters.writeExcel(df, path, sheetName = "Costs")
    val zf = new java.util.zip.ZipFile(path)
    try {
      import scala.jdk.CollectionConverters._
      val names = zf.entries().asScala.map(_.getName).toSet
      assert(names == Set("[Content_Types].xml", "_rels/.rels",
        "xl/workbook.xml", "xl/_rels/workbook.xml.rels", "xl/worksheets/sheet1.xml"))
      def read(n: String): String = new String(
        zf.getInputStream(zf.getEntry(n)).readAllBytes(),
        java.nio.charset.StandardCharsets.UTF_8)
      val sheet = read("xl/worksheets/sheet1.xml")
      assert(sheet.contains("<t>name</t>")) // header row
      assert(sheet.contains("<t>a &amp; &lt;b&gt;</t>")) // XML escaping
      assert(sheet.contains("""<c r="B2"><v>1.5</v></c>""")) // numeric cell
      assert(read("xl/workbook.xml").contains("""name="Costs""""))
    } finally zf.close()
  }

  test("excel sink column references extend past Z") {
    val cols = (1 to 30).map(i => s"c$i")
    val row = org.apache.spark.sql.Row.fromSeq((1 to 30).map(_.toDouble))
    val df = spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](java.util.List.of(row)),
      org.apache.spark.sql.types.StructType(cols.map(c =>
        org.apache.spark.sql.types.StructField(c, org.apache.spark.sql.types.DoubleType))))
    val path = java.nio.file.Files.createTempDirectory("xlsx2").resolve("wide.xlsx").toString
    Exporters.writeExcel(df, path)
    val zf = new java.util.zip.ZipFile(path)
    try {
      val sheet = new String(
        zf.getInputStream(zf.getEntry("xl/worksheets/sheet1.xml")).readAllBytes(),
        java.nio.charset.StandardCharsets.UTF_8)
      assert(sheet.contains("""<c r="Z1"""")) // 26th column
      assert(sheet.contains("""<c r="AA1"""")) // 27th rolls over
      assert(sheet.contains("""<c r="AD2"><v>30.0</v></c>""")) // last data cell
    } finally zf.close()
  }

  test("profiler records stats and failures") {
    val p = new Performance.QueryProfiler
    p.profile("q")(1 + 1)
    p.profile("q")(2 + 2)
    intercept[RuntimeException] { p.profile("q")(throw new RuntimeException("x")) }
    val s = p.snapshot("q")
    assert(s.count == 2 && s.failures == 1)
    assert(s.successRate > 0.6 && s.successRate < 0.7)
  }

  test("ttl cache: hit within ttl, recompute after expiry, sql normalization") {
    var t = 0L
    var computes = 0
    val c = new Performance.TtlCache[Int](ttlSeconds = 10, clock = () => t)
    def get(): Int = c.getOrElseUpdate("SELECT  1") { computes += 1; computes }
    assert(get() == 1)
    assert(c.getOrElseUpdate("select 1") { computes += 1; computes } == 1) // normalized hit
    t = 11000
    assert(get() == 2)
  }

  test("profiling listener records tagged query executions") {
    val p = new Performance.QueryProfiler
    val listener = new Performance.ProfilingListener(p)
    spark.listenerManager.register(listener)
    try {
      spark.conf.set("spark.graft.queryTag", "tagged_count")
      spark.range(100).count()
      // listener events are delivered asynchronously
      var waited = 0
      while (!p.snapshot.contains("tagged_count") && waited < 50) {
        Thread.sleep(100); waited += 1
      }
      assert(p.snapshot.contains("tagged_count"))
      assert(p.snapshot("tagged_count").count >= 1)
    } finally {
      spark.conf.unset("spark.graft.queryTag")
      spark.listenerManager.unregister(listener)
    }
  }

  test("partitioned parquet sink writes the export directory layout") {
    val out = java.nio.file.Files.createTempDirectory("part_out").toString
    Exporters.writePartitioned(
      CurFixture.df(spark).withColumnRenamed("billing_period", "BILLING_PERIOD"),
      out, "BILLING_PERIOD")
    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory).map(_.getName)
    assert(dirs.count(_.startsWith("BILLING_PERIOD=")) == CurFixture.months.size)
    assert(spark.read.parquet(out).count() == CurFixture.rows.size)
  }

  test("error taxonomy classifies spark failures") {
    import graft.engine.GraftEngine
    def errOf(sql: String): String =
      GraftEngine.classifyError(intercept[Exception](spark.sql(sql).collect()))
    assert(errOf("SELECT * FROM definitely_not_a_table") == "TABLE_NOT_FOUND")
    assert(errOf("SELEC wat") == "SQL_SYNTAX_ERROR")
    CurFixture.df(spark).createOrReplaceTempView("CUR")
    assert(errOf("SELECT no_such_column FROM CUR") == "COLUMN_NOT_FOUND")
  }

  test("formatters") {
    assert(Formatters.currency(1234.567) == "$1,234.57")
    assert(Formatters.percent(12.34) == "12.3%")
    assert(Formatters.bytesHuman(1536L * 1024) == "1.5 MB")
    assert(Formatters.compact(1234567.0) == "1.2M")
  }
}
