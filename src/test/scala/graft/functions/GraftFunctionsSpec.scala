package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

class GraftFunctionsSpec extends SparkSpec {

  test("ArrayIntDot: eval, codegen, SQL call, and null handling agree") {
    GraftFunctions.register(spark)
    val df = spark.createDataFrame(Seq(
      (Seq(1L, 2L, 3L), Seq(4L, 5L, 6L)),
      (Seq(10L, -2L), Seq(3L, 7L)))).toDF("a", "b")
    val viaColumn = df.select(GraftFunctions.intDot(col("a"), col("b")).as("d"))
      .collect().map(_.getLong(0))
    assert(viaColumn.sameElements(Array(32L, 16L)))
    df.createOrReplaceTempView("vecs")
    val viaSql = spark.sql(s"SELECT ${GraftFunctions.IntDotName}(a, b) FROM vecs")
      .collect().map(_.getLong(0))
    assert(viaSql.sameElements(Array(32L, 16L)))
    // nulls propagate
    val n = spark.sql(s"SELECT ${GraftFunctions.IntDotName}(NULL, array(1L))")
      .collect()(0)
    assert(n.isNullAt(0))
    // mismatched lengths use the common prefix
    val p = spark.sql(s"SELECT ${GraftFunctions.IntDotName}(array(2L,3L,4L), array(5L))")
      .collect()(0).getLong(0)
    assert(p == 10L)
  }

  test("GraftExtensions installs the function at session build time") {
    val s2 = SparkSession.builder()
      .master("local[2]")
      .appName("ext-test")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try {
      val v = s2.sql(s"SELECT ${GraftFunctions.IntDotName}(array(2L, 2L), array(3L, 4L))")
        .collect()(0).getLong(0)
      assert(v == 14L)
    } finally () // shared-JVM session: do not stop (would kill the shared context)
  }

  test("type checking rejects non-long arrays") {
    GraftFunctions.register(spark)
    val e = intercept[Exception] {
      spark.sql(s"SELECT ${GraftFunctions.IntDotName}(array('x'), array('y'))").collect()
    }
    assert(e.getMessage.contains("array<bigint>"))
  }
}
