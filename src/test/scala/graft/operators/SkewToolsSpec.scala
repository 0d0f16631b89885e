package graft.operators

import graft.SparkSpec
import graft.queries.Tables
import org.apache.spark.sql.functions._

class SkewToolsSpec extends SparkSpec {

  test("salted join returns exactly the plain join's rows") {
    val li = Tables.load(spark, sfDir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey"), col("l_extendedprice"))
    val part = Tables.load(spark, sfDir, "part")
      .select(col("p_partkey").as("l_partkey"), col("p_brand"))
    val plain = li.join(part, Seq("l_partkey"))
      .agg(count(lit(1)), sum("l_extendedprice")).collect()(0)
    val salted = SkewTools.saltedJoin(li, part, "l_partkey", saltFactor = 8)
      .agg(count(lit(1)), sum("l_extendedprice")).collect()(0)
    assert(plain.getLong(0) == salted.getLong(0))
    assert(math.abs(plain.getDouble(1) - salted.getDouble(1)) < 1e-6)
  }

  test("salted sum equals direct groupBy sum") {
    val li = Tables.load(spark, sfDir, "lineitem")
    val direct = li.groupBy("l_returnflag")
      .agg(sum("l_quantity").as("total"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val salted = SkewTools.saltedSum(li, "l_returnflag", "l_quantity", saltFactor = 16)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(direct.keySet == salted.keySet)
    direct.foreach { case (k, v) => assert(math.abs(v - salted(k)) < 1e-6) }
  }

  test("key histogram surfaces the heaviest keys first") {
    val rows = SkewTools.keyHistogram(
      Tables.load(spark, sfDir, "lineitem"), "l_returnflag", topK = 3).collect()
    assert(rows.length == 3)
    val counts = rows.map(_.getAs[Long]("n"))
    assert(counts.sameElements(counts.sortBy(-_: Long)))
  }
}
