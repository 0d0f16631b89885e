package graft.operators

import graft.SparkSpec
import graft.queries.Tables
import org.apache.spark.sql.functions._

class BucketingSpec extends SparkSpec {

  test("same-bucketed join plans without exchanges and matches the plain join") {
    val li = Tables.load(spark, sfDir, "lineitem")
      .select("l_orderkey", "l_extendedprice")
    val ord = Tables.load(spark, sfDir, "orders")
      .select("o_orderkey", "o_totalprice")
    Bucketing.writeBucketed(li, "li_bucketed", "l_orderkey", 8)
    Bucketing.writeBucketed(ord, "ord_bucketed", "o_orderkey", 8)

    // disable broadcast so the join exercises the bucketed SMJ path (at
    // test scale Spark would otherwise broadcast the small side)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val (plan, row) =
      try {
        val joined = Bucketing.coLocatedJoin(spark, "li_bucketed", "ord_bucketed",
          "l_orderkey", "o_orderkey")
        val agg = joined.agg(count(lit(1)).as("n"), sum("l_extendedprice").as("s"))
        val r = agg.collect()(0)
        (agg.queryExecution.executedPlan.toString, r)
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)

    // a sort-merge join with ZERO hash-partition shuffles: bucket layout
    // satisfies the join's distribution requirement on both sides
    assert(plan.contains("SortMergeJoin"), s"not an SMJ:\n${plan.take(2000)}")
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join still shuffles:\n${plan.take(2500)}")
    assert(plan.contains("Bucketed: true"))

    val plain = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .agg(count(lit(1)), sum("l_extendedprice")).collect()(0)
    assert(row.getLong(0) == plain.getLong(0))
    assert(math.abs(row.getDouble(1) - plain.getDouble(1)) < 1e-6)
  }

  test("samePath: the compact/rebuild live-location guard across schemes and spellings") {
    // same location, different spellings → equal
    assert(Bucketing.samePath(spark, "/tmp/graft_sp/x", "file:/tmp/graft_sp/x"))
    assert(Bucketing.samePath(spark, "/tmp/graft_sp/x/", "/tmp/graft_sp/x"))
    // genuinely different locations → unequal
    assert(!Bucketing.samePath(spark, "/tmp/graft_sp/x", "/tmp/graft_sp/y"))
    // suffix coincidence must NOT match (the old endsWith guard's bug class)
    assert(!Bucketing.samePath(spark, "/a/root/idx/vecs", "/root/idx/vecs"))
    // scheme-qualified remote location vs same-suffix local path: the
    // java.io.File comparison this replaced silently never matched the
    // remote side — a rebuild could target the live remote index
    spark.sparkContext.hadoopConfiguration.set("fs.mock.impl",
      classOf[graft.sources.MockRemoteFileSystem].getName)
    assert(!Bucketing.samePath(spark, "mock://tmp/graft_sp/x", "/tmp/graft_sp/x"))
    assert(Bucketing.samePath(spark, "mock://tmp/graft_sp/x", "mock://tmp/graft_sp/x"))
  }
}
