package graft.queries

import graft.SparkSpec

/** Smoke + shape tests for every oracle-checked query at sf0.001.
  * Value-level correctness is enforced by the driver's DuckDB oracle gate
  * (tools/check_oracle.py replicates it locally at sf0.01).
  */
class RelationalSpec extends SparkSpec {

  test("every declared query has an oracle or is explicitly oracle-free") {
    val missing = Relational.queries.keySet -- Relational.oracle.keySet
    assert(missing.isEmpty, s"queries without oracle: $missing")
  }

  for ((name, fn) <- Relational.queries.toSeq.sortBy(_._1)) {
    test(s"$name runs and returns rows") {
      val df = fn(spark, sfDir)
      val n = df.count()
      assert(n > 0, s"$name returned no rows")
    }
  }

  test("q38 as-of join: matched view is the latest at-or-before the purchase") {
    import org.apache.spark.sql.functions._
    val ev = Tables.load(spark, sfDir, "events").cache()
    val out = Relational.q38AsofJoin(spark, sfDir).limit(50).collect()
    val views = ev.filter(col("event_type") === "view")
      .select("user_id", "event_id", "ts").collect()
      .groupBy(_.getAs[Long]("user_id"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select("event_id", "ts").collect()
      .map(r => r.getAs[Long]("event_id") -> r.getAs[java.sql.Timestamp]("ts")).toMap
    out.foreach { r =>
      val pts = purchases(r.getAs[Long]("purchase_id"))
      val candidates = views.getOrElse(r.getAs[Long]("user_id"), Array.empty)
        .filter(v => !v.getAs[java.sql.Timestamp]("ts").after(pts))
      val expected: Option[Long] =
        if (candidates.isEmpty) None
        else Some(candidates.maxBy(_.getAs[java.sql.Timestamp]("ts").getTime).getAs[Long]("event_id"))
      assert(Option(r.get(3)).map(_.asInstanceOf[Long]) == expected)
    }
  }

  test("approx_count_distinct scale variant lands within 5% of exact") {
    val r = Relational.approxDistinct(spark, sfDir).collect()(0)
    val approx = r.getLong(0).toDouble
    val exact = r.getLong(1).toDouble
    assert(math.abs(approx - exact) / exact < 0.05, s"approx=$approx exact=$exact")
  }

  test("q01 aggregates are exact fixed-point values") {
    val rows = Relational.q01Agg(spark, sfDir).collect()
    assert(rows.length == 6)
    // sum_qty values are exact multiples of 0.01 by construction
    rows.foreach { r =>
      val sq = r.getAs[Double]("sum_qty")
      assert(math.abs(sq * 100 - math.rint(sq * 100)) < 1e-6)
    }
  }

  test("q02 top-k is ordered desc") {
    val rev = Relational.q02TopkParts(spark, sfDir).collect().map(_.getAs[Double]("part_revenue"))
    assert(rev.sameElements(rev.sortBy(-_: Double)))
    assert(rev.length == 10)
  }

  test("q08 rank never exceeds 3 and starts at 1 per nation") {
    val rows = Relational.q08WindowRank(spark, sfDir).collect()
    val byNation = rows.groupBy(_.getAs[Int]("c_nationkey"))
    byNation.values.foreach { rs =>
      val rnks = rs.map(_.getAs[Long]("rnk"))
      assert(rnks.min == 1L && rnks.max <= 3L)
    }
  }

  test("q09 percentages sum to ~100") {
    val pcts = Relational.q09PctOfTotal(spark, sfDir).collect().map(_.getAs[Double]("pct"))
    assert(math.abs(pcts.sum - 100.0) < 0.01)
  }

  test("q15/q16 anti and semi partition the customer set consistently") {
    val anti = Relational.q15AntiJoin(spark, sfDir).count()
    val semi = spark.read.parquet(s"$sfDir/customer.parquet").count() - anti
    // semi-join on the *recent orders* predicate complements the anti set
    val semiDirect = {
      import org.apache.spark.sql.functions._
      val cust = Tables.load(spark, sfDir, "customer")
      val recent = Tables.load(spark, sfDir, "orders")
        .filter(col("o_orderdate") >= lit("2001-01-01").cast("timestamp"))
      cust.join(recent, col("c_custkey") === col("o_custkey"), "left_semi").count()
    }
    assert(semiDirect == semi)
  }

  test("q97 binned range join == naive inequality join (plan has no nested loop)") {
    import org.apache.spark.sql.functions._
    val winUs = 300L * 1000000L
    val ev = Tables.load(spark, sfDir, "events")
    // naive definition: the raw inequality join Spark would plan as a
    // BroadcastNestedLoopJoin — fine at sf0.001, the semantic reference
    val a = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), unix_micros(col("ts")).as("a_us"))
    val b = ev.select(col("value"), unix_micros(col("ts")).as("us"))
    val naive = a.join(b, col("us") >= col("a_us") && col("us") < col("a_us") + lit(winUs))
      .groupBy("purchase_id")
      .agg(count(lit(1)).as("n_ev"),
        sum(round(col("value") * 100).cast("long")).as("fp"))
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    val df = Relational.q97RangeJoin(spark, sfDir)
    val got = df.collect()
      .map(r => (r.getLong(0), (r.getLong(1), math.round(r.getDouble(2) * 100)))).toMap
    assert(got == naive, {
      val diff = (got.keySet ++ naive.keySet).filter(k => got.get(k) != naive.get(k))
      s"range join mismatch on ${diff.take(5)}: got=${diff.take(5).map(got.get)} naive=${diff.take(5).map(naive.get)}"
    })
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"binned range join fell back to a nested loop:\n$plan")
  }

  test("q23 dialect translation produces same rows as plain Spark SQL") {
    Tables.load(spark, sfDir, "orders")
    val translated = Relational.q23Dialect(spark, sfDir).count()
    val direct = spark.sql(
      """SELECT o_orderkey FROM orders
        |WHERE o_orderdate >= TIMESTAMP '2001-01-01 00:00:00' - INTERVAL 6 MONTH""".stripMargin).count()
    assert(translated == direct)
  }
}
