package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Relational operator suite — one query per operator family in
  * SURVEY.md §2, re-expressed over the driver's TPC-H-ish tables, each with
  * a DuckDB oracle (see `oracle`). All implemented with the DataFrame API so
  * Catalyst owns the physical plan (pushdown, broadcast, AQE).
  *
  * Determinism contract with the oracle hash-compare:
  *  - floating SUMs use fixed-point aggregation (`fpsum`): per-row values
  *    are rounded at a decimal scale, summed as exact Longs, then divided
  *    back — immune to accumulation-order nondeterminism across
  *    partitions/runs (a plain double sum can flip a rounded 2dp value when
  *    it lands on a .005 boundary). At 100 TB swap the Long accumulator for
  *    sum(DECIMAL(38,s)) — same idea, no overflow.
  *  - every query has a total ORDER BY on a unique key set;
  *  - integer-valued computed columns are BIGINT on both sides;
  *  - truncated dates are cast to DATE on both sides.
  */
object Relational {

  private def t(s: SparkSession, dir: String, n: String) = Tables.load(s, dir, n)

  private def revenue: Column = col("l_extendedprice") * (lit(1.0) - col("l_discount"))

  /** Fixed-point deterministic SUM (see scaladoc above). */
  private def fpsum(c: Column, scale: Int): Column = {
    val f = math.pow(10, scale)
    sum(round(c * f).cast("long")) / f
  }

  /** Fixed-point SUM over a window — exact Long arithmetic under the hood. */
  private def fpsumOver(c: Column, scale: Int, w: org.apache.spark.sql.expressions.WindowSpec): Column = {
    val f = math.pow(10, scale)
    sum(round(c * f).cast("long")).over(w) / f
  }

  /** Oracle-side fixed-point SUM snippet (DuckDB SQL). */
  private def oSum(expr: String, scale: Int): String = {
    val f = "1" + ("0" * scale) + ".0"
    s"sum(CAST(round(($expr)*$f) AS BIGINT))/$f"
  }

  /** Deterministic sample stddev from EXACT fixed-point sums (ADVICE round 1):
    * values are scaled to integers, Σx and Σx² accumulate exactly
    * (decimal(38,0) — order-independent), and the final
    * sqrt((nΣx²−(Σx)²)/(n(n−1)))/10^s is a fixed sequence of IEEE double ops,
    * identical in Spark and DuckDB. A plain `stddev` would leave ULP noise
    * from summation order and could flip a rounded digit vs the hash oracle.
    */
  private def fpStddev(c: Column, scale: Int): Column = {
    val f = math.pow(10, scale)
    val x = round(c * f).cast("decimal(38,0)")
    val n = count(lit(1))
    val s1 = sum(x)
    val s2 = sum(x * x)
    sqrt((n * s2 - s1 * s1).cast("double") /
      (n * (n - lit(1))).cast("double")) / f
  }

  /** Deterministic mean from the exact fixed-point sum: (Σfp/10^s)/n with a
    * fixed op order mirrored in the oracle SQL. */
  private def fpAvg(c: Column, scale: Int): Column = {
    val f = math.pow(10, scale)
    (sum(round(c * f).cast("long")).cast("double") / f) /
      count(lit(1)).cast("double")
  }

  /** Oracle-side twins of fpStddev/fpAvg (DuckDB SQL, HUGEINT for Σx²). */
  private def oStddev(expr: String, scale: Int): String = {
    val f = "1" + ("0" * scale) + ".0"
    val x = s"CAST(round(($expr)*$f) AS BIGINT)"
    s"sqrt(CAST(count(*)*sum(CAST($x AS HUGEINT)*$x) - sum(CAST($x AS HUGEINT))*sum(CAST($x AS HUGEINT)) AS DOUBLE)" +
      s"/CAST(count(*)*(count(*)-1) AS DOUBLE))/$f"
  }
  private def oAvg(expr: String, scale: Int): String = {
    val f = "1" + ("0" * scale) + ".0"
    s"(CAST(sum(CAST(round(($expr)*$f) AS BIGINT)) AS DOUBLE)/$f)/CAST(count(*) AS DOUBLE)"
  }

  // ---- A1/A2/A4: pricing-summary aggregation (covers SUM/AVG/COUNT) ----
  def q01Agg(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        fpsum(col("l_quantity"), 2).as("sum_qty"),
        fpsum(col("l_extendedprice"), 2).as("sum_base_price"),
        fpsum(revenue, 4).as("sum_disc_price"),
        (fpsum(col("l_quantity"), 2) / count(lit(1))).as("avg_qty"),
        (fpsum(col("l_discount"), 2) / count(lit(1))).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  // ---- O1/O2: top-k over aggregate (TakeOrderedAndProject) -------------
  def q02TopkParts(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy(col("l_partkey"))
      .agg(fpsum(revenue, 4).as("part_revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("part_revenue").desc, col("l_partkey"))
      .limit(10)

  // ---- P2/P7/P1: filter + projection, pushed to the parquet scan -------
  def q03Filter(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1998-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1999-01-01").cast("timestamp") &&
        col("l_discount") > 0.05 && col("l_quantity") < lit(10.0))
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_extendedprice"), col("l_shipdate").cast("date").as("ship_date"))
      .orderBy("l_orderkey", "l_linenumber")

  // ---- P9/A7: CASE WHEN classification + conditional aggregation ------
  def q04CaseWhen(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        fpsum(when(col("l_quantity") < 10, col("l_extendedprice")).otherwise(0.0), 2).as("small_rev"),
        fpsum(when(col("l_quantity").between(10, 30), col("l_extendedprice")).otherwise(0.0), 2).as("mid_rev"),
        fpsum(when(col("l_quantity") > 30, col("l_extendedprice")).otherwise(0.0), 2).as("big_rev"),
        count(when(col("l_discount") === 0.0, lit(1))).as("full_price_items"))
      .orderBy("l_returnflag")

  // ---- J2: fact ⋈ broadcast dims (explicit broadcast hints) -----------
  def q05JoinBroadcast(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    val part = t(s, dir, "part")
    val supp = t(s, dir, "supplier")
    li.join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("p_brand"), col("s_name"))
      .agg(fpsum(revenue, 4).as("brand_rev"), count(lit(1)).as("n_items"))
      .orderBy("p_brand", "s_name")
  }

  // ---- J1-style multi-way join: revenue by nation (the flagship) ------
  def q06MultiJoin(s: SparkSession, dir: String): DataFrame = {
    val cust = t(s, dir, "customer")
    val ord = t(s, dir, "orders")
    val li = t(s, dir, "lineitem")
    val nat = t(s, dir, "nation")
    val reg = t(s, dir, "region")
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1999-01-01").cast("timestamp"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(fpsum(revenue, 4).as("nation_rev"),
        countDistinct(col("o_orderkey")).as("n_orders"))
      .orderBy("r_name", "n_name")
  }

  // ---- W1/W2/W5: LAG MoM + YoY over monthly totals --------------------
  def q07WindowLag(s: SparkSession, dir: String): DataFrame = {
    val monthly = t(s, dir, "orders")
      .groupBy(date_trunc("month", col("o_orderdate")).cast("date").as("month"))
      .agg(fpsum(col("o_totalprice"), 2).as("raw_total"))
    // GLOBAL window is safe HERE ONLY because the input is one row per
    // month (bounded by the calendar, not the data) — a global window
    // over raw rows would funnel everything through one task at scale
    val w = Window.orderBy("month")
    monthly
      .withColumn("prev", lag(col("raw_total"), 1).over(w))
      .withColumn("prev12", lag(col("raw_total"), 12).over(w))
      .select(
        col("month"),
        col("raw_total").as("total"),
        (col("raw_total") - col("prev")).as("mom_change"),
        (lit(100.0) * (col("raw_total") - col("prev12")) /
          nullif(col("prev12"), lit(0.0))).as("yoy_pct"))
      .orderBy("month")
  }

  // ---- W4: RANK over aggregate, partitioned, top-3 per group ----------
  def q08WindowRank(s: SparkSession, dir: String): DataFrame = {
    val spend = t(s, dir, "customer")
      .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"))
      .groupBy(col("c_nationkey"), col("c_custkey"))
      .agg(fpsum(col("o_totalprice"), 2).as("total"))
    val w = Window.partitionBy("c_nationkey").orderBy(col("total").desc, col("c_custkey"))
    spend.withColumn("rnk", rank().over(w).cast("long"))
      .filter(col("rnk") <= 3)
      .orderBy("c_nationkey", "rnk", "c_custkey")
  }

  // ---- J4/A13: percent-of-total via scalar total (cross join) ---------
  def q09PctOfTotal(s: SparkSession, dir: String): DataFrame = {
    val ord = t(s, dir, "orders")
    val total = ord.agg(fpsum(col("o_totalprice"), 2).as("grand_total"))
    ord.groupBy(col("o_orderpriority"))
      .agg(fpsum(col("o_totalprice"), 2).as("raw"))
      .crossJoin(broadcast(total))
      .select(col("o_orderpriority"),
        col("raw").as("total"),
        (lit(100.0) * col("raw") / col("grand_total")).as("pct"))
      .orderBy("o_orderpriority")
  }

  // ---- A9: HAVING post-aggregate filter -------------------------------
  def q10Having(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_orders"), fpsum(col("o_totalprice"), 2).as("total"))
      .filter(col("n_orders") > 12)
      .orderBy("o_custkey")

  // ---- A3/A12: DISTINCT + COUNT(DISTINCT) -----------------------------
  def q11DistinctCounts(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .groupBy(col("o_orderstatus"))
      .agg(countDistinct(col("o_custkey")).as("n_customers"),
        count(lit(1)).as("n_orders"))
      .orderBy("o_orderstatus")

  def q12Distinct(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .select(col("l_returnflag"), col("l_linestatus")).distinct()
      .orderBy("l_returnflag", "l_linestatus")

  // ---- A11/A5/A6: aggregate-of-aggregate + stddev/min/max -------------
  def q13AggOfAgg(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .groupBy(col("o_custkey")).agg(fpsum(col("o_totalprice"), 2).as("cust_total"))
      .agg(
        (fpsum(col("cust_total"), 2) / count(lit(1))).as("avg_cust_spend"),
        round(fpStddev(col("cust_total"), 2), 2).as("sd_cust_spend"),
        min(col("cust_total")).as("min_cust_spend"),
        max(col("cust_total")).as("max_cust_spend"),
        count(lit(1)).as("n_customers"))

  // ---- §2.8: scalar function coverage ---------------------------------
  def q14ScalarFns(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "part")
      .select(
        col("p_partkey"),
        lower(col("p_name")).as("name_lower"),
        split_part(col("p_name"), lit(" "), lit(1)).as("first_word"),
        concat(col("p_brand"), lit(":"), col("p_type")).as("brand_type"),
        regexp_extract(col("p_brand"), "#(\\d+)", 1).as("brand_num"),
        (round(col("p_retailprice") * 1.1 * 1000.0).cast("long") / 1000.0).as("taxed_price"),
        abs(col("p_size") - 25).as("size_dist"),
        coalesce(nullif(col("p_type"), lit("STANDARD")), lit("NONE")).as("type_or_none"))
      .orderBy("p_partkey")

  // ---- anti join (NOT EXISTS) -----------------------------------------
  def q15AntiJoin(s: SparkSession, dir: String): DataFrame = {
    val cust = t(s, dir, "customer")
    val recent = t(s, dir, "orders")
      .filter(col("o_orderdate") >= lit("2001-01-01").cast("timestamp"))
    cust.join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
      .orderBy("c_custkey")
  }

  // ---- semi join (EXISTS) ---------------------------------------------
  def q16SemiJoin(s: SparkSession, dir: String): DataFrame = {
    val cust = t(s, dir, "customer")
    val big = t(s, dir, "orders").filter(col("o_totalprice") > 450000.0)
    cust.join(big, col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
      .orderBy("c_custkey")
  }

  // ---- §2.7: UNION ALL / INTERSECT ------------------------------------
  def q17Union(s: SparkSession, dir: String): DataFrame = {
    val ord = t(s, dir, "orders")
    val high = ord.filter(col("o_totalprice") > 400000.0)
      .select(col("o_orderkey"), lit("high_value").as("tier"))
    val urgent = ord.filter(col("o_orderpriority") === "1-URGENT" && col("o_totalprice") > 300000.0)
      .select(col("o_orderkey"), lit("urgent_big").as("tier"))
    high.unionAll(urgent).orderBy("o_orderkey", "tier")
  }

  def q18Intersect(s: SparkSession, dir: String): DataFrame = {
    val ord = t(s, dir, "orders")
    val in1995 = ord.filter(year(col("o_orderdate")) === 1995).select(col("o_custkey"))
    val in2000 = ord.filter(year(col("o_orderdate")) === 2000).select(col("o_custkey"))
    in1995.intersect(in2000).orderBy("o_custkey")
  }

  // ---- ROLLUP (free beyond reference; SURVEY §2.4 note) ---------------
  def q19Rollup(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(fpsum(col("l_quantity"), 2).as("qty"), count(lit(1)).as("n"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("flag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("status"),
        col("qty"), col("n"))
      .orderBy("flag", "status")

  // ---- J5: stats join + z-score anomalies over events -----------------
  def q20Zscore(s: SparkSession, dir: String): DataFrame = {
    val daily = t(s, dir, "events")
      .groupBy(col("event_type"), date_trunc("day", col("ts")).cast("date").as("day"))
      .agg(fpsum(col("value"), 2).as("daily_total"))
    val stats = daily.groupBy(col("event_type").as("et"))
      .agg(fpAvg(col("daily_total"), 2).as("mean_t"),
        fpStddev(col("daily_total"), 2).as("sd_t"))
    val z = (col("daily_total") - col("mean_t")) / nullif(col("sd_t"), lit(0.0))
    daily.join(broadcast(stats), col("event_type") === col("et"))
      .filter(abs(z) > 1.5)
      .select(col("event_type"), col("day"),
        col("daily_total").as("daily_total"),
        round(z, 4).as("zscore"))
      .orderBy("event_type", "day")
  }

  // ---- time-series bucketing over the events table --------------------
  def q21EventsHourly(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), fpsum(col("value"), 2).as("total"))
      .orderBy("hour", "event_type")

  // ---- gap-filled time series (spine + left join) ---------------------
  /** Hourly event totals with the GAPS FILLED: a complete hour spine from
    * min to max via `sequence`, left-joined to the sparse aggregate with
    * zero-fill. The operator dashboards/forecasters need on sparse
    * billing/event data — a missing hour must read as 0, not as absent.
    * Scale: the spine generates from ONE aggregated (min, max) row and is
    * broadcast; the fact side aggregates before the join. */
  def q46GapFill(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
      .select(date_trunc("hour", col("ts")).as("hour"), col("value"))
    val hourly = ev.groupBy("hour")
      .agg(count(lit(1)).as("n"), fpsum(col("value"), 2).as("total"))
    val spine = ev.agg(min("hour").as("h0"), max("hour").as("h1"))
      .select(explode(expr("sequence(h0, h1, interval 1 hour)")).as("hour"))
    spine.join(hourly, Seq("hour"), "left")
      .select(col("hour"),
        coalesce(col("n"), lit(0L)).as("n"),
        coalesce(col("total"), lit(0.0)).as("total"))
      .orderBy("hour")
  }

  // ---- sessionization (batch session_window vs gaps-and-islands) ------
  /** Per-user 30-minute-gap sessions via Spark's native `session_window`.
    * The DuckDB oracle computes the SAME sessions with the classic
    * gaps-and-islands construction (lag + cumulative new-session flags) —
    * hash-matching them proves Spark's session semantics (merge while
    * next.ts < last.ts + gap; session end = last.ts + gap) against an
    * independent implementation. Scale: one shuffle on user_id; the state
    * analogue streams in EventStream.userSessions. */
  def q47Sessions(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .groupBy(session_window(col("ts"), "30 minutes").as("sw"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), fpsum(col("value"), 2).as("total_value"))
      .select(col("user_id"),
        col("sw.start").as("session_start"), col("sw.end").as("session_end"),
        col("n_events"), col("total_value"))
      .orderBy("user_id", "session_start")

  // ---- running window frame (ROWS BETWEEN) ----------------------------
  def q22Running(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t(s, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey"),
        col("o_orderdate").cast("date").as("od"),
        fpsumOver(col("o_totalprice"), 2, w).as("running_total"))
      .orderBy("o_custkey", "od", "o_orderkey")
  }

  // ---- dialect-translated SQL through the engine (SURVEY §7.1) --------
  /** The SQL below is written in the REFERENCE dialect (`::` casts,
    * `INTERVAL '6 months'`) and run through SqlTranslator; the oracle runs
    * the identical text natively in DuckDB. */
  val dialectSql: String =
    """SELECT o_orderkey,
      |       o_orderdate::DATE AS od,
      |       o_totalprice::FLOAT AS price_f,
      |       upper(o_orderpriority) AS pri
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '2001-01-01 00:00:00' - INTERVAL '6 months'
      |ORDER BY o_orderkey""".stripMargin

  def q23Dialect(s: SparkSession, dir: String): DataFrame = {
    Tables.load(s, dir, "orders")
    new graft.engine.GraftEngine(s).query(dialectSql)
  }

  // ---- exact percentiles (interpolated — matches DuckDB quantile_cont) -
  def q35Percentiles(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        expr("percentile(l_quantity, 0.5)").as("median_qty"),
        expr("percentile(l_quantity, 0.9)").as("p90_qty"),
        expr("percentile(l_extendedprice, array(0.25, 0.75))").as("price_iqr"))
      .select(col("l_returnflag"), col("median_qty"), col("p90_qty"),
        round(element_at(col("price_iqr"), 2) - element_at(col("price_iqr"), 1), 2).as("price_iqr_width"))
      .orderBy("l_returnflag")

  // ---- CUBE grouping sets (beyond reference; SURVEY §2.4 note) ---------
  def q36Cube(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), fpsum(col("o_totalprice"), 2).as("total"))
      .select(
        coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        col("n"), col("total"))
      .orderBy("status", "priority")

  /** Scale variant of A3 (SURVEY §2.4): HyperLogLog distinct counts for
    * the 100 TB path. Not oracle-checked — sketch implementations differ
    * across engines by design; `SimilaritySpec`-style spec asserts the
    * estimate lands within 5% of exact. */
  def approxDistinct(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .agg(approx_count_distinct(col("l_partkey"), 0.02).as("approx_parts"),
        countDistinct(col("l_partkey")).as("exact_parts"))

  // ---- as-of join (time-series; absent from both reference and Spark) --
  /** For every `purchase` event, the user's most recent `view` event at or
    * before it (LEFT semantics: purchases with no prior view keep null).
    *
    * Spark has no ASOF JOIN operator; per the custom-operator preference
    * order this is COMPOSED from existing ops (union + partitioned window
    * + last_value ignoreNulls) rather than a custom SparkPlan: the
    * composition shuffles each side once on user_id and sorts within
    * partitions — the same cost profile a native as-of operator would
    * have, with AQE/codegen intact. The DuckDB oracle uses its native
    * ASOF LEFT JOIN, so the test proves the composition implements the
    * standard semantics. */
  def q38AsofJoin(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts"), lit(0).as("src"),
        col("event_id").as("view_id"), lit(null).cast("long").as("purchase_id"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), lit(1).as("src"),
        lit(null).cast("long").as("view_id"), col("event_id").as("purchase_id"))
    // views sort before purchases at equal ts => inclusive v.ts <= p.ts;
    // view_id as the final key resolves same-timestamp view ties
    // deterministically (highest view_id wins) instead of leaving the
    // match to partition-internal row order
    val w = Window.partitionBy("user_id").orderBy("ts", "src", "view_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    views.unionAll(purchases)
      .withColumn("matched_view_id", last(col("view_id"), ignoreNulls = true).over(w))
      .filter(col("src") === 1)
      .select(col("purchase_id"), col("user_id"),
        col("ts").cast("date").as("purchase_day"), col("matched_view_id"))
      .orderBy("purchase_id")
  }

  // ---- range (interval) join (absent from both reference and Spark) ----
  /** Concurrency report: for every `purchase` event, how many events of ANY
    * type (any user) fire inside the 5-minute window starting at it, plus
    * their exact fixed-point value total — the load-attribution question
    * ("what was in flight around each purchase") that needs a pure
    * time-interval join with no equi key.
    *
    * Spark plans a raw inequality join as BroadcastNestedLoopJoin —
    * O(|A|·|B|) compare volume and a broadcast-memory hazard; DuckDB plans
    * the identical SQL as a specialized IEJoin, which is why the oracle can
    * state the naive predicate directly. The scalable Spark shape is the
    * classic BINNED equi-join: bucket time into bins exactly one window
    * length wide (bin = unix_micros div 300e6 — integer `div`, not double
    * `/`, which loses sub-200ns precision on 2^53-scale micros). A window
    * starting in bin k ends strictly inside bin k+1, so it can only reach
    * events whose bin ∈ {k, k+1}: the probe side keeps its ONE bin and the
    * ~5× smaller anchor side explodes to its two candidate bins. The
    * equi-join on bin is then an ordinary shuffled join — AQE-broadcastable
    * when the anchor side is small, skew-split like any hot join key when a
    * traffic spike makes one bin heavy — refined by the exact
    * microsecond-precision window predicate. Each qualifying pair appears
    * exactly once (a probe row has one bin), so no dedup pass; every anchor
    * matches at least itself, so inner semantics lose no anchors.
    * Plan-asserted (RelationalSpec): no BroadcastNestedLoopJoin, no
    * CartesianProduct. */
  def q97RangeJoin(s: SparkSession, dir: String): DataFrame = {
    val winUs = 300L * 1000000L // 5-minute window == bin width, in micros
    val ev = t(s, dir, "events")
    val probe = ev.select(col("event_id"), col("value"),
      unix_micros(col("ts")).as("us"))
      .withColumn("bin", expr(s"us div $winUs"))
    val anchors = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"),
        unix_micros(col("ts")).as("a_us"))
      .withColumn("bin", explode(array(expr(s"a_us div $winUs"),
        expr(s"a_us div $winUs + 1"))))
    anchors.join(probe, Seq("bin"))
      .filter(col("us") >= col("a_us") && col("us") < col("a_us") + lit(winUs))
      .groupBy(col("purchase_id"))
      .agg(count(lit(1)).as("n_ev"), fpsum(col("value"), 2).as("total"))
      .orderBy("purchase_id")
  }

  // ---- full window-function suite (beyond reference's LAG/RANK) --------
  def q39WindowSuite(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_orderpriority")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    t(s, dir, "orders")
      .filter(col("o_orderdate") >= lit("2001-01-01").cast("timestamp"))
      .select(col("o_orderpriority"), col("o_orderkey"),
        ntile(4).over(w).cast("long").as("quartile"),
        round(percent_rank().over(w), 6).as("pct_rank"),
        round(cume_dist().over(w), 6).as("cume"),
        first(col("o_orderkey")).over(w).as("top_order"),
        row_number().over(w).cast("long").as("rn"))
      .orderBy("o_orderpriority", "rn")
  }

  // ---- JSON property extraction over events (§2.8 json functions) ------

  /** Per-event-type stats of the JSON `props` payload's `k` field — the
    * semi-structured-column path (§2.8: the reference's CUR exports carry
    * JSON-bearing string columns the same way). `get_json_object` is the
    * codegen'd JsonPath evaluator, applied in the scan projection, so the
    * parse is a zero-shuffle map stage feeding ONE two-phase aggregate —
    * at 100 TB the JSON never moves, only (event_type, k) integer pairs.
    * All-integer outputs; DISTINCT count is exact (k's domain is small by
    * construction — at an unbounded domain swap in approx_count_distinct
    * as the documented scale variant). */
  def q95JsonProps(s: SparkSession, dir: String): DataFrame = {
    val k = get_json_object(col("props"), "$.k").cast("long")
    t(s, dir, "events")
      .select(col("event_type"), k.as("k"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"),
        min(col("k")).as("min_k"), max(col("k")).as("max_k"),
        countDistinct(col("k")).as("n_distinct_k"))
      .orderBy("event_type")
  }

  val oracleQ95: String =
    """SELECT event_type, CAST(count(*) AS BIGINT) AS n,
      |  CAST(sum(k) AS BIGINT) AS sum_k, min(k) AS min_k, max(k) AS max_k,
      |  CAST(count(DISTINCT k) AS BIGINT) AS n_distinct_k
      |FROM (SELECT event_type, CAST(props->>'k' AS BIGINT) AS k FROM events)
      |GROUP BY event_type ORDER BY event_type""".stripMargin

  // =====================================================================
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_agg" -> q01Agg _,
    "q02_topk_parts" -> q02TopkParts _,
    "q03_filter" -> q03Filter _,
    "q04_case_when" -> q04CaseWhen _,
    "q05_join_broadcast" -> q05JoinBroadcast _,
    "q06_multi_join" -> q06MultiJoin _,
    "q07_window_lag" -> q07WindowLag _,
    "q08_window_rank" -> q08WindowRank _,
    "q09_pct_of_total" -> q09PctOfTotal _,
    "q10_having" -> q10Having _,
    "q11_distinct_counts" -> q11DistinctCounts _,
    "q12_distinct" -> q12Distinct _,
    "q13_agg_of_agg" -> q13AggOfAgg _,
    "q14_scalar_fns" -> q14ScalarFns _,
    "q15_anti_join" -> q15AntiJoin _,
    "q16_semi_join" -> q16SemiJoin _,
    "q17_union" -> q17Union _,
    "q18_intersect" -> q18Intersect _,
    "q19_rollup" -> q19Rollup _,
    "q20_zscore" -> q20Zscore _,
    "q21_events_hourly" -> q21EventsHourly _,
    "q46_gapfill" -> q46GapFill _,
    "q47_sessions" -> q47Sessions _,
    "q22_running" -> q22Running _,
    "q23_dialect" -> q23Dialect _,
    "q35_percentiles" -> q35Percentiles _,
    "q36_cube" -> q36Cube _,
    "q38_asof_join" -> q38AsofJoin _,
    "q97_range_join" -> q97RangeJoin _,
    "q39_window_suite" -> q39WindowSuite _,
    "q95_json_props" -> q95JsonProps _,
  )

  val oracle: Map[String, String] = Map(
    "q01_agg" ->
      s"""SELECT l_returnflag, l_linestatus,
         | ${oSum("l_quantity", 2)} AS sum_qty,
         | ${oSum("l_extendedprice", 2)} AS sum_base_price,
         | ${oSum("l_extendedprice*(1-l_discount)", 4)} AS sum_disc_price,
         | ${oSum("l_quantity", 2)}/count(*) AS avg_qty,
         | ${oSum("l_discount", 2)}/count(*) AS avg_disc,
         | count(*) AS count_order
         |FROM lineitem GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q02_topk_parts" ->
      s"""SELECT l_partkey,
         | ${oSum("l_extendedprice*(1-l_discount)", 4)} AS part_revenue,
         | count(*) AS n_items
         |FROM lineitem GROUP BY l_partkey
         |ORDER BY part_revenue DESC, l_partkey LIMIT 10""".stripMargin,
    "q03_filter" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice,
        | CAST(l_shipdate AS DATE) AS ship_date
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
        |  AND l_shipdate <  TIMESTAMP '1999-01-01 00:00:00'
        |  AND l_discount > 0.05 AND l_quantity < 10
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q04_case_when" ->
      s"""SELECT l_returnflag,
         | ${oSum("CASE WHEN l_quantity < 10 THEN l_extendedprice ELSE 0 END", 2)} AS small_rev,
         | ${oSum("CASE WHEN l_quantity BETWEEN 10 AND 30 THEN l_extendedprice ELSE 0 END", 2)} AS mid_rev,
         | ${oSum("CASE WHEN l_quantity > 30 THEN l_extendedprice ELSE 0 END", 2)} AS big_rev,
         | count(CASE WHEN l_discount = 0 THEN 1 END) AS full_price_items
         |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q05_join_broadcast" ->
      s"""SELECT p_brand, s_name,
         | ${oSum("l_extendedprice*(1-l_discount)", 4)} AS brand_rev,
         | count(*) AS n_items
         |FROM lineitem
         |JOIN part ON l_partkey = p_partkey
         |JOIN supplier ON l_suppkey = s_suppkey
         |GROUP BY p_brand, s_name ORDER BY p_brand, s_name""".stripMargin,
    "q06_multi_join" ->
      s"""SELECT r_name, n_name,
         | ${oSum("l_extendedprice*(1-l_discount)", 4)} AS nation_rev,
         | count(DISTINCT o_orderkey) AS n_orders
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation ON c_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
         |  AND o_orderdate <  TIMESTAMP '1999-01-01 00:00:00'
         |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin,
    "q07_window_lag" ->
      s"""WITH monthly AS (
         |  SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
         |         ${oSum("o_totalprice", 2)} AS raw_total
         |  FROM orders GROUP BY 1)
         |SELECT month, raw_total AS total,
         | raw_total - lag(raw_total,1) OVER (ORDER BY month) AS mom_change,
         | 100.0*(raw_total - lag(raw_total,12) OVER (ORDER BY month))
         |   / nullif(lag(raw_total,12) OVER (ORDER BY month),0) AS yoy_pct
         |FROM monthly ORDER BY month""".stripMargin,
    "q08_window_rank" ->
      s"""WITH spend AS (
         |  SELECT c_nationkey, c_custkey, ${oSum("o_totalprice", 2)} AS total
         |  FROM customer JOIN orders ON c_custkey = o_custkey
         |  GROUP BY c_nationkey, c_custkey)
         |SELECT c_nationkey, c_custkey, total, rnk FROM (
         |  SELECT *, CAST(rank() OVER (PARTITION BY c_nationkey
         |    ORDER BY total DESC, c_custkey) AS BIGINT) AS rnk FROM spend) x
         |WHERE rnk <= 3 ORDER BY c_nationkey, rnk, c_custkey""".stripMargin,
    "q09_pct_of_total" ->
      s"""SELECT o_orderpriority,
         | ${oSum("o_totalprice", 2)} AS total,
         | 100.0*(${oSum("o_totalprice", 2)})
         |   / (SELECT ${oSum("o_totalprice", 2)} FROM orders) AS pct
         |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q10_having" ->
      s"""SELECT o_custkey, count(*) AS n_orders,
         | ${oSum("o_totalprice", 2)} AS total
         |FROM orders GROUP BY o_custkey HAVING count(*) > 12
         |ORDER BY o_custkey""".stripMargin,
    "q11_distinct_counts" ->
      """SELECT o_orderstatus, count(DISTINCT o_custkey) AS n_customers,
        | count(*) AS n_orders
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "q12_distinct" ->
      """SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q13_agg_of_agg" ->
      s"""WITH per_cust AS (
         |  SELECT o_custkey, ${oSum("o_totalprice", 2)} AS cust_total
         |  FROM orders GROUP BY o_custkey)
         |SELECT ${oSum("cust_total", 2)}/count(*) AS avg_cust_spend,
         | round(${oStddev("cust_total", 2)},2) AS sd_cust_spend,
         | min(cust_total) AS min_cust_spend,
         | max(cust_total) AS max_cust_spend,
         | count(*) AS n_customers
         |FROM per_cust""".stripMargin,
    "q14_scalar_fns" ->
      """SELECT p_partkey,
        | lower(p_name) AS name_lower,
        | split_part(p_name, ' ', 1) AS first_word,
        | concat(p_brand, ':', p_type) AS brand_type,
        | regexp_extract(p_brand, '#(\d+)', 1) AS brand_num,
        | CAST(round(p_retailprice * 1.1 * 1000.0) AS BIGINT)/1000.0 AS taxed_price,
        | abs(p_size - 25) AS size_dist,
        | coalesce(nullif(p_type,'STANDARD'), 'NONE') AS type_or_none
        |FROM part ORDER BY p_partkey""".stripMargin,
    "q15_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey
        |    AND o_orderdate >= TIMESTAMP '2001-01-01 00:00:00')
        |ORDER BY c_custkey""".stripMargin,
    "q16_semi_join" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_totalprice > 450000)
        |ORDER BY c_custkey""".stripMargin,
    "q17_union" ->
      """SELECT o_orderkey, 'high_value' AS tier FROM orders WHERE o_totalprice > 400000
        |UNION ALL
        |SELECT o_orderkey, 'urgent_big' AS tier FROM orders
        |  WHERE o_orderpriority = '1-URGENT' AND o_totalprice > 300000
        |ORDER BY o_orderkey, tier""".stripMargin,
    "q18_intersect" ->
      """SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
        |INTERSECT
        |SELECT o_custkey FROM orders WHERE year(o_orderdate) = 2000
        |ORDER BY o_custkey""".stripMargin,
    "q19_rollup" ->
      s"""SELECT coalesce(l_returnflag,'ALL') AS flag,
         | coalesce(l_linestatus,'ALL') AS status,
         | ${oSum("l_quantity", 2)} AS qty, count(*) AS n
         |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
         |ORDER BY flag, status""".stripMargin,
    "q20_zscore" ->
      s"""WITH daily AS (
         |  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
         |         ${oSum("value", 2)} AS daily_total
         |  FROM events GROUP BY 1, 2),
         |stats AS (
         |  SELECT event_type AS et, ${oAvg("daily_total", 2)} AS mean_t,
         |         ${oStddev("daily_total", 2)} AS sd_t
         |  FROM daily GROUP BY 1)
         |SELECT event_type, day,
         | daily_total AS daily_total,
         | round((daily_total - mean_t)/nullif(sd_t,0),4) AS zscore
         |FROM daily JOIN stats ON event_type = et
         |WHERE abs((daily_total - mean_t)/nullif(sd_t,0)) > 1.5
         |ORDER BY event_type, day""".stripMargin,
    "q21_events_hourly" ->
      s"""SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour, event_type,
         | count(*) AS n, ${oSum("value", 2)} AS total
         |FROM events GROUP BY 1, 2 ORDER BY hour, event_type""".stripMargin,
    "q46_gapfill" ->
      s"""WITH ev AS (
         |  SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour, value FROM events),
         |hourly AS (
         |  SELECT hour, count(*) AS n, ${oSum("value", 2)} AS total
         |  FROM ev GROUP BY hour),
         |bounds AS (SELECT min(hour) AS h0, max(hour) AS h1 FROM ev),
         |spine AS (
         |  SELECT unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour FROM bounds)
         |SELECT s.hour, coalesce(h.n, 0) AS n, coalesce(h.total, 0.0) AS total
         |FROM spine s LEFT JOIN hourly h ON h.hour = s.hour
         |ORDER BY s.hour""".stripMargin,
    "q47_sessions" ->
      s"""WITH ev AS (
         |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value FROM events),
         |flagged AS (
         |  SELECT user_id, ts, value,
         |    CASE WHEN lag(ts) OVER w IS NULL
         |           OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
         |         THEN 1 ELSE 0 END AS is_new
         |  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
         |numbered AS (
         |  SELECT *, sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
         |    ROWS UNBOUNDED PRECEDING) AS sid
         |  FROM flagged)
         |SELECT user_id,
         |  min(ts) AS session_start,
         |  max(ts) + INTERVAL 30 MINUTE AS session_end,
         |  count(*) AS n_events, ${oSum("value", 2)} AS total_value
         |FROM numbered GROUP BY user_id, sid
         |ORDER BY user_id, session_start""".stripMargin,
    "q22_running" ->
      """SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS od,
        | sum(CAST(round(o_totalprice*100.0) AS BIGINT)) OVER (
        |   PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)/100.0 AS running_total
        |FROM orders ORDER BY o_custkey, od, o_orderkey""".stripMargin,
    "q23_dialect" -> dialectSql,
    "q35_percentiles" ->
      """SELECT l_returnflag,
        | quantile_cont(l_quantity, 0.5) AS median_qty,
        | quantile_cont(l_quantity, 0.9) AS p90_qty,
        | round(quantile_cont(l_extendedprice, 0.75) - quantile_cont(l_extendedprice, 0.25), 2) AS price_iqr_width
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q36_cube" ->
      s"""SELECT coalesce(o_orderstatus,'ALL') AS status,
         | coalesce(o_orderpriority,'ALL') AS priority,
         | count(*) AS n, ${oSum("o_totalprice", 2)} AS total
         |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
         |ORDER BY status, priority""".stripMargin,
    // the declarative as-of definition with an explicit tie-break (latest
    // ts, then highest event_id) — DuckDB's native ASOF LEFT JOIN picks an
    // arbitrary row among same-timestamp views, which would flake
    "q38_asof_join" ->
      """SELECT p.event_id AS purchase_id, p.user_id,
        | CAST(p.ts AS DATE) AS purchase_day,
        | (SELECT v.event_id FROM events v
        |   WHERE v.event_type = 'view' AND v.user_id = p.user_id
        |     AND v.ts <= p.ts
        |   ORDER BY v.ts DESC, v.event_id DESC LIMIT 1) AS matched_view_id
        |FROM events p
        |WHERE p.event_type = 'purchase'
        |ORDER BY purchase_id""".stripMargin,
    // the declarative interval-join definition — DuckDB's optimizer turns
    // this exact inequality predicate into an IEJoin; the Spark side
    // implements the same semantics with the binned equi-join
    "q97_range_join" ->
      s"""SELECT a.event_id AS purchase_id, count(*) AS n_ev,
         | ${oSum("b.value", 2)} AS total
         |FROM events a JOIN events b
         |  ON b.ts >= a.ts AND b.ts < a.ts + INTERVAL 5 MINUTE
         |WHERE a.event_type = 'purchase'
         |GROUP BY 1 ORDER BY purchase_id""".stripMargin,
    "q39_window_suite" ->
      """SELECT o_orderpriority, o_orderkey,
        | CAST(ntile(4) OVER w AS BIGINT) AS quartile,
        | round(percent_rank() OVER w, 6) AS pct_rank,
        | round(cume_dist() OVER w, 6) AS cume,
        | first_value(o_orderkey) OVER w AS top_order,
        | CAST(row_number() OVER w AS BIGINT) AS rn
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '2001-01-01 00:00:00'
        |WINDOW w AS (PARTITION BY o_orderpriority
        |             ORDER BY o_totalprice DESC, o_orderkey)
        |ORDER BY o_orderpriority, rn""".stripMargin,
    "q95_json_props" -> oracleQ95,
  )
}
