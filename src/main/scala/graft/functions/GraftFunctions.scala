package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions.call_function

/** Registration + Column-level helpers for graft's custom Catalyst
  * expressions. Registered into the session's FunctionRegistry so they are
  * callable from both the DataFrame API (via [[intDot]]) and plain SQL —
  * the same route a SparkSessionExtensions.injectFunction would take, but
  * callable on an externally built session (Verify/Bench mains). */
object GraftFunctions {

  val IntDotName = "graft_int_dot"
  val BloomAggName = "graft_bloom_agg"
  val BloomContainsName = "graft_bloom_contains"
  val CellTop2Name = "graft_cell_top2"

  /** Idempotent; cheap enough to call before every query. */
  def register(spark: SparkSession): Unit = {
    val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    classic.sessionState.functionRegistry.createOrReplaceTempFunction(
      IntDotName, exprs => ArrayIntDot(exprs.head, exprs(1)), "built-in")
    // Spark's OWN bloom-filter expressions (the machinery behind runtime
    // row-level filtering), surfaced for explicit use: bits-bounded set
    // sketches that replace broadcast hash SETS with broadcast FILTERS
    // (no false negatives; caller-tuned false-positive rate).
    classic.sessionState.functionRegistry.createOrReplaceTempFunction(
      BloomAggName,
      exprs => new org.apache.spark.sql.catalyst.expressions.aggregate
        .BloomFilterAggregate(exprs(0), exprs(1), exprs(2), 0, 0),
      "built-in")
    classic.sessionState.functionRegistry.createOrReplaceTempFunction(
      BloomContainsName,
      exprs => org.apache.spark.sql.catalyst.expressions
        .BloomFilterMightContain(exprs(0), exprs(1)),
      "built-in")
    classic.sessionState.functionRegistry.createOrReplaceTempFunction(
      CellTop2Name, CellTop2.fromExprs(CellTop2Name, _), "built-in")
  }

  /** Exact Σ a(i)*b(i) over two array<long> columns (codegen'd). */
  def intDot(a: Column, b: Column): Column = call_function(IntDotName, a, b)

  /** Aggregate a LONG column into a serialized Bloom filter (binary). */
  def bloomAgg(h: Column, estItems: Long, numBits: Long): Column = {
    import org.apache.spark.sql.functions.lit
    call_function(BloomAggName, h, lit(estItems), lit(numBits))
  }

  /** Membership probe of a LONG value against a (foldable, usually
    * literal) serialized Bloom filter. */
  def bloomContains(filter: Column, h: Column): Column =
    call_function(BloomContainsName, filter, h)

  /** Top-2 nearest-centroid assignment of an `array<long>` fixed-point
    * vector column against a fixed centroid set, as one codegen'd
    * projection — `struct<c1, s1, c2, s2>` ([[CellTop2]]). The matrix and
    * norms ride through the registry as foldable literals and are folded
    * into the expression at analysis time. Norms are computed here with
    * the same driver-side double arithmetic the plan-literal regime uses,
    * so the two regimes score identically. Requires [[register]]. */
  def cellTop2(efp: Column, cents: IndexedSeq[Array[Long]]): Column = {
    import org.apache.spark.sql.functions.typedLit
    call_function(CellTop2Name, efp,
      typedLit(cents.map(_.toSeq)),
      typedLit(cents.map(c =>
        math.sqrt(c.map(x => x.toDouble * x.toDouble).sum))))
  }
}
