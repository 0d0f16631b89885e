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

  /** Idempotent; cheap enough to call before every query. */
  def register(spark: SparkSession): Unit = {
    val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    classic.sessionState.functionRegistry.createOrReplaceTempFunction(
      IntDotName, exprs => ArrayIntDot(exprs.head, exprs(1)), "built-in")
  }

  /** Exact Σ a(i)*b(i) over two array<long> columns (codegen'd). */
  def intDot(a: Column, b: Column): Column = call_function(IntDotName, a, b)
}
