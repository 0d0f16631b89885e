package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Exact integer dot product of two `array<long>` columns: Σ a(i)*b(i)
  * over the common prefix length.
  *
  * Why a custom Catalyst Expression (SURVEY.md §7.4 "custom where built-ins
  * fall short"): the declarative formulation
  * `aggregate(zip_with(a, b, _*_), 0L, _+_)` is a higher-order function —
  * Spark evaluates HOF lambdas interpretively per element with boxing and
  * blocks whole-stage codegen, measured ~7.6 µs per 64-dim pair on this
  * box. This expression generates a primitive long loop (doGenCode) that
  * stays inside WholeStageCodegen — ~50× faster, which is the difference
  * between an O(candidates) ANN re-rank being free or dominating the job.
  *
  * Semantics are pure integer arithmetic — no rounding, no floating point —
  * so there is nothing to keep in sync with the DuckDB oracle (the
  * fixed-point quantization of float vectors happens once, upstream, in
  * declarative `round()`).
  *
  * Input contract: array ELEMENTS must be non-null (a null ARGUMENT is
  * fine — nullIntolerant gives a null result). The type check accepts
  * `array<bigint>` regardless of containsNull, and the loop reads each
  * slot with `getLong`, so a null element contributes an UNDEFINED term
  * (typically 0) instead of failing — the hot loop deliberately skips a
  * per-element null branch; every producer in this library derives its
  * arrays via `transform(round(...))` over non-null floats.
  * ([[CellTop2]] shares this contract.)
  */
case class ArrayIntDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType): Boolean = t match {
      case ArrayType(LongType, _) => true
      case org.apache.spark.sql.types.NullType => true // NULL literal → null result
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<bigint> arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  override def dataType: DataType = LongType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      acc += x.getLong(i) * y.getLong(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $a.getLong($i) * $b.getLong($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayIntDot =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "array_int_dot"
}
