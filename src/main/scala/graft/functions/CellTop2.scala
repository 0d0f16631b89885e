package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Top-2 nearest-centroid assignment of one `array<long>` fixed-point
  * vector against a FIXED centroid matrix, as a single codegen'd
  * projection: returns `struct<c1 int, s1 double, c2 int, s2 double>` —
  * the best and second-best cell with their scores
  * (`s = Σ efp(i)·cent_c(i) / ‖cent_c‖`, the cosine numerator scoring
  * [[graft.queries.VectorOps.assignCells]] has always used; `‖v‖` is a
  * common positive factor, so the argmax is the cosine argmax).
  *
  * Why a custom Catalyst Expression (SURVEY.md §7.4): above the plan-
  * literal regime (`kmeansLiteralMaxK`) the assignment used to fan each
  * vector out k ways through a broadcast cross join and take
  * `max(struct(score, -cell))` — but a struct aggregation buffer is
  * ineligible for HashAggregate, so Catalyst planned a SORT aggregate
  * over the fan-out: rows × k sorted per partition. At the r15 1000×-
  * decade index build (2M vectors × ~4000 cells) that is an 8-billion-row
  * sort whose spill filled the disk before the build's first table write.
  * This expression evaluates the same argmax as a primitive loop inside
  * WholeStageCodegen — zero fan-out, zero shuffle, zero sort; assignment
  * cost returns to O(rows × k × dims) multiply-adds, the floor.
  *
  * Semantics are pinned to the literal regime (spec: bit-equal): exact
  * long dot ([[ArrayIntDot]] arithmetic) over the common prefix length,
  * `score = dot.toDouble / norm` with the norm computed ON THE DRIVER by
  * the caller (same double arithmetic as `cellCentTable`), zero-norm
  * centroids score `Double.MinValue`, and ties resolve to the LOWEST cell
  * id at each rank (ascending scan keeps the first occurrence). With one
  * centroid, `c2 = -1` and `s2 = -∞` (callers route k < 2 elsewhere).
  *
  * The centroid matrix rides as constructor data (a reference object in
  * generated code, NOT k×dims plan literals) — plans stay small and the
  * matrix is shared per-JVM, the executor-side analogue of a broadcast.
  *
  * Input contract: array ELEMENTS must be non-null. The type check
  * accepts `array<bigint>` regardless of its containsNull flag (every
  * producer in this library derives efp via `transform(round(...))`
  * over non-null floats, which Spark often still types containsNull =
  * true), and the eval/codegen loops read each slot with `getLong` —
  * a null element would contribute an UNDEFINED term (typically 0) to
  * the score rather than fail. The hot loop deliberately does not pay
  * a per-element null branch; feed it null-bearing arrays and cell
  * assignment is silently wrong. ([[ArrayIntDot]] shares this
  * contract.)
  */
object CellTop2 {
  /** The registry/extension builder (shared so the temp-function and
    * SparkSessionExtensions registrations can never drift): the centroid
    * matrix and norms arrive as FOLDABLE literals and are consumed HERE,
    * at expression-build time — they become constructor data (a codegen
    * reference object), never plan literals. */
  def fromExprs(name: String, exprs: Seq[Expression]): CellTop2 = {
    require(exprs.length == 3 && exprs(1).foldable && exprs(2).foldable,
      s"$name(efp, cents, norms) needs literal cents/norms")
    val m = exprs(1).eval()
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val cents = (0 until m.numElements()).map(c =>
      m.getArray(c).toLongArray().toSeq)
    val n = exprs(2).eval()
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    CellTop2(exprs.head, cents, n.toDoubleArray().toSeq)
  }
}

case class CellTop2(child: Expression, cents: Seq[Seq[Long]],
    cns: Seq[Double]) extends UnaryExpression {

  require(cents.nonEmpty, "cellTop2 needs at least one centroid")
  require(cents.forall(_.length == cents.head.length),
    "cellTop2 centroids must share one dimensionality")
  require(cns.length == cents.length,
    "cellTop2 needs one precomputed norm per centroid")

  private val k = cents.length
  private val dims = cents.head.length

  // flattened row-major copy for the eval loops; @transient so the
  // expression serializes the (structurally comparable) Seqs only
  @transient private lazy val flat: Array[Long] = {
    val a = new Array[Long](k * dims)
    var c = 0
    while (c < k) {
      val row = cents(c)
      var i = 0
      while (i < dims) { a(c * dims + i) = row(i); i += 1 }
      c += 1
    }
    a
  }
  @transient private lazy val norms: Array[Double] = cns.toArray

  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case NullType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<bigint> argument, got ${t.simpleString}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("c1", IntegerType, nullable = false),
    StructField("s1", DoubleType, nullable = false),
    StructField("c2", IntegerType, nullable = false),
    StructField("s2", DoubleType, nullable = false)))

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = math.min(v.numElements(), dims)
    var s1 = Double.NegativeInfinity; var c1 = -1
    var s2 = Double.NegativeInfinity; var c2 = -1
    var c = 0
    while (c < k) {
      val cn = norms(c)
      val s =
        if (cn == 0.0) Double.MinValue
        else {
          var acc = 0L
          var i = 0
          val off = c * dims
          while (i < n) { acc += v.getLong(i) * flat(off + i); i += 1 }
          acc.toDouble / cn
        }
      if (s > s1) { s2 = s1; c2 = c1; s1 = s; c1 = c }
      else if (s > s2) { s2 = s; c2 = c }
      c += 1
    }
    InternalRow(c1, s1, c2, s2)
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val f = ctx.addReferenceObj("cellTop2Cents", flat, "long[]")
      val nm = ctx.addReferenceObj("cellTop2Norms", norms, "double[]")
      val c = ctx.freshName("c"); val i = ctx.freshName("i")
      val n = ctx.freshName("n"); val off = ctx.freshName("off")
      val acc = ctx.freshName("acc"); val s = ctx.freshName("s")
      val cn = ctx.freshName("cn")
      val s1 = ctx.freshName("s1"); val c1 = ctx.freshName("c1")
      val s2 = ctx.freshName("s2"); val c2 = ctx.freshName("c2")
      s"""
         |int $n = java.lang.Math.min($v.numElements(), $dims);
         |double $s1 = java.lang.Double.NEGATIVE_INFINITY; int $c1 = -1;
         |double $s2 = java.lang.Double.NEGATIVE_INFINITY; int $c2 = -1;
         |for (int $c = 0; $c < $k; $c++) {
         |  double $cn = $nm[$c];
         |  double $s;
         |  if ($cn == 0.0) {
         |    $s = -java.lang.Double.MAX_VALUE;
         |  } else {
         |    long $acc = 0L;
         |    int $off = $c * $dims;
         |    for (int $i = 0; $i < $n; $i++) {
         |      $acc += $v.getLong($i) * $f[$off + $i];
         |    }
         |    $s = (double) $acc / $cn;
         |  }
         |  if ($s > $s1) { $s2 = $s1; $c2 = $c1; $s1 = $s; $c1 = $c; }
         |  else if ($s > $s2) { $s2 = $s; $c2 = $c; }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.expressions
         |    .GenericInternalRow(new Object[]{$c1, $s1, $c2, $s2});
       """.stripMargin
    })

  // keep explain/treeString output bounded: the default argString would
  // render the whole k×dims matrix
  override def argString(maxFields: Int): String = s"k=$k, dims=$dims"

  override protected def withNewChildInternal(newChild: Expression): CellTop2 =
    copy(child = newChild)

  override def prettyName: String = "cell_top2"
}
