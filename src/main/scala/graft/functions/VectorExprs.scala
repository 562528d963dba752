package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native kernels for vector math over `array<float>`/`array<double>`.
  *
  * On equal-length arrays with no NULL elements, accumulation is strictly
  * left-to-right in double precision — bit-for-bit the same result as the
  * higher-order `zip_with`+`aggregate` formulation (and the DuckDB oracle),
  * but ~2 orders of magnitude faster: one tight JIT-compiled loop per row
  * instead of per-element Catalyst lambda evaluation, and the fused cosine
  * computes dot + both norms in a single pass.
  *
  * Outside that domain the kernels THROW rather than silently diverge from
  * the HOF semantics: a length mismatch or a NULL element raises
  * IllegalArgumentException — reading ragged or sparse vectors through
  * `ArrayData` getters would otherwise truncate to the shorter length and
  * read garbage for NULL slots. The fused cosine additionally throws on
  * non-finite elements (post-loop norm check): its NaN→NULL zero-norm
  * mapping would otherwise silently turn a NaN input into NULL where the
  * HOF twin and the oracle propagate NaN. `dot` propagates NaN unchanged —
  * there the HOF does the same, so no divergence exists to guard.
  */
object VectorKernels {

  private def checkLengths(a: ArrayData, b: ArrayData): Int = {
    val n = a.numElements()
    if (n != b.numElements()) throw new IllegalArgumentException(
      s"vector kernel: length mismatch ($n vs ${b.numElements()})")
    n
  }

  private def nullElement(i: Int): Nothing = throw new IllegalArgumentException(
    s"vector kernel: NULL element at index $i (dense arrays required)")

  def dot(a: ArrayData, aFloat: Boolean, b: ArrayData, bFloat: Boolean): Double = {
    val n = checkLengths(a, b)
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) nullElement(i)
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      acc += x * y
      i += 1
    }
    acc
  }

  /** Fused cosine: Σxy / (√Σx² · √Σy²); returns NaN for a zero norm (the
    * expression layer converts NaN to NULL — matching the HOF guard).
    * Three independent left-to-right accumulations in one pass equal three
    * separate loops bit-for-bit.
    *
    * Non-finite ELEMENTS (NaN/±Inf, or values so large a norm overflows)
    * THROW after the loop, same policy as the NULL-element/ragged guards:
    * a NaN result here would be mapped to NULL by the expression layer
    * while the HOF twin and the SQL oracle yield NaN — a silent
    * divergence inside the documented bit-identical domain. The check is
    * post-loop (two isFinite tests per ROW, not per element), so the hot
    * loop is untouched; with finite norms the only NaN left is zero-norm.
    */
  def cosineOrNaN(a: ArrayData, aFloat: Boolean, b: ArrayData, bFloat: Boolean): Double = {
    val n = checkLengths(a, b)
    var d  = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) nullElement(i)
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      d += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    if (!java.lang.Double.isFinite(na) || !java.lang.Double.isFinite(nb))
      throw new IllegalArgumentException(
        "vector kernel: non-finite element or norm overflow (finite dense vectors required)")
    val nn = math.sqrt(na) * math.sqrt(nb)
    if (nn == 0.0) Double.NaN else d / nn
  }
}

private[functions] trait FloatArrayArgs { self: BinaryExpression =>
  protected def isFloatArr(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _)  => true
    case ArrayType(DoubleType, _) => false
    case other => throw new IllegalArgumentException(
      s"expected array<float> or array<double>, got $other")
  }

  /** Analysis-time form of the same check: a wrong-typed column fails
    * with a named TypeCheckFailure when the plan is analyzed, not as the
    * lazy isFloatArr throw from inside eval/codegen of a running job.
    */
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects array<float>/array<double> on both sides, " +
          s"got ${left.dataType} and ${right.dataType}")
  }
}

/** `dot_product(a, b)`: left-to-right double dot product. */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression with FloatArrayArgs {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "dot_product"

  private lazy val lf = isFloatArr(left)
  private lazy val rf = isFloatArr(right)

  override def nullSafeEval(a: Any, b: Any): Any =
    VectorKernels.dot(a.asInstanceOf[ArrayData], lf, b.asInstanceOf[ArrayData], rf)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.VectorKernels.dot($a, $lf, $b, $rf)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotProduct =
    copy(left = l, right = r)
}

/** `cosine_sim(a, b)`: fused cosine similarity; zero-norm → NULL. */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression with FloatArrayArgs {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "cosine_sim"

  private lazy val lf = isFloatArr(left)
  private lazy val rf = isFloatArr(right)

  override def nullSafeEval(a: Any, b: Any): Any = {
    val r = VectorKernels.cosineOrNaN(
      a.asInstanceOf[ArrayData], lf, b.asInstanceOf[ArrayData], rf)
    if (r.isNaN) null else r
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |${ev.value} = graft.functions.VectorKernels.cosineOrNaN($a, $lf, $b, $rf);
         |if (Double.isNaN(${ev.value})) { ${ev.isNull} = true; ${ev.value} = 0.0; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineSim =
    copy(left = l, right = r)
}
