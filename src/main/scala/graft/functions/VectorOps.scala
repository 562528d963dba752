package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DoubleType}

/** Vector math over `array<float>` / `array<double>` embedding columns,
  * built from codegen'd higher-order functions (`zip_with` + `aggregate`)
  * — no UDFs, stays inside WholeStageCodegen.
  *
  * Determinism note: `dot` accumulates strictly left-to-right in double
  * precision, so the same formulation in another engine (the DuckDB oracle
  * uses `list_sum(list_transform(...))`) produces bit-identical results.
  */
object VectorOps {
  private val dbl = ArrayType(DoubleType)

  /** Strict left-to-right double dot product. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a.cast(dbl), b.cast(dbl), (x, y) => x * y),
      lit(0.0),
      (acc, v) => acc + v)

  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; null/zero-norm guarded to null (not NaN). */
  def cosine(a: Column, b: Column): Column = {
    val d  = dot(a, b)
    val nn = l2Norm(a) * l2Norm(b)
    when(nn =!= 0.0, d / nn)
  }

  /** Squared L2 distance (monotone in L2 — cheaper for kNN ranking). */
  def l2Sq(a: Column, b: Column): Column =
    aggregate(
      zip_with(a.cast(dbl), b.cast(dbl), (x, y) => (x - y) * (x - y)),
      lit(0.0),
      (acc, v) => acc + v)
}
