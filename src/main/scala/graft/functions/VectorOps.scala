package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DoubleType}

/** Vector math over `array<float>` / `array<double>` embedding columns.
  *
  * The hot operations (dot, cosine) are native Catalyst expressions with
  * tight codegen'd loops ([[VectorKernels]]); the higher-order-function
  * formulations are kept as `*Hof` for cross-checking. Both accumulate
  * strictly left-to-right in double precision, so results are bit-identical
  * to each other and to the DuckDB oracle's `list_sum(list_transform(...))`
  * (VectorOpsSpec asserts the equivalence). Zero-norm cosine is NULL, never
  * NaN/Inf.
  */
object VectorOps {
  private val dbl = ArrayType(DoubleType)

  /** Strict left-to-right double dot product (native, codegen'd). */
  def dot(a: Column, b: Column): Column =
    Bridge.column(DotProduct(Bridge.expression(a), Bridge.expression(b)))

  /** Fused cosine similarity (one pass for dot + both norms). */
  def cosine(a: Column, b: Column): Column =
    Bridge.column(CosineSim(Bridge.expression(a), Bridge.expression(b)))

  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  /** Per-key mean vectors via mllib's `Summarizer.mean` — ONE shuffle with
    * map-side partial aggregation of whole-vector sums (the previous
    * posexplode + (key, dim) formulation shuffled dim× the row count and
    * needed a second shuffle to re-assemble). Used by IVF training and the
    * registered q29; float-sum order is partition-dependent, so results are
    * approximate across runs (the bit-exact sorted-fold twin is
    * q60_centroid_fold; CentroidDriftSpec bounds the drift at 1e-9).
    */
  def meanVectors(
      df: org.apache.spark.sql.DataFrame, key: String, vec: String,
      out: String = "centroid"): org.apache.spark.sql.DataFrame =
    df.select(col(key),
        org.apache.spark.ml.functions.array_to_vector(
          col(vec).cast(dbl)).as("__mlv"))
      .groupBy(key)
      .agg(org.apache.spark.ml.stat.Summarizer.mean(col("__mlv")).as("__mv"))
      .select(col(key),
        org.apache.spark.ml.functions.vector_to_array(col("__mv")).as(out))

  /** Squared L2 distance (monotone in L2 — cheaper for kNN ranking). */
  def l2Sq(a: Column, b: Column): Column =
    aggregate(
      zip_with(a.cast(dbl), b.cast(dbl), (x, y) => (x - y) * (x - y)),
      lit(0.0),
      (acc, v) => acc + v)

  // -- higher-order-function reference formulations (for equivalence tests)

  private[graft] def dotHof(a: Column, b: Column): Column =
    aggregate(
      zip_with(a.cast(dbl), b.cast(dbl), (x, y) => x * y),
      lit(0.0),
      (acc, v) => acc + v)

  private[graft] def cosineHof(a: Column, b: Column): Column = {
    val d  = dotHof(a, b)
    val nn = sqrt(dotHof(a, a)) * sqrt(dotHof(b, b))
    when(nn =!= 0.0, d / nn)
  }
}
