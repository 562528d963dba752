package graft.queries

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** q29 (Summarizer scale path, partition-order float sums) vs q60 (bit-exact
  * vec_id-ordered fold): the two centroid formulations may differ only by
  * float-accumulation order, so per-(label, dim) drift must sit at the
  * ulp level — ≤1e-9 is ~1e6 ulps of headroom on unit-scale embeddings,
  * loose enough to never flake, tight enough that a real bug (wrong group,
  * wrong dim alignment, dropped rows) fails loudly.
  */
class CentroidDriftSpec extends SparkSpec {

  test("scale-path centroids drift ≤1e-9 from the bit-exact fold") {
    val sf = "/root/testdata/sf0.001"
    val fast = SparkEntry.queries("q29_centroid")(spark, sf)
      .withColumnRenamed("centroid", "c_fast")
    val exact = SparkEntry.queries("q60_centroid_fold")(spark, sf)
      .select(col("label"), col("dim"), col("centroid").as("c_exact"))
    val stats = fast.join(exact, Seq("label", "dim"), "full_outer")
      .agg(
        count(lit(1)).as("n"),
        count(when(col("c_fast").isNull || col("c_exact").isNull, 1)).as("n_unmatched"),
        max(abs(col("c_fast") - col("c_exact"))).as("max_drift"))
      .head()
    assert(stats.getAs[Long]("n_unmatched") === 0L, "row sets differ")
    assert(stats.getAs[Long]("n") === 640L) // 10 labels × 64 dims
    assert(stats.getAs[Double]("max_drift") <= 1e-9,
      s"drift ${stats.getAs[Double]("max_drift")}")
  }
}
