package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Property bound for `q55_quantize_int8`: the value-level hash check is
  * the DuckDB oracle; this spec pins the quantizer's CONTRACT — per-dim
  * reconstruction error can never exceed half a quantization step.
  */
class QuantizeSpec extends SparkSpec {

  test("int8 round-trip error is bounded by half a step per dimension") {
    val q = VectorQueries.queries("q55_quantize_int8")(spark, "/root/testdata/sf0.001")
    val rows = q
      .withColumn("scale", (col("vmax") - col("vmin")) / lit(255.0))
      .withColumn("n", size(split(col("codes_csv"), ",")))
      // sq_err ≤ n · (scale/2)² when every dim is within half a step
      .select(col("vec_id"), col("sq_err"),
        (col("n") * (col("scale") / 2) * (col("scale") / 2)).as("bound"))
      .collect()
    assert(rows.length === 500)
    rows.foreach { r =>
      val (err, bound) = (r.getDouble(1), r.getDouble(2))
      assert(err <= bound * (1.0 + 1e-9), s"vec ${r.getLong(0)}: $err > $bound")
    }
  }

  test("codes are dense 0..255 with range endpoints mapped to extremes") {
    val q = VectorQueries.queries("q55_quantize_int8")(spark, "/root/testdata/sf0.001")
    val codes = q.select(explode(split(col("codes_csv"), ",")).as("cs"))
      .select(col("cs").cast("long").as("c"))
    val mm = codes.agg(min("c"), max("c")).head
    assert(mm.getLong(0) === 0L)
    assert(mm.getLong(1) === 255L)
  }
}
