package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._

/** Bucketed co-located join: identical bucketing on both sides ⇒ the join
  * plans with zero shuffles (the write paid the only shuffle).
  */
class BucketedJoinSpec extends SparkSpec {

  test("join of two same-bucketed tables has no Exchange") {
    val sf = "/root/testdata/sf0.001"
    val orders   = spark.read.parquet(s"$sf/orders.parquet")
    val lineitem = spark.read.parquet(s"$sf/lineitem.parquet")
      .withColumnRenamed("l_orderkey", "o_orderkey")

    Bucketing.writeBucketed(orders, "b_orders", "o_orderkey", 4)
    Bucketing.writeBucketed(lineitem, "b_lineitem", "o_orderkey", 4)
    try {
      val joined = Bucketing.bucketedJoin(spark, "b_orders", "b_lineitem", "o_orderkey")
        .groupBy("o_orderpriority").agg(sum("l_quantity").as("qty"))
      val plan = joined.queryExecution.explainString(ExplainMode.fromString("simple"))
      assert(!plan.contains("Exchange hashpartitioning(o_orderkey"), plan)

      // result parity with the plain (shuffled) join
      val plain = orders.join(lineitem, "o_orderkey")
        .groupBy("o_orderpriority").agg(sum("l_quantity").as("qty"))
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      val bucketed = joined.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      assert(bucketed === plain)
    } finally {
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }
}
