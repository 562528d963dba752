package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The adaptive scan fan-out (round-15 optimization): starved scans fan
  * out to the session parallelism, already-parallel inputs pass through
  * untouched, and row CONTENT is never altered — only placement.
  */
class FanOutSpec extends SparkSpec {

  private def target = spark.sparkContext.defaultParallelism

  test("starved input fans out to the session default parallelism") {
    import spark.implicits._
    val df = (1L to 100L).toDF("doc_id").coalesce(1)
    assert(df.rdd.getNumPartitions === 1)
    val out = Fan.out(df, col("doc_id"))
    assert(out.rdd.getNumPartitions === target)
  }

  test("already-parallel input is the identity (no new exchange)") {
    import spark.implicits._
    val df = (1L to 100L).toDF("doc_id").repartition(target + 2)
    val out = Fan.out(df, col("doc_id"))
    // same object — Fan.out must not wrap an input that is wide enough
    assert(out eq df)
  }

  test("round-robin form (no key) also reaches the target parallelism") {
    import spark.implicits._
    val df = (1L to 50L).toDF("v").coalesce(1)
    assert(Fan.out(df).rdd.getNumPartitions === target)
  }

  test("fan-out preserves the multiset of rows exactly") {
    import spark.implicits._
    val df  = (1L to 1000L).map(i => (i, s"txt$i")).toDF("doc_id", "text").coalesce(1)
    val out = Fan.out(df, col("doc_id"))
    assert(out.count() === 1000L)
    assert(out.orderBy("doc_id").collect().toSeq ===
      df.orderBy("doc_id").collect().toSeq)
  }
}
