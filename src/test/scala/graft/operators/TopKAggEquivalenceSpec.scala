package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** The bounded-buffer aggregation top-k must return exactly the window
  * top-k — same rows, same scores, same ranks — on real scored data.
  */
class TopKAggEquivalenceSpec extends SparkSpec {

  test("topKPerGroupAgg equals topKPerGroup on brute-force kNN scores") {
    val sf  = "/root/testdata/sf0.001"
    val emb = Tables.embeddings(spark, sf)
    val qs  = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("embedding").as("qe"))
    val scored = emb
      .join(broadcast(qs), col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").as("neighbor_id"),
        graft.functions.VectorOps.cosine(col("qe"), col("embedding")).as("cosine"))
      .localCheckpoint() // score once, feed both variants identically

    def snap(df: org.apache.spark.sql.DataFrame) = df
      .select("q_id", "neighbor_id", "cosine", "rnk").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
      .sortBy(x => (x._1, x._4)).toSeq

    val viaWindow = snap(RelationalOps.topKPerGroup(
      scored, Seq("q_id"), Seq(col("cosine").desc, col("neighbor_id").asc),
      5, rankCol = "rnk"))
    val viaAgg = snap(RelationalOps.topKPerGroupAgg(
      scored, "q_id", "neighbor_id", "cosine", 5, rankCol = "rnk"))
    assert(viaWindow.size === 50)
    assert(viaAgg === viaWindow)
  }

  test("NaN and null scores are dropped, not ranked first") {
    import spark.implicits._
    val df = Seq(
      (1L, 10L, 0.9), (1L, 11L, Double.NaN), (1L, 12L, 0.8),
      (2L, 20L, Double.NaN)) // all-NaN group disappears entirely
      .toDF("g", "id", "s")
    val out = RelationalOps.topKPerGroupAgg(df, "g", "id", "s", 2, "rnk")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
    assert(out.toSet === Set((1L, 10L, 1L), (1L, 12L, 2L)))
  }

  test("NULL keys and non-castable scores drop the row instead of crashing") {
    import spark.implicits._
    // NULL group/id can't ride the primitive tuple encoder (used to throw
    // "Null value appeared in non-nullable field" mid-job) and a string
    // score that fails the double cast becomes NULL post-cast — all three
    // must drop cleanly
    val df = Seq(
      (Some(1L), Some(10L), "0.9"),
      (None, Some(11L), "0.8"),     // NULL group
      (Some(1L), None, "0.7"),      // NULL id
      (Some(1L), Some(12L), "abc"), // cast-to-double fails → NULL score
      (Some(1L), Some(13L), "0.5"))
      .toDF("g", "id", "s")
    val out = RelationalOps.topKPerGroupAgg(df, "g", "id", "s", 5, "rnk")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
    assert(out.toSet === Set((1L, 10L, 1L), (1L, 13L, 2L)))
  }

  test("non-integral group keys fail fast with a clear error") {
    import spark.implicits._
    val df = Seq(("books", 1L, 0.5)).toDF("g", "id", "s")
    val e = intercept[IllegalArgumentException] {
      RelationalOps.topKPerGroupAgg(df, "g", "id", "s", 2)
    }
    assert(e.getMessage.contains("must be integral"))
  }

  test("partial aggregation bounds the buffers before the exchange") {
    // contract check on the Aggregator itself: reduce never grows past k
    val agg = new graft.functions.TopKByValue(3)
    val buf = (1 to 100).foldLeft(agg.zero)((b, i) =>
      agg.reduce(b, (i.toDouble, i.toLong)))
    assert(buf.size === 3)
    assert(buf.map(_._1) === Seq(100.0, 99.0, 98.0))
  }
}
