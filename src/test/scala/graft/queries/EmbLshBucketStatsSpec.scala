package graft.queries

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** The embedding-LSH candidate-volume forecast (`embLshBucketStats`) must
  * actually predict the expansion it prices: its `candidate_pairs` column
  * is asserted equal to an INDEPENDENT recount of the pre-`distinct`
  * multiprobe candidate rows (home + Hamming-1 probes, `vec_id <
  * probe_id`), built in this spec directly from the bucket assignments —
  * a forecast that can drift from the real expansion is worse than none.
  */
class EmbLshBucketStatsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("candidate_pairs equals an independent recount of the expansion") {
    import spark.implicits._
    val emb = Tables.embeddings(spark, sf)
    val stats = VectorQueries.embLshBucketStats(spark, sf)
      .select("table", "candidate_pairs", "buckets_over_cap")
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
    // no bucket over the cap on this corpus — the regime where the
    // forecast claims exact equality with the expansion
    assert(stats.values.forall(_._2 == 0L))

    val b = VectorQueries.bucketsOf(emb)
    val probes = b.select(col("table"),
      explode(array((0 until VectorQueries.nBits).map(j =>
        col("bucket").bitwiseXOR(lit(1L << j))) :+ col("bucket"): _*))
        .as("bucket"),
      col("vec_id").as("probe_id"))
    val recount = b.join(probes, Seq("table", "bucket"))
      .filter(col("vec_id") < col("probe_id"))
      .groupBy("table").count()
      .as[(Int, Long)].collect().toMap

    assert(recount.keySet === stats.keySet)
    recount.foreach { case (t, n) =>
      assert(stats(t)._1 === n,
        s"table $t: forecast ${stats(t)._1} != recount $n")
    }
    assert(recount.values.sum > 0L) // non-vacuous: the corpus does collide
  }

  test("a degenerate identical-vector flood is visible in the stats") {
    import spark.implicits._
    val v = Array.fill(64)(0.5f)
    val flood = (0L until 1200L).map(i => (i, v)).toDF("vec_id", "embedding")
      .repartition(4)
    val stats = VectorQueries.embLshBucketStatsOf(flood)
      .select("table", "max_bucket", "buckets_over_cap", "candidate_pairs")
      .collect()
    assert(stats.length === VectorQueries.nTables)
    stats.foreach { r =>
      assert(r.getLong(1) === 1200L) // all copies share one home bucket
      assert(r.getLong(2) >= 1L)     // ...which the cap would skip
      // the UNCAPPED worst case the view reports: at least the in-bucket
      // pair cost of the flood bucket (1200·1199/2)
      assert(r.getLong(3) >= 1200L * 1199L / 2L)
    }
  }
}
