package graft.operators

import graft.SparkSpec

/** Property check for the shared LSH pair expansion against a brute-force
  * reference: for random bucket assignments, `inBucketPairs` must emit
  * exactly the distinct ordered pairs that share a bucket — and nothing
  * else — with the hot-bucket cap dropping exactly the oversized buckets.
  */
class InBucketPairsSpec extends SparkSpec {

  private def reference(
      rows: Seq[(Int, Long)], cap: Int): Set[(Long, Long)] =
    rows.groupBy(_._1).values.flatMap { bucket =>
      val ids = bucket.map(_._2).distinct.sorted
      if (ids.size < 2 || ids.size > cap) Nil
      else for {
        i <- ids.indices
        j <- (i + 1) until ids.size
      } yield (ids(i), ids(j))
    }.toSet

  test("matches the brute-force pair set for random bucketings") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    for (_ <- 1 to 20) {
      // NO .distinct on the input: duplicate (bucket, id) rows are part of
      // the property — the reference dedups ids per bucket, and so must
      // the operator (a duplicate id used to emit a SELF-pair)
      val rows = Seq.fill(60)((rnd.nextInt(6), rnd.nextInt(26).toLong))
      val got = RelationalOps
        .inBucketPairs(rows.toDF("bucket", "id"), Seq("bucket"), "id",
          "a", "b", maxBucket = 8)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got === reference(rows, cap = 8), s"rows=$rows")
    }
  }

  test("duplicate (bucket, id) rows never produce a self-pair") {
    import spark.implicits._
    val rows = Seq((1, 7L), (1, 7L), (1, 9L), (2, 5L), (2, 5L))
    val got = RelationalOps
      .inBucketPairs(rows.toDF("bucket", "id"), Seq("bucket"), "id",
        "a", "b", maxBucket = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // bucket 1 → the one real pair; bucket 2 collapses to a single id
    assert(got === Set((7L, 9L)))
  }
}
