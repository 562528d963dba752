package graft.queries

import graft.{SparkSpec, Tables}

/** Hot-bucket guard for the LSH pair expansion (q22): in-bucket pair emit
  * is O(bucket²), so an adversarial corpus (boilerplate shared by every
  * doc) must not be allowed to emit bucket²/2 pairs.
  */
class LshGuardSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("adversarial mega-bucket is skipped by the hot-bucket cap") {
    import spark.implicits._
    val boiler = "the same boilerplate sentence repeated across every " +
      "document in this adversarial corpus for lsh banding"
    val docs = (0L until 1200L).map(i => (i, boiler)).toDF("doc_id", "text")
    val sigs = TextQueries.sigsFrom(TextQueries.shingledDocs(docs))
    // every doc shares every band → one bucket of 1200 per band; with the
    // default cap of 1000 both buckets are skipped → zero candidates
    // instead of ~1.4M pairs
    assert(TextQueries.candidatePairsFrom(sigs, 1000).count() === 0)
    // and a cap above the bucket size would admit them (guard, not a bug)
    assert(TextQueries.candidatePairsFrom(sigs, 1500).limit(1).count() === 1)
  }

  test("default cap changes nothing on a healthy corpus") {
    val sigs = TextQueries.sigsFrom(
      TextQueries.shingledDocs(Tables.documents(spark, sf)))
    def pairs(cap: Int) = TextQueries.candidatePairsFrom(sigs, cap)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs(Int.MaxValue) === pairs(TextQueries.defaultMaxBucket))
  }

  test("bucket stats report max bucket and pair cost per band") {
    val stats = TextQueries.lshBucketStats(spark, sf).collect()
    assert(stats.length === 2) // two bands
    stats.foreach { r =>
      assert(r.getLong(r.fieldIndex("max_bucket")) <= 10)
      assert(r.getLong(r.fieldIndex("buckets_over_cap")) === 0)
    }
  }
}
