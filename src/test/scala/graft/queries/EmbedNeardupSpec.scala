package graft.queries

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Recall + consistency bounds for the LSH-composed `q35_embed_neardup`.
  *
  * The test corpus's pairs above cosine 0.4 are a noise tail (all between
  * 0.40 and 0.51 — there are no planted duplicates), which is the regime NO
  * sub-quadratic method can cover exactly: for ≥0.95 per-pair recall at
  * cosine 0.4 (hyperplane collision p≈0.63/bit) sign-LSH needs a candidate
  * fraction ≥ tables/2^bits ≈ 1, i.e. all pairs. So recall is bounded here
  * in the regime near-dup detection actually targets — planted perturbed
  * copies at cosine ≈0.995 — and the registered query's own semantics
  * ("exact verification of LSH candidates") are pinned by the composition
  * test plus the bit-exact DuckDB oracle that replays the bucketing.
  */
class EmbedNeardupSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  /** Base corpus + one perturbed copy per vector (relative noise ~0.1 →
    * cosine ≈ 0.995) — the shared planted-dup fixture.
    */
  private lazy val planted: DataFrame =
    graft.TestFixtures.plantedCopies(spark, sf, noise = 0.1)

  test("LSH candidates reach >=0.95 recall on planted near-duplicates") {
    val truth = VectorQueries.neardupExact(planted, 0.9)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(truth.size >= 400, s"expected ~500 planted pairs, got ${truth.size}")
    val cand = VectorQueries.lshCandidatePairs(planted)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = truth.intersect(cand).size.toDouble / truth.size
    info(s"planted-dup candidate recall = $recall (${truth.size} true pairs)")
    assert(recall >= 0.95, s"recall $recall")
  }

  test("q35 equals exact cosine verification restricted to LSH candidates") {
    val emb  = Tables.embeddings(spark, sf)
    val cand = VectorQueries.lshCandidatePairs(emb)
    val expected = VectorQueries.neardupExact(emb, 0.4)
      .join(cand, Seq("id_a", "id_b"), "left_semi")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val got = VectorQueries.queries("q35_embed_neardup")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got === expected) // exact double equality — same kernel both ways
    assert(got.nonEmpty)
    assert(got.forall { case (a, b, c) => a < b && c > 0.4 })
  }

  test("hot-bucket cap drops a degenerate identical-vector flood") {
    import spark.implicits._
    // 1200 identical vectors land in ONE home bucket per table (> cap
    // 1000): the O(bucket²) pair flood must be dropped entirely, on both
    // the home and probe sides of the multiprobe join
    val v = Array.fill(64)(0.5f)
    val flood = (0L until 1200L).map(i => (i, v)).toDF("vec_id", "embedding")
      .repartition(4)
    assert(VectorQueries.lshCandidatePairs(flood).count() === 0)
  }

  test("candidate pairs are unique, ordered, and bucket-justified") {
    val cand = VectorQueries.lshCandidatePairs(planted)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(cand.length === cand.distinct.length)
    assert(cand.forall { case (a, b) => a < b })
  }
}
