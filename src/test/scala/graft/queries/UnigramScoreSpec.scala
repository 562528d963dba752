package graft.queries

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Semantics of the q81 unigram-LM quality proxy
  * ([[TextQueries.unigramScoreOf]]): exact frequency accounting on a
  * planted fixture, the rare-token signal separating gibberish from
  * common-word text, and corpus-level invariants (row parity with the
  * token-bearing docs, avg_freq ≥ 1).
  */
class UnigramScoreSpec extends SparkSpec {

  import spark.implicits._

  private def score(rows: (Long, String)*) =
    TextQueries.unigramScoreOf(rows.toDF("doc_id", "text")).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3),
          r.getDouble(4), r.getDouble(5)))).toMap

  test("planted fixture: exact counts, sums, and single-division ratios") {
    // corpus freqs: "a" ×4 (docs 1,2), "b" ×2 (docs 1,3), "z" ×1 (doc 3)
    val out = score(1L -> "a a b", 2L -> "a a", 3L -> "b z")
    assert(out(1L) === ((3L, 10L, 1L, 10.0 / 3.0, 1.0 / 3.0))) // a,a,b → 4+4+2
    assert(out(2L) === ((2L, 8L, 0L, 4.0, 0.0)))               // a,a → 4+4
    assert(out(3L) === ((2L, 3L, 2L, 1.5, 1.0)))               // b,z → 2+1
  }

  test("rare_ratio separates unique-token gibberish from repeated common words") {
    // corpus freqs: data ×5 (4 in doc2 + 1 in doc3), spark ×2, hapaxes ×1
    val out = score(
      1L -> "qqxj zzvk wwpt rrgm",       // every token a hapax → all rare
      2L -> "data data data data spark",
      3L -> "data spark")
    assert(out(1L) === ((4L, 4L, 4L, 1.0, 1.0)))
    assert(out(2L) === ((5L, 22L, 1L, 22.0 / 5.0, 1.0 / 5.0))) // spark (freq 2) is rare
    assert(out(3L) === ((2L, 7L, 1L, 7.0 / 2.0, 1.0 / 2.0)))
  }

  test("corpus invariants: one row per token-bearing doc, avg_freq ≥ 1") {
    val sf = "/root/testdata/sf0.001"
    val docs = Tables.documents(spark, sf)
    val out = TextQueries.unigramScoreOf(docs)
    assert(out.count() === docs.filter(col("text").isNotNull).count())
    assert(out.filter(col("avg_freq") < 1.0).count() === 0L)
    assert(out.filter(col("n_rare") > col("n_tokens")).count() === 0L)
  }
}
