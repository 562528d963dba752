package graft.queries

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Semantics of the q87 token-budget selection
  * ([[TextQueries.tokenBudgetSelect]]): quality-band monotonicity (full
  * bands above the cutoff all in, bands below all out), budget adherence
  * through the Bernoulli boundary fill, keep-everything when the budget
  * covers the corpus, and determinism.
  */
class TokenBudgetSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def scoredBands() =
    graft.SparkEntry.queries("q19_quality")(spark, sf)
      .select(col("doc_id"),
        floor(col("quality") * TextQueries.budgetBandScale).cast("long").as("band"))

  test("band monotonicity: full bands above the cutoff in, below-cutoff bands out") {
    val docs = Tables.documents(spark, sf)
    val selected = TextQueries.tokenBudgetSelect(docs, 10000L)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(selected.nonEmpty)
    val bands = scoredBands().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val selBands = selected.values.toSet
    val cutoff = selBands.min
    // every doc in a band strictly above the cutoff is selected
    bands.foreach { case (id, b) =>
      if (b > cutoff) assert(selected.contains(id), s"doc $id band $b missing")
      if (b < cutoff) assert(!selected.contains(id), s"doc $id band $b included")
    }
  }

  test("selected token total lands near the budget; full budget keeps all") {
    val docs = Tables.documents(spark, sf)
    val budget = 10000L
    val total = TextQueries.tokenBudgetSelect(docs, budget)
      .agg(sum("n_tokens")).head.getLong(0)
    // full bands contribute exactly; the one Bernoulli-thinned boundary
    // band adds binomial jitter around its expected share
    assert(total > budget * 7 / 10 && total < budget * 13 / 10, s"total $total")
    val corpusTokens = TextQueries.tokenBudgetSelect(docs, Long.MaxValue / 2)
      .agg(sum("n_tokens")).head.getLong(0)
    val allTokens = graft.SparkEntry.queries("q17_text_stats")(spark, sf)
      .agg(sum("n_tokens")).head.getLong(0)
    assert(corpusTokens === allTokens)
  }

  test("selection is deterministic across runs") {
    val docs = Tables.documents(spark, sf)
    val a = TextQueries.tokenBudgetSelect(docs, 10000L)
      .orderBy("doc_id").collect().toSeq
    val b = TextQueries.tokenBudgetSelect(docs, 10000L)
      .orderBy("doc_id").collect().toSeq
    assert(a === b)
  }
}
