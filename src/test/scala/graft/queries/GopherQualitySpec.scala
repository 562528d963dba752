package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

/** Hand-computed ground truth for the q71 Gopher table-A1 quality rules
  * ([[TextQueries.gopherQualityOf]]): each planted document violates
  * exactly one rule (word-count window, mean word length, symbol ratio,
  * bullet/ellipsis line fractions, alpha-word fraction, required-word
  * presence), so the verdict map pins every threshold independently.
  */
class GopherQualitySpec extends SparkSpec {

  import spark.implicits._

  // 10 words, 45 chars of words, contains the/and/with (3 required words).
  private val phrase =
    "the quick brown foxes and hounds leap with great vigor"
  private val good50 = Seq.fill(5)(phrase).mkString(" ") // 50 words, mean 4.5

  private def run(docs: Seq[(Long, String)]): Map[Long, org.apache.spark.sql.Row] =
    TextQueries.gopherQualityOf(docs.toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) -> r).toMap

  test("a clean 50-word document passes with the expected signal values") {
    val r = run(Seq((1L, good50)))(1L)
    assert(r.getAs[Long]("n_words") === 50L)
    assert(r.getAs[Double]("mean_word_len") === 4.5) // 225 chars / 50, exact
    assert(r.getAs[Double]("symbol_ratio") === 0.0)
    assert(r.getAs[Double]("alpha_word_frac") === 1.0)
    assert(r.getAs[Long]("n_required_stops") === 3L) // the, and, with
    assert(r.getAs[Double]("bullet_line_frac") === 0.0)
    assert(r.getAs[Double]("ellipsis_line_frac") === 0.0)
    assert(r.getAs[Boolean]("passes_gopher_quality"))
  }

  test("each rule fails independently on its planted violator") {
    val docs = Seq(
      // 10 words < 50 → word-count window
      (2L, phrase),
      // 50 single-char words → mean word length 1 < 3
      (3L, Seq.fill(50)("a").mkString(" ")),
      // 6 '#' among 56 tokens → symbol ratio 6/56 ≈ 0.107 > 0.1
      (4L, good50 + " # # # # # #"),
      // every line bullet-led → bullet fraction 1.0 > 0.9
      (5L, Seq.fill(5)("- " + phrase).mkString("\n")),
      // 1 of 2 lines ends with an ellipsis → 0.5 > 0.3
      (6L, good50 + "\nmore words..."),
      // 11 digit-only words of 51 → alpha fraction 40/51 ≈ 0.784 < 0.8
      (7L, Seq.fill(4)(phrase).mkString(" ") +
        " 11 22 33 44 55 66 77 88 99 00 12"),
      // 50 words but zero of Gopher's eight required English words
      (8L, Seq.fill(5)(
        "quick brown foxes hounds leap great vigor jump swift night")
        .mkString(" ")),
    )
    val rows = run(docs)
    assert(rows.values.forall(!_.getAs[Boolean]("passes_gopher_quality")))
    // and the violated signal is the one we planted
    assert(rows(2L).getAs[Long]("n_words") === 10L)
    assert(rows(3L).getAs[Double]("mean_word_len") === 1.0)
    assert(rows(4L).getAs[Double]("symbol_ratio") > 0.1)
    assert(rows(5L).getAs[Double]("bullet_line_frac") === 1.0)
    assert(rows(6L).getAs[Double]("ellipsis_line_frac") === 0.5)
    assert(rows(7L).getAs[Double]("alpha_word_frac") < 0.8)
    assert(rows(8L).getAs[Long]("n_required_stops") === 0L)
    // every violator passes the OTHER line rules (no accidental coupling)
    assert(rows(4L).getAs[Double]("bullet_line_frac") === 0.0)
    assert(rows(5L).getAs[Long]("n_words") === 55L) // "-" counts as a token
    assert(rows(5L).getAs[Double]("alpha_word_frac") === 50.0 / 55.0)
  }

  test("U+2026 ellipsis and bullet glyphs are recognized like ASCII forms") {
    val rows = run(Seq(
      (10L, good50 + "\ntrailing thought…"),   // unicode ellipsis line end
      (11L, Seq.fill(5)("• " + phrase).mkString("\n")))) // unicode bullet
    assert(rows(10L).getAs[Double]("ellipsis_line_frac") === 0.5)
    assert(rows(11L).getAs[Double]("bullet_line_frac") === 1.0)
  }

  test("registry q71 runs on the corpus and is oracled") {
    val df: DataFrame =
      graft.SparkEntry.queries("q71_gopher_quality")(spark, "/root/testdata/sf0.001")
    assert(df.count() === 500L)
    assert(graft.SparkEntry.oracleSql.contains("q71_gopher_quality"))
  }
}
