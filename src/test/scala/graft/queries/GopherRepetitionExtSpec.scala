package graft.queries

import graft.SparkSpec

/** Hand-computed ground truth for the q74 extended Gopher repetition
  * profile ([[TextQueries.gopherRepetitionExtOf]]): top-3/4-gram and
  * dup-6..10-gram char fractions, duplicate line/paragraph rules, the
  * lexicographic top-gram tie-break, and the combined verdict.
  */
class GopherRepetitionExtSpec extends SparkSpec {

  import spark.implicits._

  private def run(docs: Seq[(Long, String)]) =
    TextQueries.gopherRepetitionExtOf(docs.toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) -> r).toMap

  test("top-3-gram char fraction counts overlapping occurrences") {
    // 3-grams: "a b c"×3, "b c a"×2, "c a b"×2 → top (a b c, 3), len 5
    // top chars 15 of 35 total gram chars
    val r = run(Seq((1L, "a b c a b c a b c")))(1L)
    assert(r.getAs[Double]("top3_char_frac") === 15.0 / 35.0)
    assert(!r.getAs[Boolean]("passes_gopher_repetition_ext")) // 0.43 > 0.18
  }

  test("duplicated-6-gram char fraction: one repeated passage") {
    // 6-grams pos1..7; pos1 == pos7 ("a b c d e f", len 11) → dup 22/77
    val r = run(Seq((2L, "a b c d e f a b c d e f")))(2L)
    assert(r.getAs[Double]("dup6_char_frac") === 22.0 / 77.0)
  }

  test("duplicate line and paragraph rules are occurrence-weighted") {
    val rows = run(Seq(
      (3L, "x\ny\nx\nz"),                  // line x twice: 2 of 4 lines dup
      (4L, "para one\n\npara one\n\nqq"))) // paragraph dup: 2 of 3
    assert(rows(3L).getAs[Double]("dup_line_frac") === 0.5)
    assert(rows(3L).getAs[Double]("dup_line_char_frac") === 0.5)
    assert(!rows(3L).getAs[Boolean]("passes_gopher_repetition_ext"))
    assert(rows(4L).getAs[Double]("dup_para_frac") === 2.0 / 3.0)
    assert(rows(4L).getAs[Double]("dup_para_char_frac") === 16.0 / 18.0)
  }

  test("top-gram count ties break to the lexicographically smallest gram") {
    // all four 3-grams unique (cnt 1); smallest is "a a a" (len 5 of 20)
    val r = run(Seq((5L, "b b b a a a")))(5L)
    assert(r.getAs[Double]("top3_char_frac") === 5.0 / 20.0)
  }

  test("a non-repetitive document passes every extended rule") {
    val r = run(Seq(
      (6L, "one two three four five six seven eight nine ten eleven twelve")))(6L)
    assert(r.getAs[Double]("dup6_char_frac") === 0.0)
    assert(r.getAs[Double]("dup10_char_frac") === 0.0)
    assert(r.getAs[Double]("dup_line_frac") === 0.0)
    assert(r.getAs[Double]("dup_para_frac") === 0.0)
    assert(r.getAs[Boolean]("passes_gopher_repetition_ext"))
  }

  test("registry q74 runs on the corpus and is oracled") {
    val df = graft.SparkEntry
      .queries("q74_gopher_repetition_ext")(spark, "/root/testdata/sf0.001")
    assert(df.count() === 500L)
    assert(graft.SparkEntry.oracleSql.contains("q74_gopher_repetition_ext"))
  }
}
