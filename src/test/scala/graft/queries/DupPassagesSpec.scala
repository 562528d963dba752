package graft.queries

import graft.SparkSpec

/** Hand-computed ground truth for the q72 cross-document duplicated-passage
  * profile ([[TextQueries.dupPassagesOf]], word 10-grams): a position is
  * duplicated iff its gram appears in ≥2 DISTINCT documents — shared
  * passages count, within-document repetition alone does not.
  */
class DupPassagesSpec extends SparkSpec {

  import spark.implicits._

  // A 12-word passage: exactly 3 of a containing doc's 10-grams fit
  // entirely inside it.
  private val passage =
    "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"

  private def run(docs: Seq[(Long, String)]) =
    TextQueries.dupPassagesOf(docs.toDF("doc_id", "text"))
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getBoolean(4))))
      .toMap

  test("a shared 12-word passage marks exactly its fully-contained grams") {
    val rows = run(Seq(
      // passage + 5 words → 17 words, 8 grams, 3 inside the passage
      (1L, s"$passage uno dos tres cuatro cinco"),
      // 3 words + passage → 15 words, 6 grams, 3 inside the passage
      (2L, s"xray yankee zulu $passage"),
      // fresh vocabulary, never duplicated
      (3L, "one two three four five six seven eight nine ten eleven twelve thirteen fourteen fifteen"),
    ))
    assert(rows(1L) === ((8L, 3L, 0.375, false)))
    assert(rows(2L) === ((6L, 3L, 0.5, false)))
    assert(rows(3L) === ((6L, 0L, 0.0, true)))
  }

  test("identical documents are 100% duplicated passages") {
    val twenty =
      "red orange yellow green blue indigo violet cyan magenta teal maroon olive navy coral amber jade ruby pearl onyx quartz"
    val rows = run(Seq((4L, twenty), (5L, twenty)))
    assert(rows(4L) === ((11L, 11L, 1.0, false)))
    assert(rows(5L) === ((11L, 11L, 1.0, false)))
  }

  test("within-document repetition alone is NOT a duplicated passage") {
    val q = "ant bee cat dog elk fox gnu hen ibis jay" // 10 words
    // q twice in ONE doc: the repeated gram's document frequency stays 1
    val rows = run(Seq((6L, s"$q $q")))
    assert(rows(6L) === ((11L, 0L, 0.0, true)))
  }

  test("docs shorter than the gram degrade to one whole-doc gram") {
    val rows = run(Seq(
      (7L, "tiny little doc"),
      (8L, "tiny little doc"), // exact short dup → its single gram shared
      (9L, "other small text")))
    assert(rows(7L) === ((1L, 1L, 1.0, false)))
    assert(rows(8L) === ((1L, 1L, 1.0, false)))
    assert(rows(9L) === ((1L, 0L, 0.0, true)))
  }

  test("registry q72 runs on the corpus and is oracled") {
    val df = graft.SparkEntry.queries("q72_dup_passages")(spark, "/root/testdata/sf0.001")
    assert(df.count() === 500L)
    assert(graft.SparkEntry.oracleSql.contains("q72_dup_passages"))
  }
}
