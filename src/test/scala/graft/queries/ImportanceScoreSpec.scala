package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q89: DSIR-style hashed-unigram importance scores (integer-exact
  * linearization). The oracle carries the bit-exact arithmetic check; this
  * spec pins the SEMANTICS: tokens distinctive of the target (high-quality)
  * slice push a doc's score positive, raw-only tokens push it negative,
  * and NULL-text docs never appear.
  */
class ImportanceScoreSpec extends SparkSpec {

  import spark.implicits._

  // Target docs: long plain prose with stopwords (quality ≥ 0.5). Junk
  // docs: short punctuation-heavy strings (quality < 0.5). Token sets are
  // disjoint, so target tokens dominate their md5 buckets (fixed strings →
  // deterministic buckets; a cross-set bucket collision would fail this
  // test on its first run, not flakily).
  private val targetText =
    Seq.fill(30)("the data and model is alpha beta").mkString(" ")
  private lazy val docs = Seq(
    (0L, targetText),
    (1L, targetText),
    (2L, "zzz !!! ??? !!!"),
    (3L, null.asInstanceOf[String])
  ).toDF("doc_id", "text")

  private lazy val scores =
    TextQueries.importanceScoresOf(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .map(t => t._1 -> ((t._2, t._3))).toMap

  test("target-distinctive docs score positive, raw-only docs negative") {
    assert(scores(0L)._1 > 0L)
    assert(scores(1L)._1 > 0L)
    assert(scores(2L)._1 < 0L)
  }

  test("n_tokens counts the doc's own tokens; NULL text drops") {
    assert(scores(0L)._2 === 30L * 7L)
    assert(scores(2L)._2 === 4L)
    assert(!scores.contains(3L))
  }

  test("identical docs get identical scores") {
    assert(scores(0L) === scores(1L))
  }
}
