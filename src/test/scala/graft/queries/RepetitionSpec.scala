package graft.queries

import graft.SparkSpec
import graft.functions.TextOps
import org.apache.spark.sql.functions._

/** Hand-computed ground truth for the q70 Gopher-repetition kernel
  * ([[TextOps.gramRunStats]] over [[TextOps.wordGramsWithRepeats]]):
  * run counting, the (count desc, gram asc) tie-break the sorted walk
  * gives for free, duplicate-char accounting, and the threshold verdict.
  */
class RepetitionSpec extends SparkSpec {

  import spark.implicits._

  private def stats(text: String, n: Int) =
    Seq((1L, text)).toDF("doc_id", "text")
      .select(TextOps.gramRunStats(TextOps.wordGramsWithRepeats(
        TextOps.tokens(TextOps.normalized(col("text"))), n)).as("g"))
      .select("g.top_count", "g.top_gram", "g.dup_chars", "g.total_chars")
      .collect().head

  test("alternating text: top 2-gram counted across overlapping positions") {
    val r = stats("a b a b a b", 2)
    // grams: "a b"×3, "b a"×2 → top ("a b", 3); dup chars 3·3 + 2·3 = 15
    assert((r.getLong(0), r.getString(1)) === ((3L, "a b")))
    assert(r.getLong(2) === 15L) // every gram is duplicated here
    assert(r.getLong(3) === 15L)
  }

  test("all-unique grams: count 1, tie breaks to the smallest gram") {
    val r = stats("one two three four five six seven", 2)
    assert((r.getLong(0), r.getString(1)) === ((1L, "five six")))
    assert(r.getLong(2) === 0L)
    assert(r.getLong(3) === 52L)
  }

  test("periodic text: every 5-gram duplicated → dup fraction 1.0") {
    val r = stats("x y z w v x y z w v x y z w v", 5)
    assert(r.getLong(0) === 3L)           // the period-aligned gram
    assert(r.getLong(2) === r.getLong(3)) // all gram chars are duplicate chars
  }

  test("short doc degrades to one whole-doc gram") {
    val r = stats("only three words", 5)
    assert((r.getLong(0), r.getString(1)) === ((1L, "only three words")))
    assert(r.getLong(2) === 0L)
  }

  test("q70 verdict: repetitive docs fail, normal docs pass") {
    val rows = graft.SparkEntry
      .queries("q70_repetition")(spark, "/root/testdata/sf0.001")
    assert(rows.count() > 0)
    // verdict behavior asserted on planted docs (the 31-word word-soup
    // corpus has no engineered repetition extremes to pin)
    val planted = Seq(
      (1L, "a b a b a b a b a b a b"),                    // fails top2
      (2L, "x y z w v x y z w v x y z w v"),              // fails dup5
      (3L, "the quick brown fox jumps over the lazy dog while rain falls"),
    ).toDF("doc_id", "text")
    val byId = planted
      .select(col("doc_id"), TextOps.normalized(col("text")).as("norm"))
      .select(col("doc_id"), TextOps.tokens(col("norm")).as("toks"))
      .select(col("doc_id"),
        TextOps.gramRunStats(TextOps.wordGramsWithRepeats(col("toks"), 2)).as("g2"),
        TextOps.gramRunStats(TextOps.wordGramsWithRepeats(col("toks"), 5)).as("g5"))
      .select(col("doc_id"),
        ((col("g2.top_count") * length(col("g2.top_gram")).cast("long")).cast("double")
          / greatest(col("g2.total_chars"), lit(1L)).cast("double") <= 0.20 &&
         col("g5.dup_chars").cast("double")
          / greatest(col("g5.total_chars"), lit(1L)).cast("double") <= 0.15)
          .as("passes"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(byId === Map(1L -> false, 2L -> false, 3L -> true))
  }
}
