package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The native [[TextFingerprints.gramRunStats]] kernel must be
  * field-for-field identical to the HOF fold reference twin
  * ([[TextOps.gramRunStats]] over [[TextOps.wordGramsWithRepeats]]):
  * gram construction (incl. the whole-doc degenerate gram), binary sort
  * order, run counting, the smallest-gram tie-break, and code-point (not
  * byte) char accounting.
  */
class GramRunStatsKernelSpec extends SparkSpec {

  import spark.implicits._

  private def compare(texts: Seq[String], ns: Seq[Int]): Unit = {
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
      .select(col("doc_id"),
        TextOps.tokens(TextOps.normalized(col("text"))).as("toks"))
    for (n <- ns) {
      val rows = df.select(col("doc_id"),
        TextFingerprints.gramRunStats(col("toks"), n).as("native"),
        TextOps.gramRunStats(TextOps.wordGramsWithRepeats(col("toks"), n))
          .as("fold"))
        .select(col("doc_id"),
          col("native.top_count"), col("native.top_gram"),
          col("native.dup_chars"), col("native.total_chars"),
          col("fold.top_count").as("f_top_count"),
          col("fold.top_gram").as("f_top_gram"),
          col("fold.dup_chars").as("f_dup_chars"),
          col("fold.total_chars").as("f_total_chars"))
        .collect()
      rows.foreach { r =>
        assert(r.getLong(1) === r.getLong(5), s"n=$n top_count doc=${r.getLong(0)}")
        assert(r.getString(2) === r.getString(6), s"n=$n top_gram doc=${r.getLong(0)}")
        assert(r.getLong(3) === r.getLong(7), s"n=$n dup_chars doc=${r.getLong(0)}")
        assert(r.getLong(4) === r.getLong(8), s"n=$n total_chars doc=${r.getLong(0)}")
      }
    }
  }

  test("fixtures: repetition patterns, ties, degenerates, unicode") {
    compare(Seq(
      "a b a b a b",                          // alternating, all dup
      "one two three four five six seven",    // all unique, tie-break
      "x y z w v x y z w v x y z w v",        // periodic
      "only three words",                     // shorter than large n
      "single",                               // one token
      "",                                     // empty text → [""] token
      "b b b a a a",                          // count tie → smallest gram
      "é 中文 é 中文 é naïve",                 // multi-byte: chars ≠ bytes
      "spam spam spam spam spam spam spam",   // single repeated token
    ), ns = Seq(1, 2, 3, 5, 10))
  }

  test("seeded random corpora agree for every Gopher n") {
    val rnd = new scala.util.Random(20260813L)
    val words = Seq("aa", "bb", "cc", "ddd", "e", "ffff", "中", "gé")
    val texts = (1 to 150).map { _ =>
      val len = 1 + rnd.nextInt(40)
      (1 to len).map(_ => words(rnd.nextInt(words.length))).mkString(" ")
    }
    compare(texts, ns = 2 to 10)
  }

  test("kernel runs inside codegen on the corpus (plan-asserted)") {
    val df = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(TextFingerprints.gramRunStats(
        TextOps.tokens(TextOps.normalized(col("text"))), 3).as("g"))
      .select(col("g.top_count"))
    // the GENERATED code must contain the direct static kernel call —
    // an expression that lost doGenCode would fall back to interpreted
    // eval (reflective call on the expression object) and still return
    // correct values, so a result-only smoke can't catch the regression
    val gen = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("codegen"))
    assert(gen.contains("TextKernels.gramRunStats"), gen.take(2000))
    assert(df.agg(max("top_count")).collect().head.getLong(0) >= 1L)
  }
}
