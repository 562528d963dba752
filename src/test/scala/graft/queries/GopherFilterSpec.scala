package graft.queries

import graft.SparkSpec
import graft.pipeline.TrainingPipeline
import org.apache.spark.sql.DataFrame

/** Semantics of the q75 combined Gopher filter
  * ([[TextQueries.gopherFilterAll]]): its one-pass keep-set must equal the
  * intersection of the three registry verdicts (q70 ∧ q71 ∧ q74) by
  * construction, original columns survive, and the TrainingPipeline wiring
  * applies it before dedup.
  */
class GopherFilterSpec extends SparkSpec {

  import spark.implicits._

  // 50 distinct words (so no gram ever repeats) with four of Gopher's
  // required English words — passes all three rule families.
  private val goodText =
    (Seq("the", "and", "with", "of") ++
      (1 to 46).map(i => s"word${('a' + (i % 26)).toChar}$i")).mkString(" ")

  // Exactly ONE required stopword: dropped by the standard ≥2 gate, kept
  // by the q75b relaxed ≥1 gate — the discriminating doc for the twin.
  private val oneStopText =
    (Seq("the") ++ (1 to 49).map(i => s"word${('a' + (i % 26)).toChar}$i"))
      .mkString(" ")

  private def planted: DataFrame = Seq(
    (1L, goodText),
    (2L, Seq.fill(60)("spam").mkString(" ")), // repetitive: fails q70+q74
    (3L, goodText + " # # # # # # # #"),      // symbol-heavy: fails q71
    (4L, (Seq("the", "and", "with", "of") ++ (1 to 46).map(i => s"v$i"))
      .mkString("\n- ", "\n- ", "")),          // all bullet lines: fails q71
    (5L, oneStopText),                         // one stopword: q75b-only
  ).toDF("doc_id", "text")

  test("one-pass keep-set equals the q70 ∧ q71 ∧ q74 intersection") {
    val onePass = TextQueries.gopherFilterAll(planted)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    def passing(df: DataFrame, col: String) =
      df.filter(df(col)).select("doc_id").collect().map(_.getLong(0)).toSet
    val composed =
      passing(TextQueries.repetitionOf(planted), "passes_repetition") &
        passing(TextQueries.gopherQualityOf(planted), "passes_gopher_quality") &
        passing(TextQueries.gopherRepetitionExtOf(planted),
          "passes_gopher_repetition_ext")
    assert(onePass === composed)
    assert(onePass === Set(1L))
  }

  test("every input column survives the filter") {
    val in = planted.withColumn("extra",
      org.apache.spark.sql.functions.col("doc_id") * 2)
    val out = TextQueries.gopherFilterAll(in)
    assert(out.columns.toSeq === in.columns.toSeq)
    assert(out.select("extra").collect().map(_.getLong(0)).toSeq === Seq(2L))
  }

  test("TrainingPipeline.export(gopherFilter = true) drops the failing docs") {
    val cfg = TrainingPipeline.Config(
      minQuality = 0.0, dedup = TrainingPipeline.NoDedup)
    val without = TrainingPipeline.export(planted, cfg = cfg)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val filtered = TrainingPipeline.export(
        planted, cfg = cfg.copy(gopherFilter = true))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(without === Set(1L, 2L, 3L, 4L, 5L))
    assert(filtered === Set(1L))
  }

  test("relaxed keep-set equals the composed relaxed intersection and " +
      "properly contains the standard one") {
    def ids(df: DataFrame) =
      df.select("doc_id").collect().map(_.getLong(0)).toSet
    val standard = ids(TextQueries.gopherFilterAll(planted))
    val relaxed = ids(TextQueries.gopherFilterAll(
      planted, TextQueries.gopherRelaxedMinStops))
    def passing(df: DataFrame, col: String) =
      df.filter(df(col)).select("doc_id").collect().map(_.getLong(0)).toSet
    val composedRelaxed =
      passing(TextQueries.repetitionOf(planted), "passes_repetition") &
        passing(TextQueries.gopherQualityOf(
          planted, TextQueries.gopherRelaxedMinStops), "passes_gopher_quality") &
        passing(TextQueries.gopherRepetitionExtOf(planted),
          "passes_gopher_repetition_ext")
    assert(relaxed === composedRelaxed)
    assert(standard === Set(1L))
    assert(relaxed === Set(1L, 5L)) // strictly larger: the gate discriminates
  }

  test("registry q75b: non-trivial proper subset of the corpus") {
    val sf = "/root/testdata/sf0.001"
    val kept = graft.SparkEntry.queries("q75b_gopher_apply_relaxed")(spark, sf)
      .count()
    val total = graft.Tables.documents(spark, sf).count()
    // The whole point of the twin (round-10 verdict item 1): the oracle
    // check must be discriminating, i.e. keep SOME but not ALL docs, so
    // the hash verifies every still-active gate on a real keep-set.
    assert(kept > 0L, "relaxed gopher filter kept nothing — check passes " +
      "only trivially, like q75")
    assert(kept < total, "relaxed gopher filter kept everything — no gate " +
      "is active")
    assert(graft.SparkEntry.oracleSql.contains("q75b_gopher_apply_relaxed"))
  }

  test("registry q75: corpus result is the (legitimately empty) intersection") {
    val sf = "/root/testdata/sf0.001"
    val df = graft.SparkEntry.queries("q75_gopher_apply")(spark, sf)
    // The synthetic corpus' 31-word lexicon contains only "the" of
    // Gopher's eight required English words, so every document fails
    // q71's ≥2-required-words rule — the full-filter survivor set is
    // genuinely empty here (the oracle replays the same intersection).
    assert(df.count() === 0L)
    val maxStops = TextQueries.gopherQualityOf(graft.Tables.documents(spark, sf))
      .agg(org.apache.spark.sql.functions.max("n_required_stops"))
      .collect().head.getLong(0)
    assert(maxStops <= 1L) // confirms the cause, not just the effect
    assert(graft.SparkEntry.oracleSql.contains("q75_gopher_apply"))
  }
}
