package graft.queries

import graft.SparkSpec
import graft.pipeline.TrainingPipeline
import org.apache.spark.sql.DataFrame

/** Semantics of the q68/q69 benchmark-decontamination family: the
  * GPT-3-style rule is a sharp threshold — sharing a full word 13-gram
  * with the eval set flags a document; sharing 12 consecutive words does
  * not. Plus the short-doc degenerate-gram convention and the
  * TrainingPipeline wiring.
  */
class DecontamSpec extends SparkSpec {

  import spark.implicits._

  // Eval doc 100 is exactly 13 tokens = exactly one 13-gram; eval doc 101
  // is shorter than 13 tokens → one whole-doc degenerate gram.
  private val thirteen =
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima mike"
  private def evalDocs: DataFrame = Seq(
    (100L, thirteen),
    (101L, "quebec romeo sierra"),
  ).toDF("doc_id", "text")

  private def train: DataFrame = Seq(
    // clean: no token in common with the eval set at all
    (1L, "uniform victor whiskey xray yankee zulu uniform victor whiskey xray yankee zulu uniform victor"),
    // contains eval 100's 13-gram inside a longer doc → contaminated
    (2L, s"prefix $thirteen suffix"),
    // shares only the first TWELVE tokens (13th differs) → clean
    (3L, "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima november oscar papa"),
    // exact copy of eval 100 → contaminated (its single gram matches)
    (4L, thirteen),
    // exact copy of the short eval doc → whole-doc grams match
    (5L, "quebec romeo sierra"),
    // CONTAINS the short eval doc's 3 tokens but is ≥13 tokens long: its
    // grams are all 13-long, the eval gram is 3-long → clean by the
    // whole-doc-gram convention (substring containment of sub-13-token
    // eval docs is out of contract)
    (6L, "quebec romeo sierra tango uniform victor whiskey xray yankee zulu tango uniform victor whiskey"),
  ).toDF("doc_id", "text")

  test("13-gram sharing flags; 12-token overlap and clean docs do not") {
    val hits = TextQueries.contaminationHits(train, evalDocs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSeq.sortBy(_._1)
    assert(hits === Seq((2L, 1L, 1L), (4L, 1L, 1L), (5L, 1L, 1L)), hits)
  }

  test("decontaminate removes exactly the flagged docs") {
    val kept = TextQueries.decontaminate(train, evalDocs)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept === Set(1L, 3L, 6L))
  }

  test("a doc overlapping MULTIPLE eval docs reports the distinct counts") {
    val both = Seq((7L, s"$thirteen quebec romeo sierra")).toDF("doc_id", "text")
    // 14+3=16 tokens → grams include eval 100's 13-gram; the short eval
    // gram can't match (all grams are 13-long) — so eval_docs stays 1.
    // Duplicating eval 100 under a new id makes a genuine multi-hit.
    val twoEvals = evalDocs.union(Seq((102L, thirteen)).toDF("doc_id", "text"))
    val hits = TextQueries.contaminationHits(both, twoEvals)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(hits.toSeq === Seq((7L, 1L, 2L)), hits.toSeq)
  }

  test("TrainingPipeline.export with evalDocs ships only decontaminated docs") {
    val cfg = TrainingPipeline.Config(
      minQuality = 0.0, dedup = TrainingPipeline.NoDedup)
    val without = TrainingPipeline.export(train, cfg = cfg)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val withEval = TrainingPipeline.export(
        train, cfg = cfg, evalDocs = Some(evalDocs))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(without === Set(1L, 2L, 3L, 4L, 5L, 6L))
    assert(withEval === Set(1L, 3L, 6L))
  }

  test("registry q68/q69 are consistent: hits + survivors = training slice") {
    val sf = "/root/testdata/sf0.001"
    val hits = graft.SparkEntry.queries("q68_decontam_hits")(spark, sf)
    val kept = graft.SparkEntry.queries("q69_decontam_apply")(spark, sf)
    val nTrain = TextQueries.trainSlice(graft.Tables.documents(spark, sf)).count()
    assert(hits.count() + kept.count() === nTrain)
    // and the two sets are disjoint
    assert(kept.join(hits, Seq("doc_id"), "inner").count() === 0L)
  }
}
