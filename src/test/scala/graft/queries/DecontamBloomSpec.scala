package graft.queries

import graft.{SparkSpec, Tables}
import graft.functions.SketchOps
import org.apache.spark.sql.functions._

/** Semantics of the q83 bloom-prefiltered decontamination
  * ([[TextQueries.decontaminateBloom]]): result-identity with the exact
  * q69 path (the bloom is a prefilter, never a decider), planted-overlap
  * removal, and the no-false-negative property of the bloom probe itself.
  */
class DecontamBloomSpec extends SparkSpec {

  import spark.implicits._

  test("bloom probe: every inserted value hits; absent values mostly miss") {
    val grams = (0 until 2000).map(i => s"gram-$i")
    val bytes = SketchOps.buildStringBloom(
      grams.toDF("gram"), "gram", expectedItems = 2000, fpp = 0.01)
    val probed = (grams ++ (0 until 2000).map(i => s"other-$i")).toDF("gram")
      .withColumn("hit", SketchOps.bloomMightContain(col("gram"), bytes))
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(grams.forall(probed)) // no false negatives, ever
    val fp = (0 until 2000).count(i => probed(s"other-$i"))
    assert(fp < 100, s"false-positive count $fp way over the 1% target")
  }

  test("an empty source builds an empty filter instead of throwing") {
    // an optimized-to-empty relation plans zero partitions, where the old
    // partial-filter reduce threw "empty collection" — the prefilter must
    // degrade to "nothing might be contained"
    val empty = Seq.empty[String].toDF("gram").filter(lit(false))
    val bytes = SketchOps.buildStringBloom(
      empty, "gram", expectedItems = 100, fpp = 0.01)
    val hits = Seq("a", "b").toDF("gram")
      .withColumn("hit", SketchOps.bloomMightContain(col("gram"), bytes))
      .collect().map(_.getBoolean(1))
    assert(hits.forall(_ == false))
  }

  test("q83 equals the exact q69 decontamination on the corpus slices") {
    val sf = "/root/testdata/sf0.001"
    val a = graft.SparkEntry.queries("q83_decontam_bloom")(spark, sf)
      .collect().map(_.toSeq).toSet
    val b = graft.SparkEntry.queries("q69_decontam_apply")(spark, sf)
      .collect().map(_.toSeq).toSet
    assert(a === b)
    assert(a.nonEmpty)
  }

  test("a planted 13-gram overlap is caught through the bloom path") {
    val leak = (1 to 13).map(i => s"leak$i").mkString(" ")
    val filler = (1 to 20).map(i => s"w$i").mkString(" ")
    val train = Seq(
      (1L, s"$filler $leak end"), // contaminated: shares the eval 13-gram
      (2L, s"$filler clean tail here")).toDF("doc_id", "text")
    val eval_ = Seq((100L, s"prefix $leak")).toDF("doc_id", "text")
    val kept = TextQueries.decontaminateBloom(train, eval_)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept === Set(2L))
  }
}
