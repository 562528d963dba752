package graft.queries

import graft.SparkSpec
import graft.pipeline.TrainingPipeline
import org.apache.spark.sql.functions._

/** Semantics of the q78 quality-proportional sampler
  * ([[TextQueries.qualitySample]]): keep probability equals the quality
  * score, the decision is reproducible, its hash stream is independent of
  * the q73 language sampler, and the pipeline wiring composes it after
  * the hard threshold.
  */
class QualitySampleSpec extends SparkSpec {

  import spark.implicits._

  test("kept fraction tracks mean quality on the corpus; reproducible") {
    val sf = "/root/testdata/sf0.001"
    val a = graft.SparkEntry.queries("q78_quality_sample")(spark, sf)
    val b = graft.SparkEntry.queries("q78_quality_sample")(spark, sf)
    val rowsA = a.collect().map(_.toSeq).toSet
    assert(rowsA === b.collect().map(_.toSeq).toSet)
    val n = graft.Tables.documents(spark, sf).count().toDouble
    val meanQ = TextQueries.scoreDocs(graft.Tables.documents(spark, sf))
      .agg(avg("quality")).collect().head.getDouble(0)
    val frac = rowsA.size / n
    // Bernoulli(p_i) sum: σ ≤ 0.5/√n ≈ 0.022 at n=500 → ±0.09 is > 4σ
    assert(math.abs(frac - meanQ) < 0.09, s"frac $frac vs meanQ $meanQ (n=$n)")
  }

  test("quality 0 never keeps; quality ~1 keeps") {
    // 100+ words, 25% "the" (stopword term saturates), no punctuation →
    // quality exactly 1.0; the all-punct doc scores ~0
    val high = (1 to 25).map(i => s"the w$i x$i y$i").mkString(" ")
    val scored = TextQueries.scoreDocs(
      Seq((1L, high), (2L, "!!! ??? ### $$$")).toDF("doc_id", "text"))
    val q = scored.collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(q(1L) === 1.0)
    assert(q(2L) < 0.35)
    val kept = TextQueries.qualitySample(scored)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept.contains(1L)) // P(drop) = 2^-32: deterministic here
  }

  test("the ':qs' stream is independent of q73's ':mix' stream") {
    val sf = "/root/testdata/sf0.001"
    val mix = graft.SparkEntry.queries("q73_mixture_sample")(spark, sf)
      .select("doc_id", "sample_key").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val qs = graft.SparkEntry.queries("q78_quality_sample")(spark, sf)
      .select("doc_id", "sample_key").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val common = mix.keySet & qs.keySet
    assert(common.nonEmpty)
    // independence is a POPULATION property: md5 streams under different
    // salts should collide on ~0 of ~500 keys — `exists(_ != _)` would
    // pass even if 99.8% of the keys were identical (the ShuffleShardSpec
    // bound, applied here)
    val equal = common.count(id => mix(id) == qs(id))
    assert(equal.toDouble / common.size < 0.01,
      s"$equal of ${common.size} keys identical across ':mix'/':qs' salts")
  }

  test("TrainingPipeline.export(qualitySample = true) subsets the hard-filtered pool") {
    val sf = "/root/testdata/sf0.001"
    val docs = graft.Tables.documents(spark, sf)
    val cfg = TrainingPipeline.Config(
      minQuality = 0.0, dedup = TrainingPipeline.NoDedup)
    val base = TrainingPipeline.export(docs, cfg = cfg)
    val soft = TrainingPipeline.export(docs, cfg = cfg.copy(qualitySample = true))
    val baseIds = base.select("doc_id").collect().map(_.getLong(0)).toSet
    val softIds = soft.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(softIds.subsetOf(baseIds))
    assert(softIds.size < baseIds.size && softIds.nonEmpty)
    assert(soft.columns.toSeq === base.columns.toSeq) // no key leakage
    assert(graft.SparkEntry.oracleSql.contains("q78_quality_sample"))
  }
}
