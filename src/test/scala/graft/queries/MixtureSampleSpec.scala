package graft.queries

import graft.SparkSpec
import graft.pipeline.TrainingPipeline
import org.apache.spark.sql.functions._

/** Semantics of the q73 deterministic mixture sampler
  * ([[TextQueries.mixtureSample]]): hex-threshold construction, the
  * rate-0/rate-1/unmapped-language contracts, reproducibility, statistical
  * rate accuracy on the corpus, and the TrainingPipeline wiring (sampling
  * runs LAST, on the predicted language).
  */
class MixtureSampleSpec extends SparkSpec {

  import spark.implicits._

  test("rate → fixed-width hex threshold (floor(r·2^32), lexicographic=numeric)") {
    assert(TextQueries.sampleThresholdHex(0.5) === "80000000")
    assert(TextQueries.sampleThresholdHex(0.25) === "40000000")
    assert(TextQueries.sampleThresholdHex(0.75) === "c0000000")
    assert(TextQueries.sampleThresholdHex(0.0) === "00000000")
  }

  test("rate 0 drops all, rate 1 keeps all, unmapped languages keep") {
    val docs = (1L to 40L).map(i =>
      (i, s"text $i", if (i % 2 == 0) "aa" else if (i % 3 == 0) "bb" else "cc"))
      .toDF("doc_id", "text", "lang")
    val kept = TextQueries.mixtureSample(
        docs, Map("aa" -> 0.0, "bb" -> 1.0))
      .select("doc_id", "lang").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(kept.forall(_._2 != "aa"))
    assert(kept.count(_._2 == "bb") === (1L to 40L).count(i => i % 2 != 0 && i % 3 == 0))
    assert(kept.count(_._2 == "cc") === (1L to 40L).count(i => i % 2 != 0 && i % 3 != 0))
  }

  test("q73 on the corpus: reproducible, well-formed keys, rates hold") {
    val sf = "/root/testdata/sf0.001"
    val a = graft.SparkEntry.queries("q73_mixture_sample")(spark, sf)
    val b = graft.SparkEntry.queries("q73_mixture_sample")(spark, sf)
    val rowsA = a.collect().map(_.toSeq).toSet
    assert(rowsA === b.collect().map(_.toSeq).toSet) // deterministic
    assert(a.filter(!col("sample_key").rlike("^[0-9a-f]{8}$")).count() === 0L)

    val docs = graft.Tables.documents(spark, sf)
    val total = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val kept = a.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // rate-1.0 languages keep every doc
    assert(kept("de") === total("de"))
    assert(kept("zh") === total("zh"))
    // sampled languages land within generous binomial bounds (±~4σ)
    def frac(l: String) = kept.getOrElse(l, 0L).toDouble / total(l)
    assert(frac("en") > 0.3 && frac("en") < 0.7, s"en ${frac("en")}")
    assert(frac("es") > 0.5 && frac("es") < 0.95, s"es ${frac("es")}")
    assert(frac("fr") > 0.05 && frac("fr") < 0.5, s"fr ${frac("fr")}")
  }

  test("TrainingPipeline.export(sampleRates) samples the quality-filtered pool by lang_pred") {
    val sf = "/root/testdata/sf0.001"
    val docs = graft.Tables.documents(spark, sf)
    val cfg = TrainingPipeline.Config(
      minQuality = 0.0, dedup = TrainingPipeline.NoDedup)
    val rates = Map("en" -> 0.5, "fr" -> 0.25)
    val base = TrainingPipeline.export(docs, cfg = cfg)
    val sampled = TrainingPipeline.export(
      docs, cfg = cfg.copy(sampleRates = rates))
    val expected = TextQueries.mixtureSample(base, rates, langCol = "lang_pred")
      .drop("sample_key")
    assert(sampled.columns.toSeq === base.columns.toSeq) // no key leakage
    assert(sampled.collect().map(_.toSeq).toSet ===
      expected.collect().map(_.toSeq).toSet)
    assert(sampled.count() < base.count()) // it actually sampled
  }
}
