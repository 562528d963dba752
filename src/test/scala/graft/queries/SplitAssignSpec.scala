package graft.queries

import graft.{SparkEntry, SparkSpec, Tables}
import graft.pipeline.TrainingPipeline
import org.apache.spark.sql.functions._

/** Semantics of the q80 leakage-safe split ([[TextQueries.splitAssignOf]]):
  * near-dup pairs can never straddle the train/eval boundary (the split key
  * hashes the CLUSTER id, not the doc id), group ids agree with the q43
  * clusters, the key/threshold CASE is internally consistent, fractions
  * land in binomial bounds, and the pipeline helper mirrors the registry.
  */
class SplitAssignSpec extends SparkSpec {

  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("planted near-dup pairs always share a split; singletons key on doc_id") {
    // 10 exact-copy pairs + 10 singletons at 0.5/0.25/0.25 — under a
    // (buggy) doc_id-keyed hash each pair agrees with probability only
    // 0.375, so ten deterministic pairs separate with near-certainty
    // token alphabets are disjoint per document family (p<i>t<j> / q<i>z<j>)
    // so no two distinct bodies share a single shingle
    val docs = ((0 until 10).flatMap { i =>
      val body = Seq.tabulate(40)(j => s"p${i}t$j").mkString(" ")
      Seq((1000L + i, body), (2000L + i, body))
    } ++ (0 until 10).map { i =>
      (3000L + i, Seq.tabulate(40)(j => s"q${i}z$j").mkString(" "))
    }).toDF("doc_id", "text")
    val out = TextQueries.splitAssignOf(docs, trainFrac = 0.5, valFrac = 0.25)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(3)))).toMap
    assert(out.size === 30)
    for (i <- 0 until 10) {
      assert(out(1000L + i)._2 === out(2000L + i)._2, s"pair $i split apart")
      assert(out(1000L + i)._1 === 1000L + i) // cluster label = min doc_id
      assert(out(2000L + i)._1 === 1000L + i)
      assert(out(3000L + i)._1 === 3000L + i) // singleton keys on itself
    }
    assert(out.values.map(_._2).toSet === Set("train", "val", "test"))
  }

  test("q80 on the corpus: partition, q43 cohesion, thresholds, fractions") {
    val out = SparkEntry.queries("q80_split_assign")(spark, sf).cache()
    try {
      val docs = Tables.documents(spark, sf)
      assert(out.count() === docs.count())
      assert(out.select("doc_id").distinct().count() === docs.count())
      // clustered docs carry their q43 cluster id as the split group
      val q43 = SparkEntry.queries("q43_dedup_clusters")(spark, sf)
      assert(out.join(q43, "doc_id") // null-safe: NULL group_id must FAIL
        .filter(!(col("group_id") <=> col("cluster_id"))).count() === 0L)
      // split agrees with its own key at the 90/5/5 thresholds
      val trainHex = TextQueries.sampleThresholdHex(TextQueries.splitTrainFrac)
      val valHex = TextQueries.sampleThresholdHex(
        TextQueries.splitTrainFrac + TextQueries.splitValFrac)
      assert(out.filter(col("split") === "train" &&
        col("split_key") >= trainHex).count() === 0L)
      assert(out.filter(col("split") === "val" &&
        (col("split_key") < trainHex || col("split_key") >= valHex)).count() === 0L)
      assert(out.filter(col("split") === "test" &&
        col("split_key") < valHex).count() === 0L)
      // fractions within generous (±~4σ) binomial bounds
      val n = out.count().toDouble
      val frac = out.groupBy("split").count().collect()
        .map(r => r.getString(0) -> r.getLong(1) / n).toMap
        .withDefaultValue(0.0)
      assert(frac("train") > 0.80 && frac("train") < 0.97, s"train ${frac("train")}")
      assert(frac("val") > 0.005 && frac("val") < 0.15, s"val ${frac("val")}")
      assert(frac("test") > 0.005 && frac("test") < 0.15, s"test ${frac("test")}")
      // deterministic
      val again = SparkEntry.queries("q80_split_assign")(spark, sf)
      assert(out.collect().map(_.toSeq).toSet ===
        again.collect().map(_.toSeq).toSet)
    } finally out.unpersist()
  }

  test("fraction boundaries at 1.0: threshold clamps instead of misrouting") {
    // floor(1.0·2^32) formats as 9-char "100000000"; char-by-char compare
    // against 8-char keys sent 15/16 of the space to the WRONG split
    // before the "g" sentinel clamp
    val docs = Tables.documents(spark, sf)
    val trainVal = TextQueries.splitAssignOf(docs, trainFrac = 0.9, valFrac = 0.1)
      .select("split").distinct().collect().map(_.getString(0)).toSet
    assert(!trainVal.contains("test"), s"train+val=1.0 leaked a test split: $trainVal")
    val allTrain = TextQueries.splitAssignOf(docs, trainFrac = 1.0, valFrac = 0.0)
      .select("split").distinct().collect().map(_.getString(0)).toSet
    assert(allTrain === Set("train"), s"trainFrac=1.0 leaked: $allTrain")
  }

  test("TrainingPipeline.assignSplits mirrors the registry q80") {
    val viaPipeline = TrainingPipeline.assignSplits(Tables.documents(spark, sf))
      .collect().map(_.toSeq).toSet
    val viaRegistry = SparkEntry.queries("q80_split_assign")(spark, sf)
      .collect().map(_.toSeq).toSet
    assert(viaPipeline === viaRegistry)
  }
}
