package graft.queries

import graft.SparkSpec
import graft.functions.TextOps
import org.apache.spark.ml.feature.{HashingTF, MinHashLSH}
import org.apache.spark.sql.functions._

/** Cross-validate our custom MinHash+LSH dedup path against Spark ML's
  * MinHashLSH: both must surface (essentially all of) the same true
  * near-duplicate pairs. Different hash families ⇒ different candidate
  * sets are expected; agreement on the high-Jaccard truth is required.
  */
class MllibLshCrossCheckSpec extends SparkSpec {

  test("ml MinHashLSH finds the near-dup pairs our LSH+Jaccard confirms") {
    val sf = "/root/testdata/sf0.01"

    // ground truth from our pipeline: candidates verified at jaccard >= 0.9
    val ours = TextQueries.queries("q23_jaccard")(spark, sf)
      .filter(col("jaccard") >= 0.9)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(ours.nonEmpty)

    val docs = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), TextOps.wordShingles(col("text"), 3).as("sh"))
    val tf = new HashingTF().setInputCol("sh").setOutputCol("features")
      .setNumFeatures(1 << 18)
    val feats = tf.transform(docs).filter(size(col("sh")) > 0)
    val lsh = new MinHashLSH().setInputCol("features").setOutputCol("hashes")
      .setNumHashTables(8).setSeed(42)
    val model = lsh.fit(feats)
    val mlPairs = model
      .approxSimilarityJoin(feats, feats, 0.15, "dist")
      .select(
        col("datasetA.doc_id").as("a"),
        col("datasetB.doc_id").as("b"))
      .filter(col("a") < col("b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val overlap = ours.intersect(mlPairs).size.toDouble / ours.size
    info(s"custom-LSH truth pairs: ${ours.size}; ml recall of them: $overlap")
    assert(overlap >= 0.8, s"ml MinHashLSH found only $overlap of our pairs")

    // REVERSE direction — the half that catches an UNDER-emitting custom
    // LSH (a banding bug collapsing our candidate set would still pass
    // the forward check on the few pairs left): of ML's candidates that
    // verify at true Jaccard >= 0.9 on our shingles, our pipeline must
    // also surface >= 80%.
    val shingles = docs.collect()
      .map(r => r.getLong(0) -> Option(r.getSeq[String](1)).map(_.toSet)
        .getOrElse(Set.empty)).toMap
    def jac(a: Long, b: Long): Double = {
      val (sa, sb) = (shingles(a), shingles(b))
      if (sa.isEmpty && sb.isEmpty) 0.0
      else sa.intersect(sb).size.toDouble / sa.union(sb).size
    }
    val mlTruth = mlPairs.filter { case (a, b) => jac(a, b) >= 0.9 }
    assert(mlTruth.nonEmpty, "ml surfaced no high-Jaccard pairs to cross-check")
    val reverse = mlTruth.intersect(ours).size.toDouble / mlTruth.size
    info(s"ml truth pairs: ${mlTruth.size}; our recall of them: $reverse")
    assert(reverse >= 0.8, s"our LSH found only $reverse of ml's verified pairs")
  }
}
