package graft.queries

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Semantics + recall of the q85 embedding-space decontamination
  * ([[VectorQueries.embedDecontaminate]]): train vectors near an eval
  * vector are refused through the verified-LSH candidate pipeline, the
  * eval slice itself never appears in the output, and the refusal set is
  * exactly the exact-cosine verification of the cross-slice LSH candidates
  * (the q35 candidate rule, restricted to (train, eval) pairs).
  */
class EmbedDecontamSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("planted eval copies refuse their train originals (recall >= 0.95)") {
    import spark.implicits._
    val base = Tables.embeddings(spark, sf)
      .select("vec_id", "embedding").as[(Long, Array[Float])].collect()
    // train originals: ids not divisible by 25; eval plants: noisy copies
    // (cosine ~0.995) at ids ≡ 0 (mod 25) — the decontaminator must catch
    // each original via its planted eval twin
    val originals = base.filter(_._1 % 25 != 0).take(200)
    val plants = originals.zipWithIndex.map { case ((id, v), i) =>
      val rnd  = new scala.util.Random(id)
      val norm = math.sqrt(v.map(x => x.toDouble * x).sum)
      val eps  = 0.1 * norm / math.sqrt(v.length.toDouble)
      (100000L + 25L * i, v.map(x => x + (rnd.nextGaussian() * eps).toFloat))
    }
    val emb = (base ++ plants).toSeq.toDF("vec_id", "embedding").repartition(4)
    val admitted = VectorQueries
      .embedDecontaminate(emb, col("vec_id") % 25 === 0)
      .select("vec_id").as[Long].collect().toSet
    val refused = originals.map(_._1).count(!admitted.contains(_))
    val recall = refused.toDouble / originals.length
    info(s"planted-copy refusal recall = $recall")
    assert(recall >= 0.95, s"recall $recall")
  }

  test("q85 refusals are exactly the verified cross-slice LSH candidates") {
    val emb = Tables.embeddings(spark, sf)
    def slice(id: org.apache.spark.sql.Column) = id % 25
    // the q35 pair-level candidate set, restricted to one-end-eval pairs,
    // exact-verified above the threshold → expected refused train ids
    val cand = VectorQueries.lshCandidatePairs(emb)
    val verified = VectorQueries.neardupExact(emb, 0.4)
      .join(cand, Seq("id_a", "id_b"), "left_semi")
    val refusedExpected = verified
      .select(explode(array(
        struct(col("id_a").as("t"), col("id_b").as("e")),
        struct(col("id_b").as("t"), col("id_a").as("e")))).as("p"))
      .filter(slice(col("p.t")) =!= 0 && slice(col("p.e")) === 0)
      .select(col("p.t")).collect().map(_.getLong(0)).toSet
    val trainIds = emb.filter(slice(col("vec_id")) =!= 0)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val admitted = VectorQueries.queries("q85_embed_decontam")(spark, sf)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(admitted === trainIds -- refusedExpected)
    // and the eval slice never leaks into the output
    assert(admitted.forall(_ % 25 != 0))
  }
}
