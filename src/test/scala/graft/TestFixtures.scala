package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Shared spec fixtures. */
object TestFixtures {

  /** The sf embeddings plus one perturbed copy per vector at relative noise
    * `noise` (copy id = base id + 100000), the planted-near-duplicate corpus
    * used by the ANN recall specs. Deterministic: per-vector seeded RNG
    * streams (order-free), fixed repartition.
    */
  def plantedCopies(spark: SparkSession, sf: String, noise: Double): DataFrame = {
    import spark.implicits._
    val base = Tables.embeddings(spark, sf)
      .select("vec_id", "embedding").as[(Long, Array[Float])].collect()
    val copies = base.map { case (id, v) =>
      val rnd  = new scala.util.Random(id)
      val norm = math.sqrt(v.map(x => x.toDouble * x).sum)
      val eps  = noise * norm / math.sqrt(v.length.toDouble)
      (id + 100000L, v.map(x => x + (rnd.nextGaussian() * eps).toFloat))
    }
    (base ++ copies).toSeq.toDF("vec_id", "embedding").repartition(4)
  }
}
