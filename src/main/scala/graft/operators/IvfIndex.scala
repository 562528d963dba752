package graft.operators

import graft.functions.VectorOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** IVF (inverted-file) index for approximate nearest-neighbor search:
  * k-means coarse quantizer → per-vector cluster assignment → queries probe
  * only the `nprobe` nearest clusters. The other scale path next to
  * sign-LSH (`q27`): at 100 TB the assignment table is the index — queries
  * shuffle only candidate clusters, never the corpus.
  *
  * Training is plain DataFrame algebra: Lloyd iterations with broadcast
  * centroid tables (k rows), distance via the native dot kernel using
  * ‖a−c‖² = ‖a‖² − 2a·c + ‖c‖² (the ‖a‖² term is rank-invariant and
  * dropped). Init is deterministic: the k lowest-id vectors.
  */
object IvfIndex {

  /** cluster_id → centroid (array<double>), after `iters` Lloyd steps.
    *
    * Init seeds from DISTINCT embeddings (duplicate seed vectors would tie
    * every assignment to the lower cluster_id and instantly empty the
    * other), each duplicate group represented by its MINIMUM vec_id — a
    * deterministic choice, where `dropDuplicates` would keep whichever row
    * a partition happened to deliver first. Standard Lloyd caveat still
    * applies: a cluster that loses all members mid-iteration is dropped, so
    * `k` is an upper bound on the returned codebook size — `knn` probes
    * whatever codebook exists.
    */
  def train(emb: DataFrame, k: Int, iters: Int): DataFrame = {
    var centroids = emb
      .groupBy("embedding").agg(min("vec_id").as("vec_id"))
      .orderBy("vec_id").limit(k)
      .select(
        (row_number().over(org.apache.spark.sql.expressions.Window.orderBy("vec_id")) - 1)
          .as("cluster_id"),
        col("embedding").cast("array<double>").as("centroid"))
    for (_ <- 1 to iters) {
      val assigned = assign(emb, centroids)
      centroids = VectorOps.meanVectors(
        assigned.join(emb, "vec_id"), "cluster_id", "embedding")
    }
    centroids
  }

  /** vec_id → nearest cluster_id (ties to the lower cluster id). */
  def assign(emb: DataFrame, centroids: DataFrame): DataFrame =
    emb
      .crossJoin(broadcast(centroids))
      .select(
        col("vec_id"), col("cluster_id"),
        (VectorOps.dot(col("centroid"), col("centroid"))
          - lit(2.0) * VectorOps.dot(col("embedding"), col("centroid"))).as("score"))
      .groupBy("vec_id")
      .agg(min_by(col("cluster_id"), struct(col("score"), col("cluster_id")))
        .as("cluster_id"))

  /** Approximate top-k cosine neighbors for `queries` (must have columns
    * q_id, qe): each query scores only vectors assigned to its `nprobe`
    * nearest clusters.
    */
  def knn(
      emb: DataFrame, centroids: DataFrame, queries: DataFrame,
      topK: Int, nprobe: Int): DataFrame = {
    val probed = queries
      .crossJoin(broadcast(centroids))
      .select(
        col("q_id"), col("qe"), col("cluster_id"),
        (VectorOps.dot(col("centroid"), col("centroid"))
          - lit(2.0) * VectorOps.dot(col("qe"), col("centroid"))).as("score"))
    val probes = RelationalOps.topKPerGroup(
        probed, Seq("q_id"), Seq(col("score").asc, col("cluster_id").asc), nprobe)
      .select("q_id", "qe", "cluster_id")
    val assigned = assign(emb, centroids)
    val scored = emb
      .join(assigned, "vec_id")
      .join(broadcast(probes), Seq("cluster_id"))
      .filter(col("vec_id") =!= col("q_id"))
      .select(
        col("q_id"), col("vec_id").as("neighbor_id"),
        VectorOps.cosine(col("qe"), col("embedding")).as("cosine"))
    RelationalOps.topKPerGroup(
        scored, Seq("q_id"), Seq(col("cosine").desc, col("neighbor_id").asc), topK,
        rankCol = "rnk")
  }
}
