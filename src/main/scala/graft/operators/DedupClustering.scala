package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Duplicate-cluster resolution: near-dup PAIRS (q22/q23) become duplicate
  * CLUSTERS via connected components, so each group keeps one canonical
  * document. Min-label propagation: every node's label is the smallest
  * doc_id reachable from it; iterate label = min(label, neighbors' labels)
  * to fixpoint. Each iteration is one shuffle join + one aggregation;
  * iteration count is the graph diameter (tiny for dup clusters, which are
  * near-cliques — LSH emits most intra-cluster edges directly).
  */
object DedupClustering {

  /** pairs(doc_a, doc_b) → (doc_id, cluster_id) where cluster_id is the
    * minimum doc_id of the component. Only documents that appear in at
    * least one pair are returned (singletons are their own cluster by
    * definition and need no rows at scale).
    */
  def connectedComponents(pairs: DataFrame, maxIters: Int = 20): DataFrame = {
    // localCheckpoint (not cache) on every iteration state: iterative
    // self-joins grow the LOGICAL plan exponentially — caching keeps the
    // lineage and analysis alone blows up after a few rounds; checkpointing
    // truncates it to the materialized partitions.
    val edges = pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .unionByName(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      .distinct()
      .localCheckpoint()

    var labels = edges.groupBy(col("src").as("doc_id"))
      .agg(least(min(col("dst")), first(col("src"))).as("cluster_id"))
      .localCheckpoint()

    var converged = false
    var i = 0
    while (!converged && i < maxIters) {
      // neighbor labels: for each node, the smallest label among neighbors
      val viaNeighbors = edges
        .join(labels.withColumnRenamed("doc_id", "dst"), "dst")
        .groupBy(col("src").as("doc_id"))
        .agg(min(col("cluster_id")).as("n_label"))
      val next = labels.join(viaNeighbors, Seq("doc_id"), "left")
        .select(col("doc_id"),
          least(col("cluster_id"), coalesce(col("n_label"), col("cluster_id")))
            .as("cluster_id"))
        .localCheckpoint()
      val changed = next.alias("n")
        .join(labels.alias("o"), "doc_id")
        .filter(col("n.cluster_id") =!= col("o.cluster_id"))
        .count()
      labels = next
      converged = changed == 0
      i += 1
    }
    // returning unconverged labels would silently split one component into
    // several clusters — fail loudly instead (diameter exceeded maxIters)
    if (!converged) throw new IllegalStateException(
      s"connectedComponents did not converge within $maxIters iterations — " +
        "increase maxIters (component diameter exceeds it)")
    labels
  }
}
