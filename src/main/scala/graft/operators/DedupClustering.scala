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
    *
    * Iteration state MUST be checkpointed, not cached: iterative self-joins
    * grow the logical plan exponentially — caching keeps the lineage, and
    * analysis alone blows up after a few rounds. `checkpointDir` picks the
    * failure semantics:
    *
    *   - `None` (default): `localCheckpoint` — partitions pinned in
    *     executor-local storage. Fast (no FS round-trip), but a LOST
    *     EXECUTOR loses its blocks and fails the query, which must restart
    *     from scratch. Right for local mode and short interactive runs.
    *   - `Some(dir)`: reliable `checkpoint()` to `dir` (HDFS/S3 at cluster
    *     scale) — state survives executor loss; Spark recomputes downstream
    *     tasks from the checkpoint instead of failing the job. Right for
    *     long iterative runs on real clusters, at the cost of one
    *     write+read of the label table per iteration.
    *
    * The registered q43/q58 thread `spark.graft.checkpoint.dir` (session
    * conf) into this parameter, so a cluster operator flips semantics
    * without code changes.
    */
  def connectedComponents(
      pairs: DataFrame, maxIters: Int = 20,
      checkpointDir: Option[String] = None): DataFrame = {
    val persist: DataFrame => DataFrame = checkpointDir match {
      case Some(dir) =>
        pairs.sparkSession.sparkContext.setCheckpointDir(dir)
        df => df.checkpoint()
      case None => df => df.localCheckpoint()
    }
    val edges = persist(
      pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
        .unionByName(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
        .distinct())

    var labels = persist(
      edges.groupBy(col("src").as("doc_id"))
        .agg(least(min(col("dst")), first(col("src"))).as("cluster_id")))

    var converged = false
    var i = 0
    while (!converged && i < maxIters) {
      // neighbor labels: for each node, the smallest label among neighbors
      val viaNeighbors = edges
        .join(labels.withColumnRenamed("doc_id", "dst"), "dst")
        .groupBy(col("src").as("doc_id"))
        .agg(min(col("cluster_id")).as("n_label"))
      // carry old + new label through the checkpoint: the convergence probe
      // then filters the MATERIALIZED partitions instead of re-joining next
      // against labels (which would cost an extra shuffle join per round)
      val next = persist(
        labels.join(viaNeighbors, Seq("doc_id"), "left")
          .select(col("doc_id"), col("cluster_id").as("old_id"),
            least(col("cluster_id"), coalesce(col("n_label"), col("cluster_id")))
              .as("cluster_id")))
      // labels only ever decrease, so "changed" is new < old
      val changed = next.filter(col("cluster_id") < col("old_id")).count()
      labels = next.select("doc_id", "cluster_id")
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
