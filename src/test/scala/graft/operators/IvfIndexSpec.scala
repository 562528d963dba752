package graft.operators

import graft.SparkSpec
import graft.queries.VectorQueries
import org.apache.spark.sql.functions._

class IvfIndexSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("every vector lands in exactly one cluster") {
    val emb = graft.Tables.embeddings(spark, sf)
    val centroids = IvfIndex.train(emb, k = 8, iters = 1)
    val assigned  = IvfIndex.assign(emb, centroids)
    assert(assigned.count() === emb.count())
    assert(assigned.select("vec_id").distinct().count() === emb.count())
    val clusters = assigned.select("cluster_id").distinct().count()
    assert(clusters > 1 && clusters <= 8)
  }

  test("seeding samples via TakeOrderedAndProject — no full-corpus shuffle") {
    val emb = graft.Tables.embeddings(spark, sf)
    // assert on the SHIPPED seeding path (IvfIndex.seedSample feeds
    // train), not an inline rebuild of the query — a seeding regression
    // in the operator must fail this, not just a lookalike
    val seeds = IvfIndex.seedSample(emb, k = 8)
    val plan = seeds.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
    assert(!plan.contains("Exchange"), plan)
  }

  test("train is deterministic across invocations") {
    val emb = graft.Tables.embeddings(spark, sf)
    def snap() = IvfIndex.train(emb, k = 8, iters = 1)
      .orderBy("cluster_id").collect().map(_.toString).toSeq
    assert(snap() === snap())
  }

  test("clustered layout prunes partitions and matches the in-memory kNN") {
    val emb = graft.Tables.embeddings(spark, sf)
    val centroids = IvfIndex.train(emb, k = 8, iters = 1)
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf_layout").toString
    IvfIndex.writeClustered(emb, centroids, dir)
    val dirs = new java.io.File(dir).listFiles().filter(_.isDirectory).map(_.getName)
    assert(dirs.nonEmpty && dirs.forall(_.startsWith("cluster_id=")), dirs.toSeq)

    val qs = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("embedding").as("qe"))
    val clustered = IvfIndex.knnClustered(dir, centroids, qs,
      topK = 5, nprobe = 2)
    val plan = clustered.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("simple"))
    // the filter list must be NON-EMPTY and name the partition column —
    // bare "PartitionFilters: [" matches even a fully unpruned scan
    assert(raw"PartitionFilters: \[[^\]]*cluster_id".r.findFirstIn(plan).isDefined, plan)

    def snap(df: org.apache.spark.sql.DataFrame) = df
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
      .sortBy(x => (x._1, x._4))
    assert(snap(clustered) ===
      snap(IvfIndex.knn(emb, centroids, qs, topK = 5, nprobe = 2)))
  }

  test("IVF kNN reaches useful recall vs the exact brute force") {
    val brute = VectorQueries.queries("q26_knn_brute")(spark, sf)
      .select("q_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = VectorQueries.queries("q39_knn_ivf")(spark, sf)
      .select("q_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = brute.intersect(ivf).size.toDouble / brute.size
    info(s"IVF recall@5 = $recall")
    assert(recall >= 0.3, s"recall $recall")
  }
}
