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

  test("trainDet is bit-identical across invocations AND repartitionings") {
    val emb = graft.Tables.embeddings(spark, sf)
    def snap(df: org.apache.spark.sql.DataFrame) =
      IvfIndex.trainDet(df, k = 8, iters = 2)
        .orderBy("cluster_id")
        .collect().map(r => (r.getInt(0), r.getSeq[Double](1).toList)).toSeq
    val base = snap(emb)
    assert(base === snap(emb)) // re-invocation
    // the sorted fold makes the floats partitioning-INDEPENDENT — the
    // property the Summarizer scale path (train) cannot offer, and the one
    // that lets the q39b oracle replay training bit-exactly
    assert(base === snap(emb.repartition(7)))
    assert(base === snap(emb.repartition(1)))
  }

  test("trainDet centroids are the exact sorted-fold means of their members") {
    val emb = graft.Tables.embeddings(spark, sf)
    // one Lloyd step from the deterministic seeds: recompute each cluster's
    // mean independently (driver-side, vec_id-ordered fold) and compare
    // bit-for-bit against the operator's distributed sorted-fold update
    val seeds = IvfIndex.trainDet(emb, k = 8, iters = 0)
    val step  = IvfIndex.trainDet(emb, k = 8, iters = 1)
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1).toArray).toMap
    val members = IvfIndex.assign(emb, seeds)
      .join(emb, "vec_id")
      .select(col("cluster_id"), col("vec_id"),
        col("embedding").cast("array<double>").as("v"))
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getSeq[Double](2).toArray))
    for ((cid, rows) <- members.groupBy(_._1)) {
      val sorted = rows.sortBy(_._2)
      val dim = sorted.head._3.length
      val mean = Array.tabulate(dim) { d =>
        sorted.foldLeft(0.0)((acc, r) => acc + r._3(d)) / sorted.length
      }
      assert(step(cid).toSeq === mean.toSeq, s"cluster $cid")
    }
  }

  test("deterministic-training IVF (q39b) reaches the same recall class as q39") {
    val brute = VectorQueries.queries("q26_knn_brute")(spark, sf)
      .select("q_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val det = VectorQueries.queries("q39b_knn_ivf_det")(spark, sf)
      .select("q_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = brute.intersect(det).size.toDouble / brute.size
    info(s"deterministic IVF recall@5 = $recall")
    assert(recall >= 0.3, s"recall $recall")
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
