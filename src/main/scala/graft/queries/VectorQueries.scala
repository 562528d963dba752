package graft.queries

import graft.Tables
import graft.functions.VectorOps
import graft.operators.{IvfIndex, RelationalOps}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table (`array<float>` × 64).
  *
  * q26 is the exact baseline: brute-force cosine top-k for a small query
  * set (broadcast) — O(Q·N) but embarrassingly parallel, no shuffle until
  * the final per-query top-k. q27 is the scale path: multi-table sign-LSH
  * bucketing (4 tables × 8 fixed hyperplanes, seed 42) so each query only
  * scores bucket-mates — the candidate join keys on (table, bucket) and
  * survives 100× data.
  */
object VectorQueries {

  type Q = (SparkSession, String) => DataFrame

  private val nQueries = 10
  private val topK     = 5

  /** Deterministic hyperplanes for sign-LSH: `nTables` independent tables
    * of `nBits` planes each (multi-table LSH — one 2^nBits bucketing alone
    * has near-zero recall; OR-ing tables restores it). Fixed seed — same
    * planes every run.
    */
  private val nTables = 4
  private val nBits   = 8
  private[queries] val planes: Array[Array[Array[Double]]] = {
    val rnd = new scala.util.Random(42)
    Array.fill(nTables, nBits, 64)(rnd.nextGaussian())
  }

  /** Bucket id of one LSH table: sign pattern of `nBits` hyperplane dots. */
  private def bucketCol(emb: org.apache.spark.sql.Column, table: Int) = {
    val bits = planes(table).zipWithIndex.map { case (p, j) =>
      when(VectorOps.dot(emb, typedlit(p.toSeq)) > 0.0, lit(1L << j)).otherwise(0L)
    }
    bits.reduce(_ + _)
  }

  private def withBuckets(df: DataFrame): DataFrame =
    df.select(
      col("*"),
      posexplode(array((0 until nTables).map(t => bucketCol(col("embedding"), t)): _*))
        .as(Seq("table", "bucket")))

  private def knnFrom(base: DataFrame, queries: DataFrame): DataFrame = {
    val scored = base
      .join(broadcast(queries), col("vec_id") =!= col("q_id"))
      .select(
        col("q_id"), col("vec_id").as("neighbor_id"),
        VectorOps.cosine(col("qe"), col("embedding")).as("cosine"))
    RelationalOps.topKPerGroup(
        scored, Seq("q_id"), Seq(col("cosine").desc, col("neighbor_id").asc), topK,
        rankCol = "rnk")
  }

  val queries: Map[String, Q] = Map(
    // Exact brute-force cosine kNN (oracle-checked baseline).
    "q26_knn_brute" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val qs  = emb.filter(col("vec_id") < nQueries)
        .select(col("vec_id").as("q_id"), col("embedding").as("qe"))
      knnFrom(emb, qs)
    }),

    // Approximate kNN: score only candidates sharing an LSH bucket with the
    // query in ≥1 of the 4 tables (scale path — no all-pairs scan).
    "q27_knn_lsh" -> ((s, d) => {
      val emb = withBuckets(Tables.embeddings(s, d))
      val qs = emb.filter(col("vec_id") < nQueries)
        .select(col("vec_id").as("q_id"), col("embedding").as("qe"),
          col("table"), col("bucket"))
      // Dedup multi-table collisions on the (q_id, neighbor_id) ID pair
      // BEFORE fetching vectors — a distinct over the embedding arrays
      // themselves would shuffle full vectors instead of 16-byte pairs.
      val candidates = emb
        .join(broadcast(qs.select("q_id", "table", "bucket")), Seq("table", "bucket"))
        .filter(col("vec_id") =!= col("q_id"))
        .select(col("q_id"), col("vec_id").as("neighbor_id"))
        .distinct()
      val scored = candidates
        .join(broadcast(qs.select(col("q_id"), col("qe")).distinct()), Seq("q_id"))
        .join(Tables.embeddings(s, d)
          .select(col("vec_id").as("neighbor_id"), col("embedding")), Seq("neighbor_id"))
        .select(
          col("q_id"), col("neighbor_id"),
          VectorOps.cosine(col("qe"), col("embedding")).as("cosine"))
      RelationalOps.topKPerGroup(
          scored, Seq("q_id"), Seq(col("cosine").desc, col("neighbor_id").asc), topK,
          rankCol = "rnk")
    }),

    // Embedding-cosine near-duplicate pairs: exact all-pairs baseline at
    // verification scale (the LSH bucketing of q27 is the 100 TB candidate
    // generator; this is the verify stage it feeds, like q22 → q23).
    "q35_embed_neardup" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      val a = e.select(col("vec_id").as("id_a"), col("embedding").as("ea"))
      val b = e.select(col("vec_id").as("id_b"), col("embedding").as("eb"))
      a.join(b, col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b"),
          VectorOps.cosine(col("ea"), col("eb")).as("cosine"))
        .filter(col("cosine") > 0.4)
    }),

    // IVF approximate kNN: k-means coarse quantizer, nprobe cluster probes.
    // Centroid averages are float-sum order dependent → rows-only check;
    // IvfIndexSpec bounds recall against the exact q26 answers.
    "q39_knn_ivf" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val centroids = IvfIndex.train(emb, k = 16, iters = 2)
      val qs = emb.filter(col("vec_id") < nQueries)
        .select(col("vec_id").as("q_id"), col("embedding").as("qe"))
      IvfIndex.knn(emb, centroids, qs, topK, nprobe = 4)
    }),

    // Per-row vector stats (array access + deterministic norm).
    "q28_embed_stats" -> ((s, d) => {
      Tables.embeddings(s, d).select(
        col("vec_id"), col("label").cast("int").as("label"),
        element_at(col("embedding"), 1).cast("double").as("dim0"),
        VectorOps.l2Norm(col("embedding")).as("l2_norm"))
    }),

    // Per-label, per-dimension centroid, bit-exact: each (label, dim)
    // group's values are summed left-to-right in vec_id order (sort_array
    // over collect_list'd (vec_id, v) structs → HOF fold), so the result
    // is deterministic and DuckDB-oracled — unlike a plain avg(), whose
    // float-add order is partition-dependent. This is the VERIFIABLE
    // formulation; [[VectorOps.meanVectors]] (shuffle-agg avg, no per-group
    // materialization) stays the 100 TB scale path used by IVF training,
    // where ±1 ulp in a centroid is irrelevant. Flat (label, dim, centroid)
    // output — no array columns, which the driver's compare cannot sort.
    "q29_centroid" -> ((s, d) => {
      Tables.embeddings(s, d)
        .select(col("label").cast("int").as("label"), col("vec_id"),
          posexplode(col("embedding").cast("array<double>")).as(Seq("dim", "v")))
        .groupBy("label", "dim")
        .agg(
          aggregate(
            transform(
              array_sort(collect_list(struct(col("vec_id"), col("v")))),
              x => x.getField("v")),
            lit(0.0), (acc, x) => acc + x).as("ssum"),
          count(lit(1)).as("n"))
        .select(col("label"), col("dim").cast("int").as("dim"),
          (col("ssum") / col("n")).as("centroid"), col("n"))
    }),
  )

  private val dotSql =
    "list_sum(list_transform(list_zip(CAST(qe AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])), p -> p[1] * p[2]))"
  private def normSql(c: String) =
    s"sqrt(list_sum(list_transform(CAST($c AS DOUBLE[]), x -> x * x)))"

  val oracleSql: Map[String, String] = Map(
    "q26_knn_brute" ->
      s"""WITH q AS (SELECT vec_id AS q_id, embedding AS qe FROM embeddings WHERE vec_id < $nQueries),
         |s AS (
         |  SELECT q_id, e.vec_id AS neighbor_id,
         |    CASE WHEN ${normSql("qe")} * ${normSql("e.embedding")} <> 0.0
         |      THEN $dotSql / (${normSql("qe")} * ${normSql("e.embedding")}) END AS cosine
         |  FROM q, embeddings e WHERE e.vec_id <> q.q_id),
         |r AS (SELECT *, row_number() OVER (
         |    PARTITION BY q_id ORDER BY cosine DESC, neighbor_id ASC) AS rnk FROM s)
         |SELECT q_id, neighbor_id, cosine, rnk FROM r WHERE rnk <= $topK""".stripMargin,
    "q35_embed_neardup" ->
      s"""SELECT * FROM (
         |  SELECT id_a, e.vec_id AS id_b,
         |    CASE WHEN ${normSql("qe")} * ${normSql("e.embedding")} <> 0.0
         |      THEN $dotSql / (${normSql("qe")} * ${normSql("e.embedding")}) END AS cosine
         |  FROM (SELECT vec_id AS id_a, embedding AS qe FROM embeddings) a,
         |    embeddings e
         |  WHERE id_a < e.vec_id)
         |WHERE cosine > 0.4""".stripMargin,
    "q28_embed_stats" ->
      s"""SELECT vec_id, label,
         |  CAST(embedding[1] AS DOUBLE) AS dim0,
         |  ${normSql("embedding")} AS l2_norm
         |FROM embeddings""".stripMargin,
    // list(v ORDER BY vec_id) + list_sum is a left-to-right fold in vec_id
    // order — same accumulation order as the Spark side, hence bit-exact.
    "q29_centroid" ->
      """WITH e AS (
        |  SELECT CAST(label AS INT) AS label, vec_id,
        |    CAST(generate_subscripts(embedding, 1) - 1 AS INT) AS dim,
        |    unnest(CAST(embedding AS DOUBLE[])) AS v
        |  FROM embeddings)
        |SELECT label, dim,
        |  list_sum(list_transform(list(v ORDER BY vec_id), x -> x))
        |    / count(*) AS centroid,
        |  count(*) AS n
        |FROM e GROUP BY 1, 2""".stripMargin,
  )
}
