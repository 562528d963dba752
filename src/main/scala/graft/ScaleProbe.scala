package graft

import org.apache.spark.sql.functions._

/** Empirical scale probe: replicate the document/embedding corpus by a
  * factor F and time selected registered queries at each factor, so
  * SCALE.md's per-family scaling claims rest on measured curves, not only
  * plan shape. Copy k>0 of a document gets a fresh doc_id range and ONE
  * appended marker token — copies are near-duplicates of their original
  * (Jaccard ≈ 1 − 1/|doc|), so at factor F the dedup families face
  * clusters of size F: LSH buckets fill, the hot-bucket caps engage, and
  * connected components does real multi-edge work — the realistic
  * crawl-corpus shape, not F independent corpora. Embedding copies
  * perturb one coordinate by k·1e-4 (near-identical vectors, same
  * cluster shape for the embedding-space family). Event copies shift
  * user_id (and event_id) into fresh ranges with timestamps unchanged —
  * F× more users over the same window, the shape a funnel/retention
  * deployment actually scales along.
  *
  * Usage: runMain graft.ScaleProbe [baseSfDir] [workDir] [factors] [queries]
  * Prints one JSON line per (query, factor): {"query","factor","rows_in",
  * "sec"} — `sec` is min-of-2 after one untimed warmup run per pair.
  * Derived state only (workDir is a scratch dir, `_READY`-marked per
  * factor and reused across runs).
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val baseDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val workDir = args.lift(1).getOrElse("/tmp/graft_scaleprobe")
    val factors = args.lift(2).getOrElse("1,10,100")
      .split(",").map(_.trim.toInt).toSeq
    val queryNames = args.lift(3).map(_.split(",").map(_.trim).toSeq)
      .getOrElse(Seq(
        "q20_dedup_exact", "q58_dedup_apply", "q67_winnow_dedup_apply",
        "q75_gopher_apply", "q90_embed_dedup_apply", "q61_training_export",
        "q91_funnel", "q92_cohort_retention", "q94_gapfill"))
    val spark = GraftSession.create("graft-scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val linked = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem")

    def buildDir(f: Int): String = {
      val dir = s"$workDir/f$f"
      val p = java.nio.file.Paths.get(dir)
      if (java.nio.file.Files.exists(p.resolve("_READY"))) return dir
      org.apache.hadoop.fs.FileUtil.fullyDelete(new java.io.File(dir))
      java.nio.file.Files.createDirectories(p)
      def link(t: String): Unit = java.nio.file.Files.createSymbolicLink(
        p.resolve(s"$t.parquet"),
        java.nio.file.Paths.get(s"$baseDir/$t.parquet"))
      linked.foreach(link)
      if (f == 1) { link("documents"); link("embeddings"); link("events") }
      else {
        val docs = Tables.documents(spark, baseDir)
        val idBase = docs.agg(max("doc_id")).as[Long].first() + 1L
        docs
          .withColumn("k", explode(sequence(lit(0), lit(f - 1))))
          .withColumn("doc_id", col("doc_id") + col("k") * idBase)
          .withColumn("text", when(col("k") === 0, col("text"))
            .otherwise(concat(col("text"), lit(" copy"), col("k"))))
          .withColumn("n_chars", length(col("text")).cast("long"))
          .drop("k")
          .repartition(32)
          .write.mode("overwrite").parquet(s"$dir/documents.parquet")
        val embs = Tables.embeddings(spark, baseDir)
        val vBase = embs.agg(max("vec_id")).as[Long].first() + 1L
        embs
          .withColumn("k", explode(sequence(lit(0), lit(f - 1))))
          .withColumn("vec_id", col("vec_id") + col("k") * vBase)
          .withColumn("embedding", expr(
            "transform(embedding, (x, i) -> " +
              "if(i = 0, cast(x + k * 1e-4 as float), x))"))
          .drop("k")
          .repartition(32)
          .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
        // raw read, not Tables.events: the probe must preserve the file's
        // ts encoding verbatim so the queries' own normalization runs
        val evs = Tables.load(spark, baseDir, "events")
        val evMax = evs.agg(max("user_id"), max("event_id")).first()
        val uBase = evMax.getLong(0) + 1L
        val eBase = evMax.getLong(1) + 1L
        evs
          .withColumn("k", explode(sequence(lit(0), lit(f - 1))))
          .withColumn("user_id", col("user_id") + col("k") * uBase)
          .withColumn("event_id", col("event_id") + col("k") * eBase)
          .drop("k")
          .repartition(32)
          .write.mode("overwrite").parquet(s"$dir/events.parquet")
      }
      java.nio.file.Files.createFile(p.resolve("_READY"))
      dir
    }

    def timeOnce(name: String, dir: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }

    for (f <- factors) {
      val dir = buildDir(f)
      val nDocs = spark.read.parquet(s"$dir/documents.parquet").count()
      for (q <- queryNames) {
        timeOnce(q, dir) // warmup (codegen + page cache)
        val best = Seq.fill(2)(timeOnce(q, dir)).min
        // untimed: result cardinality shows the WORK done (e.g. the dedup
        // applies collapsing F-copy clusters back to ~the base corpus)
        val rowsOut = SparkEntry.queries(q)(spark, dir).count()
        val w = "%.3f".formatLocal(java.util.Locale.ROOT, best)
        println(s"""{"query":"$q","factor":$f,"rows_in":$nDocs,""" +
          s""""rows_out":$rowsOut,"sec":$w}""")
      }
    }
    spark.stop()
  }
}
