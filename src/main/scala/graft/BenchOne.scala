package graft

/** Standalone single-query re-measure: the adjudication tool for bench
  * regressions flagged by `tools/check_bench.py`. Runs ONE registered
  * query in a fresh session with the same protocol as `graft.Bench`
  * (untimed warmup at sf0.001, then N timed reps at the target SF, state
  * cleared between runs) and prints every rep — the round-7 lesson is
  * that the artifact, not the code, can be the thing that regressed, and
  * the tie-breaker is always a clean-session re-measure.
  *
  * Usage: runMain graft.BenchOne <query_name> [reps=3] [sfDir]
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    import BenchSupport.{arr, f3}
    val name  = args(0)
    val reps  = if (args.length > 1) args(1).toInt else 3
    val sfDir = if (args.length > 2) args(2)
      else sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val fn = SparkEntry.queries.getOrElse(name,
      throw new IllegalArgumentException(
        s"unknown query '$name'; known: ${SparkEntry.queries.keys.toSeq.sorted.mkString(", ")}"))
    val spark = GraftSession.create("graft-bench-one")
    spark.sparkContext.setLogLevel("ERROR")
    def once(dir: String): Double = {
      val t0 = System.nanoTime()
      fn(spark, dir).write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      BenchSupport.clearState(spark)
      dt
    }
    once("/root/testdata/sf0.001") // JIT/codegen warmup
    once(sfDir)                    // scale warmup (page cache, AQE stats)
    val times = Seq.fill(reps)(once(sfDir))
    println(s"""{"query":"$name","sf":"$sfDir","reps":${arr(times)},"min":${f3(times.min)}}""")
    spark.stop()
  }
}
