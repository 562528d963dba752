package graft

/** Standalone single-query re-measure: the adjudication tool for bench
  * regressions flagged by `tools/check_bench.py`. Runs ONE registered
  * query in a fresh session with the same protocol as `graft.Bench`
  * (untimed warmup at sf0.001, then N timed reps at the target SF, state
  * cleared between runs, failed reps recorded as the -1.0 sentinel and
  * excluded from the min) and prints every rep plus the ambient load
  * around it — the round-7 lesson is that the artifact, not the code, can
  * be the thing that regressed, and the tie-breaker is always a
  * clean-session re-measure; the load samples say whether THIS session
  * was clean.
  *
  * Usage: runMain graft.BenchOne <query_name> [reps=3] [sfDir]
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    import BenchSupport.{arr, f3, minValid}
    val name  = args(0)
    val reps  = if (args.length > 1) args(1).toInt else 3
    val sfDir = if (args.length > 2) args(2)
      else sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val fn = SparkEntry.queries.getOrElse(name,
      throw new IllegalArgumentException(
        s"unknown query '$name'; known: ${SparkEntry.queries.keys.toSeq.sorted.mkString(", ")}"))
    val spark = GraftSession.create("graft-bench-one")
    spark.sparkContext.setLogLevel("ERROR")
    try {
      def once(dir: String): Double = {
        val t0 = System.nanoTime()
        val dt =
          try { fn(spark, dir).write.format("noop").mode("overwrite").save()
                (System.nanoTime() - t0) / 1e9 }
          catch { case e: Throwable =>
            // same protocol as Bench.timeOnce: loud on stderr, -1.0
            // sentinel in the rep array, session survives — a throwing
            // query must still produce the JSON line (and stop the
            // session) or the adjudication run leaves no artifact at all
            System.err.println(
              s"[bench-one] $name failed: ${e.getClass.getName}: ${e.getMessage}")
            -1.0
          }
        BenchSupport.clearState(spark)
        dt
      }
      once("/root/testdata/sf0.001") // JIT/codegen warmup
      once(sfDir)                    // scale warmup (page cache, AQE stats)
      val metered = Seq.fill(reps) {
        val la0 = BenchSupport.loadAvg()
        val t = once(sfDir)
        val la1 = BenchSupport.loadAvg()
        (t, math.max(la0, la1))
      }
      val times = metered.map(_._1)
      println(s"""{"query":"$name","sf":"${BenchSupport.jsonEscape(sfDir)}","reps":${arr(times)},"loads":${arr(metered.map(_._2))},"min":${f3(minValid(times))}}""")
    } finally spark.stop()
  }
}
