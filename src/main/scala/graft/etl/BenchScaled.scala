package graft.etl

/** One-off scaled-ETL timing: run the full q44 pipeline (extract → clean →
  * weekly agg → mark price → PnL) on an arbitrary trades CSV and print
  * best-of-N wall seconds — the Spark side of BASELINE.md's scaling table
  * for scales beyond the three the per-round Bench carries, and the
  * standalone adjudication tool for its twin readings.
  *
  * Usage: runMain graft.etl.BenchScaled <csv> [runs=3]
  */
object BenchScaled {
  def main(args: Array[String]): Unit = {
    import graft.BenchSupport.{f3, preRead}
    val path = args(0)
    val runs = if (args.length > 1) args(1).toInt else 3
    val spark = graft.GraftSession.create("graft-bench-scaled")
    spark.sparkContext.setLogLevel("ERROR")
    def once(): Double = {
      // untimed page-cache warm before every run (BenchSupport.preRead:
      // the host's reclaim can evict the file between runs of one process)
      preRead(path)
      val t0 = System.nanoTime()
      Transform(TradesEtl.clean(TradesEtl.extract(spark, path)), computePnl = true)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    once() // warmup (JIT + codegen)
    val best = Seq.fill(runs)(once()).min
    val n = Transform(TradesEtl.clean(TradesEtl.extract(spark, path)),
      computePnl = true).count()
    println(s"""{"csv":"$path","best_wall_sec":${f3(best)},"agg_rows":$n}""")
    spark.stop()
  }
}
