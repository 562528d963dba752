package graft.etl

import org.apache.spark.sql.SparkSession

/** One-off scaled-ETL timing: run the full q44 pipeline (extract → clean →
  * weekly agg → mark price → PnL) on an arbitrary trades CSV and print
  * best-of-N wall seconds — the Spark side of BASELINE.md's scaling table
  * for scales beyond the two the per-round Bench carries.
  *
  * Usage: runMain graft.etl.BenchScaled <csv> [runs=3]
  */
object BenchScaled {
  def main(args: Array[String]): Unit = {
    val path = args(0)
    val runs = if (args.length > 1) args(1).toInt else 3
    val spark = graft.GraftSession.create("graft-bench-scaled")
    spark.sparkContext.setLogLevel("ERROR")
    // untimed page-cache warm before every run: the host's memory reclaim
    // can evict the file between runs, and its virtual disk reads ~32 MB/s
    // cold — same discipline as graft.Bench's scaled twins
    def preRead(): Unit = {
      val in = new java.io.FileInputStream(path)
      val buf = new Array[Byte](1 << 20)
      try { while (in.read(buf) != -1) () } finally in.close()
    }
    def once(): Double = {
      preRead()
      val t0 = System.nanoTime()
      Transform(TradesEtl.clean(TradesEtl.extract(spark, path)), computePnl = true)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    once() // warmup (JIT + codegen)
    val best = Seq.fill(runs)(once()).min
    val n = Transform(TradesEtl.clean(TradesEtl.extract(spark, path)),
      computePnl = true).count()
    val w = "%.3f".formatLocal(java.util.Locale.ROOT, best)
    println(s"""{"csv":"$path","best_wall_sec":$w,"agg_rows":$n}""")
    spark.stop()
  }
}
