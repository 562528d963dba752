package graft.etl

/** CLI entry point mirroring the reference's `__main__` guard
  * (`etl_weekly_trades.py:283-292`): run the full ETL with defaults,
  * print the head of the aggregate.
  *
  * Usage: runMain graft.etl.RunEtl <input.csv> <outDir> [--no-pnl]
  */
object RunEtl {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: RunEtl <input.csv> <outDir> [--no-pnl]")
    val Array(inputCsv, outDir) = args.take(2)
    val computePnl = !args.contains("--no-pnl")
    val spark = graft.GraftSession.create("graft-etl")
    spark.sparkContext.setLogLevel("WARN")
    val result = Pipeline.runEtl(spark, inputCsv, outDir, computePnl)
    println(s"agg rows: ${result.agg.count()}")
    result.agg.orderBy(Transform.groupKeys.map(org.apache.spark.sql.functions.col): _*).show(5)
    println(s"report rows: ${result.report.count()}")
    result.report.show(10)
    spark.stop()
  }
}
