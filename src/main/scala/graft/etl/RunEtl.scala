package graft.etl

import org.apache.spark.sql.SparkSession

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
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[4]"))
      .appName("graft-etl")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val result = Pipeline.runEtl(spark, inputCsv, outDir, computePnl)
    println(s"agg rows: ${result.agg.count()}")
    result.agg.orderBy(Transform.groupKeys.map(org.apache.spark.sql.functions.col): _*).show(5)
    println(s"report rows: ${result.report.count()}")
    result.report.show(10)
    spark.stop()
  }
}
