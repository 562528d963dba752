package graft.etl

/** CLI entry point mirroring the reference's `__main__` guard
  * (`etl_weekly_trades.py:283-292`): run the full ETL, print the head of
  * the aggregate. Flags mirror `run_etl`'s keyword options
  * (`etl_weekly_trades.py:270-281`).
  *
  * Usage: runMain graft.etl.RunEtl <input.csv> <outDir>
  *          [--no-pnl] [--add-timestamp] [--table-name=NAME] [--jdbc-url=URL]
  *          [--sqlite | --sqlite-path=PATH] [--xlsx] [--charts]
  *
  * `--sqlite` appends the aggregate to `<outDir>/agg_result.db` — the
  * reference's own sink and filename — via the pure-JVM writer.
  */
object RunEtl {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: RunEtl <input.csv> <outDir> [--no-pnl] [--add-timestamp] " +
        "[--table-name=NAME] [--jdbc-url=URL] [--sqlite | --sqlite-path=PATH] " +
        "[--xlsx] [--charts]")
    val Array(inputCsv, outDir) = args.take(2)
    val flags = args.drop(2)
    def opt(name: String): Option[String] =
      flags.collectFirst { case f if f.startsWith(s"--$name=") =>
        f.stripPrefix(s"--$name=") }
    val spark = graft.GraftSession.create("graft-etl")
    spark.sparkContext.setLogLevel("WARN")
    val result = Pipeline.runEtl(
      spark, inputCsv, outDir,
      computePnl = !flags.contains("--no-pnl"),
      tableName = opt("table-name").getOrElse("agg_trades_weekly"),
      jdbcUrl = opt("jdbc-url"),
      sqlitePath = opt("sqlite-path").orElse(
        if (flags.contains("--sqlite")) Some(s"$outDir/agg_result.db") else None),
      addTimestamp = flags.contains("--add-timestamp"),
      reportFormat = if (flags.contains("--xlsx")) "xlsx" else "csv",
      charts = flags.contains("--charts"))
    println(s"agg rows: ${result.agg.count()}")
    result.agg.orderBy(Transform.groupKeys.map(org.apache.spark.sql.functions.col): _*).show(5)
    println(s"report rows: ${result.report.count()}")
    result.report.show(10)
    spark.stop()
  }
}
