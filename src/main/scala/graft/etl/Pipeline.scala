package graft.etl

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions.col

/** End-to-end pipeline (reference `run_etl`, `etl_weekly_trades.py:270-281`).
  *
  * Sink substitutions (offline container, SURVEY.md §7.3.8): the SQLite
  * `append` sink (S2) becomes parquet `append`; the Excel report sink (S3)
  * becomes CSV — identical rows/columns in both cases.
  */
object Pipeline {

  case class EtlResult(agg: DataFrame, report: DataFrame)

  def runEtl(
      spark: SparkSession,
      inputCsv: String,
      outDir: String,
      computePnl: Boolean = true,
      reportClientType: String = "bronze",
      topN: Int = 3,
      partitionByWeek: Boolean = false): EtlResult = {

    val raw   = TradesEtl.extract(spark, inputCsv)
    val clean = TradesEtl.clean(raw)
    val agg   = Transform(clean, computePnl).cache() // fans out to load + report

    // S2 substitute: append like the reference's SQLite sink. Ordered by the
    // group keys — pandas groupby(sort=True) emits key-sorted rows (T3).
    // `partitionByWeek` switches to the scale layout: hive-partitioned by
    // week so time-bounded reads prune partitions (see sources.Sinks).
    val sorted = agg.orderBy(Transform.groupKeys.map(col): _*)
    val writer = sorted.write.mode(SaveMode.Append)
    if (partitionByWeek)
      writer.partitionBy("week_start_date").parquet(s"$outDir/agg_trades_weekly")
    else
      writer.parquet(s"$outDir/agg_trades_weekly")

    val metrics = if (computePnl) Seq("total_volume", "total_pnl") else Seq("total_volume")
    val report  = Report.topClients(agg, reportClientType, metrics, topN)

    // S3 substitute.
    report
      .write.mode(SaveMode.Overwrite)
      .option("header", "true")
      .csv(s"$outDir/top_clients")

    EtlResult(agg, report)
  }
}
