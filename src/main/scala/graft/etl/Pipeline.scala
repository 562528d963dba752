package graft.etl

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions.col

/** End-to-end pipeline (reference `run_etl`, `etl_weekly_trades.py:270-281`).
  *
  * Sinks (offline container, SURVEY.md §7.3.8): the SQLite `append` sink
  * (S2) is REAL behind `sqlitePath` — [[graft.sources.SqliteIO]] writes the
  * database file directly (public file format, no sqlite-jdbc jar), with
  * the reference's `to_sql(if_exists="append")` semantics; default stays
  * parquet `append` (the distributed layout), and a JDBC database sink is
  * available behind `jdbcUrl`. The Excel report sink (S3) writes CSV by
  * default or a real `.xlsx` with `reportFormat = "xlsx"` ([[Xlsx]] — no
  * spreadsheet jar needed). Full reference API parity:
  *   - `tableName` — the reference's `load(df, path, table_name)`
  *     (`etl_weekly_trades.py:134`): names the aggregate table (the parquet
  *     subdirectory, or the JDBC table when `jdbcUrl` is set).
  *   - `jdbcUrl` — the reference's primary sink IS a database
  *     (`etl_weekly_trades.py:147`, `to_sql(if_exists="append")`): when set,
  *     the aggregate is appended to `tableName` over JDBC instead of
  *     parquet. Proven end-to-end against embedded Apache Derby (the one
  *     embedded database whose driver ships in `/opt/spark/jars`, with
  *     Spark's built-in DerbyDialect): table auto-created on first append,
  *     re-run doubles rows, golden contents — `DerbyJdbcSinkSpec`. SQLite
  *     specifically still needs a sqlite-jdbc jar (absent offline);
  *     PipelineSpec pins that a driverless URL fails without falling back
  *     to parquet.
  *   - `addTimestamp` — the reference's `run_etl(add_timestamp=True)`
  *     prefixes the report file with `%Y%m%d_%H%M%S`
  *     (`etl_weekly_trades.py:210-212`).
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
      partitionByWeek: Boolean = false,
      tableName: String = "agg_trades_weekly",
      jdbcUrl: Option[String] = None,
      sqlitePath: Option[String] = None,
      addTimestamp: Boolean = false,
      reportFormat: String = "csv",
      charts: Boolean = false): EtlResult = {
    require(reportFormat == "csv" || reportFormat == "xlsx",
      s"reportFormat must be csv or xlsx, got $reportFormat")
    require(jdbcUrl.isEmpty || sqlitePath.isEmpty,
      "jdbcUrl and sqlitePath both set — pick ONE aggregate sink")

    val raw   = TradesEtl.extract(spark, inputCsv)
    val clean = TradesEtl.clean(raw)
    val agg   = Transform(clean, computePnl).cache() // fans out to load + report

    // S2: append like the reference's SQLite sink. Ordered by the group
    // keys — pandas groupby(sort=True) emits key-sorted rows (T3).
    // `partitionByWeek` switches the parquet layout to the scale path:
    // hive-partitioned by week so time-bounded reads prune partitions.
    val sorted = agg.orderBy(Transform.groupKeys.map(col): _*)
    (sqlitePath, jdbcUrl) match {
      case (Some(p), _) =>
        // the reference's ACTUAL sink: a real SQLite file, appended in
        // place (graft.sources.SqliteIO — pure-JVM writer, no jdbc jar)
        graft.sources.SqliteIO.append(sorted, p, tableName)
      case (None, Some(url)) =>
        sorted.write.mode(SaveMode.Append)
          .format("jdbc")
          .option("url", url)
          .option("dbtable", tableName)
          .save()
      case (None, None) =>
        val target = s"$outDir/$tableName"
        guardAppendSchema(spark, target, sorted, partitionByWeek)
        val writer = sorted.write.mode(SaveMode.Append)
        if (partitionByWeek)
          writer.partitionBy("week_start_date").parquet(target)
        else
          writer.parquet(target)
    }

    val metrics = if (computePnl) Seq("total_volume", "total_pnl") else Seq("total_volume")
    val report  = Report.topClients(agg, reportClientType, metrics, topN)

    // S3 substitute; optional run_etl(add_timestamp=True) filename prefix.
    val prefix =
      if (addTimestamp)
        java.time.LocalDateTime.now()
          .format(java.time.format.DateTimeFormatter.ofPattern("yyyyMMdd_HHmmss")) + "_"
      else ""
    if (reportFormat == "xlsx")
      Xlsx.write(report, s"$outDir/${prefix}top_clients.xlsx")
    else
      report
        .write.mode(SaveMode.Overwrite)
        .option("header", "true")
        .csv(s"$outDir/${prefix}top_clients")

    // S4: the reference's two report charts (reference filenames), off by
    // default like the CSV/xlsx choice — presentation artifacts are opt-in
    if (charts) Charts.writeAll(agg, outDir)

    EtlResult(agg, report)
  }

  /** Append-schema guard: parquet append onto a table with a DIFFERENT
    * column set or partition layout would succeed file-by-file and corrupt
    * the table silently — later whole-table reads surface nulls, schema-
    * merge errors, or "Conflicting directory structures" far from the write
    * that caused them. (The reference README documents this exact trap: its
    * SQLite append fails on a pnl/no-pnl column mismatch only at read
    * time.) Columns compare as NAME SETS, not order/types: parquet resolves
    * columns by name, and a type change surfaces as its own loud read
    * error. Only a missing/empty target (first write) skips the guard —
    * any other read failure (corrupt footer, permissions) must ABORT the
    * append, not silently disable the check.
    */
  private def guardAppendSchema(
      spark: SparkSession, target: String, next: DataFrame,
      partitionByWeek: Boolean): Unit = {
    val existing =
      try Some(spark.read.parquet(target).columns.toSet)
      catch {
        case e: org.apache.spark.sql.AnalysisException
            if Option(e.getCondition).exists(c =>
              c.contains("PATH_NOT_FOUND") || c.contains("UNABLE_TO_INFER_SCHEMA")) =>
          None // first write
      }
    existing.foreach { cols =>
      val incoming = next.columns.toSet
      if (cols != incoming) throw new IllegalStateException(
        s"schema mismatch appending to $target: existing table has columns " +
          s"${cols.toSeq.sorted.mkString("[", ", ", "]")} but this run produces " +
          s"${incoming.toSeq.sorted.mkString("[", ", ", "]")} (did computePnl change " +
          "between runs?). Write to a different tableName/outDir, delete the " +
          "existing table, or rerun with the original settings.")
      // Layout check: a flat append onto a hive-partitioned table (or vice
      // versa) passes the column check but breaks every later read.
      val fs = new org.apache.hadoop.fs.Path(target).getFileSystem(
        spark.sparkContext.hadoopConfiguration)
      val partitioned = fs.listStatus(new org.apache.hadoop.fs.Path(target))
        .exists(st => st.isDirectory &&
          st.getPath.getName.startsWith("week_start_date="))
      if (partitioned != partitionByWeek) throw new IllegalStateException(
        s"partition-layout mismatch appending to $target: existing table is " +
          s"${if (partitioned) "hive-partitioned by week_start_date" else "flat"} " +
          s"but this run has partitionByWeek=$partitionByWeek. Appending would mix " +
          "layouts and break later reads (conflicting directory structures). " +
          "Match the existing layout or write to a different tableName/outDir.")
    }
  }
}
