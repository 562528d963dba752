package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Partitioned-layout writers: the 100 TB table layout is part of the
  * engine. Facts land hive-partitioned by a low-cardinality date key so
  * time-bounded queries prune partitions at planning time (visible as
  * `PartitionFilters` on the scan — asserted in PartitionPruningSpec),
  * and `maxRecordsPerFile` bounds file sizes for stable downstream splits.
  */
object Sinks {

  /** Write `df` hive-partitioned by the DATE of `tsCol` (a derived
    * `p_date` column — the original column is preserved). `format` is any
    * file datasource on the classpath — parquet (default) and orc both
    * ship with Spark and both supply the column stats/pushdown the layout
    * relies on (OrcRoundTripSpec pins the orc path).
    */
  def writeDatePartitioned(
      df: DataFrame, tsCol: String, path: String,
      maxRecordsPerFile: Long = 5000000L,
      mode: SaveMode = SaveMode.Overwrite,
      format: String = "parquet"): Unit =
    df.withColumn("p_date", to_date(col(tsCol)))
      .write
      .mode(mode)
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy("p_date")
      .format(format)
      .save(path)

  /** Small-file compaction: rewrite the parquet table at `path` into at
    * most `numFiles` files per hive partition (streaming appends and
    * per-batch upserts accrete small files; at 100 TB the scan's task
    * count — and the NameNode/listing pressure — follows the FILE count,
    * not the byte count). The rewrite is crash-safe via the same
    * stage-then-swap protocol as the streaming upsert sink
    * ([[TableSwap.replace]]); rows and partition directory values are
    * preserved exactly, only the file layout changes (CompactionSpec
    * asserts both). `partitionCols` must name the table's hive-partition
    * columns, if any, so the layout is preserved.
    *
    * Two scale traps handled explicitly:
    *   - partition-column TYPE INFERENCE is disabled for the rewrite read:
    *     inferred types re-encode directory values (string "00" → int 0
    *     merges two distinct partitions — silent data loss). Reading them
    *     as plain strings round-trips every directory name verbatim.
    *   - the shuffle key is (partitionCols, salt): repartitioning by the
    *     partition columns alone would funnel each hive partition into ONE
    *     task and one giant file; the salt keeps `numFiles`-way
    *     parallelism and output files per partition.
    */
  def compact(
      spark: org.apache.spark.sql.SparkSession, path: String,
      numFiles: Int = 1, partitionCols: Seq[String] = Nil,
      format: String = "parquet"): Unit =
    TableSwap.replace(spark, path) { staging =>
      // cloned session, NOT a set/restore on the caller's conf: the
      // rewrite of a large table runs for minutes, and the session-wide
      // toggle would silently string-type partition columns for every
      // CONCURRENT query in the same session (and two concurrent compacts
      // race the restore). newSession shares the SparkContext but owns
      // its conf — it starts from BUILDER-time options only, so the
      // caller's runtime `spark.conf.set` state (codec, ANSI, file
      // sizing …) is copied over first: the rewrite must run under the
      // caller's settings, just with inference scoped off.
      val scoped = spark.newSession()
      spark.conf.getAll.foreach { case (k, v) =>
        try scoped.conf.set(k, v)
        catch { case _: org.apache.spark.sql.AnalysisException => () } // static conf
      }
      scoped.conf.set(
        "spark.sql.sources.partitionColumnTypeInference.enabled", "false")
      val df = scoped.read.format(format).load(path)
      val writer =
        (if (partitionCols.isEmpty) df.repartition(numFiles)
         else df.repartition(
           partitionCols.map(col) :+ pmod(spark_partition_id(), lit(numFiles)): _*))
          .write.mode(SaveMode.Overwrite).format(format)
      (if (partitionCols.isEmpty) writer
       else writer.partitionBy(partitionCols: _*)).save(staging)
    }
}
