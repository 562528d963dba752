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
    * `p_date` column — the original column is preserved).
    */
  def writeDatePartitioned(
      df: DataFrame, tsCol: String, path: String,
      maxRecordsPerFile: Long = 5000000L,
      mode: SaveMode = SaveMode.Overwrite): Unit =
    df.withColumn("p_date", to_date(col(tsCol)))
      .write
      .mode(mode)
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy("p_date")
      .parquet(path)

  /** Small-file compaction: rewrite the parquet table at `path` into
    * `numFiles` files per partition (streaming appends and per-batch
    * upserts accrete small files; at 100 TB the scan's task count — and the
    * NameNode/listing pressure — follows the FILE count, not the byte
    * count). The rewrite is crash-safe via the same stage-then-swap
    * protocol as the streaming upsert sink ([[TableSwap.replace]]); data is
    * byte-identical, only the file layout changes (CompactionSpec asserts
    * both). `partitionCols` must name the table's hive-partition columns,
    * if any, so the layout is preserved.
    */
  def compact(
      spark: org.apache.spark.sql.SparkSession, path: String,
      numFiles: Int = 1, partitionCols: Seq[String] = Nil): Unit =
    TableSwap.replace(spark, path) { staging =>
      val df = spark.read.parquet(path)
      val writer =
        (if (partitionCols.isEmpty) df.repartition(numFiles)
         else df.repartition(numFiles, partitionCols.map(col): _*))
          .write.mode(SaveMode.Overwrite)
      (if (partitionCols.isEmpty) writer
       else writer.partitionBy(partitionCols: _*)).parquet(staging)
    }
}
