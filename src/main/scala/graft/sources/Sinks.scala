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
}
