package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table helpers: pre-shuffle fact tables once at write time so
  * repeated equi-joins/aggregations on the bucket key need NO exchange at
  * read time — the 100 TB pattern for join-heavy marts (pay one shuffle at
  * ingest, amortize over every downstream query).
  *
  * Bucketing in Spark requires `saveAsTable` (bucket metadata lives in the
  * metastore); `spark.sql.sources.bucketing.enabled` is on by default.
  */
object Bucketing {

  def writeBucketed(
      df: DataFrame, table: String, key: String,
      buckets: Int, sortBy: Option[String] = None): Unit = {
    // repartition on the bucket key FIRST — this is the "one shuffle at
    // ingest". Without it Spark's bucketed writer splits EVERY input task
    // by bucket id: T scan tasks × B buckets files (most tiny), each
    // bucket's rows scattered across T files — small-file pressure at
    // write AND a T-files-per-bucket open cost on every exchange-free
    // read. After the repartition each bucket is one task → one file.
    import org.apache.spark.sql.functions.col
    val w = df.repartition(buckets, col(key)).write
      .mode(SaveMode.Overwrite)
      .format("parquet")
      .bucketBy(buckets, key)
    sortBy.fold(w)(s => w.sortBy(s)).saveAsTable(table)
  }

  /** Join two same-bucketed tables on their bucket key — planned without
    * any Exchange (verified in BucketedJoinSpec).
    */
  def bucketedJoin(spark: SparkSession, left: String, right: String,
      key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)
}
