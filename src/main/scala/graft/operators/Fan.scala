package graft.operators

import org.apache.spark.sql.{Column, DataFrame}

/** Scale-adaptive fan-out for parallelism-starved scans (optimization guide
  * §2.5 "input skew: one huge unsplittable file … repartition immediately
  * after the read", §2.6 idle capacity).
  *
  * A parquet file is splittable only at row-group granularity; a table
  * written as a single row group therefore scans as ONE task, and every
  * narrow kernel stage built on it (tokenize → fingerprint → score …) runs
  * on one core while the rest of the executor idles. That is exactly the
  * driver corpus here (each sf table is one file, one row group — verified
  * via parquet_metadata), and it is a real production shape too: a small
  * dimension-like corpus slice, a compacted shard, a gzip'd input.
  *
  * `out` redistributes ONLY when the scan is actually starved: if the
  * plan already has at least the session's default parallelism worth of
  * partitions — any honest 100 TB scan, with its thousands of row groups —
  * it is the IDENTITY and adds nothing to the plan. Below that it adds one
  * exchange of the (by construction small) input so every downstream
  * narrow stage uses the whole machine. The threshold derives from
  * `sparkContext.defaultParallelism`, i.e. the actual core count of THIS
  * session (`local[N]`, or the cluster total), never a constant.
  *
  * Hash-partitioning on a unique key (doc_id / vec_id) is preferred over
  * round-robin: deterministic under task retry with no sort-before-
  * repartition pass (SPARK-23207), and uniform because the key is unique.
  *
  * Correctness: a repartition changes row ORDER, never row content. It is
  * applied only in queries whose results are order-independent — per-row
  * projections, integer/min/max/count aggregations, sorted-fold float
  * aggregations, and windows over a deterministic total order. Queries
  * whose floats accumulate in partition order (q29 Summarizer centroids,
  * the q44 weekly double sums) deliberately do NOT use it; the tri-scale
  * DuckDB oracle hash-verifies every adopting query (FanOutSpec covers the
  * helper itself).
  */
object Fan {

  /** `df` repartitioned to the session default parallelism when its plan
    * yields fewer partitions; identity otherwise. Pass a unique key for
    * deterministic hash fan-out, nothing for round-robin.
    */
  def out(df: DataFrame, keys: Column*): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    val parts  = df.rdd.getNumPartitions // planning only, no job
    if (parts >= target) df
    else if (keys.nonEmpty) df.repartition(target, keys: _*)
    else df.repartition(target)
  }
}
