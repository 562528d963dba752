package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Physical layout for the q86 deterministic corpus shuffle: shard
  * directories (`shard=K/`) whose files are sorted by the shuffle key,
  * with disjoint key ranges per file — a training run's data-parallel
  * worker K streams `shard=K/` in file order and sees its slice of the
  * corpus in the (reproducible) shuffled order.
  *
  * Scale shape: ONE range partition on (key, tiebreak) — numFiles tasks
  * each sort their slice (the sampled range bounds equal-size the files).
  * Never a per-shard window: 8 shards would mean 8 single-task global
  * sorts at 100 TB. Because the shard is itself an equal-width key range,
  * range partitioning on the key aligns file boundaries with shard
  * boundaries (up to the boundary file when numFiles is not a shard
  * multiple), and the `partitionBy` write routes rows without a second
  * shuffle.
  */
object ShuffledShards {

  /** Rewrite `df` (must carry the key + shard columns, e.g. from
    * [[graft.queries.TextQueries.shuffleShardsOf]]'s projection joined
    * back to the payload) into `path` as shard=K directories of
    * key-sorted, range-disjoint files.
    */
  def writeShuffled(
      df: DataFrame, path: String, numFiles: Int,
      keyCol: String = "shuffle_key", shardCol: String = "shard",
      tiebreak: Column = col("doc_id")): Unit =
    df.repartitionByRange(numFiles, col(keyCol), tiebreak)
      // the sort MUST lead with the partition column: the partitionBy
      // writer requires its ordering and would otherwise insert its own
      // UNSTABLE sort on shard alone, destroying the key order inside each
      // file. Shard is monotone in the key, so leading with it does not
      // change the row order — it only makes the satisfied requirement
      // visible to the planner.
      .sortWithinPartitions(col(shardCol), col(keyCol), tiebreak)
      .write.mode("overwrite").partitionBy(shardCol).parquet(path)
}
