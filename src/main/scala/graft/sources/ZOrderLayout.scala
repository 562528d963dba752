package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering for multi-dimensional data skipping.
  *
  * A table range-partitioned and sorted on ONE column prunes scans only on
  * that column's predicates; a 100 TB fact table queried by both user and
  * time needs its file/row-group min-max stats narrow on BOTH. Interleaving
  * the bits of the two keys (x bit i → output bit 2i, y bit i → 2i+1) makes
  * lexicographic order on the interleaved key a space-filling curve, so a
  * sort by it leaves every file covering a small rectangle of (x, y) space —
  * parquet min/max stats then skip on either predicate (the Delta/Iceberg
  * OPTIMIZE ZORDER technique). ZOrderSpec measures the per-file span
  * shrinkage against a linear sort directly.
  *
  * The key is pure integer arithmetic on codegen'd built-ins (mask, shift,
  * or) — no UDF — and [[mortonSql]] emits the identical expression as ANSI
  * SQL, generated from the same bit loop, so the DuckDB oracle replays the
  * key bit-for-bit.
  */
object ZOrderLayout {

  /** Morton interleave of the low `bits` bits of two non-negative longs:
    * `x` occupies even output bits, `y` odd. Callers wrap/bucket their
    * dimensions into the `bits` range first (`pmod`, `div`) — high bits
    * beyond the range are masked off here.
    */
  def mortonKey(x: Column, y: Column, bits: Int = 16): Column =
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      // x & (1<<i) isolates bit i in place; << i moves it to 2i (and the
      // y copy one further) — no per-bit extraction to position 0 needed
      acc
        .bitwiseOR(shiftleft(x.bitwiseAND(lit(1L << i)), i))
        .bitwiseOR(shiftleft(y.bitwiseAND(lit(1L << i)), i + 1))
    }

  /** The same interleave as ANSI SQL over expressions `x` and `y`,
    * generated from the same loop so Spark and the oracle can never
    * disagree on the bit layout.
    */
  def mortonSql(x: String, y: String, bits: Int = 16): String =
    (0 until bits).flatMap { i =>
      Seq(s"((($x) & ${1L << i}) << $i)", s"((($y) & ${1L << i}) << ${i + 1})")
    }.mkString(" | ")

  /** Rewrite `df` as `numFiles` parquet files clustered on the Z-order
    * curve of (`x`, `y`): range-partition on the key (equal-depth file
    * sizes via sampled range bounds — a hash partition would scatter the
    * curve), sort within each partition, write. The key column is dropped
    * before the write (derivable, and stats on it are not useful); the
    * final projection is narrow, so the within-partition order survives it.
    */
  def writeZOrdered(
      df: DataFrame, x: Column, y: Column, path: String,
      numFiles: Int, bits: Int = 16): Unit =
    df.withColumn("__zkey", mortonKey(x, y, bits))
      .repartitionByRange(numFiles, col("__zkey"))
      .sortWithinPartitions("__zkey")
      .drop("__zkey")
      .write.mode("overwrite").parquet(path)
}
