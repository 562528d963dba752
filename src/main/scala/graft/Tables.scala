package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver test corpus (`TESTDATA.md`): one parquet per
  * table under an sf directory. All queries in [[SparkEntry]] read through
  * here so filter/column pushdown is uniform (plain parquet scans — Catalyst
  * handles `PushedFilters` / `ReadSchema` pruning).
  */
object Tables {
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame     = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = load(s, d, "lineitem")
  /** `events.ts` is parquet TIMESTAMP(NANOS) which Spark 4 refuses
    * ([PARQUET_TYPE_ILLEGAL]); read it as raw nanos and floor-convert to
    * microsecond TimestampType (same floor DuckDB's `epoch_us` applies, so
    * oracle comparisons line up exactly). True floor division, not `div`:
    * `div` truncates toward zero, which differs by 1µs for pre-1970
    * timestamps; `(ts - pmod(ts, 1000)) div 1000` is exact in longs.
    *
    * Requires `spark.sql.legacy.parquet.nanosAsLong=true` — a session conf
    * with no per-read equivalent, set once in [[GraftSession.create]]
    * (loaders must not mutate session state per call).
    */
  def events(s: SparkSession, d: String): DataFrame =
    load(s, d, "events")
      .withColumn("ts", timestamp_micros(expr("(ts - pmod(ts, 1000L)) div 1000")))
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
