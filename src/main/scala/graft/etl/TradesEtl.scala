package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Extract + clean stage of the trades pipeline (reference:
  * `etl_weekly_trades.py:9-49`, operators S1 + C1-C6 in SURVEY.md §2).
  *
  * The CSV is read all-strings (it contains dirty cells like `not_a_date`
  * and blanks); cleaning then applies exactly the reference's coercion
  * semantics with ANSI-safe `try_*` forms:
  *   - C1: `quantity`/`price` → double, unparseable → null
  *   - C2: `timestamp` strict `yyyy-MM-dd HH:mm:ss` parse, malformed → null
  *   - C3: drop rows with any null (800 → 790 on the reference data)
  */
object TradesEtl {

  val columns: Seq[String] =
    Seq("timestamp", "user_id", "client_type", "symbol", "side", "quantity", "price")

  /** All-string landing schema — type coercion is explicit, in [[clean]]. */
  val rawSchema: StructType =
    StructType(columns.map(StructField(_, StringType, nullable = true)))

  val cleanSchema: StructType = StructType(Seq(
    StructField("timestamp", TimestampType),
    StructField("user_id", LongType),
    StructField("client_type", StringType),
    StructField("symbol", StringType),
    StructField("side", StringType),
    StructField("quantity", DoubleType),
    StructField("price", DoubleType),
  ))

  /** Data-quality probe results (reference prints these; C4/C5). */
  case class CleanStats(
      inputRows: Long,
      anyNullRawRows: Long,
      badTimestampRows: Long,
      cleanRows: Long,
      domains: Map[String, Seq[String]])

  /** S1: CSV scan with explicit all-string schema. */
  def extract(spark: SparkSession, path: String): DataFrame =
    spark.read
      .option("header", "true")
      .schema(rawSchema)
      .csv(path)

  /** C1-C3: coerce then drop-any-null. Pure projection + filter — fully
    * pushed down / codegen'd; no shuffle.
    */
  def clean(raw: DataFrame): DataFrame =
    raw
      .withColumn("timestamp", try_to_timestamp(col("timestamp"), lit("yyyy-MM-dd HH:mm:ss")))
      .withColumn("user_id", expr("try_cast(user_id AS BIGINT)"))
      .withColumn("quantity", expr("try_cast(quantity AS DOUBLE)"))
      .withColumn("price", expr("try_cast(price AS DOUBLE)"))
      .na.drop("any")

  /** C4/C5 quality probes — the reference's printed diagnostics as data.
    * The probes are ~7 separate actions; cache the raw frame so the CSV is
    * scanned and parsed once, not per probe.
    */
  def qualityStats(rawUncached: DataFrame): CleanStats = {
    val raw = rawUncached.cache()
    try qualityStatsImpl(raw)
    finally raw.unpersist()
  }

  private def qualityStatsImpl(raw: DataFrame): CleanStats = {
    val inputRows = raw.count()
    val anyNull = raw
      .filter(columns.map(col(_).isNull).reduce(_ || _))
      .count()
    val badTs = raw
      .filter(col("timestamp").isNotNull &&
        try_to_timestamp(col("timestamp"), lit("yyyy-MM-dd HH:mm:ss")).isNull)
      .count()
    val cleanRows = clean(raw).count()
    val domains = Seq("client_type", "symbol", "side").map { c =>
      c -> raw.select(c).na.drop().distinct().collect().map(_.getString(0)).toSeq.sorted
    }.toMap
    CleanStats(inputRows, anyNull, badTs, cleanRows, domains)
  }
}
