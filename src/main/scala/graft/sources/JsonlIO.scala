package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** JSONL (newline-delimited JSON) source/sink — the interchange format
  * LLM training corpora actually ship in (one JSON object per line,
  * usually gzip/zstd-compressed per file; splittable-read when
  * uncompressed, per-file parallel when gzipped).
  *
  * Scale rules baked in:
  *   - the schema is EXPLICIT, never inferred — schema inference is a full
  *     extra pass over the data (at 100 TB, a second 100 TB scan) and can
  *     silently widen types between corpus versions;
  *   - corrupt lines don't kill the job OR silently vanish: [[readSplit]]
  *     returns (clean, quarantine) so ingest can count/inspect rejects —
  *     the same dirty-input discipline as the reference's coerce-then-drop
  *     CSV cleaning (`etl_weekly_trades.py:33-48`).
  *
  * Implementation note: parsing goes through `text` + `from_json` (the
  * same Jackson parse the json source runs) rather than `spark.read.json`,
  * because Spark refuses any plan over a raw json scan whose referenced
  * columns are only the internal corrupt-record column
  * ([UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN]) — which is
  * exactly what a quarantine count is. The text route has no such
  * restriction and keeps the raw line for the quarantine for free.
  */
object JsonlIO {

  val CorruptCol = "_corrupt_record"

  /** Read JSONL with an explicit schema; malformed or type-mismatched
    * lines surface with their raw text in the `_corrupt_record` column
    * (NULL for clean rows) instead of failing the scan or being dropped.
    * Blank lines are skipped (the json source's convention).
    */
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    // the quarantine column is appended below; a caller schema already
    // containing it would produce a duplicate field and a confusing
    // analysis error deep inside from_json. Case-insensitive: Spark name
    // resolution is case-insensitive by default, so `_CORRUPT_RECORD`
    // collides just the same
    require(!schema.fieldNames.exists(_.equalsIgnoreCase(CorruptCol)),
      s"JsonlIO.read: caller schema must not contain the reserved " +
        s"'$CorruptCol' column (it is added by the reader)")
    val parsed = spark.read.text(path)
      // blank = any WHITESPACE-only line: trim() strips ASCII space only,
      // so a tab-only line would otherwise reach Jackson (and come back as
      // a null struct, see below) instead of being skipped as blank
      .filter(col("value").rlike("\\S"))
      // spark.read.json strips a UTF-8 BOM at the byte level; this text
      // route sees it as U+FEFF and Jackson would quarantine the first
      // line of every BOM-prefixed shard
      .withColumn("value", regexp_replace(col("value"), "^\\uFEFF", ""))
      .select(col("value"), from_json(col("value"),
        schema.add(CorruptCol, "string"),
        java.util.Map.of(
          "mode", "PERMISSIVE", "columnNameOfCorruptRecord", CorruptCol))
        .as("r"))
    // two silent-loss shapes from_json leaves with a NULL corrupt column,
    // re-routed to quarantine here: a parse that yields no row returns a
    // NULL STRUCT (e.g. `[]`), which `r.*` would expand into an all-null
    // CLEAN row; and a top-level ARRAY of objects keeps only its first
    // element. Neither may pass as clean with a zero reject count.
    val corrupt = when(col("r").isNull || col("value").rlike("^\\s*\\["),
      col("value")).otherwise(col("r").getField(CorruptCol))
    parsed.select(
      schema.fieldNames.map(n => col("r").getField(n).as(n)).toSeq :+
        corrupt.as(CorruptCol): _*)
  }

  /** (clean rows without the corrupt column, quarantined raw lines as
    * `line`). The two frames share ONE parsed plan, but each ACTION on
    * them is its own job — consuming both re-scans and re-parses the
    * input unless the caller persists: for the write-clean-then-inspect-
    * quarantine pattern, `val raw = read(...).persist()` (or aggregate
    * the corrupt count in the same pass as the clean write) avoids paying
    * the Jackson parse twice at corpus scale.
    */
  def readSplit(spark: SparkSession, path: String,
      schema: StructType): (DataFrame, DataFrame) = {
    val raw = read(spark, path, schema)
    (raw.filter(col(CorruptCol).isNull).drop(CorruptCol),
      raw.filter(col(CorruptCol).isNotNull).select(col(CorruptCol).as("line")))
  }

  /** Write JSONL, optionally compressed (`gzip`, `zstd`, `none`). One file
    * per partition — size output files with the upstream partitioning
    * (e.g. repartition(n) or ShuffledShards for the training layout).
    */
  def write(df: DataFrame, path: String, compression: String = "none"): Unit =
    df.write.mode(SaveMode.Overwrite)
      .option("compression", compression)
      .json(path)
}
