package graft

import graft.multimodal.Multimodal
import graft.queries.{RelationalQueries, TextQueries, VectorQueries}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Query inventory (each key has a matching DuckDB oracle unless the
  * computation is not SQL-expressible — sketch internals, ANN index probes,
  * libm-log scoring — which get rows-only checks plus spec coverage):
  *   - q01–q16: relational ops (SURVEY §2 A/P/T/U families + joins,
  *     windows, sessionization, as-of, epoch-tumbling windows)
  *   - q17–q25, q64–q84, q86–q87: text analysis + dedup (tokens/quality/langid,
  *     exact dedup, MinHash+LSH near-dup, Jaccard verify, SimHash and
  *     winnowing fingerprints + their pair/apply dedup families, word
  *     13-gram benchmark decontamination — exact q69 and bloom-prefiltered
  *     q83, the complete Gopher filter (repetition + quality + combined
  *     apply), cross-doc duplicated passages, mixture / quality-
  *     proportional sampling, source-priority and incremental-admission
  *     dedup, PII scrub, leakage-safe splits, unigram LM-proxy scoring,
  *     deterministic shuffle + shard assignment (q86), token-budget
  *     selection (q87);
  *     q82 is the z-order layout key over events)
  *   - q26–q29, q35, q39, q55, q85: similarity search + embedding ops
  *     (brute cosine kNN, multiprobe sign-LSH kNN, vector stats,
  *     centroids, LSH-composed near-dup, IVF index, int8 quantization,
  *     embedding-space decontamination)
  *   - q30–q31: multimodal binary plumbing (metadata + byte features)
  *   - q38, q40, q42, q52–q54: tokenization pipeline (chunking, TF-IDF,
  *     BM25, vocabulary, sequence packing, dictionary encoding)
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    RelationalQueries.queries("q10_join_agg")(spark, "/root/testdata/sf0.001")

  private val multimodalQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // The complete reference-shaped ETL (extract → clean → weekly PnL agg),
    // run on the reference's own CSV regardless of sfDir — benches the
    // end-to-end pipeline per round against BASELINE.md's stage timings.
    // Hash-checked: the oracle below replays the ENTIRE pipeline in DuckDB
    // over the same CSV, bit-for-bit (golden parity additionally asserted
    // in TradesEtlSpec against the reference's checked-in artifacts).
    "q44_trades_etl" -> ((s, _) => {
      val raw = graft.etl.TradesEtl.extract(
        s, "/root/reference/trades (1) (2) (1).csv")
      graft.etl.Transform(graft.etl.TradesEtl.clean(raw), computePnl = true)
    }),

    // Binary column + metadata (oracle: octet_length + sha256 parity).
    "q30_media_meta" -> ((s, d) => {
      Multimodal.mediaTable(Tables.documents(s, d)).select(
        col("doc_id"),
        octet_length(col("bytes")).cast("long").as("n_bytes"),
        sha2(col("bytes"), 256).as("digest"))
    }),
    // Stub decode → per-media byte features. Registered on the columnar
    // Catalyst-expression path (whole-stage codegen, no object round-trip);
    // the mapPartitions twin — for real codecs needing per-partition init —
    // is bit-identical (MultimodalSpec). Registered projection is the
    // INTEGER/hex features (n_bytes, mode_byte, strided-sample hex) so the
    // DuckDB oracle replays them exactly; entropy (libm log, not
    // bit-portable across engines) stays fixture-checked in MultimodalSpec.
    "q31_media_features" -> ((s, d) => {
      Multimodal.extractFeaturesColumnar(Multimodal.mediaTable(Tables.documents(s, d)))
        .select(col("doc_id"),
          col("n_bytes").cast("long").as("n_bytes"),
          col("mode_byte").cast("long").as("mode_byte"),
          hex(col("sample")).as("sample_hex"))
    }),
  )

  private val multimodalOracle: Map[String, String] = Map(
    "q30_media_meta" ->
      """SELECT doc_id, octet_length(encode(text)) AS n_bytes,
        |  sha256(text) AS digest
        |FROM documents""".stripMargin,
    // Byte-feature replay over the UTF-8 bytes: histogram mode via hex-pair
    // unnest (fixed-width uppercase hex → lexicographic order = numeric
    // order; row_number tie-breaks to the smallest byte, matching the
    // kernel's strict-> ascending scan), strided sample rebuilt from the
    // same hex string. Empty bytes → mode 0 / '' (the kernel's defaults).
    "q31_media_features" ->
      """WITH m AS (
        |  SELECT doc_id, hex(encode(text)) AS hx,
        |    octet_length(encode(text)) AS n
        |  FROM documents),
        |b AS (
        |  SELECT doc_id, unnest(list_transform(generate_series(1, n),
        |    i -> substr(hx, (i - 1) * 2 + 1, 2))) AS bv
        |  FROM m),
        |c AS (SELECT doc_id, bv, count(*) AS cnt FROM b GROUP BY 1, 2),
        |md AS (
        |  SELECT doc_id,
        |    CAST((strpos('0123456789ABCDEF', substr(bv, 1, 1)) - 1) * 16
        |       + (strpos('0123456789ABCDEF', substr(bv, 2, 1)) - 1) AS BIGINT)
        |      AS mode_byte
        |  FROM (SELECT doc_id, bv,
        |      row_number() OVER (PARTITION BY doc_id ORDER BY cnt DESC, bv ASC) AS rn
        |    FROM c) WHERE rn = 1)
        |SELECT m.doc_id,
        |  CAST(m.n AS BIGINT) AS n_bytes,
        |  CASE WHEN m.n = 0 THEN CAST(0 AS BIGINT) ELSE md.mode_byte END AS mode_byte,
        |  CASE WHEN m.n IS NULL THEN NULL
        |  ELSE array_to_string(list_transform(
        |    generate_series(0, least(16, m.n) - 1),
        |    k -> substr(m.hx, k * greatest(m.n // 16, 1) * 2 + 1, 2)), '')
        |  END AS sample_hex
        |FROM m LEFT JOIN md USING (doc_id)""".stripMargin,
    // Full replica of the reference pipeline (clean → derive → weekly agg →
    // mark price → PnL) over the reference's own CSV — flips the flagship
    // q44 from rows-only to hash-checked. Bit-exactness holds because both
    // engines read the single 800-row file sequentially, so every double
    // sum accumulates in the same (file) order, and every other value is a
    // single cast/division/product (NOTES float-parity rules).
    "q44_trades_etl" ->
      """WITH raw AS (
        |  SELECT * FROM read_csv('/root/reference/trades (1) (2) (1).csv',
        |    header=true, all_varchar=true)),
        |clean AS (
        |  SELECT
        |    try_strptime(timestamp, '%Y-%m-%d %H:%M:%S') AS ts,
        |    TRY_CAST(user_id AS BIGINT) AS user_id,
        |    client_type, symbol, side,
        |    TRY_CAST(quantity AS DOUBLE) AS quantity,
        |    TRY_CAST(price AS DOUBLE) AS price
        |  FROM raw
        |  WHERE try_strptime(timestamp, '%Y-%m-%d %H:%M:%S') IS NOT NULL
        |    AND TRY_CAST(user_id AS BIGINT) IS NOT NULL
        |    AND client_type IS NOT NULL AND symbol IS NOT NULL AND side IS NOT NULL
        |    AND TRY_CAST(quantity AS DOUBLE) IS NOT NULL
        |    AND TRY_CAST(price AS DOUBLE) IS NOT NULL),
        |derived AS (
        |  SELECT *, CAST(date_trunc('week', ts) AS DATE) AS week_start_date,
        |    quantity * price AS total_volume
        |  FROM clean),
        |mark AS (
        |  SELECT symbol, arg_max(price, ts) AS mark_price FROM derived GROUP BY symbol),
        |agg AS (
        |  SELECT week_start_date, client_type, user_id, symbol,
        |    coalesce(sum(CASE WHEN side = 'buy' THEN quantity END), 0.0) AS buy_qty,
        |    coalesce(sum(CASE WHEN side = 'sell' THEN quantity END), 0.0) AS sell_qty,
        |    coalesce(sum(CASE WHEN side = 'buy' THEN total_volume END), 0.0) AS buy_value,
        |    coalesce(sum(CASE WHEN side = 'sell' THEN total_volume END), 0.0) AS sell_value,
        |    sum(total_volume) AS total_volume,
        |    count(ts) AS trade_count
        |  FROM derived GROUP BY 1, 2, 3, 4),
        |pnl AS (
        |  SELECT agg.*, mark.mark_price,
        |    CASE WHEN buy_qty <> 0.0 THEN buy_value / buy_qty END AS avg_buy_price,
        |    buy_qty - sell_qty AS net_qty
        |  FROM agg LEFT JOIN mark USING (symbol))
        |SELECT week_start_date, client_type, user_id, symbol, buy_qty, sell_qty,
        |  buy_value, sell_value, total_volume, trade_count, avg_buy_price, net_qty,
        |  sell_value - avg_buy_price * sell_qty AS realized_pnl, mark_price,
        |  (mark_price - avg_buy_price) * (buy_qty - sell_qty) AS unrealized_pnl,
        |  (sell_value - avg_buy_price * sell_qty)
        |    + (mark_price - avg_buy_price) * (buy_qty - sell_qty) AS total_pnl
        |FROM pnl""".stripMargin,
  )

  /** One entry per implemented operator from SURVEY.md §2 (+ extensions). */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RelationalQueries.queries ++ TextQueries.queries ++
      VectorQueries.queries ++ multimodalQueries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys → driver records a weaker
    * rows-only check (q29: partition-order float sums, its bit-exact twin
    * q60 IS oracled; q36: sketches; q39/q56/q57: ANN recall-bounded in
    * specs; q42: libm log, its rational twin q42b IS oracled). The md5
    * fingerprint family (q24/q25) IS oracle-replayed.
    */
  def oracleSql: Map[String, String] =
    RelationalQueries.oracleSql ++ TextQueries.oracleSql ++
      VectorQueries.oracleSql ++ multimodalOracle
}
