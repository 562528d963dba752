package graft.queries

import graft.Tables
import graft.operators.RelationalOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DateType

/** Relational operator inventory (SURVEY.md §2) phrased over the driver
  * testdata so DuckDB can oracle every query.
  *
  * Float-parity rules used throughout (so Spark and DuckDB hash-match):
  *   - sums of integer-valued doubles (l_quantity) are exact — no rounding;
  *   - money columns are exact 2-decimal — `round(sum(x), 2)` lands both
  *     engines on the double nearest the true decimal sum (error ~1e-9 vs
  *     boundary distance 5e-3); products with discounts are 4-decimal →
  *     `round(, 4)`;
  *   - event timestamps carry nanoseconds (Spark truncates to micros on
  *     read, DuckDB keeps ns) → always surface them as `unix_micros` /
  *     `epoch_us` bigints, never raw.
  */
object RelationalQueries {

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // C1-C3: null-coercing casts — JSON field extraction with try_cast and a
    // strict timestamp parse where malformed inputs become NULL, then a
    // drop-null filter. ANSI mode stays ON; try_* carries the coercion.
    "q00_clean_cast" -> ((s, d) => {
      Tables.events(s, d)
        .select(
          col("event_id"),
          expr("""try_cast(regexp_extract(props, '"k": (-?\\d+)', 1) AS BIGINT)""")
            .as("k_val"),
          unix_seconds(try_to_timestamp(
            when(col("event_id") % 97 === 0, lit("not_a_date"))
              .otherwise(date_format(col("ts"), "yyyy-MM-dd HH:mm:ss")),
            lit("yyyy-MM-dd HH:mm:ss"))).as("parsed_epoch"))
        .filter(col("k_val").isNotNull)
    }),

    // A1/A2 + P3: grouped conditional aggregation, one shuffle, map-side combine.
    "q01_cond_agg" -> ((s, d) => {
      Tables.lineitem(s, d)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum("l_quantity").as("sum_qty"),
          round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 4)
            .as("sum_disc_price"),
          coalesce(sum(when(col("l_returnflag") === "R", col("l_quantity"))), lit(0.0))
            .as("returned_qty"),
          count(lit(1)).as("cnt"))
    }),

    // P1: Monday-based week truncation + weekly rollup.
    "q02_week_agg" -> ((s, d) => {
      Tables.lineitem(s, d)
        .groupBy(date_trunc("week", col("l_shipdate")).cast(DateType).as("week"))
        .agg(sum("l_quantity").as("sum_qty"), count(lit(1)).as("cnt"))
    }),

    // A3: argmax (latest value per key) — single shuffle, no join, no
    // window. event_id tiebreak: µs-truncated timestamps can collide where
    // the raw ns values differed, and bare max_by would pick an arbitrary
    // (partition-order-dependent) row.
    "q03_argmax" -> ((s, d) => {
      Tables.events(s, d)
        .groupBy("event_type")
        .agg(
          max_by(col("value"), struct(col("ts"), col("event_id"))).as("last_value"),
          unix_micros(max(col("ts"))).as("last_ts_us"))
    }),

    // A4: star-schema rollup through two broadcast dims (no shuffle on dims).
    "q04_broadcast_join" -> ((s, d) => {
      Tables.customer(s, d)
        .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name")
        .agg(count(lit(1)).as("cnt"), round(sum(col("c_acctbal")), 2).as("acctbal_sum"))
    }),

    // A5: filter + group — predicate pushed to the parquet scan.
    "q05_filter_group" -> ((s, d) => {
      Tables.orders(s, d)
        .filter(col("o_orderstatus") === "F")
        .groupBy("o_custkey")
        .agg(
          count(lit(1)).as("cnt"),
          round(sum(col("o_totalprice")), 2).as("total"),
          max(col("o_orderdate")).as("last_order"))
    }),

    // T1: global top-k → TakeOrderedAndProject (no full sort at scale).
    "q06_topk" -> ((s, d) => {
      Tables.orders(s, d)
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(10)
    }),

    // T2: rank over a per-key aggregate (ties share rank — deterministic set).
    // Scale shape: a global Window.orderBy would single-partition ALL rows;
    // instead find the k-th distinct value (tiny TakeOrdered), filter to the
    // qualifying rows, and rank only that small set.
    "q07_rank_window" -> ((s, d) => {
      val counts = Tables.orders(s, d)
        .groupBy("o_custkey").agg(count(lit(1)).as("cnt"))
      // threshold as a broadcast scalar frame, not head() — stays lazy and
      // returns empty (like the oracle) instead of NPE on an empty table
      val kth = counts.select("cnt").distinct()
        .orderBy(col("cnt").desc).limit(5)
        .agg(min("cnt").as("kth"))
      counts
        .join(broadcast(kth), col("cnt") >= col("kth"))
        .withColumn("rnk", rank().over(Window.orderBy(col("cnt").desc)).cast("long"))
        .filter(col("rnk") <= 5)
        .drop("kth")
    }),

    // A7: pivot — one shuffle, pivoted columns fixed up-front (no extra pass).
    "q08_pivot" -> ((s, d) => {
      Tables.orders(s, d)
        .groupBy("o_orderpriority")
        .pivot("o_orderstatus", Seq("O", "F", "P"))
        .count()
        .na.fill(0L)
    }),

    // U1: union-all of same-schema branches with a discriminator column.
    "q09_union" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val hi = o.filter(col("o_totalprice") > 400000.0)
        .select(col("o_orderkey"), col("o_totalprice"), lit("high").as("bucket"))
      val lo = o.filter(col("o_totalprice") < 5000.0)
        .select(col("o_orderkey"), col("o_totalprice"), lit("low").as("bucket"))
      hi.unionByName(lo)
    }),

    // Fact-fact shuffle join + rollup (headline bench query).
    "q10_join_agg" -> ((s, d) => {
      Tables.lineitem(s, d)
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(
          count(lit(1)).as("cnt"),
          round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 4)
            .as("revenue"))
    }),

    // Left-semi join: existence probe without row duplication.
    "q11_semi_join" -> ((s, d) => {
      val open = Tables.orders(s, d).filter(col("o_orderstatus") === "O")
      Tables.customer(s, d)
        .join(open, col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name")
    }),

    // Left-anti join: customers with no completed ('F') orders.
    "q12_anti_join" -> ((s, d) => {
      val done = Tables.orders(s, d).filter(col("o_orderstatus") === "F")
      Tables.customer(s, d)
        .join(done, col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
    }),

    // Window lag: per-user event-to-event delta (one shuffle on user_id).
    "q13_window_lag" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      Tables.events(s, d)
        .select(
          col("event_id"), col("user_id"),
          (col("value") - lag(col("value"), 1).over(w)).as("delta"))
    }),

    // Gap-based sessionization (30-min inactivity) → per-user session stats.
    "q14_sessionize" -> ((s, d) => {
      RelationalOps.sessionize(
          Tables.events(s, d), "user_id", col("ts"), col("event_id"),
          java.time.Duration.ofMinutes(30))
        .groupBy("user_id")
        .agg(
          (max(col("session_id")) + 1).as("n_sessions"),
          count(lit(1)).as("n_events"))
    }),

    // As-of join: last click strictly before each purchase, same user.
    "q15_asof" -> ((s, d) => {
      RelationalOps.lastEventBefore(
          Tables.events(s, d), "user_id", "ts",
          "event_type", ofType = "purchase", fromType = "click",
          outCol = "last_click_ts")
        .select(
          col("event_id"), col("user_id"),
          unix_micros(col("ts")).as("ts_us"),
          unix_micros(col("last_click_ts")).as("last_click_us"))
    }),

    // Epoch-aligned 7-day tumbling window (batch twin of the streaming agg).
    // Floor-div via pmod: `div` truncates toward zero and would misplace
    // pre-1970 events by one window (DuckDB's `//` floors).
    "q16_event_window" -> ((s, d) => {
      Tables.events(s, d)
        .groupBy(
          expr("unix_seconds(ts) - pmod(unix_seconds(ts), 604800)").as("win_start"),
          col("event_type"))
        .agg(count(lit(1)).as("cnt"), round(sum(col("value")), 2).as("value_sum"))
    }),

    // JSON column handling: schema-on-read via from_json into a typed
    // struct (not regexp) + per-type aggregation of the extracted field.
    "q45_json_extract" -> ((s, d) => {
      Tables.events(s, d)
        .select(col("event_type"),
          from_json(col("props"),
            org.apache.spark.sql.types.StructType.fromDDL("k BIGINT"))
            .getField("k").as("k"))
        .groupBy("event_type")
        .agg(
          count(col("k")).as("n_k"),
          sum(col("k")).as("k_sum"),
          min(col("k")).as("k_min"),
          max(col("k")).as("k_max"))
    }),

    // Moving aggregate with an explicit ROWS frame (per-user, 3-row sum).
    "q32_moving_sum" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        .rowsBetween(-2, Window.currentRow)
      Tables.events(s, d)
        .select(col("event_id"), col("user_id"),
          round(sum(col("value")).over(w), 2).as("mov_sum"))
    }),

    // ROLLUP: hierarchical subtotals + grand total in one pass.
    "q33_rollup" -> ((s, d) => {
      Tables.orders(s, d)
        .rollup("o_orderpriority", "o_orderstatus")
        .agg(count(lit(1)).as("cnt"), round(sum(col("o_totalprice")), 2).as("total"))
    }),

    // CUBE: all grouping-set combinations in one pass.
    "q41_cube" -> ((s, d) => {
      Tables.orders(s, d)
        .cube("o_orderpriority", "o_orderstatus")
        .agg(count(lit(1)).as("cnt"), round(sum(col("o_totalprice")), 2).as("total"))
    }),

    // Exact distinct aggregation (expands to a two-phase plan).
    "q34_distinct_agg" -> ((s, d) => {
      Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(
          countDistinct(col("l_suppkey")).as("n_supp"),
          countDistinct(col("l_partkey")).as("n_part"),
          count(lit(1)).as("cnt"))
    }),

    // Exact top-k per group via the typed TopKByValue Aggregator: bounded
    // k-element buffers with map-side partial aggregation — no per-group
    // window sort. Oracle is the equivalent row_number window query.
    "q37_topk_agg" -> ((s, d) => {
      import s.implicits._
      Tables.orders(s, d)
        .select(col("o_orderpriority"), col("o_totalprice"), col("o_orderkey"))
        .as[(String, Double, Long)]
        .groupByKey(_._1)
        .mapValues(r => (r._2, r._3))
        .agg(new graft.functions.TopKByValue(3).toColumn)
        .toDF("o_orderpriority", "top")
        .select(col("o_orderpriority"), posexplode(col("top")).as(Seq("pos", "pair")))
        .select(
          col("o_orderpriority"),
          col("pair._2").as("o_orderkey"),
          col("pair._1").as("o_totalprice"),
          (col("pos") + 1).cast("long").as("rnk"))
    }),

    // Approximate aggregates: HLL++ distinct count + quantile sketch.
    // Sketch internals differ across engines → no SQL oracle (rows-only);
    // ApproxAggSpec bounds the error against the exact q34 values instead.
    "q36_approx_stats" -> ((s, d) => {
      Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(
          approx_count_distinct(col("l_suppkey")).as("approx_supp"),
          percentile_approx(col("l_extendedprice"), lit(0.5), lit(1000))
            .as("approx_median_price"))
    }),

    // Band (range) join: non-equi join of a fact against a tiny interval
    // dim. Broadcast → BroadcastNestedLoopJoin; the dim side is rows, never
    // a shuffle, so this survives any fact-table scale.
    "q46_range_join" -> ((s, d) => {
      import s.implicits._
      val bands = Seq(
        ("tiny", 0.0, 50000.0), ("small", 50000.0, 150000.0),
        ("mid", 150000.0, 300000.0), ("large", 300000.0, 1.0e9))
        .toDF("band", "lo", "hi")
      Tables.orders(s, d)
        .join(broadcast(bands),
          col("o_totalprice") >= col("lo") && col("o_totalprice") < col("hi"))
        .groupBy("band")
        .agg(count(lit(1)).as("cnt"),
          round(sum(col("o_totalprice")), 2).as("total"))
    }),

    // Deterministic train/val/test split: threshold on the md5 hex of the
    // row key — reproducible across runs, engines, and cluster sizes (no
    // RNG, no partition dependence), the standard way to split a 100 TB
    // corpus without a global shuffle. ~80/10/10 via hex prefix bands.
    "q47_hash_split" -> ((s, d) => {
      val h = substring(md5(col("doc_id").cast("string")), 1, 2)
      Tables.documents(s, d).select(
        col("doc_id"),
        when(h < "cd", "train").when(h < "e6", "val").otherwise("test")
          .as("split"))
    }),

    // GROUPING SETS: chosen subtotal combinations in one pass (the general
    // form of q33 ROLLUP / q41 CUBE), with grouping() flags to distinguish
    // a NULL key from a subtotal row.
    "q48_grouping_sets" -> ((s, d) => {
      Tables.orders(s, d)
        .groupingSets(
          Seq(Seq(col("o_orderpriority")), Seq(col("o_orderstatus")), Seq()),
          col("o_orderpriority"), col("o_orderstatus"))
        .agg(
          grouping(col("o_orderpriority")).cast("int").as("g_pri"),
          grouping(col("o_orderstatus")).cast("int").as("g_st"),
          count(lit(1)).as("cnt"),
          round(sum(col("o_totalprice")), 2).as("total"))
    }),

    // PII-shaped redaction: replace every number in the props JSON with a
    // placeholder and count the hits — regexp_replace/regexp_count are
    // codegen'd, one narrow pass, no shuffle.
    "q49_redact" -> ((s, d) => {
      Tables.events(s, d).select(
        col("event_id"),
        regexp_replace(col("props"), "-?\\d+", "<NUM>").as("scrubbed"),
        regexp_count(col("props"), lit("-?\\d+")).cast("long").as("n_hits"))
    }),

    // Exact quartiles. Bit-safe across engines DESPITE being interpolated:
    // l_quantity is integer-valued and the R-7 index fractions here are
    // quarters, so every interpolation step is exact binary arithmetic —
    // both engines land on the identical double.
    "q50_quartiles" -> ((s, d) => {
      Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(
          percentile(col("l_quantity"), lit(0.25)).as("q1"),
          percentile(col("l_quantity"), lit(0.5)).as("median"),
          percentile(col("l_quantity"), lit(0.75)).as("q3"),
          count(lit(1)).as("cnt"))
    }),

    // Stratified deterministic sampling: per-stratum md5-threshold rates
    // (10% of clicks, 50% of everything else) — the keep decision is a
    // pure function of the row key, so the sample is stable under re-runs
    // and repartitioning, unlike rand()-based sampling.
    "q51_stratified_sample" -> ((s, d) => {
      val h = substring(md5(col("event_id").cast("string")), 1, 2)
      Tables.events(s, d)
        .filter(
          (col("event_type") === "click" && h < "1a") ||
            (col("event_type") =!= "click" && h < "80"))
        .select("event_id", "event_type")
    }),

    // Z-order (Morton) clustering key over (user_id, event minute) — the
    // sort key the OPTIMIZE-ZORDER layout rewrite clusters files by, so a
    // 100 TB events table prunes row groups on user AND time predicates
    // (see graft.sources.ZOrderLayout; per-file span shrinkage measured in
    // ZOrderSpec). Pure codegen'd integer bit-arithmetic, generated from
    // the same bit loop as the oracle's SQL. `div`/`//` agree because both
    // operands are non-negative (events are post-epoch; pmod wraps into
    // the 16-bit range).
    // Ordered conversion funnel (view → click → purchase, strictly
    // increasing timestamps): running conditional-min cascade over ONE
    // (user, ts) sort — no per-step self-joins, no collect; the per-user
    // aggregate reuses the window's hash partitioning so the whole funnel
    // is a single exchange (plan-asserted in FunnelSpec).
    "q91_funnel" -> ((s, d) => {
      RelationalOps.funnelStages(
          Tables.events(s, d), "user_id", col("ts"), col("event_id"),
          "event_type", Seq("view", "click", "purchase"))
        .select(col("user_id"),
          unix_micros(col("view_ts")).as("view_us"),
          unix_micros(col("click_ts")).as("click_us"),
          unix_micros(col("purchase_ts")).as("purchase_us"))
    }),

    // Funnel summary: conversion counts per stage + time-to-convert stats
    // over the q91 per-user frame — one global single-row aggregate (the
    // operator's output), micros are integers so the median midpoint is
    // engine-exact (the q50 rule).
    "q96_funnel_summary" -> ((s, d) => {
      RelationalOps.funnelStages(
          Tables.events(s, d), "user_id", col("ts"), col("event_id"),
          "event_type", Seq("view", "click", "purchase"))
        .select(col("user_id"),
          unix_micros(col("view_ts")).as("view_us"),
          unix_micros(col("click_ts")).as("click_us"),
          unix_micros(col("purchase_ts")).as("purchase_us"))
        .agg(
          count(lit(1)).as("n_users"),
          count(col("view_us")).as("n_viewed"),
          count(col("click_us")).as("n_clicked"),
          count(col("purchase_us")).as("n_purchased"),
          percentile(col("purchase_us") - col("view_us"), lit(0.5))
            .as("median_convert_us"),
          min(col("purchase_us") - col("view_us")).as("min_convert_us"),
          max(col("purchase_us") - col("view_us")).as("max_convert_us"))
    }),

    // Windowed funnel: each step within 24 h of the MOST RECENT qualifying
    // predecessor (conversion-window semantics — a fresh re-view re-opens
    // the funnel where q91's earliest-chaining would have expired).
    "q97_funnel_windowed" -> ((s, d) => {
      RelationalOps.funnelStagesWindowed(
          Tables.events(s, d), "user_id", col("ts"), col("event_id"),
          "event_type", Seq("view", "click", "purchase"),
          java.time.Duration.ofHours(24))
        .select(col("user_id"),
          unix_micros(col("view_ts")).as("view_us"),
          unix_micros(col("click_ts")).as("click_us"),
          unix_micros(col("purchase_ts")).as("purchase_us"))
    }),

    // Cohort retention matrix: cohort = epoch-aligned week of each user's
    // first event; count distinct active users per (cohort, week offset).
    // One window shuffle (min-over-partition, sortless frame) + one small
    // aggregate.
    "q92_cohort_retention" -> ((s, d) => {
      RelationalOps.cohortRetention(Tables.events(s, d), "user_id", "ts",
        604800L)
    }),

    // Retention-rate matrix: q92 normalized by cohort size (the offset-0
    // count). The cohort-size table is tiny (one row per cohort) and rides
    // a broadcast join; the per-row division is a single IEEE operation,
    // deterministic across engines (the documented float rule).
    "q98_retention_rate" -> ((s, d) => {
      // materialize: the matrix (≤ periods² rows) feeds BOTH the size
      // lookup and the join — without it the corpus window re-runs twice
      RelationalOps.retentionRateFrom(RelationalOps.materialize(
        RelationalOps.cohortRetention(
          Tables.events(s, d), "user_id", "ts", 604800L)))
    }),

    // Exact deterministic k-per-group sample (eval-set construction).
    // NOT the window-over-the-whole-corpus formulation: per-group hash
    // thresholds from a tiny count aggregate keep ~safety·k rows per
    // group, the ranking window runs over that O(groups·k) survivor set,
    // and a shortfall fallback keeps the result exact by construction
    // (see RelationalOps.stratifiedExactK). Oracle is the plain window
    // truth the two-pass plan must reproduce.
    "q93_stratified_k" -> ((s, d) => {
      RelationalOps.stratifiedExactK(
        // adaptive fan-out (identity at scale): the per-row salted-md5
        // keys, integer count thresholds, and the shortfall fallback are
        // all order-independent — see Fan.out
        graft.operators.Fan.out(Tables.documents(s, d), col("doc_id")),
        "lang", "doc_id", k = 20, salt = ":strat")
    }),

    // Temporal gap-fill: dense per-user weekly grid with zero rows for
    // silent weeks and a forward-filled last aggregate. The grid explodes
    // from the per-user span AGGREGATE, never the raw events.
    "q94_gapfill" -> ((s, d) => {
      RelationalOps.gapFillPeriods(
        Tables.events(s, d), "user_id", "ts", "value", 604800L)
    }),

    // Per-column data-quality profile of the events table — the
    // extraction-stage monitoring summary (null/distinct/range per field)
    // in ONE corpus aggregate.
    "q95_profile" -> ((s, d) => {
      // RAW scan, deliberately NOT fanned out (round-15 A/B): the
      // multi-distinct profile plans as Expand×7 → partial agg keyed on
      // all profiled columns, and fanning that stage to 32 tasks measured
      // 20–24 summed executor core-s vs 1.2 single-task (≈ the whole
      // single-task stage cost repaid PER TASK) with wall 1.5 s → 2.0 s.
      // The single-row-group starvation loses to whatever per-task cost
      // the expanded multi-distinct partial aggregate carries here.
      RelationalOps.profileColumns(Tables.events(s, d),
        Seq("event_id", "ts", "user_id", "event_type", "value", "props"))
    }),

    "q82_zorder_key" -> ((s, d) => {
      val minuteBucket = expr("unix_micros(ts) div 60000000")
      Tables.events(s, d).select(
        col("event_id"),
        col("user_id"),
        minuteBucket.as("t_bucket"),
        graft.sources.ZOrderLayout.mortonKey(
          pmod(col("user_id"), lit(65536L)),
          pmod(minuteBucket, lit(65536L))).as("zkey"))
    }),
  )

  // The q91 running conditional-min cascade as a `funnel(user_id, view_us,
  // click_us, purchase_us)` CTE — ONE definition for the q91 replay and the
  // q96 summary replay, so the two oracles cannot drift.
  private lazy val funnelCteSql: String =
    """f AS (SELECT user_id, event_id, ts, event_type FROM events
      |  WHERE event_type IN ('view', 'click', 'purchase')),
      |w1 AS (SELECT *,
      |  min(CASE WHEN event_type = 'view' THEN ts END) OVER (
      |    PARTITION BY user_id ORDER BY ts, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run0
      |  FROM f),
      |w2 AS (SELECT *,
      |  min(CASE WHEN event_type = 'click' AND run0 IS NOT NULL
      |      AND ts > run0 THEN ts END) OVER (
      |    PARTITION BY user_id ORDER BY ts, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run1
      |  FROM w1),
      |funnel AS (SELECT user_id,
      |  epoch_us(min(CASE WHEN event_type = 'view' THEN ts END)) AS view_us,
      |  epoch_us(min(CASE WHEN event_type = 'click' AND run0 IS NOT NULL
      |    AND ts > run0 THEN ts END)) AS click_us,
      |  epoch_us(min(CASE WHEN event_type = 'purchase' AND run1 IS NOT NULL
      |    AND ts > run1 THEN ts END)) AS purchase_us
      |FROM w2 GROUP BY user_id)""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "q00_clean_cast" ->
      raw"""SELECT event_id,
           |  TRY_CAST(regexp_extract(props, '"k": (-?\d+)', 1) AS BIGINT) AS k_val,
           |  CAST(floor(epoch(try_strptime(
           |    CASE WHEN event_id % 97 = 0 THEN 'not_a_date'
           |         ELSE strftime(ts, '%Y-%m-%d %H:%M:%S') END,
           |    '%Y-%m-%d %H:%M:%S'))) AS BIGINT) AS parsed_epoch
           |FROM events
           |WHERE TRY_CAST(regexp_extract(props, '"k": (-?\d+)', 1) AS BIGINT) IS NOT NULL""".stripMargin,
    "q01_cond_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  sum(l_quantity) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_base_price,
        |  round(sum(l_extendedprice * (1.0 - l_discount)), 4) AS sum_disc_price,
        |  coalesce(sum(l_quantity) FILTER (WHERE l_returnflag = 'R'), 0.0) AS returned_qty,
        |  count(*) AS cnt
        |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "q02_week_agg" ->
      """SELECT CAST(date_trunc('week', l_shipdate) AS DATE) AS week,
        |  sum(l_quantity) AS sum_qty, count(*) AS cnt
        |FROM lineitem GROUP BY 1""".stripMargin,
    "q03_argmax" ->
      """SELECT event_type, value AS last_value, last_ts_us FROM (
        |  SELECT event_type, value,
        |    max(epoch_us(ts)) OVER (PARTITION BY event_type) AS last_ts_us,
        |    row_number() OVER (PARTITION BY event_type
        |      ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
        |  FROM events)
        |WHERE rn = 1""".stripMargin,
    "q04_broadcast_join" ->
      """SELECT r_name, count(*) AS cnt, round(sum(c_acctbal), 2) AS acctbal_sum
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name""".stripMargin,
    "q05_filter_group" ->
      """SELECT o_custkey, count(*) AS cnt, round(sum(o_totalprice), 2) AS total,
        |  max(o_orderdate) AS last_order
        |FROM orders WHERE o_orderstatus = 'F' GROUP BY o_custkey""".stripMargin,
    "q06_topk" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10""".stripMargin,
    "q07_rank_window" ->
      """SELECT o_custkey, cnt, rnk FROM (
        |  SELECT o_custkey, count(*) AS cnt,
        |    rank() OVER (ORDER BY count(*) DESC) AS rnk
        |  FROM orders GROUP BY o_custkey)
        |WHERE rnk <= 5""".stripMargin,
    "q08_pivot" ->
      """SELECT o_orderpriority,
        |  count(*) FILTER (WHERE o_orderstatus = 'O') AS "O",
        |  count(*) FILTER (WHERE o_orderstatus = 'F') AS "F",
        |  count(*) FILTER (WHERE o_orderstatus = 'P') AS "P"
        |FROM orders GROUP BY o_orderpriority""".stripMargin,
    "q09_union" ->
      """SELECT o_orderkey, o_totalprice, 'high' AS bucket FROM orders WHERE o_totalprice > 400000.0
        |UNION ALL
        |SELECT o_orderkey, o_totalprice, 'low' AS bucket FROM orders WHERE o_totalprice < 5000.0""".stripMargin,
    "q10_join_agg" ->
      """SELECT o_orderpriority, count(*) AS cnt,
        |  round(sum(l_extendedprice * (1.0 - l_discount)), 4) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority""".stripMargin,
    "q11_semi_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_orderstatus = 'O')""".stripMargin,
    "q12_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_orderstatus = 'F')""".stripMargin,
    "q13_window_lag" ->
      """SELECT event_id, user_id,
        |  value - lag(value, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS delta
        |FROM events""".stripMargin,
    "q14_sessionize" ->
      """WITH x AS (
        |  SELECT user_id, ts,
        |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
        |  FROM events)
        |SELECT user_id,
        |  count(*) FILTER (WHERE prev IS NULL
        |    OR date_diff('microsecond', prev, ts) > 1800000000) AS n_sessions,
        |  count(*) AS n_events
        |FROM x GROUP BY user_id""".stripMargin,
    "q15_asof" ->
      """WITH pc AS (SELECT * FROM events WHERE event_type IN ('purchase', 'click')),
        |w AS (
        |  SELECT event_id, user_id, ts, event_type,
        |    max(CASE WHEN event_type = 'click' THEN ts END) OVER (
        |      PARTITION BY user_id ORDER BY epoch_us(ts)
        |      RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_click_ts
        |  FROM pc)
        |SELECT event_id, user_id, epoch_us(ts) AS ts_us,
        |  epoch_us(last_click_ts) AS last_click_us
        |FROM w WHERE event_type = 'purchase'""".stripMargin,
    "q16_event_window" ->
      """SELECT (CAST(floor(epoch(ts)) AS BIGINT) // 604800) * 604800 AS win_start,
        |  event_type, count(*) AS cnt, round(sum(value), 2) AS value_sum
        |FROM events GROUP BY 1, 2""".stripMargin,
    "q45_json_extract" ->
      """SELECT event_type,
        |  count(CAST(props->>'$.k' AS BIGINT)) AS n_k,
        |  CAST(sum(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS k_sum,
        |  min(CAST(props->>'$.k' AS BIGINT)) AS k_min,
        |  max(CAST(props->>'$.k' AS BIGINT)) AS k_max
        |FROM events GROUP BY event_type""".stripMargin,
    "q32_moving_sum" ->
      """SELECT event_id, user_id,
        |  round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 2) AS mov_sum
        |FROM events""".stripMargin,
    "q33_rollup" ->
      """SELECT o_orderpriority, o_orderstatus, count(*) AS cnt,
        |  round(sum(o_totalprice), 2) AS total
        |FROM orders GROUP BY ROLLUP (o_orderpriority, o_orderstatus)""".stripMargin,
    "q41_cube" ->
      """SELECT o_orderpriority, o_orderstatus, count(*) AS cnt,
        |  round(sum(o_totalprice), 2) AS total
        |FROM orders GROUP BY CUBE (o_orderpriority, o_orderstatus)""".stripMargin,
    "q37_topk_agg" ->
      """SELECT o_orderpriority, o_orderkey, o_totalprice, rnk FROM (
        |  SELECT o_orderpriority, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_orderpriority
        |      ORDER BY o_totalprice DESC, o_orderkey ASC) AS rnk
        |  FROM orders)
        |WHERE rnk <= 3""".stripMargin,
    "q34_distinct_agg" ->
      """SELECT l_returnflag,
        |  count(DISTINCT l_suppkey) AS n_supp,
        |  count(DISTINCT l_partkey) AS n_part,
        |  count(*) AS cnt
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    "q46_range_join" ->
      """WITH bands(band, lo, hi) AS (VALUES
        |  ('tiny', 0.0, 50000.0), ('small', 50000.0, 150000.0),
        |  ('mid', 150000.0, 300000.0), ('large', 300000.0, 1.0e9))
        |SELECT band, count(*) AS cnt, round(sum(o_totalprice), 2) AS total
        |FROM orders JOIN bands ON o_totalprice >= lo AND o_totalprice < hi
        |GROUP BY band""".stripMargin,
    "q47_hash_split" ->
      """SELECT doc_id,
        |  CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'cd' THEN 'train'
        |       WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'e6' THEN 'val'
        |       ELSE 'test' END AS split
        |FROM documents""".stripMargin,
    "q48_grouping_sets" ->
      """SELECT o_orderpriority, o_orderstatus,
        |  CAST(GROUPING(o_orderpriority) AS INT) AS g_pri,
        |  CAST(GROUPING(o_orderstatus) AS INT) AS g_st,
        |  count(*) AS cnt, round(sum(o_totalprice), 2) AS total
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())""".stripMargin,
    "q49_redact" ->
      raw"""SELECT event_id,
           |  regexp_replace(props, '-?\d+', '<NUM>', 'g') AS scrubbed,
           |  CAST(len(regexp_extract_all(props, '-?\d+')) AS BIGINT) AS n_hits
           |FROM events""".stripMargin,
    "q50_quartiles" ->
      """SELECT l_returnflag,
        |  quantile_cont(l_quantity, 0.25) AS q1,
        |  quantile_cont(l_quantity, 0.5) AS median,
        |  quantile_cont(l_quantity, 0.75) AS q3,
        |  count(*) AS cnt
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    "q51_stratified_sample" ->
      """SELECT event_id, event_type FROM events
        |WHERE (event_type = 'click'
        |    AND substr(md5(CAST(event_id AS VARCHAR)), 1, 2) < '1a')
        |  OR (event_type <> 'click'
        |    AND substr(md5(CAST(event_id AS VARCHAR)), 1, 2) < '80')""".stripMargin,
    // q91 replay: the same running conditional-min cascade, spelled as
    // stacked window CTEs (run0 feeds run1's qualification, exactly like
    // the Spark __run columns). Shared with q96's summary replay.
    "q91_funnel" -> s"WITH $funnelCteSql\nSELECT * FROM funnel",
    // q96 replay: aggregates over the SAME cascade CTE — conversion
    // counts and time-to-convert stats (micros are integers, so the
    // even-count median midpoint (a+b)/2 is exact in doubles).
    "q96_funnel_summary" ->
      s"""WITH $funnelCteSql
         |SELECT count(*) AS n_users,
         |  count(view_us) AS n_viewed,
         |  count(click_us) AS n_clicked,
         |  count(purchase_us) AS n_purchased,
         |  quantile_cont(purchase_us - view_us, 0.5) AS median_convert_us,
         |  CAST(min(purchase_us - view_us) AS BIGINT) AS min_convert_us,
         |  CAST(max(purchase_us - view_us) AS BIGINT) AS max_convert_us
         |FROM funnel""".stripMargin,
    // q97 replay: the windowed cascade — running conditional MAXIMA (the
    // freshest qualifying predecessor) with the 24 h horizon on micros.
    "q97_funnel_windowed" ->
      """WITH f AS (SELECT user_id, event_id, ts, event_type FROM events
        |  WHERE event_type IN ('view', 'click', 'purchase')),
        |w1 AS (SELECT *,
        |  max(CASE WHEN event_type = 'view' THEN ts END) OVER (
        |    PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last0
        |  FROM f),
        |w2 AS (SELECT *,
        |  max(CASE WHEN event_type = 'click' AND last0 IS NOT NULL
        |      AND ts > last0
        |      AND epoch_us(ts) - epoch_us(last0) <= 86400000000
        |    THEN ts END) OVER (
        |    PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last1
        |  FROM w1)
        |SELECT user_id,
        |  epoch_us(min(CASE WHEN event_type = 'view' THEN ts END)) AS view_us,
        |  epoch_us(min(CASE WHEN event_type = 'click' AND last0 IS NOT NULL
        |    AND ts > last0
        |    AND epoch_us(ts) - epoch_us(last0) <= 86400000000
        |    THEN ts END)) AS click_us,
        |  epoch_us(min(CASE WHEN event_type = 'purchase' AND last1 IS NOT NULL
        |    AND ts > last1
        |    AND epoch_us(ts) - epoch_us(last1) <= 86400000000
        |    THEN ts END)) AS purchase_us
        |FROM w2 GROUP BY user_id""".stripMargin,
    "q92_cohort_retention" ->
      """WITH f AS (SELECT user_id, ts,
        |    min(ts) OVER (PARTITION BY user_id) AS first_ts
        |  FROM events),
        |p AS (SELECT user_id,
        |    (CAST(floor(epoch(first_ts)) AS BIGINT) // 604800) AS fp,
        |    (CAST(floor(epoch(ts)) AS BIGINT) // 604800) AS tp
        |  FROM f)
        |SELECT fp * 604800 AS cohort_start, tp - fp AS period_offset,
        |  count(DISTINCT user_id) AS n_active
        |FROM p GROUP BY 1, 2""".stripMargin,
    // q98 replay: q92's matrix CTE self-joined on its offset-0 row.
    "q98_retention_rate" ->
      """WITH f AS (SELECT user_id, ts,
        |    min(ts) OVER (PARTITION BY user_id) AS first_ts
        |  FROM events),
        |p AS (SELECT user_id,
        |    (CAST(floor(epoch(first_ts)) AS BIGINT) // 604800) AS fp,
        |    (CAST(floor(epoch(ts)) AS BIGINT) // 604800) AS tp
        |  FROM f),
        |m AS (SELECT fp * 604800 AS cohort_start, tp - fp AS period_offset,
        |    count(DISTINCT user_id) AS n_active
        |  FROM p GROUP BY 1, 2)
        |SELECT m.cohort_start, m.period_offset, m.n_active,
        |  z.n_active AS cohort_size,
        |  CAST(m.n_active AS DOUBLE) / CAST(z.n_active AS DOUBLE)
        |    AS retention_rate
        |FROM m JOIN m z ON m.cohort_start = z.cohort_start
        |  AND z.period_offset = 0""".stripMargin,
    // q93 replay: the layout-independent truth — a plain per-group
    // row_number over the md5 sort key. The Spark side must land on the
    // identical set through its two-pass threshold plan.
    "q93_stratified_k" ->
      """SELECT lang, doc_id, rk FROM (
        |  SELECT lang, doc_id, row_number() OVER (PARTITION BY lang
        |    ORDER BY md5(CAST(doc_id AS VARCHAR) || ':strat'), doc_id) AS rk
        |  FROM documents)
        |WHERE rk <= 20""".stripMargin,
    // q94 replay: generate_series densifies each user's week span; the
    // forward fill is last_value IGNORE NULLS over the same frame as
    // Spark's last(_, ignoreNulls).
    "q94_gapfill" ->
      """WITH weekly AS (
        |  SELECT user_id,
        |    (CAST(floor(epoch(ts)) AS BIGINT) // 604800) AS w,
        |    count(*) AS cnt, round(sum(value), 2) AS value_sum
        |  FROM events GROUP BY 1, 2),
        |spans AS (SELECT user_id, min(w) AS w0, max(w) AS w1
        |  FROM weekly GROUP BY 1),
        |grid AS (SELECT user_id, unnest(generate_series(w0, w1)) AS w
        |  FROM spans)
        |SELECT g.user_id, g.w * 604800 AS win_start,
        |  coalesce(weekly.cnt, 0) AS cnt, weekly.value_sum,
        |  last_value(weekly.value_sum IGNORE NULLS) OVER (
        |    PARTITION BY g.user_id ORDER BY g.w
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_sum
        |FROM grid g LEFT JOIN weekly
        |  ON g.user_id = weekly.user_id AND g.w = weekly.w""".stripMargin,
    // q95 replay: one SELECT per profiled column, unioned — the same
    // statistics the single Spark aggregate computes.
    "q95_profile" -> {
      def num(c: String, expr: String) =
        s"""SELECT '$c' AS col_name, count(*) AS n_rows,
           |  count(*) - count($c) AS n_nulls,
           |  count(DISTINCT $c) AS n_distinct,
           |  CAST($expr(min($c)) AS DOUBLE) AS min_num,
           |  CAST($expr(max($c)) AS DOUBLE) AS max_num
           |FROM events""".stripMargin
      def str(c: String) =
        s"""SELECT '$c' AS col_name, count(*) AS n_rows,
           |  count(*) - count($c) AS n_nulls,
           |  count(DISTINCT $c) AS n_distinct,
           |  CAST(NULL AS DOUBLE) AS min_num, CAST(NULL AS DOUBLE) AS max_num
           |FROM events""".stripMargin
      Seq(num("event_id", ""), num("ts", "epoch_us"), num("user_id", ""),
        str("event_type"), num("value", ""), str("props"))
        .mkString("\nUNION ALL\n")
    },
    // q82 replay: the morton SQL is GENERATED from the same bit loop as
    // the Spark key (ZOrderLayout.mortonSql), so the interleave layout is
    // defined once. `//` (DuckDB) and `div` (Spark) agree on the
    // non-negative operands; % on non-negatives matches pmod.
    "q82_zorder_key" -> {
      val b = "(epoch_us(ts) // 60000000)"
      s"""SELECT event_id, user_id, $b AS t_bucket,
         |  ${graft.sources.ZOrderLayout.mortonSql("user_id % 65536", s"$b % 65536")} AS zkey
         |FROM events""".stripMargin
    },
  )
}
