package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Funnel + cohort-retention operators: hand-built fixtures exercising the
  * ordering edge cases the running-min cascade must get right (step out of
  * order, missing steps, timestamp ties, repeated later steps), plus the
  * cohort matrix arithmetic on epoch-aligned weeks.
  */
class EventAnalyticsSpec extends SparkSpec {

  private def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)

  private def funnelOf(rows: Seq[(Long, Long, Long, String)]) = {
    import spark.implicits._
    val df = rows.toDF("user_id", "event_id", "sec", "event_type")
      .withColumn("ts", timestamp_seconds(col("sec")))
    RelationalOps.funnelStages(df, "user_id", col("ts"), col("event_id"),
        "event_type", Seq("view", "click", "purchase"))
      .collect()
      .map(r => r.getLong(0) ->
        (Option(r.getTimestamp(1)), Option(r.getTimestamp(2)),
          Option(r.getTimestamp(3))))
      .toMap
  }

  test("funnel: in-order conversion captures all three steps") {
    val f = funnelOf(Seq(
      (1L, 1L, 100L, "view"), (1L, 2L, 200L, "click"),
      (1L, 3L, 300L, "purchase")))
    assert(f(1L) === ((Some(ts(100)), Some(ts(200)), Some(ts(300)))))
  }

  test("funnel: a click BEFORE the first view does not convert") {
    val f = funnelOf(Seq(
      (2L, 1L, 100L, "click"), (2L, 2L, 200L, "view"),
      (2L, 3L, 300L, "purchase")))
    // view lands at 200, but the only click precedes it → no click stage,
    // and the purchase cannot chain off a missing click
    assert(f(2L) === ((Some(ts(200)), None, None)))
  }

  test("funnel: a purchase before the qualifying click is skipped; a later one counts") {
    val f = funnelOf(Seq(
      (3L, 1L, 100L, "view"), (3L, 2L, 200L, "purchase"),
      (3L, 3L, 300L, "click"), (3L, 4L, 400L, "purchase")))
    assert(f(3L) === ((Some(ts(100)), Some(ts(300)), Some(ts(400)))))
  }

  test("funnel: equal timestamps do NOT qualify (strict ordering)") {
    val f = funnelOf(Seq(
      (4L, 1L, 100L, "view"), (4L, 2L, 100L, "click"),
      (4L, 3L, 200L, "purchase")))
    assert(f(4L) === ((Some(ts(100)), None, None)))
  }

  test("funnel: users with no step events are absent; view-only user present") {
    val f = funnelOf(Seq(
      (5L, 1L, 100L, "view"),
      (6L, 2L, 100L, "error"), (6L, 3L, 200L, "signup")))
    assert(f(5L) === ((Some(ts(100)), None, None)))
    assert(!f.contains(6L))
  }

  test("funnel: chains off the EARLIEST qualifying step, not the latest") {
    // two views; the click between them qualifies via the first view even
    // though it precedes the second view
    val f = funnelOf(Seq(
      (7L, 1L, 100L, "view"), (7L, 2L, 150L, "click"),
      (7L, 3L, 200L, "view"), (7L, 4L, 250L, "purchase")))
    assert(f(7L) === ((Some(ts(100)), Some(ts(150)), Some(ts(250)))))
  }

  private def windowedFunnelOf(rows: Seq[(Long, Long, Long, String)],
      horizonSec: Long) = {
    import spark.implicits._
    val df = rows.toDF("user_id", "event_id", "sec", "event_type")
      .withColumn("ts", timestamp_seconds(col("sec")))
    RelationalOps.funnelStagesWindowed(df, "user_id", col("ts"),
        col("event_id"), "event_type", Seq("view", "click", "purchase"),
        java.time.Duration.ofSeconds(horizonSec))
      .collect()
      .map(r => r.getLong(0) ->
        (Option(r.getTimestamp(1)), Option(r.getTimestamp(2)),
          Option(r.getTimestamp(3))))
      .toMap
  }

  test("windowed funnel: a click past the horizon does not convert") {
    val f = windowedFunnelOf(Seq(
      (1L, 1L, 100L, "view"), (1L, 2L, 300L, "click"),
      (1L, 3L, 350L, "purchase")), horizonSec = 100L)
    // click is 200 s after the only view (> 100 s horizon) → funnel stops
    assert(f(1L) === ((Some(ts(100)), None, None)))
  }

  test("windowed funnel: a fresh re-view re-opens the expired funnel (unlike q91's earliest-chaining)") {
    val rows = Seq(
      (2L, 1L, 100L, "view"), (2L, 2L, 400L, "view"),
      (2L, 3L, 450L, "click"), (2L, 4L, 500L, "purchase"))
    val f = windowedFunnelOf(rows, horizonSec = 100L)
    // the click is 350 s after the FIRST view but 50 s after the second —
    // it converts off the freshest view; q91's strict cascade (no horizon)
    // would chain off the first view, so the two operators agree here on
    // reachability but differ by construction on the qualifying witness
    assert(f(2L) === ((Some(ts(100)), Some(ts(450)), Some(ts(500)))))
    // shrink the horizon to 25 s: even the second view is too stale
    val g = windowedFunnelOf(rows, horizonSec = 25L)
    assert(g(2L) === ((Some(ts(100)), None, None)))
  }

  test("windowed funnel: each stage's horizon anchors at the freshest QUALIFYING predecessor") {
    val f = windowedFunnelOf(Seq(
      (3L, 1L, 100L, "view"), (3L, 2L, 150L, "click"),
      (3L, 3L, 600L, "click"), // stale: 500 s after the view
      (3L, 4L, 650L, "purchase")), horizonSec = 100L)
    // the second click does NOT qualify (no view within 100 s), so the
    // purchase may only anchor on the first click — 500 s away, too stale
    assert(f(3L) === ((Some(ts(100)), Some(ts(150)), None)))
  }

  test("gapFillPeriods: silent periods appear with zero counts and carried fill") {
    import spark.implicits._
    val p = 100L // 100-second periods
    // user 1 active in periods 5, 7, 8 — period 6 must materialize with
    // cnt 0, NULL value_sum, and the period-5 sum carried forward
    val rows = Seq(
      (1L, 510L, 2.0), (1L, 590L, 3.0), // period 5, sum 5.0
      (1L, 700L, 7.5),                  // period 7
      (1L, 800L, 1.25),                 // period 8
      (2L, 420L, 9.0))                  // single-period user: no gaps
    val df = rows.toDF("user_id", "sec", "value")
      .withColumn("ts", timestamp_seconds(col("sec")))
    val got = RelationalOps.gapFillPeriods(df, "user_id", "ts", "value", p)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Double]),
        Option(r.get(4)).map(_.asInstanceOf[Double]))).toSet
    assert(got === Set(
      (1L, 500L, 2L, Some(5.0), Some(5.0)),
      (1L, 600L, 0L, None, Some(5.0)),
      (1L, 700L, 1L, Some(7.5), Some(7.5)),
      (1L, 800L, 1L, Some(1.25), Some(1.25)),
      (2L, 400L, 1L, Some(9.0), Some(9.0))))
  }

  test("profileColumns: one-pass null/distinct/range summary per column") {
    import spark.implicits._
    val df = Seq(
      (Some(1L), Some(2.5), Some("a")),
      (Some(2L), None, Some("b")),
      (None, Some(4.0), Some("a")),
      (Some(2L), Some(-1.5), None))
      .toDF("id", "v", "s")
    val got = RelationalOps.profileColumns(df, Seq("id", "v", "s"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3),
          Option(r.get(4)).map(_.asInstanceOf[Double]),
          Option(r.get(5)).map(_.asInstanceOf[Double])))).toMap
    assert(got("id") === ((4L, 1L, 2L, Some(1.0), Some(2.0))))
    assert(got("v") === ((4L, 1L, 3L, Some(-1.5), Some(4.0))))
    assert(got("s") === ((4L, 1L, 2L, None, None))) // string: no numeric range
  }

  test("profileColumns: approxDistinct conf swaps HLL in, drops the expand") {
    import spark.implicits._
    // low-cardinality columns: HLL++ at the default 5% rsd is EXACT for
    // tiny distinct counts, so the approx path must return the same rows
    // as exact here while planning no Expand node
    val df = (1 to 200).map(i => (i.toLong % 7, s"s${i % 3}")).toDF("k", "s")
    val exact = RelationalOps.profileColumns(df, Seq("k", "s")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    spark.conf.set("spark.graft.profile.approxDistinct", "true")
    try {
      val ap = RelationalOps.profileColumns(df, Seq("k", "s"))
      val approx = ap.collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      assert(approx === exact)
      assert(exact.map(_._1) === Set("k", "s"))
      assert(exact.find(_._1 == "k").get._4 === 7L)
      // the multi-column exact distinct plans an Expand (#cols-fold input
      // blow-up); the HLL path must not
      val approxPlan = RelationalOps.profileColumns(df, Seq("k", "s"))
        .queryExecution.executedPlan.toString
      spark.conf.unset("spark.graft.profile.approxDistinct")
      val exactPlan = RelationalOps.profileColumns(df, Seq("k", "s"))
        .queryExecution.executedPlan.toString
      assert(!approxPlan.contains("Expand"), "approx path must not Expand")
      assert(exactPlan.contains("Expand"), "exact path expands by design")
    } finally spark.conf.unset("spark.graft.profile.approxDistinct")
  }

  test("durationUsSaturating: exact micros, saturates instead of overflowing") {
    import java.time.Duration
    assert(RelationalOps.durationUsSaturating(Duration.ofMillis(1)) === 1000L)
    // sub-millisecond components survive (the toMillis*1000 trap)
    assert(RelationalOps.durationUsSaturating(Duration.ofNanos(1500)) === 1L)
    // ~292+ years: toNanos would throw ArithmeticException; horizon
    // saturates to "unbounded" instead
    assert(RelationalOps.durationUsSaturating(Duration.ofDays(200000)) ===
      Duration.ofDays(200000).getSeconds * 1000000L)
    assert(RelationalOps.durationUsSaturating(Duration.ofSeconds(Long.MaxValue / 100)) ===
      Long.MaxValue)
  }

  test("cohortRetention: matrix of first-event cohorts by week offset") {
    import spark.implicits._
    val wk = 604800L
    val base = 1704067200L // 2024-01-01 00:00:00 UTC, mid-week (mod wk = 345600)
    val rows = Seq(
      (1L, base), (1L, base + 3600L), (1L, base + 2 * wk), // w0: offsets 0,0,2
      (2L, base), (2L, base + wk),                         // w0: offsets 0,1
      (3L, base + wk), (3L, base + wk + 5L))               // w1: offsets 0,0
    val df = rows.toDF("user_id", "sec")
      .withColumn("ts", timestamp_seconds(col("sec")))
    val got = RelationalOps.cohortRetention(df, "user_id", "ts", wk)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val w0 = Math.floorDiv(base, wk) * wk
    assert(got === Set(
      (w0, 0L, 2L), (w0, 1L, 1L), (w0, 2L, 1L), (w0 + wk, 0L, 1L)))
  }
}
