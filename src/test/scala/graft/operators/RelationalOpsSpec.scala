package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class RelationalOpsSpec extends SparkSpec {
  import java.time.Duration

  private def ts(s: String) = Timestamp.valueOf(s)

  test("latestPerKey returns the whole latest row, ties broken by tieBreaker") {
    import spark.implicits._
    val df = Seq(
      ("a", ts("2023-01-01 10:00:00"), 1L, 1.0),
      ("a", ts("2023-01-01 11:00:00"), 2L, 2.0),
      ("a", ts("2023-01-01 11:00:00"), 3L, 3.0), // tie on ts → id 3 wins
      ("b", ts("2023-01-01 09:00:00"), 4L, 4.0),
    ).toDF("k", "ts", "id", "v")
    val out = RelationalOps.latestPerKey(df, Seq("k"), col("ts"), col("id"))
      .select("k", "id").as[(String, Long)].collect().toMap
    assert(out === Map("a" -> 3L, "b" -> 4L))
  }

  test("topKPerGroup keeps exactly k rows per group in order") {
    import spark.implicits._
    val df = (1 to 10).flatMap(i => Seq(("g1", i), ("g2", 100 - i))).toDF("g", "v")
    val out = RelationalOps.topKPerGroup(df, Seq("g"), Seq(col("v").desc), 3)
      .select("g", "v").as[(String, Int)].collect().groupBy(_._1)
    assert(out("g1").map(_._2).sorted.toSeq === Seq(8, 9, 10))
    assert(out("g2").map(_._2).sorted.toSeq === Seq(97, 98, 99))
  }

  test("sessionize splits on gaps strictly greater than the threshold") {
    import spark.implicits._
    val df = Seq(
      (1L, ts("2023-01-01 10:00:00"), 1L),
      (1L, ts("2023-01-01 10:29:00"), 2L), // same session (29 min)
      (1L, ts("2023-01-01 10:59:00"), 3L), // same session (30 min exactly → not > gap)
      (1L, ts("2023-01-01 11:29:01"), 4L), // new session  (30 min 1 s)
      (2L, ts("2023-01-01 00:00:00"), 5L),
    ).toDF("user_id", "ts", "event_id")
    val out = RelationalOps
      .sessionize(df, "user_id", col("ts"), col("event_id"), Duration.ofMinutes(30))
      .select("event_id", "session_id").as[(Long, Long)].collect().toMap
    assert(out === Map(1L -> 0L, 2L -> 0L, 3L -> 0L, 4L -> 1L, 5L -> 0L))
  }

  test("lastEventBefore finds the most recent strictly-earlier source event") {
    import spark.implicits._
    val df = Seq(
      (1L, ts("2023-01-01 10:00:00"), 1L, "click"),
      (1L, ts("2023-01-01 10:05:00"), 2L, "view"),     // ignored type
      (1L, ts("2023-01-01 10:10:00"), 3L, "purchase"), // ← click@10:00
      (1L, ts("2023-01-01 10:20:00"), 4L, "click"),
      (1L, ts("2023-01-01 10:30:00"), 5L, "purchase"), // ← click@10:20
      (2L, ts("2023-01-01 10:00:00"), 6L, "purchase"), // ← null (no click)
    ).toDF("user_id", "ts", "event_id", "event_type")
    val out = RelationalOps.lastEventBefore(
        df, "user_id", "ts", "event_type",
        ofType = "purchase", fromType = "click", outCol = "last_click")
      .select(col("event_id"), col("last_click").cast("string"))
      .as[(Long, Option[String])].collect().toMap
    assert(out === Map(
      3L -> Some("2023-01-01 10:00:00"),
      5L -> Some("2023-01-01 10:20:00"),
      6L -> None))
  }

  test("lastEventBefore excludes a source event sharing the row's timestamp") {
    import spark.implicits._
    // strictly-earlier is by VALUE: the same-ts click must not count,
    // regardless of which event_id orders first — and the earlier click
    // (not NULL) must be returned when one exists
    val df = Seq(
      (1L, ts("2023-01-01 09:00:00"), 1L, "click"),
      (1L, ts("2023-01-01 10:00:00"), 2L, "click"),    // tie with purchase
      (1L, ts("2023-01-01 10:00:00"), 3L, "purchase"), // ← click@09:00
      (2L, ts("2023-01-01 10:00:00"), 5L, "purchase"), // tie, no earlier
      (2L, ts("2023-01-01 10:00:00"), 4L, "click"),    //   → NULL
    ).toDF("user_id", "ts", "event_id", "event_type")
    val out = RelationalOps.lastEventBefore(
        df, "user_id", "ts", "event_type",
        ofType = "purchase", fromType = "click", outCol = "last_click")
      .select(col("event_id"), col("last_click").cast("string"))
      .as[(Long, Option[String])].collect().toMap
    assert(out === Map(
      3L -> Some("2023-01-01 09:00:00"),
      5L -> None))
  }

  test("sessionize honors sub-millisecond gap components") {
    import spark.implicits._
    // gap = 1.5 ms; events 1.2 ms apart are the SAME session. The old
    // toMillis*1000 conversion truncated the gap to 1 ms and split them.
    val base = ts("2023-01-01 10:00:00")
    def plusUs(us: Long) = Timestamp.from(base.toInstant.plusNanos(us * 1000))
    val df = Seq(
      (1L, base, 1L),
      (1L, plusUs(1200), 2L),  // 1.2 ms later — within the 1.5 ms gap
      (1L, plusUs(3000), 3L),  // 1.8 ms after #2 — new session
    ).toDF("user_id", "ts", "event_id")
    val out = RelationalOps
      .sessionize(df, "user_id", col("ts"), col("event_id"),
        Duration.ofNanos(1500000)) // 1.5 ms
      .select("event_id", "session_id").as[(Long, Long)].collect().toMap
    assert(out === Map(1L -> 0L, 2L -> 0L, 3L -> 1L))
  }

  test("profileColumns rejects empty and duplicate column lists clearly") {
    import spark.implicits._
    val df = Seq((1L, "a")).toDF("k", "v")
    // the raw failures are an opaque star-expand error and an ambiguous
    // __nulls_<c> reference — a generic profiling entry point gets called
    // with df.columns of arbitrary tables, so fail fast and readable
    assert(intercept[IllegalArgumentException] {
      RelationalOps.profileColumns(df, Seq())
    }.getMessage.contains("non-empty"))
    assert(intercept[IllegalArgumentException] {
      RelationalOps.profileColumns(df, Seq("k", "k"))
    }.getMessage.contains("duplicate"))
  }

  test("materialize: checkpoints by default, identity under the plan-audit skip conf") {
    import spark.implicits._
    val df = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
      .groupBy("k").count()
    // default: materialized — lineage truncated to an RDD scan (the
    // shared-subtree reuse behavior every call site relies on)
    val mat = RelationalOps.materialize(df)
    assert(mat.queryExecution.analyzed.collectLeaves()
      .forall(_.getClass.getSimpleName.contains("LogicalRDD")))
    assert(mat.collect().toSet === df.collect().toSet)
    // skip conf: the SAME plan comes back untouched — full lineage stays
    // visible to hazard sweeps and no job runs during explain-only passes
    spark.conf.set("spark.graft.materialize.skip", "true")
    try {
      val skipped = RelationalOps.materialize(df)
      assert(skipped.queryExecution.analyzed eq df.queryExecution.analyzed)
    } finally spark.conf.unset("spark.graft.materialize.skip")
  }
}
