package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import scala.util.Random

/** Randomized (seeded) equivalence of the event-analytics operators
  * against independent naive references: the funnel's running-min cascade
  * vs a direct nested-filter definition, and the cohort matrix vs a plain
  * Scala groupBy — on event sets dense with ties, duplicate types, and
  * interleaved users.
  */
class EventAnalyticsPropertySpec extends SparkSpec {

  private val rnd = new Random(1337)
  private val types = Vector("view", "click", "purchase", "error", "signup")

  private def genEvents(n: Int): Seq[(Long, Long, Long, String)] =
    (1 to n).map { i =>
      // small ts range on purpose: collisions across AND within users
      (1L + rnd.nextInt(5), i.toLong, 100L + rnd.nextInt(40),
        types(rnd.nextInt(types.size)))
    }

  /** Direct definition, no cascade: earliest view; earliest click strictly
    * after THAT view; earliest purchase strictly after THAT click.
    */
  private def naiveFunnel(events: Seq[(Long, Long, Long, String)])
      : Map[Long, (Option[Long], Option[Long], Option[Long])] =
    events.groupBy(_._1).map { case (u, es) =>
      val v = es.filter(_._4 == "view").map(_._3).minOption
      val c = v.flatMap(vt =>
        es.filter(e => e._4 == "click" && e._3 > vt).map(_._3).minOption)
      val p = c.flatMap(ct =>
        es.filter(e => e._4 == "purchase" && e._3 > ct).map(_._3).minOption)
      u -> (v, c, p)
    }

  test("funnelStages equals the direct definition on 10 random event sets") {
    import spark.implicits._
    for (round <- 1 to 10) {
      val events = genEvents(120)
      val df = events.toDF("user_id", "event_id", "sec", "event_type")
        .withColumn("ts", timestamp_seconds(col("sec")))
      val got = RelationalOps.funnelStages(df, "user_id", col("ts"),
          col("event_id"), "event_type", Seq("view", "click", "purchase"))
        .collect().map(r => r.getLong(0) ->
          (Option(r.getTimestamp(1)).map(_.getTime / 1000L),
            Option(r.getTimestamp(2)).map(_.getTime / 1000L),
            Option(r.getTimestamp(3)).map(_.getTime / 1000L)))
        .toMap
      val want = naiveFunnel(events)
        .filter { case (u, _) => events.exists(e =>
          e._1 == u && Set("view", "click", "purchase")(e._4)) }
      assert(got === want, s"round $round")
    }
  }

  test("cohortRetention equals a plain Scala groupBy on 10 random event sets") {
    import spark.implicits._
    val wk = 7L // tiny period so offsets vary
    for (round <- 1 to 10) {
      val events = genEvents(120)
      val df = events.toDF("user_id", "event_id", "sec", "event_type")
        .withColumn("ts", timestamp_seconds(col("sec")))
      val got = RelationalOps.cohortRetention(df, "user_id", "ts", wk)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val firstBy = events.groupBy(_._1).view.mapValues(_.map(_._3).min).toMap
      val want = events
        .map { e =>
          val fp = Math.floorDiv(firstBy(e._1), wk)
          (fp * wk, Math.floorDiv(e._3, wk) - fp, e._1)
        }
        .distinct
        .groupBy(t => (t._1, t._2))
        .map { case ((c, o), us) => (c, o, us.size.toLong) }
        .toSet
      assert(got === want, s"round $round")
    }
  }
}
