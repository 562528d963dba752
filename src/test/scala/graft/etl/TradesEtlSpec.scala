package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Golden-parity tests against the reference's checked-in outputs
  * (`/root/reference/agg_result.db` 545 rows, `output/top_clients.xlsx`
  * 6 rows) — values below were extracted from those artifacts.
  */
class TradesEtlSpec extends SparkSpec {

  private val csv = "/root/reference/trades (1) (2) (1).csv"

  private lazy val raw   = TradesEtl.extract(spark, csv)
  private lazy val clean = TradesEtl.clean(raw).cache()
  private lazy val agg   = Transform(clean, computePnl = true).cache()

  test("S1+C1-C3: 800 raw rows -> 790 clean rows") {
    assert(raw.count() === 800)
    assert(clean.count() === 790)
    assert(clean.schema === TradesEtl.cleanSchema)
  }

  test("C4/C5 quality probes match the reference's printed diagnostics") {
    val st = TradesEtl.qualityStats(raw)
    assert(st.inputRows === 800)
    assert(st.anyNullRawRows === 10)
    assert(st.badTimestampRows === 5) // 5x literal not_a_date; 5x empty are null pre-parse
    assert(st.cleanRows === 790)
    assert(st.domains("client_type") === Seq("bronze", "gold", "silver"))
    assert(st.domains("symbol") === Seq("AAPL", "GOOGL", "MSFT", "QQQ", "SPY"))
    assert(st.domains("side") === Seq("buy", "sell"))
  }

  test("A1+P1-P4: weekly PnL agg matches golden row count and totals") {
    assert(agg.count() === 545)
    val Row(vol: Double, cnt: Long) =
      agg.agg(sum("total_volume"), sum("trade_count")).head
    assert(math.abs(vol - 3363110.5302000022) < 1e-6)
    assert(cnt === 790L)
  }

  test("A3: global mark price per symbol matches golden values") {
    val marks = Transform.markPrice(clean).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(marks === Map(
      "AAPL" -> 166.79, "GOOGL" -> 2577.83, "MSFT" -> 313.48,
      "QQQ" -> 377.55, "SPY" -> 440.25))
  }

  test("golden spot-check: buy-only group (2022-12-26, bronze, 3002, GOOGL)") {
    val r = agg.filter(
      col("week_start_date") === "2022-12-26" && col("user_id") === 3002 &&
        col("symbol") === "GOOGL").head
    assert(r.getAs[Double]("buy_qty") === 8.12)
    assert(r.getAs[Double]("sell_qty") === 0.0)
    assert(math.abs(r.getAs[Double]("buy_value") - 21216.2608) < 1e-9)
    assert(r.getAs[Double]("avg_buy_price") === 2612.84)
    assert(r.getAs[Double]("realized_pnl") === 0.0)
    assert(math.abs(r.getAs[Double]("total_pnl") - -284.2812000000017) < 1e-9)
  }

  test("golden spot-check: sell-only group keeps 0.0 qty but NULL PnL") {
    val r = agg.filter(
      col("week_start_date") === "2022-12-26" && col("user_id") === 1001 &&
        col("symbol") === "MSFT").head
    assert(r.getAs[Double]("buy_qty") === 0.0)
    assert(r.getAs[Double]("sell_qty") === 6.46)
    assert(r.isNullAt(r.fieldIndex("avg_buy_price")))
    assert(r.isNullAt(r.fieldIndex("realized_pnl")))
    assert(r.isNullAt(r.fieldIndex("unrealized_pnl")))
    assert(r.isNullAt(r.fieldIndex("total_pnl")))
    assert(r.getAs[Double]("net_qty") === -6.46)
    assert(r.getAs[Double]("mark_price") === 313.48)
  }

  test("P1: week truncation is Monday-based across the year boundary") {
    import spark.implicits._
    val df = Seq("2023-01-01 10:00:00").toDF("s")
      .select(to_timestamp(col("s")).as("timestamp"))
    val wk = Transform.withDerived(df.withColumn("quantity", lit(1.0))
        .withColumn("price", lit(1.0)))
      .select(col("week_start_date").cast("string")).head.getString(0)
    assert(wk === "2022-12-26") // Sunday 2023-01-01 belongs to Monday 2022-12-26's week
  }

  test("T1/T2/U1: top-clients report matches golden xlsx") {
    val rep = Report.topClients(agg).collect()
    assert(rep.length === 6)
    val byVolume = rep.filter(_.getAs[String]("top_label") == "total_volume")
      .sortBy(_.getAs[Double]("rank"))
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Double]("rank")))
    assert(byVolume.toSeq === Seq((3002L, 1.0), (3001L, 2.0), (3003L, 3.0)))
    val byPnl = rep.filter(_.getAs[String]("top_label") == "total_pnl")
      .sortBy(_.getAs[Double]("rank"))
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Double]("rank")))
    assert(byPnl.toSeq === Seq((3003L, 1.0), (3002L, 2.0), (3001L, 3.0)))
    assert(rep.forall(_.getAs[String]("client_type") == "bronze"))
  }

  test("full golden parity: every value of all 545 agg rows matches the reference") {
    // Fixture exported from /root/reference/agg_result.db (sqlite) — the
    // reference's own checked-in output. Float sums differ from pandas only
    // in summation ORDER (partition-parallel vs file-order), i.e. by last
    // ulps (measured ≤ 7e-12); keys, counts and null shape must be exact.
    val golden = spark.read
      .parquet(getClass.getResource("/golden_agg_trades_weekly.parquet").toString)
    assert(golden.count() === 545)
    val keys = Seq("week_start_date", "client_type", "user_id", "symbol")
    val ours = agg.withColumn("week_start_date", col("week_start_date").cast("string"))
    val joined = ours.alias("o").join(golden.alias("g"), keys)
    assert(joined.count() === 545) // every key group exists on both sides

    assert(joined.filter(col("o.trade_count") =!= col("g.trade_count")).count() === 0)
    val numeric = Seq("buy_qty", "sell_qty", "buy_value", "sell_value",
      "total_volume", "avg_buy_price", "net_qty", "realized_pnl",
      "mark_price", "unrealized_pnl", "total_pnl")
    numeric.foreach { c =>
      val o = col(s"o.$c")
      val g = col(s"g.$c")
      // exact same null shape (the NULL-PnL semantics), values within 1e-9
      assert(joined.filter(o.isNull =!= g.isNull).count() === 0, s"null shape: $c")
      assert(joined.filter(abs(o - g) > 1e-9).count() === 0, s"value drift: $c")
    }
  }

  test("A2: non-PnL path has the 6-column schema") {
    val a2 = Transform(clean, computePnl = false)
    assert(a2.columns.toSeq ===
      Seq("week_start_date", "client_type", "user_id", "symbol", "total_volume", "trade_count"))
    assert(a2.count() === 545)
  }

  test("A7: pivot fills missing cells with 0") {
    val p = Report.weeklyTradesPivot(agg)
    assert(p.columns.toSeq === Seq("week_start_date", "bronze", "silver", "gold"))
    val cnt = p.select(sum(col("bronze") + col("silver") + col("gold"))).head.getLong(0)
    assert(cnt === 790L)
  }
}
