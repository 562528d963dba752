package graft.etl

import graft.SparkSpec
import java.nio.file.Files
import javax.imageio.ImageIO

/** S4 — the PNG chart sink ([[Charts]]): the chart DATA frames are checked
  * against direct SQL on the aggregate, and the rendered PNGs are checked
  * structurally (right size, white surface, every series' color present in
  * quantity, dark ink for text) plus determinism. Visual layout was also
  * eyeballed once at build time (the validator-over-pixels here can't see
  * label collisions).
  */
class ChartsSpec extends SparkSpec {

  private val csv = "/root/reference/trades (1) (2) (1).csv"
  private lazy val agg =
    Transform(TradesEtl.clean(TradesEtl.extract(spark, csv)), computePnl = true)

  private def colorCount(img: java.awt.image.BufferedImage, hexColor: String): Int = {
    val c = java.awt.Color.decode(hexColor)
    // antialiasing + the relief outline blend edges, so count pixels CLOSE
    // to the target, not exactly equal
    def near(a: Int, b: Int) = math.abs(a - b) <= 24
    var n = 0
    (0 until img.getWidth by 2).foreach { x =>
      (0 until img.getHeight by 2).foreach { y =>
        val rgb = new java.awt.Color(img.getRGB(x, y))
        if (near(rgb.getRed, c.getRed) && near(rgb.getGreen, c.getGreen) &&
          near(rgb.getBlue, c.getBlue)) n += 1
      }
    }
    n
  }

  test("chart data frames equal direct SQL on the aggregate") {
    agg.createOrReplaceTempView("agg_chart")
    val volWant = spark.sql(
      """SELECT week_start_date, sum(total_volume) AS total_volume
        |FROM agg_chart GROUP BY 1 ORDER BY 1""".stripMargin).collect()
    assert(Charts.weeklyVolumeFrame(agg).collect() === volWant)
    val cntWant = spark.sql(
      """SELECT week_start_date, client_type, sum(trade_count) AS trade_count
        |FROM agg_chart GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin).collect()
    assert(Charts.weeklyCountByTypeFrame(agg).collect() === cntWant)
  }

  test("writeAll renders the reference's two chart files") {
    val dir = Files.createTempDirectory("graft-charts").toString
    val paths = Charts.writeAll(agg, dir)
    assert(paths.map(new java.io.File(_).getName) ===
      Seq("Weekly_Trade_Volume.png", "Weekly_Trade_Count_by_Client_Type.png"))

    val line = ImageIO.read(new java.io.File(paths.head))
    assert(line.getWidth === 1500 && line.getHeight === 750)
    // white surface dominates; the series line (matplotlib C0 blue) is there
    assert(colorCount(line, "#ffffff") > 100000)
    assert(colorCount(line, "#1f77b4") > 100)
    assert(colorCount(line, "#222222") > 50) // title/axis ink

    val bars = ImageIO.read(new java.io.File(paths(1)))
    // every client type's reference color appears in quantity (stacked
    // segments are areas, not strokes)
    Charts.referenceColors.values.foreach { hexColor =>
      assert(colorCount(bars, hexColor) > 300, hexColor)
    }
  }

  test("null week/type rows render as a fallback-color series, not an NPE") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("week_start_date", StringType),
      StructField("client_type", StringType),
      StructField("total_volume", DoubleType),
      StructField("trade_count", LongType)))
    val dirty = spark.createDataFrame(
      java.util.List.of(
        Row("2023-01-02", "bronze", 10.0, 3L),
        Row("2023-01-02", null, 5.0, 2L), // un-cleaned aggregate row
        Row(null, "gold", 2.0, 1L)),
      schema)
    val dir = Files.createTempDirectory("graft-charts-null").toString
    // the reference's color_map.get(c, "#333333") behavior: render, don't crash
    val paths = Charts.writeAll(dirty, dir)
    paths.foreach(p => assert(ImageIO.read(new java.io.File(p)).getWidth === 1500))
  }

  test("rendering is deterministic (same bytes twice)") {
    val dir = Files.createTempDirectory("graft-charts-det").toString
    Charts.writeWeeklyTradeVolume(agg, s"$dir/a.png")
    Charts.writeWeeklyTradeVolume(agg, s"$dir/b.png")
    val a = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(s"$dir/a.png"))
    val b = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(s"$dir/b.png"))
    assert(java.util.Arrays.equals(a, b))
  }

  test("pipeline charts=true writes both PNGs next to the report") {
    val out = Files.createTempDirectory("graft-charts-pipe").toString
    Pipeline.runEtl(spark, csv, out, charts = true)
    assert(new java.io.File(s"$out/Weekly_Trade_Volume.png").isFile)
    assert(new java.io.File(s"$out/Weekly_Trade_Count_by_Client_Type.png").isFile)
  }

  test("niceMax snaps to the 1/2/5 decade pattern") {
    assert(Charts.niceMax(7.3) === 10.0)
    assert(Charts.niceMax(14.0) === 20.0)
    assert(Charts.niceMax(42.0) === 50.0)
    assert(Charts.niceMax(50.0) === 50.0)
    assert(Charts.niceMax(0.0) === 1.0)
  }

  test("the chart-scale cap refuses unbounded point sets loudly") {
    import org.apache.spark.sql.functions._
    val wide = spark.range(Charts.maxPoints + 1L)
      .select(col("id").as("week_start_date"),
        lit(1.0).as("total_volume"))
    val e = intercept[IllegalArgumentException] {
      Charts.writeWeeklyTradeVolume(wide,
        Files.createTempDirectory("graft-charts-cap").toString + "/x.png")
    }
    assert(e.getMessage.contains("chart-scale"), e.getMessage)
  }

  test("dirty aggregates render: NaN/negative values, label collisions, wild legends") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val dir = Files.createTempDirectory("graft-charts-dirty").toString
    // NaN and negative volume: sanitize to 0 instead of crashing niceMax
    // (None.get) or drawing through the axis labels
    val volSchema = StructType(Seq(
      StructField("week_start_date", StringType),
      StructField("total_volume", DoubleType)))
    val vol = spark.createDataFrame(java.util.List.of(
      Row("2023-01-02", Double.NaN), Row("2023-01-09", -50.0),
      Row("2023-01-16", 100.0)), volSchema)
    Charts.writeWeeklyTradeVolume(vol, s"$dir/v.png")
    assert(new java.io.File(s"$dir/v.png").length() > 0)
    // a null client_type NEXT TO the literal string "null" in one week:
    // both stringify to one label and must SUM, not last-one-wins; a
    // LongType-typed count column must not ClassCastException; 40 long
    // type names must not push the legend off-canvas
    val cntSchema = StructType(Seq(
      StructField("week_start_date", StringType),
      StructField("client_type", StringType),
      StructField("trade_count", LongType)))
    val wild = (0 until 40).map(i =>
      Row("2023-01-02", s"very_long_client_type_name_number_$i" * 3, 1L))
    import scala.jdk.CollectionConverters._
    val cnt = spark.createDataFrame(
      (Seq(Row("2023-01-02", null, 5L), Row("2023-01-02", "null", 7L),
        Row("2023-01-02", "gold", -3L)) ++ wild).asJava, cntSchema)
    Charts.writeWeeklyTradeCountByClientType(cnt, s"$dir/c.png")
    assert(new java.io.File(s"$dir/c.png").length() > 0)
    // the collision summed: 5 + 7 = 12 under one "null" label — assert via
    // the chart's own data frame + the count map semantics (groupMapReduce)
    val frame = Charts.weeklyCountByTypeFrame(cnt)
    assert(frame.filter(org.apache.spark.sql.functions.col("client_type")
      .isNull).count() === 1)
  }

  test("capped legend reserves a row for the '+N more' summary") {
    // boxH = rowH*(drawnRows + title) + 10 from y = top+10 must stay
    // inside plotH; drawnRows = maxRows + 1 (summary) when capped.
    // Regression: the old cap spent every row on entries, so the summary
    // row overflowed the plot bottom by one row.
    val rowH = 28
    for (plotH <- Seq(100, 200, 560); n <- Seq(1, 3, 17, 40)) {
      val maxRows = Charts.legendMaxRows(n, plotH, rowH)
      val drawnRows = if (n > maxRows) maxRows + 1 else n
      val boxH = rowH * (drawnRows + 1) + 10
      assert(maxRows >= 1)
      if (plotH >= 20 + rowH * 3) // title + entry + summary representable
        assert(boxH + 10 <= plotH,
          s"legend box $boxH + top-inset 10 overflows plotH=$plotH at n=$n")
    }
    // uncapped report-shaped legends are untouched: all entries drawn
    assert(Charts.legendMaxRows(3, 560) >= 3)
  }
}
