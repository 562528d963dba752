package graft.etl

import java.awt.{BasicStroke, Color, Font, Graphics2D, RenderingHints}
import java.awt.image.BufferedImage
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** S4 — the reference's two PNG report charts (`etl_weekly_trades.py:
  * 224-225`, `plot_weekly_aggregates` :229-268) rendered with the JDK's
  * headless Graphics2D (no matplotlib, no chart jar):
  *
  *   - `Weekly_Trade_Volume.png` — line chart of per-week total volume.
  *   - `Weekly_Trade_Count_by_Client_Type.png` — stacked bars of per-week
  *     trade counts by client type, the reference's own color map
  *     (bronze #CD7F32, silver #C0C0C0, gold #FFD700) with stacking in
  *     pandas-`unstack` column order (alphabetical).
  *
  * The chart DATA is a per-week Spark aggregate (weeks are bounded by the
  * time span, not the corpus — the same frames as the oracled q02/A6/A7
  * family); only that small aggregate is collected, capped loudly at
  * `maxPoints` like [[Xlsx]]'s report cap.
  *
  * Accessibility notes (the reference palette, validated, is weak: silver
  * reads gray and silver/gold sit outside the light-surface lightness
  * band): segments carry a dark outline and a surface-colored gap so
  * boundaries don't rely on hue, stacking order is FIXED so position is a
  * secondary identity encoding, the legend names every series, and — like
  * the reference's `color_map` parameter — callers can pass their own
  * palette.
  */
object Charts {

  /** The reference's client-type palette (`etl_weekly_trades.py:237`). */
  val referenceColors: Map[String, String] =
    Map("bronze" -> "#CD7F32", "silver" -> "#C0C0C0", "gold" -> "#FFD700")
  private val fallbackColor = "#333333" // reference's .get(c, "#333333")
  private val lineColor = "#1f77b4"     // matplotlib default first-series blue

  /** Chart-scale cap on collected points (weeks × types). */
  val maxPoints = 10000

  // figsize=(10,5) at dpi=150, the reference's savefig parameters
  private val W = 1500; private val H = 750
  private val left = 150; private val right = 40; private val top = 60
  private val bottom = 130

  /** Per-week total volume — the ax1 frame: [[Report.weeklyVolume]], the
    * oracled A6 aggregate (one definition — chart and report can't drift).
    */
  def weeklyVolumeFrame(agg: DataFrame): DataFrame = Report.weeklyVolume(agg)

  /** Per-(week, client_type) trade counts — the ax2 frame (A7 family). */
  def weeklyCountByTypeFrame(agg: DataFrame): DataFrame =
    agg.groupBy("week_start_date", "client_type")
      .agg(sum("trade_count").as("trade_count"))
      .orderBy("week_start_date", "client_type")

  def writeWeeklyTradeVolume(agg: DataFrame, path: String): Unit = {
    // take(cap+1), not collect(): the driver never materializes more than
    // cap+1 rows even when handed an un-aggregated corpus by mistake
    val rows = weeklyVolumeFrame(agg).take(maxPoints + 1)
    require(rows.length <= maxPoints,
      s"chart-scale sink: > $maxPoints weekly points")
    val labels = rows.map(r => lbl(r.get(0)))
    val values = rows.map(r => sanitize(if (r.isNullAt(1)) 0.0
      else r.getAs[Number](1).doubleValue()))
    renderPng(path) { g =>
      frame(g, "Weekly Trade Volume", "week_start_date", "total_volume")
      val yMax = niceMax(values.maxOption.getOrElse(0.0))
      yAxis(g, yMax); xAxis(g, labels)
      val n = values.length
      g.setColor(hex(lineColor))
      g.setStroke(new BasicStroke(3f, BasicStroke.CAP_ROUND, BasicStroke.JOIN_ROUND))
      val pts = values.zipWithIndex.map { case (v, i) => (xAt(i, n), yAt(v, yMax)) }
      pts.sliding(2).foreach {
        case Array((x1, y1), (x2, y2)) => g.drawLine(x1, y1, x2, y2)
        case _ => ()
      }
      pts.foreach { case (x, y) => g.fillOval(x - 4, y - 4, 8, 8) }
      legend(g, Seq("total_volume" -> hex(lineColor)), "Trade_volume")
    }
  }

  def writeWeeklyTradeCountByClientType(
      agg: DataFrame, path: String,
      colorMap: Map[String, String] = referenceColors): Unit = {
    val rows = weeklyCountByTypeFrame(agg).take(maxPoints + 1)
    require(rows.length <= maxPoints,
      s"chart-scale sink: > $maxPoints (week, type) points")
    val weeks = rows.map(r => lbl(r.get(0))).distinct.sorted
    val types = rows.map(r => lbl(r.get(1))).distinct.sorted // pandas unstack order
    // SUM per stringified key, never toMap: two distinct raw values can
    // stringify to one label (a null client_type next to the literal
    // string "null"), and last-one-wins would silently undercount the
    // stack and its yMax
    val count = rows.map(r =>
        (lbl(r.get(0)), lbl(r.get(1))) ->
          (if (r.isNullAt(2)) 0L else r.getAs[Number](2).longValue()))
      .groupMapReduce(_._1)(_._2)(_ + _)
    renderPng(path) { g =>
      frame(g, "Weekly Trade Count by Client Type", "week_start_date", "trade_count")
      // stack heights count POSITIVE segments only, matching the v > 0
      // draw guard below — a negative dirty count must not shrink yMax
      // under the real stack height and push bars into the title area
      val totals = weeks.map(w =>
        types.map(t => math.max(0L, count.getOrElse((w, t), 0L))).sum.toDouble)
      val yMax = niceMax(totals.maxOption.getOrElse(0.0))
      yAxis(g, yMax); xAxis(g, weeks)
      val n = weeks.length
      val barW = math.max(2, (plotW.toDouble / n * 0.8).toInt)
      weeks.zipWithIndex.foreach { case (w, i) =>
        var acc = 0.0
        val xc = xAt(i, n)
        types.foreach { t =>
          val v = count.getOrElse((w, t), 0L).toDouble
          if (v > 0) {
            val y0 = yAt(acc, yMax); val y1 = yAt(acc + v, yMax)
            g.setColor(hex(colorMap.getOrElse(t, fallbackColor)))
            // 1px surface gap above each segment (the -1) keeps boundaries
            // visible without relying on hue
            g.fillRect(xc - barW / 2, y1, barW, math.max(1, y0 - y1 - 1))
            g.setColor(new Color(0, 0, 0, 90)) // dark relief outline
            g.drawRect(xc - barW / 2, y1, barW, math.max(1, y0 - y1 - 1))
            acc += v
          }
        }
      }
      legend(g, types.toSeq.map(t => t -> hex(colorMap.getOrElse(t, fallbackColor))),
        "client_type")
    }
  }

  /** Both reference charts, reference filenames, into `dir`. `colorMap`
    * reaches the stacked-bar chart (the reference's `color_map` parameter
    * at its own top-level entry point) — without it here, the documented
    * caller-supplied palette was unreachable from the pipeline.
    */
  def writeAll(agg: DataFrame, dir: String,
      colorMap: Map[String, String] = referenceColors): Seq[String] = {
    val a = s"$dir/Weekly_Trade_Volume.png"
    val b = s"$dir/Weekly_Trade_Count_by_Client_Type.png"
    writeWeeklyTradeVolume(agg, a)
    writeWeeklyTradeCountByClientType(agg, b, colorMap)
    Seq(a, b)
  }

  // ---- tiny chart kit (shared by both charts) ----

  /** Null-safe label: a null week/type from an un-cleaned aggregate
    * renders as a labeled series in the fallback color (the reference's
    * `color_map.get(c, "#333333")` behavior), never an NPE. ONE copy for
    * both charts so their null renderings can't drift.
    */
  private def lbl(v: Any): String = if (v == null) "null" else v.toString

  /** Dirty numeric values coerce like nulls do: NaN and negatives render
    * as 0 (a NaN would crash niceMax's find().get and a negative would
    * draw through the x-axis labels — this sink's contract is to render
    * un-cleaned aggregates, not to crash on them).
    */
  private def sanitize(v: Double): Double =
    if (v.isNaN || v.isInfinite || v < 0) 0.0 else v

  private def plotW = W - left - right
  private def plotH = H - top - bottom
  private def xAt(i: Int, n: Int): Int =
    left + ((i + 0.5) * plotW / math.max(1, n)).toInt
  private def yAt(v: Double, yMax: Double): Int =
    top + plotH - (v / yMax * plotH).toInt

  private def hex(s: String) = Color.decode(s)
  private val ink = new Color(0x22, 0x22, 0x22)
  private val mutedInk = new Color(0x66, 0x66, 0x66)
  private val grid = new Color(0xe6, 0xe6, 0xe6)
  private val base = new Font("SansSerif", Font.PLAIN, 20)
  private val titleFont = new Font("SansSerif", Font.BOLD, 28)

  /** Top tick ≥ max on a 1/2/5 decade pattern. NaN (one dirty value in an
    * otherwise-sanitized array, or a caller bypassing sanitize) falls to
    * the 1.0 floor instead of crashing find().get with None.get.
    */
  private[etl] def niceMax(max: Double): Double = {
    if (max.isNaN || max <= 0) return 1.0
    val mag = math.pow(10, math.floor(math.log10(max)))
    Seq(1, 2, 5, 10).map(_ * mag).find(_ >= max).get
  }

  private def renderPng(path: String)(draw: Graphics2D => Unit): Unit = {
    val img = new BufferedImage(W, H, BufferedImage.TYPE_INT_RGB)
    val g = img.createGraphics()
    try {
      g.setRenderingHint(RenderingHints.KEY_ANTIALIASING,
        RenderingHints.VALUE_ANTIALIAS_ON)
      g.setRenderingHint(RenderingHints.KEY_TEXT_ANTIALIASING,
        RenderingHints.VALUE_TEXT_ANTIALIAS_ON)
      g.setColor(Color.WHITE); g.fillRect(0, 0, W, H)
      draw(g)
    } finally g.dispose()
    AtomicFiles.write(path)(tmp => javax.imageio.ImageIO.write(img, "png", tmp))
  }

  private def frame(g: Graphics2D, title: String, xl: String, yl: String): Unit = {
    g.setFont(titleFont); g.setColor(ink)
    g.drawString(title, left, 40)
    g.setFont(base)
    g.setColor(mutedInk)
    g.drawString(xl, left + plotW / 2 - g.getFontMetrics.stringWidth(xl) / 2, H - 15)
    val tr = g.getTransform
    g.rotate(-math.Pi / 2); // y label reads bottom-up along the left edge,
    // baseline well clear of the widest tick label (left margin sizes this)
    g.drawString(yl, -(top + plotH / 2 + g.getFontMetrics.stringWidth(yl) / 2), 35)
    g.setTransform(tr)
    g.setColor(ink)
    g.drawLine(left, top + plotH, left + plotW, top + plotH) // x axis
    g.drawLine(left, top, left, top + plotH)                 // y axis
  }

  private def yAxis(g: Graphics2D, yMax: Double): Unit = {
    g.setFont(base)
    (0 to 5).foreach { i =>
      val v = yMax * i / 5
      val y = yAt(v, yMax)
      if (i > 0) { g.setColor(grid); g.drawLine(left + 1, y, left + plotW, y) }
      g.setColor(mutedInk)
      // plain numbers like pandas' default axis formatter (no separators)
      val s = if (yMax >= 10)
        "%.0f".formatLocal(java.util.Locale.ROOT, v)
      else "%.1f".formatLocal(java.util.Locale.ROOT, v)
      g.drawString(s, left - 12 - g.getFontMetrics.stringWidth(s), y + 7)
    }
  }

  /** Rotated-45° category labels, thinned to ≤ 16 so they never collide. */
  private def xAxis(g: Graphics2D, labels: Array[String]): Unit = {
    g.setFont(base); g.setColor(mutedInk)
    val n = labels.length
    val step = math.max(1, math.ceil(n / 16.0).toInt)
    labels.zipWithIndex.foreach { case (l, i) =>
      if (i % step == 0) {
        val x = xAt(i, n); val y = top + plotH
        val tr = g.getTransform
        g.rotate(-math.Pi / 4, x.toDouble, (y + 12).toDouble)
        g.drawString(l, x - g.getFontMetrics.stringWidth(l), y + 24)
        g.setTransform(tr)
        g.setColor(new Color(0x99, 0x99, 0x99))
        g.drawLine(x, y, x, y + 6)
        g.setColor(mutedInk)
      }
    }
  }

  /** Entry rows the legend can draw: rows that fit under the title inside
    * the box (boxH = rowH·(rows+1) + 10, drawn from top+10 → rows ≤
    * (plotH−20)/rowH − 1), RESERVING one row for the "+N more" summary
    * when the entries overflow — without the reservation a capped box
    * overflowed the plot bottom by exactly one row.
    */
  private[etl] def legendMaxRows(
      nEntries: Int, plotH: Int, rowH: Int = 28): Int = {
    val capacity = math.max(1, (plotH - 20) / rowH - 1)
    if (nEntries <= capacity) capacity else math.max(1, capacity - 1)
  }

  private def legend(
      g: Graphics2D, entries: Seq[(String, Color)], legendTitle: String): Unit = {
    g.setFont(base)
    val fm = g.getFontMetrics
    // bound the box to the canvas: un-cleaned category values can be many
    // or arbitrarily long — truncate names to half the plot width and cap
    // rows to the plot height with a "+N more" summary row (a no-op for
    // report-shaped legends, so the reference goldens are untouched)
    val rowH = 28
    def fit(s: String): String = {
      val maxW = plotW / 2
      if (fm.stringWidth(s) <= maxW) s
      else {
        var t = s
        while (t.nonEmpty && fm.stringWidth(t + "…") > maxW)
          t = t.substring(0, t.length - 1)
        t + "…"
      }
    }
    val maxRows = legendMaxRows(entries.length, plotH, rowH)
    val shown = entries.take(maxRows).map { case (n, c) => (fit(n), c) }
    val extra = entries.length - shown.length
    val drawn = if (extra > 0) shown :+ (s"+$extra more" -> grid) else shown
    val wMax = (fit(legendTitle) +: drawn.map(_._1))
      .map(fm.stringWidth).max
    val boxW = wMax + 50
    val x = left + plotW - boxW - 10; var y = top + 10
    val boxH = rowH * (drawn.length + 1) + 10
    g.setColor(new Color(255, 255, 255, 230)); g.fillRect(x, y, boxW, boxH)
    g.setColor(grid); g.drawRect(x, y, boxW, boxH)
    g.setColor(ink)
    g.drawString(fit(legendTitle), x + 10, y + 22); y += rowH
    drawn.foreach { case (name, c) =>
      g.setColor(c); g.fillRect(x + 10, y + 6, 18, 18)
      g.setColor(new Color(0, 0, 0, 90)); g.drawRect(x + 10, y + 6, 18, 18)
      g.setColor(ink); g.drawString(name, x + 38, y + 22)
      y += rowH
    }
  }
}
