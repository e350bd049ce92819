package graft.sink

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** S13 figure sink (analyze.py:308-491): the reference renders 5 matplotlib
  * PNGs; here the same five visualizations render as dependency-free SVG
  * (no codec/plot libs in scope — SVG is plain XML, byte-deterministic,
  * and any browser/Grafana panel displays it).
  *
  * Scale posture: every chart renders from a driver-side collect of an
  * ALREADY-AGGREGATED result (per-city means, daily means, fixed-width
  * histogram bins, condition counts, a bounded deterministic scatter
  * sample) — the collected row count is O(cities·days) / O(bins), never
  * O(rows), so the sink is safe at any input scale. The aggregations
  * themselves are the driver-verified query shapes (a2/a4/a5/a10/a13).
  */
object Figures {

  private val W = 640
  private val H = 400
  private val Margin = 48
  private val Colors = Seq("#4e79a7", "#f28e2b", "#e15759", "#76b7b2", "#59a14f",
    "#edc948", "#b07aa1", "#ff9da7", "#9c755f", "#bab0ac")

  private def esc(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;").replace("\"", "&quot;")

  private def fmt(d: Double): String = f"$d%.2f"

  private def svg(title: String, body: String): String =
    s"""<svg xmlns="http://www.w3.org/2000/svg" width="$W" height="$H" viewBox="0 0 $W $H">
       |<rect width="$W" height="$H" fill="white"/>
       |<text x="${W / 2}" y="20" text-anchor="middle" font-size="14" font-family="sans-serif">${esc(title)}</text>
       |$body
       |</svg>
       |""".stripMargin

  /** Linear scale from data range to pixel range (guards zero span). */
  private def scale(lo: Double, hi: Double, plo: Double, phi: Double): Double => Double = {
    val span = if (hi == lo) 1.0 else hi - lo
    v => plo + (v - lo) / span * (phi - plo)
  }

  /** Vertical bar chart: one bar per (label, value). */
  def barChartSvg(title: String, data: Seq[(String, Double)]): String = {
    if (data.isEmpty) return svg(title, "")
    val hi = math.max(data.map(_._2).max, 0.0)
    val lo = math.min(data.map(_._2).min, 0.0)
    val y = scale(lo, hi, (H - Margin).toDouble, Margin.toDouble)
    val bw = (W - 2 * Margin).toDouble / data.size
    val bars = data.zipWithIndex.map { case ((label, v), i) =>
      val x = Margin + i * bw
      val top = math.min(y(v), y(0.0)); val bot = math.max(y(v), y(0.0))
      s"""<rect x="${fmt(x + bw * 0.1)}" y="${fmt(top)}" width="${fmt(bw * 0.8)}" height="${fmt(bot - top)}" fill="${Colors(i % Colors.size)}"/>
         |<text x="${fmt(x + bw / 2)}" y="${H - Margin + 16}" text-anchor="middle" font-size="10" font-family="sans-serif">${esc(label)}</text>
         |<text x="${fmt(x + bw / 2)}" y="${fmt(top - 4)}" text-anchor="middle" font-size="9" font-family="sans-serif">${fmt(v)}</text>""".stripMargin
    }
    svg(title, bars.mkString("\n"))
  }

  /** Multi-series line chart: series name → ordered (x-label, value). */
  def lineChartSvg(title: String, series: Seq[(String, Seq[(String, Double)])]): String = {
    val all = series.flatMap(_._2.map(_._2))
    if (all.isEmpty) return svg(title, "")
    val y = scale(all.min, all.max, (H - Margin).toDouble, Margin.toDouble)
    val n = series.map(_._2.size).max
    val x = scale(0.0, math.max(n - 1, 1).toDouble, Margin.toDouble, (W - Margin).toDouble)
    val lines = series.zipWithIndex.map { case ((name, pts), si) =>
      val path = pts.zipWithIndex
        .map { case ((_, v), i) => s"${fmt(x(i.toDouble))},${fmt(y(v))}" }
        .mkString(" ")
      s"""<polyline points="$path" fill="none" stroke="${Colors(si % Colors.size)}" stroke-width="1.5"/>
         |<text x="${W - Margin + 4}" y="${Margin + 14 * si + 10}" font-size="10" font-family="sans-serif" fill="${Colors(si % Colors.size)}">${esc(name)}</text>""".stripMargin
    }
    svg(title, lines.mkString("\n"))
  }

  /** Histogram from precomputed (binStart, count) pairs. */
  def histogramSvg(title: String, bins: Seq[(Double, Long)]): String =
    barChartSvg(title, bins.map { case (b, c) => fmt(b) -> c.toDouble })

  /** Scatter + fitted line (slope/intercept from the regression agg). */
  def scatterSvg(title: String, points: Seq[(Double, Double)],
                 slope: Double, intercept: Double): String = {
    if (points.isEmpty) return svg(title, "")
    val xs = points.map(_._1); val ys = points.map(_._2)
    val x = scale(xs.min, xs.max, Margin.toDouble, (W - Margin).toDouble)
    val yLine = Seq(xs.min, xs.max).map(v => intercept + slope * v)
    val y = scale(math.min(ys.min, yLine.min), math.max(ys.max, yLine.max),
      (H - Margin).toDouble, Margin.toDouble)
    val dots = points.map { case (px, py) =>
      s"""<circle cx="${fmt(x(px))}" cy="${fmt(y(py))}" r="2" fill="${Colors.head}" fill-opacity="0.6"/>"""
    }
    val trend =
      s"""<line x1="${fmt(x(xs.min))}" y1="${fmt(y(yLine.head))}" x2="${fmt(x(xs.max))}" y2="${fmt(y(yLine(1)))}" stroke="${Colors(2)}" stroke-width="1.5"/>"""
    svg(title, (dots :+ trend).mkString("\n"))
  }

  /** The reference's five figures (analyze.py:308-491) over the clean
    * weather table. Returns the written paths.
    */
  def writeFigures(clean: DataFrame, dir: String, scatterSample: Int = 500): Seq[String] = {
    Files.createDirectories(Paths.get(dir))
    def save(name: String, content: String): String = {
      val p = Paths.get(dir, name)
      Files.write(p, content.getBytes(StandardCharsets.UTF_8))
      p.toString
    }
    // 7 chart queries share the clean table's lineage — cache it for the
    // duration of the sink instead of re-running read+transform per chart
    clean.persist()
    try writeFiguresImpl(clean, dir, scatterSample, save)
    finally clean.unpersist()
  }

  private def writeFiguresImpl(clean: DataFrame, dir: String, scatterSample: Int,
                               save: (String, String) => String): Seq[String] = {
    // 1. avg temperature by city, desc (analyze.py:343 bar chart)
    val byCity = clean.groupBy("city").agg(avg(col("temperature")).as("m"))
      .filter(col("m").isNotNull) // all-null temps for a city -> no bar, not an NPE
      .orderBy(col("m").desc, col("city"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toSeq
    // 2. daily avg temperature per city (time-series lines)
    val daily = clean
      .groupBy(col("city"), to_date(col("timestamp")).as("d"))
      .agg(avg(col("temperature")).as("m"))
      .filter(col("m").isNotNull && col("d").isNotNull)
      .orderBy(col("city"), col("d"))
      .collect().map(r => (r.getString(0), r.getDate(1).toString, r.getDouble(2)))
      .groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (c, rows) => c -> rows.map(t => t._2 -> t._3).toSeq }
    // 3. temperature histogram: 10 fixed-width bins computed engine-side.
    // min/max over ZERO rows (or all-null temperature) aggregates to null
    // — render an empty histogram instead of NPEing the load phase
    val mm = clean.agg(min(col("temperature")), max(col("temperature"))).collect()(0)
    val hist =
      if (mm.isNullAt(0) || mm.isNullAt(1)) Seq.empty[(Double, Long)]
      else {
        val (tLo, tHi) = (mm.getDouble(0), mm.getDouble(1))
        val width = if (tHi == tLo) 1.0 else (tHi - tLo) / 10.0
        clean
          .select(least(floor((col("temperature") - tLo) / width), lit(9)).cast("int").as("bin"))
          .filter(col("bin").isNotNull)
          .groupBy("bin").agg(count(lit(1)).as("n"))
          .orderBy("bin")
          .collect().map(r => (tLo + r.getInt(0) * width, r.getLong(1))).toSeq
      }
    // 4. weather condition distribution (analyze.py:404's value_counts bar)
    val conds = clean
      .filter(col("weather_condition").isNotNull) // null group -> no bar, not an NPE
      .groupBy("weather_condition").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("weather_condition"))
      .collect().map(r => r.getString(0) -> r.getLong(1).toDouble).toSeq
    // 5. temp vs humidity scatter + regression line (analyze.py:430-448);
    // deterministic bounded sample: first N by (city, timestamp)
    val pts = clean.select(col("temperature"), col("humidity"), col("city"), col("timestamp"))
      .na.drop(Seq("temperature", "humidity"))
      .orderBy("city", "timestamp").limit(scatterSample)
      .collect().map(r => (r.getDouble(0), r.getDouble(1))).toSeq
    val reg = clean.agg(
      regr_slope(col("humidity"), col("temperature")).as("s"),
      regr_intercept(col("humidity"), col("temperature")).as("i")).collect()(0)
    val (slope, icept) =
      (if (reg.isNullAt(0)) 0.0 else reg.getDouble(0), if (reg.isNullAt(1)) 0.0 else reg.getDouble(1))
    Seq(
      save("temp_by_city.svg", barChartSvg("Average temperature by city", byCity)),
      save("daily_temp.svg", lineChartSvg("Daily average temperature", daily)),
      save("temp_histogram.svg", histogramSvg("Temperature distribution", hist)),
      save("conditions.svg", barChartSvg("Weather condition distribution", conds)),
      save("temp_vs_humidity.svg", scatterSvg("Temperature vs humidity", pts, slope, icept)))
  }
}
