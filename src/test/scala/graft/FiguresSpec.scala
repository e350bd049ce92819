package graft

import java.sql.Timestamp
import graft.sink.Figures

class FiguresSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private def cleanTable = Seq(
    ("london", "GB", ts("2024-01-01 06:00:00"), 10.0, 55.0, "Clear"),
    ("london", "GB", ts("2024-01-01 18:00:00"), 12.0, 60.0, "Clear"),
    ("london", "GB", ts("2024-01-02 06:00:00"), 11.0, 58.0, "Rain"),
    ("tokyo", "JP", ts("2024-01-01 06:00:00"), 5.0, 70.0, "Rain"),
    ("tokyo", "JP", ts("2024-01-02 06:00:00"), 6.0, 72.0, "Clouds"))
    .toDF("city", "country", "timestamp", "temperature", "humidity", "weather_condition")

  test("writeFigures renders the reference's five charts as well-formed SVG") {
    val dir = java.nio.file.Files.createTempDirectory("graft_figs").toString
    val paths = Figures.writeFigures(cleanTable, dir)
    assert(paths.size === 5)
    val factory = javax.xml.parsers.DocumentBuilderFactory.newInstance()
    paths.foreach { p =>
      assert(new java.io.File(p).length() > 0)
      // must parse as XML — broken escaping or unclosed tags fail here
      factory.newDocumentBuilder().parse(new java.io.File(p))
    }
    val byCity = java.nio.file.Files.readString(java.nio.file.Paths.get(dir, "temp_by_city.svg"))
    assert("<rect x=".r.findAllIn(byCity).size === 2) // one bar per city (+1 bg rect)
    assert(byCity.contains("london") && byCity.contains("tokyo"))
    val daily = java.nio.file.Files.readString(java.nio.file.Paths.get(dir, "daily_temp.svg"))
    assert("<polyline".r.findAllIn(daily).size === 2) // one series per city
    val scatter = java.nio.file.Files.readString(java.nio.file.Paths.get(dir, "temp_vs_humidity.svg"))
    assert("<circle".r.findAllIn(scatter).size === 5) // one dot per row
    assert(scatter.contains("<line"))                 // regression trend line
  }

  test("writeFigures is byte-deterministic and survives degenerate input") {
    val dir1 = java.nio.file.Files.createTempDirectory("graft_figs1").toString
    val dir2 = java.nio.file.Files.createTempDirectory("graft_figs2").toString
    Figures.writeFigures(cleanTable, dir1)
    Figures.writeFigures(cleanTable, dir2)
    for (name <- Seq("temp_by_city.svg", "daily_temp.svg", "temp_histogram.svg",
                     "conditions.svg", "temp_vs_humidity.svg")) {
      val a = java.nio.file.Files.readString(java.nio.file.Paths.get(dir1, name))
      val b = java.nio.file.Files.readString(java.nio.file.Paths.get(dir2, name))
      assert(a === b, s"$name not deterministic")
    }
    // constant-valued input: zero data span must not divide by zero
    val flat = Seq(("x", "Y", ts("2024-01-01 00:00:00"), 1.0, 1.0, "Clear"))
      .toDF("city", "country", "timestamp", "temperature", "humidity", "weather_condition")
    val dir3 = java.nio.file.Files.createTempDirectory("graft_figs3").toString
    val paths = Figures.writeFigures(flat, dir3)
    assert(paths.size === 5)
    paths.foreach(p => assert(!java.nio.file.Files.readString(
      java.nio.file.Paths.get(p)).contains("NaN")))
  }

  test("writeFigures on ZERO rows renders empty charts instead of crashing the load phase") {
    // min/max over no rows aggregate to null — a raw dir whose records are
    // all corrupt/filtered must not NPE the pipeline (the sink is on by
    // default in Pipeline.Config)
    val empty = cleanTable.filter("temperature > 1e9")
    val dir = java.nio.file.Files.createTempDirectory("graft_figs_empty").toString
    val paths = Figures.writeFigures(empty, dir)
    assert(paths.size === 5)
    val factory = javax.xml.parsers.DocumentBuilderFactory.newInstance()
    paths.foreach(p => factory.newDocumentBuilder().parse(new java.io.File(p)))
  }
}
