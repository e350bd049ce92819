package graft

import java.sql.Timestamp
import graft.analyze.AnalysisDoc

class AnalysisDocSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("nested analysis document matches the reference's §A3 shape and values") {
    val df = Seq(
      ("london", ts("2024-01-01 06:00:00"), 10.0, 70.0, 3.0, "Clouds"),
      ("london", ts("2024-01-02 06:00:00"), 14.0, 80.0, 5.0, "Rain"),
      ("london", ts("2024-01-03 06:00:00"), 12.0, 60.0, 4.0, "Rain"),
      ("tokyo",  ts("2024-01-01 06:00:00"), 20.0, 50.0, 2.0, "Clear"),
      ("tokyo",  ts("2024-01-02 06:00:00"), 22.0, 55.0, 2.0, "Clear")
    ).toDF("city", "timestamp", "temperature", "humidity", "wind_speed", "weather_condition")

    val doc = AnalysisDoc.build(df)
    val parsed = spark.read.json(Seq(doc).toDS)
    val row = parsed.collect()(0)

    val basic = row.getAs[org.apache.spark.sql.Row]("basic_stats").getAs[org.apache.spark.sql.Row]("overall")
    assert(basic.getAs[Long]("count") === 5L)
    assert(basic.getAs[org.apache.spark.sql.Row]("temperature").getAs[Double]("median") === 14.0)
    assert(basic.getAs[org.apache.spark.sql.Row]("date_range").getAs[String]("start") === "2024-01-01 06:00:00")

    val cc = row.getAs[org.apache.spark.sql.Row]("city_comparisons")
    assert(cc.getAs[String]("warmest_city") === "tokyo")
    assert(cc.getAs[String]("coldest_city") === "london")
    assert(doc.contains("\"london\":{\"temperature\":{\"mean\":12.0"))

    val trends = row.getAs[org.apache.spark.sql.Row]("temperature_trends")
    val londonTrend = trends.getAs[org.apache.spark.sql.Row]("london")
    assert(londonTrend.getAs[String]("overall_trend") === "warming") // +4, -2
    assert(londonTrend.getAs[Double]("avg_daily_change") === 1.0)

    val conds = row.getAs[org.apache.spark.sql.Row]("weather_conditions")
    assert(conds.getAs[org.apache.spark.sql.Row]("overall_distribution").getAs[Long]("Rain") === 2L)
    assert(conds.getAs[org.apache.spark.sql.Row]("most_common_by_city").getAs[String]("london") === "Rain")
    assert(conds.getAs[org.apache.spark.sql.Row]("most_common_by_city").getAs[String]("tokyo") === "Clear")
  }
}
