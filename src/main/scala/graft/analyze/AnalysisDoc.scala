package graft.analyze

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** The reference's nested analysis-result document (FIXTURES.md §A3;
  * analyze.py:118-133 assembles `basic_stats` / `city_comparisons` /
  * `temperature_trends` / `weather_conditions` into one dict saved as
  * `weather_analysis_*.json`, analyze.py:292-306).
  *
  * Assembled entirely Spark-side: each section is a small aggregate,
  * per-city maps come from `map_from_entries(collect_list(struct(...)))`,
  * and the document is one `to_json(struct(...))` row — no driver-side
  * JSON stitching, so the same plan would produce the document from a
  * 100 TB table (every input to the final struct is an aggregate, already
  * tiny by construction).
  */
object AnalysisDoc {

  def build(df: DataFrame, ts: String = "timestamp", city: String = "city",
            temp: String = "temperature", humidity: String = "humidity",
            wind: String = "wind_speed", cond: String = "weather_condition"): String = {
    val r2 = (c: org.apache.spark.sql.Column) => round(c, 2)

    val basic = df.agg(
      count(lit(1)).as("count"),
      struct(
        date_format(min(col(ts)), "yyyy-MM-dd HH:mm:ss").as("start"),
        date_format(max(col(ts)), "yyyy-MM-dd HH:mm:ss").as("end")).as("date_range"),
      struct(r2(min(col(temp))).as("min"), r2(max(col(temp))).as("max"),
             r2(avg(col(temp))).as("mean"), r2(median(col(temp))).as("median")).as("temperature"),
      struct(r2(min(col(humidity))).as("min"), r2(max(col(humidity))).as("max"),
             r2(avg(col(humidity))).as("mean")).as("humidity"),
      struct(r2(min(col(wind))).as("min"), r2(max(col(wind))).as("max"),
             r2(avg(col(wind))).as("mean")).as("wind_speed"))
      .select(struct(col("count"), col("date_range"), col("temperature"),
                     col("humidity"), col("wind_speed")).as("overall"))

    val perCity = df.groupBy(city).agg(
        struct(r2(avg(col(temp))).as("mean"), r2(min(col(temp))).as("min"),
               r2(max(col(temp))).as("max")).as("temperature"),
        struct(r2(avg(col(humidity))).as("mean")).as("humidity"),
        struct(r2(avg(col(wind))).as("mean")).as("wind_speed"),
        avg(col(temp)).as("__m"))
    val cityComparisons = perCity
      .agg(map_from_entries(sort_array(collect_list(struct(col(city),
             struct(col("temperature"), col("humidity"), col("wind_speed")))))).as("cities"),
           max_by(col(city), col("__m")).as("warmest_city"),
           min_by(col(city), col("__m")).as("coldest_city"))

    val trends = Analytics.trendAnalysis(df, ts, city, temp)
      .agg(map_from_entries(sort_array(collect_list(struct(col(city),
        struct(col("avg_daily_change"), col("max_increase"),
               col("max_decrease"), col("overall_trend")))))).as("trends"))

    val conditions = {
      val dist = df.groupBy(cond).agg(count(lit(1)).as("n"))
        .agg(map_from_entries(sort_array(collect_list(struct(col(cond), col("n"))))).as("overall_distribution"))
      val byCity = Analytics.modePerGroup(df, city, cond)
        .agg(map_from_entries(sort_array(collect_list(struct(col(city), col("mode_value"))))).as("most_common_by_city"))
      dist.crossJoin(byCity)
    }

    basic.crossJoin(cityComparisons).crossJoin(trends).crossJoin(conditions)
      .select(to_json(struct(
        struct(col("overall")).as("basic_stats"),
        struct(col("cities"), col("warmest_city"), col("coldest_city")).as("city_comparisons"),
        col("trends").as("temperature_trends"),
        struct(col("overall_distribution"), col("most_common_by_city")).as("weather_conditions")
      )).as("doc"))
      .collect()(0).getString(0)
  }
}
