package graft.schema

import org.apache.spark.sql.types._

/** Explicit schemas for the weather pipeline (SURVEY §1.1). The reference
  * is schemaless (`json.load` + `.get(k, None)` ladders, transform.py:72,
  * 110-123); here every source declares a `StructType` up front — missing
  * fields become typed nulls in the scan instead of per-record Python
  * guards, and the JSON reader can prune + push down.
  */
object WeatherSchema {

  /** Raw OpenWeatherMap observation (FIXTURES.md §A1): nested structs
    * `main`/`wind`, array-of-struct `weather`, epoch `dt` + ISO fallback
    * `extraction_timestamp` (transform.py:104-107), extract-time enrichment
    * fields (extract.py:124-127). All leaves nullable.
    */
  val owm: StructType = StructType(Seq(
    StructField("dt", LongType),
    StructField("extraction_timestamp", StringType),
    StructField("city_name", StringType),
    StructField("country_code", StringType),
    StructField("main", StructType(Seq(
      StructField("temp", DoubleType),
      StructField("feels_like", DoubleType),
      StructField("temp_min", DoubleType),
      StructField("temp_max", DoubleType),
      StructField("pressure", DoubleType),
      StructField("humidity", DoubleType)))),
    StructField("wind", StructType(Seq(
      StructField("speed", DoubleType),
      StructField("deg", DoubleType)))),
    StructField("weather", ArrayType(StructType(Seq(
      StructField("main", StringType),
      StructField("description", StringType))))),
    StructField("_corrupt_record", StringType)))

  /** Cleaned flat table (FIXTURES.md §A2): 13 base columns
    * (transform.py:126-140) + 4 derived (transform.py:198-203).
    */
  val clean: StructType = StructType(Seq(
    StructField("city", StringType),
    StructField("country", StringType),
    StructField("timestamp", TimestampType),
    StructField("temperature", DoubleType),
    StructField("feels_like", DoubleType),
    StructField("temp_min", DoubleType),
    StructField("temp_max", DoubleType),
    StructField("pressure", DoubleType),
    StructField("humidity", DoubleType),
    StructField("wind_speed", DoubleType),
    StructField("wind_direction", DoubleType),
    StructField("weather_condition", StringType),
    StructField("weather_description", StringType),
    StructField("date", StringType),
    StructField("hour", LongType),
    StructField("day_of_week", StringType),
    StructField("temp_range", DoubleType)))

  /** Numeric columns cleaned by the §2.9 two-pass composite
    * (transform.py:168-169).
    */
  val numericCols: Seq[String] = Seq(
    "temperature", "feels_like", "temp_min", "temp_max",
    "pressure", "humidity", "wind_speed", "wind_direction")

  /** Categorical defaults (transform.py:194-195). */
  val categoricalDefaults: Map[String, String] = Map(
    "weather_condition" -> "Unknown",
    "weather_description" -> "Unknown")
}
