package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.ingest.Ingest
import graft.schema.WeatherSchema

/** Kafka-wire-format ingestion (the north star's "Structured Streaming +
  * Kafka" path; reference twin: the extract poll loop extract.py:110-137,
  * whose per-city HTTP responses become per-key Kafka records).
  *
  * Split in two so the decode is testable without a broker:
  *   - [[stream]] builds the `format("kafka")` reader — the only part that
  *     needs the spark-sql-kafka connector and a live bootstrap server;
  *   - [[decode]]/[[decodeFlat]] operate on ANY DataFrame with the Kafka
  *     wire schema (binary key/value + topic/partition/offset/timestamp),
  *     so a MemoryStream of wire-shaped rows exercises the exact code path
  *     a production topic would (StreamingSpec "kafka wire" tests).
  *
  * Scale posture: decode is pure map-side column work (from_json over the
  * explicit owm schema — never inferred), so ingestion parallelism equals
  * Kafka partition count and no shuffle happens before the first stateful
  * operator downstream.
  */
object KafkaWire {

  /** The exact output schema of Spark's Kafka source (and therefore the
    * input contract of [[decode]]).
    */
  val wireSchema: StructType = StructType(Seq(
    StructField("key", BinaryType),
    StructField("value", BinaryType),
    StructField("topic", StringType),
    StructField("partition", IntegerType),
    StructField("offset", LongType),
    StructField("timestamp", TimestampType),
    StructField("timestampType", IntegerType)))

  /** Metadata columns [[decode]] carries alongside the payload. */
  val metaCols: Seq[String] =
    Seq("kafka_key", "kafka_topic", "kafka_partition", "kafka_offset", "kafka_ts")

  /** Reader for a real topic. Requires the spark-sql-kafka connector on the
    * classpath and a reachable bootstrap server; everything downstream of
    * `.load()` is [[decode]], which the tests cover broker-free.
    */
  def stream(spark: SparkSession, bootstrapServers: String, topic: String,
             startingOffsets: String = "latest",
             maxOffsetsPerTrigger: Option[Long] = None): DataFrame = {
    val r = spark.readStream
      .format("kafka")
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("subscribe", topic)
      .option("startingOffsets", startingOffsets)
    maxOffsetsPerTrigger.foldLeft(r)((b, n) =>
      b.option("maxOffsetsPerTrigger", n.toString)).load()
  }

  /** Decode wire records into owm-shaped observations: value bytes → UTF-8
    * string → from_json against the explicit schema. A malformed payload
    * yields a row whose data fields are null and whose `_corrupt_record`
    * carries the raw text (same PERMISSIVE convention as the batch JSON
    * scan, Ingest.readRawJson) — it then fails the required-keys filter
    * instead of killing the query. Kafka metadata rides along under the
    * `kafka_*` names for lineage/debugging.
    */
  def decode(records: DataFrame, dropMeta: Boolean = false): DataFrame = {
    val parsed = records.select(
      from_json(col("value").cast("string"), WeatherSchema.owm,
        Map("mode" -> "PERMISSIVE",
            "columnNameOfCorruptRecord" -> "_corrupt_record")).as("r"),
      col("key").cast("string").as("kafka_key"),
      col("topic").as("kafka_topic"),
      col("partition").as("kafka_partition"),
      col("offset").as("kafka_offset"),
      col("timestamp").as("kafka_ts"))
      .select(col("r.*"), col("kafka_key"), col("kafka_topic"),
              col("kafka_partition"), col("kafka_offset"), col("kafka_ts"))
    if (dropMeta) parsed.drop(metaCols: _*) else parsed
  }

  /** decode → required-keys filter → nested flatten: wire bytes to the
    * 13-column flat observation table in one declarative plan (the
    * streaming twin of Ingest.flatten over the raw JSON landing dir).
    */
  def decodeFlat(records: DataFrame): DataFrame =
    Ingest.flatten(decode(records, dropMeta = true))

  /** The publish side: flat observations → Kafka wire rows (key = city
    * bytes — so a topic partition keys by city and per-city order is
    * preserved, matching the per-city poll loop — value = the owm-shaped
    * JSON). Inverse of [[decodeFlat]] at whole-second timestamps:
    * `decodeFlat(encode(flat)) == flat` (StreamingSpec round-trip).
    * Writing the result to a real topic is `.writeStream.format("kafka")`
    * — connector-only, like [[stream]].
    */
  def encode(flat: DataFrame, topic: String = "weather"): DataFrame =
    flat.select(
      col("city").cast("binary").as("key"),
      to_json(struct(
        unix_timestamp(col("timestamp")).as("dt"),
        col("city").as("city_name"),
        col("country").as("country_code"),
        struct(
          col("temperature").as("temp"), col("feels_like"),
          col("temp_min"), col("temp_max"),
          col("pressure"), col("humidity")).as("main"),
        struct(col("wind_speed").as("speed"),
               col("wind_direction").as("deg")).as("wind"),
        array(struct(
          col("weather_condition").as("main"),
          col("weather_description").as("description"))).as("weather")))
        .cast("binary").as("value"),
      lit(topic).as("topic"),
      lit(0).as("partition"),
      monotonically_increasing_id().as("offset"),
      col("timestamp").as("timestamp"),
      lit(0).as("timestampType"))
}
