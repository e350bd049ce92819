package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.sources.KafkaWire
import java.util.Base64

/** Golden wire-format fixtures: byte-exact encode/decode vectors checked
  * into test resources (`kafka_wire_golden.jsonl`), so the Kafka wire
  * contract is pinned even though no broker or connector jar exists in the
  * build sandbox. If anyone changes the JSON field order, the key
  * encoding, null-field omission, or the UTF-8 handling, these vectors
  * fire — the same role a live-topic integration test would play for the
  * payload, minus the transport.
  *
  * What REMAINS connector-gated (needs spark-sql-kafka + a broker, not
  * present here): `KafkaWire.stream`'s `.format("kafka").load()` branch,
  * offset management (`startingOffsets`/`maxOffsetsPerTrigger`), and
  * `.writeStream.format("kafka")` delivery. Everything downstream of the
  * wire rows — decode, flatten, required-keys filtering, windowing — is
  * exercised here and in StreamingSpec on MemoryStream twins.
  */
class KafkaWireSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.from(java.time.Instant.parse(s))

  /** The canonical observations the fixture was generated from: varied
    * signs, a null optional field (Berlin's wind_direction — pins to_json
    * null-OMISSION, not null-serialization), and a non-ASCII city (pins
    * UTF-8 key/value bytes).
    */
  private lazy val canonicalFlat = Seq(
    ("Lagos", "NG", ts("2021-03-04T05:06:07Z"), 31.5, 33.0, 30.0, 32.5, 1012.0, 74.0, 3.6, Some(120.0), "Clouds", "scattered clouds"),
    ("Berlin", "DE", ts("2021-03-04T05:06:08Z"), -2.25, -6.5, -3.0, -1.5, 1028.5, 81.0, 5.1, None, "Snow", "light snow"),
    ("São Paulo", "BR", ts("2021-03-04T05:06:09Z"), 22.0, 22.5, 21.0, 23.5, 1015.0, 66.0, 2.0, Some(200.0), "Rain", "moderate rain")
  ).toDF("city", "country", "timestamp", "temperature", "feels_like",
    "temp_min", "temp_max", "pressure", "humidity", "wind_speed",
    "wind_direction", "weather_condition", "weather_description")

  private case class GoldenRec(keyB64: String, valueB64: String, topic: String,
                               wellFormed: Boolean)

  private lazy val golden: Seq[GoldenRec] = {
    val src = scala.io.Source.fromInputStream(
      getClass.getResourceAsStream("/kafka_wire_golden.jsonl"), "UTF-8")
    try src.getLines().filter(_.nonEmpty).toList.map { line =>
      // fixture lines are flat JSON objects; parse with a tiny regex-free
      // extractor via Spark's own from_json to avoid a JSON dependency
      val df = Seq(line).toDF("j").select(from_json(col("j"),
        org.apache.spark.sql.types.StructType.fromDDL(
          "key_b64 STRING, value_b64 STRING, topic STRING, well_formed BOOLEAN")).as("r"))
        .select("r.*").collect()(0)
      GoldenRec(df.getString(0), df.getString(1), df.getString(2), df.getBoolean(3))
    } finally src.close()
  }

  /** Fixture wire records as a wire-schema DataFrame (what the Kafka
    * source would hand decode).
    */
  private lazy val wireDf = {
    val dec = Base64.getDecoder
    val rows = golden.zipWithIndex.map { case (g, i) =>
      Row(dec.decode(g.keyB64), dec.decode(g.valueB64), g.topic, 0, i.toLong,
        ts("2021-03-04T06:00:00Z"), 0)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows), KafkaWire.wireSchema)
  }

  test("encode emits the exact golden bytes (key, value, topic)") {
    val got = KafkaWire.encode(canonicalFlat.coalesce(1), topic = "weather")
      .select("key", "value", "topic").collect()
      .map(r => (Base64.getEncoder.encodeToString(r.getAs[Array[Byte]](0)),
                 Base64.getEncoder.encodeToString(r.getAs[Array[Byte]](1)),
                 r.getString(2))).toSet
    val want = golden.filter(_.wellFormed).map(g => (g.keyB64, g.valueB64, g.topic)).toSet
    assert(got === want)
  }

  test("decodeFlat on golden wire records yields exactly the canonical rows") {
    // the corrupt payload and the missing-required-keys payload must be
    // dropped by the required-keys filter, not error the query
    val got = KafkaWire.decodeFlat(wireDf).collect().toSet
    val want = canonicalFlat.collect().toSet
    assert(got === want)
  }

  test("corrupt payload lands in _corrupt_record with its kafka key attached") {
    val decoded = KafkaWire.decode(wireDf)
    val corrupt = decoded.filter(col("_corrupt_record").isNotNull).collect()
    assert(corrupt.length === 1)
    assert(corrupt(0).getAs[String]("kafka_key") === "Corrupt")
    // well-formed-but-incomplete is NOT corrupt: it parses, then fails the
    // required-keys filter downstream
    val ghost = decoded.filter(col("kafka_key") === "Ghost").collect()(0)
    assert(ghost.getAs[String]("_corrupt_record") == null)
    assert(ghost.getAs[String]("city_name") === "Ghost")
  }
}
