package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import graft.functions.Scalars

class ScalarsSpec extends SparkTestBase {
  import spark.implicits._

  test("F1/F2 fixed points: 0->32, 100->212, -40->-40 (reference test_utils.py:57-65)") {
    val df = Seq(0.0, 100.0, -40.0).toDF("c")
    val f = df.select(Scalars.celsiusToFahrenheit($"c")).collect().map(_.getDouble(0))
    assert(f.toSeq === Seq(32.0, 212.0, -40.0))
    val c = Seq(32.0, 212.0, -40.0).toDF("f")
      .select(Scalars.fahrenheitToCelsius($"f")).collect().map(_.getDouble(0))
    assert(c.toSeq === Seq(0.0, 100.0, -40.0))
  }

  test("F1∘F2 round-trip property (ScalaCheck-generated sample)") {
    val xs = Gen.listOfN(200, Gen.choose(-1e6, 1e6)).sample.get
    val rows = xs.toDF("c")
      .select($"c", Scalars.fahrenheitToCelsius(Scalars.celsiusToFahrenheit($"c")))
      .collect()
    rows.foreach { r =>
      val (x, rt) = (r.getDouble(0), r.getDouble(1))
      assert(math.abs(rt - x) < 1e-9 * math.max(1.0, math.abs(x)))
    }
  }

  test("F3 formatTimestamp literal format") {
    val df = Seq(Timestamp.valueOf("2024-03-05 07:08:09")).toDF("ts")
    assert(df.select(Scalars.formatTimestamp($"ts")).collect()(0).getString(0)
      === "2024-03-05 07:08:09")
  }

  test("F4 dateRange inclusive (reference test_utils.py:51-55)") {
    val df = Seq(("2024-01-01", "2024-01-05")).toDF("s", "e")
    val r = df.select(Scalars.dateRange($"s", $"e")).collect()(0).getSeq[String](0)
    assert(r.length === 5 && r.head === "2024-01-01" && r.last === "2024-01-05")
  }

  test("F5 weatherIcon known keys + default (reference test_utils.py:71-74)") {
    val df = Seq("Clear", "Rain", "NoSuchCondition").toDF("cond")
    val icons = df.select(Scalars.weatherIcon($"cond")).collect().map(_.getString(0))
    assert(icons(0) === "☀️" && icons(1) === "🌧️" && icons(2) === "❓")
  }

  test("F6 time features: date/hour/day_of_week") {
    val df = Seq(Timestamp.valueOf("2024-01-01 13:45:00")).toDF("ts") // a Monday
    val r = Scalars.withTimeFeatures(df, "ts").collect()(0)
    assert(r.getAs[String]("date") === "2024-01-01")
    assert(r.getAs[Long]("hour") === 13L)
    assert(r.getAs[String]("day_of_week") === "Monday")
  }

  test("mapLookup falls back to default") {
    val df = Seq("a", "zzz").toDF("k")
    val r = df.select(Scalars.mapLookup($"k", Seq("a" -> "1"), "dflt"))
      .collect().map(_.getString(0))
    assert(r.toSeq === Seq("1", "dflt"))
  }
}
