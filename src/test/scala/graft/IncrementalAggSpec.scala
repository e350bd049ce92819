package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.analyze.IncrementalAgg

class IncrementalAggSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private lazy val full = Seq(
    ("a", ts("2024-01-01 01:00:00"), 1.0),
    ("a", ts("2024-01-01 02:00:00"), 3.0),
    ("a", ts("2024-01-02 01:00:00"), 5.0),
    ("b", ts("2024-01-01 01:00:00"), 2.0),
    ("b", ts("2024-01-03 01:00:00"), 4.0),
    ("c", ts("2024-01-05 01:00:00"), 9.0) // key only in the "batch" half
  ).toDF("k", "t", "v").withColumn("id", monotonically_increasing_id())

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("finalize(merge(state(a), state(b))) == direct aggregation of a union b") {
    val a = full.filter(col("v") < 4.0)
    val b = full.filter(col("v") >= 4.0)
    val inc = IncrementalAgg.finalize(
      IncrementalAgg.merge(
        IncrementalAgg.state(a, "k", "t", "v"),
        IncrementalAgg.state(b, "k", "t", "v"), "k"), "k")
    val direct = IncrementalAgg.finalize(IncrementalAgg.state(full, "k", "t", "v"), "k")
    assert(canon(inc) === canon(direct))
    // batch-only keys/days survive the merge
    assert(inc.filter(col("k") === "c").count() === 1)
  }

  test("merge is associative across three batches") {
    val parts = Seq(
      full.filter(col("v") <= 2.0), full.filter(col("v") > 2.0 && col("v") <= 4.0),
      full.filter(col("v") > 4.0)).map(IncrementalAgg.state(_, "k", "t", "v"))
    val leftFold = IncrementalAgg.merge(IncrementalAgg.merge(parts(0), parts(1), "k"), parts(2), "k")
    val rightFold = IncrementalAgg.merge(parts(0), IncrementalAgg.merge(parts(1), parts(2), "k"), "k")
    assert(canon(IncrementalAgg.finalize(leftFold, "k")) ===
           canon(IncrementalAgg.finalize(rightFold, "k")))
  }

  test("finalized values are correct on a known group") {
    val r = IncrementalAgg.finalize(IncrementalAgg.state(full, "k", "t", "v"), "k")
      .filter(col("k") === "a" && col("date") === "2024-01-01").collect()(0)
    assert(r.getAs[Long]("n") === 2L)
    assert(r.getAs[Double]("value_sum") === 4.0)
    assert(r.getAs[Double]("value_mean") === 2.0)
    assert(r.getAs[Double]("value_min") === 1.0)
    assert(r.getAs[Double]("value_max") === 3.0)
  }
}
