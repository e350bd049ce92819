package graft

import graft.clean.Cleaning

class CleaningSpec extends SparkTestBase {
  import spark.implicits._

  test("nullOutliers nulls only out-of-fence values") {
    // 20 inliers at 1..20 plus two wild outliers
    val df = ((1 to 20).map(_.toDouble) ++ Seq(1e6, -1e6)).toDF("v")
    val cleaned = Cleaning.nullOutliers(df, Seq("v"))
    assert(cleaned.filter($"v".isNull).count() === 2)
    assert(cleaned.filter($"v".isNotNull).count() === 20)
  }

  test("imputeMedians fills nulls with the current median") {
    val df = Seq(Some(1.0), Some(2.0), Some(3.0), None).toDF("v")
    val filled = Cleaning.imputeMedians(df, Seq("v"))
    assert(filled.filter($"v".isNull).count() === 0)
    assert(filled.filter($"v" === 2.0).count() === 2) // median of 1,2,3
  }

  test("twoPassClean: median computed AFTER outlier nulling (reference order)") {
    // values: 99 x 10.0, one 10000.0 (outlier beyond the p95 fence), one
    // null. Post-null median = 10.0; the outlier cell must be imputed to
    // 10.0 — pins that the median is computed AFTER nulling, on the fenced
    // column, exactly like transform.py:188.
    val df = (Seq.fill(99)(Some(10.0)) ++ Seq(Some(10000.0), None)).toDF("v")
    val out = Cleaning.twoPassClean(df, Seq("v"))
    assert(out.count() === 101)
    assert(out.filter($"v" === 10.0).count() === 101) // outlier AND null -> 10
  }

  test("twoPassClean fills categorical defaults") {
    val df = Seq((Some(1.0), Some("Rain")), (Some(2.0), None))
      .toDF("v", "cond")
    val out = Cleaning.twoPassClean(df, Seq("v"), Map("cond" -> "Unknown"))
    assert(out.filter($"cond" === "Unknown").count() === 1)
  }

  test("empty column list and empty frame are no-ops") {
    val df = Seq(1.0).toDF("v")
    assert(Cleaning.twoPassClean(df, Seq.empty).collect().map(_.getDouble(0)).toSeq === Seq(1.0))
    val empty = Seq.empty[Double].toDF("v")
    assert(Cleaning.twoPassClean(empty, Seq("v")).count() === 0)
  }
}
