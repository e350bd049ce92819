package graft

import org.apache.spark.sql.functions._
import graft.quality.Checks

/** [[graft.quality.Checks]] — declarative DQ suites: metric values,
  * pass/fail semantics in both directions, single-scan plan shape, and
  * referential orphan counting (incl. null child keys).
  */
class ChecksSpec extends SparkTestBase {
  import spark.implicits._

  private def t = Seq(
    (1L, Some("a"), 10.0, "en"),
    (2L, Some("b"), 20.0, "en"),
    (3L, None, 30.0, "xx"),
    (3L, Some("d"), -5.0, "de")
  ).toDF("id", "s", "v", "lang")

  test("suite computes metrics and pass flags in both directions") {
    val out = Checks.run(t, Seq(
      Checks.rowCountAtLeast(3.0),
      Checks.completeness("s", 1.0),
      Checks.uniqueness("id", 1.0),
      Checks.minValue("v", 0.0),
      Checks.maxValue("v", 25.0),
      Checks.inSet("lang", Seq("en", "de"), 1.0),
      Checks.matches("lang", "^[a-z]{2}$", 1.0)
    )).as[(String, String, Double, Double, Boolean)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._5))).toMap
    assert(out(("row_count", "*")) === ((4.0, true)))
    assert(out(("completeness", "s")) === ((0.75, false)))
    assert(out(("uniqueness", "id")) === ((0.75, false)))
    assert(out(("min_value", "v")) === ((-5.0, false)))
    assert(out(("max_value", "v")) === ((30.0, false))) // atMost direction
    assert(out(("in_set", "lang")) === ((0.75, false)))
    assert(out(("matches", "lang")) === ((1.0, true)))
  }

  test("per-row checks vacuously pass on empty input; row_count catches it") {
    // the gate semantics: an empty table violates no per-row property
    // (metric NULL would make `passed` NULL — unfilterable by a gate
    // selecting passed = false); existence is rowCountAtLeast's job
    val empty = t.filter(lit(false))
    val out = Checks.run(empty, Seq(
      Checks.rowCountAtLeast(1.0),
      Checks.completeness("s", 1.0),
      Checks.uniqueness("id", 1.0),
      Checks.minValue("v", 0.0),
      Checks.maxValue("v", 25.0),
      Checks.inSet("lang", Seq("en"), 1.0),
      Checks.matches("lang", "^[a-z]{2}$", 1.0)
    )).select("check_name", "passed").as[(String, Boolean)].collect().toMap
    assert(out("row_count") === false) // the one that must fire
    assert(out("completeness") && out("uniqueness") && out("min_value") &&
      out("max_value") && out("in_set") && out("matches"))
    // all-null column: no value exists to violate a bound either
    val allNull = Seq((1L, None: Option[Double])).toDF("id", "v")
    val mn = Checks.run(allNull, Seq(Checks.minValue("v", 0.0)))
      .select("passed").as[Boolean].collect()
    assert(mn === Array(true))
    // referential over an empty child: nothing can be an orphan
    val ref = Checks.referential(empty, "id", t, "id", 1.0)
      .select("metric", "passed").as[(Double, Boolean)].collect()
    assert(ref === Array((1.0, true)))
  }

  test("whole suite is one scan of the table") {
    val plan = Checks.run(t, Seq(
      Checks.rowCountAtLeast(1.0),
      Checks.completeness("s", 1.0),
      Checks.minValue("v", 0.0),
      Checks.inSet("lang", Seq("en"), 0.5)
    )).queryExecution.executedPlan.toString
    // no uniqueness => no expand; a single LocalTableScan/scan feeds one
    // aggregate — no join, no union of per-check scans
    assert(!plan.contains("Union"))
    assert(plan.linesIterator.count(_.trim.startsWith("+- LocalTableScan")) === 1)
  }

  test("qualityMonitorStream reports per-batch and matches the batch suite") {
    implicit val sqlCtx = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Double)]
    val suite = Seq(Checks.rowCountAtLeast(2.0), Checks.minValue("_2", 0.0))
    val got = scala.collection.mutable.ArrayBuffer.empty[(Long, String, Double, Boolean)]
    val q = graft.streaming.Streaming.qualityMonitorStream(
      mem.toDF(), suite) { rep =>
      got ++= rep.collect().map(r => (r.getAs[Long]("batch_id"),
        r.getAs[String]("check_name"), r.getAs[Double]("metric"),
        r.getAs[Boolean]("passed")))
      ()
    }
    try {
      mem.addData((1L, 5.0), (2L, 7.0))
      q.processAllAvailable()
      mem.addData((3L, -1.0))
      q.processAllAvailable()
      val byBatch = got.groupBy(_._1).view.mapValues(_.map(t => (t._2, t._3, t._4)).toSet).toMap
      assert(byBatch.size === 2)
      val Seq(b0, b1) = byBatch.keys.toSeq.sorted
      // batch parity: each batch's report equals Checks.run on its rows
      assert(byBatch(b0) === Set(("row_count", 2.0, true), ("min_value", 5.0, true)))
      assert(byBatch(b1) === Set(("row_count", 1.0, false), ("min_value", -1.0, false)))
    } finally q.stop()
  }

  test("referential counts orphans and null child keys against the fraction") {
    val child = Seq(Some(1L), Some(1L), Some(9L), None).toDF("k")
    val parent = Seq(1L, 2L).toDF("p")
    val r = Checks.referential(child, "k", parent, "p", 1.0).head()
    assert(r.getAs[Double]("metric") === 0.5) // 2 of 4 resolve
    assert(!r.getAs[Boolean]("passed"))
    assert(r.getAs[String]("col_name") === "k")
  }
}
