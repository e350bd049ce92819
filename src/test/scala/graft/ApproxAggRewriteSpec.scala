package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.GraftOptimizations

class ApproxAggRewriteSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val df = (1 to 1000).map(_.toDouble).toDF("v")

  private def optimizedPlan(q: org.apache.spark.sql.DataFrame): String =
    q.queryExecution.optimizedPlan.toString

  test("flag off: exact median/percentile/count-distinct untouched") {
    GraftOptimizations.install(spark)
    spark.conf.set("spark.graft.approx.aggregates", "false")
    val plan = optimizedPlan(df.agg(median($"v"), percentile($"v", lit(0.95)),
      countDistinct($"v")))
    assert(plan.contains("median") && !plan.contains("percentile_approx"))
    assert(plan.contains("count(distinct"))
  }

  test("flag on: rewritten to sketches, results stay sane") {
    GraftOptimizations.install(spark)
    spark.conf.set("spark.graft.approx.aggregates", "true")
    try {
      val q = df.agg(
        median($"v").as("med"),
        percentile($"v", lit(0.95)).as("p95"),
        countDistinct($"v").as("nd"))
      val plan = optimizedPlan(q)
      assert(plan.contains("percentile_approx"))
      assert(plan.contains("approx_count_distinct"))
      assert(!plan.contains("count(distinct"))
      val r = q.collect()(0)
      // sketch answers are approximate but tightly bounded on 1..1000
      assert(math.abs(r.getDouble(0) - 500.5) < 10)
      assert(math.abs(r.getDouble(1) - 950.0) < 15)
      assert(math.abs(r.getLong(2) - 1000L) < 200) // HLL++ default rsd 5%
    } finally spark.conf.set("spark.graft.approx.aggregates", "false")
  }

  test("schema is unchanged by the rewrite (Double in, Double out)") {
    GraftOptimizations.install(spark)
    spark.conf.set("spark.graft.approx.aggregates", "true")
    try {
      val exact = df.agg(median($"v").as("m")).schema
      spark.conf.set("spark.graft.approx.aggregates", "false")
      val approxOff = df.agg(median($"v").as("m")).schema
      assert(exact === approxOff)
    } finally spark.conf.set("spark.graft.approx.aggregates", "false")
  }
}
