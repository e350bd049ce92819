package graft

import org.apache.spark.sql.functions._
import graft.joins.Joins

class JoinsSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val big = (1L to 2000L).map(k => (k, s"row$k")).toDF("k", "payload")
  private lazy val keys = (1L to 2000L by 13).map(Tuple1(_)).toDF("j")

  test("bloomPruneLeftSemi equals the plain left-semi join") {
    val pruned = Joins.bloomPruneLeftSemi(big, keys, "k", "j", expectedItems = 1000L)
      .collect().map(_.getLong(0)).sorted
    val plain = big.join(keys, col("k") === col("j"), "leftsemi")
      .collect().map(_.getLong(0)).sorted
    assert(pruned.toSeq === plain.toSeq)
    assert(pruned.nonEmpty)
  }

  test("bloom probe runs in the big side's pre-join stage") {
    // parquet-backed input: over a LocalRelation the optimizer folds the
    // deterministic probe into the relation itself (still correct, but
    // invisible); a file scan keeps the Filter node observable.
    val dir = java.nio.file.Files.createTempDirectory("bloomjoin").toString
    big.write.mode("overwrite").parquet(s"$dir/big")
    val bigP = spark.read.parquet(s"$dir/big")
    val df = Joins.bloomPruneLeftSemi(bigP, keys, "k", "j", expectedItems = 1000L)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("graft_bloom_contains_long"),
      s"expected native bloom probe in plan:\n$plan")
    // the probe must sit BELOW the join (filtering its input), not above
    val probeIdx = plan.indexOf("graft_bloom_contains_long")
    val joinIdx = plan.toLowerCase.indexOf("join")
    assert(joinIdx >= 0 && joinIdx < probeIdx,
      "bloom probe should appear in the join's input subtree")
  }

  test("undersized expectedItems degrades fpp, never correctness") {
    val tiny = Joins.bloomPruneLeftSemi(big, keys, "k", "j",
      expectedItems = 4L, fpp = 0.5) // grossly undersized + sloppy
      .collect().map(_.getLong(0)).sorted
    val plain = big.join(keys, col("k") === col("j"), "leftsemi")
      .collect().map(_.getLong(0)).sorted
    assert(tiny.toSeq === plain.toSeq)
  }

  test("bloomPruneLeftSemi works when both sides name the key identically") {
    // with bigKey == smallKey an unqualified join condition would be
    // ambiguous (AnalysisException) — the aliased small side must not be
    val sameName = keys.withColumnRenamed("j", "k")
    val pruned = Joins.bloomPruneLeftSemi(big, sameName, "k", "k", 1000L)
      .collect().map(_.getLong(0)).sorted
    val plain = big.join(keys, col("k") === col("j"), "leftsemi")
      .collect().map(_.getLong(0)).sorted
    assert(pruned.toSeq === plain.toSeq)
  }

  test("null big-side keys are dropped like the semi-join drops them") {
    val withNulls = big.withColumn("k", when(col("k") % 7 === 0, lit(null)).otherwise(col("k")))
    val pruned = Joins.bloomPruneLeftSemi(withNulls, keys, "k", "j", 1000L)
      .collect().map(_.getLong(0)).sorted
    val plain = withNulls.join(keys, col("k") === col("j"), "leftsemi")
      .collect().map(_.getLong(0)).sorted
    assert(pruned.toSeq === plain.toSeq)
  }
}
