package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Gates for the persisted transition-edge artifact
  * ([[graft.graph.EdgeIndex]]): indexed == inline (the g-family's rows
  * are IDENTICAL through the index — the derivation is deterministic and
  * the index is just where it lives), warm reuse never evaluates the
  * derivation or rewrites files, catalog loss re-attaches the on-disk
  * files without a rebuild, and consumers ride the bucketed layout
  * (a `src` aggregation plans no exchange).
  */
class EdgeIndexSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  private def edgeRows(df: DataFrame): Set[(Long, Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("ensure: cold build == inline derivation; warm ensure evaluates nothing " +
       "and rewrites nothing; catalog loss re-attaches without rebuild") {
    import graft.graph.EdgeIndex
    val inline = SparkEntry.graphEdgesInline(spark, dir)
    EdgeIndex.drop(spark, dir, "spec")
    val idx1 = EdgeIndex.ensure(spark, dir, "spec", inline)
    val expected = edgeRows(inline)
    assert(edgeRows(idx1) === expected, "indexed rows must equal the inline derivation")
    // locate the persisted _SUCCESS through the catalog table's files
    val success = new java.io.File(
      new java.io.File(idx1.inputFiles.head.stripPrefix("file:")).getParentFile,
      "_SUCCESS")
    assert(success.isFile, s"expected _SUCCESS beside ${idx1.inputFiles.head}")
    val stamp = success.lastModified
    val idx2 = EdgeIndex.ensure(spark, dir, "spec",
      { fail("warm ensure must not evaluate the edge derivation"); inline })
    assert(success.lastModified === stamp, "warm ensure must not rewrite the index")
    assert(edgeRows(idx2) === expected)
    // a NEW session (simulated: drop only the catalog entry, keep files)
    // must re-attach the files with the bucket spec — never re-derive
    val names = spark.sql("SHOW TABLES LIKE 'graft_edge_index_spec_*'")
      .collect().map(_.getAs[String]("tableName"))
    assert(names.length === 1, s"expected one catalog entry, got ${names.mkString(",")}")
    spark.sql(s"DROP TABLE ${names.head}")
    val idx3 = EdgeIndex.ensure(spark, dir, "spec",
      { fail("re-attach must not evaluate the edge derivation"); inline })
    assert(success.lastModified === stamp, "re-attach must not rewrite the files")
    assert(edgeRows(idx3) === expected)
    EdgeIndex.drop(spark, dir, "spec")
  }

  test("consumers ride the bucketed layout: a src aggregation over the index " +
       "plans no exchange, and pageRank through the index equals inline") {
    import graft.graph.EdgeIndex
    val inline = SparkEntry.graphEdgesInline(spark, dir)
    EdgeIndex.drop(spark, dir, "spec2")
    val idx = EdgeIndex.ensure(spark, dir, "spec2", inline)
    val agg = idx.groupBy("src").agg(sum("n_trans").as("t"))
    agg.collect()
    assert(!agg.queryExecution.executedPlan.toString.contains("Exchange"),
      "src aggregation over the bucketed index must not shuffle")
    def ranks(e: DataFrame) = graft.graph.Graph.pageRank(e, iters = 3)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(ranks(idx) === ranks(inline),
      "pageRank through the index must be bit-identical to inline")
    EdgeIndex.drop(spark, dir, "spec2")
  }
}
