package graft
import org.apache.spark.sql.SparkSession
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.01"
    for (q <- Seq("q1_pricing_summary", "j1_broadcast_join", "j2_sortmerge_join", "o1_topk_per_group", "t1_doc_stats")) {
      println(s"===== $q")
      val df = SparkEntry.queries(q)(spark, d)
      df.collect() // force AQE final plan
      println(df.queryExecution.executedPlan.toString.take(3500))
    }
    spark.stop()
  }
}
