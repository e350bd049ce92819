package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-growth probe: measures how the registered event/document queries
  * behave when the sf0.1 testdata is replicated `factor`× (default 10) —
  * the closest this sandbox gets to sf1 evidence, since /root/testdata
  * tops out at sf0.1 and is read-only.
  *
  * Upscale semantics (deliberate, documented in docs/SCALE_PROBE.md):
  *  - events: replicas get offset event_ids but KEEP user_id and ts, so
  *    per-user event density grows factor× — the stress a range window /
  *    sessionization actually feels as a corpus grows.
  *  - documents: replicas get offset doc_ids but IDENTICAL text, so the
  *    duplicate rate grows factor× — the dedup operators' real production
  *    shape (a larger crawl has more duplicates, not more distinct docs).
  *
  * Each query is timed cold in one JVM, scaled dir vs sf0.1, same
  * local[cpus] session. Output: one JSON line + target/scale_probe.json.
  */
object ScaleProbe {

  /** event/document queries only — the probe does not upscale the TPC-H
    * star or the embeddings.
    */
  val probeQueries: Seq[String] = Seq(
    "a2_group_agg", "a4_daily_agg", "w8_sessionize", "w9_range_rolling",
    "c1_two_pass_clean", "d2_exact_dedup", "d6_curation_funnel",
    "d7_hash_split", "d9_source_cap", "t3_quality_score")

  def generate(spark: SparkSession, src: String, out: String, factor: Int): Unit = {
    val fs = new org.apache.hadoop.fs.Path(out)
      .getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(new org.apache.hadoop.fs.Path(s"$out/_DONE"))) return
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // events: ts stays a raw nanos long (Tables.events handles either)
    val ev = spark.read.parquet(s"$src/events.parquet")
    val evMax = ev.agg(max("event_id")).collect()(0).getLong(0) + 1
    val evScaled = spark.range(factor).crossJoin(ev)
      .withColumn("event_id", col("event_id") + col("id") * evMax)
      .drop("id")
    evScaled.repartition(32).write.mode("overwrite").parquet(s"$out/events.parquet")
    val docs = spark.read.parquet(s"$src/documents.parquet")
    val docMax = docs.agg(max("doc_id")).collect()(0).getLong(0) + 1
    val docScaled = spark.range(factor).crossJoin(docs)
      .withColumn("doc_id", col("doc_id") + col("id") * docMax)
      .drop("id")
    docScaled.repartition(32).write.mode("overwrite").parquet(s"$out/documents.parquet")
    fs.create(new org.apache.hadoop.fs.Path(s"$out/_DONE")).close()
  }

  def main(args: Array[String]): Unit = {
    val factor = sys.env.getOrElse("SPARK_GRAFT_SCALE_FACTOR", "10").toInt
    val src = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val out = s"target/scale_probe/x$factor"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    generate(spark, src, out, factor)
    // min of two runs: the first pays one-time codegen compilation, which
    // at probe sizes can exceed the query itself and would masquerade as
    // super-linear growth
    def time(dir: String, name: String): Double = {
      def once: Double = {
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, dir).count()
        (System.nanoTime() - t0) / 1e9
      }
      math.min(once, once)
    }
    val rows = probeQueries.map { q =>
      val base = time(src, q)
      val scaled = time(out, q)
      (q, base, scaled)
    }
    val json = rows.map { case (q, b, s) =>
      f""""$q":{"base":$b%.3f,"scaled":$s%.3f,"ratio":${s / b}%.2f}"""
    }.mkString(s"""{"factor":$factor,"queries":{""", ",", "}}")
    println(json)
    java.nio.file.Files.write(java.nio.file.Paths.get("target/scale_probe.json"),
      json.getBytes("UTF-8"))
    spark.stop()
  }
}
