package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Parquet table access for the driver testdata star schema (TESTDATA.md).
  *
  * All readers take the scale-factor directory at call time so the same
  * query definition runs at sf0.001 (smoke), sf0.01 (oracle) and sf0.1
  * (bench) — and, unchanged, on a multi-TB partitioned table on a real
  * cluster: `spark.read.parquet` of a directory tree prunes partitions and
  * pushes filters/projections into the scan, so nothing here assumes a
  * single file.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** One reader handle per (session, table, content stamp): a bare
    * `spark.read.parquet` re-pays listing + footer schema inference on
    * every query construction (~50-100 ms of driver/scheduler time);
    * [[ReadCache]] re-checks the content stamp per access so a
    * regenerated table still misses. Every action over the handle scans
    * the parquet files as before.
    */
  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    ReadCache.parquetAny(spark, s"$dir/$name.parquet")

  /** The events table's `ts` physical encoding has varied across testdata
    * generations — TIMESTAMP(NANOS) (which Spark only reads as a raw long
    * via `nanosAsLong`), then TIMESTAMP(MICROS, isAdjustedToUTC=false)
    * (which Spark reads as TIMESTAMP_NTZ). Normalize whatever the scan
    * yields to session-zone TimestampType so every downstream query sees
    * one stable schema. The conf is set before the read because with a
    * nanos-encoded file the scan itself throws [PARQUET_TYPE_ILLEGAL]
    * without it; it is a no-op for micros files.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeEventsTs(apply(spark, dir, "events"))
  }

  /** Rebuild `ts` as session-zone TimestampType from whichever type the
    * parquet scan produced. Works on batch and streaming DataFrames alike.
    *  - LongType (nanosAsLong): exact integer `div 1000` to micros — a
    *    double division would lose precision at 1.7e18 ns.
    *  - TIMESTAMP_NTZ: cast to TimestampType. The session timezone is
    *    pinned to UTC everywhere (Bench/Verify/specs), so the wall-clock
    *    value is preserved bit-for-bit and the DuckDB oracle (which reads
    *    the column natively) agrees.
    *  - TimestampType: already normalized.
    */
  def normalizeEventsTs(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        // the cast preserves the wall-clock value only when the session
        // zone is UTC (the harness contract everywhere: Bench/Verify/
        // specs/probes); in any other zone it would silently shift every
        // timestamp by the zone offset and diverge from the UTC-reading
        // oracle — fail fast instead
        val tz = df.sparkSession.sessionState.conf.sessionLocalTimeZone
        require(tz == "UTC",
          s"events.ts is TIMESTAMP_NTZ; normalizing it requires spark.sql.session.timeZone=UTC (got $tz)")
        df.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case org.apache.spark.sql.types.TimestampType => df
      case other =>
        throw new IllegalStateException(
          s"events.ts has unsupported scan type $other; expected LONG (nanosAsLong), TIMESTAMP_NTZ or TIMESTAMP")
    }
  def lineitem(spark: SparkSession, dir: String): DataFrame   = apply(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame     = apply(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame   = apply(spark, dir, "customer")
  def nation(spark: SparkSession, dir: String): DataFrame     = apply(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame     = apply(spark, dir, "region")
  def supplier(spark: SparkSession, dir: String): DataFrame   = apply(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame       = apply(spark, dir, "part")
  /** documents/embeddings are CPU-dense per-row workloads (shingling,
    * hashing, vector math), and at test SFs each arrives as ONE parquet
    * file with ONE row group → one busy core. `spread` widens to the
    * cluster's parallelism so per-row work distributes.
    *
    * Why a repartition and not a smaller `spark.sql.files.maxPartitionBytes`:
    * parquet assigns a row group to whichever byte-range split contains its
    * midpoint, so splitting a single-row-group file just yields N-1 empty
    * partitions — only a shuffle can spread it. The decision comes from
    * driver-side file metadata (a cheap FS listing), not from `df.rdd`,
    * which would force physical planning outside the optimized path. At
    * real scale (total bytes ≥ parallelism × maxPartitionBytes, i.e. the
    * scan already produces enough splits) this is a no-op — the exchange
    * exists only for degenerate tiny inputs.
    */
  private def spread(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = apply(spark, dir, name)
    val target = spark.sparkContext.defaultParallelism.toLong
    val path = new org.apache.hadoop.fs.Path(s"$dir/$name.parquet")
    val fs = path.getFileSystem(spark.sessionState.newHadoopConf())
    val totalBytes =
      if (fs.exists(path)) fs.getContentSummary(path).getLength else Long.MaxValue
    val maxSplit = spark.sessionState.conf.filesMaxPartitionBytes
    if (totalBytes >= target * maxSplit) df else df.repartition(target.toInt)
  }
  def documents(spark: SparkSession, dir: String): DataFrame  = spread(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = spread(spark, dir, "embeddings")
}
