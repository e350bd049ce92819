package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** S6/S7/O5 (analyze.py:69-100, load.py:53-67): "latest processed file by
  * mtime" resolution. In the reference every consumer re-finds the newest
  * CSV; here it's one connector-level helper on the Hadoop FileSystem API,
  * so it works on any store Spark can read (local, HDFS, S3A...).
  *
  * This is deliberately file-level, driver-side logic — listing a directory
  * is O(files) metadata work, not a data job. The scalable alternative
  * (partition by ingest batch + `filter($"batch" === max)`) is documented
  * in SURVEY §2.2 P7; this helper exists for literal reference parity.
  */
object LatestSnapshot {

  /** Newest file under `dir` matching `suffix`, by modification time;
    * deterministic tie-break on path name.
    */
  def latestFile(spark: SparkSession, dir: String, suffix: String = ""): Option[String] =
    latestEntry(spark, dir, suffix, dirs = false)

  /** Newest sub-DIRECTORY under `dir` — Spark writes each parquet/CSV
    * snapshot as a directory of part files, so snapshot resolution must
    * look for directories, not files.
    */
  def latestDir(spark: SparkSession, dir: String, suffix: String = ""): Option[String] =
    latestEntry(spark, dir, suffix, dirs = true)

  private def latestEntry(spark: SparkSession, dir: String, suffix: String,
                          dirs: Boolean): Option[String] = {
    val path = new Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(path)) return None
    val entries = fs.listStatus(path)
      .filter(e => if (dirs) e.isDirectory else e.isFile)
      .filter(_.getPath.getName.endsWith(suffix))
    if (entries.isEmpty) None
    else Some(entries.maxBy(e => (e.getModificationTime, e.getPath.toString)).getPath.toString)
  }

  /** S6: read the latest CSV snapshot with an explicit schema (the
    * reference re-parses timestamp/date dtypes after every read,
    * analyze.py:91-94 — schema-first reads make that repair unnecessary).
    */
  def readLatestCsv(spark: SparkSession, dir: String, schema: StructType): Option[DataFrame] =
    latestFile(spark, dir, ".csv").map { f =>
      spark.read.schema(schema).option("header", "true").csv(f)
    }

  /** Latest parquet snapshot: each snapshot is a DIRECTORY of part files
    * (the shape `df.write.parquet` produces); reading the directory picks
    * up every part.
    */
  def readLatestParquet(spark: SparkSession, dir: String): Option[DataFrame] =
    latestDir(spark, dir).map(spark.read.parquet(_))
}
