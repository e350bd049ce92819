package graft.sink

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._
import graft.analyze.Analytics

/** Output surface of the reference (SURVEY §2.1 S5/S8/S9/S10/S12),
  * re-expressed as Spark writers. The canonical store is partitioned
  * parquet — `partitionBy(city, date)` is the scalable analog of the
  * reference's SQLite B-tree indexes on (city, date) (load.py:143-144):
  * partition pruning serves the same point lookups without an index
  * structure, and works at any number of files.
  */
object Sinks {

  /** S5/S10: CSV report sink (header, overwrite). The reference writes one
    * timestamped file (load.py:157-209); under Spark the path is a
    * directory and file-per-partition — single-file output via
    * coalesce(1) only when the result is known-small (summaries).
    */
  def writeCsv(df: DataFrame, path: String, singleFile: Boolean = false): Unit = {
    val d = if (singleFile) df.coalesce(1) else df
    d.write.mode(SaveMode.Overwrite).option("header", "true").csv(path)
  }

  /** S10 side summary: per-group multi-agg × round(2) (load.py:188-196). */
  def writeSummaryCsv(df: DataFrame, key: String, values: Seq[String], path: String): Unit =
    writeCsv(Analytics.summaryRounded(df, key, values), path, singleFile = true)

  /** S8: JSON-lines records sink (load.py:70-105's to_dict(records)). */
  def writeJson(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).json(path)

  /** S9 analog: partitioned parquet replaces the SQLite table + indexes.
    * Literal JDBC parity stays available via `df.write.jdbc(url, table,
    * props)` when a JDBC URL exists; partition pruning on (city, date) is
    * the index replacement that scales.
    */
  def writePartitioned(df: DataFrame, path: String,
                       partitionCols: Seq[String] = Seq("city", "date")): Unit =
    df.write.mode(SaveMode.Overwrite).partitionBy(partitionCols: _*).parquet(path)

  /** S12: nested analysis-result JSON (analyze.py:292-306) — one JSON
    * object per group assembled with struct/to_json, written as JSON lines.
    * The reference's single nested dict is the collect()-free equivalent of
    * grouping the whole result set; keys stay columns so downstream reads
    * remain queryable.
    */
  def writeAnalysisJson(df: DataFrame, keyCol: String, path: String): Unit =
    df.select(col(keyCol), to_json(struct(df.columns.filter(_ != keyCol).map(col): _*)).as("result"))
      .write.mode(SaveMode.Overwrite).json(path)
}
