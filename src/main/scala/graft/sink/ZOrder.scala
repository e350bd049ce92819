package graft.sink

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) clustered parquet layout — the
  * multi-dimensional file-pruning sibling of [[Sinks.writePartitioned]]
  * (coarse directory pruning on ONE low-cardinality column) and
  * [[Sinks.writeBucketed]] (join co-location): cluster the file order
  * on the interleaved rank-bucket bits of k columns so parquet
  * file/row-group min-max statistics prune range predicates on ANY of
  * them, not only the leading sort key.
  *
  * Why this matters at 100 TB: a linear sort on (a, b) packs `a`
  * tightly but leaves every file's `b` range spanning the whole domain
  * — a reader filtering on `b` scans everything. The Z-curve trades a
  * little locality on `a` for bounded ranges on BOTH columns per file
  * (the Delta Lake / Databricks OPTIMIZE ZORDER layout, reimplemented
  * on open Spark APIs): a point-range query on either column touches
  * ~N^((k−1)/k) of the files instead of all of them. This is a LAYOUT
  * MAINTENANCE pass — run it where a compaction would run (the
  * [[graft.dedup.HashLedger.compact]] seam), one shuffle + sorted
  * write, and every later scan pays less.
  *
  * Mechanics: per column, 2^bits−1 approximate quantile cut points
  * (one driver-held vector each — rank-bucketing keeps skewed columns
  * from collapsing onto a few buckets, which would gut the interleave);
  * per row, one native codegen kernel
  * ([[org.apache.spark.sql.graft.ZValueExpr]]) buckets the k values
  * and interleaves their bits into a long; one `repartitionByRange` +
  * within-partition sort on that long lays files out along the curve.
  * The z column itself is dropped before the write — the layout IS the
  * artifact, readers need no extra column.
  */
object ZOrder {

  /** Per-column quantile cut points for `bits`-bit rank bucketing:
    * 2^bits − 1 approximate quantiles (relativeError 1/2^(bits+2) — a
    * fraction of one bucket width, and rank-SKEW from approximation
    * only shifts bucket boundaries, never breaks the interleave).
    * Cut vectors are deduplicated ascending; heavily repeated values
    * simply occupy fewer distinct buckets.
    */
  def quantileCuts(df: DataFrame, cols: Seq[String], bits: Int = 8): Seq[Seq[Double]] = {
    require(cols.nonEmpty, "z-order needs at least one clustering column")
    val probs = (1 until (1 << bits)).map(_.toDouble / (1 << bits)).toArray
    val doubled = df.select(cols.map(c => col(c).cast("double").as(c)): _*)
    doubled.stat.approxQuantile(cols.toArray, probs, 1.0 / (1 << (bits + 2)))
      .map(_.distinct.sorted.toSeq).toSeq
  }

  /** `df` plus the interleaved z-value of `cols` as `zCol`. Exposed for
    * the spec and for callers that want the curve position without the
    * write (e.g. range-bucket diagnostics).
    */
  def withZValue(df: DataFrame, cols: Seq[String], cuts: Seq[Seq[Double]],
                 bits: Int = 8, zCol: String = "__z"): DataFrame =
    df.withColumn(zCol,
      org.apache.spark.sql.graft.ZOrderFunctions.zValueNative(
        array(cols.map(c => col(c).cast("double")): _*), cuts, bits))

  /** Write `df` as `numFiles` parquet files clustered along the
    * Z-curve of `cols`. One quantile pass (driver-held cuts), one
    * range shuffle on the z-value, one sorted write — rows are
    * preserved exactly (the layout is a permutation).
    */
  def writeZOrdered(df: DataFrame, cols: Seq[String], path: String,
                    numFiles: Int, bits: Int = 8): Unit = {
    val cuts = quantileCuts(df, cols, bits)
    withZValue(df, cols, cuts, bits)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }
}
