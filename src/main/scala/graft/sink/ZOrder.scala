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
                    numFiles: Int, bits: Int = 8,
                    mode: String = "overwrite"): Unit = {
    val cuts = quantileCuts(df, cols, bits)
    withZValue(df, cols, cuts, bits)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode(mode).parquet(path)
  }
}

/** A GROWING z-ordered parquet table — the append/compact maintenance
  * pair the layout needs once data arrives in batches (the
  * [[graft.dedup.HashLedger]] append/compact discipline applied to
  * layout): [[append]] lands each batch as its own z-ordered files
  * (batch-local curve — cheap, one small shuffle per batch, no
  * touch of existing files), which keeps per-file min-max spans tight
  * WITHIN a batch but lets cross-batch overlap accumulate — after a
  * year of daily batches every range query touches one file per day.
  * [[compact]] is the periodic layout pass that re-clusters the WHOLE
  * table onto one global curve (the OPTIMIZE ZORDER shape): reads
  * everything once, one range shuffle, two-rename directory swap — after
  * it, file count and per-file spans are as if the table had been
  * written z-ordered in one shot (gated in ZOrderSpec).
  */
object ZOrderTable {

  /** Append `df` as z-ordered files under `path` (batch-local quantile
    * cuts — the batch's own value distribution, which is what a daily
    * partition's readers filter by). Existing files are never touched.
    *
    * Runs [[recover]] first: without it, a crash between [[compact]]'s
    * two swap renames (table parked at `__precompact`, live path
    * absent) followed by the next day's append would re-create the
    * live path holding ONE batch — and the next compact's
    * stale-recovery-copy rule (old + live both present → drop old)
    * would then delete the parked full table silently.
    */
  def append(df: DataFrame, cols: Seq[String], path: String,
             numFiles: Int, bits: Int = 8): Unit = {
    recover(df.sparkSession, path)
    ZOrder.writeZOrdered(df, cols, path, numFiles, bits, mode = "append")
  }

  /** Restore a table a crashed [[compact]] left parked at
    * `__precompact` with no live path — the roll-back half of compact's
    * own preamble, exposed to every entry point that writes or reads
    * the table outside compact.
    */
  def recover(spark: org.apache.spark.sql.SparkSession, path: String): Unit = {
    val conf = spark.sessionState.newHadoopConf()
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(conf)
    val old = new org.apache.hadoop.fs.Path(path + "__precompact")
    if (fs.exists(old) && !fs.exists(p)) {
      if (!fs.rename(old, p))
        throw new java.io.IOException(s"compact recovery failed: $old -> $p")
    }
  }

  /** Re-cluster the whole table onto one global curve and swap it in
    * (write beside, rename live aside, rename new in, drop the old):
    * global quantile cuts, one range shuffle, `numFiles` output files.
    * Rows are preserved exactly — compaction is a permutation, like
    * every other maintenance pass here. The swap is two metadata
    * renames, NOT one atomic operation: a crash between them leaves the
    * table at `path + "__precompact"` (rename it back); concurrent
    * readers can observe a path-not-found during that instant — run
    * compact in the table's maintenance window, like OPTIMIZE.
    */
  def compact(spark: org.apache.spark.sql.SparkSession, path: String,
              cols: Seq[String], numFiles: Int, bits: Int = 8): Unit = {
    val conf = spark.sessionState.newHadoopConf()
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(conf)
    val tmp = new org.apache.hadoop.fs.Path(path + "__compacting")
    val old = new org.apache.hadoop.fs.Path(path + "__precompact")
    if (fs.exists(tmp)) fs.delete(tmp, true)
    // crash-recovery BEFORE cleanup: if a prior compact died between the
    // two swap renames, the table's only copy lives at `old` — restore it
    // rather than deleting it (the scaladoc's recovery promise, automated).
    // `old` is a stale recovery copy (safe to drop) ONLY when the live
    // path also exists.
    if (fs.exists(old)) {
      if (!fs.exists(p)) {
        if (!fs.rename(old, p))
          throw new java.io.IOException(
            s"compact recovery failed: $old -> $p")
      } else fs.delete(old, true)
    }
    ZOrder.writeZOrdered(spark.read.parquet(path), cols, tmp.toString,
      numFiles, bits)
    // two renames, never delete-then-rename: a crash between a delete
    // and the swap would leave NO live table path. After rename(p, old)
    // the worst crash point leaves the table recoverable at `old`
    // (rename back), and the live path is absent only for the gap
    // between two metadata renames — not for the whole rewrite
    if (!fs.rename(p, old))
      throw new java.io.IOException(s"compact stage failed: $p -> $old")
    if (!fs.rename(tmp, p)) {
      fs.rename(old, p) // restore the original table before failing
      throw new java.io.IOException(s"compact swap failed: $tmp -> $p")
    }
    fs.delete(old, true)
  }
}

/** Build-or-reuse a persisted Z-ORDERED parquet mirror of one source
  * table — the layout-maintenance artifact of [[ZOrder.writeZOrdered]]
  * under the same discipline as [[BucketedMirror]] (pay the clustering
  * shuffle once, every later multi-column range scan prunes) and the
  * index stores (content-stamped key, supersede-on-rebuild, reuse never
  * scans the source). Where the bucketed mirror serves JOIN co-location
  * on one key, this serves RANGE-PREDICATE pruning on k columns.
  */
object ZOrderMirror {

  /** Bump when the layout derivation changes: reuse is keyed by source
    * content, so a mirror persisted by OLDER layout code would
    * otherwise silently serve the stale file order.
    */
  private val version = "v2" // v2: bits + unambiguous cols in the key

  /** Files for a source of `bytes`: one ~[[BucketedMirror.targetBucketBytes]]
    * file per chunk, floored at 16 (local[32]-shape parallelism at test
    * SF) — a 10 TB table lands at ~40 k files, each spanning a bounded
    * z-range of every clustered column.
    */
  def filesFor(bytes: Long): Int =
    math.min(1L << 20, math.max(16L,
      (bytes + BucketedMirror.targetBucketBytes - 1) / BucketedMirror.targetBucketBytes)).toInt

  def root(dir: String, table: String, cols: Seq[String], bits: Int = 8,
           hadoopConf: org.apache.hadoop.conf.Configuration =
             new org.apache.hadoop.conf.Configuration()): java.io.File = {
    val src = new org.apache.hadoop.fs.Path(dir, s"$table.parquet").toString
    // the LAYOUT GEOMETRY is part of the key (the PqIndex/NameIndex
    // discipline): a warm call with different `bits` must rebuild, not
    // silently serve coarser buckets; cols are length-prefixed so
    // Seq("a_b","c") and Seq("a","b_c") cannot alias one directory
    val colKey = cols.map(c => s"${c.length}~$c").mkString("_")
    new java.io.File(
      s"target/zorder_mirror/$version/${graft.ArtifactKey.stamped(src, hadoopConf)}/" +
        s"b$bits/$colKey")
      .getAbsoluteFile
  }

  /** Delete the persisted mirror (forces the next ensure to rebuild). */
  def drop(dir: String, table: String, cols: Seq[String], bits: Int = 8): Unit =
    graft.ArtifactKey.rmRecursive(root(dir, table, cols, bits))

  /** The z-ordered mirror of `<dir>/<table>.parquet` clustered on
    * `cols`; builds on the cold path only (quantile pass + one range
    * shuffle + sorted write), then every call is a plain parquet read
    * whose file/row-group min-max stats serve range predicates on ANY
    * of `cols`.
    */
  def ensure(spark: org.apache.spark.sql.SparkSession, dir: String, table: String,
             cols: Seq[String], bits: Int = 8): DataFrame = synchronized {
    val conf = spark.sessionState.newHadoopConf()
    val base = root(dir, table, cols, bits, conf)
    if (!new java.io.File(base, "_SUCCESS").isFile) {
      val src = new org.apache.hadoop.fs.Path(dir, s"$table.parquet")
      val fs = src.getFileSystem(conf)
      require(fs.exists(src), s"z-order mirror source does not exist: $src")
      // superseded = older content stamps of the same source table
      // (siblings of the stamped dir); geometry/column variants coexist
      // inside (base = <stamp>/b<bits>/<cols>)
      val stampedDir = base.getParentFile.getParentFile
      graft.ArtifactKey.dropSuperseded(
        stampedDir.getParentFile,
        graft.ArtifactKey.pathKey(src.toString) + "_", stampedDir.getName)
      val df = spark.read.parquet(src.toString)
      ZOrder.writeZOrdered(df, cols, base.getPath,
        filesFor(fs.getContentSummary(src).getLength), bits)
    }
    // memoized handle ([[graft.ReadCache]]): a warm mirror read skips the
    // per-read listing + schema-inference job; any rewrite misses
    graft.ReadCache.parquetLocal(spark, base)
  }
}
