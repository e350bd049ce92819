package graft.sink

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Build-or-reuse bucketed mirrors of the fact tables — the storage-level
  * scale lever measured in docs/SCALE_PROBE.md (60 M⋈15 M lineitem⋈orders:
  * 3.70 s from plain parquet vs 1.73 s bucketed, 9 s one-time write):
  * pay the join-key shuffle ONCE at write time, and every later equi-join
  * or aggregation on that key plans ZERO exchanges. At 100 TB this is the
  * difference between re-shuffling the fact table per consumer query and
  * never shuffling it again; the reference's single-node analog is the
  * SQLite B-tree it builds once per load (/root/reference/src/load.py:
  * 143-144) so later lookups don't scan.
  *
  * Reuse ladder (cheapest first):
  *  1. the session catalog already has the mirror → reuse as-is;
  *  2. a previous JVM left the files on disk (`_SUCCESS` present) →
  *     re-register the external table over them with bucket-spec DDL —
  *     no rewrite;
  *  3. nothing exists → write it (the one-time shuffle+sort).
  *
  * The write `repartition(nBuckets, key)`s first: repartition's hash
  * partitioning is the same murmur3 `pmod(hash(key), n)` the bucket
  * file-writer uses, so every task holds exactly one bucket's rows and
  * each bucket lands in ONE file — which is what lets the scan publish
  * its in-bucket sort order and the downstream sort-merge join drop both
  * its Sort nodes, not just its exchanges. Mirrors are keyed by
  * (sf-dir, table), live under target/bucketed_mirror (untracked; `sbt
  * clean` or deleting the directory forces a rebuild), and mirror the
  * FULL table — one mirror serves every query on the key, and column
  * pruning works on bucketed scans like any parquet scan.
  */
object BucketedMirror {

  /** Buckets per mirror. At test SFs this over-partitions (16 buckets of
    * ~40 k rows at sf0.1) but matches local[32]'s parallelism shape; on a
    * real cluster size it as total-bytes / target-file-size (e.g. a
    * 10 TB fact table at 1 GB bucket files → ~10k buckets) — both join
    * sides must agree, which `ensure` guarantees by construction.
    */
  val defaultBuckets = 16

  private def tag(dir: String): String =
    new java.io.File(dir).getName.replaceAll("[^A-Za-z0-9_]", "_")

  /** Bucketed mirror of `<dir>/<table>.parquet` clustered+sorted on
    * `keyCol`; returns the catalog table, building or re-registering it
    * only when needed.
    */
  def ensure(spark: SparkSession, dir: String, table: String, keyCol: String,
             nBuckets: Int = defaultBuckets): DataFrame = {
    // since Spark 3.0 a bucketed scan only PUBLISHES its in-bucket sort
    // order behind this flag (off by default because buckets holding
    // several files are each locally sorted but not sorted as a
    // partition). Our writer guarantees one file per bucket by
    // construction (the repartition alignment above), and Spark
    // re-verifies that per scan even with the flag on — a bucket that
    // gained a second file just falls back to sorting, it cannot return
    // wrong rows. Without the flag every consumer SMJ re-sorts both
    // sides per query: n·log(n) per run of exactly the work the mirror
    // paid at write time.
    spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
    val name = s"graft_mirror_${table}_${tag(dir)}"
    if (!spark.catalog.tableExists(name)) {
      val path = new java.io.File(s"target/bucketed_mirror/${tag(dir)}/$table").getAbsolutePath
      if (new java.io.File(path, "_SUCCESS").isFile) {
        // files survive the session catalog; re-attach them with the
        // bucket spec they were written with (same code path below)
        val schema = spark.read.parquet(path).schema
        spark.sql(
          s"""CREATE TABLE $name (${schema.toDDL}) USING PARQUET
             |CLUSTERED BY ($keyCol) SORTED BY ($keyCol) INTO $nBuckets BUCKETS
             |LOCATION '$path'""".stripMargin)
      } else {
        Sinks.writeBucketed(
          graft.Tables(spark, dir, table).repartition(nBuckets, col(keyCol)),
          name, Seq(keyCol), nBuckets, path = Some(path), sortCols = Seq(keyCol))
      }
    }
    spark.table(name)
  }
}
