package graft.er

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Build-or-reuse the persisted token-block index of a STANDING name
  * universe — er3's warm path (the LshIndex/HashLedger discipline
  * applied to entity names): the standing side of
  * [[EntityResolution.incrementalEntityMatches]] re-derives
  * (token → name) pairs and re-counts the occupancy cap on every call,
  * which at a daily cadence re-reads the whole standing table per
  * batch. This persists the CAPPED token→name frame once per standing
  * snapshot; every later conformance call is a parquet read of the
  * narrow (token, name) pairs.
  *
  * Artifact key: content-stamped source table + `subset` (WHICH slice
  * of the table is the standing universe — two subsets must not share
  * an index) + the occupancy cap (a different cap is a different
  * candidate universe, the PqIndex-geometry lesson). Supersede-on-
  * rebuild drops older content stamps of the same source.
  */
object NameIndex {

  /** Bump when the derivation (tokenization, cap semantics) changes. */
  private val version = "v1"

  def root(dir: String, table: String, subset: String,
           blockCap: Int = EntityResolution.defaultBlockCap,
           hadoopConf: org.apache.hadoop.conf.Configuration =
             new org.apache.hadoop.conf.Configuration()): java.io.File = {
    val src = new org.apache.hadoop.fs.Path(dir, s"$table.parquet").toString
    new java.io.File(
      s"target/name_index/$version/${graft.ArtifactKey.stamped(src, hadoopConf)}/" +
        s"${subset}_c$blockCap")
      .getAbsoluteFile
  }

  /** Delete the persisted index (forces the next ensure to rebuild). */
  def drop(dir: String, table: String, subset: String,
           blockCap: Int = EntityResolution.defaultBlockCap): Unit =
    graft.ArtifactKey.rmRecursive(root(dir, table, subset, blockCap))

  /** The capped (token, name) frame for `standing`'s distinct names.
    * `standing` is only evaluated (and scanned) on a cold build.
    */
  def ensure(spark: SparkSession, dir: String, table: String, subset: String,
             standing: => DataFrame, nameCol: String,
             blockCap: Int = EntityResolution.defaultBlockCap): DataFrame = synchronized {
    val conf = spark.sessionState.newHadoopConf()
    val base = root(dir, table, subset, blockCap, conf)
    if (!new java.io.File(base, "_SUCCESS").isFile) {
      val stampedDir = base.getParentFile
      graft.ArtifactKey.dropSuperseded(
        stampedDir.getParentFile,
        graft.ArtifactKey.pathKey(
          new org.apache.hadoop.fs.Path(dir, s"$table.parquet").toString) + "_",
        stampedDir.getName)
      EntityResolution.standingTokenBlocks(standing, nameCol, blockCap)
        .write.mode("overwrite").parquet(base.getPath)
    }
    spark.read.parquet(base.getPath)
  }
}
