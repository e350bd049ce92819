package graft.er

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Build-or-reuse the persisted token-block index of a STANDING name
  * universe — er3's warm path (the LshIndex/HashLedger discipline
  * applied to entity names): the standing side of
  * [[EntityResolution.incrementalEntityMatches]] re-derives
  * (token → name) pairs and re-counts the occupancy cap on every call,
  * which at a daily cadence re-reads the whole standing table per
  * batch. This persists the token→name frame once per standing
  * snapshot; every later conformance call is a parquet read of the
  * narrow (token, name) pairs.
  *
  * v2 layout: the persisted frame is the UNCAPPED (__sname, __tok,
  * __occ) pair universe with the per-token occupancy denormalized on;
  * the blockCap filter applies AT READ (a codegen scan filter over the
  * narrow index — never a re-aggregation). That split is what makes
  * [[append]]'s EXACT cap re-derivation possible: a capped artifact
  * forgets the dropped tokens' pairs, so a token crossing the cap
  * across epochs could never match a rebuild.
  *
  * Artifact key: content-stamped source table + `subset` (WHICH slice
  * of the table is the standing universe — two subsets must not share
  * an index) + the occupancy cap (a different cap is a different
  * candidate universe, the PqIndex-geometry lesson). Supersede-on-
  * rebuild drops older content stamps of the same source. An
  * append-maintained universe holds names that are NOT in the source
  * slice — treat a rebuild ([[drop]] + [[ensure]]) as a deliberate
  * reset, the s13/s14 quantizer-lifecycle story.
  */
object NameIndex {

  /** Bump when the derivation (tokenization, cap semantics) changes.
    * v2: uncapped pairs + denormalized `__occ` persisted, cap filtered
    * at read — the [[append]]-exactness layout.
    */
  private val version = "v2"

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

  /** The read-time cap filter — what [[ensure]]/[[append]] hand to
    * consumers: exactly [[EntityResolution.standingTokenBlocks]]'
    * output over the index's name universe.
    */
  private def capped(df: DataFrame, blockCap: Int): DataFrame =
    df.filter(col("__occ") <= blockCap).select(col("__sname"), col("__tok"))

  private def uncappedPairs(names: DataFrame, nameCol: String): DataFrame =
    EntityResolution.nameTokens(names, nameCol)
      .select(col("__name").as("__sname"), col("__tok"))

  private def withOcc(pairs: DataFrame): DataFrame =
    pairs.withColumn("__occ", count(lit(1)).over(
      org.apache.spark.sql.expressions.Window.partitionBy("__tok")))

  /** The capped (token, name) frame for `standing`'s distinct names.
    * `standing` is only evaluated (and scanned) on a cold build.
    */
  /** Finish or undo an interrupted [[append]] swap — run at every entry
    * point. The merged rewrite at `<base>__compact` carries its own
    * `_SUCCESS` as the commit marker: present → roll FORWARD (the
    * append is applied even though its caller never got the ack —
    * at-least-once is the contract, and a replay anti-joins to
    * nothing); absent → roll BACK (discard the partial rewrite,
    * restore a universe parked at `__precompact`). Without this, a
    * crash between the swap renames would leave NO live index and the
    * next ensure() would cold-rebuild from the source slice — silently
    * losing every appended batch's names.
    */
  private def recover(base: java.io.File): Unit = {
    val tmp = new java.io.File(base.getPath + "__compact")
    val old = new java.io.File(base.getPath + "__precompact")
    if (new java.io.File(tmp, "_SUCCESS").isFile) {
      if (base.exists()) {
        graft.ArtifactKey.rmRecursive(old)
        require(base.renameTo(old), s"append recovery failed: $base -> $old")
      }
      require(tmp.renameTo(base), s"append recovery failed: $tmp -> $base")
      graft.ArtifactKey.rmRecursive(old)
    } else {
      graft.ArtifactKey.rmRecursive(tmp)
      if (old.exists()) {
        if (!base.exists())
          require(old.renameTo(base), s"append rollback failed: $old -> $base")
        else graft.ArtifactKey.rmRecursive(old)
      }
    }
  }

  def ensure(spark: SparkSession, dir: String, table: String, subset: String,
             standing: => DataFrame, nameCol: String,
             blockCap: Int = EntityResolution.defaultBlockCap): DataFrame = synchronized {
    val conf = spark.sessionState.newHadoopConf()
    val base = root(dir, table, subset, blockCap, conf)
    recover(base)
    if (!new java.io.File(base, "_SUCCESS").isFile) {
      val stampedDir = base.getParentFile
      graft.ArtifactKey.dropSuperseded(
        stampedDir.getParentFile,
        graft.ArtifactKey.pathKey(
          new org.apache.hadoop.fs.Path(dir, s"$table.parquet").toString) + "_",
        stampedDir.getName)
      withOcc(uncappedPairs(standing, nameCol))
        .write.mode("overwrite").parquet(base.getPath)
    }
    capped(graft.ReadCache.parquetLocal(spark, base), blockCap)
  }

  /** Fold NEW names into the persisted universe — the maintenance rung
    * incremental ER was missing (new names could not land without a
    * standing-table rebuild): batch names tokenize, names already in
    * the universe drop (names ARE the identity, so an at-least-once
    * replay of a batch anti-joins to nothing — idempotent by
    * construction), and the merged pair table is re-capped GLOBALLY, so
    * the result is bit-identical to a cold [[ensure]] over
    * standing ∪ batches (EntityResolutionSpec gates it, including a
    * token that crosses the cap only across the epoch seam). The
    * rewrite is pair-universe-sized — names × tokens, sublinear in
    * rows; the expensive term ensure amortizes (scanning the standing
    * TABLE) is never re-paid.
    *
    * The merged rewrite commits via its own `_SUCCESS` and swaps in
    * with two renames (live parked at `__precompact`, never deleted
    * before the new universe is live); [[recover]] at every entry
    * point rolls a crash at any point forward or back — the round's
    * compact discipline, because a lost swap here would silently lose
    * every appended batch's names to the next source rebuild.
    */
  def append(spark: SparkSession, dir: String, table: String, subset: String,
             newNames: DataFrame, nameCol: String,
             blockCap: Int = EntityResolution.defaultBlockCap,
             failpoint: String => Unit = _ => ()): DataFrame = synchronized {
    val conf = spark.sessionState.newHadoopConf()
    val base = root(dir, table, subset, blockCap, conf)
    recover(base)
    require(new java.io.File(base, "_SUCCESS").isFile,
      s"append requires a persisted index — ensure() first ($base)")
    val old = graft.ReadCache.parquetLocal(spark, base).select("__sname", "__tok")
    val batchPairs = uncappedPairs(newNames, nameCol)
      .join(old.select("__sname").distinct(), Seq("__sname"), "left_anti")
    val merged = withOcc(old.unionByName(batchPairs))
    val tmp = new java.io.File(base.getPath + "__compact")
    graft.ArtifactKey.rmRecursive(tmp)
    merged.write.mode("overwrite").parquet(tmp.getPath)
    failpoint("committed")
    // destructive phase — mirror of recover()'s roll-forward order
    val oldDir = new java.io.File(base.getPath + "__precompact")
    graft.ArtifactKey.rmRecursive(oldDir)
    require(base.renameTo(oldDir), s"append stage failed: $base -> $oldDir")
    failpoint("base-aside")
    require(tmp.renameTo(base), s"append swap failed: $tmp -> $base")
    failpoint("swapped")
    graft.ArtifactKey.rmRecursive(oldDir)
    capped(graft.ReadCache.parquetLocal(spark, base), blockCap)
  }
}
