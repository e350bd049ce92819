package graft.sim

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Build-or-reuse the composed IVF-PQ index — the two persisted ANN
  * structures folded into the one layout a 100 TB search actually
  * scans: the PQ code table ([[PqIndex]]) partitioned by IVF cell
  * ([[IvfIndex]]). A search probes nProbes cells (dynamic partition
  * pruning drops every other cell directory at scan time) and pays m
  * code bytes per surviving row (ADC) — pruning × compression, the
  * faiss IVFPQ layout re-expressed as a partitioned parquet table.
  *
  * The build REUSES the sibling ensures (one quantizer discipline:
  * probe selection must use the exact centroids the cells were assigned
  * with, ADC the exact codebooks the codes were encoded with — both
  * persist beside their own index) and pays one extra build-time
  * equi-join of the two frames on the vector id to lay codes out by
  * cell. Reuse ladder / artifact keying / empty-corpus memo identical
  * to [[IvfIndex]].
  */
object IvfPqIndex {

  private val version = "v1"

  def root(dir: String,
           hadoopConf: org.apache.hadoop.conf.Configuration =
             new org.apache.hadoop.conf.Configuration()): java.io.File =
    new java.io.File(
      s"target/ivfpq_index/$version/${graft.ArtifactKey.stamped(dir, hadoopConf)}")
      .getAbsoluteFile

  /** Delete the persisted index (forces the next ensure to rebuild). */
  def drop(dir: String): Unit = graft.ArtifactKey.rmRecursive(root(dir))

  private val emptyMemo =
    new java.util.WeakHashMap[SparkSession, scala.collection.mutable.HashMap[String, (DataFrame, Seq[Seq[Double]], Seq[Seq[Seq[Double]]])]]()

  private def sessionMemo(spark: SparkSession)
      : scala.collection.mutable.HashMap[String, (DataFrame, Seq[Seq[Double]], Seq[Seq[Seq[Double]]])] =
    emptyMemo.computeIfAbsent(spark, _ => scala.collection.mutable.HashMap.empty)

  /** The (cell-partitioned code table, IVF centroids, PQ codebooks)
    * triple for `<dir>`'s corpus: codes are (idCol, __codes, __cell)
    * with __cell the partition column. `corpus` is only scanned on cold
    * builds of the underlying indexes.
    */
  def ensure(spark: SparkSession, dir: String, corpus: => DataFrame,
             idCol: String = "vec_id", vecCol: String = "embedding"
            ): (DataFrame, Seq[Seq[Double]], Seq[Seq[Seq[Double]]]) = synchronized {
    // the sibling ensures are each memoized/persisted themselves, so
    // these calls are cheap reads on every warm path
    val (assigned, cents) = IvfIndex.ensure(spark, dir, corpus, idCol, vecCol)
    val (codes, cb) = PqIndex.ensure(spark, dir, corpus, idCol = idCol, vecCol = vecCol)
    val base = root(dir, spark.sessionState.newHadoopConf())
    val joinedPath = new java.io.File(base, "codes_by_cell").getPath
    if (!new java.io.File(joinedPath, "_SUCCESS").isFile) {
      sessionMemo(spark).get(base.getPath) match {
        case Some(h) => return h
        case None =>
      }
      if (cb.isEmpty || cents.isEmpty) {
        val h = (codes.select(col(idCol)).limit(0), cents, cb)
        sessionMemo(spark)(base.getPath) = h
        return h
      }
      graft.ArtifactKey.dropSuperseded(
        base.getParentFile, graft.ArtifactKey.pathKey(dir) + "_", base.getName)
      // one build-time equi-join lays the codes out by cell; repartition
      // on the cell first so partitionBy writes ONE file per cell
      // directory (the IvfIndex alignment trick)
      codes.join(assigned.select(col(idCol), col("__cell")), Seq(idCol))
        .repartition(cents.length, col("__cell"))
        .write.mode("overwrite").partitionBy("__cell").parquet(joinedPath)
    }
    (spark.read.parquet(joinedPath), cents, cb)
  }
}
