package graft.sim

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Build-or-reuse the persisted IVF index of an embedding corpus — the
  * vector-search sibling of [[graft.sink.BucketedMirror]]: pay the
  * index-build scans ONCE per corpus (count → √N centroids → the
  * O(N·nCells·dim) cell-assignment + int8-quantization pass), persist
  * the assigned frame partitioned BY CELL, and every later search runs
  * the pure probe path. Measured at the ×100 probe corpus (200 k × 64-d),
  * the build is ~2 s of the ~2.7 s end-to-end run — an "index" that is
  * rebuilt per query batch is mostly build.
  *
  * The cell partitioning is the 100 TB point: a search joins the corpus
  * to a BROADCAST probe-cell list, so Spark's dynamic partition pruning
  * drops every unprobed cell directory at scan time — a query batch
  * probing p cells of C reads p/C of the corpus bytes, not all of them
  * (the gate in PlanQualitySpec pins `dynamicpruning` in the s8 scan).
  *
  * Reuse ladder (same as BucketedMirror): files on disk with `_SUCCESS`
  * → read them back; nothing → build (the one-time scans). The index
  * lives under target/ivf_index/<sf-tag> (untracked; deleting it forces
  * a rebuild — on a real cluster this is a warehouse table keyed by
  * corpus snapshot). Builds are serialized per JVM: Verify constructs
  * queries from a 4-thread pool and s4/s8 share one index.
  *
  * Reference analog: the SQLite index built once per load so later
  * lookups don't scan (/root/reference/src/load.py:143-144) — here the
  * "index" is Voronoi cell layout instead of a B-tree.
  */
object IvfIndex {

  /** Bump when the index format or assignment semantics change: reuse is
    * keyed only by source dir, so an index persisted by OLDER code would
    * otherwise silently serve stale cells.
    */
  private val version = "v1"

  /** Index root for a source dir — key scheme and its rationale in
    * [[graft.ArtifactKey]] (basename + path hash + content stamp).
    * Exposed so ScaleProbe can time a fresh build explicitly; pass the
    * session Hadoop conf for sources on filesystems that need it.
    */
  def root(dir: String,
           hadoopConf: org.apache.hadoop.conf.Configuration =
             new org.apache.hadoop.conf.Configuration()): java.io.File =
    new java.io.File(
      s"target/ivf_index/$version/${graft.ArtifactKey.stamped(dir, hadoopConf)}")
      .getAbsoluteFile

  /** Delete the persisted index (forces the next ensure to rebuild). */
  def drop(dir: String): Unit = graft.ArtifactKey.rmRecursive(root(dir))

  /** The (assigned corpus, centroids) pair for `<dir>`'s corpus:
    * columns (idCol, vecCol, __qc, __sc, __cell) with __cell as the
    * PARTITION column. `corpus` is only scanned on a cold build.
    */
  /** Empty-corpus results memoized per (SparkSession, stamped base path):
    * nothing is persisted for an empty corpus, so the memo is what keeps
    * repeat ensure() calls from re-evaluating the by-name corpus and
    * re-running the count job, against the documented "only scanned on a
    * cold build" contract. Keying by the STAMPED path gives staleness for
    * free (a corpus that gains rows changes its content stamp); keying by
    * the SESSION keeps a cached result — whose DataFrames are bound to
    * the session that built it — from dangling once that session stops
    * (test suites restart sessions). The weak session key lets stopped
    * sessions' entries be collected instead of growing forever.
    */
  private val emptyMemo =
    new java.util.WeakHashMap[SparkSession, scala.collection.mutable.HashMap[String, (DataFrame, Seq[Seq[Double]])]]()

  private def sessionMemo(spark: SparkSession)
      : scala.collection.mutable.HashMap[String, (DataFrame, Seq[Seq[Double]])] =
    emptyMemo.computeIfAbsent(spark, _ => scala.collection.mutable.HashMap.empty)

  def ensure(spark: SparkSession, dir: String, corpus: => DataFrame,
             idCol: String = "vec_id", vecCol: String = "embedding"
            ): (DataFrame, Seq[Seq[Double]]) = synchronized {
    val base = root(dir, spark.sessionState.newHadoopConf())
    val corpusPath = new java.io.File(base, "corpus").getPath
    val centsPath = new java.io.File(base, "centroids").getPath
    if (!new java.io.File(corpusPath, "_SUCCESS").isFile ||
        !new java.io.File(centsPath, "_SUCCESS").isFile) {
      sessionMemo(spark).get(base.getPath) match {
        case Some(h) => return h
        case None =>
      }
      // a cold build supersedes every older stamp of the same source —
      // without this each regeneration strands a full-size index copy
      graft.ArtifactKey.dropSuperseded(
        base.getParentFile, graft.ArtifactKey.pathKey(dir) + "_", base.getName)
      val df = corpus
      val n = df.count()
      if (n == 0) {
        // nothing to persist: an empty parquet dir can't be read back
        // (no footer to infer a schema from), and repartition(0 cells)
        // throws — return the inline paths' empty-corpus contract
        // (empty assigned frame, no centroids) without writing an index
        val h = (Similarity.assignCells(df, Seq.empty, idCol, vecCol),
          Seq.empty[Seq[Double]])
        sessionMemo(spark)(base.getPath) = h
        return h
      }
      val cells = Similarity.autoCells(n)
      val cents = Similarity.kmeansCentroids(df, cells, 0, idCol, vecCol)
        .map(_.toSeq).toSeq
      // centroids persist beside the corpus: probe selection must use the
      // EXACT quantizer the cells were assigned with, across JVMs
      import spark.implicits._
      cents.zipWithIndex.map { case (c, i) => (i, c) }
        .toDF("cell", "centroid")
        .coalesce(1).write.mode("overwrite").parquet(centsPath)
      // repartition by the cell id first: the hash layout puts each cell's
      // rows in exactly one task, so partitionBy writes ONE file per cell
      // directory (the BucketedMirror alignment trick)
      Similarity.assignCells(df, cents, idCol, vecCol)
        .repartition(cents.length, col("__cell"))
        .write.mode("overwrite").partitionBy("__cell").parquet(corpusPath)
    }
    val cents = spark.read.parquet(centsPath)
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1)).sortBy(_._1)
      .map(_._2).toSeq
    (spark.read.parquet(corpusPath), cents)
  }
}
