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
    * otherwise silently serve stale cells. v2: per-`subset`
    * subdirectories (different indexed slices of one source must not
    * share a directory — the LshIndex convention) + idempotent
    * [[append]] generations.
    */
  private val version = "v2"

  /** Index root for a source dir — key scheme and its rationale in
    * [[graft.ArtifactKey]] (basename + path hash + content stamp).
    * Exposed so ScaleProbe can time a fresh build explicitly; pass the
    * session Hadoop conf for sources on filesystems that need it.
    */
  def root(dir: String, subset: String = "all",
           hadoopConf: org.apache.hadoop.conf.Configuration =
             new org.apache.hadoop.conf.Configuration()): java.io.File =
    new java.io.File(
      s"target/ivf_index/$version/${graft.ArtifactKey.stamped(dir, hadoopConf)}/$subset")
      .getAbsoluteFile

  /** Delete the persisted index (forces the next ensure to rebuild). */
  def drop(dir: String, subset: String = "all"): Unit =
    graft.ArtifactKey.rmRecursive(root(dir, subset))

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
             idCol: String = "vec_id", vecCol: String = "embedding",
             subset: String = "all"): (DataFrame, Seq[Seq[Double]]) = synchronized {
    val base = root(dir, subset, spark.sessionState.newHadoopConf())
    recover(base)
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
      // (the whole stamped dir goes, all subsets: they are slices of
      // the same now-stale content)
      graft.ArtifactKey.dropSuperseded(
        base.getParentFile.getParentFile, graft.ArtifactKey.pathKey(dir) + "_",
        base.getParentFile.getName)
      val df = corpus
      val n = Similarity.countRows(df)
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
      // a cold build starts a fresh index lifetime: a folded-keys ledger
      // surviving from a prior lifetime at this path would wrongly no-op
      // appends that reuse a batch key — and a surviving generation dir
      // would union a PRIOR lifetime's rows into the fresh index
      foldedKeysFile(base).delete()
      genDirs(base).foreach(graft.ArtifactKey.rmRecursive)
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
    (readAll(spark, base), readCents(spark, centsPath))
  }

  /** The persisted centroid matrix, memoized per (session, path, content
    * fingerprint) — [[graft.ReadCache]] — so a warm ensure/append/search
    * pays a metadata walk, not a read + collect job, per access.
    */
  private def readCents(spark: SparkSession, centsPath: String): Seq[Seq[Double]] =
    graft.ReadCache.collectedLocal(spark, new java.io.File(centsPath)) { df =>
      df.collect().map(r => r.getInt(0) -> r.getSeq[Double](1)).sortBy(_._1)
        .map(_._2).toSeq
    }

  /** The assigned frame: base corpus plus every completed [[append]]
    * generation (each its own cell-partitioned parquet root, so dynamic
    * partition pruning applies to all of them alike).
    */
  private def readAll(spark: SparkSession, base: java.io.File): DataFrame = {
    val gens = Option(base.listFiles()).getOrElse(Array.empty)
      .filter(f => f.getName.startsWith("append_") &&
        new java.io.File(f, "_SUCCESS").isFile)
      .map(_.getPath).sorted
    // one read per root, unioned: a multi-path partitioned read trips
    // partition-structure inference; per-root scans also keep partition
    // (cell) pruning per generation. Handles are ReadCache-memoized: a
    // rewritten root (overwrite, compact swap) re-reads, an unchanged one
    // skips the per-read listing + schema-inference job.
    (new java.io.File(base, "corpus") +: gens.toSeq.map(new java.io.File(_)))
      .map(graft.ReadCache.parquetLocal(spark, _)).reduce(_.unionByName(_))
  }

  /** Fold a batch of NEW vectors into the persisted index — the
    * index-MAINTENANCE rung (the LshIndex/HashLedger/EdgeIndex story
    * for vector search: a daily embedding batch must not cost a corpus
    * re-scan or a re-cluster): batch rows are assigned to the EXISTING
    * centroids and written as their own cell-partitioned generation
    * under the index root. The quantizer is immutable per index
    * generation BY DESIGN — re-training moves every Voronoi boundary
    * and forces a full re-assign; a periodic rebuild ([[drop]] +
    * [[ensure]]) is a separate, deliberate operation.
    *
    * EXACTNESS: cell assignment is a pure per-row function of the
    * centroids, so searching the appended index is IDENTICAL to
    * searching a cold index built over corpus ∪ batches with the same
    * centroids (SimilaritySpec gates the bit equality). IDEMPOTENT per
    * `batchKey` — a replayed batch overwrites its own generation
    * instead of double-counting (the ReportStore discipline), so
    * at-least-once drivers are safe.
    *
    * Returns the refreshed (assigned frame incl. all generations,
    * centroids). Requires an existing index (there is no quantizer to
    * assign against otherwise) — seed one with [[ensure]].
    */
  def append(spark: SparkSession, dir: String, batchKey: String,
             batch: DataFrame, idCol: String = "vec_id",
             vecCol: String = "embedding",
             subset: String = "all"): (DataFrame, Seq[Seq[Double]]) = synchronized {
    require(batchKey.nonEmpty && batchKey.forall(c =>
      c.isLetterOrDigit || c == '-' || c == '_'),
      s"batchKey must be a [A-Za-z0-9_-]+ generation label; got '$batchKey'")
    val base = root(dir, subset, spark.sessionState.newHadoopConf())
    recover(base)
    val corpusPath = new java.io.File(base, "corpus").getPath
    val centsPath = new java.io.File(base, "centroids").getPath
    require(new java.io.File(corpusPath, "_SUCCESS").isFile &&
      new java.io.File(centsPath, "_SUCCESS").isFile,
      s"no persisted index at $base — ensure() a base corpus before append()")
    val cents = readCents(spark, centsPath)
    // a batchKey whose generation was already FOLDED by [[compact]] must
    // no-op, not re-append: its rows live in the corpus leaf now, and a
    // re-created generation would double-count them (duplicate vector
    // rows rank the same neighbor into two top-k slots). This closes the
    // at-least-once window compact would otherwise reopen — the
    // folded-keys ledger commits atomically with the fold itself.
    if (readFoldedKeys(base).contains(batchKey)) return (readAll(spark, base), cents)
    Similarity.assignCells(batch, cents, idCol, vecCol)
      .repartition(cents.length, col("__cell"))
      .write.mode("overwrite").partitionBy("__cell")
      .parquet(new java.io.File(base, s"append_$batchKey").getPath)
    (readAll(spark, base), cents)
  }

  /** Single-leaf maintenance mechanics shared with [[PqIndex]] /
    * [[IvfPqIndex]] — see [[IndexMaintenance]] for the crash-safety
    * contract (recovery of an interrupted compact, the folded-keys
    * replay ledger, the generation fold).
    */
  private def recover(base: java.io.File): Unit =
    IndexMaintenance.recover(base, "corpus")

  private def readFoldedKeys(base: java.io.File): Set[String] =
    IndexMaintenance.readFoldedKeys(base)

  private def foldedKeysFile(base: java.io.File): java.io.File =
    IndexMaintenance.foldedKeysFile(base)

  private def genDirs(base: java.io.File): Array[java.io.File] =
    IndexMaintenance.genDirs(base)

  /** Fold every completed [[append]] generation back into the base
    * corpus leaf — the maintenance pass that keeps the probe's file
    * economics flat after a year of daily appends (each generation is
    * one small parquet file per touched cell directory; scan cost and
    * the DPP directory pruning degrade with file COUNT, not bytes).
    * After it the index is one file per cell in one root again, exactly
    * as a cold build over corpus ∪ batches would have written it.
    *
    * Rows are preserved exactly — compaction is a permutation, so
    * search results are bit-identical before and after (gated in
    * SimilaritySpec), and the centroids are untouched (re-sizing the
    * quantizer is a rebuild: [[drop]] + [[ensure]], by definition).
    * The folded batch keys land in a ledger file committed atomically
    * with the fold, so [[append]] can no-op an at-least-once replay of
    * a batch whose generation no longer exists — without it, the
    * replay would re-create rows the fold already holds and duplicate
    * vectors would rank one neighbor into two top-k slots.
    *
    * Crash safety follows [[graft.sink.ZOrderTable.compact]]'s
    * two-rename discipline extended to the generation fold: the fresh
    * layout is fully written beside the live tree first (its `_SUCCESS`
    * is the commit point), and only then are generations deleted and
    * the corpus leaf swapped (live → `__precompact`, fold → live, drop
    * the parked copy). A crash at ANY point leaves a state [[recover]]
    * — run by every entry — finishes or undoes; the swap window itself
    * is two metadata renames. Run offline, like every maintenance pass
    * here (concurrent cross-JVM appends during the fold are out of
    * contract, same as HashLedger/LshIndex). `failpoint` is a test
    * hook: SimilaritySpec throws from it at each phase label to prove
    * the recovery claims against the REAL crash states.
    */
  def compact(spark: SparkSession, dir: String, subset: String = "all",
              failpoint: String => Unit = _ => ()): (DataFrame, Seq[Seq[Double]]) = synchronized {
    val base = root(dir, subset, spark.sessionState.newHadoopConf())
    recover(base)
    val corpusDir = new java.io.File(base, "corpus")
    val centsPath = new java.io.File(base, "centroids").getPath
    require(new java.io.File(corpusDir, "_SUCCESS").isFile &&
      new java.io.File(centsPath, "_SUCCESS").isFile,
      s"compact requires a persisted index — ensure() first ($corpusDir)")
    val cents = readCents(spark, centsPath)
    val tmp = new java.io.File(base, "corpus__compact")
    graft.ArtifactKey.rmRecursive(tmp)
    // stage the folded-keys ledger FIRST (harmless alone — rollback
    // discards it): mark exactly the COMPLETED generations the fold
    // below reads, never incomplete ones (see IndexMaintenance)
    IndexMaintenance.stageFoldedKeys(base, genDirs(base)
      .filter(f => new java.io.File(f, "_SUCCESS").isFile).map(_.getName))
    // source and destination are different directories, so the fold
    // streams old files into new ones — no checkpoint, no driver state;
    // the same one-task-per-cell repartition alignment as the build
    // writes ONE file per cell directory. Replayed rows need no dedup
    // here BY CONSTRUCTION: a pre-fold replay overwrites its own
    // generation, a post-fold replay no-ops on the keys ledger — an
    // unconditional distinct() over array columns would be the fold's
    // dominant shuffle for zero rows removed.
    readAll(spark, base)
      .repartition(cents.length, col("__cell"))
      .write.mode("overwrite").partitionBy("__cell").parquet(tmp.getPath)
    IndexMaintenance.finishCompact(base, "corpus", failpoint)
    (readAll(spark, base), cents)
  }
}
