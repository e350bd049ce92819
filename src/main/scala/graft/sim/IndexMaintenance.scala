package graft.sim

/** Shared append/compact maintenance mechanics for the SINGLE-LEAF
  * persisted ANN indexes ([[IvfIndex]] leaf `corpus`, [[PqIndex]] leaf
  * `codes`, [[IvfPqIndex]] leaf `codes_by_cell`) — one implementation
  * of the generation fold, the crash-recovering two-rename swap, and
  * the folded-keys replay ledger, so the three indexes cannot drift
  * apart in their crash semantics. [[SrpIndex]] keeps its own two-leaf
  * variant (its fold spans `buckets` + `vectors`, which needs an
  * explicit commit marker; here the fold directory's own `_SUCCESS` is
  * the commit point).
  *
  * Crash-safety contract (proven by failpoint injection in
  * SimilaritySpec): the fold is fully written beside the live leaf
  * first; everything after its `_SUCCESS` — keys swap, generation
  * delete, the two leaf renames — is the destructive phase that
  * [[recover]] (run at every index entry point) rolls FORWARD; a fold
  * without `_SUCCESS` rolls BACK untouched.
  */
private[graft] object IndexMaintenance {

  /** Every append-generation directory under the index root, completed
    * or not (an incomplete generation was never VISIBLE — readAll gates
    * on `_SUCCESS` — so deleting it loses nothing a probe ever saw; the
    * at-least-once driver replays the batch).
    */
  def genDirs(base: java.io.File): Array[java.io.File] =
    Option(base.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.startsWith("append_"))

  /** The batch keys compact has already folded into the live leaf —
    * one newline-separated text file, read by append to no-op a replay
    * of a folded batch (its generation is gone; re-creating it would
    * double-count rows the fold already holds, and duplicate vectors
    * rank one neighbor into two top-k slots). Must mark only COMPLETED
    * generations — exactly the set the fold read; marking an incomplete
    * one would make its replay no-op while its rows are in NO leaf.
    */
  def foldedKeysFile(base: java.io.File): java.io.File =
    new java.io.File(base, "folded_keys")

  def readFoldedKeys(base: java.io.File): Set[String] = {
    val f = foldedKeysFile(base)
    if (!f.isFile) Set.empty
    else {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.readAllLines(
        f.toPath, java.nio.charset.StandardCharsets.UTF_8)
        .asScala.filter(_.nonEmpty).toSet
    }
  }

  /** Stage the post-fold ledger (existing keys ∪ the completed
    * generations the fold reads) beside the live one — harmless alone;
    * rollback discards it, [[commitFoldedKeys]] rolls it in.
    */
  def stageFoldedKeys(base: java.io.File, completedGenNames: Seq[String]): Unit = {
    val keys = readFoldedKeys(base) ++
      completedGenNames.map(_.stripPrefix("append_"))
    java.nio.file.Files.write(
      new java.io.File(base, "folded_keys__compact").toPath,
      keys.toSeq.sorted.mkString("\n")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
  }

  /** Roll the staged ledger in (idempotent under recovery replay). */
  def commitFoldedKeys(base: java.io.File): Unit = {
    val tmpK = new java.io.File(base, "folded_keys__compact")
    if (tmpK.isFile) {
      val live = foldedKeysFile(base)
      live.delete()
      require(tmpK.renameTo(live), s"compact keys swap failed: $tmpK -> $live")
    }
  }

  /** Finish or undo an interrupted compact of `leaf` — call at every
    * index entry point so a crash mid-swap self-heals before any read
    * or write touches the index. `<leaf>__compact/_SUCCESS` present →
    * the fold holds every row of leaf + the then-present generations:
    * roll FORWARD (keys swap, delete folded generations, finish the
    * two-rename swap). Absent → roll BACK (discard the partial fold and
    * staged keys, restore a leaf parked at `__precompact`). Without
    * this, ensure() after a crash between the swap renames would see no
    * leaf `_SUCCESS` and cold-REBUILD with a fresh quantizer while
    * surviving generations still carry the old one's assignments.
    */
  def recover(base: java.io.File, leaf: String): Unit = {
    val live = new java.io.File(base, leaf)
    val tmp = new java.io.File(base, leaf + "__compact")
    val old = new java.io.File(base, leaf + "__precompact")
    if (new java.io.File(tmp, "_SUCCESS").isFile) {
      commitFoldedKeys(base)
      genDirs(base).foreach(graft.ArtifactKey.rmRecursive)
      if (live.exists()) {
        graft.ArtifactKey.rmRecursive(old)
        require(live.renameTo(old), s"compact recovery failed: $live -> $old")
      }
      require(tmp.renameTo(live), s"compact recovery failed: $tmp -> $live")
      graft.ArtifactKey.rmRecursive(old)
    } else {
      graft.ArtifactKey.rmRecursive(tmp)
      new java.io.File(base, "folded_keys__compact").delete()
      if (old.exists()) {
        if (!live.exists())
          require(old.renameTo(live), s"compact rollback failed: $old -> $live")
        else graft.ArtifactKey.rmRecursive(old)
      }
    }
  }

  /** Commit marker for MULTI-LEAF compacts (a fold spanning several
    * leaves — SrpIndex's buckets+vectors, LshIndex/HashLedger's
    * data+meta): no single tmp `_SUCCESS` can mark the destructive
    * phase, so an explicit marker file is created only after EVERY tmp
    * fold is fully written and removed only after every swap lands.
    */
  def markerFile(base: java.io.File): java.io.File =
    new java.io.File(base, "__compact_commit")

  /** Swap leaf `<name>__compact` into place (live → `__precompact`,
    * fold → live, drop the parked copy) — idempotent, so a recovery
    * replay finishes whatever renames a crash left undone: fold
    * already consumed → restore-or-drop the parked copy only.
    */
  def swapLeaf(base: java.io.File, leaf: String): Unit = {
    val live = new java.io.File(base, leaf)
    val tmp = new java.io.File(base, leaf + "__compact")
    val old = new java.io.File(base, leaf + "__precompact")
    if (new java.io.File(tmp, "_SUCCESS").isFile) {
      if (live.exists()) {
        graft.ArtifactKey.rmRecursive(old)
        require(live.renameTo(old), s"compact stage failed: $live -> $old")
      }
      require(tmp.renameTo(live), s"compact swap failed: $tmp -> $live")
      graft.ArtifactKey.rmRecursive(old)
    } else if (old.exists()) {
      if (!live.exists())
        require(old.renameTo(live), s"compact rollback failed: $old -> $live")
      else graft.ArtifactKey.rmRecursive(old)
    }
  }

  /** Finish or undo an interrupted MULTI-LEAF compact — the
    * marker-keyed twin of [[recover]], called at every entry point of
    * the indexes whose compact swaps several leaves. Marker present →
    * every fold committed: roll FORWARD (finish each leaf's swap, drop
    * the marker). Marker absent → roll BACK (discard partial folds,
    * restore leaves parked at `__precompact`). Without this, a crash
    * between the swaps would leave meta describing one layout while the
    * data leaf carries another — probes would hash group keys against
    * the wrong count and silently miss candidates — or leave NO live
    * data leaf, making the next ensure() cold-rebuild from the source
    * slice and silently LOSE every appended batch's rows.
    */
  def recoverMarked(base: java.io.File, leaves: Seq[String]): Unit = {
    if (markerFile(base).isFile) {
      leaves.foreach(swapLeaf(base, _))
      markerFile(base).delete()
    } else {
      leaves.foreach { leaf =>
        graft.ArtifactKey.rmRecursive(new java.io.File(base, leaf + "__compact"))
        val old = new java.io.File(base, leaf + "__precompact")
        val live = new java.io.File(base, leaf)
        if (old.exists()) {
          if (!live.exists())
            require(old.renameTo(live), s"compact rollback failed: $old -> $live")
          else graft.ArtifactKey.rmRecursive(old)
        }
      }
    }
  }

  /** The destructive phase of a compact whose fold at `<leaf>__compact`
    * has committed — mirror of [[recover]]'s roll-forward order, with
    * `failpoint` labels SimilaritySpec throws from to prove the
    * recovery claims against real crash states.
    */
  def finishCompact(base: java.io.File, leaf: String,
                    failpoint: String => Unit): Unit = {
    failpoint("committed")
    commitFoldedKeys(base)
    failpoint("keys-swapped")
    genDirs(base).foreach(graft.ArtifactKey.rmRecursive)
    failpoint("gens-deleted")
    val live = new java.io.File(base, leaf)
    val tmp = new java.io.File(base, leaf + "__compact")
    val old = new java.io.File(base, leaf + "__precompact")
    graft.ArtifactKey.rmRecursive(old)
    require(live.renameTo(old), s"compact stage failed: $live -> $old")
    failpoint(s"$leaf-aside")
    require(tmp.renameTo(live), s"compact swap failed: $tmp -> $live")
    failpoint("swapped")
    graft.ArtifactKey.rmRecursive(old)
  }
}
