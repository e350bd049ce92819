package graft

/** Cheap content fingerprint of a source directory, for keying persisted
  * derived artifacts (bucketed mirrors, ANN indexes): every file's
  * (path, length, mtime) hashed into 8 hex chars. Artifact tags embed the
  * stamp, so a corpus REGENERATED at the same path gets a different tag
  * and forces a rebuild — without it, reuse keyed on path alone silently
  * serves the stale artifact, and because indexed searches rescore
  * against the artifact's OWN persisted vectors, no downstream gate over
  * the caller's corpus can catch the substitution.
  *
  * Listed through the Hadoop FileSystem of the path's scheme (not
  * java.io.File) — PASS THE SESSION'S Hadoop conf
  * (`spark.sessionState.newHadoopConf()`) so filesystems configured via
  * `spark.hadoop.*` (s3a credentials etc.) resolve; the default bare
  * conf only covers local/unauthenticated schemes. A missing path stamps
  * as "absent" (by-name test corpora that never touch disk). Cost is one
  * recursive listing per call — metadata-only, no data read; callers on
  * object stores with very large file counts should ensure() once and
  * hold the handle rather than re-stamping per query.
  *
  * Residual blind spot (accepted): a regeneration that rewrites the same
  * file names with identical byte lengths INSIDE one mtime tick produces
  * the same stamp. Closing it would need content hashing (a full data
  * read) — the stamp trades that for metadata cost, like rsync's
  * quick-check.
  */
private[graft] object ContentStamp {
  def apply(dir: String,
            hadoopConf: org.apache.hadoop.conf.Configuration =
              new org.apache.hadoop.conf.Configuration()): String = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(hadoopConf)
    if (!fs.exists(p)) "absent"
    else {
      val entries = scala.collection.mutable.ArrayBuffer.empty[String]
      val it = fs.listFiles(p, true)
      while (it.hasNext) {
        val s = it.next()
        entries += s"${s.getPath.toUri.getPath}|${s.getLen}|${s.getModificationTime}"
      }
      val md = java.security.MessageDigest.getInstance("MD5")
      entries.sorted.foreach(e => md.update(e.getBytes("UTF-8")))
      md.digest().take(4).map("%02x".format(_)).mkString
    }
  }
}
