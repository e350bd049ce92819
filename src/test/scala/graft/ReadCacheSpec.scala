package graft

/** Gates for the session-scoped reader-handle memo the artifact stores
  * and [[Tables]] read through (round-21 optimization): the cache must
  * be invisible semantically — identical rows to a bare read, and ANY
  * rewrite of the path (overwrite, append, delete) must miss and
  * re-read. The win it exists for (skipping the per-read listing +
  * schema-inference job) is measured in OPTIMIZATION_r21.md, not here.
  */
class ReadCacheSpec extends SparkTestBase {

  private def tmpDir(): java.io.File = {
    val d = java.nio.file.Files.createTempDirectory("readcache_spec").toFile
    d.deleteOnExit(); d
  }

  test("unchanged leaf: same handle served, rows identical to a bare read") {
    import spark.implicits._
    val leaf = new java.io.File(tmpDir(), "leaf")
    Seq((1, "a"), (2, "b")).toDF("id", "v")
      .write.mode("overwrite").parquet(leaf.getPath)
    val h1 = ReadCache.parquetLocal(spark, leaf)
    val h2 = ReadCache.parquetLocal(spark, leaf)
    assert(h1 eq h2, "unchanged content must serve the memoized handle")
    assert(h1.collect().map(_.getInt(0)).sorted.toSeq === Seq(1, 2))
    assert(h1.collect().toSet === spark.read.parquet(leaf.getPath).collect().toSet)
  }

  test("overwritten leaf: fingerprint misses and the new rows are served") {
    import spark.implicits._
    val leaf = new java.io.File(tmpDir(), "leaf")
    Seq((1, "a")).toDF("id", "v").write.mode("overwrite").parquet(leaf.getPath)
    assert(ReadCache.parquetLocal(spark, leaf).count() === 1)
    Thread.sleep(5) // mtime tick — same blind spot ContentStamp documents
    Seq((1, "a"), (2, "b"), (3, "c")).toDF("id", "v")
      .write.mode("overwrite").parquet(leaf.getPath)
    assert(ReadCache.parquetLocal(spark, leaf).count() === 3,
      "a rewritten leaf must be re-read, never served stale")
  }

  test("collectedLocal: memoized value re-derives after a rewrite") {
    import spark.implicits._
    val leaf = new java.io.File(tmpDir(), "meta")
    Seq((0, 7)).toDF("k", "n").write.mode("overwrite").parquet(leaf.getPath)
    def readN(): Int = ReadCache.collectedLocal(spark, leaf)(_.collect()(0).getInt(1))
    assert(readN() === 7)
    assert(readN() === 7)
    Thread.sleep(5)
    Seq((0, 9)).toDF("k", "n").write.mode("overwrite").parquet(leaf.getPath)
    assert(readN() === 9, "a rewritten sidecar must re-collect")
  }

  test("localFingerprint: distinguishes absent / content / added files") {
    val d = tmpDir()
    val leaf = new java.io.File(d, "fp")
    val absent = ReadCache.localFingerprint(leaf)
    assert(absent === "absent")
    leaf.mkdirs()
    java.nio.file.Files.write(new java.io.File(leaf, "a").toPath, "x".getBytes)
    val one = ReadCache.localFingerprint(leaf)
    assert(one !== absent)
    java.nio.file.Files.write(new java.io.File(leaf, "b").toPath, "y".getBytes)
    val two = ReadCache.localFingerprint(leaf)
    assert(two !== one, "an added file must change the fingerprint")
  }

  test("Tables reads serve memoized handles with unchanged results") {
    val dir = "/root/testdata/sf0.001"
    val t1 = Tables(spark, dir, "nation")
    val t2 = Tables(spark, dir, "nation")
    assert(t1 eq t2, "an unchanged source table must serve the memoized handle")
    assert(t1.count() === 25)
  }
}
