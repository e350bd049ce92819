package graft

import org.apache.spark.sql.functions._
import graft.sink.ZOrder

class ZOrderSpec extends SparkTestBase {
  import spark.implicits._

  test("ZImpl: bucketOf binary search and bit interleave on known values") {
    import org.apache.spark.sql.graft.ZImpl
    val cuts = Array(10.0, 20.0, 30.0)
    assert(ZImpl.bucketOf(5.0, cuts) === 0)
    assert(ZImpl.bucketOf(10.0, cuts) === 1)  // boundary: cut ≤ v counts
    assert(ZImpl.bucketOf(15.0, cuts) === 1)
    assert(ZImpl.bucketOf(30.0, cuts) === 3)
    assert(ZImpl.bucketOf(99.0, cuts) === 3)
    assert(ZImpl.bucketOf(Double.NaN, cuts) === 0)
    // 2 columns × 2 bits: buckets (a=3, b=1) → a bits at positions
    // bit·k+1, b bits at bit·k+0: z = (1<<1)|(1<<3) for a=0b11 plus
    // (1<<0) for b=0b01 → 0b1011 = 11
    val r = Seq((3.0, 1.0)).toDF("a", "b")
      .select(org.apache.spark.sql.graft.ZOrderFunctions.zValueNative(
        array($"a", $"b"), Seq(Seq(1.0, 2.0, 3.0), Seq(1.0, 2.0, 3.0)), 2))
      .collect()(0).getLong(0)
    assert(r === 11L)
  }

  test("zValueNative bit-matches a naive driver reference on random inputs") {
    // randomized kernel parity: linear-scan bucketing + naive bit
    // interleave, independent of ZImpl's binary search and shift loop
    def refBucket(v: Double, cuts: Seq[Double]): Int =
      if (v.isNaN) 0 else cuts.count(_ <= v)
    def refZ(vals: Seq[Double], cuts: Seq[Seq[Double]], bits: Int): Long = {
      val k = cuts.length
      var z = 0L
      for (c <- 0 until k; bit <- 0 until bits) {
        val b = refBucket(vals(c), cuts(c))
        if (((b >> bit) & 1) == 1) z |= 1L << (bit * k + (k - 1 - c))
      }
      z
    }
    for (seed <- Seq(41L, 42L)) {
      val rnd = new scala.util.Random(seed)
      val k = 2 + rnd.nextInt(3)                    // 2-4 columns
      val bits = 2 + rnd.nextInt(5)                 // 2-6 bits
      val cuts: Seq[Seq[Double]] = Seq.fill(k)(
        Seq.fill(1 + rnd.nextInt((1 << bits) - 1))(
          math.round(rnd.nextDouble() * 1000) / 10.0).distinct.sorted)
      val rows = Seq.fill(80)(Seq.fill(k)(
        if (rnd.nextInt(20) == 0) Double.NaN
        else math.round(rnd.nextDouble() * 1200 - 100) / 10.0))
      val df = rows.map(r => Tuple1(r)).toDF("vs")
        .select((0 until k).map(i => col("vs")(i).as(s"c$i")): _*)
      val got = df.select(org.apache.spark.sql.graft.ZOrderFunctions
          .zValueNative(array((0 until k).map(i => col(s"c$i")): _*), cuts, bits))
        .collect().map(_.getLong(0))
      val want = rows.map(r => refZ(r, cuts, bits))
      assert(got.toSeq === want, s"seed=$seed k=$k bits=$bits")
    }
  }

  test("ZOrderMirror keys its geometry: different bits or ambiguous column " +
       "sets never alias one artifact") {
    import graft.sink.ZOrderMirror
    // the PqIndex/NameIndex discipline: a warm ensure with different
    // layout geometry must resolve to a DIFFERENT artifact directory
    val r8 = ZOrderMirror.root("/tmp/x", "t", Seq("a", "b"), bits = 8)
    val r4 = ZOrderMirror.root("/tmp/x", "t", Seq("a", "b"), bits = 4)
    assert(r8.getPath !== r4.getPath)
    val amb1 = ZOrderMirror.root("/tmp/x", "t", Seq("a_b", "c"))
    val amb2 = ZOrderMirror.root("/tmp/x", "t", Seq("a", "b_c"))
    assert(amb1.getPath !== amb2.getPath)
  }

  test("empty input round-trips: no cuts, z-value 0, empty table written") {
    // a quiet ingest window must not abort layout maintenance: the
    // quantile pass yields zero cut points, every (non-existent) row
    // ranks to bucket 0, and the write lands an empty readable table
    val empty = Seq((1.0, 1.0)).toDF("a", "b").filter(lit(false))
    val cuts = ZOrder.quantileCuts(empty, Seq("a", "b"))
    assert(cuts === Seq(Seq(), Seq()))
    val dir = java.nio.file.Files.createTempDirectory("zempty").toString
    ZOrder.writeZOrdered(empty, Seq("a", "b"), dir, numFiles = 4)
    assert(spark.read.parquet(dir).isEmpty)
  }

  test("z-order layout prunes file min/max on BOTH columns; linear sort only on its own") {
    // two independent uniform columns; 64 files; a reader filtering a
    // ~1/16 range of EITHER column should touch ~√N of the z-ordered
    // files (the k=2 curve guarantee), while the linear (a-sorted)
    // layout leaves every file spanning the full b domain.
    val n = 65536
    val df = spark.range(n.toLong)
      .select(pmod(xxhash64(col("id")), lit(1000)).as("a"),
              pmod(xxhash64(col("id") + lit(7919)), lit(1000)).as("b"))
    val tmp = java.nio.file.Files.createTempDirectory("graft_zorder").toString
    ZOrder.writeZOrdered(df, Seq("a", "b"), s"$tmp/z", numFiles = 64)
    df.repartitionByRange(64, col("a")).sortWithinPartitions("a")
      .write.mode("overwrite").parquet(s"$tmp/linear")

    def overlapping(path: String, c: String, lo: Long, hi: Long): Long =
      spark.read.parquet(path)
        .groupBy(input_file_name().as("f"))
        .agg(min(col(c)).as("mn"), max(col(c)).as("mx"))
        .filter(col("mn") <= hi && col("mx") >= lo)
        .count()

    // probe a ~1/16 range INSIDE one top-level quadrant (280–340 ⊂
    // [250,500)): the curve's pruning guarantee is per dyadic cell, so a
    // range straddling the domain midpoint (the top interleave bit)
    // legitimately touches both halves — measured below as the
    // documented worst case, not gated as a defect
    val zb = overlapping(s"$tmp/z", "b", 280, 340)
    val za = overlapping(s"$tmp/z", "a", 280, 340)
    val lb = overlapping(s"$tmp/linear", "b", 280, 340)
    val la = overlapping(s"$tmp/linear", "a", 280, 340)
    info(s"files overlapping in-quadrant range: z(a)=$za z(b)=$zb linear(a)=$la linear(b)=$lb of 64")
    assert(lb === 64, "linear layout cannot prune its non-sort column")
    assert(zb <= 24, s"z-order must prune the second column, touched $zb/64")
    assert(za <= 24, s"z-order must still prune the first column, touched $za/64")
    assert(la <= 6, "sanity: linear layout prunes its own sort column hard")
    // midpoint-straddling worst case: the range crosses the top
    // interleave bit, so both b halves are touched — still far better
    // than the linear layout's 64/64
    val zbStraddle = overlapping(s"$tmp/z", "b", 470, 530)
    info(s"files overlapping midpoint-straddling b range: $zbStraddle/64")
    assert(zbStraddle <= 40, "even the straddle case must beat no-pruning")

    // the layout is a permutation: same multiset of rows back
    val back = spark.read.parquet(s"$tmp/z")
    assert(back.count() === n.toLong)
    val h1 = df.agg(sum(hash(col("a"), col("b")).cast("long"))).collect()(0).getLong(0)
    val h2 = back.agg(sum(hash(col("a"), col("b")).cast("long"))).collect()(0).getLong(0)
    assert(h1 === h2)
  }

  test("skewed column still spreads over buckets (rank cuts, not value range)") {
    // 90% of mass at one value + a long tail: value-range bucketing
    // would put the tail in one bucket; QUANTILE cuts give the tail its
    // own boundaries. The gate: z-ordering on (skewed, uniform) still
    // prunes the uniform column — the skew must not gut the interleave.
    val n = 16384
    val df = spark.range(n.toLong)
      .select(
        when(pmod(col("id"), lit(10)) < 9, lit(5L))
          .otherwise(pmod(xxhash64(col("id")), lit(1000000))).as("a"),
        pmod(xxhash64(col("id") + lit(13)), lit(1000)).as("b"))
    val tmp = java.nio.file.Files.createTempDirectory("graft_zorder_skew").toString
    ZOrder.writeZOrdered(df, Seq("a", "b"), s"$tmp/z", numFiles = 8)
    val zb = spark.read.parquet(s"$tmp/z")
      .groupBy(input_file_name().as("f"))
      .agg(min(col("b")).as("mn"), max(col("b")).as("mx"))
      .filter(col("mn") <= lit(530) && col("mx") >= lit(470))
      .count()
    info(s"files overlapping mid-range b under 90% skew on a: $zb/8")
    assert(zb <= 4, s"skew on a must not destroy pruning on b, touched $zb/8")
  }

  test("ZOrderTable: appends accumulate cross-batch overlap; compact restores the " +
       "one-shot layout (file spans + file count), rows preserved throughout") {
    import graft.sink.ZOrderTable
    val tmp = java.nio.file.Files.createTempDirectory("graft_ztable").toString + "/t"
    def batch(seed: Int, n: Int) = spark.range(n.toLong)
      .select(pmod(xxhash64(col("id") + lit(seed)), lit(1000)).as("a"),
              pmod(xxhash64(col("id") + lit(seed * 31 + 7)), lit(1000)).as("b"))
    // 4 daily batches, each z-ordered batch-locally into 16 files
    (0 until 4).foreach(d => ZOrderTable.append(batch(d, 16384), Seq("a", "b"), tmp, 16))
    val afterAppend = spark.read.parquet(tmp)
    assert(afterAppend.count() === 4 * 16384L)
    def hsum(df: org.apache.spark.sql.DataFrame): Long =
      df.agg(sum(hash(col("a"), col("b")).cast("long"))).collect()(0).getLong(0)
    val h0 = hsum(afterAppend)
    def overlappingIn(dir: String, c: String, lo: Long, hi: Long): Long =
      spark.read.parquet(dir)
        .groupBy(input_file_name().as("f"))
        .agg(min(col(c)).as("mn"), max(col(c)).as("mx"))
        .filter(col("mn") <= hi && col("mx") >= lo).count()
    def overlapping(c: String, lo: Long, hi: Long): Long =
      overlappingIn(tmp, c, lo, hi)
    def fileCount: Long = spark.read.parquet(tmp)
      .select(input_file_name()).distinct().count()
    val filesBefore = fileCount
    val overlapBefore = overlapping("b", 280, 340)
    assert(filesBefore === 64L, "4 batches x 16 files each")
    // compact onto ONE global curve: same row multiset, 16 files, and an
    // in-quadrant range touches a fraction again (the one-shot gate)
    ZOrderTable.compact(spark, tmp, Seq("a", "b"), numFiles = 16)
    assert(hsum(spark.read.parquet(tmp)) === h0, "compaction is a permutation")
    assert(fileCount === 16L, "compaction must collapse the file count")
    val overlapAfter = overlapping("b", 280, 340)
    // the honest one-shot reference: the SAME row multiset written
    // z-ordered in one shot. BOTH layouts are independent
    // RangePartitioner draws (it seeds from rdd.id, so two writes in
    // one session sample different boundaries), and each draw can shift
    // one boundary across the probed range independently — the observed
    // suite-run delta distribution reaches ±2 (a +1 bound flaked about
    // once per ~5 full-suite runs at 6-vs-8). The tight property lives
    // in the fraction gate below; this gate pins "same ballpark as
    // one-shot", not "same draw"
    val oneShotDir = tmp + "_oneshot"
    graft.sink.ZOrder.writeZOrdered(
      spark.read.parquet(tmp), Seq("a", "b"), oneShotDir, numFiles = 16)
    val overlapOneShot = overlappingIn(oneShotDir, "b", 280, 340)
    info(s"files overlapping b-range: $overlapBefore/$filesBefore before, " +
      s"$overlapAfter/16 after compact, $overlapOneShot/16 one-shot")
    assert(overlapAfter <= overlapOneShot + 2,
      s"post-compact layout must prune like a one-shot write: " +
        s"touched $overlapAfter/16 vs one-shot $overlapOneShot/16")
    // the fraction touched must improve, not just the absolute count
    assert(overlapAfter.toDouble / 16 < overlapBefore.toDouble / filesBefore + 0.25)
  }

  test("ZOrderTable.compact: a retry after a crash between the two swap renames " +
       "RECOVERS the table from __precompact instead of deleting the only copy") {
    import graft.sink.ZOrderTable
    val tmp = java.nio.file.Files.createTempDirectory("graft_zrecover").toString + "/t"
    val df = spark.range(4096L)
      .select(pmod(xxhash64(col("id")), lit(1000)).as("a"),
              pmod(xxhash64(col("id") + 7), lit(1000)).as("b"))
    ZOrderTable.append(df, Seq("a", "b"), tmp, 4)
    def hsum(d: org.apache.spark.sql.DataFrame): Long =
      d.agg(sum(hash(col("a"), col("b")).cast("long"))).collect()(0).getLong(0)
    val h0 = hsum(spark.read.parquet(tmp))
    // simulate the documented crash window: rename(p, old) succeeded,
    // rename(tmp, p) never ran — the table's ONLY copy is at __precompact
    val conf = spark.sessionState.newHadoopConf()
    val p = new org.apache.hadoop.fs.Path(tmp)
    val fs = p.getFileSystem(conf)
    assert(fs.rename(p, new org.apache.hadoop.fs.Path(tmp + "__precompact")))
    assert(!fs.exists(p), "crash simulation: live path absent")
    // the natural retry must auto-recover, then complete normally
    ZOrderTable.compact(spark, tmp, Seq("a", "b"), numFiles = 4)
    assert(hsum(spark.read.parquet(tmp)) === h0,
      "retry after mid-swap crash must recover the full row multiset")
    assert(!fs.exists(new org.apache.hadoop.fs.Path(tmp + "__precompact")),
      "recovery copy is cleaned up once the live path exists")
  }

  test("ZOrderTable: an APPEND after a mid-swap crash restores the parked " +
       "table first — the batch lands on the full table, never a fresh one " +
       "the next compact's stale-copy rule would keep") {
    import graft.sink.ZOrderTable
    val tmp = java.nio.file.Files.createTempDirectory("graft_zrecover2").toString + "/t"
    val df = spark.range(4096L)
      .select(pmod(xxhash64(col("id")), lit(1000)).as("a"),
              pmod(xxhash64(col("id") + 7), lit(1000)).as("b"))
    ZOrderTable.append(df, Seq("a", "b"), tmp, 4)
    // crash window: the table's only copy parked at __precompact
    val conf = spark.sessionState.newHadoopConf()
    val p = new org.apache.hadoop.fs.Path(tmp)
    val fs = p.getFileSystem(conf)
    assert(fs.rename(p, new org.apache.hadoop.fs.Path(tmp + "__precompact")))
    // next day's batch arrives via append, NOT a compact retry
    val batch = spark.range(4096L, 5120L)
      .select(pmod(xxhash64(col("id")), lit(1000)).as("a"),
              pmod(xxhash64(col("id") + 7), lit(1000)).as("b"))
    ZOrderTable.append(batch, Seq("a", "b"), tmp, 2)
    assert(spark.read.parquet(tmp).count() === 5120L,
      "the post-crash append must land on the RESTORED table")
    assert(!fs.exists(new org.apache.hadoop.fs.Path(tmp + "__precompact")))
    ZOrderTable.compact(spark, tmp, Seq("a", "b"), numFiles = 4)
    assert(spark.read.parquet(tmp).count() === 5120L,
      "compact after the recovered append keeps the full row multiset")
  }

  test("ZOrderMirror: builds once, reuses without rewriting, and is a permutation " +
       "of the source table") {
    import graft.sink.ZOrderMirror
    val dir = "/root/testdata/sf0.001"
    val cols = Seq("o_totalprice", "o_custkey")
    ZOrderMirror.drop(dir, "orders", cols)
    val z1 = ZOrderMirror.ensure(spark, dir, "orders", cols)
    val success = new java.io.File(ZOrderMirror.root(dir, "orders", cols), "_SUCCESS")
    assert(success.isFile)
    val stamp = success.lastModified
    val z2 = ZOrderMirror.ensure(spark, dir, "orders", cols)
    assert(success.lastModified === stamp, "warm ensure must not rewrite the mirror")
    val raw = spark.read.parquet(s"$dir/orders.parquet")
    assert(z2.count() === raw.count())
    def hsum(df: org.apache.spark.sql.DataFrame): Long =
      df.agg(sum(hash(col("o_orderkey"), col("o_totalprice"), col("o_custkey"))
        .cast("long"))).collect()(0).getLong(0)
    assert(hsum(z2) === hsum(raw), "the mirror must be a row-exact permutation")
    ZOrderMirror.drop(dir, "orders", cols)
  }
}
