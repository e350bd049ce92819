package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.multimodal.Multimodal

class MultimodalSpec extends SparkTestBase {
  import spark.implicits._

  private def meta(w: Int = 0, h: Int = 0, sr: Int = 0, dur: Long = 0L, fmt: String = "raw") =
    Row(w, h, sr, dur, fmt)

  private lazy val media = spark.createDataFrame(
    spark.sparkContext.parallelize(Seq(
      Row(1L, "image", Array[Byte](1, 2, 3), meta(w = 4000, h = 1000)),
      Row(2L, "image", Array[Byte](1, 2, 3), meta(w = 100, h = 50)),
      Row(3L, "video", Array[Byte](9, 9), meta(dur = 10000L)),
      Row(4L, "audio", null, meta(sr = 16000)))),
    Multimodal.mediaSchema)

  test("decodeFeatures: deterministic fixed-width vectors, null-safe") {
    val f = Multimodal.decodeFeatures(media, dim = 8).collect()
      .map(m => m.media_id -> m.feature).toMap
    assert(f.values.forall(_.length === 8))
    assert(f(1L).toSeq === f(2L).toSeq)        // same bytes -> same features
    assert(f(1L).toSeq !== f(3L).toSeq)        // different bytes differ
    assert(f(4L).length === 8)                 // null bytes handled
    // deterministic across runs
    val again = Multimodal.decodeFeatures(media, dim = 8).collect()
      .map(m => m.media_id -> m.feature).toMap
    assert(again(1L).toSeq === f(1L).toSeq)
  }

  test("blobDedup: identical bytes collapse to the min-id keeper; blob bytes never shuffle") {
    val out = Multimodal.blobDedup(media)
    val byKeeper = out.collect().map { r =>
      r.getLong(1) -> (Option(r.getString(0)), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3))
    }.toMap
    assert(byKeeper.keySet === Set(1L, 3L, 4L))
    assert(byKeeper(1L)._2 === 2L && byKeeper(1L)._3 === 3L) // ids 1+2 share bytes
    assert(byKeeper(3L)._2 === 1L && byKeeper(3L)._3 === 2L)
    assert(byKeeper(4L)._1.isEmpty && byKeeper(4L)._2 === 1L) // null blob: null address
    assert(byKeeper(1L)._1 !== byKeeper(3L)._1)
    // the partial aggregate hashes blobs map-side; no exchange may carry
    // the binary column (only the 16-byte address + id/length survive)
    out.collect()
    val plan = out.queryExecution.executedPlan.toString
    assert("HashAggregate".r.findAllIn(plan).size >= 2) // partial + final
    assert(!plan.linesIterator.exists(l => l.contains("Exchange") && l.contains("bytes#")),
      "blob bytes must not ride the dedup shuffle")
  }

  test("sampleFrames: n evenly spaced frames per video only") {
    val frames = Multimodal.sampleFrames(media, 4).collect()
    assert(frames.length === 4)
    assert(frames.map(_.getLong(0)).toSet === Set(3L))
    assert(frames.map(r => (r.getInt(1), r.getLong(2))).toSeq ===
      Seq((0, 0L), (1, 2500L), (2, 5000L), (3, 7500L)))
  }

  test("resizePlan: aspect-preserving dims, metadata only (bytes pruned)") {
    val plan = Multimodal.resizePlan(media, maxSide = 1000)
    val rows = plan.collect().map(r => r.getLong(0) ->
      (r.getInt(3), r.getInt(4))).toMap
    assert(rows(1L) === ((1000, 250)))   // 4000x1000 scaled by 0.25
    assert(rows(2L) === ((100, 50)))     // already under the cap
    // column pruning is observable at a file scan: round-trip via parquet
    // and assert the scan's ReadSchema never touches `bytes`
    val dir = java.nio.file.Files.createTempDirectory("graft_media").resolve("t").toString
    media.write.parquet(dir)
    val fromDisk = Multimodal.resizePlan(spark.read.parquet(dir), maxSide = 1000)
    val scan = fromDisk.queryExecution.executedPlan.toString
    val readSchema = scan.linesIterator.find(_.contains("ReadSchema")).getOrElse(scan)
    assert(!readSchema.contains("bytes"))
  }

  test("audioWindows: window count rounds up; sample count exact; audio rows only") {
    val m = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(1L, "audio", null, meta(sr = 16000, dur = 7000L)), // 1.4 -> 2 windows
        Row(2L, "audio", null, meta(sr = 8000, dur = 5000L)),  // exactly 1 window
        Row(3L, "video", Array[Byte](1), meta(dur = 9000L)))), // not audio
      Multimodal.mediaSchema)
    val out = Multimodal.audioWindows(m, windowMs = 5000).collect()
      .map(r => r.getLong(0) ->
        (r.getAs[Long]("n_windows"), r.getAs[Long]("n_samples"))).toMap
    assert(out.keySet === Set(1L, 2L))
    assert(out(1L) === ((2L, 112000L))) // ceil(7000/5000)=2; 7000*16000/1000
    assert(out(2L) === ((1L, 40000L)))
  }

  test("spreadBySize partitions by payload volume") {
    val key = "spark.sql.adaptive.advisoryPartitionSizeInBytes"
    val prev = spark.conf.getOption(key)
    try {
      val spread = Multimodal.spreadBySize(media, targetBytesPerPartition = 2L)
      assert(spread.rdd.getNumPartitions >= 3) // AQE splits ~8 payload bytes / 2 per part
      assert(spread.count() === 4)
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }
}
