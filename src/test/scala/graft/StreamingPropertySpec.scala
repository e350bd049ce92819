package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.Streaming

/** Randomized batch-parity for the stateful streaming twins: a seeded
  * random event log, globally time-sorted and cut at RANDOM micro-batch
  * boundaries, must drain to exactly the batch operator's answer. Hand
  * fixtures pin the contracts; these sweep the shapes — same-timestamp
  * runs, value repeats, key interleavings, state carried across
  * arbitrary batch cuts (the class of bug the round-17 review found:
  * millisecond truncation and mid-run late folds both break exactly
  * this gate).
  */
class StreamingPropertySpec extends SparkTestBase {
  import spark.implicits._

  private def T(ms: Long) = new java.sql.Timestamp(ms)
  private val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime

  /** Random cut points: the sorted events split into 2-5 micro-batches. */
  private def randomCuts(rnd: scala.util.Random, n: Int): Seq[Int] = {
    val k = 2 + rnd.nextInt(4)
    (Seq(n) ++ Seq.fill(k - 1)(rnd.nextInt(n + 1))).sorted
  }

  test("scd2Stream drains to scd2Intervals on random change logs") {
    for (seed <- Seq(11L, 12L, 13L)) {
      val rnd = new scala.util.Random(seed)
      val values = Seq(Some("a"), Some("b"), Some("c"), None)
      // strictly increasing ts across the whole log (per-key in-order
      // delivery is the documented arrival contract); ties impossible
      // by construction, tie column still unique
      val events = (0 until 60).map { i =>
        Streaming.ChangeObs(1L + rnd.nextInt(4), T(base + i * 60000L),
          values(rnd.nextInt(values.size)), i.toLong)
      }
      implicit val sqlCtx = spark.sqlContext
      val mem = MemoryStream[Streaming.ChangeObs]
      val q = Streaming.scd2Stream(mem.toDS(), stateTtlDays = 5,
        lateness = "0 seconds")
        .writeStream.format("memory").queryName(s"scd2_prop_$seed")
        .outputMode("append").start()
      try {
        var prev = 0
        randomCuts(rnd, events.size).foreach { cut =>
          if (cut > prev) { mem.addData(events.slice(prev, cut): _*); prev = cut }
          q.processAllAvailable()
        }
        // two far-future keepalives fire every key's TTL timeout and
        // flush the open runs (the existing kill-pattern)
        mem.addData(Streaming.ChangeObs(999L, T(base + 400L * 86400000L), Some("x"), 9001L))
        q.processAllAvailable()
        mem.addData(Streaming.ChangeObs(999L, T(base + 401L * 86400000L), Some("x"), 9002L))
        q.processAllAvailable()
        val streamed = spark.table(s"scd2_prop_$seed").filter($"key" =!= 999L)
          .collect().map(r => (r.getLong(0), Option(r.getString(1)),
            r.getTimestamp(2), Option(r.getTimestamp(3)))).toSet
        val batch = graft.analyze.Lifecycle.scd2Intervals(
          events.map(e => (e.key, e.ts, e.value.orNull, e.tie))
            .toDF("k", "t", "v", "eid"), "k", "t", "v", "eid")
          .collect().map(r => (r.getLong(0), Option(r.getString(1)),
            r.getTimestamp(2), Option(r.getTimestamp(3)))).toSet
        assert(streamed === batch, s"seed=$seed")
      } finally q.stop()
    }
  }

  test("runningDailyChange drains to the per-key lag diff on random day logs") {
    for (seed <- Seq(31L, 32L, 33L)) {
      val rnd = new scala.util.Random(seed)
      // globally strictly increasing days, random key per day — each
      // key's series is a random subsequence of the calendar
      val events = (0 until 50).map { i =>
        Streaming.DayObs(s"k${rnd.nextInt(4)}",
          new java.sql.Date(base + i * 86400000L),
          math.round(rnd.nextDouble() * 100) / 10.0)
      }
      implicit val sqlCtx = spark.sqlContext
      val mem = MemoryStream[Streaming.DayObs]
      val q = Streaming.runningDailyChange(mem.toDS(), stateTtlDays = 365,
        lateness = "0 seconds")
        .writeStream.format("memory").queryName(s"day_prop_$seed")
        .outputMode("append").start()
      try {
        var prev = 0
        randomCuts(rnd, events.size).foreach { cut =>
          if (cut > prev) { mem.addData(events.slice(prev, cut): _*); prev = cut }
          q.processAllAvailable()
        }
        val streamed = spark.table(s"day_prop_$seed")
          .collect().map(r => (r.getString(0), r.getDate(1).toString,
            r.getDouble(2))).toSet
        // driver reference: per key, consecutive-day diffs in day order
        val want = events.groupBy(_.key).flatMap { case (k, obs) =>
          obs.sortBy(_.date.getTime).sliding(2).collect {
            case Seq(a, b) => (k, b.date.toString, b.value - a.value)
          }
        }.toSet
        assert(streamed === want, s"seed=$seed")
      } finally q.stop()
    }
  }

  test("transitionEdgesStream drains to transitionEdges on random view logs") {
    for (seed <- Seq(21L, 22L, 23L)) {
      val rnd = new scala.util.Random(seed)
      val events = (0 until 80).map { i =>
        Streaming.PageView(1L + rnd.nextInt(5), T(base + i * 60000L),
          i.toLong, rnd.nextInt(6).toLong)
      }
      implicit val sqlCtx = spark.sqlContext
      val mem = MemoryStream[Streaming.PageView]
      val q = Streaming.transitionEdgesStream(mem.toDS(), stateTtlDays = 30,
        lateness = "0 seconds")
        .writeStream.format("memory").queryName(s"trans_prop_$seed")
        .outputMode("append").start()
      try {
        var prev = 0
        randomCuts(rnd, events.size).foreach { cut =>
          if (cut > prev) { mem.addData(events.slice(prev, cut): _*); prev = cut }
          q.processAllAvailable()
        }
        val streamed = spark.table(s"trans_prop_$seed")
          .groupBy("src", "dst").count()
          .as[(Long, Long, Long)].collect().toSet
        val batch = graft.graph.Graph.transitionEdges(
          events.map(e => (e.user, e.ts, e.tie, e.page))
            .toDF("user_id", "ts", "event_id", "page"),
          "user_id", "page", "ts", "event_id")
          .as[(Long, Long, Long)].collect().toSet
        assert(streamed === batch, s"seed=$seed")
      } finally q.stop()
    }
  }

  test("sessionStateStream drains to sessionState-minus-opens on random event logs") {
    for (seed <- Seq(31L, 32L, 33L)) {
      val rnd = new scala.util.Random(seed)
      val events = (0 until 90).map { i =>
        // bursty inter-arrival times so gaps actually close sessions;
        // occasional nulls exercise the nv/vsum split
        Streaming.SessionEvent(1L + rnd.nextInt(4),
          T(base + i * 60000L * (1 + rnd.nextInt(9))), i.toLong,
          if (rnd.nextInt(8) == 0) None else Some(rnd.nextDouble() * 21.3))
      }.sortBy(e => (e.ts.getTime, e.tie))
      implicit val sqlCtx = spark.sqlContext
      val mem = MemoryStream[Streaming.SessionEvent]
      // events collide on timestamps (i·rand minutes), so a random cut
      // can land BETWEEN two equal-ts rows: zero lateness would let the
      // engine's watermark filter eat the second one before the fold
      // ever sees it — 1 minute of slack keeps every in-order row alive
      val q = Streaming.sessionStateStream(mem.toDS(), gapMinutes = 180,
        stateTtlDays = 30, lateness = "1 minute")
        .writeStream.format("memory").queryName(s"sess_prop_$seed")
        .outputMode("append").start()
      try {
        var prev = 0
        randomCuts(rnd, events.size).foreach { cut =>
          if (cut > prev) { mem.addData(events.slice(prev, cut): _*); prev = cut }
          q.processAllAvailable()
        }
        val streamed = spark.table(s"sess_prop_$seed")
          .as[Streaming.SessionRow].collect()
          .map(r => (r.user, r.session_id, r.n, r.nv, r.vsum_micros,
            r.start.getTime, r.end.getTime)).toSet
        val st = graft.analyze.Analytics.sessionState(
          events.map(e => (e.user, e.ts, e.value, e.tie))
            .toDF("user", "ts", "value", "tie"), "user", "ts", "value", 180)
        val expected = st
          .withColumn("__mx", max(col("session_id"))
            .over(org.apache.spark.sql.expressions.Window.partitionBy("user")))
          .filter(col("session_id") =!= col("__mx"))
          .select(col("user"), col("session_id"), col("n"), col("nv"),
            coalesce((col("vsum") * lit(1000000)).cast("long"), lit(0L)),
            col("start_ts"), col("end_ts"))
          .as[(Long, Long, Long, Long, Long, java.sql.Timestamp, java.sql.Timestamp)]
          .collect()
          .map(r => (r._1, r._2, r._3, r._4, r._5, r._6.getTime, r._7.getTime)).toSet
        assert(streamed === expected, s"seed=$seed")
      } finally q.stop()
    }
  }
}
