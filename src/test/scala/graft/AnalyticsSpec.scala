package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.analyze.Analytics

class AnalyticsSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private lazy val weather = Seq(
    // city, ts, temp — mirrors the reference's weather table shape
    ("london", ts("2024-01-01 06:00:00"), 10.0),
    ("london", ts("2024-01-02 06:00:00"), 12.0),
    ("london", ts("2024-01-03 06:00:00"), 11.0),
    ("tokyo",  ts("2024-01-01 06:00:00"), 5.0),
    ("tokyo",  ts("2024-01-02 06:00:00"), 5.0),
    ("sydney", ts("2024-01-01 06:00:00"), 30.0)
  ).toDF("city", "t", "temp")

  test("A1 basicStats: count, range, exact median") {
    val r = Analytics.basicStats(weather, "t", "temp").collect()(0)
    assert(r.getAs[Long]("record_count") === 6L)
    assert(r.getAs[String]("ts_min") === "2024-01-01 06:00:00")
    assert(r.getAs[Double]("value_median") === 10.5) // even n: interpolated
  }

  test("A2 groupMultiAgg per city") {
    val m = Analytics.groupMultiAgg(weather, "city", "temp")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(m("london") === 11.0 && m("tokyo") === 5.0 && m("sydney") === 30.0)
  }

  test("A3 extremes: highest/lowest rows, tie-break on key") {
    val rows = Analytics.extremeGroupsLabelled(weather, "city", "temp").collect()
    assert(rows.map(r => (r.getString(0), r.getString(1))).toSeq ===
      Seq(("highest", "sydney"), ("lowest", "tokyo")))
    // tie on the mean -> lexicographically first key for both extremes
    val tied = Seq(("b", 1.0), ("a", 1.0)).toDF("city", "temp")
    val t = Analytics.extremeGroupsLabelled(tied, "city", "temp").collect()
    assert(t.map(_.getString(1)).toSeq === Seq("a", "a"))
  }

  test("A5/A6 valueCounts desc + mode pins deterministic tie-break") {
    val df = Seq(("d1", "x"), ("d1", "y"), ("d1", "y"), ("d2", "b"), ("d2", "a"))
      .toDF("day", "cond")
    assert(Analytics.valueCounts(df, "cond").collect()(0).getString(0) === "y")
    val modes = Analytics.modePerGroup(df, "day", "cond")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(modes("d1") === "y")
    assert(modes("d2") === "a") // 1-1 tie -> lexicographic
  }

  test("A8/A9/A10 percentile bounds, medians, outlier census") {
    val df = (Seq.fill(98)(10.0) ++ Seq(1000.0, -1000.0)).toDF("v")
    val b = Analytics.percentileBounds(df, Seq("v")).collect()(0)
    assert(b.getAs[Double]("v_q_lo") <= 10.0 && b.getAs[Double]("v_q_hi") >= 10.0)
    val c = Analytics.outlierCensus(df, "v").collect()(0)
    assert(c.getAs[Long]("outliers") === 2L && c.getAs[Long]("total") === 100L)
    assert(Analytics.medians(df, Seq("v")).collect()(0).getDouble(0) === 10.0)
  }

  test("A13 regression recovers a perfect line") {
    val df = (1 to 50).map(i => (i.toDouble, 3.0 * i + 7.0)).toDF("x", "y")
    val r = Analytics.regression(df, "x", "y").collect()(0)
    assert(r.getAs[Double]("slope") === 3.0)
    assert(r.getAs[Double]("intercept") === 7.0)
    assert(r.getAs[Double]("correlation") === 1.0)
  }

  test("W1/W2 trendAnalysis: diffs, zero-sum edge is 'cooling'") {
    val r = Analytics.trendAnalysis(weather, "t", "city", "temp")
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getString(4))).toMap
    // london diffs: +2, -1 -> avg 0.5, sum>0 warming
    assert(r("london")._1 === 0.5 && r("london")._2 === "warming")
    // tokyo diffs: 0 -> sum==0 is NOT warming (reference strict >)
    assert(r("tokyo")._2 === "cooling")
    // sydney: single day -> no diff rows at all
    assert(!r.contains("sydney"))
  }

  test("W3 pivotDaily produces one column per pinned key") {
    val p = Analytics.pivotDaily(weather, "t", "city", "temp",
      Seq("london", "sydney", "tokyo"))
    assert(p.columns.toSeq === Seq("date", "london", "sydney", "tokyo"))
    val first = p.collect()(0)
    assert(first.getString(0) === "2024-01-01" && first.getDouble(1) === 10.0)
  }

  test("W4 multiDayGroups filters single-day groups") {
    assert(Analytics.multiDayGroups(weather, "t", "city")
      .collect().map(_.getString(0)).toSeq === Seq("london", "tokyo"))
  }

  test("O4 topKPerGroup total order within group") {
    val df = Seq(("g", 1L, 5.0), ("g", 2L, 5.0), ("g", 3L, 1.0), ("h", 4L, 9.0))
      .toDF("grp", "id", "v")
    val top = Analytics.topKPerGroup(df, "grp", "v", 2, Seq("id"))
      .select("grp", "id", "rnk").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
    assert(top === Set(("g", 1L, 1), ("g", 2L, 2), ("h", 4L, 1)))
  }

  test("O4 heap topKPerGroup == window formulation on randomized data, " +
    "nulls and duplicate values included") {
    val rnd = new scala.util.Random(7)
    // dup-heavy values force the tie-break path; nulls pin NULLS LAST under
    // desc (heap treats null smallest, then flips — same as the SQL sort)
    val rows = (1 to 500).map { i =>
      (s"g${rnd.nextInt(7)}", i.toLong,
        if (rnd.nextInt(10) == 0) None else Some(rnd.nextInt(20).toDouble),
        s"payload$i")
    }
    val df = rows.toDF("grp", "id", "v", "extra").repartition(8)
    for (k <- Seq(1, 3, 50)) {
      val heap = Analytics.topKPerGroup(df, "grp", "v", k, Seq("id"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(4))).toSet
      val win = Analytics.topKPerGroupWindow(df, "grp", "v", k, Seq("id"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(4))).toSet
      assert(heap === win, s"heap/window divergence at k=$k")
    }
  }

  test("O4 topKPerGroup owns its string payloads — parquet columnar batches " +
    "don't corrupt heap-kept rows") {
    // vector-backed UTF8Strings point into a reused scan buffer; a shallow
    // row.copy() in the heap would read garbage once the batch advances.
    // Enough rows that the scan spans multiple batches, distinct payloads
    // so any stale pointer shows up as a wrong string.
    val dir = java.nio.file.Files.createTempDirectory("graft_topk").resolve("t").toString
    (1 to 20000).map(i => (s"g${i % 4}", i.toLong, (i % 997).toDouble, s"payload_str_$i"))
      .toDF("grp", "id", "v", "tag").write.parquet(dir)
    val disk = spark.read.parquet(dir)
    val heap = Analytics.topKPerGroup(disk, "grp", "v", 5, Seq("id"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(3), r.getInt(4))).toSet
    val win = Analytics.topKPerGroupWindow(disk, "grp", "v", 5, Seq("id"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(3), r.getInt(4))).toSet
    assert(heap === win)
    heap.foreach { case (_, id, tag, _) => assert(tag === s"payload_str_$id") }
  }

  test("O4 topKPerGroup keeps every input column and original order, k > group size") {
    val df = Seq(("g", 9L, 2.5, "a"), ("g", 1L, 7.5, "b")).toDF("grp", "id", "v", "tag")
    val out = Analytics.topKPerGroup(df, "grp", "v", 5, Seq("id"))
    assert(out.columns.toSeq === Seq("grp", "id", "v", "tag", "rnk"))
    val rows = out.collect().map(r =>
      (r.getString(0), r.getLong(1), r.getDouble(2), r.getString(3), r.getInt(4))).toSet
    assert(rows === Set(("g", 1L, 7.5, "b", 1), ("g", 9L, 2.5, "a", 2)))
  }

  test("empty input: aggregations return row with nulls/zero, windows return empty") {
    val empty = Seq.empty[(String, Timestamp, Double)].toDF("city", "t", "temp")
    assert(Analytics.basicStats(empty, "t", "temp").collect()(0).getLong(0) === 0L)
    assert(Analytics.trendAnalysis(empty, "t", "city", "temp").count() === 0L)
    assert(Analytics.modePerGroup(empty, "city", "temp").count() === 0L)
  }

  test("saltedAgg equals the direct aggregation (skew-resistant two-stage)") {
    val df = (1 to 1000).map(i => (if (i <= 990) "hot" else "cold", i.toDouble))
      .toDF("k", "v")
    val direct = df.groupBy("k").agg(
      round(sum($"v"), 4).as("value_sum"), count(lit(1)).as("n"),
      round(sum($"v") / count(lit(1)), 4).as("value_mean"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap
    val salted = Analytics.saltedAgg(df, "k", "v")
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap
    assert(salted === direct)
  }

  test("asofJoin: latest right row at-or-before each left ts, per key") {
    val left = Seq(
      ("u1", ts("2024-01-01 10:00:00"), 100L),
      ("u1", ts("2024-01-01 12:00:00"), 101L),
      ("u2", ts("2024-01-01 10:00:00"), 200L),
      ("u3", ts("2024-01-01 10:00:00"), 300L)  // no right rows at all
    ).toDF("k", "t", "lid")
    val right = Seq(
      ("u1", ts("2024-01-01 09:00:00"), 1.0),
      ("u1", ts("2024-01-01 11:00:00"), 2.0),
      ("u1", ts("2024-01-01 13:00:00"), 9.0),  // future: never matched
      ("u2", ts("2024-01-01 10:00:00"), 5.0)   // equal ts: inclusive match
    ).toDF("k", "t", "v")
    val got = Analytics.asofJoin(left, right, Seq("k"), "t", Seq("v"))
      .collect().map(r => r.getAs[Long]("lid") -> Option(r.getAs[Any]("asof_v"))).toMap
    assert(got(100L) === Some(1.0)) // 10:00 -> 09:00 value
    assert(got(101L) === Some(2.0)) // 12:00 -> 11:00, not 13:00
    assert(got(200L) === Some(5.0)) // inclusive at equal ts
    assert(got(300L) === None)      // no prior right row -> null
  }

  test("rollingActiveUsers: WAU is the trailing-window distinct union") {
    def t(day: Int, u: String) =
      (java.sql.Timestamp.valueOf(f"2024-01-$day%02d 10:00:00"), u)
    val df = Seq(
      t(1, "a"), t(1, "b"),          // day 1: {a,b}
      t(2, "a"),                     // day 2: {a}
      t(9, "c")                      // day 9: {c} — outside day 2's window
    ).toDF("ts", "user_id")
    val out = Analytics.rollingActiveUsers(df, "ts", "user_id", windowDays = 7)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out("2024-01-01") === ((2L, 2L)))       // {a,b}
    assert(out("2024-01-02") === ((1L, 2L)))       // day1 ∪ day2 = {a,b}
    assert(out("2024-01-09") === ((1L, 1L)))       // day 2 aged out: {c}
    assert(out.size === 3)                         // only observed days
  }

  test("rollingZScore: planted outlier flagged, warm-up rows null") {
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
    val rows = (1 to 30).map { i =>
      val v = if (i == 25) 100.0 else 10.0 + (i % 3) * 0.5 // stable baseline, one spike
      (i.toLong, "k", new java.sql.Timestamp(base + i * 60000L), v)
    }
    val df = rows.toDF("event_id", "event_type", "ts", "value")
    val out = Analytics.rollingZScore(df, "event_type", "ts", "value",
        lookback = 20, minObs = 5, zThreshold = 2.0)
      .collect().map(r => r.getLong(0) ->
        ((Option(r.getAs[java.lang.Double]("z")), Option(r.getAs[java.lang.Boolean]("is_anomaly"))))).toMap
    // rows 1..5 have < minObs preceding rows: no score
    (1 to 5).foreach(i => assert(out(i.toLong)._1.isEmpty, s"row $i should be warm-up"))
    assert(out(25L)._2 === Some(true), "the spike must be flagged")
    assert(out(24L)._2 === Some(false), "baseline rows must not be flagged")
  }

  test("sessionOverlapCount == naive unkeyed BETWEEN join (randomized, multi-day)") {
    // The decomposed plan (broadcast interior days + boundary-rank window)
    // must reproduce the naive range join exactly — including sessions
    // starting/ending mid-day, same-day sessions, ties at boundaries
    // (BETWEEN is inclusive both ends), and sessions spanning 0/1/2+
    // interior days. Randomized event times over a week, seeded.
    val rnd = new scala.util.Random(42)
    val base = java.sql.Timestamp.valueOf("2024-03-01 00:00:00").getTime
    val rows = (1 to 400).map { i =>
      val u = s"u${rnd.nextInt(6)}"
      // second-granularity over 7 days; duplicate some exact timestamps
      // so boundary tie-inclusivity is actually exercised
      val t = base + (rnd.nextInt(7 * 24 * 3600) / 7 * 7) * 1000L
      (u, new java.sql.Timestamp(t), i.toDouble)
    }
    val df = rows.toDF("user_id", "ts", "value")
    val got = Analytics.sessionOverlapCount(df, "user_id", "ts", gapMinutes = 360)
    val sess = Analytics.sessionize(df, "user_id", "ts", gapMinutes = 360)
      .groupBy(col("user_id"), col("session_id"))
      .agg(min(col("ts")).as("st"), max(col("ts")).as("en"))
    val naive = sess.as("s")
      .join(df.select(col("ts").as("ets")),
        col("ets") >= col("st") && col("ets") <= col("en"))
      .groupBy(col("user_id"), col("session_id"), col("st"), col("en"))
      .agg(count(lit(1)).as("n_overlap"))
      .select(col("user_id"), col("session_id"),
        date_format(col("st"), "yyyy-MM-dd HH:mm:ss").as("session_start"),
        date_format(col("en"), "yyyy-MM-dd HH:mm:ss").as("session_end"),
        col("n_overlap"))
    assert(got.count() === sess.count())
    assert(got.exceptAll(naive).isEmpty && naive.exceptAll(got).isEmpty,
      "decomposed interval count diverges from the naive BETWEEN join")
  }

  test("sessionsApplyBatch: random (ts, tie)-split folds == one-shot sessionState; " +
       "publish == sessionSummary; seeds, merges, new users, late rows") {
    import graft.analyze.Lifecycle
    val rnd = new scala.util.Random(44)
    val base = java.sql.Timestamp.valueOf("2024-03-01 00:00:00").getTime
    // minute-granularity with duplicated timestamps so same-ts rows
    // straddle random cuts (the frontier's tie discipline is exercised)
    val rows = (1 to 300).map { i =>
      val t = base + rnd.nextInt(5 * 24 * 60) / 3 * 3 * 60000L
      (s"u${rnd.nextInt(5)}", new java.sql.Timestamp(t), rnd.nextDouble() * 50, i.toLong)
    }
    val df = rows.toDF("user_id", "ts", "value", "event_id")
    val gap = 360
    val oneShot = Analytics.sessionState(df, "user_id", "ts", "value", gap)
    // publish(state) is bit-equal to the one-shot summary
    val pub = Analytics.sessionPublish(oneShot, "user_id")
    val summ = Analytics.sessionSummary(df, "user_id", "ts", "value", gap)
    assert(pub.exceptAll(summ).isEmpty && summ.exceptAll(pub).isEmpty,
      "sessionPublish(sessionState) must equal sessionSummary")
    // fold random (ts, tie)-ordered multi-way splits
    val ordered = rows.sortBy(r => (r._2.getTime, r._4))
    for (parts <- Seq(2, 4)) {
      val cutsAt = (1 until parts).map(_ * ordered.length / parts)
      val batches = (Seq(0) ++ cutsAt :+ ordered.length).sliding(2).map {
        case Seq(a, b) => ordered.slice(a, b)
      }.toSeq
      var st = Analytics.sessionState(
        batches.head.toDF("user_id", "ts", "value", "event_id"),
        "user_id", "ts", "value", gap)
      var fr = Lifecycle.scd2Frontier(
        batches.head.toDF("user_id", "ts", "value", "event_id"),
        "user_id", "ts", "event_id")
      batches.tail.foreach { b =>
        val r = Analytics.sessionsApplyBatch(st, fr,
          b.toDF("user_id", "ts", "value", "event_id"),
          "user_id", "ts", "value", "event_id", gap)
        st = r._1; fr = r._2
      }
      assert(st.exceptAll(oneShot).isEmpty && oneShot.exceptAll(st).isEmpty,
        s"$parts-way fold must equal the one-shot state")
    }
    // late rows (at or before the frontier) drop; the state is unchanged
    val full = Analytics.sessionState(df, "user_id", "ts", "value", gap)
    val frFull = Lifecycle.scd2Frontier(df, "user_id", "ts", "event_id")
    val replayed = Analytics.sessionsApplyBatch(full, frFull,
      df.limit(50), "user_id", "ts", "value", "event_id", gap)._1
    assert(replayed.exceptAll(full).isEmpty && full.exceptAll(replayed).isEmpty,
      "replaying already-folded rows must be a no-op")
  }

  test("rangeRolling frames by event TIME, not row count") {
    val df = Seq(
      ("u1", java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), 1.0),
      ("u1", java.sql.Timestamp.valueOf("2024-01-01 10:05:00"), 2.0), // within 10 min of first
      ("u1", java.sql.Timestamp.valueOf("2024-01-01 11:00:00"), 4.0)  // far gap: alone in frame
    ).toDF("user_id", "ts", "value")
    val out = Analytics.rangeRolling(df, "user_id", "ts", "value", rangeSeconds = 600)
      .collect().map(r => r.getString(1) -> (r.getAs[Long]("n_window"), r.getAs[Double]("window_sum"))).toMap
    assert(out("2024-01-01 10:00:00") === ((1L, 1.0)))
    assert(out("2024-01-01 10:05:00") === ((2L, 3.0))) // time-range includes 10:00
    // a ROWS(-1,0) frame would count 2 here; the TIME range correctly sees
    // only itself after the 55-minute gap
    assert(out("2024-01-01 11:00:00") === ((1L, 4.0)))
  }

  test("a15 invariant: HLL approx distinct within 10% of exact on real data") {
    // the driver can only rows-check a15 (sketch estimates are
    // engine-specific); this pins the ACCURACY. HLL is deterministic for
    // a given input, so the bound cannot flake.
    val r = Tables.lineitem(spark, "/root/testdata/sf0.01")
      .agg(org.apache.spark.sql.functions.countDistinct(
             org.apache.spark.sql.functions.col("l_partkey")).as("exact"),
           org.apache.spark.sql.functions.approx_count_distinct(
             org.apache.spark.sql.functions.col("l_partkey")).as("approx"))
      .collect()(0)
    val exact = r.getLong(0); val approx = r.getLong(1)
    assert(exact > 0)
    assert(math.abs(approx - exact).toDouble / exact < 0.1,
      s"HLL estimate $approx vs exact $exact exceeds 10% error")
  }
}
