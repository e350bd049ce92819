package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.analyze.Lifecycle

class LifecycleSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("funnel: latest-achievable fold finds chains the staged-min recipe misses") {
    // signup at t=0 and t=100s; view only at t=150s; lag bound 100s.
    // Committing to the minimal signup (t=0) leaves the view out of
    // window; the chain through the LATER signup (100 -> 150) converts.
    val ev = Seq(
      (1L, ts("2024-01-01 00:00:00"), "signup"),
      (1L, ts("2024-01-01 00:01:40"), "signup"),
      (1L, ts("2024-01-01 00:02:30"), "view")
    ).toDF("user_id", "t", "et")
    val r = Lifecycle.funnel(ev, "user_id", "t", "et",
      Seq("signup", "view"), maxLagSeconds = 100)
      .orderBy("stage_idx").collect()
    assert(r.map(_.getAs[Long]("n_keys")).toSeq === Seq(1L, 1L))
  }

  test("funnel: conversions outside the lag window do not count") {
    val ev = Seq(
      (1L, ts("2024-01-01 00:00:00"), "signup"),
      (1L, ts("2024-01-01 03:00:00"), "view"), // 3h later, lag is 1h
      (2L, ts("2024-01-01 00:00:00"), "signup"),
      (2L, ts("2024-01-01 00:30:00"), "view")
    ).toDF("user_id", "t", "et")
    val r = Lifecycle.funnel(ev, "user_id", "t", "et",
      Seq("signup", "view"), maxLagSeconds = 3600)
      .orderBy("stage_idx").collect()
    assert(r.map(_.getAs[Long]("n_keys")).toSeq === Seq(2L, 1L))
    assert(r(1).getAs[Double]("pct_of_prev") === 0.5)
  }

  test("funnel: stages must happen in order (reverse order never converts)") {
    val ev = Seq(
      (1L, ts("2024-01-01 00:10:00"), "view"),
      (1L, ts("2024-01-01 00:20:00"), "signup")
    ).toDF("user_id", "t", "et")
    val r = Lifecycle.funnel(ev, "user_id", "t", "et",
      Seq("signup", "view"), maxLagSeconds = 86400)
      .orderBy("stage_idx").collect()
    assert(r.map(_.getAs[Long]("n_keys")).toSeq === Seq(1L, 0L))
  }

  test("funnel: same-timestamp chain converts (inclusive bounds)") {
    val ev = Seq(
      (1L, ts("2024-01-01 00:00:00"), "signup"),
      (1L, ts("2024-01-01 00:00:00"), "view")
    ).toDF("user_id", "t", "et")
    val r = Lifecycle.funnel(ev, "user_id", "t", "et",
      Seq("signup", "view"), maxLagSeconds = 10)
      .orderBy("stage_idx").collect()
    assert(r.map(_.getAs[Long]("n_keys")).toSeq === Seq(1L, 1L))
  }

  test("funnel matches brute-force chain search on random event sets") {
    val rnd = new scala.util.Random(7)
    val stages = Seq("s0", "s1", "s2")
    val lag = 50L
    val events = (0 until 40).flatMap { u =>
      (0 until 12).map { _ =>
        (u.toLong, new Timestamp(1704067200000L + rnd.nextInt(400) * 1000L),
          stages(rnd.nextInt(3)))
      }
    }
    val df = events.toDF("user_id", "t", "et")
    val got = Lifecycle.funnel(df, "user_id", "t", "et", stages, lag)
      .orderBy("stage_idx").collect()
      .map(r => r.getAs[Long]("n_keys")).toSeq
    // brute force: per user, exists-chain with both gaps in [0, lag]
    val byUser = events.groupBy(_._1).view.mapValues(_.map(e => (e._2.getTime / 1000, e._3)))
    def reaches(u: Long, k: Int): Boolean = {
      val evs = byUser(u)
      def chains(i: Int, after: Long, within: Long): Boolean =
        if (i > k) true
        else evs.exists { case (t, s) =>
          s == stages(i) && t >= after && (i == 0 || t <= within) &&
            chains(i + 1, t, t + lag)
        }
      chains(0, Long.MinValue, Long.MaxValue)
    }
    val want = (0 until 3).map(k => byUser.keys.count(u => reaches(u, k)).toLong)
    assert(got === want)
  }

  test("funnel: per-key event cap bounds hot-key state; cold keys unaffected") {
    // key 1 is the "bot": 5 000 funnel events, far over a cap of 64.
    // key 2 is a normal converting journey. Under the small cap the
    // query must (a) run (the point of the bound: state per key is <=
    // cap, not the key's own event count), (b) leave key 2's conversion
    // untouched, and (c) evaluate key 1 on its FIRST 64 events only —
    // here the bot's view events all come after position 64, so it
    // reaches signup but not view.
    val base = 1704067200000L
    val bot = (0 until 5000).map { i =>
      (1L, new Timestamp(base + i * 1000L), if (i < 64) "signup" else "view")
    }
    val normal = Seq(
      (2L, new Timestamp(base), "signup"),
      (2L, new Timestamp(base + 10000L), "view"))
    val df = (bot ++ normal).toDF("user_id", "t", "et")
    val r = Lifecycle.funnel(df, "user_id", "t", "et",
      Seq("signup", "view"), maxLagSeconds = 86400, maxEventsPerKey = 64)
      .orderBy("stage_idx").collect()
    assert(r.map(_.getAs[Long]("n_keys")).toSeq === Seq(2L, 1L))
    // uncapped (cap <= 0 disables) the bot's views DO convert
    val full = Lifecycle.funnel(df, "user_id", "t", "et",
      Seq("signup", "view"), maxLagSeconds = 86400, maxEventsPerKey = 0)
      .orderBy("stage_idx").collect()
    assert(full.map(_.getAs[Long]("n_keys")).toSeq === Seq(2L, 2L))
  }

  test("funnel cap: dropped events are observed, not silent") {
    val base = 1704067200000L
    val ev = ((0 until 100).map(i => (1L, new Timestamp(base + i * 1000L), "signup")) ++
      Seq((2L, new Timestamp(base), "signup")))
      .toDF("user_id", "t", "et")
    val st = Lifecycle.funnelStageTimes(ev, "user_id", "t", "et",
      Seq("signup", "view"), maxLagSeconds = 60, maxEventsPerKey = 10)
    st.collect()
    val metrics = st.queryExecution.observedMetrics(Lifecycle.funnelCapObservation)
    assert(metrics.getAs[Long]("dropped_events") === 90L) // key 1: 100 - 10
    assert(metrics.getAs[Long]("capped_keys") === 1L)     // key 2 under cap
  }

  test("funnel cap default: capped and uncapped agree on the registered w14 shape") {
    // the default cap (10 000) is far above any key's event count in the
    // testdata (max 85 at sf0.1) — the capped aggregate must be a pure
    // memory bound, not a semantic change, on every corpus this repo runs
    val d = "/root/testdata/sf0.001"
    val ev = Tables.events(spark, d)
    val stages = Seq("signup", "view", "click", "purchase")
    val capped = Lifecycle.funnel(ev, "user_id", "ts", "event_type", stages, 21600)
      .orderBy("stage_idx").collect().toSeq
    val exact = Lifecycle.funnel(ev, "user_id", "ts", "event_type", stages, 21600,
      maxEventsPerKey = 0).orderBy("stage_idx").collect().toSeq
    assert(capped === exact)
  }

  test("funnel cap-selection rule: densest-key measurement + order-of-magnitude headroom") {
    // the rule (Lifecycle.defaultEventCap scaladoc): cap >= 10x the
    // densest key's in-funnel event count, re-derived at each scale.
    // maxStageEventsPerKey is the measurement; it must count ONLY the
    // funnel's own stage events.
    val ev = Seq(
      (1L, ts("2024-01-01 00:00:00"), "signup"),
      (1L, ts("2024-01-01 00:01:00"), "view"),
      (1L, ts("2024-01-01 00:02:00"), "other"), // not a funnel stage
      (2L, ts("2024-01-01 00:00:00"), "view")
    ).toDF("user_id", "t", "et")
    assert(Lifecycle.maxStageEventsPerKey(ev, "user_id", "et",
      Seq("signup", "view")) === 2L)
    assert(Lifecycle.maxStageEventsPerKey(ev, "user_id", "et",
      Seq("purchase")) === 0L) // no stage events at all -> 0, not null
    // and the default cap honors the rule on the committed testdata
    val densest = Lifecycle.maxStageEventsPerKey(
      Tables.events(spark, "/root/testdata/sf0.001"), "user_id", "event_type",
      Seq("signup", "view", "click", "purchase"))
    assert(densest > 0L)
    assert(Lifecycle.defaultEventCap >= 10L * densest,
      s"default cap ${Lifecycle.defaultEventCap} lacks 10x headroom over densest $densest")
  }

  test("cohortRetention: counts and rates per first-seen cohort") {
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00")), (1L, ts("2024-01-02 10:00:00")),
      (2L, ts("2024-01-01 11:00:00")), (2L, ts("2024-01-08 09:00:00")),
      (3L, ts("2024-01-02 08:00:00")), (3L, ts("2024-01-03 08:00:00")),
      (3L, ts("2024-01-09 08:00:00"))
    ).toDF("user_id", "t")
    val r = Lifecycle.cohortRetention(ev, "t", "user_id", Seq(1, 7))
      .orderBy("cohort_date").collect()
    assert(r.length === 2)
    val c1 = r(0)
    assert(c1.getAs[String]("cohort_date") === "2024-01-01")
    assert(c1.getAs[Long]("n_keys") === 2L)
    assert(c1.getAs[Long]("retained_d1") === 1L) // user 1 back on day 2
    assert(c1.getAs[Long]("retained_d7") === 1L) // user 2 back on day 8
    assert(c1.getAs[Double]("rate_d1") === 0.5)
    val c2 = r(1)
    assert(c2.getAs[Long]("n_keys") === 1L)
    assert(c2.getAs[Long]("retained_d1") === 1L) // user 3 on day 3
    assert(c2.getAs[Long]("retained_d7") === 1L) // user 3 on day 9
  }

  test("gapFillDaily: missing days carry the last observation, flagged") {
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00"), 10.0),
      (1L, ts("2024-01-01 12:00:00"), 20.0),
      (1L, ts("2024-01-04 10:00:00"), 40.0)
    ).toDF("user_id", "t", "v")
    val r = Lifecycle.gapFillDaily(ev, "user_id", "t", "v")
      .orderBy("date").collect()
    assert(r.map(_.getAs[String]("date")).toSeq ===
      Seq("2024-01-01", "2024-01-02", "2024-01-03", "2024-01-04"))
    assert(r.map(_.getAs[Double]("value_mean")).toSeq === Seq(15.0, 15.0, 15.0, 40.0))
    assert(r.map(_.getAs[Boolean]("is_filled")).toSeq === Seq(false, true, true, false))
  }

  test("scd2Intervals: consecutive runs collapse, open run has null valid_to, " +
       "re-appearing values start NEW runs, null values are their own run") {
    val ev = Seq(
      (1L, ts("2024-01-01 00:00:00"), "gold", 1L),
      (1L, ts("2024-01-02 00:00:00"), "gold", 2L),      // same run
      (1L, ts("2024-01-03 00:00:00"), "silver", 3L),    // change
      (1L, ts("2024-01-04 00:00:00"), "gold", 4L),      // gold returns: NEW run
      (2L, ts("2024-01-01 00:00:00"), null, 5L),        // null run
      (2L, ts("2024-01-02 00:00:00"), null, 6L),        // same null run
      (2L, ts("2024-01-03 00:00:00"), "bronze", 7L)
    ).toDF("k", "t", "tier", "eid")
    val r = Lifecycle.scd2Intervals(ev, "k", "t", "tier", "eid")
      .orderBy("k", "valid_from").collect()
    assert(r.length === 5)
    val u1 = r.filter(_.getLong(0) == 1L)
    assert(u1.map(_.getString(1)).toSeq === Seq("gold", "silver", "gold"))
    assert(u1(0).getTimestamp(3) === u1(1).getTimestamp(2),
      "a run's valid_to is the NEXT run's valid_from")
    assert(u1(2).isNullAt(3), "the open run has null valid_to")
    val u2 = r.filter(_.getLong(0) == 2L)
    assert(u2.map(r0 => Option(r0.getString(1))).toSeq === Seq(None, Some("bronze")),
      "null tracked values form their own run, never merged into neighbors")
    assert(u2(0).getTimestamp(2) === ts("2024-01-01 00:00:00"))
  }

  test("scd2Intervals: the tie column pins run order under timestamp collisions") {
    val t0 = ts("2024-01-01 00:00:00")
    val ev = Seq((1L, t0, "b", 2L), (1L, t0, "a", 1L)).toDF("k", "t", "tier", "eid")
    val r = Lifecycle.scd2Intervals(ev, "k", "t", "tier", "eid")
      .orderBy("valid_from", "tier").collect()
    // eid order: a (eid 1) then b (eid 2) — two runs, a closed by b
    assert(r.map(_.getString(1)).sorted.toSeq === Seq("a", "b"))
    val a = r.find(_.getString(1) == "a").get
    val b = r.find(_.getString(1) == "b").get
    assert(a.getTimestamp(3) === t0 && b.isNullAt(3))
  }

  private def intervalSet(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), Option(r.getString(1)),
      r.getTimestamp(2), Option(r.getTimestamp(3)))).toSet

  test("scd2ApplyBatch: same-value batch rows EXTEND the open run (valid_from " +
       "preserved); changed values close it; untouched keys pass through") {
    val early = Seq(
      (1L, ts("2024-01-01 00:00:00"), "gold", 1L),
      (1L, ts("2024-01-02 00:00:00"), "silver", 2L),
      (2L, ts("2024-01-01 00:00:00"), "bronze", 3L)
    ).toDF("k", "t", "tier", "eid")
    val standing = Lifecycle.scd2Intervals(early, "k", "t", "tier", "eid")
    val batch = Seq(
      (1L, ts("2024-01-05 00:00:00"), "silver", 4L), // same value: extends
      (1L, ts("2024-01-06 00:00:00"), "gold", 5L),   // change: closes silver
      (3L, ts("2024-01-05 00:00:00"), "new", 6L)     // unseen key: fresh run
    ).toDF("k", "t", "tier", "eid")
    val out = Lifecycle.scd2ApplyBatch(standing, batch, "k", "t", "tier", "eid")
    assert(intervalSet(out) === Set(
      (1L, Some("gold"), ts("2024-01-01 00:00:00"), Some(ts("2024-01-02 00:00:00"))),
      (1L, Some("silver"), ts("2024-01-02 00:00:00"), Some(ts("2024-01-06 00:00:00"))),
      (1L, Some("gold"), ts("2024-01-06 00:00:00"), None),
      (2L, Some("bronze"), ts("2024-01-01 00:00:00"), None),
      (3L, Some("new"), ts("2024-01-05 00:00:00"), None)))
  }

  test("scd2ApplyBatch: late rows (at or before the open-run start) drop " +
       "instead of rewriting history") {
    val standing = Lifecycle.scd2Intervals(
      Seq((1L, ts("2024-01-05 00:00:00"), "gold", 1L)).toDF("k", "t", "tier", "eid"),
      "k", "t", "tier", "eid")
    val late = Seq(
      (1L, ts("2024-01-03 00:00:00"), "silver", 2L), // before the open run
      (1L, ts("2024-01-05 00:00:00"), "silver", 3L)  // at the open-run start
    ).toDF("k", "t", "tier", "eid")
    val out = Lifecycle.scd2ApplyBatch(standing, late, "k", "t", "tier", "eid")
    assert(intervalSet(out) === Set(
      (1L, Some("gold"), ts("2024-01-05 00:00:00"), None)))
  }

  test("scd2ApplyBatch: random multi-way time-splits fold to EXACTLY the " +
       "one-shot interval set (the w18 contract)") {
    val rnd = new scala.util.Random(77)
    val tiers = Array("a", "b", "c", null)
    // 300 observations over 6 keys, random values, strictly distinct
    // timestamps per key (the append-only change-log contract)
    val rows = (0 until 300).map { i =>
      (rnd.nextInt(6).toLong,
        new java.sql.Timestamp(ts("2024-01-01 00:00:00").getTime + i * 3600000L),
        tiers(rnd.nextInt(tiers.length)), i.toLong)
    }
    val all = rows.toDF("k", "t", "tier", "eid")
    val oneShot = intervalSet(Lifecycle.scd2Intervals(all, "k", "t", "tier", "eid"))
    // 4 random split points -> 5 batches folded in time order
    val cuts = Seq.fill(4)(rnd.nextInt(299) + 1).distinct.sorted
    val bounds = (0 +: cuts) :+ 300
    val batches = bounds.sliding(2).map { case Seq(lo, hi) =>
      rows.slice(lo, hi).toDF("k", "t", "tier", "eid")
    }.toSeq
    val folded = batches.tail.foldLeft(
      Lifecycle.scd2Intervals(batches.head, "k", "t", "tier", "eid")) { (st, b) =>
      Lifecycle.scd2ApplyBatch(st, b, "k", "t", "tier", "eid")
    }
    assert(intervalSet(folded) === oneShot)
  }

  test("scd2ApplyBatchFrontier: a same-timestamp change straddling the batch " +
       "cut folds exactly — the boundary the ts-only guard drops") {
    val t0 = ts("2024-01-05 00:00:00")
    val b1 = Seq((1L, t0, "gold", 1L)).toDF("k", "t", "tier", "eid")
    val b2 = Seq((1L, t0, "silver", 2L)).toDF("k", "t", "tier", "eid")
    val oneShot = intervalSet(
      Lifecycle.scd2Intervals(b1.unionByName(b2), "k", "t", "tier", "eid"))
    val st0 = Lifecycle.scd2Intervals(b1, "k", "t", "tier", "eid")
    val f0 = Lifecycle.scd2Frontier(b1, "k", "t", "eid")
    val (st1, f1) = Lifecycle.scd2ApplyBatchFrontier(
      st0, f0, b2, "k", "t", "tier", "eid")
    assert(intervalSet(st1) === oneShot,
      "frontier fold must match one-shot across a same-ts cut")
    assert(f1.collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2)))
      .toSeq === Seq((1L, t0, 2L)), "frontier advances to the folded row")
    // the documented scd2ApplyBatch caveat: its ts-only guard drops the
    // same-ts later-tie change, silently diverging from one-shot
    assert(intervalSet(
      Lifecycle.scd2ApplyBatch(st0, b2, "k", "t", "tier", "eid")) !== oneShot)
  }

  test("scd2ApplyBatchFrontier: rows at or before the frontier drop — " +
       "including between the open run's start and its last folded observation") {
    val b1 = Seq(
      (1L, ts("2024-01-01 00:00:00"), "gold", 1L),
      (1L, ts("2024-01-03 00:00:00"), "gold", 5L) // extends: run start stays 01-01
    ).toDF("k", "t", "tier", "eid")
    val st0 = Lifecycle.scd2Intervals(b1, "k", "t", "tier", "eid")
    val f0 = Lifecycle.scd2Frontier(b1, "k", "t", "eid")
    val late = Seq(
      (1L, ts("2024-01-02 00:00:00"), "silver", 9L), // mid-run: late, drops
      (1L, ts("2024-01-03 00:00:00"), "silver", 4L)  // at frontier ts, earlier tie
    ).toDF("k", "t", "tier", "eid")
    val (st1, f1) = Lifecycle.scd2ApplyBatchFrontier(
      st0, f0, late, "k", "t", "tier", "eid")
    assert(intervalSet(st1) === intervalSet(st0), "late rows rewrite nothing")
    assert(f1.collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2)))
      .toSeq === Seq((1L, ts("2024-01-03 00:00:00"), 5L)),
      "frontier unmoved by dropped rows")
  }

  test("scd2ApplyBatchFrontier: random multi-way (ts, tie) splits under heavy " +
       "timestamp collisions fold to EXACTLY the one-shot set") {
    val rnd = new scala.util.Random(19)
    val tiers = Array("a", "b", "c", null)
    // 10 observations share each timestamp (collisions within and across
    // keys); eid is the global arrival order, so cutting anywhere in it
    // is a legal append-only batch boundary — including mid-collision
    val rows = (0 until 300).map { i =>
      (rnd.nextInt(6).toLong,
        new java.sql.Timestamp(ts("2024-01-01 00:00:00").getTime + (i / 10) * 3600000L),
        tiers(rnd.nextInt(tiers.length)), i.toLong)
    }
    val all = rows.toDF("k", "t", "tier", "eid")
    val oneShot = intervalSet(Lifecycle.scd2Intervals(all, "k", "t", "tier", "eid"))
    val cuts = Seq.fill(4)(rnd.nextInt(299) + 1).distinct.sorted
    val bounds = (0 +: cuts) :+ 300
    val batches = bounds.sliding(2).map { case Seq(lo, hi) =>
      rows.slice(lo, hi).toDF("k", "t", "tier", "eid")
    }.toSeq
    val init = (Lifecycle.scd2Intervals(batches.head, "k", "t", "tier", "eid"),
      Lifecycle.scd2Frontier(batches.head, "k", "t", "eid"))
    val (folded, _) = batches.tail.foldLeft(init) { case ((st, f), b) =>
      Lifecycle.scd2ApplyBatchFrontier(st, f, b, "k", "t", "tier", "eid")
    }
    assert(intervalSet(folded) === oneShot)
  }
}
