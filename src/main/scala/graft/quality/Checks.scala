package graft.quality

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality validation (the Deequ/expectations shape):
  * a check suite compiles to ONE conditional-aggregate pass over the
  * table and publishes a uniform report row per check —
  * `(check_name, col_name, metric, threshold, passed)` — whether the
  * check passes or not. A curation pipeline gates a 100 TB ingest on
  * exactly this report: the scan cost is one pass regardless of how
  * many checks ride it (conditional counts fuse into the same
  * aggregate; each exact `uniqueness` adds one branch of the expand —
  * swap it for `approx_count_distinct` when ±2% suffices and the
  * expand collapses back to one branch).
  *
  * Numeric discipline: every metric is a ratio of COUNTS (or an exact
  * min/max) — integer-valued doubles and correctly-rounded single
  * divisions, bit-identical on any engine with no decimal staging.
  *
  * Reference analog: the reference validates records by presence of
  * required keys only (/root/reference/src/transform.py:21-34); this
  * family is that idea grown into a declarative, single-scan suite.
  */
object Checks {

  /** One declarative check: `metric` is an aggregate Column over the
    * target table; the check passes when metric ≥ threshold (or ≤ when
    * `atLeast` = false). Row-scoped checks additionally carry
    * `rowPred` — the per-row property whose violation count the metric
    * aggregates — which is what lets ONE declared suite drive both the
    * aggregate gate ([[run]]/[[runByPeriod]]) and the row router
    * ([[quarantine]]). Aggregate-only checks (uniqueness, row_count)
    * have no row-local meaning and leave it None.
    */
  final case class Check(name: String, column: String, metric: Column,
                         threshold: Double, atLeast: Boolean = true,
                         rowPred: Option[Column] = None)

  // vacuous truth on zero rows: per-row property checks cannot be
  // violated by an empty table (under ANSI mode the plain 0/0 division
  // even ABORTS the whole suite with DIVIDE_BY_ZERO; pre-ANSI it
  // published a NULL metric and — worse — a NULL `passed` that a gate
  // filtering `passed = false` silently misses); catching empty inputs
  // is [[rowCountAtLeast]]'s job, by design
  private def ratio(num: Column): Column =
    coalesce(try_divide(num.cast("double"), count(lit(1)).cast("double")),
      lit(1.0))

  /** Non-null fraction ≥ threshold. Row property: the value is present. */
  def completeness(c: String, threshold: Double): Check =
    Check("completeness", c, ratio(count(col(c))), threshold,
      rowPred = Some(col(c).isNotNull))

  /** Exact distinct fraction ≥ threshold (1.0 = key candidate). */
  def uniqueness(c: String, threshold: Double): Check =
    Check("uniqueness", c, ratio(countDistinct(col(c))), threshold)

  /** Observed minimum ≥ threshold. Row property: value ≥ threshold —
    * null rows pass vacuously (min() skips nulls; nulls are
    * [[completeness]]'s business, in the aggregate and per row alike).
    */
  def minValue(c: String, threshold: Double): Check =
    Check("min_value", c, min(col(c)).cast("double"), threshold,
      rowPred = Some(col(c).isNull || col(c) >= lit(threshold)))

  /** Observed maximum ≤ threshold. Row property: value ≤ threshold
    * (nulls pass, the [[minValue]] convention). */
  def maxValue(c: String, threshold: Double): Check =
    Check("max_value", c, max(col(c)).cast("double"), threshold, atLeast = false,
      rowPred = Some(col(c).isNull || col(c) <= lit(threshold)))

  /** Fraction of rows whose value sits in the allowed set ≥ threshold.
    * Row property: value IS in the set — a null is not in any set and
    * fails, exactly as the metric never counts it. */
  def inSet(c: String, values: Seq[String], threshold: Double): Check =
    Check("in_set", c, ratio(count(when(col(c).isin(values: _*), lit(1)))), threshold,
      rowPred = Some(coalesce(col(c).isin(values: _*), lit(false))))

  /** Fraction of rows matching the (partial-match) regex ≥ threshold.
    * Row property: the value matches (nulls fail, as the metric never
    * counts them). */
  def matches(c: String, regex: String, threshold: Double): Check =
    Check("matches", c, ratio(count(when(col(c).rlike(regex), lit(1)))), threshold,
      rowPred = Some(coalesce(col(c).rlike(regex), lit(false))))

  /** Row count ≥ threshold. */
  def rowCountAtLeast(threshold: Double): Check =
    Check("row_count", "*", count(lit(1)).cast("double"), threshold)

  /** Fraction of rows satisfying an ARBITRARY predicate ≥ threshold —
    * the escape hatch (Deequ's `satisfies`) for cross-column and
    * conditional invariants no single-column check can state
    * ("discounted rows must carry a ship date", "bulk lines must be
    * discounted"). `label` names the constraint in the report's
    * col_name slot (there is no single column to blame). Row property:
    * the predicate itself — a NULL verdict fails, exactly as the
    * metric never counts it (the inSet/matches convention: state
    * null-tolerance inside the predicate where it's intended).
    */
  def satisfies(label: String, pred: Column, threshold: Double): Check =
    Check("satisfies", label, ratio(count(when(pred, lit(1)))), threshold,
      rowPred = Some(coalesce(pred, lit(false))))

  /** Compile the suite into one aggregate pass + the report explode. */
  def run(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "empty check suite")
    val aggd = df.agg(checks.head.metric.as("m0"),
      checks.tail.zipWithIndex.map { case (c, i) => c.metric.as(s"m${i + 1}") }: _*)
    val rows = checks.zipWithIndex.map { case (c, i) =>
      struct(lit(c.name).as("check_name"), lit(c.column).as("col_name"),
        (round(col(s"m$i") * 1000000) / 1000000.0 + lit(0.0)).as("metric"),
        lit(c.threshold).as("threshold"),
        // min/max on an empty table (or an all-null column) aggregate
        // to NULL — no value exists to violate the bound, so the check
        // vacuously passes instead of publishing an unfilterable NULL
        (col(s"m$i").isNull ||
          (if (c.atLeast) col(s"m$i") >= lit(c.threshold)
           else col(s"m$i") <= lit(c.threshold))).as("passed"))
    }
    aggd.select(explode(array(rows: _*)).as("__r")).select(col("__r.*"))
  }

  /** Row-level quarantine — the routing step the aggregate report
    * cannot do: WHERE did the bad rows go. The same declared suite
    * drives it (each row-scoped check's `rowPred` is the property whose
    * violations the metric counts); every input row comes back with
    * `failed_checks`, the declaration-ordered array of the
    * "check:column" labels it violates — empty means clean, so the
    * caller routes with one filter each way and a quarantined row
    * carries its full reason list for triage/replay. Thresholds play no
    * part here by design: the threshold is the AGGREGATE gate's
    * tolerance, while a router must route every violating row.
    *
    * Aggregate-only checks (uniqueness, row_count) have no row-local
    * meaning and are rejected loudly — gate those with [[run]]; route
    * duplicate rows with the dedup family, which is built for it.
    *
    * Scale shape: ONE map-side pass — per-row predicate evaluation into
    * an array literal filter, no shuffle, no join, nothing aggregated —
    * the cheapest possible posture for a 100 TB ingest router.
    */
  def quarantine(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "empty check suite")
    val unsupported = checks.filter(_.rowPred.isEmpty)
    require(unsupported.isEmpty,
      "quarantine needs row-scoped checks; aggregate-only: " +
        unsupported.map(c => s"${c.name}:${c.column}").mkString(", ") +
        " — gate those with run()")
    val reasons = checks.map(c =>
      when(!c.rowPred.get, lit(s"${c.name}:${c.column}")))
    df.withColumn("failed_checks",
      filter(array(reasons: _*), r => r.isNotNull))
  }

  /** The suite's metrics computed PER PERIOD — the metric-history shape
    * behind drift detection (Deequ's anomaly-detection input): one
    * grouped conditional-aggregate pass (the [[run]] scan with a
    * group-by key), one row per (period, check). `ratio`'s per-group
    * `count(*)` denominator makes every metric period-local. Thresholds
    * and `passed` are deliberately absent — history rows are
    * observations; judgment happens in [[driftReport]] (or a plain
    * threshold gate over the latest period).
    */
  def runByPeriod(df: DataFrame, period: Column, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "empty check suite")
    val aggd = df.groupBy(period.as("period"))
      .agg(checks.head.metric.as("m0"),
        checks.tail.zipWithIndex.map { case (c, i) => c.metric.as(s"m${i + 1}") }: _*)
    val rows = checks.zipWithIndex.map { case (c, i) =>
      struct(lit(c.name).as("check_name"), lit(c.column).as("col_name"),
        (round(col(s"m$i") * 1000000) / 1000000.0 + lit(0.0)).as("metric"))
    }
    aggd.select(col("period"), explode(array(rows: _*)).as("__r"))
      .select(col("period"), col("__r.*"))
  }

  /** Drift detection over a metric history (the Deequ anomaly-check
    * shape): the LATEST period's metrics judged against the TRAILING
    * periods' mean — "is today's completeness where it has been?" — the
    * gate a one-snapshot suite cannot express (a corpus can pass every
    * absolute threshold while its quality silently slides). Input is a
    * [[runByPeriod]] frame (period, check_name, col_name, metric);
    * output mirrors the [[run]] report with the evidence attached:
    * (check_name, col_name, metric, trailing_mean, delta, threshold,
    * passed), where `delta` = |metric − trailing_mean| and the check
    * passes when delta ≤ `maxAbsDelta`. A check with NO trailing
    * history passes vacuously with a null trailing_mean/delta (first
    * run — nothing to drift from; the [[run]] min/max null convention).
    *
    * Numeric discipline: the trailing mean is a decimal-staged sum of
    * the (already 6-dp-rounded) per-period metrics over an exact count —
    * partial-aggregation order cannot perturb it, and the DuckDB oracle
    * replays it bit-for-bit. History frames are period-count-sized, so
    * the latest-period scalar broadcasts.
    */
  def driftReport(history: DataFrame, maxAbsDelta: Double): DataFrame = {
    val latest = history.agg(max(col("period")).as("__latest"))
    val cur = history.crossJoin(broadcast(latest))
      .filter(col("period") === col("__latest"))
      .select(col("check_name"), col("col_name"), col("metric"))
    val trail = history.crossJoin(broadcast(latest))
      .filter(col("period") < col("__latest"))
      .groupBy(col("check_name"), col("col_name"))
      .agg((sum(col("metric").cast("decimal(20,10)")).cast("double")
        / count(lit(1))).as("__tm"))
    cur.join(trail, Seq("check_name", "col_name"), "left")
      .select(col("check_name"), col("col_name"), col("metric"),
        (round(col("__tm") * 1000000) / 1000000.0 + lit(0.0)).as("trailing_mean"),
        (round(abs(col("metric") - col("__tm")) * 1000000) / 1000000.0
          + lit(0.0)).as("delta"),
        lit(maxAbsDelta).as("threshold"),
        (col("__tm").isNull ||
          abs(col("metric") - col("__tm")) <= lit(maxAbsDelta)).as("passed"))
  }

  /** Referential-integrity report row: the fraction of child rows whose
    * key exists in the parent's key domain (null child keys count as
    * orphans — completeness is its own check). One left join against
    * the DISTINCT parent keys — dim-sized parents broadcast; at 100 TB
    * fact-to-fact scale, put a bloom filter of the parent domain in
    * front (the t18 decontamination shape) and this join only sees the
    * probable-orphan remainder.
    */
  def referential(child: DataFrame, childCol: String,
                  parent: DataFrame, parentCol: String,
                  threshold: Double): DataFrame = {
    val keys = parent.select(col(parentCol).as(childCol)).distinct()
      .withColumn("__hit", lit(1))
    child.select(col(childCol)).join(keys, Seq(childCol), "left")
      .agg(coalesce(try_divide(count(col("__hit")).cast("double"),
        count(lit(1)).cast("double")), lit(1.0)).as("__m"))
      .select(lit("referential").as("check_name"),
        lit(childCol).as("col_name"),
        (round(col("__m") * 1000000) / 1000000.0 + lit(0.0)).as("metric"),
        lit(threshold).as("threshold"),
        (col("__m") >= lit(threshold)).as("passed"))
  }

  /** [[referential]]'s fact-to-fact scale form — the bloom prefilter its
    * own scaladoc prescribes (the t18 decontamination shape, made real):
    * a driver-built Bloom filter of the DISTINCT parent key domain
    * screens the child scan first, so the confirming join sees only the
    * PROBABLE-HIT remainder. Blooms have no false negatives, so a
    * screened-out key is a definite orphan and the join exists purely to
    * demote false positives — the answer is IDENTICAL to [[referential]]
    * (gated in ChecksSpec; the dq5 oracle replays the PLAIN join).
    *
    * Crossover law (measured, docs/SCALE_PROBE.md round-18): at a 4:1
    * child:parent key-only geometry the plain shuffle join WINS even at
    * a 90% orphan rate — the bloom pays an O(parent) build plus an extra
    * child pass that a modest join shuffle never costs. The screen's
    * regime is a parent domain too large to broadcast but whose
    * ~14-bit/key filter ships task-side, against a child whose keys
    * outnumber the parent ~100:1 — there the join's O(child) network
    * becomes O(child) map-side probes.
    * The filter ships task-side like the t18 sketch (~1.2 GB per billion
    * keys at fpp 1e-3 — driver-budget class; beyond that, Spark's own
    * `bloomFilter` DataFrameStatFunctions path or a semi-join stays the
    * fallback). Integral keys only (putLong probes, no per-row boxing).
    *
    * Build cost discipline (the ×100 probe caught the first cut paying
    * THREE parent-distinct shuffles): duplicate inserts are idempotent in
    * a Bloom, so the build aggregates the RAW key projection map-side —
    * zero shuffle — sized by the parent's metadata-cheap row count (an
    * upper bound on the distinct domain; a duplicate-heavy parent just
    * yields a lower-fpp filter). The confirming semi join likewise takes
    * the raw projection — LeftSemi deduplicates by construction.
    */
  def referentialBloom(child: DataFrame, childCol: String,
                       parent: DataFrame, parentCol: String,
                       threshold: Double, fpp: Double = 0.001): DataFrame = {
    // BOTH sides must be integral: the build casts the parent to long for
    // putLong, and a fractional/string parent would silently truncate or
    // null — the bloom would then disagree with referential's raw-equality
    // join, violating the answer-invisible contract the probe gate relies on
    val integral = Set[org.apache.spark.sql.types.DataType](
      org.apache.spark.sql.types.ByteType, org.apache.spark.sql.types.ShortType,
      org.apache.spark.sql.types.IntegerType, org.apache.spark.sql.types.LongType)
    require(integral.contains(child.schema(childCol).dataType),
      s"referentialBloom needs an integral key; got " +
        s"${child.schema(childCol).dataType.simpleString} — use referential")
    require(integral.contains(parent.schema(parentCol).dataType),
      s"referentialBloom needs an integral parent key; got " +
        s"${parent.schema(parentCol).dataType.simpleString} — use referential")
    val keys = parent.select(col(parentCol).cast("long").as(childCol))
      .filter(col(childCol).isNotNull)
    val expected = math.max(parent.count(), 1L)
    // build parallelism is bounded: every partial is a FULL-size zeroed
    // bitmap (~14 bits/key), so partials × size — not the insert pass —
    // is the build's cost; 8 coalesced partitions keep inserts parallel
    // while the merge moves a bounded number of partials (the ×100 probe
    // measured the 32-partial build dominating the whole check)
    val bloom = keys.coalesce(8).rdd.treeAggregate(
      org.apache.spark.util.sketch.BloomFilter.create(expected, fpp))(
      (f, row) => { f.putLong(row.getLong(0)); f },
      (a, b) => { a.mergeInPlace(b); a })
    val bos = new java.io.ByteArrayOutputStream()
    bloom.writeTo(bos)
    val bytes = bos.toByteArray
    // candidate = bloom-passing child keys only; everything else is a
    // definite orphan and never reaches the join
    val candidate = child.select(col(childCol).cast("long").as(childCol))
      .filter(col(childCol).isNotNull &&
        org.apache.spark.sql.graft.BloomFunctions
          .bloomContainsLong(col(childCol), bytes))
    val resolved = candidate
      .join(keys, Seq(childCol), "left_semi")
      .agg(count(lit(1)).cast("double").as("__res"))
    val total = child.agg(count(lit(1)).cast("double").as("__tot"))
    resolved.crossJoin(broadcast(total))
      .select(coalesce(try_divide(col("__res"), col("__tot")), lit(1.0)).as("__m"))
      .select(lit("referential").as("check_name"),
        lit(childCol).as("col_name"),
        (round(col("__m") * 1000000) / 1000000.0 + lit(0.0)).as("metric"),
        lit(threshold).as("threshold"),
        (col("__m") >= lit(threshold)).as("passed"))
  }
}
