package graft

/** Verify-mode switch for the candidate-pair dumps.
  *
  * Twelve queries (d13/d14/d15/d16/d19, e2/e3, s2/s4/s7/s8, t7) materialize
  * their engine-keyed candidate sets to `target/<q>_candidates/` so the
  * DuckDB oracle can replay the verify/rescore stage over the IDENTICAL
  * pair set. That write is pure oracle plumbing: the published result is
  * the same whether the verify stage reads the parquet'd dump back or the
  * in-memory candidate frame (gated by PlanQualitySpec's dump-parity
  * test). Leaving the write in the measured path made Bench time a
  * parquet round-trip per query (~+0.2–0.4 s each at sf0.1) that no user
  * of the operator pays — the round-13 verdict's top finding.
  *
  * Default OFF (Bench, specs, library users): the queries run their pure
  * search/dedup plan. [[graft.Verify]] enables it for the driver's
  * correctness run, where the dumps are load-bearing — every dump-replay
  * oracle reads the dump its own query wrote THIS run.
  *
  * A plain volatile flag (not a conf) because the queries are invoked
  * through the static `SparkEntry.queries` registry from mains and specs
  * that share one JVM; both mains set it once before any query runs, so
  * there is no read-write race to order.
  */
object CandidateDumps {
  @volatile private var on: Boolean = false

  def enabled: Boolean = on
  def enable(): Unit = { on = true }

  /** Scoped enable for specs exercising the dumping variant. */
  def withEnabled[T](f: => T): T = {
    val prev = on
    on = true
    try f finally on = prev
  }
}
