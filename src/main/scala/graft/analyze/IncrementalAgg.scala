package graft.analyze

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incrementally maintained aggregates — the materialized-view pattern a
  * 100 TB pipeline uses instead of re-scanning the corpus per batch: keep
  * a compact per-(key, day) PARTIAL state table (count / exact decimal
  * sum / min / max — all merge-able), fold each new batch in with one
  * union + re-aggregate over the touched keys, and publish finals from
  * state alone. Re-aggregating the history is never needed; the state is
  * O(keys x days), not O(rows).
  *
  * The decomposition is exactly Spark's own partial-aggregate algebra
  * lifted to table granularity, so `finalize(merge(state(a), state(b)))
  * == directAgg(a union b)` holds bit-for-bit: the sum accumulates in
  * DECIMAL (order-free), count/min/max are trivially associative, and
  * the mean derives from (sum, count) at publish time only — a stored
  * mean would not merge. The driver oracle states that equality: the
  * a21 query computes via split + merge, the SQL aggregates directly.
  */
object IncrementalAgg {

  /** Mergeable partial state per (key, day). */
  def state(df: DataFrame, key: String, ts: String, value: String): DataFrame =
    df.groupBy(col(key), to_date(col(ts)).as("day"))
      .agg(count(col(value)).as("n"),
           sum(col(value).cast("decimal(18,6)")).as("sum_dec"),
           min(col(value)).as("vmin"), max(col(value)).as("vmax"))

  /** Merge two state frames (associative + commutative; chain freely).
    * One shuffle on (key, day) over the two COMPACT state frames.
    */
  def merge(a: DataFrame, b: DataFrame, key: String): DataFrame =
    a.unionByName(b).groupBy(col(key), col("day"))
      .agg(sum(col("n")).as("n"), sum(col("sum_dec")).as("sum_dec"),
           min(col("vmin")).as("vmin"), max(col("vmax")).as("vmax"))

  /** Publish final aggregates from state alone (no base-table access). */
  def finalize(st: DataFrame, key: String): DataFrame =
    st.select(col(key), date_format(col("day"), "yyyy-MM-dd").as("date"),
      col("n"),
      round(col("sum_dec"), 2).cast("double").as("value_sum"),
      round(col("vmin"), 4).as("value_min"), round(col("vmax"), 4).as("value_max"),
      (round(col("sum_dec").cast("double") / col("n") * 10000) / 10000.0
        + lit(0.0)).as("value_mean"))
}
