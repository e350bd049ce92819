package graft.joins

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.BloomFunctions
import org.apache.spark.util.sketch.BloomFilter

/** Join-side runtime filtering — the "small side prunes the big scan"
  * pattern a 100 TB join lives or dies by. Spark's own runtime filters
  * (DPP, `InjectRuntimeFilter`) fire only under planner heuristics and
  * creation-threshold confs; this makes the pattern an explicit,
  * always-on operator for the canonical case: a selective dimension/key
  * set semi-joining an enormous fact table.
  *
  * Mechanics: build a Bloom filter over the small side's join keys at
  * the driver (`treeAggregate` of `BloomFilter.create` merges — executor
  * partials, one small object to the driver; same construction as
  * `Text.bloomDecontaminate`, and same reason not to use
  * `stat.bloomFilter`, which silently clamps to the runtime-filter conf
  * cap), then probe it with a codegen'd native expression
  * ([[org.apache.spark.sql.graft.BloomMightContainLong]]) in the BIG
  * side's scan stage. Rows that cannot match are dropped before the
  * shuffle — at fpp=1% and a 5%-selective key set, ~94% of the fact
  * shuffle disappears. The exact semi-join still runs afterward on the
  * survivors, so Bloom false positives never reach the result: output
  * is IDENTICAL to the plain semi-join (the driver oracle states it as
  * a plain IN subquery).
  */
object Joins {

  /** Serialized Bloom sketch of a long key column. One job over the
    * small side; the returned bytes embed in probe expressions.
    */
  def longKeyBloom(keys: DataFrame, keyCol: String,
                   expectedItems: Long, fpp: Double = 0.01): Array[Byte] = {
    val bloom = keys.select(col(keyCol).cast("long")).na.drop().rdd
      .treeAggregate(BloomFilter.create(expectedItems, fpp))(
        (f, row) => { f.putLong(row.getLong(0)); f },
        (a, b) => { a.mergeInPlace(b); a })
    val bos = new java.io.ByteArrayOutputStream()
    bloom.writeTo(bos)
    bos.toByteArray
  }

  /** Left-semi join of `big` against `small`'s keys with a Bloom
    * pre-prune on the big side. Exact: false positives are removed by
    * the semi-join; false negatives cannot exist. `expectedItems`
    * should bound the small side's distinct key count — oversizing only
    * costs sketch bytes, undersizing costs fpp (never correctness).
    */
  def bloomPruneLeftSemi(big: DataFrame, small: DataFrame,
                         bigKey: String, smallKey: String,
                         expectedItems: Long, fpp: Double = 0.01): DataFrame = {
    val sketch = longKeyBloom(small, smallKey, expectedItems, fpp)
    // alias the small side's key: with bigKey == smallKey (or big also
    // carrying a column named smallKey) the unqualified reference would
    // be ambiguous and fail at analysis — the alias cannot collide with
    // anything user-named on the big side
    val keys = small.select(col(smallKey).as("__bloom_key"))
    big.filter(BloomFunctions.bloomContainsLong(col(bigKey), sketch))
      .join(keys, col(bigKey) === col("__bloom_key"), "leftsemi")
  }
}
