package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graft.{VectorFunctions => Impl}

/** Public Column API for the native codegen vector expressions (see
  * org.apache.spark.sql.graft.VectorExpressions for why the
  * implementations live in the Spark namespace).
  */
object VectorFunctions {
  /** Σ a_i·b_i as a whole-stage-codegen primitive loop. */
  def dotNative(a: Column, b: Column): Column = Impl.dotNative(a, b)
  /** Cosine similarity (null on zero norms), codegen'd single pass. */
  def cosineNative(a: Column, b: Column): Column = Impl.cosineNative(a, b)
  /** Integer dot over int8 arrays (array<tinyint> → bigint), codegen'd. */
  def int8DotNative(a: Column, b: Column): Column = Impl.int8DotNative(a, b)
  /** One-pass symmetric int8 quantization (array<double> → array<tinyint>). */
  def int8QuantizeNative(v: Column): Column = Impl.int8QuantizeNative(v)
  /** L∞ norm max|x_i| (the int8 quantization scale), codegen'd. */
  def maxAbsNative(v: Column): Column = Impl.maxAbsNative(v)
  /** Ids of the `nProbes` nearest centroids by cosine (cos desc, id asc) —
    * IVF cell assignment (nProbes = 1) and probe selection in one codegen'd
    * expression; the centroid matrix ships as a task reference object, not
    * as inlined literals.
    */
  def nearestCellsNative(v: Column, centroids: Seq[Seq[Double]], nProbes: Int): Column =
    Impl.nearestCellsNative(v, centroids, nProbes)
}
