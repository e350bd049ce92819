// In the Spark namespace for the same reason as VectorExpressions: the
// Column <-> Expression bridge is private[sql].
package org.apache.spark.sql.graft

import java.io.ByteArrayInputStream

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Content-keyed wrapper for the serialized sketch bytes. A bare
  * `Array[Byte]` case-class field compares by ARRAY IDENTITY, so two
  * semantically identical probe expressions would never compare equal —
  * canonicalization, common-subexpression elimination and exchange reuse
  * could then never unify two references to the same sketch, and a plan
  * probing the same sketch twice would ship two multi-MB copies in the
  * task binary. `equals` compares content; `hashCode` is memoized once
  * (the sketch can be MBs — a per-call scan would make every
  * canonicalization pass O(sketch bytes)).
  */
final class BloomSketchBytes(val bytes: Array[Byte]) extends Serializable {
  override def equals(o: Any): Boolean = o match {
    case b: BloomSketchBytes => (b eq this) || java.util.Arrays.equals(bytes, b.bytes)
    case _ => false
  }
  override lazy val hashCode: Int = java.util.Arrays.hashCode(bytes)
}

/** Membership probe against a Bloom filter built at the driver (a
  * `treeAggregate` of `BloomFilter.create` merges — see
  * `Text.bloomDecontaminate` for why not `stat.bloomFilter`) and shipped
  * to executors inside the expression — the no-shuffle decontamination
  * primitive: the corpus side never joins, it streams past a few-MB
  * sketch.
  *
  * Probes via `mightContainBinary` on the UTF8 bytes — the exact
  * counterpart of the builder's `putBinary(utf8)` — so build and probe
  * agree byte-for-byte. Bloom guarantees no false negatives; the
  * false-positive rate is the builder's `fpp`.
  *
  * The task ships only `bloomBytes` (referencing the materialized filter
  * from codegen would serialize the sketch a second time); each task
  * lazily deserializes it once and the generated code probes through a
  * bound reference to this expression — no UDF, no boxed lambda.
  */
case class BloomMightContainString(child: Expression, sketch: BloomSketchBytes)
  extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_bloom_contains"

  @transient private lazy val filter: BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(sketch.bytes))

  def contains(s: UTF8String): Boolean = filter.mightContainBinary(s.getBytes)

  protected override def nullSafeEval(input: Any): Any =
    contains(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomProbe", this, classOf[BloomMightContainString].getName)
    defineCodeGen(ctx, ev, c => s"$ref.contains($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Long-key twin of [[BloomMightContainString]] — probes via
  * `mightContainLong`, the exact counterpart of a builder that
  * `putLong`s, so join keys never round-trip through strings. This is
  * the probe side of the bloom-prune join (graft.joins.Joins): the big
  * side streams past the sketch in its scan stage and rows that cannot
  * match never reach the shuffle.
  */
case class BloomMightContainLong(child: Expression, sketch: BloomSketchBytes)
  extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] =
    Seq(org.apache.spark.sql.types.LongType)
  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_bloom_contains_long"

  @transient private lazy val filter: BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(sketch.bytes))

  def contains(v: Long): Boolean = filter.mightContainLong(v)

  protected override def nullSafeEval(input: Any): Any =
    contains(input.asInstanceOf[Long])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomProbeL", this, classOf[BloomMightContainLong].getName)
    defineCodeGen(ctx, ev, c => s"$ref.contains($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Count of a string array's elements that might be in the Bloom filter
  * — the hot-path form of the probe. `size(filter(arr, g =>
  * bloomContains(g)))` would route through ArrayFilter, a
  * CodegenFallback HOF: interpreted dispatch per element plus an
  * intermediate filtered array allocated just to measure it. This is one
  * tight loop per row. Null elements count as not-contained (shingle
  * arrays never contain them).
  */
case class BloomCountContained(child: Expression, sketch: BloomSketchBytes)
  extends StringArrayHashExpression {
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "graft_bloom_count"

  @transient private lazy val filter: BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(sketch.bytes))

  def countContained(arr: org.apache.spark.sql.catalyst.util.ArrayData): Long = {
    val n = arr.numElements()
    var c = 0L
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i) &&
          filter.mightContainBinary(arr.getUTF8String(i).getBytes)) c += 1
      i += 1
    }
    c
  }

  protected override def nullSafeEval(input: Any): Any =
    countContained(input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomCounter", this, classOf[BloomCountContained].getName)
    defineCodeGen(ctx, ev, c => s"$ref.countContained($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Column-API entry points (wrap the raw bytes in the content-keyed
  * [[BloomSketchBytes]] so equal sketches make equal expressions).
  */
object BloomFunctions {
  def bloomContains(c: Column, bloomBytes: Array[Byte]): Column =
    ExpressionUtils.column(BloomMightContainString(
      ExpressionUtils.expression(c), new BloomSketchBytes(bloomBytes)))
  def bloomCountContained(c: Column, bloomBytes: Array[Byte]): Column =
    ExpressionUtils.column(BloomCountContained(
      ExpressionUtils.expression(c), new BloomSketchBytes(bloomBytes)))
  def bloomContainsLong(c: Column, bloomBytes: Array[Byte]): Column =
    ExpressionUtils.column(BloomMightContainLong(
      ExpressionUtils.expression(c), new BloomSketchBytes(bloomBytes)))
}
