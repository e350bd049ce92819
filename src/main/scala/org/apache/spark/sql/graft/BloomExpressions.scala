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

/** Membership probe against a Bloom filter built at the driver
  * (`df.stat.bloomFilter`, public sketch API) and shipped to executors
  * inside the expression — the no-shuffle decontamination primitive: the
  * corpus side never joins, it streams past a few-MB sketch.
  *
  * Probes via `mightContainBinary` on the UTF8 bytes — the exact
  * counterpart of the builder's `putString`/`putBinary(utf8)` path, so
  * build and probe agree byte-for-byte. Bloom guarantees no false
  * negatives; the false-positive rate is the builder's `fpp`.
  *
  * The filter deserializes once per executor (transient lazy) and the
  * generated code calls it through a bound reference — no UDF, no boxed
  * lambda in the probe loop.
  */
case class BloomMightContainString(child: Expression, bloomBytes: Array[Byte])
  extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_bloom_contains"

  @transient private lazy val filter: BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bloomBytes))

  protected override def nullSafeEval(input: Any): Any =
    filter.mightContainBinary(input.asInstanceOf[UTF8String].getBytes)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomFilter", filter, classOf[BloomFilter].getName)
    defineCodeGen(ctx, ev, c => s"$ref.mightContainBinary($c.getBytes())")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Column-API entry point. */
object BloomFunctions {
  def bloomContains(c: Column, bloomBytes: Array[Byte]): Column =
    ExpressionUtils.column(BloomMightContainString(ExpressionUtils.expression(c), bloomBytes))
}
