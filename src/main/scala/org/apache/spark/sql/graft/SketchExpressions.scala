// Spark namespace for the same reason as TopKExpressions (private[sql]
// Column bridge + catalyst aggregate plumbing). Public API:
// graft.text.Text.heavyHitters delegates here.
package org.apache.spark.sql.graft

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** SpaceSaving (Metwally et al., "Efficient computation of frequent and
  * top-k elements in data streams") stream summary with O(log m) updates:
  * item → estimated count, plus a count-ordered index for O(log m) min
  * eviction. Estimates are UPPER bounds of the true count (an evicted
  * item's count is inherited by its replacement), and any item with true
  * count > n/m is guaranteed present — the property the two-pass heavy
  * hitter operator ([[graft.text.Text.heavyHitters]]) relies on for
  * no-false-negatives before its exact recount.
  */
final class SpaceSavingBuffer(val capacity: Int) {
  import scala.collection.mutable
  // item -> est
  val counts = new mutable.HashMap[String, Long]()
  // est -> items at that est (eviction picks from firstKey = min est);
  // TreeMap keeps both ops logarithmic at capacity ~10^4
  private val byCount = new java.util.TreeMap[Long, mutable.Set[String]]()

  private def indexAdd(item: String, c: Long): Unit = {
    val s = byCount.get(c)
    if (s == null) {
      val ns = mutable.Set(item)
      byCount.put(c, ns)
    } else s += item
  }

  private def indexRemove(item: String, c: Long): Unit = {
    val s = byCount.get(c)
    if (s != null) {
      s -= item
      if (s.isEmpty) byCount.remove(c)
    }
  }

  /** Record `delta` occurrences of `item` (delta > 0). */
  def add(item: String, delta: Long): Unit = counts.get(item) match {
    case Some(c) =>
      indexRemove(item, c)
      counts.update(item, c + delta)
      indexAdd(item, c + delta)
    case None if counts.size < capacity =>
      counts.update(item, delta)
      indexAdd(item, delta)
    case None =>
      // full: replace A min-count item, inheriting its count (the
      // SpaceSaving overestimate that keeps the guarantee). Which item of
      // the min bucket goes is irrelevant to the guarantee; `head` keeps
      // it cheap.
      val minEntry = byCount.firstEntry()
      val victim = minEntry.getValue.head
      indexRemove(victim, minEntry.getKey)
      counts.remove(victim)
      val est = minEntry.getKey + delta
      counts.update(item, est)
      indexAdd(item, est)
  }

  /** Min estimate currently tracked; the SpaceSaving bound on the true
    * count of any item ABSENT from a FULL summary (0 if not full — an
    * absent item then genuinely never occurred).
    */
  def absentBound: Long =
    if (counts.size >= capacity) byCount.firstKey() else 0L

  /** Merge (mergeable-summaries construction — Agarwal et al.): an item
    * absent from one side may still have occurred up to that side's
    * [[absentBound]] times there (it could have been evicted), so absent
    * items inherit the other side's bound as an offset — summing present
    * estimates alone would UNDERestimate evicted items and break the
    * upper-bound invariant (caught by the TextSpec property gate). Then
    * prune smallest estimates back to capacity; error bounds add across
    * merges, so nothing with true count > Σεᵢnᵢ + (Σnᵢ)/m can be missing.
    */
  def mergeIn(other: SpaceSavingBuffer): Unit = {
    val myBound = absentBound
    val otherBound = other.absentBound
    if (otherBound > 0) {
      val onlyMine = counts.keysIterator.filterNot(other.counts.contains).toArray
      onlyMine.foreach(item => add0(item, otherBound))
    }
    other.counts.foreach { case (item, est) =>
      if (myBound > 0 && !counts.contains(item)) add0(item, est + myBound)
      else add0(item, est)
    }
    while (counts.size > capacity) {
      val minEntry = byCount.firstEntry()
      val victim = minEntry.getValue.head
      indexRemove(victim, minEntry.getKey)
      counts.remove(victim)
    }
  }

  /** add without the eviction path (merge inserts everything, prunes once). */
  private def add0(item: String, delta: Long): Unit = counts.get(item) match {
    case Some(c) =>
      indexRemove(item, c)
      counts.update(item, c + delta)
      indexAdd(item, c + delta)
    case None =>
      counts.update(item, delta)
      indexAdd(item, delta)
  }
}

/** SpaceSaving sketch aggregate over a string column: evals to
  * `array<struct<item string, est long>>` sorted est desc then item asc
  * (deterministic given the buffer contents). `est` is an upper bound of
  * the item's true count; any item with true count > n/capacity is
  * guaranteed present. Planner shape: ObjectHashAggregate with map-side
  * partials — each task ships at most `capacity` (item, est) pairs, so a
  * heavy-hitter scan over 100 TB shuffles O(tasks × capacity) rows
  * instead of one row per distinct key.
  */
case class SpaceSavingSketch(
    child: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[SpaceSavingBuffer] {

  require(capacity > 0, s"spacesaving_sketch needs capacity > 0, got $capacity")

  override def createAggregationBuffer(): SpaceSavingBuffer =
    new SpaceSavingBuffer(capacity)

  override def update(buf: SpaceSavingBuffer, input: InternalRow): SpaceSavingBuffer = {
    val v = child.eval(input)
    // String materialization per row is acceptable here: the buffer owns
    // its keys (scan-backed UTF8Strings are transient), and the map is
    // keyed by JVM string equality anyway.
    if (v != null) buf.add(v.asInstanceOf[UTF8String].toString, 1L)
    buf
  }

  override def merge(buf: SpaceSavingBuffer, other: SpaceSavingBuffer): SpaceSavingBuffer = {
    buf.mergeIn(other)
    buf
  }

  override def eval(buf: SpaceSavingBuffer): Any = {
    val arr = buf.counts.toArray.sortBy { case (item, est) => (-est, item) }
    new GenericArrayData(arr.map { case (item, est) =>
      InternalRow(UTF8String.fromString(item), est)
    }.asInstanceOf[Array[Any]])
  }

  override def serialize(buf: SpaceSavingBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.capacity)
    out.writeInt(buf.counts.size)
    buf.counts.foreach { case (item, est) =>
      val b = item.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(b.length)
      out.write(b)
      out.writeLong(est)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): SpaceSavingBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val cap = in.readInt()
    val buf = new SpaceSavingBuffer(cap)
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      buf.add(new String(b, java.nio.charset.StandardCharsets.UTF_8), in.readLong())
      i += 1
    }
    buf
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("item", StringType), StructField("est", LongType))),
    containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "spacesaving_sketch"

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"spacesaving_sketch needs a string input, got $other")
    }
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SpaceSavingSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SpaceSavingSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): SpaceSavingSketch =
    copy(child = newChildren.head)
}

object SketchFunctions {
  /** SpaceSaving summary of a string column: `array<struct<item, est>>`,
    * est desc. est ≥ true count; no item with true count > n/capacity is
    * missing.
    */
  def spaceSavingSketch(item: Column, capacity: Int): Column =
    ExpressionUtils.column(
      SpaceSavingSketch(ExpressionUtils.expression(item), capacity).toAggregateExpression())
}
