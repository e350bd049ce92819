// Spark namespace for the same reason as VectorExpressions (private[sql]
// Column bridge + catalyst aggregate plumbing). Public API:
// graft.analyze.Analytics.topKPerGroup delegates here.
package org.apache.spark.sql.graft

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{ArrayType, DataType, StructType}

/** Bounded top-k aggregate: keeps the k rank-smallest rows of a struct
  * column under a lexicographic ordering over the struct's FIRST
  * `descFlags.length` fields (`descFlags(i)` = field i descending), and
  * evals to an `array<struct>` sorted best-first, so `posexplode` yields
  * `row_number()`-identical ranks.
  *
  * This is the per-group twin of `TakeOrderedAndProject` (the global
  * orderBy+limit operator): a size-k bounded heap per group, O(N log k)
  * with an O(1) reject test per row, where the window formulation —
  * even with Spark's partial `WindowGroupLimit` — must SORT every
  * partition of the fact table twice (map side and reduce side,
  * O(N log N) each) because `WindowGroupLimitExec` requires its child
  * ordered by (partition, order) keys. At 100 TB the full-partition
  * sorts dominate the query; the heap never materializes more than
  * groups×k rows per task, and the shuffle moves only those survivors.
  *
  * Planner shape: `ObjectHashAggregateExec` (TypedImperativeAggregate is
  * object-buffered, outside whole-stage codegen) with map-side partial —
  * the scan/project below it stays codegen'd, and the agg's per-row work
  * is one comparator call against the heap head. Beyond
  * `spark.sql.objectHashAggregate.sortBased.fallbackThreshold` (128)
  * in-flight groups per task it degrades to sort-by-GROUP-KEY-only —
  * still never a sort by the ORDER columns, which is where the window
  * version pays.
  *
  * Ordering semantics match SQL sorts exactly: ascending = NULLS FIRST,
  * descending = NULLS LAST (null compares smallest, then the direction
  * flip is applied), so heap output == `row_number()` output for any
  * total order, nulls included.
  *
  * Ref behavior anchored: analysis.py nlargest/groupby-head shapes
  * (reference skylogix repo) — re-expressed as a Catalyst aggregate
  * instead of a pandas sort.
  */
case class TopKRows(
    child: Expression,
    k: Int,
    descFlags: Seq[Boolean],
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[InternalRow]] {

  require(k > 0, s"topKRows needs k > 0, got $k")

  private lazy val structType = child.dataType.asInstanceOf[StructType]
  private lazy val ordFieldTypes: Array[DataType] =
    structType.fields.take(descFlags.length).map(_.dataType)
  private lazy val fieldOrderings: Array[Ordering[Any]] =
    ordFieldTypes.map(dt =>
      TypeUtils.getInterpretedOrdering(dt).asInstanceOf[Ordering[Any]])
  private lazy val descArr: Array[Boolean] = descFlags.toArray

  /** Rank order: compare(a, b) < 0 ⟺ a ranks strictly better than b. */
  private lazy val rankOrdering: Ordering[InternalRow] = new Ordering[InternalRow] {
    override def compare(a: InternalRow, b: InternalRow): Int = {
      var i = 0
      while (i < descArr.length) {
        val dt = ordFieldTypes(i)
        val av = a.get(i, dt)
        val bv = b.get(i, dt)
        // null smallest, then flip: asc ⇒ NULLS FIRST, desc ⇒ NULLS LAST
        val c =
          if (av == null && bv == null) 0
          else if (av == null) -1
          else if (bv == null) 1
          else fieldOrderings(i).compare(av, bv)
        val directed = if (descArr(i)) -c else c
        if (directed != 0) return directed
        i += 1
      }
      0
    }
  }

  // PriorityQueue dequeues the LARGEST under its ordering, so with the
  // rank order directly the head is the worst kept row — the O(1)
  // reject probe.
  override def createAggregationBuffer(): mutable.PriorityQueue[InternalRow] =
    new mutable.PriorityQueue[InternalRow]()(rankOrdering)

  // deep-copy bridge for ACCEPTED rows only: the struct from child.eval
  // can hold UTF8Strings/arrays pointing into a reused columnar-scan
  // buffer — a shallow InternalRow.copy() would keep those pointers and
  // read garbage once the batch advances (the collect_list trap;
  // Spark's CollectBase pays InternalRow.copyValue per element for the
  // same reason). UnsafeProjection re-encodes into its own buffer; the
  // .copy() in insert() then owns the bytes. Rejected rows — the common
  // case — never touch it.
  private lazy val toOwned = UnsafeProjection.create(structType)

  /** Insert a row read from a TRANSIENT buffer (scan-backed). */
  private def insert(buf: mutable.PriorityQueue[InternalRow], row: InternalRow): Unit = {
    if (buf.size < k) {
      buf.enqueue(toOwned(row).copy())
    } else if (rankOrdering.compare(row, buf.head) < 0) {
      buf.dequeue()
      buf.enqueue(toOwned(row).copy())
    }
  }

  /** Insert a row the buffer already owns (deserialized partials). */
  private def insertOwned(buf: mutable.PriorityQueue[InternalRow], row: InternalRow): Unit = {
    if (buf.size < k) {
      buf.enqueue(row)
    } else if (rankOrdering.compare(row, buf.head) < 0) {
      buf.dequeue()
      buf.enqueue(row)
    }
  }

  override def update(
      buf: mutable.PriorityQueue[InternalRow],
      input: InternalRow): mutable.PriorityQueue[InternalRow] = {
    val v = child.eval(input)
    if (v != null) insert(buf, v.asInstanceOf[InternalRow])
    buf
  }

  override def merge(
      buf: mutable.PriorityQueue[InternalRow],
      other: mutable.PriorityQueue[InternalRow]): mutable.PriorityQueue[InternalRow] = {
    // rows in `other` came from deserialize() — each owns its bytes
    other.foreach(insertOwned(buf, _))
    buf
  }

  override def eval(buf: mutable.PriorityQueue[InternalRow]): Any =
    // non-destructive (Spark may reuse the buffer); ascending rank order
    // = best first, so posexplode's pos + 1 is the row_number
    new GenericArrayData(buf.toArray.sorted(rankOrdering).asInstanceOf[Array[Any]])

  // serialize k UnsafeRows, length-prefixed; buffers cross the shuffle as
  // at most k rows per (task, group). Buffered rows are UnsafeRows by
  // construction (insert projects, deserialize decodes) — written as-is.
  override def serialize(buf: mutable.PriorityQueue[InternalRow]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { row =>
      val ur = row.asInstanceOf[UnsafeRow]
      out.writeInt(ur.getSizeInBytes)
      ur.writeToStream(out, null)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[InternalRow] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = createAggregationBuffer()
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val size = in.readInt()
      val rowBytes = new Array[Byte](size)
      in.readFully(rowBytes)
      val ur = new UnsafeRow(structType.length)
      ur.pointTo(rowBytes, size)
      buf.enqueue(ur)
      i += 1
    }
    buf
  }

  override def dataType: DataType = ArrayType(structType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "topk_rows"

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    child.dataType match {
      case st: StructType if descFlags.nonEmpty && descFlags.length <= st.length =>
        val bad = st.fields.take(descFlags.length)
          .find(f => !org.apache.spark.sql.catalyst.util.TypeUtils
            .typeWithProperEquals(f.dataType))
        bad match {
          case Some(f) => TypeCheckResult.TypeCheckFailure(
            s"topk_rows ordering field ${f.name} of type ${f.dataType} is not orderable")
          case None => TypeCheckResult.TypeCheckSuccess
        }
      case st: StructType => TypeCheckResult.TypeCheckFailure(
        s"topk_rows needs 1..${st.length} descFlags, got ${descFlags.length}")
      case other => TypeCheckResult.TypeCheckFailure(
        s"topk_rows needs a struct input, got $other")
    }
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKRows =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKRows =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKRows =
    copy(child = newChildren.head)
}

object TopKFunctions {
  /** `array<struct>` of the k best rows of `row` (a struct column) under
    * lexicographic (field 0 .. field m-1) with per-field direction flags;
    * sorted best-first so `posexplode` position + 1 reproduces
    * `row_number()`.
    */
  def topKRows(row: Column, k: Int, descFlags: Seq[Boolean]): Column =
    ExpressionUtils.column(
      TopKRows(ExpressionUtils.expression(row), k, descFlags).toAggregateExpression())
}
