package graft.expressions

import java.nio.ByteBuffer
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Bounded smallest-k aggregate over 64-bit values: evaluates to the k
  * smallest inputs of the group as an ASCENDING array (multiset
  * semantics — duplicate values are kept, exactly like the
  * `row_number().over(partitionBy(g).orderBy(v)) <= k` window it
  * replaces). All-NULL (or empty) groups evaluate to NULL, matching
  * `min`.
  *
  * Why this exists instead of the window: "k smallest per key" as a
  * window is one exchange of EVERY row plus a full sort of every
  * partition; as an aggregate it runs map-side partial aggregation, so
  * each map partition ships at most k values per key through the
  * exchange and the reduce side never sorts more than k*keys rows —
  * the guide §2.3 "aggregate before you shuffle" shape, with O(k)
  * memory per group regardless of key skew (a hot key's millions of
  * rows collapse to k on the map side; collect_list+slice would buffer
  * them all).
  *
  * Same ObjectHashAggregateExec trade as [[MinHashAgg]]: beyond
  * spark.sql.objectHashAggregate.sortBased.fallbackThreshold (default
  * 128) groups per partition the agg falls back to sort-based — but on
  * the PRE-BOUNDED partial buffers, so the fallback sorts <= k*keys
  * rows, not the input. */
case class SmallestKAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[SmallestKAgg.Buffer] {

  import SmallestKAgg.Buffer

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "smallest_k_agg"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a bigint value, got ${child.dataType.sql}")

  override def createAggregationBuffer(): Buffer =
    Buffer(new Array[Long](k), size = 0)

  /** sorted insert of v into vals[0..size), dropping the largest when
    * the buffer is full — O(log k) search + O(k) shift, k is tiny */
  private def insert(buf: Buffer, v: Long): Unit = {
    val vals = buf.vals
    if (buf.size == k && v >= vals(k - 1)) return
    // binary search for the insertion point (first index with value > v
    // — inserting AFTER equal values keeps the shift minimal; order of
    // equal values is indistinguishable in the output)
    var lo = 0
    var hi = buf.size
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (vals(mid) <= v) lo = mid + 1 else hi = mid
    }
    val last = if (buf.size == k) k - 1 else buf.size
    if (last > lo) System.arraycopy(vals, lo, vals, lo + 1, last - lo)
    vals(lo) = v
    if (buf.size < k) buf.size += 1
  }

  override def update(buf: Buffer, input: InternalRow): Buffer = {
    val v = child.eval(input)
    if (v != null) insert(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(b1: Buffer, b2: Buffer): Buffer = {
    var i = 0
    while (i < b2.size) { insert(b1, b2.vals(i)); i += 1 }
    b1
  }

  override def eval(buf: Buffer): Any =
    if (buf.size == 0) null
    else new GenericArrayData(java.util.Arrays.copyOf(buf.vals, buf.size))

  override def serialize(buf: Buffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.size)
    bb.putInt(buf.size)
    var i = 0
    while (i < buf.size) { bb.putLong(buf.vals(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Buffer = {
    val bb = ByteBuffer.wrap(bytes)
    val size = bb.getInt()
    val vals = new Array[Long](k)
    var i = 0
    while (i < size) { vals(i) = bb.getLong(); i += 1 }
    Buffer(vals, size)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SmallestKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SmallestKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object SmallestKAgg {
  /** vals[0..size) sorted ascending; capacity is always k */
  final case class Buffer(vals: Array[Long], var size: Int)
}
