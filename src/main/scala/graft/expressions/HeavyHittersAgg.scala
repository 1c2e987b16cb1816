package graft.expressions

import java.nio.ByteBuffer
import scala.collection.mutable
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.ArrayBasedMapData
import org.apache.spark.sql.types.{DataType, LongType, MapType}

/** Misra-Gries heavy-hitters summary over 64-bit keys: at most
  * `capacity` counters, O(capacity) memory regardless of stream length
  * or key cardinality, mergeable across partitions — the frequent-items
  * sketch for "top domains / top tokens / hottest keys" over a 100 TB
  * stream where an exact groupBy would shuffle billions of distinct
  * keys.
  *
  * Deterministic guarantees (any input order, any merge tree; Misra &
  * Gries 1982, merge rule per Agarwal et al., "Mergeable Summaries",
  * PODS 2012):
  *  - UNDER-estimation only: est(x) <= true(x);
  *  - bounded error: true(x) - est(x) <= N / capacity (N = total count);
  *  - guaranteed presence: every x with true(x) > N / capacity is in
  *    the summary.
  * The exact SET of tracked keys near the error floor can vary with
  * merge order; the ds04 gate therefore asserts the deterministic
  * guarantees over the (deterministic) provably-heavy key set, and the
  * seeded spec pins exact contents where the update order is fixed.
  *
  * update is O(1) amortized: the decrement-all path costs O(capacity)
  * but removes `capacity` total counts, so total work is O(N). merge
  * sums both summaries then applies the (capacity+1)-th largest count
  * as a uniform discount — at most `capacity` counters survive.
  *
  * Evaluates to map<bigint, bigint> (key -> estimated count); empty
  * input gives an empty map (not null — a summary of nothing is a valid
  * summary).
  */
case class HeavyHittersAgg(
    child: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.LongMap[Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType =
    MapType(LongType, LongType, valueContainsNull = false)
  override def prettyName: String = "mg_topk_agg"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a bigint key, got ${child.dataType.sql}")

  override def createAggregationBuffer(): mutable.LongMap[Long] =
    mutable.LongMap.empty[Long]

  override def update(buf: mutable.LongMap[Long],
                      input: InternalRow): mutable.LongMap[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val x = v.asInstanceOf[Long]
      if (buf.contains(x)) buf(x) += 1L
      else if (buf.size < capacity) buf(x) = 1L
      else {
        // no slot: decrement every counter (the MG step that charges one
        // occurrence of each tracked key against the new arrival)
        var emptied = List.empty[Long]
        buf.foreachEntry { (k, c) =>
          if (c == 1L) emptied ::= k else buf(k) = c - 1L
        }
        emptied.foreach(buf.remove)
      }
    }
    buf
  }

  override def merge(b1: mutable.LongMap[Long],
                     b2: mutable.LongMap[Long]): mutable.LongMap[Long] = {
    b2.foreachEntry { (k, c) =>
      b1(k) = b1.getOrElse(k, 0L) + c
    }
    if (b1.size > capacity) {
      // uniform discount by the (capacity+1)-th largest count, then drop
      // non-positive counters: at most `capacity` survive, and the error
      // bounds of both inputs add (still <= N_total / capacity)
      val counts = b1.values.toArray
      java.util.Arrays.sort(counts)
      val cut = counts(counts.length - capacity - 1)
      var dropped = List.empty[Long]
      b1.foreachEntry { (k, c) =>
        if (c - cut <= 0L) dropped ::= k else b1(k) = c - cut
      }
      dropped.foreach(b1.remove)
    }
    b1
  }

  override def eval(buf: mutable.LongMap[Long]): Any = {
    val keys = new Array[Any](buf.size)
    val vals = new Array[Any](buf.size)
    var i = 0
    buf.foreachEntry { (k, c) => keys(i) = k; vals(i) = c; i += 1 }
    ArrayBasedMapData(keys, vals)
  }

  override def serialize(buf: mutable.LongMap[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * buf.size)
    bb.putInt(buf.size)
    buf.foreachEntry { (k, c) => bb.putLong(k); bb.putLong(c) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.LongMap[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val buf = mutable.LongMap.empty[Long]
    var i = 0
    while (i < n) { buf(bb.getLong()) = bb.getLong(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): HeavyHittersAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HeavyHittersAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}
