package graft.expressions

import java.nio.ByteBuffer
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** One-pass MinHash signature aggregate: for each group, the element-wise
  * minimum of k affine hashes h_i(x) = (a_i * (x mod M) + b_i) mod M over
  * the input 64-bit gram ids.
  *
  * The column-wise formulation (k separate `min(pmod(...))` aggregates)
  * carries k aggregation buffer slots and evaluates k expression trees
  * per row through codegen'd but column-at-a-time paths; this aggregate
  * holds ONE primitive long[k] buffer and updates it in a tight loop —
  * the partial/merge contract (element-wise min is associative and
  * commutative) makes it map-side combinable exactly like the k-column
  * version, so the shuffle carries k longs per group either way but the
  * update path allocates nothing per row. */
case class MinHashAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  private val M = 2147483647L // 2^31 - 1

  // same deterministic xorshift64 family as DedupOps.hashFamily — the
  // signatures must be identical whichever formulation computes them
  private lazy val (as, bs) = {
    var state = 88172645463325252L
    def next(): Long = {
      state ^= state << 13; state ^= state >>> 7; state ^= state << 17
      state & Long.MaxValue
    }
    val a = new Array[Long](k)
    val b = new Array[Long](k)
    var i = 0
    while (i < k) {
      a(i) = (next() % (M - 2)) + 1 | 1L
      b(i) = next() % M
      i += 1
    }
    (a, b)
  }

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_agg"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a bigint gram id, got ${child.dataType.sql}")

  override def createAggregationBuffer(): Array[Long] = Array.fill(k)(M)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val raw = v.asInstanceOf[Long]
      val x = ((raw % M) + M) % M // pmod: raw xxhash64 may be negative
      var i = 0
      while (i < k) {
        val h = (as(i) * x + bs(i)) % M
        if (h < buf(i)) buf(i) = h
        i += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < k) {
      if (b2(i) < b1(i)) b1(i) = b2(i)
      i += 1
    }
    b1
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * k)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(k)(bb.getLong())
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}
