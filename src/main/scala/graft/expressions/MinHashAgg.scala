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
  * Trade-off vs the column-wise formulation (k separate
  * `min(pmod(...))` aggregates, DedupOps.minHashSignatures' default):
  * this aggregate updates one long[k] buffer in a tight loop with no
  * per-element expression dispatch — but as a TypedImperativeAggregate
  * it plans as ObjectHashAggregateExec, which falls back to sort-based
  * aggregation beyond spark.sql.objectHashAggregate.sortBased
  * .fallbackThreshold (default 128) groups per partition and boxes one
  * Long per input row in `child.eval`. High group cardinality (many
  * docs per partition — the corpus-scale case) therefore favors the
  * k-column form in HashAggregateExec with primitive buffers; this
  * form favors few-group/wide-k shapes and SQL callers. Signatures are
  * bit-identical either way (same [[MinHashAgg.hashFamily]]).
  *
  * All-NULL (or empty) groups evaluate to NULL, matching `min`. */
case class MinHashAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MinHashAgg.Buffer] {

  import MinHashAgg.{Buffer, M}

  private lazy val (as, bs) = MinHashAgg.hashFamily(k)

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_agg"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a bigint gram id, got ${child.dataType.sql}")

  override def createAggregationBuffer(): Buffer =
    Buffer(Array.fill(k)(M), seen = false)

  override def update(buf: Buffer, input: InternalRow): Buffer = {
    val v = child.eval(input)
    if (v != null) {
      buf.seen = true
      val raw = v.asInstanceOf[Long]
      val x = ((raw % M) + M) % M // pmod: raw xxhash64 may be negative
      val mins = buf.mins
      var i = 0
      while (i < k) {
        val h = (as(i) * x + bs(i)) % M
        if (h < mins(i)) mins(i) = h
        i += 1
      }
    }
    buf
  }

  override def merge(b1: Buffer, b2: Buffer): Buffer = {
    b1.seen ||= b2.seen
    var i = 0
    while (i < k) {
      if (b2.mins(i) < b1.mins(i)) b1.mins(i) = b2.mins(i)
      i += 1
    }
    b1
  }

  override def eval(buf: Buffer): Any =
    if (buf.seen) new GenericArrayData(buf.mins) else null

  override def serialize(buf: Buffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * k + 1)
    bb.put(if (buf.seen) 1.toByte else 0.toByte)
    buf.mins.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Buffer = {
    val bb = ByteBuffer.wrap(bytes)
    val seen = bb.get() == 1
    Buffer(Array.fill(k)(bb.getLong()), seen)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object MinHashAgg {
  val M = 2147483647L // 2^31 - 1

  final case class Buffer(mins: Array[Long], var seen: Boolean)

  /** THE deterministic affine family for all MinHash formulations
    * (xorshift64, fixed seed): h_i(x) = (a_i * x + b_i) mod M, a_i odd.
    * Both the column-wise min aggregates and this one-pass aggregate
    * draw from here, so their signatures are interchangeable. */
  def hashFamily(k: Int): (Array[Long], Array[Long]) = {
    require(k >= 1, s"MinHash k must be >= 1, got $k")
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
}
