package graft.expressions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-filter build aggregate: `bloom_agg(key, expectedItems, fpp)`
  * returns the serialized filter as binary.
  *
  * The engine's manual semi-join reduction tool: build a filter over the
  * selective side's keys (fixed KB–MB whatever the row count), ship it as
  * a literal/broadcast, and pre-filter the fact scan with
  * [[BloomMightContain]] BEFORE the shuffle the exact join needs — at
  * 100 TB the shuffle carries only probable matches instead of the whole
  * fact table. Spark injects its own runtime bloom filters only inside
  * one query's join (RuntimeFilterSpec pins that); this pair makes the
  * same reduction available ACROSS queries/stages — build once, reuse
  * against any number of scans.
  *
  * Determinism: insertion is bitwise OR (order-independent) and the hash
  * family is fixed (Murmur3, seed 0), so the serialized filter — and
  * every probe — is identical for identical input sets, merge order
  * aside. Long keys hash the long path; strings hash their UTF-8 bytes.
  * All-null input yields an empty filter (contains nothing), matching
  * `count_min_sketch` on the same degenerate case.
  */
case class BloomAgg(
    child: Expression,
    expectedItems: Long,
    fpp: Double,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BloomFilter] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "bloom_agg"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName supports bigint or string keys, got ${other.sql}")
  }

  override def createAggregationBuffer(): BloomFilter =
    BloomFilter.create(expectedItems, fpp)

  override def update(buf: BloomFilter, input: InternalRow): BloomFilter = {
    val v = child.eval(input)
    if (v != null) child.dataType match {
      case LongType => buf.putLong(v.asInstanceOf[Long])
      case _ => buf.putBinary(v.asInstanceOf[UTF8String].getBytes)
    }
    buf
  }

  override def merge(b1: BloomFilter, b2: BloomFilter): BloomFilter = {
    b1.mergeInPlace(b2)
    b1
  }

  override def eval(buf: BloomFilter): Any = serialize(buf)

  override def serialize(buf: BloomFilter): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    buf.writeTo(out)
    out.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bytes))

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/** `bloom_contains(filter, key)` — membership probe against a serialized
  * bloom filter. False positives possible (bounded by the build fpp),
  * false negatives impossible: a probe-then-exact-join composition is
  * result-identical to the plain join.
  *
  * The filter side MUST be foldable (a literal — the build result
  * collected once, like a broadcast scalar): the filter is deserialized
  * ONE time per task into a transient lazy field, so probing a fact scan
  * costs two hash computations per row, not a per-row deserialization.
  */
case class BloomMightContain(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {

  override def prettyName: String = "bloom_contains"
  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != BinaryType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a binary filter as argument 1, " +
          s"got ${left.dataType.sql}")
    else if (!left.foldable)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a FOLDABLE filter argument (pass the built " +
          "filter as a literal) so it deserializes once, not per row")
    else right.dataType match {
      case LongType | StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName supports bigint or string keys, got ${other.sql}")
    }

  @transient private lazy val filter: Option[BloomFilter] =
    Option(left.eval(null).asInstanceOf[Array[Byte]])
      .map(b => BloomFilter.readFrom(new ByteArrayInputStream(b)))

  override def eval(input: InternalRow): Any = {
    val key = right.eval(input)
    if (key == null || filter.isEmpty) null
    else right.dataType match {
      case LongType => filter.get.mightContainLong(key.asInstanceOf[Long])
      case _ => filter.get.mightContainBinary(
        key.asInstanceOf[UTF8String].getBytes)
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
