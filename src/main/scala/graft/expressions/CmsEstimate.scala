package graft.expressions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{BinaryType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.CountMinSketch

/** Point-estimate probe into a serialized count-min sketch (the binary
  * produced by Spark's built-in `count_min_sketch` aggregate).
  *
  * Spark ships the sketch BUILDER as a SQL aggregate but no reader-side
  * probe — the sketch is only consumable from Scala code via
  * `CountMinSketch.readFrom`. This expression closes that gap so a
  * frequency sketch can be built, shipped, and queried entirely inside a
  * plan: `cms_estimate(sketch, key)` returns the sketch's (always >=
  * exact) count estimate for the key.
  *
  * Key hashing matches the aggregate's update path byte-for-byte: long
  * keys probe the long-hash path, string keys probe with their UTF-8
  * bytes (`CountMinSketchAgg` adds strings via `addBinary(getBytes)`).
  *
  * Probes are expected on POST-aggregate rows, but nothing enforces
  * that, and a probe accidentally placed on a fact-table scan would
  * deserialize the full sketch (~150 KB at eps=0.001) per ROW. A
  * thread-local single-slot cache keyed by the sketch bytes makes the
  * common case (one sketch value repeated across every probed row) a
  * reference-compare: the sketch is broadcast as one literal/column
  * value, so consecutive rows see the same byte array instance and even
  * the content-compare fallback is cheaper than a re-deserialize.
  */
case class CmsEstimate(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {

  override def prettyName: String = "cms_estimate"
  override def dataType: DataType = LongType

  // thread-local because one Catalyst expression instance can be shared
  // by several tasks of the same executor; @transient so the cache never
  // rides the serialized plan to executors
  @transient private lazy val lastSketch =
    new ThreadLocal[(Array[Byte], CountMinSketch)]()

  private def sketchFor(bytes: Array[Byte]): CountMinSketch = {
    val cached = lastSketch.get()
    if (cached != null &&
        ((cached._1 eq bytes) || java.util.Arrays.equals(cached._1, bytes)))
      cached._2
    else {
      val cms = CountMinSketch.readFrom(new ByteArrayInputStream(bytes))
      lastSketch.set((bytes, cms))
      cms
    }
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != BinaryType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a binary sketch as argument 1, " +
          s"got ${left.dataType.sql}")
    else right.dataType match {
      case LongType | StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName supports bigint or string keys, got ${other.sql}")
    }

  override protected def nullSafeEval(sketchBytes: Any, key: Any): Any = {
    val cms = sketchFor(sketchBytes.asInstanceOf[Array[Byte]])
    right.dataType match {
      case LongType => cms.estimateCount(key.asInstanceOf[java.lang.Long])
      case StringType =>
        cms.estimateCount(key.asInstanceOf[UTF8String].getBytes)
      case other => throw new IllegalStateException(
        s"unreachable: checkInputDataTypes admits no $other key")
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
