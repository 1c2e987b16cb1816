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
  * Probes are expected on POST-aggregate rows (a handful of groups, not
  * the fact table), so this evaluates interpreted (CodegenFallback) and
  * re-reads the sketch per row; a per-partition deserialization cache
  * would be the upgrade if a probe ever lands in a hot path.
  */
case class CmsEstimate(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {

  override def prettyName: String = "cms_estimate"
  override def dataType: DataType = LongType

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
    val cms = CountMinSketch.readFrom(
      new ByteArrayInputStream(sketchBytes.asInstanceOf[Array[Byte]]))
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
