package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.DataType
import org.apache.spark.unsafe.types.UTF8String

/** Polynomial rolling hash of a string — codepoint-wise
  * `acc = (acc*31 + cp) % 1000000007`, the t04 document fingerprint as
  * ONE fused pass inside whole-stage codegen. Replaces the interpreted
  * `aggregate(split(s, ''), ...)` HOF, which materialized a
  * per-CHARACTER string array and paid lambda dispatch per element —
  * the same (b)-tier move as vec_dot_long replacing the zip_with fold.
  *
  * Semantics are CODEPOINT-based (what DuckDB's `ascii` over
  * `string_split('')` elements computes for every Unicode input), which
  * matches the old HOF bit-for-bit on ASCII and the whole BMP; on
  * astral chars the old HOF hashed the high-surrogate unit (Spark's
  * `ascii` reads charAt(0)) and was already oracle-divergent there —
  * the native form resolves that divergence toward the oracle. The
  * loop lives in [[RollingHashExpr.compute]]; codegen calls it
  * statically, so the expression stays inside the generated stage with
  * no interpreted fallback.
  */
case class RollingHashExpr(child: Expression)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == org.apache.spark.sql.types.StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.sql}")
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "rolling_hash"

  override protected def nullSafeEval(input: Any): Any =
    RollingHashExpr.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.expressions.RollingHashExpr.compute($a);")

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}

object RollingHashExpr {
  /** called from generated code — keep signature Java-friendly */
  def compute(s: UTF8String): Long = {
    val str = s.toString
    var acc = 0L
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      acc = (acc * 31L + cp) % 1000000007L
      i += Character.charCount(cp)
    }
    acc
  }
}

/** Unicode NFC normalization — the curation-pipeline hygiene step that
  * runs BEFORE any dedup/fingerprint stage: composed and decomposed
  * spellings of the same text ("é" vs "e"+U+0301) hash differently, so
  * an unnormalized corpus under-deduplicates exactly on the non-ASCII
  * documents. Named `nfc_normalize` to mirror DuckDB's function of the
  * same name, so the t49 gate runs the SAME SQL text verbatim on both
  * engines (the ASOF-syntax dialect-parity discipline applied to a
  * scalar). Spark itself has no normalization builtin; a UDF would
  * break codegen — this is a native expression whose generated code
  * calls [[NfcNormalizeExpr.compute]], with an `isNormalized` fast
  * path so the (dominant) already-NFC case costs one scan and zero
  * allocations. */
case class NfcNormalizeExpr(child: Expression)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == org.apache.spark.sql.types.StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.sql}")
  override def dataType: DataType = org.apache.spark.sql.types.StringType
  override def prettyName: String = "nfc_normalize"

  override protected def nullSafeEval(input: Any): Any =
    NfcNormalizeExpr.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.expressions.NfcNormalizeExpr.compute($a);")

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}

object NfcNormalizeExpr {
  /** called from generated code — keep signature Java-friendly */
  def compute(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str,
        java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(java.text.Normalizer.normalize(str,
      java.text.Normalizer.Form.NFC))
  }
}
