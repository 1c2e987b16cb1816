package graft.expressions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}
import org.apache.spark.util.sketch.CountMinSketch

/** Equi-join cardinality estimate from two count-min sketches — the
  * classic CM inner-product estimator (Cormode & Muthukrishnan 2005,
  * §4.2): |A ⋈ B| = Σ_k cA(k)·cB(k), estimated as
  * min over rows d of Σ_w tableA[d][w] · tableB[d][w].
  *
  * The estimate is ONE-SIDED (never under the true join size — colliding
  * keys only add) and within ε·|A|·|B| of exact with the sketch's
  * confidence, which is what makes two KB-sized sketches enough to
  * decide join strategy (broadcast vs shuffle vs pre-filter) for tables
  * that would cost a full shuffle to size exactly. Both sketches must
  * come from `count_min_sketch(key, eps, conf, seed)` with the SAME
  * eps/confidence/seed — same depth, width, and hash coefficients — or
  * the row-wise products are meaningless; the expression verifies all
  * three and fails fast otherwise.
  *
  * Spark's CountMinSketch exposes no counter-table accessor, so the
  * tables are read reflectively from the deserialized impl (same-JVM,
  * same-classpath — not a serialized-format dependency). Eval-only
  * (CodegenFallback) like [[CmsEstimate]]: the expected call site is one
  * post-aggregate row per side.
  */
case class CmsInnerProduct(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {

  override def prettyName: String = "cms_inner_product"
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == BinaryType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two binary sketch arguments, " +
        s"got ${left.dataType.sql} and ${right.dataType.sql}")

  private def field[T](cms: CountMinSketch, name: String): T = {
    val f = cms.getClass.getDeclaredField(name)
    f.setAccessible(true)
    f.get(cms).asInstanceOf[T]
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val ca = CountMinSketch.readFrom(
      new ByteArrayInputStream(a.asInstanceOf[Array[Byte]]))
    val cb = CountMinSketch.readFrom(
      new ByteArrayInputStream(b.asInstanceOf[Array[Byte]]))
    require(ca.depth == cb.depth && ca.width == cb.width,
      s"$prettyName: sketch shapes differ " +
        s"(${ca.depth}x${ca.width} vs ${cb.depth}x${cb.width})")
    val ta = field[Array[Array[Long]]](ca, "table")
    val tb = field[Array[Array[Long]]](cb, "table")
    val ha = field[Array[Long]](ca, "hashA")
    val hb = field[Array[Long]](cb, "hashA")
    require(java.util.Arrays.equals(ha, hb),
      s"$prettyName: sketches use different hash seeds — build both " +
        "sides with the same count_min_sketch(key, eps, conf, seed) args")
    var best = Long.MaxValue
    var d = 0
    while (d < ta.length) {
      var s = 0L
      var w = 0
      while (w < ta(d).length) { s += ta(d)(w) * tb(d)(w); w += 1 }
      if (s < best) best = s
      d += 1
    }
    best
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
