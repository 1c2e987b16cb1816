package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, LongType}

import graft.expressions.{DotProductLong, L2SquaredDistanceLong}

/** Optimizer rule rewriting the interpreted higher-order-function vector
  * folds to their native codegen'd twins:
  *
  *   aggregate(zip_with(a, b, (x, y) -> x * y), 0L, (acc, v) -> acc + v)
  *     ==> vec_dot_long(a, b)
  *   aggregate(zip_with(a, b, (x, y) -> (x - y) * (x - y)), 0L, ...)
  *     ==> vec_l2sq_long(a, b)
  *
  * This is the transformation that took the chunk-dedup builder from
  * 16 interpreted lambda passes to one fused loop (d15 6.9s -> 0.8s at
  * sf0.1, SURVEY §8) — done by hand there, done here for every SQL
  * frontend user who writes the natural HOF formulation.
  *
  * The rewrite fires only where it is semantics-preserving:
  *  - both inputs are array<bigint> with containsNull = false (the
  *    native loop reads elements unconditionally; a null element nulls
  *    the HOF fold);
  *  - all arithmetic in the lambdas shares one eval mode, LEGACY or
  *    ANSI, and the native expression CARRIES THAT MODE OVER
  *    (failOnError = ANSI, Math.*Exact in the loop) so overflow raises
  *    or wraps exactly as the fold it replaces would; TRY mode (which
  *    nulls on error) is left alone;
  *  - the fold starts at 0L and the finish lambda is the identity.
  * Mismatched-length inputs need no guard: both formulations yield NULL
  * (zip_with pads with nulls; the native expressions return NULL by
  * contract, spec-pinned in DedupOpsSpec).
  */
object VectorFoldRewrite extends Rule[LogicalPlan] {

  private def modeOk(m: Enumeration#Value): Boolean =
    m == EvalMode.LEGACY || m == EvalMode.ANSI

  private def isLongArrayNoNulls(e: Expression): Boolean = e.dataType match {
    case ArrayType(LongType, false) => true
    case _ => false
  }

  private def refs(v: NamedLambdaVariable, e: Expression): Boolean = e match {
    case n: NamedLambdaVariable => n.exprId == v.exprId
    case _ => false
  }

  /** (x, y) -> x * y, either operand order; yields the eval mode */
  private def productMode(f: Expression): Option[Enumeration#Value] = f match {
    case LambdaFunction(Multiply(l, r, ctx),
        Seq(x: NamedLambdaVariable, y: NamedLambdaVariable), _)
        if modeOk(ctx.evalMode) &&
          ((refs(x, l) && refs(y, r)) || (refs(y, l) && refs(x, r))) =>
      Some(ctx.evalMode)
    case _ => None
  }

  /** (x, y) -> (x - y) * (x - y) (or the y - x orientation: the square
    * makes them equal); yields the eval mode */
  private def squaredDiffMode(f: Expression): Option[Enumeration#Value] =
    f match {
      case LambdaFunction(Multiply(l: Subtract, r: Subtract, ctx),
          Seq(x: NamedLambdaVariable, y: NamedLambdaVariable), _)
          if modeOk(ctx.evalMode) && l.semanticEquals(r) &&
            ctx.evalMode == l.evalContext.evalMode &&
            ((refs(x, l.left) && refs(y, l.right)) ||
              (refs(y, l.left) && refs(x, l.right))) =>
        Some(ctx.evalMode)
      case _ => None
    }

  /** (acc, v) -> acc + v, either operand order; yields the eval mode */
  private def sumMode(f: Expression): Option[Enumeration#Value] = f match {
    case LambdaFunction(Add(l, r, ctx),
        Seq(acc: NamedLambdaVariable, v: NamedLambdaVariable), _)
        if modeOk(ctx.evalMode) &&
          ((refs(acc, l) && refs(v, r)) || (refs(v, l) && refs(acc, r))) =>
      Some(ctx.evalMode)
    case _ => None
  }

  private def isIdentity(f: Expression): Boolean = f match {
    case LambdaFunction(b: NamedLambdaVariable,
        Seq(a: NamedLambdaVariable), _) => b.exprId == a.exprId
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case agg @ ArrayAggregate(
          ZipWith(a, b, zipF), Literal(0L, LongType), mergeF, finishF)
          if isLongArrayNoNulls(a) && isLongArrayNoNulls(b) &&
            isIdentity(finishF) =>
        (productMode(zipF), squaredDiffMode(zipF), sumMode(mergeF)) match {
          case (Some(zm), _, Some(sm)) if zm == sm =>
            DotProductLong(a, b, failOnError = zm == EvalMode.ANSI)
          case (_, Some(zm), Some(sm)) if zm == sm =>
            L2SquaredDistanceLong(a, b, failOnError = zm == EvalMode.ANSI)
          case _ => agg
        }
    }
}
