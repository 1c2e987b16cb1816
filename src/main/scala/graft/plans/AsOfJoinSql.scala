package graft.plans

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.StringType

/** SQL-frontend surface for the native [[AsOfJoin]] operator: a
  * table-valued function registered through
  * `SparkSessionExtensions.injectTableFunction`, so a pure `spark.sql`
  * user reaches [[AsOfJoinExec]] without touching the Scala API —
  * closing the one gap where a custom physical operator existed but only
  * DataFrame callers could plan it:
  *
  * {{{
  *   SELECT * FROM asof_join('trades', 'quotes',
  *                           'sym_id', 'sym_id', 'ts', 'ts',
  *                           'ts', 'px')          -- right payload cols
  *   SELECT * FROM asof_join_left(...)            -- LEFT OUTER variant
  *   SELECT * FROM asof_join_forward(...)         -- earliest ts >= left
  *   SELECT * FROM asof_join_forward_left(...)    -- both combined
  * }}}
  *
  * Arguments (all string literals — the TVF builder runs at resolution
  * time, before any child plan exists to resolve column references
  * against): left table, right table (temp-view or catalog names),
  * left key, right key, left time, right time, then one or more right
  * payload column names, which surface as `asof_<name>` — the exact
  * output contract of `JoinOps.asOfJoinNative`, so e24/e25 share one
  * oracle.
  *
  * Resolution happens in two steps because a TVF builder only sees
  * literal arguments: the builder emits an [[UnresolvedAsOfJoin]]
  * placeholder over two `UnresolvedRelation`s; the analyzer's builtin
  * rules resolve those children in the same fixed-point batch, and the
  * injected [[ResolveAsOfJoin]] rule then rewrites the placeholder to
  * `Project(left ++ asof_-aliased payload, AsOfJoin(...))` — the
  * identical plan `asOfJoinNative` builds, including the fresh-alias of
  * the right side that keeps a self-join's exprIds distinct. */
object AsOfJoinTvf {

  /** placeholder emitted by the TVF builder; never survives analysis */
  case class UnresolvedAsOfJoin(
      left: LogicalPlan, right: LogicalPlan,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      rightVals: Seq[String], leftOuter: Boolean,
      forward: Boolean) extends BinaryNode {
    override lazy val resolved: Boolean = false
    override def output: Seq[Attribute] = Nil
    override protected def withNewChildrenInternal(
        newLeft: LogicalPlan, newRight: LogicalPlan): UnresolvedAsOfJoin =
      copy(left = newLeft, right = newRight)
  }

  private def strArg(fn: String, args: Seq[Expression], i: Int): String =
    args(i) match {
      case Literal(v, StringType) if v != null => v.toString
      case other => throw new IllegalArgumentException(
        s"$fn: argument ${i + 1} must be a string literal, got $other")
    }

  private def build(fn: String, leftOuter: Boolean, forward: Boolean)(
      args: Seq[Expression]): LogicalPlan = {
    require(args.length >= 7,
      s"$fn(leftTable, rightTable, leftKey, rightKey, leftTime, " +
        "rightTime, rightVal...) needs at least 7 arguments, got " +
        args.length)
    val parts = args.indices.map(strArg(fn, args, _))
    def rel(name: String) =
      org.apache.spark.sql.catalyst.analysis.UnresolvedRelation(
        name.split('.').toSeq)
    UnresolvedAsOfJoin(rel(parts(0)), rel(parts(1)),
      parts(2), parts(3), parts(4), parts(5),
      parts.drop(6), leftOuter, forward)
  }

  /** registration tuples for `SparkSessionExtensions.injectTableFunction` */
  def functions: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => LogicalPlan)] =
    Seq(("asof_join", false, false), ("asof_join_left", true, false),
      ("asof_join_forward", false, true),
      ("asof_join_forward_left", true, true)).map {
      case (name, outer, fwd) =>
        (FunctionIdentifier(name),
          new ExpressionInfo(classOf[AsOfJoin].getName, name),
          build(name, outer, fwd) _)
    }
}

/** Analyzer rule (injected via `injectResolutionRule`) completing
  * [[AsOfJoinTvf.UnresolvedAsOfJoin]] once both relations resolved. */
object ResolveAsOfJoin extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperatorsUp {
      case AsOfJoinTvf.UnresolvedAsOfJoin(l, r, lk, rk, lt, rt, rv, outer,
          fwd) if l.resolved && r.resolved =>
        def attr(out: Seq[Attribute], n: String, side: String): Attribute =
          out.find(a => conf.resolver(a.name, n)).getOrElse(
            throw new IllegalArgumentException(
              s"asof_join: column `$n` not found in the $side table " +
                s"(${out.map(_.name).mkString(", ")})"))
        // fresh-alias the right side — same reason as asOfJoinNative:
        // a self-join's two sides share exprIds and nothing else rewrites
        // a non-builtin join node
        val rp = Project(r.output.map(a => Alias(a, a.name)()), r)
        // type discipline at ANALYSIS time, not mid-execution: integral
        // keys/times widen to bigint (so an INT key against a BIGINT key
        // just works); anything else must satisfy the exec's contract
        // here, where the error can name the offending columns instead
        // of surfacing as a ClassCastException from a running task
        def widen(a: Attribute): Expression = a.dataType match {
          case _: org.apache.spark.sql.types.IntegerType |
               _: org.apache.spark.sql.types.ShortType |
               _: org.apache.spark.sql.types.ByteType =>
            org.apache.spark.sql.catalyst.expressions.Cast(a,
              org.apache.spark.sql.types.LongType)
          case _ => a
        }
        val (lkE, rkE) = (widen(attr(l.output, lk, "left")),
          widen(attr(rp.output, rk, "right")))
        if (lkE.dataType != rkE.dataType)
          throw new IllegalArgumentException(
            s"asof_join: key columns `$lk` (${lkE.dataType.sql}) and " +
              s"`$rk` (${rkE.dataType.sql}) must have the same type")
        if (!org.apache.spark.sql.catalyst.expressions.RowOrdering
            .isOrderable(lkE.dataType))
          throw new IllegalArgumentException(
            s"asof_join: key type ${lkE.dataType.sql} is not orderable")
        val (ltE, rtE) = (widen(attr(l.output, lt, "left")),
          widen(attr(rp.output, rt, "right")))
        def isTime(e: Expression) =
          e.dataType == org.apache.spark.sql.types.LongType ||
            e.dataType == org.apache.spark.sql.types.TimestampType
        if (!isTime(ltE) || !isTime(rtE))
          throw new IllegalArgumentException(
            s"asof_join: time columns `$lt` (${ltE.dataType.sql}) and " +
              s"`$rt` (${rtE.dataType.sql}) must be bigint or timestamp")
        val aoj = AsOfJoin(l, rp, lkE, rkE, ltE, rtE, outer, fwd)
        // payload attrs come from aoj.output (NOT rp.output): outer mode
        // rewrites their nullability there
        val rightOut = aoj.output.drop(l.output.size)
        Project(l.output ++ rv.map(v =>
          Alias(attr(rightOut, v, "right"), s"asof_$v")()), aoj)
    }
}
