package graft.expressions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native dot product over two array<double> columns.
  *
  * The higher-order-function formulation (`aggregate(zip_with(a,b,*),0,+)`)
  * allocates a zipped intermediate array and evaluates its lambdas
  * interpreted, per element; this expression is one fused primitive loop,
  * and `doGenCode` keeps it inside whole-stage codegen — the difference
  * between a similarity scan that is memory-bound and one that is
  * lambda-dispatch-bound at corpus scale.
  *
  * Semantics match the HOF fold exactly: left-to-right IEEE summation over
  * min(len(a), len(b)) elements (so results — and the DuckDB oracle
  * comparison — are bit-identical). Element nulls are not expected
  * (embedding vectors are dense); null *columns* propagate as usual.
  */
case class DotProduct(left: Expression, right: Expression)
  extends BinaryExpression {

  // no ExpectsInputTypes (its AbstractDataType is private[sql]) — callers
  // cast to array<double> explicitly; no implicit coercion is inserted
  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<double> arguments, " +
        s"got ${left.dataType.sql} and ${right.dataType.sql}")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      s += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Squared L2 distance over two array<double> columns — same fused-loop /
  * codegen design (and left-to-right IEEE order) as [[DotProduct]]; the
  * second metric that makes the ANN operators metric-pluggable. */
case class L2SquaredDistance(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<double> arguments, " +
        s"got ${left.dataType.sql} and ${right.dataType.sql}")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_l2sq"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      val d = x.getDouble(i) - y.getDouble(i)
      s += d * d
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val d = ctx.freshName("d")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $d = $a.getDouble($i) - $b.getDouble($i);
         |  $s += $d * $d;
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Byte-class histogram of a (pre-lowercased) string: hist[b % dims]++
  * for every raw byte b in 'a'..'z' or '0'..'9'. One fused pass over the
  * UTF-8 bytes inside whole-stage codegen — the replacement for the
  * `dims` interpreted `size(filter(split(s,''), ...))` HOF passes the
  * chunk-vector builder used (each of which materialized a per-char
  * string array). Byte-wise is EXACTLY the old per-char semantics: in
  * UTF-8 every byte < 0x80 is a standalone ASCII char and every byte of
  * a multi-byte char is >= 0x80, so the [a-z0-9] test admits the same
  * positions the single-char string comparison did, and for those chars
  * byte value == codepoint == ascii(c). */
case class CharModHist(child: Expression, dims: Int)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  require(dims >= 1, s"char_hist dims must be >= 1, got $dims")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == org.apache.spark.sql.types.StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.sql}")
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)
  override def prettyName: String = "char_hist"

  override protected def nullSafeEval(input: Any): Any = {
    val bts = input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].getBytes
    val h = new Array[Long](dims)
    var i = 0
    while (i < bts.length) {
      val b = bts(i)
      if ((b >= 48 && b <= 57) || (b >= 97 && b <= 122)) h(b % dims) += 1L
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(h)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val bts = ctx.freshName("bts")
      val h = ctx.freshName("h")
      val i = ctx.freshName("i")
      val b = ctx.freshName("b")
      s"""
         |byte[] $bts = $a.getBytes();
         |long[] $h = new long[$dims];
         |for (int $i = 0; $i < $bts.length; $i++) {
         |  byte $b = $bts[$i];
         |  if (($b >= 48 && $b <= 57) || ($b >= 97 && $b <= 122)) $h[$b % $dims]++;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($h);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Integer twins of [[DotProduct]]/[[L2SquaredDistance]] over
  * array<long> columns — the chunk-dedup frequency vectors are exact
  * integer counts, and folding them through the generic HOF
  * (`aggregate(zip_with(...))`) pays interpreted lambda dispatch per
  * element per pair. Same left-to-right order, so in-domain results are
  * identical. Overflow behavior follows `failOnError`, mirroring
  * Spark's own arithmetic: true = raise ArithmeticException like the
  * HOF fold does under ANSI (Math.*Exact), false = wrap like LEGACY.
  * The SQL registry builder picks the session's ANSI setting at
  * resolution time (as Spark's arithmetic builders do), and
  * [[graft.plans.VectorFoldRewrite]] carries over the eval mode of the
  * lambda it replaces — so the rewrite is semantics-preserving even at
  * the overflow edge. Direct Scala constructions default to wrap (the
  * engine's count-vector callers are in-domain by construction, where
  * both modes agree bit-for-bit). Mismatched-length arrays return NULL,
  * as the HOF formulation does (zip_with pads the shorter array with
  * nulls, which null the fold). */
case class DotProductLong(left: Expression, right: Expression,
    failOnError: Boolean = false)
  extends BinaryExpression {

  // nullable even over non-null inputs: length mismatch yields NULL
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(org.apache.spark.sql.types.LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<bigint> arguments, " +
        s"got ${left.dataType.sql} and ${right.dataType.sql}")
  }
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "vec_dot_long"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) return null
    val n = x.numElements()
    var s = 0L
    var i = 0
    if (failOnError) {
      while (i < n) {
        s = Math.addExact(s, Math.multiplyExact(x.getLong(i), y.getLong(i)))
        i += 1
      }
    } else {
      while (i < n) { s += x.getLong(i) * y.getLong(i); i += 1 }
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val step =
        if (failOnError)
          s"$s = java.lang.Math.addExact($s, java.lang.Math.multiplyExact($a.getLong($i), $b.getLong($i)));"
        else
          s"$s += $a.getLong($i) * $b.getLong($i);"
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $a.numElements();
         |  long $s = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $step
         |  }
         |  ${ev.value} = $s;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** see [[DotProductLong]] */
case class L2SquaredDistanceLong(left: Expression, right: Expression,
    failOnError: Boolean = false)
  extends BinaryExpression {

  // nullable even over non-null inputs: length mismatch yields NULL
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(org.apache.spark.sql.types.LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<bigint> arguments, " +
        s"got ${left.dataType.sql} and ${right.dataType.sql}")
  }
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "vec_l2sq_long"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) return null
    val n = x.numElements()
    var s = 0L
    var i = 0
    if (failOnError) {
      while (i < n) {
        val d = Math.subtractExact(x.getLong(i), y.getLong(i))
        s = Math.addExact(s, Math.multiplyExact(d, d))
        i += 1
      }
    } else {
      while (i < n) {
        val d = x.getLong(i) - y.getLong(i)
        s += d * d
        i += 1
      }
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val d = ctx.freshName("d")
      val step =
        if (failOnError)
          s"""long $d = java.lang.Math.subtractExact($a.getLong($i), $b.getLong($i));
             |    $s = java.lang.Math.addExact($s, java.lang.Math.multiplyExact($d, $d));""".stripMargin
        else
          s"""long $d = $a.getLong($i) - $b.getLong($i);
             |    $s += $d * $d;""".stripMargin
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $a.numElements();
         |  long $s = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $step
         |  }
         |  ${ev.value} = $s;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VectorExpressions {

  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] =
    Seq(
      (FunctionIdentifier("char_hist"),
        new ExpressionInfo(classOf[CharModHist].getName, "char_hist"),
        (args: Seq[Expression]) => {
          require(args.length == 2,
            s"char_hist expects (str, dims), got ${args.length}")
          import org.apache.spark.sql.catalyst.expressions.Literal
          val dims = args(1) match {
            case Literal(v: Int, _) => v
            case Literal(v: Long, _) => v.toInt
            case Literal(v: Short, _) => v.toInt
            case other => throw new IllegalArgumentException(
              s"char_hist dims must be an integer literal, got $other")
          }
          CharModHist(args.head, dims)
        }),
      (FunctionIdentifier("rolling_hash"),
        new ExpressionInfo(classOf[RollingHashExpr].getName, "rolling_hash"),
        (args: Seq[Expression]) => {
          require(args.length == 1,
            s"rolling_hash expects 1 argument, got ${args.length}")
          RollingHashExpr(args.head)
        }),
      (FunctionIdentifier("nfc_normalize"),
        new ExpressionInfo(classOf[NfcNormalizeExpr].getName,
          "nfc_normalize"),
        (args: Seq[Expression]) => {
          require(args.length == 1,
            s"nfc_normalize expects 1 argument, got ${args.length}")
          NfcNormalizeExpr(args.head)
        }),
      (FunctionIdentifier("vec_dot_long"),
        new ExpressionInfo(classOf[DotProductLong].getName, "vec_dot_long"),
        (args: Seq[Expression]) => {
          require(args.length == 2,
            s"vec_dot_long expects 2 arguments, got ${args.length}")
          // session ANSI mode picked at resolution, like Spark's own
          // arithmetic builders
          DotProductLong(args.head, args(1),
            org.apache.spark.sql.internal.SQLConf.get.ansiEnabled)
        }),
      (FunctionIdentifier("vec_l2sq_long"),
        new ExpressionInfo(classOf[L2SquaredDistanceLong].getName, "vec_l2sq_long"),
        (args: Seq[Expression]) => {
          require(args.length == 2,
            s"vec_l2sq_long expects 2 arguments, got ${args.length}")
          L2SquaredDistanceLong(args.head, args(1),
            org.apache.spark.sql.internal.SQLConf.get.ansiEnabled)
        }),
      (FunctionIdentifier("vec_dot"),
        new ExpressionInfo(classOf[DotProduct].getName, "vec_dot"),
        (args: Seq[Expression]) => {
          require(args.length == 2, s"vec_dot expects 2 arguments, got ${args.length}")
          DotProduct(args.head, args(1))
        }),
      (FunctionIdentifier("vec_l2sq"),
        new ExpressionInfo(classOf[L2SquaredDistance].getName, "vec_l2sq"),
        (args: Seq[Expression]) => {
          require(args.length == 2, s"vec_l2sq expects 2 arguments, got ${args.length}")
          L2SquaredDistance(args.head, args(1))
        }),
      (FunctionIdentifier("bloom_agg"),
        new ExpressionInfo(classOf[BloomAgg].getName, "bloom_agg"),
        (args: Seq[Expression]) => {
          require(args.length == 3,
            s"bloom_agg expects (key, expectedItems, fpp), got ${args.length}")
          import org.apache.spark.sql.catalyst.expressions.Literal
          val n = args(1) match {
            case Literal(v: Long, _) => v
            case Literal(v: Int, _) => v.toLong
            case other => throw new IllegalArgumentException(
              s"bloom_agg expectedItems must be an integer literal, got $other")
          }
          val fpp = args(2) match {
            case Literal(v: Double, _) => v
            case Literal(v: Float, _) => v.toDouble
            // a plain SQL literal like 0.03 parses as DecimalType, and
            // Catalyst stores its value as o.a.s.sql.types.Decimal (NOT
            // java.math.BigDecimal) — both spellings accepted
            case Literal(v: org.apache.spark.sql.types.Decimal, _) =>
              v.toDouble
            case Literal(v: java.math.BigDecimal, _) => v.doubleValue()
            case other => throw new IllegalArgumentException(
              s"bloom_agg fpp must be a numeric literal, got $other")
          }
          BloomAgg(args.head, n, fpp).toAggregateExpression()
        }),
      (FunctionIdentifier("bloom_contains"),
        new ExpressionInfo(classOf[BloomMightContain].getName, "bloom_contains"),
        (args: Seq[Expression]) => {
          require(args.length == 2,
            s"bloom_contains expects 2 arguments, got ${args.length}")
          BloomMightContain(args.head, args(1))
        }),
      (FunctionIdentifier("cms_estimate"),
        new ExpressionInfo(classOf[CmsEstimate].getName, "cms_estimate"),
        (args: Seq[Expression]) => {
          require(args.length == 2, s"cms_estimate expects 2 arguments, got ${args.length}")
          CmsEstimate(args.head, args(1))
        }),
      (FunctionIdentifier("cms_inner_product"),
        new ExpressionInfo(classOf[CmsInnerProduct].getName, "cms_inner_product"),
        (args: Seq[Expression]) => {
          require(args.length == 2,
            s"cms_inner_product expects 2 arguments, got ${args.length}")
          CmsInnerProduct(args.head, args(1))
        }),
      (FunctionIdentifier("minhash_agg"),
        new ExpressionInfo(classOf[MinHashAgg].getName, "minhash_agg"),
        (args: Seq[Expression]) => {
          require(args.length == 2, s"minhash_agg expects (gramId, k), got ${args.length}")
          import org.apache.spark.sql.catalyst.expressions.Literal
          val k = args(1) match {
            case Literal(v: Int, _) => v
            case Literal(v: Long, _) => v.toInt
            case Literal(v: Short, _) => v.toInt
            case other => throw new IllegalArgumentException(
              s"minhash_agg k must be an integer literal, got $other")
          }
          require(k >= 1, s"minhash_agg k must be >= 1, got $k")
          MinHashAgg(args.head, k).toAggregateExpression()
        }),
      (FunctionIdentifier("smallest_k_agg"),
        new ExpressionInfo(classOf[SmallestKAgg].getName, "smallest_k_agg"),
        (args: Seq[Expression]) => {
          require(args.length == 2,
            s"smallest_k_agg expects (value, k), got ${args.length}")
          import org.apache.spark.sql.catalyst.expressions.Literal
          val k = args(1) match {
            case Literal(v: Int, _) => v
            case Literal(v: Long, _) => v.toInt
            case Literal(v: Short, _) => v.toInt
            case other => throw new IllegalArgumentException(
              s"smallest_k_agg k must be an integer literal, got $other")
          }
          require(k >= 1, s"smallest_k_agg k must be >= 1, got $k")
          SmallestKAgg(args.head, k).toAggregateExpression()
        }),
      (FunctionIdentifier("mg_topk_agg"),
        new ExpressionInfo(classOf[HeavyHittersAgg].getName, "mg_topk_agg"),
        (args: Seq[Expression]) => {
          require(args.length == 2,
            s"mg_topk_agg expects (key, capacity), got ${args.length}")
          import org.apache.spark.sql.catalyst.expressions.Literal
          val capacity = args(1) match {
            case Literal(v: Int, _) => v
            case Literal(v: Long, _) => v.toInt
            case Literal(v: Short, _) => v.toInt
            case other => throw new IllegalArgumentException(
              s"mg_topk_agg capacity must be an integer literal, got $other")
          }
          require(capacity >= 1,
            s"mg_topk_agg capacity must be >= 1, got $capacity")
          HeavyHittersAgg(args.head, capacity).toAggregateExpression()
        }))

  /** idempotent per-session registration (the session-extension route in
    * [[graft.GraftExtensions]] does the same for externally-built
    * sessions via spark.sql.extensions). Skips sessions already
    * registered so the per-operator convenience calls don't re-replace
    * the functions (and log a replacement WARN) on every invocation. */
  def registerAll(spark: SparkSession): Unit = {
    val state = spark.sessionState
    // Registration happens INSIDE the lock: a concurrent caller must not
    // observe the session as "registered" until every function is actually
    // in the registry, or it could issue SQL that hits a transient
    // undefined-function AnalysisException. Registration is cheap and
    // idempotent, so holding the lock across it is fine.
    registered.synchronized {
      if (!registered.containsKey(state)) {
        functions.foreach { case (ident, _, builder) =>
          state.functionRegistry
            .createOrReplaceTempFunction(ident.funcName, builder, "built-in")
        }
        registered.put(state, java.lang.Boolean.TRUE)
      }
    }
  }

  // Weak keys stop a dropped SessionState from pinning memory. Keying is
  // equals()/hashCode() like any map, but SessionState keeps the default
  // reference-equality equals, which is what makes per-session dedup sound.
  private val registered =
    new java.util.WeakHashMap[AnyRef, java.lang.Boolean]()
}
