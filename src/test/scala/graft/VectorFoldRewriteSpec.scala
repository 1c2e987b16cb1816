package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.expressions.{DotProductLong, L2SquaredDistanceLong}

/** Pins [[graft.plans.VectorFoldRewrite]]: the HOF vector folds rewrite
  * to the native codegen'd expressions exactly when semantics are
  * preserved, and NOT when they are not (nullable elements, a lambda
  * that is not the plain product/sum shape). The rewrite's values are
  * separately pinned equal to the HOF by DedupOpsSpec — here we pin
  * that the optimizer actually fires.
  */
class VectorFoldRewriteSpec extends SparkSpec {
  import spark.implicits._

  // char_hist produces array<bigint> with containsNull = false — the
  // rewrite's target domain. Parquet-backed input, because a local Seq
  // constant-folds into a LocalRelation before the plan is inspectable.
  private def vecs: DataFrame = {
    graft.expressions.VectorExpressions.registerAll(spark)
    spark.read.parquet(s"$sfTiny/documents.parquet")
      .limit(4)
      .selectExpr("char_hist(text, 8) AS a", "char_hist(source, 8) AS b")
  }

  private def optimizedContains(df: DataFrame, needle: Class[_]): Boolean =
    df.queryExecution.optimizedPlan
      .collect { case p => p.expressions }.flatten
      .exists(_.exists(e => needle.isInstance(e)))

  test("dot-product fold rewrites to vec_dot_long and values agree") {
    val df = vecs.selectExpr(
      "aggregate(zip_with(a, b, (x, y) -> x * y), 0L, (acc, v) -> acc + v) AS hof")
    assert(optimizedContains(df, classOf[DotProductLong]),
      s"rewrite did not fire:\n${df.queryExecution.optimizedPlan}")
    val native = vecs.selectExpr("vec_dot_long(a, b) AS nat")
    assert(df.collect().map(_.getLong(0)).toSeq ==
      native.collect().map(_.getLong(0)).toSeq)
  }

  test("squared-distance fold rewrites to vec_l2sq_long (both orientations)") {
    val d1 = vecs.selectExpr(
      "aggregate(zip_with(a, b, (x, y) -> (x - y) * (x - y)), 0L, (acc, v) -> acc + v) AS s")
    val d2 = vecs.selectExpr(
      "aggregate(zip_with(a, b, (x, y) -> (y - x) * (y - x)), 0L, (acc, v) -> v + acc) AS s")
    assert(optimizedContains(d1, classOf[L2SquaredDistanceLong]))
    assert(optimizedContains(d2, classOf[L2SquaredDistanceLong]))
    assert(d1.collect().map(_.getLong(0)).toSeq ==
      d2.collect().map(_.getLong(0)).toSeq)
  }

  test("near-miss folds do NOT rewrite") {
    // (a) lambda is not the plain product
    val notProduct = vecs.selectExpr(
      "aggregate(zip_with(a, b, (x, y) -> x * y + 1L), 0L, (acc, v) -> acc + v) AS s")
    assert(!optimizedContains(notProduct, classOf[DotProductLong]))
    // (b) fold seed is not 0
    val notZero = vecs.selectExpr(
      "aggregate(zip_with(a, b, (x, y) -> x * y), 1L, (acc, v) -> acc + v) AS s")
    assert(!optimizedContains(notZero, classOf[DotProductLong]))
    // (c) nullable elements: an array built with CASE can hold nulls,
    // so containsNull = true and the rewrite must stay away
    val nullable = spark.read.parquet(s"$sfTiny/documents.parquet")
      .limit(4)
      .selectExpr(
        "array(doc_id, CASE WHEN n_chars > 0 THEN n_chars END) AS a",
        "array(doc_id, n_chars) AS b")
      .selectExpr(
        "aggregate(zip_with(a, b, (x, y) -> x * y), 0L, (acc, v) -> acc + v) AS s")
    assert(!optimizedContains(nullable, classOf[DotProductLong]))
  }

  test("rewrite preserves ANSI overflow errors (failOnError carried over)") {
    assert(spark.conf.get("spark.sql.ansi.enabled") == "true",
      "this spec pins the ANSI edge; Spark 4 defaults it on")
    val big = spark.read.parquet(s"$sfTiny/documents.parquet")
      .limit(1)
      // coalesce: parquet columns are nullable, which would flip the
      // arrays to containsNull = true and (correctly) block the rewrite
      .selectExpr(
        "array(coalesce(doc_id, 0L) + 4000000000L, 4000000001L) AS a",
        "array(coalesce(doc_id, 0L) + 4000000000L, 4000000001L) AS b")
      .selectExpr(
        "aggregate(zip_with(a, b, (x, y) -> x * y), 0L, (acc, v) -> acc + v) AS s")
    // the rewrite fired (array() of non-null longs has containsNull =
    // false), and the native expression must raise exactly where the
    // ANSI HOF fold would: 4e9 * 4e9 overflows a long
    assert(optimizedContains(big, classOf[DotProductLong]))
    val err = intercept[Exception] { big.collect() }
    def chain(t: Throwable): Seq[Throwable] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(8).toSeq
    assert(chain(err).exists(_.isInstanceOf[ArithmeticException]),
      s"expected long-overflow ArithmeticException, got $err")
  }
}
