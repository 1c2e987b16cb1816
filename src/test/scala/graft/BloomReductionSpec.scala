package graft

import org.apache.spark.sql.functions._
import graft.expressions.VectorExpressions
import graft.io.Tables
import graft.operators.JoinOps

/** bloom_agg / bloom_contains / JoinOps.bloomPreFilter: the guarantees
  * the ds03 gate composition relies on — zero false negatives, a real
  * reduction on the probe side, and a false-positive rate near the
  * requested fpp. */
class BloomReductionSpec extends SparkSpec {
  import spark.implicits._

  test("no false negatives: every true match survives the pre-filter") {
    val urgent = Tables.orders(spark, sfTiny)
      .filter(col("o_orderpriority") === "1-URGENT").select("o_orderkey")
    val li = Tables.lineitem(spark, sfTiny)
    val exact = li.join(urgent, col("l_orderkey") === col("o_orderkey"),
      "left_semi")
    val reduced = JoinOps.bloomPreFilter(li, "l_orderkey", urgent,
      "o_orderkey", expectedItems = 100000L, fpp = 0.03)
    // exact matches minus pre-filter survivors must be empty
    val dropped = exact
      .join(reduced.select(col("l_orderkey").as("rk"),
        col("l_linenumber").as("rn")),
        col("l_orderkey") === col("rk") && col("l_linenumber") === col("rn"),
        "left_anti")
      .count()
    assert(dropped == 0, s"$dropped true matches dropped by the bloom filter")
  }

  test("the pre-filter actually reduces the probe side, near the fpp bound") {
    val urgent = Tables.orders(spark, sfTiny)
      .filter(col("o_orderpriority") === "1-URGENT").select("o_orderkey")
    val li = Tables.lineitem(spark, sfTiny)
    val total = li.count()
    val trueMatches = li.join(urgent,
      col("l_orderkey") === col("o_orderkey"), "left_semi").count()
    val passed = JoinOps.bloomPreFilter(li, "l_orderkey", urgent,
      "o_orderkey", expectedItems = 100000L, fpp = 0.03).count()
    val falsePositives = passed - trueMatches
    val nonMatches = total - trueMatches
    assert(falsePositives >= 0)
    // 3x headroom over the nominal 3%: fpp is an expectation, not a bound
    assert(falsePositives.toDouble <= nonMatches * 0.09,
      s"fp rate ${falsePositives.toDouble / nonMatches} >> requested 0.03")
    assert(passed < total, "pre-filter passed everything — no reduction")
  }

  test("string keys hash consistently between build and probe") {
    VectorExpressions.registerAll(spark)
    val build = Seq("alpha", "βeta", "gamma").toDF("s")
    val bytes = build
      .agg(call_function("bloom_agg", col("s"), lit(100L), lit(0.01)))
      .head().getAs[Array[Byte]](0)
    val probed = Seq("alpha", "βeta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta").toDF("s")
      .select(col("s"),
        call_function("bloom_contains", lit(bytes), col("s")).as("hit"))
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(probed("alpha") && probed("βeta") && probed("gamma"),
      "built keys must always probe true")
  }

  test("SQL decimal literals are accepted for fpp (0.03 parses as DECIMAL)") {
    // a plain SQL call writes the fpp as a decimal literal, which Catalyst
    // stores as o.a.s.sql.types.Decimal — regression test for the builder
    // only matching Double/java.math.BigDecimal
    VectorExpressions.registerAll(spark)
    spark.range(10).createOrReplaceTempView("bloom_fpp_src")
    val bytes = spark.sql(
      "SELECT bloom_agg(id, 1000, 0.03) AS f FROM bloom_fpp_src")
      .head().getAs[Array[Byte]](0)
    assert(bytes.nonEmpty)
    val hits = spark.range(10)
      .select(call_function("bloom_contains", lit(bytes), col("id")).as("h"))
      .agg(sum(when(col("h"), 1).otherwise(0)).as("hits"))
      .head().getLong(0)
    assert(hits == 10, "built keys must always probe true")
  }

  test("null keys probe to null; empty build contains nothing") {
    VectorExpressions.registerAll(spark)
    val bytes = spark.range(0).select(col("id"))
      .agg(call_function("bloom_agg", col("id"), lit(10L), lit(0.01)))
      .head().getAs[Array[Byte]](0)
    val r = spark.range(5)
      .select(call_function("bloom_contains", lit(bytes), col("id")).as("h"))
      .agg(sum(when(col("h"), 1).otherwise(0)).as("hits"))
      .head().getLong(0)
    assert(r == 0, "empty filter must contain nothing")
    val n = spark.sql(
      s"SELECT bloom_contains(CAST(NULL AS BINARY), 1L) AS h").collect()
    assert(n.head.isNullAt(0))
  }
}
