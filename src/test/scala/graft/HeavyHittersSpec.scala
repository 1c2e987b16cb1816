package graft

import org.apache.spark.sql.functions._
import graft.expressions.VectorExpressions

/** Pins the Misra-Gries aggregate: exact contents where no eviction
  * happens, the order-independent guarantees where it does, and the
  * serialize/merge path across a real multi-partition shuffle. */
class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  private def mg(dfCap: (org.apache.spark.sql.DataFrame, Int)): Map[Long, Long] = {
    VectorExpressions.registerAll(spark)
    val (df, cap) = dfCap
    df.agg(expr(s"mg_topk_agg(key, $cap)").as("m"))
      .collect().head.getMap[Long, Long](0).toMap
  }

  test("exact when cardinality fits the capacity") {
    val df = Seq(1L, 1L, 2L, 3L, 3L, 3L).toDF("key")
    assert(mg(df -> 8) == Map(1L -> 2L, 2L -> 1L, 3L -> 3L))
  }

  test("deterministic eviction on single-partition ordered input") {
    // capacity 2, stream: a a a b c  (one partition, fixed order)
    // after aaab: {a:3, b:1}; c arrives full -> decrement all: {a:2}
    val df = Seq("a", "a", "a", "b", "c").map(_.head.toLong).toDF("key")
      .coalesce(1)
    assert(mg(df -> 2) == Map('a'.toLong -> 2L))
  }

  test("MG guarantees hold under multi-partition merge on zipf keys") {
    val n = 100000
    // deterministic zipf-ish: key = floor(M/u), u uniform in 1..M
    val keys = (1 to n).map(i => 4096L / (1L + ((i * 48271L) % 4096L)))
    val exact = keys.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val cap = 16
    val est = mg(keys.toDF("key").repartition(13) -> cap)
    assert(est.size <= cap)
    // every estimate underestimates, by at most N/cap
    est.foreach { case (k, e) =>
      assert(e <= exact(k), s"key $k over-estimated: $e > ${exact(k)}")
      assert(exact(k) - e <= n / cap,
        s"key $k error ${exact(k) - e} > ${n / cap}")
    }
    // every provable heavy hitter is present
    exact.filter(_._2 * cap > n).keys.foreach { k =>
      assert(est.contains(k), s"heavy key $k missing from summary")
    }
  }

  test("summary survives the SQL frontend and grouped aggregation") {
    VectorExpressions.registerAll(spark)
    Seq((0, 7L), (0, 7L), (0, 9L), (1, 5L)).toDF("g", "key")
      .createOrReplaceTempView("hh_in")
    val out = spark.sql(
      "SELECT g, mg_topk_agg(key, 4) AS m FROM hh_in GROUP BY g")
      .collect().map(r => r.getInt(0) -> r.getMap[Long, Long](1).toMap).toMap
    assert(out(0) == Map(7L -> 2L, 9L -> 1L))
    assert(out(1) == Map(5L -> 1L))
  }
}
