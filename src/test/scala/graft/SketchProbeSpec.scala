package graft

import org.apache.spark.sql.functions._
import graft.expressions.VectorExpressions

/** cms_estimate: reader-side probe of Spark's count_min_sketch binary.
  * Pins the two hash paths (long keys, string keys via UTF-8 bytes) and
  * the one-sided error guarantee (estimate is never below the exact
  * count) that ds02's gate boolean relies on. */
class SketchProbeSpec extends SparkSpec {
  import spark.implicits._

  test("long-key probe returns the exact count on a collision-free sketch") {
    VectorExpressions.registerAll(spark)
    val df = (1 to 1000).map(i => (i % 10).toLong).toDF("k")
    // width 2000 counters >> 10 keys: no collisions, estimate == exact
    val sk = df.agg(expr("count_min_sketch(k, 0.001d, 0.999d, 42)").as("sk"))
    val probed = df.groupBy("k").agg(count(lit(1)).as("exact"))
      .crossJoin(sk)
      .select(col("k"), col("exact"),
        call_function("cms_estimate", col("sk"), col("k")).as("est"))
      .collect()
    assert(probed.length == 10)
    probed.foreach(r => assert(r.getLong(2) == r.getLong(1),
      s"key ${r.getLong(0)}: est ${r.getLong(2)} != exact ${r.getLong(1)}"))
  }

  test("string-key probe matches the aggregate's UTF-8 byte hashing") {
    VectorExpressions.registerAll(spark)
    val df = Seq.fill(7)("alpha").union(Seq.fill(3)("βeta")).toDF("s")
    val sk = df.agg(expr("count_min_sketch(s, 0.001d, 0.999d, 7)").as("sk"))
    val probed = df.groupBy("s").agg(count(lit(1)).as("exact"))
      .crossJoin(sk)
      .select(col("s"), col("exact"),
        call_function("cms_estimate", col("sk"), col("s")).as("est"))
      .collect()
    probed.foreach(r => assert(r.getLong(2) == r.getLong(1),
      s"key ${r.getString(0)}: est ${r.getLong(2)} != exact ${r.getLong(1)}"))
  }

  test("estimate is never below exact even under forced collisions") {
    VectorExpressions.registerAll(spark)
    val df = (1 to 5000).map(_.toLong).toDF("k")
    // eps=0.5 -> width 4: every counter is shared by ~1250 keys
    val sk = df.agg(expr("count_min_sketch(k, 0.5d, 0.9d, 1)").as("sk"))
    val low = df.crossJoin(sk)
      .select(call_function("cms_estimate", col("sk"), col("k")).as("est"))
      .filter(col("est") < 1L)
      .count()
    assert(low == 0, s"$low keys estimated below their exact count of 1")
  }

  test("upper error band est <= exact + eps*N holds on seeded fixed data") {
    // the probabilistic bound ds02's gate deliberately does NOT assert
    // (confidence 0.999 per key — a regenerated dataset could flip it):
    // on THIS fixed seed + fixed input it is deterministic, so pin it
    // here where a failure always means a code change, not bad luck
    VectorExpressions.registerAll(spark)
    val df = (1 to 20000).map(i => (i % 500).toLong).toDF("k")
    val eps = 0.001
    val sk = df.agg(expr(s"count_min_sketch(k, ${eps}d, 0.999d, 42)").as("sk"),
      count(lit(1)).as("n_total"))
    val out = df.groupBy("k").agg(count(lit(1)).as("exact"))
      .crossJoin(sk)
      .select(col("k"), col("exact"), col("n_total"),
        call_function("cms_estimate", col("sk"), col("k")).as("est"))
      .collect()
    assert(out.length == 500)
    out.foreach { r =>
      val bound = r.getLong(1) + math.ceil(eps * r.getLong(2)).toLong
      assert(r.getLong(3) >= r.getLong(1) && r.getLong(3) <= bound,
        s"key ${r.getLong(0)}: est ${r.getLong(3)} outside " +
          s"[${r.getLong(1)}, $bound]")
    }
  }

  test("null sketch or null key yields null") {
    VectorExpressions.registerAll(spark)
    val r = spark.sql(
      "SELECT cms_estimate(CAST(NULL AS BINARY), 1L) AS a").collect()
    assert(r.head.isNullAt(0))
  }

  test("cms_inner_product: exact join size on collision-free sketches") {
    VectorExpressions.registerAll(spark)
    // 10 distinct keys << width 2000: each key owns its counters, so the
    // inner product is EXACTLY sum over keys of cA(k)*cB(k)
    val a = (1 to 100).map(i => (i % 10).toLong).toDF("k") // 10 each
    val b = (1 to 40).map(i => (i % 5).toLong).toDF("k")   // keys 0..4, 8 each
    val ska = a.agg(expr("count_min_sketch(k, 0.001d, 0.999d, 42)").as("ska"))
    val skb = b.agg(expr("count_min_sketch(k, 0.001d, 0.999d, 42)").as("skb"))
    val est = ska.crossJoin(skb)
      .select(call_function("cms_inner_product", col("ska"), col("skb")))
      .collect().head.getLong(0)
    assert(est == 5L * 10L * 8L, s"est $est") // 5 shared keys x 10 x 8
    // self inner product = F2 = 10 keys x 10^2
    val f2 = ska.select(
      call_function("cms_inner_product", col("ska"), col("ska")))
      .collect().head.getLong(0)
    assert(f2 == 10L * 100L, s"f2 $f2")
  }

  test("cms_inner_product rejects sketches built with different seeds") {
    VectorExpressions.registerAll(spark)
    val a = (1 to 10).map(_.toLong).toDF("k")
    val ska = a.agg(expr("count_min_sketch(k, 0.001d, 0.999d, 42)").as("ska"))
    val skb = a.agg(expr("count_min_sketch(k, 0.001d, 0.999d, 43)").as("skb"))
    val ex = intercept[Exception] {
      ska.crossJoin(skb)
        .select(call_function("cms_inner_product", col("ska"), col("skb")))
        .collect()
    }
    assert(ex.getMessage != null)
  }

  test("minhash signature match fraction estimates Jaccard (ds09 band)") {
    VectorExpressions.registerAll(spark)
    // A = 0..999, B = 500..1499: J = 500/1500 = 1/3 exactly. k=64 gives
    // sigma = sqrt(J(1-J)/64) ~ 0.059; the +-0.18 band is 3 sigma, and
    // the whole check is DETERMINISTIC (fixed hash family, fixed sets)
    // so it can never flake — it pins that the estimator is wired to
    // the right sets, not a probabilistic property.
    val items = (0L to 999L).map(x => ("a", x)) ++
      (500L to 1499L).map(x => ("b", x))
    val sigs = items.toDF("src", "x")
      .groupBy("src").agg(expr("minhash_agg(x, 64)").as("sig"))
    val est = sigs.as("l").join(sigs.as("r"), expr("l.src < r.src"))
      .select(expr("size(filter(zip_with(l.sig, r.sig, (x, y) -> x = y)," +
        " m -> m))").as("m"))
      .head().getInt(0)
    val j = est / 64.0
    assert(math.abs(j - 1.0 / 3.0) <= 0.18,
      s"match fraction $j ($est/64) outside the 3-sigma band of 1/3")
  }
}
