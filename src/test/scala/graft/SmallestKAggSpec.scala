package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.expressions.VectorExpressions

class SmallestKAggSpec extends SparkSpec {
  import spark.implicits._

  test("matches the row_number()<=k window cap exactly (g15's contract)") {
    VectorExpressions.registerAll(spark)
    // deterministic pseudo-random (g, v) rows incl. duplicate values in
    // a group (multiset semantics) and groups smaller than k
    val rows = (0 until 500).map { i =>
      val g = (i * 2654435761L) % 37
      val v = (i * 40503L) % 101
      (g, v)
    } :+ ((99L, 7L)) :+ ((99L, 7L)) :+ ((99L, 7L)) // dup-heavy tiny group
    val df = rows.toDF("g", "v")
    val k = 8
    val win = df.withColumn("rn", row_number().over(
        Window.partitionBy(col("g")).orderBy(col("v").asc)))
      .filter(col("rn") <= k)
      .groupBy("g").agg(sort_array(collect_list(col("v"))).as("vs"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val agg = df.groupBy("g")
      .agg(call_function("smallest_k_agg", col("v"), lit(k)).as("vs"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(win.keySet == agg.keySet)
    win.foreach { case (g, vs) => assert(agg(g) == vs, s"group $g") }
  }

  test("output is sorted ascending and capped at k across partitions") {
    VectorExpressions.registerAll(spark)
    // 1 group spread over many partitions so merge() does real work
    val df = spark.range(0, 1000, 1, 13)
      .select(lit(1L).as("g"), (col("id") * 7919 % 997).as("v"))
    val out = df.groupBy("g")
      .agg(call_function("smallest_k_agg", col("v"), lit(5)).as("vs"))
      .collect().head.getSeq[Long](1)
    assert(out.size == 5)
    assert(out == out.sorted)
    val expected = (0 until 1000).map(i => i.toLong * 7919 % 997)
      .sorted.take(5)
    assert(out == expected)
  }

  test("all-NULL groups evaluate to NULL like min()") {
    VectorExpressions.registerAll(spark)
    val r = Seq((1L, Option.empty[Long]), (1L, Option.empty[Long]),
        (2L, Some(42L)))
      .toDF("g", "x")
      .groupBy("g")
      .agg(call_function("smallest_k_agg", col("x"), lit(4)).as("vs"))
      .collect().map(x => x.getLong(0) -> Option(x.get(1))).toMap
    assert(r(1L).isEmpty)
    assert(r(2L).isDefined)
  }

  test("k must be a positive integer literal") {
    VectorExpressions.registerAll(spark)
    intercept[Exception] {
      Seq((1L, 2L)).toDF("g", "v").groupBy("g")
        .agg(call_function("smallest_k_agg", col("v"), lit(0)))
        .collect()
    }
  }
}
