package graft

import org.apache.spark.sql.functions._
import graft.io.Tables

/** Pins that the co-purchase self-join (g02/g04's edge builder) reuses
  * one exchange for both sides — the table shuffles ONCE on the join
  * key, not twice (ReusedExchange in the executed plan). */
class CoPurchasePlanCheck extends SparkSpec {
  test("lineitem self-join reuses the exchange for both sides") {
    val li = Tables.lineitem(spark, sfTiny)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
    val pairs = li.as("x")
      .join(li.as("y"), col("x.ok") === col("y.ok") && col("x.pk") < col("y.pk"))
      .groupBy(col("x.pk").as("u"), col("y.pk").as("v"))
      .agg(count(lit(1)).as("w"))
      .filter(col("w") >= 2)
    pairs.write.format("noop").mode("overwrite").save()
    val plan = pairs.queryExecution.executedPlan.toString
    assert(plan.contains("ReusedExchange") || !plan.contains("Exchange hashpartitioning(ok"),
      s"self-join shuffles the table twice:\n$plan")
  }
}
