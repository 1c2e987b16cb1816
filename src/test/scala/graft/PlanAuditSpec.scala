package graft

import org.apache.spark.sql.functions._

/** The audit's single-partition detector: an unpartitioned
  * `Window.orderBy` funnels EVERY row through one task and must be
  * flagged; a final global aggregate's SinglePartition exchange (input =
  * one pre-aggregated row per upstream task) must NOT be. The detector is
  * the gate every future operator passes through, so both directions are
  * pinned here against real executed-plan text, not synthetic strings. */
class PlanAuditSpec extends SparkSpec {
  import spark.implicits._

  test("unpartitioned Window.orderBy is flagged as a bad single partition") {
    import org.apache.spark.sql.expressions.Window
    val df = (1 to 100).toDF("x")
      .withColumn("rn", row_number().over(Window.orderBy(col("x"))))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("Exchange SinglePartition"),
      s"expected the anti-pattern plan to contain the exchange:\n$plan")
    assert(PlanAudit.badSinglePartitions(plan) > 0,
      s"detector missed the unpartitioned window:\n$plan")
  }

  test("final global aggregate's SinglePartition exchange is whitelisted") {
    val df = (1 to 100).toDF("x").agg(sum(col("x")).as("s"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("Exchange SinglePartition"),
      s"expected a global-agg plan to contain the exchange:\n$plan")
    assert(PlanAudit.badSinglePartitions(plan) == 0,
      s"detector flagged a legitimate partial->final aggregate:\n$plan")
  }
}
