package graft

import org.apache.spark.sql.functions._

/** Pins the shuffle-volume axis the bench tracker diffs: captured via
  * the execution listener (the frame's own queryExecution is never run
  * by a write action), deterministic across repeats, zero when no
  * exchange runs. */
class PlanMetricsSpec extends SparkSpec {
  import spark.implicits._

  private def measure(body: => Unit): Long = {
    val tally = PlanMetrics.register(spark)
    try { val b0 = tally.snapshot(); body; tally.drainAndRead(b0) }
    finally spark.listenerManager.unregister(tally)
  }

  test("a groupBy action reports positive, repeatable shuffle bytes") {
    val df = (1 to 10000).map(i => (i % 97, i.toLong)).toDF("k", "v")
    def run(): Unit = df.groupBy("k").agg(sum("v"))
      .write.format("noop").mode("overwrite").save()
    val first = measure(run())
    val second = measure(run())
    assert(first > 0, "shuffle bytes not captured through the listener")
    assert(first == second, s"non-deterministic: $first vs $second")
  }

  test("a shuffle-free scan reports zero") {
    val df = (1 to 1000).map(_.toLong).toDF("v").select(col("v") * 2)
    val bytes = measure(
      df.write.format("noop").mode("overwrite").save())
    assert(bytes == 0, s"expected no exchange, measured $bytes bytes")
  }

  test("multi-execution bodies accumulate across actions") {
    val df = (1 to 5000).map(i => (i % 13, i.toLong)).toDF("k", "v")
      .groupBy("k").agg(sum("v"))
    def once(): Unit = df.write.format("noop").mode("overwrite").save()
    val one = measure(once())
    val three = measure { once(); once(); once() }
    assert(three == 3 * one, s"expected ${3 * one}, got $three")
  }
}
