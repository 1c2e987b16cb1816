package graft

import org.apache.spark.sql.functions._
import graft.io.Tables

/** Runtime filter injection — the at-scale mechanism that turns a
  * selective dimension filter into row-group pruning on the fact side:
  * Spark builds a bloom filter over the filtered build side's join keys
  * and injects `bloom_filter_might_contain` into the fact scan's
  * predicate, so shuffle input shrinks before the join ever runs.
  *
  * Default thresholds target cluster-scale tables (application side
  * > 10 GB); the spec lowers them to exercise the path on fixture data
  * and pins (a) the filter is injected and (b) results are unchanged.
  */
class RuntimeFilterSpec extends SparkSpec {

  test("selective dim filter injects a bloom runtime filter on the fact side") {
    val conf = spark.conf
    val old = Map(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" ->
        conf.getOption("spark.sql.optimizer.runtime.bloomFilter.enabled"),
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" ->
        conf.getOption("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"),
      "spark.sql.autoBroadcastJoinThreshold" ->
        conf.getOption("spark.sql.autoBroadcastJoinThreshold"))
    try {
      conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
        "0")
      // runtime filters apply to SHUFFLE joins only — when the dim can
      // broadcast, the broadcast hash join already prunes at the probe.
      // Forcing the shuffle path here models the cluster case where the
      // filtered dim is too large to broadcast.
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

      // per-order quantity rollup joined to a filtered dim: the rollup
      // gives the application side the shuffle the injected filter
      // shrinks (Spark skips injection when nothing would shuffle)
      def query() = Tables.lineitem(spark, sfTiny)
        .groupBy("l_orderkey")
        .agg(sum(col("l_quantity").cast("decimal(18,2)")).as("qty"))
        .join(Tables.orders(spark, sfTiny)
            .filter(col("o_orderpriority") === "1-URGENT"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"))

      val optimized = query().queryExecution.optimizedPlan.toString
      // Spark 4 renders the injected filter as might_contain(<scalar
      // subquery over bloom_filter_agg(creation-side keys)>)
      assert(optimized.contains("might_contain") &&
        optimized.contains("bloom_filter_agg"),
        s"expected injected bloom runtime filter in:\n$optimized")

      val withFilter = query().collect().map(r => (r.getString(0), r.getLong(1)))
      conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
      val without = query().collect().map(r => (r.getString(0), r.getLong(1)))
      assert(withFilter.sorted.sameElements(without.sorted),
        "bloom runtime filter changed query results")
    } finally old.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }
}
