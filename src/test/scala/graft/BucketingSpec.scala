package graft

import graft.io.Tables

/** Co-located joins via bucketing: two tables bucketed by the join key
  * into the same bucket count join with NO shuffle exchange — the
  * pre-partitioning strategy for repeatedly-joined 100 TB fact tables
  * (pay the shuffle once at write time, never per query). */
class BucketingSpec extends SparkSpec {

  test("bucketed tables join without a shuffle exchange") {
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    // a crashed previous run can leave the managed location behind with no
    // catalog entry — Spark then refuses to recreate the table
    for (t <- Seq("b_orders", "b_lineitem")) {
      val loc = new java.io.File(s"spark-warehouse/$t")
      if (loc.exists()) {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
        }
        rm(loc)
      }
    }
    Tables.orders(spark, sfTiny)
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("b_orders")
    Tables.lineitem(spark, sfTiny)
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("b_lineitem")

    val bo = spark.table("b_orders")
    val bl = spark.table("b_lineitem")
    val joined = bo.join(bl, bo("o_orderkey") === bl("l_orderkey"))
    val plan = joined.queryExecution.sparkPlan.treeString
    assert(!plan.contains("Exchange"), s"bucketed join should not shuffle:\n$plan")
    assert(joined.count() > 0)

    val o = Tables.orders(spark, sfTiny)
    val l = Tables.lineitem(spark, sfTiny)
    assert(joined.count() == o.join(l, o("o_orderkey") === l("l_orderkey")).count())
  }
}
