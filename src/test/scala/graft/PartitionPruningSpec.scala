package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.FileSourceScanExec
import graft.io.Tables

/** Partitioned layout + planning-time pruning: a reader filtering on the
  * partition column must touch only the matching directories — the scan
  * carries the predicate as a PartitionFilter and lists a strict subset
  * of partitions. This is the primary-index pattern for 100 TB tables. */
class PartitionPruningSpec extends SparkSpec {

  test("writePartitioned layout prunes partitions at planning time") {
    val dir = Files.createTempDirectory("part_orders").toString
    val orders = Tables.orders(spark, sfTiny)
      .withColumn("order_year", year(col("o_orderdate")))
    Tables.writePartitioned(orders, dir, "order_year")

    val read = spark.read.parquet(dir)
    val filtered = read.filter(col("order_year") === 1995)

    // values survive the round-trip
    val expected = orders.filter(col("order_year") === 1995).count()
    assert(filtered.count() == expected && expected > 0)

    // the physical scan prunes: partition filter present, and the file
    // listing covers only the one matching directory
    val scan = filtered.queryExecution.executedPlan.collect {
      case s: FileSourceScanExec => s
    }.head
    assert(scan.partitionFilters.nonEmpty,
      "partition-column predicate did not become a PartitionFilter")
    val years = read.select("order_year").distinct().count()
    assert(years > 1, "fixture must span multiple partitions")
    assert(scan.selectedPartitions.partitionCount == 1,
      s"expected 1 pruned partition, scanned ${scan.selectedPartitions.partitionCount}")
  }
}
