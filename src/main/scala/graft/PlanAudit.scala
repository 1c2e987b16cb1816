package graft

/** Physical-plan audit: for every registered query, count the plan
  * features that matter at scale — exchanges (shuffles), join strategies,
  * top-k collapse, scan-level filter pushdown — and flag the structural
  * anti-patterns (cartesian products, global sorts that aren't top-ks,
  * single-partition funnels that aren't final aggregates).
  *
  * Usage: `runMain graft.PlanAudit [sfDir]` — prints one line per query
  * plus a summary; exits nonzero if a flagged anti-pattern appears, so it
  * can run as a gate. This is the automated form of the per-operator
  * `.explain("formatted")` review the build discipline requires.
  */
object PlanAudit {

  /** `Exchange SinglePartition` lines that funnel anything other than a
    * partial aggregate (or a local limit) into one task: the plan shape
    * an unpartitioned `Window.orderBy` produces, where EVERY row flows
    * through a single task. A final global aggregate's SinglePartition
    * exchange is fine — its input is one pre-aggregated row per upstream
    * task, bounded by task count not data size — so exchanges whose
    * immediate child is a partial aggregate ("partial_" in the agg
    * function list) or a LocalLimit are whitelisted. */
  private[graft] def badSinglePartitions(plan: String): Int = {
    val lines = plan.split('\n')
    lines.indices.count { i =>
      lines(i).contains("Exchange SinglePartition") && {
        val child = if (i + 1 < lines.length) lines(i + 1) else ""
        !(child.contains("partial_") || child.contains("LocalLimit"))
      }
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = GraftSession.getOrCreate("graft-plan-audit")
    var flagged = List.empty[String]
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val plan = fn(spark, sfDir).queryExecution.executedPlan.toString
      def n(feature: String): Int =
        feature.r.findAllMatchIn(plan).size
      val exchanges = n("Exchange (hash|range)partitioning") +
        n("Exchange SinglePartition")
      val bhj = n("BroadcastHashJoin")
      val smj = n("SortMergeJoin")
      val topk = n("TakeOrderedAndProject")
      val cartesian = n("CartesianProduct")
      val nlj = n("BroadcastNestedLoopJoin")
      // a range-partitioning exchange is a global sort that did NOT
      // collapse into TakeOrderedAndProject (top-k plans never contain
      // one); no registered query should want a full ordered shuffle
      val globalSort = n("Exchange rangepartitioning")
      val singleParts = badSinglePartitions(plan)
      // pushdown visibility: file scans, and how many of them reached
      // the reader with at least one pushed filter — the "filters reach
      // the parquet scan" rule made auditable (informative, not a gate:
      // full-table aggregates legitimately push nothing)
      val scans = n("FileScan parquet")
      val pushedScans = n("PushedFilters: \\[[^\\]]")
      // an operator that drops to the RDD API hides its shuffles behind a
      // `Scan ExistingRDD` leaf — the audit cannot see inside, so the
      // shuffle count is a LOWER bound, reported as such, never as 0
      val rddOpaque = plan.contains("Scan ExistingRDD")
      val notes = new StringBuilder
      if (cartesian > 0) { notes ++= " CARTESIAN!"; flagged ::= name }
      if (globalSort > 0) { notes ++= " GLOBAL-SORT!"; flagged ::= name }
      if (singleParts > 0) { notes ++= " SINGLE-PARTITION!"; flagged ::= name }
      if (rddOpaque) notes ++= " rdd-opaque(shuffle count is a lower bound)"
      val shufflesShown = if (rddOpaque) s">=$exchanges" else f"$exchanges%2d"
      println(f"$name%-26s shuffles=$shufflesShown bhj=$bhj nlj=$nlj " +
        f"smj=$smj topk=$topk scans=$scans pushed=$pushedScans$notes")
    }
    spark.stop()
    if (flagged.nonEmpty) {
      System.err.println(s"flagged: ${flagged.distinct.sorted.mkString(", ")}")
      sys.exit(1)
    }
  }
}
