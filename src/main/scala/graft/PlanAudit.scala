package graft

/** Physical-plan audit: for every registered query, count the plan
  * features that matter at scale — exchanges (shuffles), join strategies,
  * top-k collapse, scan-level filter pushdown — and flag the structural
  * anti-patterns (cartesian products, global sorts that aren't top-ks).
  *
  * Usage: `runMain graft.PlanAudit [sfDir]` — prints one line per query
  * plus a summary; exits nonzero if a flagged anti-pattern appears, so it
  * can run as a gate. This is the automated form of the per-operator
  * `.explain("formatted")` review the build discipline requires.
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = GraftSession.getOrCreate("graft-plan-audit")
    var flagged = List.empty[String]
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val plan = fn(spark, sfDir).queryExecution.executedPlan.toString
      def n(feature: String): Int =
        feature.r.findAllMatchIn(plan).size
      val exchanges = n("Exchange (hash|range)partitioning")
      val bhj = n("BroadcastHashJoin")
      val smj = n("SortMergeJoin")
      val topk = n("TakeOrderedAndProject")
      val cartesian = n("CartesianProduct")
      val nlj = n("BroadcastNestedLoopJoin")
      // a range-partitioning exchange is a global sort that did NOT
      // collapse into TakeOrderedAndProject (top-k plans never contain
      // one); no registered query should want a full ordered shuffle
      val globalSort = n("Exchange rangepartitioning")
      val notes = new StringBuilder
      if (cartesian > 0) { notes ++= " CARTESIAN!"; flagged ::= name }
      if (globalSort > 0) { notes ++= " GLOBAL-SORT!"; flagged ::= name }
      println(f"$name%-26s shuffles=$exchanges%2d bhj=$bhj nlj=$nlj " +
        f"smj=$smj topk=$topk$notes")
    }
    spark.stop()
    if (flagged.nonEmpty) {
      System.err.println(s"flagged: ${flagged.distinct.sorted.mkString(", ")}")
      sys.exit(1)
    }
  }
}
