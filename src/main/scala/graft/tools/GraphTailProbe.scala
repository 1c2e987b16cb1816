package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

/** Attributes g08's wall (the graph-family bench tail) to the operator
  * pieces it actually runs — the round-10 verdict question "where do
  * the seconds go: join, agg, or checkpoint?" answered from stage
  * callsites instead of guesses.
  *
  * Every Spark stage carries its triggering callsite (e.g. `distinct
  * at GraphOps.scala:357`); a listener sums executor task time per
  * callsite over one end-to-end g08 run (base connectedComponents +
  * incrementalComponents, noop sink). Because ccWithRounds uses LAZY
  * localCheckpoints, there is no separate checkpoint pass to measure —
  * materialization rides the per-round signature action; what the
  * table shows instead is how the round budget divides between the
  * star-contraction shuffles (largeStar/smallStar joins + min-aggs)
  * and the signature aggregations.
  *
  * Usage: `runMain graft.tools.GraphTailProbe [sfDir]`.
  */
object GraphTailProbe {

  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.GraftSession.getOrCreate("graph-tail-probe")
    // warm-up at the tiny SF so JIT/session startup stays out of the
    // attributed run (the Bench discipline)
    graft.queries.Registry.queries("g08_incremental_components")(
      spark, "/root/testdata/sf0.001")
      .write.format("noop").mode("overwrite").save()

    val bydSite =
      scala.collection.mutable.LinkedHashMap[String, (Long, Long)]()
    val listener = new SparkListener {
      override def onStageCompleted(ev: SparkListenerStageCompleted): Unit = {
        // AQE materializes stages from its thread pool, so the SHORT
        // callsite is a CompletableFuture lambda; the long form
        // (stageInfo.details) still carries the user stack — attribute
        // to its first graft frame
        val name = ev.stageInfo.details.split('\n')
          .find(l => l.contains("graft.") && !l.contains("GraphTailProbe"))
          .map(_.trim.replaceAll("^at ", ""))
          .getOrElse(ev.stageInfo.name.takeWhile(_ != '\n'))
        val ms = Option(ev.stageInfo.taskMetrics)
          .map(_.executorRunTime).getOrElse(0L)
        val (n0, t0) = bydSite.getOrElse(name, (0L, 0L))
        bydSite(name) = (n0 + 1, t0 + ms)
      }
    }
    spark.sparkContext.addSparkListener(listener)
    // the g08 composition, phase-timed: base CC (per-round walls via
    // the ccWithRounds hook), then the incremental batch step
    import org.apache.spark.sql.functions._
    // cache lifecycle: probe-scoped — the JVM exits when the probe finishes
    val p = graft.queries.Graph.coPurchasePairs(spark, d).persist()
    val baseE = p.filter((col("u") + col("v")) % 10 =!= 0)
    val batch = p.filter((col("u") + col("v")) % 10 === 0)
    p.count() // stage the edge build outside the phase walls
    val roundWalls = scala.collection.mutable.ArrayBuffer[Double]()
    val t0 = System.nanoTime()
    val (labels, rounds) = graft.operators.GraphOps.ccWithRounds(baseE,
      maxRounds = 30, onRound = (_, s) => roundWalls += s)
    labels.write.format("noop").mode("overwrite").save()
    val tBase = (System.nanoTime() - t0) / 1e9
    val t1 = System.nanoTime()
    graft.operators.GraphOps.incrementalComponents(labels, batch)
      .write.format("noop").mode("overwrite").save()
    val tInc = (System.nanoTime() - t1) / 1e9
    val wall = tBase + tInc
    spark.sparkContext.removeSparkListener(listener)
    println(f"base CC: $tBase%.2f s over $rounds rounds " +
      f"(${roundWalls.map(w => f"$w%.2f").mkString(", ")}), " +
      f"then labels join+save; incremental step: $tInc%.2f s")
    // drain the async listener bus before reading (the Bench lesson)
    Thread.sleep(1500)
    val rows = bydSite.toSeq.sortBy(-_._2._2)
    val total = rows.map(_._2._2).sum
    println(f"g08 wall: $wall%.2f s; summed executor task time: " +
      f"${total / 1000.0}%.1f s (x32 threads)")
    println(f"${"stages"}%7s ${"task-s"}%8s ${"share"}%6s  callsite")
    rows.take(18).foreach { case (site, (n, ms)) =>
      println(f"$n%7d ${ms / 1000.0}%8.1f ${ms * 100.0 / total}%5.1f%%  $site")
    }
    spark.stop()
  }
}
