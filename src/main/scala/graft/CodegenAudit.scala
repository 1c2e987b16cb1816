package graft

import org.apache.logging.log4j.{Level, LogManager}
import org.apache.logging.log4j.core.{LogEvent, LoggerContext}
import org.apache.logging.log4j.core.appender.AbstractAppender
import org.apache.logging.log4j.core.config.Property

/** Execution-time codegen audit: runs every registered query (noop sink)
  * and captures Spark's own codegen-degradation warnings — the failures
  * PlanAudit cannot see because they only happen when generated code is
  * actually compiled:
  *
  *  - "Failed to compile the generated Java code." / "Code grows beyond
  *    64 KB": Janino refused the generated method, the ENTIRE stage
  *    silently falls back to interpreted eval (measured 8x slower on the
  *    simhash probe explode before it was restructured — DedupOps
  *    .simHashCandidates' codegen note has the full story);
  *  - "Found too long generated codes": the stage compiled but a method
  *    exceeds spark.sql.codegen.hugeMethodLimit, so the JVM JIT never
  *    optimizes it and whole-stage codegen is dropped for the plan.
  *
  * Either way the query still returns correct rows — which is exactly
  * why this needs a standing gate: nothing else makes the 8x visible.
  *
  * Usage: `runMain graft.CodegenAudit [sfDir]` — one line per query,
  * nonzero exit if any query degraded. Complements PlanAudit (plan-shape
  * anti-patterns) the way Bench complements Verify.
  */
object CodegenAudit {
  private val hits = new scala.collection.mutable.ArrayBuffer[String]
  private val markers = Seq(
    "Whole-stage codegen disabled for plan",
    "Found too long generated codes",
    "Failed to compile the generated Java code")

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = GraftSession.getOrCreate("graft-codegen-audit")

    // tap the live log4j2 config: Spark logs the fallback at WARN on the
    // driver, so an in-process appender sees every degradation with zero
    // config-file changes
    val ctx = LogManager.getContext(false).asInstanceOf[LoggerContext]
    val appender = new AbstractAppender(
      "codegen-audit", null, null, true, Property.EMPTY_ARRAY) {
      override def append(e: LogEvent): Unit = {
        val m = e.getMessage.getFormattedMessage
        if (markers.exists(m.contains))
          hits.synchronized { hits += m.linesIterator.next().take(160) }
      }
    }
    appender.start()
    ctx.getConfiguration.getRootLogger.addAppender(appender, Level.WARN, null)
    ctx.updateLoggers()

    var flagged = List.empty[String]
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val before = hits.synchronized(hits.size)
      val err =
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); None }
        catch { case e: Throwable => Some(e.getMessage) }
        finally spark.catalog.clearCache()
      val mine = hits.synchronized(hits.drop(before).toList)
      val status =
        if (err.isDefined) "ERROR"
        else if (mine.nonEmpty) "DEGRADED"
        else "codegen-clean"
      if (err.isDefined || mine.nonEmpty) flagged ::= name
      println(f"$name%-26s $status")
      mine.distinct.take(3).foreach(m => println(s"    $m"))
      err.foreach(m => println(s"    ${m.linesIterator.next().take(160)}"))
    }
    spark.stop()
    if (flagged.nonEmpty) {
      System.err.println(s"degraded: ${flagged.distinct.sorted.mkString(", ")}")
      sys.exit(1)
    }
  }
}
