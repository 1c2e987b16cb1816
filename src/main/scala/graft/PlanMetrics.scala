package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.{QueryExecution, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.Exchange
import org.apache.spark.sql.util.QueryExecutionListener

/** The deterministic half of the bench signal. Wall-clock on a shared
  * local[32] host swings ±20% run-to-run (three same-day full runs
  * measured 137/172/145 s; round 8's driver run carried a contiguous
  * contention window that fabricated 56 "regressions"), but what a plan
  * *does* is a pure function of plan + data. Bench records, per query:
  *
  *  - '''shuffle bytes''' — captured at STAGE level via a SparkListener
  *    on the shared SparkContext, NOT a QueryExecutionListener: stage
  *    events fire for every job in the JVM, which is what makes the
  *    number right for streaming micro-batches (no QueryExecutionListener
  *    callback fires for them, and child sessions created by
  *    `SparkSession.newSession` never see a parent-registered execution
  *    listener at all — round 8 recorded a silent 0.0 for all st*
  *    queries this way) and for lineage-materializing actions like
  *    `localCheckpoint` that bypass the execution-listener path too.
  *  - '''exchange count + plan node count''' — summed over every batch
  *    QueryExecution the bracket triggers, via an execution listener.
  *    This is the plan-SIZE axis: an iterative operator that stops
  *    truncating its lineage shows up here as a node-count explosion
  *    (round 7's d10 printed 450-exchange replay plans) even when its
  *    byte volume barely moves. Streaming micro-batch plans do NOT
  *    reach this listener — Bench omits those entries rather than
  *    emitting a misleading 0 (the bytes axis covers st* instead).
  *
  * Capture point matters: an action like `df.write` plans and executes
  * its own QueryExecution, leaving the frame's own `queryExecution`
  * un-run (its accumulators read 0; the first cut of this file made
  * exactly that mistake). Listener delivery is asynchronous on both
  * buses — bracket a measured region with `snapshot()` ... then
  * `drainAndRead(before)` OUTSIDE any timed region.
  */
object PlanMetrics {

  /** expands what `SparkPlan.children` hides: AQE roots hand off to
    * their final executedPlan, query stages to their wrapped subtree.
    * Subquery plans are not traversed — omitting them consistently
    * keeps the number comparable across rounds. */
  private def allNodes(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => p +: allNodes(a.executedPlan)
    case q: QueryStageExec => p +: allNodes(q.plan)
    case _ => p +: p.children.flatMap(allNodes)
  }

  /** shuffle bytes written by ONE already-executed plan (spec-level
    * cross-check for the stage tally; not the bench capture path) */
  private[graft] def shuffleBytesOf(plan: SparkPlan): Long =
    allNodes(plan)
      .flatMap(_.metrics.get("shuffleBytesWritten"))
      .map(_.value).filter(_ > 0).sum

  /** shuffle exchanges in one executed plan (hash/range/single-partition
    * — `Exchange` covers shuffle and broadcast; broadcast is counted too,
    * deliberately: a broadcast that silently becomes a shuffle or
    * vice-versa is exactly a plan-shape change the axis should see) */
  private[graft] def exchangesOf(plan: SparkPlan): Int =
    allNodes(plan).count(_.isInstanceOf[Exchange])

  private[graft] def nodeCountOf(plan: SparkPlan): Int = allNodes(plan).size

  /** Accumulates the three deterministic counters across every job /
    * batch query execution on the session's SparkContext. */
  final class Tally private[PlanMetrics] () {
    private[PlanMetrics] val bytes = new AtomicLong(0L)
    private[PlanMetrics] val exchanges = new AtomicLong(0L)
    private[PlanMetrics] val nodes = new AtomicLong(0L)

    private[PlanMetrics] val stageListener: SparkListener = new SparkListener {
      override def onStageCompleted(ev: SparkListenerStageCompleted): Unit = {
        val m = ev.stageInfo.taskMetrics
        if (m != null) bytes.addAndGet(m.shuffleWriteMetrics.bytesWritten)
      }
    }

    private[PlanMetrics] val execListener: QueryExecutionListener =
      new QueryExecutionListener {
        override def onSuccess(funcName: String, qe: QueryExecution,
                               durationNs: Long): Unit = {
          exchanges.addAndGet(exchangesOf(qe.executedPlan).toLong)
          nodes.addAndGet(nodeCountOf(qe.executedPlan).toLong)
        }
        override def onFailure(funcName: String, qe: QueryExecution,
                               exception: Exception): Unit = ()
      }

    /** (bytes, exchanges, plan nodes) seen so far */
    def snapshot(): (Long, Long, Long) =
      (bytes.get(), exchanges.get(), nodes.get())

    /** wait (bounded) for BOTH async listener buses to go quiet, then
      * return the deltas accumulated since `before`. Runs OUTSIDE any
      * timed region. */
    def drainAndRead(before: (Long, Long, Long),
                     maxWaitMs: Long = 2000): (Long, Long, Long) = {
      val deadline = System.nanoTime() + maxWaitMs * 1000000L
      var last = snapshot()
      var stableSince = System.nanoTime()
      while (System.nanoTime() < deadline &&
             System.nanoTime() - stableSince < 150L * 1000000L) {
        Thread.sleep(10)
        val now = snapshot()
        if (now != last) { last = now; stableSince = System.nanoTime() }
      }
      val s = snapshot()
      (s._1 - before._1, s._2 - before._2, s._3 - before._3)
    }
  }

  def register(spark: SparkSession): Tally = {
    val t = new Tally
    spark.sparkContext.addSparkListener(t.stageListener)
    spark.listenerManager.register(t.execListener)
    t
  }

  def unregister(spark: SparkSession, t: Tally): Unit = {
    spark.sparkContext.removeSparkListener(t.stageListener)
    spark.listenerManager.unregister(t.execListener)
  }
}
