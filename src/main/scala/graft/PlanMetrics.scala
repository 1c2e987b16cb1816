package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.{QueryExecution, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.util.QueryExecutionListener

/** Post-execution SQLMetric extraction — the deterministic half of the
  * bench signal. Wall-clock on a shared local[32] host swings ±20%
  * run-to-run (three same-day full runs measured 137/172/145 s), but the
  * bytes a plan shuffles are a pure function of plan + data: if shuffle
  * volume moves between rounds at the same SF, the PLAN changed, full
  * stop. Bench records it per query next to the seconds so the
  * regression tracker has one noise-free axis.
  *
  * Capture point: a QueryExecutionListener, NOT the benched frame's own
  * `queryExecution` — an action like `df.write` plans and executes its
  * own QueryExecution, leaving the frame's copy un-run (its accumulators
  * read 0; the first cut of this file made exactly that mistake). The
  * listener also gives the RIGHT total for multi-execution queries:
  * streaming replays and iterative operators (PageRank rounds, k-means
  * sweeps, star contraction) run many inner jobs, and their shuffle
  * volume is the sum over every execution the query triggered.
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

  /** shuffle bytes written by ONE already-executed plan */
  private[graft] def shuffleBytesOf(plan: SparkPlan): Long =
    allNodes(plan)
      .flatMap(_.metrics.get("shuffleBytesWritten"))
      .map(_.value).filter(_ > 0).sum

  /** Accumulates shuffle bytes across every successful query execution
    * on the session. Listener delivery is asynchronous — bracket a
    * measured region with `snapshot()` ... `drainAndRead(before)`. */
  final class ShuffleTally extends QueryExecutionListener {
    private val bytes = new AtomicLong(0L)

    override def onSuccess(funcName: String, qe: QueryExecution,
                           durationNs: Long): Unit =
      bytes.addAndGet(shuffleBytesOf(qe.executedPlan))

    override def onFailure(funcName: String, qe: QueryExecution,
                           exception: Exception): Unit = ()

    def snapshot(): Long = bytes.get()

    /** wait (bounded) for the async listener bus to go quiet, then
      * return the bytes accumulated since `before`. Runs OUTSIDE any
      * timed region. */
    def drainAndRead(before: Long, maxWaitMs: Long = 2000): Long = {
      val deadline = System.nanoTime() + maxWaitMs * 1000000L
      var last = bytes.get()
      var stableSince = System.nanoTime()
      while (System.nanoTime() < deadline &&
             System.nanoTime() - stableSince < 150L * 1000000L) {
        Thread.sleep(10)
        val now = bytes.get()
        if (now != last) { last = now; stableSince = System.nanoTime() }
      }
      bytes.get() - before
    }
  }

  def register(spark: SparkSession): ShuffleTally = {
    val t = new ShuffleTally
    spark.listenerManager.register(t)
    t
  }
}
