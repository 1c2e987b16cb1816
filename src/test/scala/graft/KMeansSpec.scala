package graft

import org.apache.spark.sql.functions._
import graft.queries.Clustering

/** Lloyd's algorithm invariant: each pass (refresh centroids to the
  * exact mean of their members, then reassign to the nearest centroid)
  * can only lower the within-cluster sum of squared distances. c03's
  * gate hash-checks the VALUES of the final pass; this pins the
  * convergence PROPERTY the fixed-iteration loop exists for. */
class KMeansSpec extends SparkSpec {

  test("within-cluster SSE is monotone non-increasing across Lloyd passes") {
    val emb = Clustering.corpus(spark, sfTiny)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val sses = Clustering.lloydPasses(emb, k = 8, iters = 3)
        .map(_.agg(sum(col("d2")).as("sse")).head().getDouble(0))
      assert(sses.length == 3)
      sses.sliding(2).foreach { case Seq(prev, next) =>
        assert(next <= prev + 1e-9,
          s"SSE increased across a Lloyd pass: $sses")
      }
      assert(sses.last < sses.head,
        s"three passes should actually improve the seed assignment: $sses")
    } finally emb.unpersist()
  }

  test("assignment output is one row per vector with its argmin cell") {
    val emb = Clustering.corpus(spark, sfTiny)
    val a = Clustering.lloydPasses(emb, k = 8, iters = 1).last
    assert(a.count() == emb.count())
    assert(a.select("cell").distinct().count() <= 8)
    // d2 is a true squared distance: non-negative everywhere
    assert(a.filter(col("d2") < 0).count() == 0)
  }
}
