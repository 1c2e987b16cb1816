package graft

import scala.concurrent.{Await, Future}
import scala.concurrent.duration._
import scala.concurrent.ExecutionContext.Implicits.global
import graft.io.Tables

/** One SparkSession serving concurrent callers — the multi-tenant shape
  * of a shared analytics service. Pins that (a) concurrently-built plans
  * over the registered query surface produce the same results as serial
  * execution, and (b) the per-session native-function registration is
  * race-safe (VectorExpressions.registerAll from many threads).
  */
class SessionConcurrencySpec extends SparkSpec {

  test("concurrent query execution matches serial results") {
    val names = Seq("q01_agg", "q03_join_broadcast", "t01_token_stats",
      "s01_cosine_topk", "e01_tumbling_window", "h06_forecast_revenue",
      "d01_exact_dedup", "q49_time_range_window")
    val qs = SparkEntry.queries
    val serial = names.map(n => n -> qs(n)(spark, sfTiny).count()).toMap
    val futures = names.map { n =>
      Future(n -> qs(n)(spark, sfTiny).count())
    }
    val concurrent = Await.result(Future.sequence(futures), 5.minutes).toMap
    assert(concurrent == serial,
      s"concurrent results diverged: $concurrent vs $serial")
  }

  test("maxPartitionBytes controls input split count (reference chunk-size knob)") {
    // the Spark-native replacement for the slicer's CHUNK_SIZE: smaller
    // split bytes => more scan partitions over the same file
    def partitions(bytes: String): Int = {
      val s2 = spark.newSession()
      s2.conf.set("spark.sql.files.maxPartitionBytes", bytes)
      s2.conf.set("spark.sql.files.openCostInBytes", "0")
      s2.read.parquet(s"$sfTiny/lineitem.parquet").rdd.getNumPartitions
    }
    // note: Spark floors the split size at totalBytes/defaultParallelism
    // (so even "128m" yields one split per core on a small file); the
    // fine size must undercut that floor to show the knob
    val coarse = partitions("128m")
    val fine = partitions("8k")
    assert(fine > coarse,
      s"expected more splits at 8k than 128m, got $fine vs $coarse")
  }

  test("registerAll is race-safe across threads") {
    val futures = (1 to 16).map { _ =>
      Future {
        graft.expressions.VectorExpressions.registerAll(spark)
        // the function must resolve in every thread after registration
        Tables.embeddings(spark, sfTiny)
          .selectExpr("vec_dot(CAST(embedding AS ARRAY<DOUBLE>), " +
            "CAST(embedding AS ARRAY<DOUBLE>)) AS d")
          .count()
      }
    }
    val counts = Await.result(Future.sequence(futures), 5.minutes)
    assert(counts.distinct.size == 1)
  }
}
