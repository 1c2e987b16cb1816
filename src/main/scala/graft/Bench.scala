package graft

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Benchmark main: times every declared query at SPARK_GRAFT_SF_DIR and
  * emits ONE machine-parseable JSON line (also written to bench.json).
  *
  * Honesty rules learned from round 1:
  *  - a warmup pass at sf0.001 runs first so JIT/session startup isn't
  *    billed to whichever query happens to run first;
  *  - the action is a noop-format write, not count() — count() lets Spark
  *    prune every projection, which would time a cheaper plan than the
  *    query declares;
  *  - failures are NOT swallowed: per-query error strings are reported in
  *    the JSON and the process exits nonzero.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.getOrCreate("graft-bench")

    val queries = SparkEntry.queries.toSeq.sortBy(_._1)

    def runOnce(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame,
                dir: String): Unit =
      fn(spark, dir).write.format("noop").mode("overwrite").save()

    // warmup on the tiny SF: exercises every plan shape once
    val warmDir = "/root/testdata/sf0.001"
    queries.foreach { case (_, fn) =>
      try runOnce(fn, warmDir) catch { case _: Throwable => () }
    }

    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    val results = queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try runOnce(fn, sfDir)
      catch { case e: Throwable =>
        errors(name) = Option(e.getMessage).getOrElse(e.getClass.getName)
          .replaceAll("[\"\\\\\n\r\t]", " ").take(200)
      }
      name -> (System.nanoTime() - t0) / 1e9
    }

    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val errJson = errors.map { case (k, v) => "\"" + k + "\":\"" + v + "\"" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val perQuery = if (results.nonEmpty) total / results.size else 0.0
    // per_query_mean is the comparable number across rounds: the query
    // count grows every round, and since round 2 the timed action is a
    // full-plan noop write (round 1 used count(), which let Spark prune
    // most of each projection's work)
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errJson,"n_queries":${results.size},"per_query_mean":$perQuery,"sf":"$sfDir"}"""
    println(line)
    Files.writeString(Paths.get("bench.json"), line + "\n")
    spark.stop()
    if (errors.nonEmpty) sys.exit(1)
  }
}
