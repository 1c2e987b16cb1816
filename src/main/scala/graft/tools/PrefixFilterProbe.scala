package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.DedupOps

/** Crossover probe for d23 (prefix-filtered exact Jaccard join) vs d02
  * (all-pairs exact join) on a HOT-GRAM corpus — the skew regime the
  * prefix filter exists for, which the parquet fixture family cannot
  * reach at test scale (SURVEY §8 round-12 caveat: at sf0.1 the
  * all-pairs quadratic hasn't hit its wall, so d02 wins there).
  *
  * Corpus: every document carries 3 UNIVERSAL tokens (df = N — the
  * Zipf head) plus 12 document-unique tokens (df = 1 — the tail);
  * N/20 planted duplicate pairs share their 12 tail tokens. Under
  * unigram shingles at t = 0.6, prefix length = 15 - ceil(0.6*15) + 1
  * = 7, so every document's candidate postings are tail-only: the
  * all-pairs join materializes N(N-1)/2 colliding pairs BY
  * CONSTRUCTION (everything shares the head tokens) while the prefix
  * join's candidates are exactly the planted duplicates. Walls and
  * candidate counts for both paths at growing N print as a table —
  * the SURVEY §8 crossover evidence.
  *
  * Usage: `runMain graft.tools.PrefixFilterProbe [maxN]` (default
  * 16000; each step quadruples N). Above 16000 the all-pairs side is
  * SKIPPED and reported as its analytic candidate count N(N-1)/2 with
  * wall "DNF": measured once — at N=64000 the 2.0e9-pair candidate
  * stream GC-thrashed a 64 GiB heap for 20+ minutes without
  * completing, while the prefix path finished in seconds. That
  * asymmetry is the crossover, not a point on a shared curve.
  */
object PrefixFilterProbe {

  private def corpus(spark: org.apache.spark.sql.SparkSession,
                     n: Long): DataFrame = {
    val planted = n / 20
    spark.range(n)
      // planted pair (i, i + n/2) for i < n/20 shares its tail seed
      .withColumn("seed",
        when(col("id") >= n / 2 && col("id") < n / 2 + planted,
          col("id") - n / 2).otherwise(col("id")))
      .select(col("id").as("doc_id"),
        concat(lit("hub0 hub1 hub2 "),
          array_join(expr(
            "transform(sequence(1, 12), j -> concat('t', seed, '_', j))"),
            " ")).as("text"))
  }

  def main(args: Array[String]): Unit = {
    val maxN = args.headOption.map(_.toLong).getOrElse(16000L)
    val spark = graft.GraftSession.getOrCreate("prefix-filter-probe")
    val t = 0.6
    println(f"${"N"}%8s ${"cand_allpairs"}%14s ${"cand_prefix"}%12s " +
      f"${"pairs"}%8s ${"wall_d02_s"}%11s ${"wall_d23_s"}%11s")
    var n = 1000L
    while (n <= maxN) {
      // cache lifecycle: probe-scoped — the JVM exits when the probe finishes
      val docs = corpus(spark, n).persist()
      docs.count()
      val runAllPairs = n <= 16000
      // all-pairs candidate volume = colliding-pair groups (what d02's
      // groupBy must shuffle); measured where feasible — every doc pair
      // shares the hub grams, so the analytic count is exact anyway
      val posts = DedupOps.shinglePostings(docs, 1)
        // cache lifecycle: probe-scoped — the JVM exits when the probe finishes
        .select("doc_id", "gram_id").persist()
      val candAll =
        if (runAllPairs)
          posts.as("a").join(posts.as("b"),
              col("a.gram_id") === col("b.gram_id") &&
                col("a.doc_id") < col("b.doc_id"))
            .select(col("a.doc_id"), col("b.doc_id")).distinct().count()
        else n * (n - 1) / 2
      val candPre =
        DedupOps.prefixFilterCandidatePairs(posts, t).count()
      def time(f: => Long): (Long, Double) = {
        val t0 = System.nanoTime()
        val r = f
        (r, (System.nanoTime() - t0) / 1e9)
      }
      val (p02, w02) =
        if (runAllPairs) time(DedupOps.ngramJaccardPairs(docs, 1, t).count())
        else (n / 20, Double.NaN)
      val (p23, w23) =
        time(DedupOps.prefixFilterJaccardPairs(docs, 1, t).count())
      require(p02 == p23 && p23 == n / 20,
        s"pair sets must agree with the planted count: $p02 $p23 ${n / 20}")
      val w02s = if (runAllPairs) f"$w02%11.2f" else f"${"DNF"}%11s"
      println(f"$n%8d $candAll%14d $candPre%12d $p23%8d $w02s $w23%11.2f")
      spark.catalog.clearCache()
      n *= 4
    }
    spark.stop()
  }
}
