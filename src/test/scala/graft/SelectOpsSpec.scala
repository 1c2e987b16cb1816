package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.SelectOps

class SelectOpsSpec extends SparkSpec {
  import spark.implicits._

  /** ground truth: the banned-at-scale global-sort cumsum, fine at
    * test scale — the maximal (q9 DESC, doc_id ASC) prefix whose
    * running n_tok stays within budget */
  private def fullSortSelect(scored: DataFrame, budget: Long): Set[Long] = {
    val w = Window.orderBy(col("q9").desc, col("doc_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    scored.withColumn("cum", sum(col("n_tok")).over(w))
      .filter(col("cum") <= budget)
      .select("doc_id").collect().map(_.getLong(0)).toSet
  }

  private def ids(df: DataFrame): Set[Long] =
    df.select("doc_id").collect().map(_.getLong(0)).toSet

  test("budget select equals the full-sort cumsum across budget points") {
    // mixed-quality corpus with colliding q9 values so both the bucket
    // walk and the within-bucket tiebreak carry weight
    val scored = (0L until 600L).map { i =>
      (i, 5L + i * 13 % 40, (i * 7919 % 97) * 10000000L)
    }.toDF("doc_id", "n_tok", "q9")
    val total = scored.agg(sum("n_tok")).collect()(0).getLong(0)
    for (budget <- Seq(0L, 1L, total / 5, total * 2 / 5, total - 1, total,
        total + 100)) {
      val got = ids(SelectOps.tokenBudgetSelect(scored, budget))
      val want = fullSortSelect(scored, budget)
      assert(got == want, s"budget=$budget: extra=${got -- want} " +
        s"missing=${want -- got}")
    }
  }

  test("constant-quality corpus: window input bounded by doc_id split") {
    // every document has the SAME q9 — the adversarial input for any
    // quality histogram: the level-0 boundary bucket IS the corpus.
    // The recursion must hand off to doc_id-range splitting and bound
    // the terminal window's input anyway.
    val n = 2000L
    val scored = (0L until n).map(i => (i, 10L, 500000000L))
      .toDF("doc_id", "n_tok", "q9")
    val budget = 10L * n * 2 / 5 + 5 // mid-corpus boundary, mid-bucket cut
    val (out, levels) = SelectOps.tokenBudgetSelectTrace(scored, budget,
      maxBoundaryRows = 50L)
    assert(ids(out) == fullSortSelect(scored, budget))
    val terminal = levels.last
    assert(terminal.windowed, s"must end in a windowed level: $levels")
    assert(terminal.boundaryRows <= 50L,
      s"terminal window input must be bounded: $levels")
    assert(levels.exists(_.phase == "doc"),
      s"constant q9 must trigger the doc_id phase: $levels")
    // every level's histogram stayed driver-sized
    assert(levels.forall(_.nBuckets <= 256), s"histogram blew up: $levels")
  }

  test("near-constant quality: q9 phase refines before doc phase") {
    // two q9 values 1 apart inside the same 4e6-wide level-0 bucket:
    // the q9 phase must keep splitting (quantum/64) until the values
    // separate, then the boundary value's rows go through doc split
    val scored = (0L until 1200L).map { i =>
      (i, 7L, 500000000L + (if (i % 2 == 0) 0L else 1L))
    }.toDF("doc_id", "n_tok", "q9")
    val budget = 7L * 1200L / 2 + 10 // spends all of q9+1, cuts into q9
    val (out, levels) = SelectOps.tokenBudgetSelectTrace(scored, budget,
      maxBoundaryRows = 40L)
    assert(ids(out) == fullSortSelect(scored, budget))
    assert(levels.last.windowed && levels.last.boundaryRows <= 40L,
      s"bounded terminal window: $levels")
    assert(levels.count(_.phase == "q9") >= 2,
      s"q9 refinement levels expected: $levels")
  }

  test("degenerate budgets: zero selects nothing, full selects all") {
    val scored = (0L until 300L).map(i => (i, 3L, (i % 5) * 100000000L))
      .toDF("doc_id", "n_tok", "q9")
    assert(ids(SelectOps.tokenBudgetSelect(scored, 0L)).isEmpty)
    assert(ids(SelectOps.tokenBudgetSelect(scored, 900L)).size == 300)
    // everything-fits trace carries no windowed level
    val (_, levels) =
      SelectOps.tokenBudgetSelectTrace(scored, Long.MaxValue / 2)
    assert(levels.size == 1 && !levels.head.windowed &&
      levels.head.boundaryRows == 0L)
  }

  test("esSampleKeyQ: deterministic, weight-monotone, ES-order-correct") {
    // u deterministic from doc_id -> identical keys across runs
    val docs = (0L until 2000L).map { i =>
      (i, if (i < 1000) "big" else "small")
    }.toDF("doc_id", "source")
    val u = expr("(CAST(conv(substring(md5(CAST(CAST(doc_id AS STRING)" +
      " AS BINARY)), 1, 15), 16, 10) AS BIGINT) % 999999999 + 1)" +
      " / 1000000000D")
    def sample(invBig: Double, invSmall: Double, k: Int): Seq[String] = {
      val inv = when(col("source") === "big", lit(invBig))
        .otherwise(lit(invSmall))
      docs.withColumn("q", SelectOps.esSampleKeyQ(u, inv))
        .orderBy(col("q").asc, col("doc_id").asc).limit(k)
        .collect().map(_.getString(1)).toSeq
    }
    // equal inverse-weights: repeatable, and both sources present
    val a = sample(1.0, 1.0, 200)
    assert(a == sample(1.0, 1.0, 200), "must be deterministic")
    assert(a.contains("big") && a.contains("small"))
    // 100x the inverse weight (= 1/100 the weight) pushes "big" out:
    // every small doc's key beats almost every big doc's
    val skewed = sample(100.0, 1.0, 200)
    assert(skewed.count(_ == "small") >= 190,
      s"downweighted source must nearly vanish: " +
        s"${skewed.count(_ == "small")} small of 200")
    // ES semantics sanity: with w = 1/invW, expected share of "small"
    // under invBig=sqrt(1000), invSmall=sqrt(1000) equals the uniform
    // case — same inv on both sides IS uniform
    val unif = sample(31.6, 31.6, 200)
    assert(unif.toSet.subsetOf(Set("big", "small")))
  }

  test("maxDepth cap still returns the exact prefix") {
    val scored = (0L until 800L).map(i => (i, 4L, 500000000L))
      .toDF("doc_id", "n_tok", "q9")
    val budget = 4L * 800L / 3
    // depth 2: level 0 (q9, whole corpus is boundary), level 1 terminal
    // — boundaryRows exceeds the bound but correctness must hold
    val (out, levels) = SelectOps.tokenBudgetSelectTrace(scored, budget,
      maxBoundaryRows = 10L, maxDepth = 2)
    assert(ids(out) == fullSortSelect(scored, budget))
    assert(levels.last.windowed && levels.size <= 2, s"$levels")
  }
}
