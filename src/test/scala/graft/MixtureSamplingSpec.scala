package graft

import org.apache.spark.sql.functions._
import graft.io.Tables
import graft.queries.Registry

/** Invariants of the training-mix construction gates (d09/d11) that the
  * oracle's exact replay can't state on its own: the sampled/emitted
  * sets relate correctly to the corpus and to the configured rates,
  * whatever the md5 cut happens to keep on this fixture. */
class MixtureSamplingSpec extends SparkSpec {

  private def run(name: String) =
    Registry.queries(name)(spark, sfTiny)

  test("d09 keeps a per-source subset within the feasibility cap") {
    val docs = Tables.documents(spark, sfTiny)
    val avail = docs.groupBy("source").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val out = run("d09_mixture_resample").collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (src, kept) = (r.getAs[String]("source"), r.getAs[Long]("n_kept"))
      assert(kept >= 1 && kept <= avail(src),
        s"$src kept $kept of ${avail(src)}")
    }
    // the hash cut targets half the corpus; binomial noise on ~500
    // Bernoulli draws stays well inside +-20% of the budget
    val total = out.map(_.getAs[Long]("n_kept")).sum
    val budget = avail.values.sum / 2
    assert(math.abs(total - budget) <= budget / 5,
      s"kept $total vs budget $budget")
  }

  test("d11 epoch counts are full-corpus then monotone-truncated") {
    val byKey = run("d11_epoch_upsample").collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("epoch")) ->
        r.getAs[Long]("n_docs")).toMap
    assert(byKey.nonEmpty)
    val avail = Tables.documents(spark, sfTiny)
      .groupBy("source").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    byKey.groupBy(_._1._1).foreach { case (src, entries) =>
      val epochs = entries.map { case ((_, e), n) => e -> n }.toSeq.sortBy(_._1)
      // epochs are contiguous from 1
      assert(epochs.map(_._1) == (1L to epochs.size))
      // every epoch except the last is the full source; the last is a
      // (possibly full) slice of it
      epochs.init.foreach { case (_, n) => assert(n == avail(src)) }
      assert(epochs.last._2 <= avail(src) && epochs.last._2 >= 1)
    }
  }

  test("d09 membership is the documented md5 threshold, not sampling") {
    // rerunning the query yields the identical kept multiset — the
    // determinism claim that lets two engines (or two cluster runs)
    // agree on the exact training mix
    val a = run("d09_mixture_resample").collect().toSet
    val b = run("d09_mixture_resample").collect().toSet
    assert(a == b)
  }
}
