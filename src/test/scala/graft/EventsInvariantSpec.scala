package graft

import org.apache.spark.sql.functions._
import graft.io.Tables
import graft.queries.Registry

/** Cross-query invariants of the events analytics gates — properties the
  * per-query oracle replay can't state because they RELATE queries to
  * each other or to the raw table. */
class EventsInvariantSpec extends SparkSpec {

  private def run(name: String) =
    Registry.queries(name)(spark, sfTiny)

  test("e22 linear attribution conserves every credited cent") {
    val credited = run("e22_linear_attribution")
      .agg(sum(col("credited_cents"))).collect()(0).getLong(0)
    // ground truth: total cents of purchases having >= 1 touch in-window
    val ev = Tables.events(spark, sfTiny)
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("pid"), col("user_id"),
        unix_timestamp(col("ts")).as("p_tse"),
        (col("value").cast("decimal(18,2)") * 100).cast("long").as("cents"))
    val t = ev.filter(col("event_type").isin("click", "view"))
      .select(col("user_id"), unix_timestamp(col("ts")).as("t_tse"))
    val touched = p.join(t, Seq("user_id"))
      .filter(col("t_tse").between(col("p_tse") - 86400, col("p_tse") - 1))
      .select(col("pid"), col("cents")).distinct()
    val want = touched.agg(sum(col("cents"))).collect()(0).getLong(0)
    assert(credited == want,
      s"credited $credited cents vs $want purchase cents — allocation leaks")
  }

  test("e16 last-touch purchase counts cover every purchase exactly once") {
    val n = run("e16_attribution")
      .agg(sum(col("n_purchases"))).collect()(0).getLong(0)
    val total = Tables.events(spark, sfTiny)
      .filter(col("event_type") === "purchase").count()
    assert(n == total, s"attributed $n of $total purchases")
  }

  test("e21 DAU never exceeds WAU and stickiness stays in (0, 1e9]") {
    run("e21_dau_wau").collect().foreach { r =>
      val (dau, wau, st) = (r.getAs[Long]("dau"), r.getAs[Long]("wau"),
        r.getAs[Long]("stickiness_e9"))
      assert(dau >= 1 && dau <= wau, s"dau $dau wau $wau")
      assert(st >= 1 && st <= 1000000000L, s"stickiness $st")
    }
  }
}
