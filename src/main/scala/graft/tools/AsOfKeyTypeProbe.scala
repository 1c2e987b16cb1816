package graft.tools

import org.apache.spark.sql.functions._

/** Settles the round-14 key-generalization perf question with numbers:
  * the native as-of exec now compares keys through the type's
  * interpreted ordering (one virtual call + boxing per merge step)
  * instead of the old primitive `Long` compare — did e24's wall move,
  * and what do string / composite-struct keys cost relative to bigint?
  *
  * Measures the same query shape (purchases enriched with the latest
  * same-key click) at the given SF, min of 5 reps each, noop sink:
  *  - bigint key (`user_id`) — the old fast path, now through the
  *    generic ordering;
  *  - string key (`'u' || user_id`) — the trades/quotes symbol shape
  *    (adds the per-row concat on both sides to the plan, so it is an
  *    upper bound on the MERGE's own string cost);
  *  - struct key (`struct(user_id, user_id % 7)`) — the composite
  *    shape.
  *
  * The prediction from the design (AsOfJoinPlan scaladoc): sorts
  * dominate, the merge's compare is noise — expect all three within
  * normal rep spread of each other and of the committed e24 row.
  *
  * Usage: `runMain graft.tools.AsOfKeyTypeProbe [sfDir]`.
  */
object AsOfKeyTypeProbe {

  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.GraftSession.getOrCreate("asof-keytype-probe")
    val ev = graft.io.Tables.events(spark, d)

    def sides(key: org.apache.spark.sql.Column) = (
      ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), key.as("k"), col("ts")),
      ev.filter(col("event_type") === "click")
        .select(key.as("k"), col("ts"), col("value")))

    def run(name: String, key: org.apache.spark.sql.Column): Unit = {
      val (l, r) = sides(key)
      def q() = graft.operators.JoinOps.asOfJoinNative(l, r,
        "k", "k", "ts", "ts", Seq("ts", "value"))
      val n = q().count() // warms the plan, pins output equality size
      val walls = (1 to 5).map { _ =>
        val t0 = System.nanoTime()
        q().write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[keytype] $name%-8s rows=$n%7d min=${walls.min}%.3f s " +
        s"reps=${walls.map(w => f"$w%.3f").mkString(",")}")
    }

    run("bigint", col("user_id"))
    run("string", concat(lit("u"), col("user_id")))
    run("struct", struct(col("user_id"), (col("user_id") % 7).as("g")))
    spark.stop()
  }
}
