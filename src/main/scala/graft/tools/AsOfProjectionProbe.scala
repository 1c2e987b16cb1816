package graft.tools

import org.apache.spark.sql.functions._

/** Settles the AsOfJoinExec codegen question with a number (round-12
  * verdict item: "measure whether a doProduce fusing the output
  * projection moves e24 at all — the scaladoc predicts no").
  *
  * What whole-stage codegen would fuse away in this exec is the
  * interpreted output path: `UnsafeProjection(JoinedRow(l, matched))`
  * per OUTPUT row (the merge loop's comparisons and the lookahead
  * `copy()` survive any codegen — they are the operator's state
  * machine, not expression evaluation). So the upper bound of a
  * doProduce win is (output rows x per-projection cost), which this
  * probe measures directly:
  *
  *  1. e24's end-to-end wall at the given SF (min of 5 reps, noop
  *     sink) and its output row count;
  *  2. the exact projection path (same 5-column schema, same
  *     JoinedRow shape, codegen'd UnsafeProjection exactly as the
  *     exec creates it) micro-timed over 20M iterations.
  *
  * Usage: `runMain graft.tools.AsOfProjectionProbe [sfDir]`.
  */
object AsOfProjectionProbe {

  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.GraftSession.getOrCreate("asof-proj-probe")
    val ev = graft.io.Tables.events(spark, d)
    def purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    def clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("value"))
    def e24() = graft.operators.JoinOps.asOfJoinNative(purchases, clicks,
      "user_id", "user_id", "ts", "ts", Seq("ts", "value"))
    val nOut = e24().count()
    val walls = (1 to 5).map { _ =>
      val t0 = System.nanoTime()
      e24().write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    val wall = walls.min

    // the exec's exact output path, isolated: bigint,bigint,timestamp
    // left ++ timestamp,double right through a codegen'd projection
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.{AttributeReference, JoinedRow, UnsafeProjection}
    import org.apache.spark.sql.types.{DoubleType, LongType, TimestampType}
    val lOut = Seq(AttributeReference("event_id", LongType)(),
      AttributeReference("user_id", LongType)(),
      AttributeReference("ts", TimestampType)())
    val rOut = Seq(AttributeReference("rts", TimestampType)(),
      AttributeReference("value", DoubleType)())
    val joiner = UnsafeProjection.create(lOut ++ rOut, lOut ++ rOut)
    val joined = new JoinedRow
    val l: InternalRow = InternalRow(1L, 2L, 3000000L)
    val r: InternalRow = InternalRow(4000000L, 5.0)
    var i = 0L
    var sink = 0L
    val reps = 20000000L
    // warm the JIT before the measured loop
    while (i < 1000000L) { sink += joiner(joined(l, r)).getLong(0); i += 1 }
    i = 0L
    val t0 = System.nanoTime()
    while (i < reps) { sink += joiner(joined(l, r)).getLong(0); i += 1 }
    val nsPerRow = (System.nanoTime() - t0).toDouble / reps
    val bound = nOut * nsPerRow / 1e9
    println(f"e24 wall (min of 5): $wall%.3f s over $nOut output rows " +
      f"(all reps: ${walls.map(w => f"$w%.3f").mkString(", ")})")
    println(f"projection path: $nsPerRow%.1f ns/row " +
      f"-> fusion upper bound ${bound * 1000}%.3f ms " +
      f"= ${bound / wall * 100}%.3f%% of the wall (sink=$sink)")
    spark.stop()
  }
}
