package graft

import org.apache.spark.sql.functions._
import graft.operators.JoinOps

/** rangeJoinBinned vs the naive inequality join on seeded random
  * timestamps, salted with exact bin-edge and window-edge collisions —
  * the off-by-one-bin class of bug this operator invites. Also pins
  * exactly-once emission (the right side holds one bin per row, so a
  * pair can match on at most one bin value). */
class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  test("rangeJoinBinned equals the inequality join, exactly once") {
    val rng = new scala.util.Random(7)
    val win = 60L
    val base = 1700000000000000L
    def us(offSec: Long) = base + offSec * 1000000L
    // random offsets in [0, 600s) plus deliberate edges: exactly on a
    // bin boundary, exactly window-width apart, and equal times
    val lefts = (1 to 80).map(i => (i.toLong, us(rng.nextInt(600)))) ++
      Seq((900L, us(120)), (901L, us(60)), (902L, us(0)))
    val rights = (1 to 80).map(i => (1000L + i, us(rng.nextInt(600)))) ++
      Seq((990L, us(60)), (991L, us(0)), (992L, us(120)))
    val l = lefts.toDF("l_id", "lt_us")
      .select(col("l_id"), expr("timestamp_micros(lt_us)").as("lt"))
    val r = rights.toDF("r_id", "rt_us")
      .select(col("r_id"), expr("timestamp_micros(rt_us)").as("rt"))

    val gotRows = JoinOps.rangeJoinBinned(l, r, "lt", "rt", win)
      .select("l_id", "r_id").collect()
      .map(x => (x.getLong(0), x.getLong(1))).toSeq
    val want = l.join(r,
        col("rt") >= col("lt") - expr(s"INTERVAL $win SECONDS") &&
          col("rt") <= col("lt"))
      .select("l_id", "r_id").collect()
      .map(x => (x.getLong(0), x.getLong(1))).toSet

    assert(gotRows.toSet == want,
      s"missing=${(want diff gotRows.toSet).take(5)} " +
        s"extra=${(gotRows.toSet diff want).take(5)}")
    assert(gotRows.length == gotRows.toSet.size, "duplicate pairs emitted")
  }
}
