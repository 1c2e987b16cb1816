package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.operators.JoinOps

class JoinOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asOfJoinBackward picks the latest right row at or before left time") {
    val quotes = Seq( // key, time, price
      (1L, ts("2024-01-01 10:00:00"), 100.0),
      (1L, ts("2024-01-01 10:05:00"), 101.0),
      (2L, ts("2024-01-01 10:03:00"), 50.0))
      .toDF("qk", "qts", "price")
    val trades = Seq( // key, time
      (1L, ts("2024-01-01 10:04:00")), // -> 100.0 (10:00 quote)
      (1L, ts("2024-01-01 10:05:00")), // -> 101.0 (equal time is inclusive)
      (2L, ts("2024-01-01 10:02:00")), // no prior quote -> dropped
      (3L, ts("2024-01-01 10:10:00"))) // no quotes at all -> dropped
      .toDF("k", "tts")
    val r = JoinOps.asOfJoinBackward(trades, quotes,
        "k", "qk", "tts", "qts", Seq("qts", "price"))
      .orderBy("k", "tts").collect()
      .map(x => (x.getLong(0), x.getTimestamp(2).toString, x.getDouble(3)))
    assert(r.toSeq == Seq(
      (1L, "2024-01-01 10:00:00.0", 100.0),
      (1L, "2024-01-01 10:05:00.0", 101.0)))
  }

  test("saltedJoin equals the plain join") {
    val fact = (1 to 1000).map(i => (i.toLong % 3, i.toLong)).toDF("k", "v")
    val dim = Seq((0L, "zero"), (1L, "one"), (2L, "two")).toDF("k", "name")
    val salted = JoinOps.saltedJoin(fact, dim, "k", salt = 8, saltBy = col("v"))
      .select("k", "v", "name").collect().toSet
    val plain = fact.join(dim, "k").select("k", "v", "name").collect().toSet
    assert(salted == plain && salted.size == 1000)
  }

  test("saltedJoin spreads a hot key across join partitions") {
    // one key carries ~all rows: unsalted, every row hashes to ONE
    // reducer; salted by row id, the hot key must occupy >1 partition
    // of the shuffled join input
    val fact = (1 to 2000).map(i => (0L, i.toLong)).toDF("k", "v")
    val dim = Seq((0L, "zero")).toDF("k", "name")
    val spread = JoinOps.saltedJoin(fact, dim, "k", salt = 8, saltBy = col("v"))
      .groupBy(spark_partition_id().as("pid")).count()
      .filter(col("count") > 0).count()
    assert(spread > 1, s"hot key stayed on $spread partition(s)")
  }
}
