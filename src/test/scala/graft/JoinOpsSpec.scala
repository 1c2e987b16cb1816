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

  test("saltedJoin spreads a hot key across shuffle join partitions") {
    // broadcast would sidestep the shuffle entirely and AQE coalesces
    // the tiny post-shuffle partitions back to one (default-on in Spark
    // 4) — disable both so the spread measurement sees the raw
    // hash-partitioned join, which is the skew regime salting exists for
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val fact = (1 to 2000).map(i => (0L, i.toLong)).toDF("k", "v")
      val dim = Seq((0L, "zero")).toDF("k", "name")
      def spreadOf(df: org.apache.spark.sql.DataFrame): Long =
        df.groupBy(spark_partition_id().as("pid")).count()
          .filter(col("count") > 0).count()
      // control: the unsalted shuffle join pins the hot key to 1 reducer
      assert(spreadOf(fact.join(dim, "k")) == 1)
      val spread = spreadOf(
        JoinOps.saltedJoin(fact, dim, "k", salt = 8, saltBy = col("v")))
      assert(spread > 1, s"hot key stayed on $spread partition(s)")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
    }
  }
}
