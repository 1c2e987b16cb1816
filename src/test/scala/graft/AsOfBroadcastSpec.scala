package graft

import org.apache.spark.sql.DataFrame
import graft.operators.JoinOps

/** Broadcast as-of join (JoinOps.asOfJoinBroadcast): contract parity
  * with the native exec across the full direction × shape × tolerance ×
  * null matrix, and the reason the operator exists — the fact side
  * flows to the join with ZERO exchanges (plan-pinned). */
class AsOfBroadcastSpec extends SparkSpec {
  import org.apache.spark.sql.functions._

  private def canon(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  private lazy val fixture: (DataFrame, DataFrame) = {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(42)
    val l = (1 to 2000).map { i =>
      (i.toLong, rnd.nextInt(30).toLong, rnd.nextInt(100000).toLong)
    }.toDF("id", "k", "t")
    // dim-sized right: 30 keys x ~20 rows, globally unique rt (tie-free)
    val r = (1 to 600).map { i =>
      (rnd.nextInt(30).toLong, i.toLong * 167 + 3, rnd.nextDouble())
    }.toDF("k", "rt", "v")
    (l, r)
  }

  test("equals native across direction x shape x tolerance") {
    val (l, r) = fixture
    for (fwd <- Seq(false, true); outer <- Seq(false, true);
         tol <- Seq(None, Some(20000L))) {
      val native = JoinOps.asOfJoinNative(l, r, "k", "k", "t", "rt",
        rightVals = Seq("rt", "v"), leftOuter = outer, forward = fwd,
        tolerance = tol)
      val bcast = JoinOps.asOfJoinBroadcast(l, r, "k", "k", "t", "rt",
        rightVals = Seq("rt", "v"), leftOuter = outer, forward = fwd,
        tolerance = tol)
      assert(canon(bcast) == canon(native), s"fwd=$fwd outer=$outer tol=$tol")
    }
  }

  test("SQL-null semantics and keys absent from the dim side") {
    val s = spark
    import s.implicits._
    val l = Seq(
      (1L, java.lang.Long.valueOf(0L), java.lang.Long.valueOf(100L)),
      (2L, null.asInstanceOf[java.lang.Long], java.lang.Long.valueOf(50L)),
      (3L, java.lang.Long.valueOf(0L), null.asInstanceOf[java.lang.Long]),
      (4L, java.lang.Long.valueOf(9L), java.lang.Long.valueOf(70L)))
      .toDF("id", "k", "t")
    val r = Seq(
      (java.lang.Long.valueOf(0L), java.lang.Long.valueOf(90L), 1.0),
      (null.asInstanceOf[java.lang.Long], java.lang.Long.valueOf(40L), 2.0),
      (java.lang.Long.valueOf(0L), null.asInstanceOf[java.lang.Long], 3.0))
      .toDF("k", "rt", "v")
    for (outer <- Seq(false, true)) {
      val native = JoinOps.asOfJoinNative(l, r, "k", "k", "t", "rt",
        rightVals = Seq("v"), leftOuter = outer)
      val bcast = JoinOps.asOfJoinBroadcast(l, r, "k", "k", "t", "rt",
        rightVals = Seq("v"), leftOuter = outer)
      assert(canon(bcast) == canon(native), s"outer=$outer")
    }
  }

  test("timestamp time columns with tolerance in micros") {
    val s = spark
    import s.implicits._
    val l = Seq((1L, "a", "2024-01-01 10:00:00"),
      (2L, "a", "2024-01-02 10:00:00"))
      .toDF("id", "k", "ts").withColumn("ts", to_timestamp(col("ts")))
    val r = Seq(("a", "2024-01-01 09:30:00", 1.0),
      ("a", "2024-01-02 07:00:00", 2.0))
      .toDF("k", "rts", "v").withColumn("rts", to_timestamp(col("rts")))
    for (tol <- Seq(None, Some(3600000000L))) { // 1 h in micros
      val native = JoinOps.asOfJoinNative(l, r, "k", "k", "ts", "rts",
        rightVals = Seq("rts", "v"), leftOuter = true, tolerance = tol)
      val bcast = JoinOps.asOfJoinBroadcast(l, r, "k", "k", "ts", "rts",
        rightVals = Seq("rts", "v"), leftOuter = true, tolerance = tol)
      assert(canon(bcast) == canon(native), s"tol=$tol")
    }
  }

  test("plan: zero exchanges on the fact side, broadcast on the dim side") {
    val (l, r) = fixture
    val dir = java.nio.file.Files.createTempDirectory("bcast_asof")
    l.write.mode("overwrite").parquet(s"$dir/fact")
    r.write.mode("overwrite").parquet(s"$dir/dim")
    val fact = spark.read.parquet(s"$dir/fact")
    val dim = spark.read.parquet(s"$dir/dim")
    val out = JoinOps.asOfJoinBroadcast(fact, dim, "k", "k", "t", "rt",
      rightVals = Seq("v"))
    out.collect()
    // AQE's toString prints Final AND Initial plans — count only the
    // final section or every exchange doubles
    val plan = out.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(plan.contains("BroadcastHashJoin"), plan)
    // the ONLY allowed exchanges are the dim aggregation's shuffle and
    // the broadcast itself — the fact scan feeds the join directly
    val shuffles = "Exchange hashpartitioning".r
      .findAllIn(plan).size
    assert(shuffles <= 1, s"expected at most the dim-agg shuffle:\n$plan")
    assert(!plan.contains("SortMergeJoin"), plan)
  }
}
