package graft

import org.apache.spark.sql.DataFrame
import graft.operators.JoinOps

/** Two claims about as-of joins under key skew, both pinned:
  *
  *  1. AQE's skew-join optimization does NOT split the native
  *     AsOfJoinExec's exchanges — OptimizeSkewedJoin pattern-matches the
  *     built-in SortMergeJoin/ShuffledHashJoin execs only. The spec
  *     proves the harness would see a split (positive control on a plain
  *     SMJ with the same data and thresholds), then shows the as-of plan
  *     unchanged.
  *  2. asOfJoinTimeSliced — the documented mitigation — equals
  *     asOfJoinNative row-for-row on a Zipf-skewed fixture, across
  *     inner/outer, tolerance, null keys/times, and slice widths that
  *     leave some slices empty.
  */
class AsOfSkewSpec extends SparkSpec {
  import org.apache.spark.sql.functions._

  /** Zipf-ish: key 0 owns ~80% of rows; payload pads partition bytes so
    * tiny skew thresholds trigger on the control join */
  private def skewed(n: Int, seed: Int): (DataFrame, DataFrame) = {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(seed)
    val pad = "x" * 64
    val lRows = (1 to n).map { i =>
      val k = if (rnd.nextDouble() < 0.8) 0L else 1L + rnd.nextInt(20)
      (i.toLong, k, rnd.nextInt(100000).toLong, pad)
    }
    // rt is globally unique (odd, strictly increasing): duplicate
    // (key, rt) pairs would make BOTH plans' tie-break unspecified
    // (documented contract), so equality could not be asserted
    val rRows = (1 to n).map { i =>
      val k = if (rnd.nextDouble() < 0.8) 0L else 1L + rnd.nextInt(20)
      (k, i.toLong * 66 + 1, rnd.nextDouble(), pad)
    }
    (lRows.toDF("id", "k", "t", "lpad"), rRows.toDF("k", "rt", "v", "rpad"))
  }

  private def withSkewConfs[T](body: => T): T = {
    val c = spark.conf
    val saved = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.coalescePartitions.enabled",
      "spark.sql.autoBroadcastJoinThreshold").map(k =>
      k -> c.getOption(k))
    try {
      c.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8KB")
      c.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4KB")
      c.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.2")
      c.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      c.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      body
    } finally saved.foreach { case (k, v) =>
      v.fold(c.unset(k))(c.set(k, _)) }
  }

  test("pin: AQE splits the control SMJ but NOT the as-of exec") {
    val (l, r) = skewed(4000, seed = 7)
    withSkewConfs {
      // positive control: same data, plain equi-join -> skew split fires
      val smj = l.join(r, "k")
      smj.collect() // materialize THIS queryExecution so AQE finalizes
      val smjPlan = smj.queryExecution.executedPlan.toString
      assert(smjPlan.contains("skew=true"),
        s"control SMJ did not skew-split — thresholds wrong?\n$smjPlan")
      // the native as-of exec: same data, same thresholds -> no split
      val aoj = JoinOps.asOfJoinNative(l, r, "k", "k", "t", "rt",
        rightVals = Seq("rt", "v"))
      aoj.collect()
      val aojPlan = aoj.queryExecution.executedPlan.toString
      assert(aojPlan.contains("AsOfJoin"), aojPlan)
      assert(!aojPlan.contains("skew=true"),
        "AsOfJoinExec unexpectedly skew-split — update the scaladoc " +
          s"claim and retire asOfJoinTimeSliced's rationale\n$aojPlan")
    }
  }

  private def canon(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("time-sliced == native on the skewed fixture (inner)") {
    val (l, r) = skewed(3000, seed = 11)
    val native = JoinOps.asOfJoinNative(l, r, "k", "k", "t", "rt",
      rightVals = Seq("rt", "v"))
    val sliced = JoinOps.asOfJoinTimeSliced(l, r, "k", "k", "t", "rt",
      rightVals = Seq("rt", "v"), sliceWidth = 10000L)
    assert(canon(sliced) == canon(native))
  }

  test("time-sliced == native with LEFT OUTER + tolerance + nulls") {
    val s = spark
    import s.implicits._
    val l = Seq(
      (1L, java.lang.Long.valueOf(0L), java.lang.Long.valueOf(100L)),
      (2L, java.lang.Long.valueOf(0L), java.lang.Long.valueOf(25000L)),
      (3L, null.asInstanceOf[java.lang.Long], java.lang.Long.valueOf(50L)),
      (4L, java.lang.Long.valueOf(0L), null.asInstanceOf[java.lang.Long]),
      (5L, java.lang.Long.valueOf(3L), java.lang.Long.valueOf(99999L)),
      (6L, java.lang.Long.valueOf(4L), java.lang.Long.valueOf(10L)))
      .toDF("id", "k", "t")
    val r = Seq(
      (java.lang.Long.valueOf(0L), java.lang.Long.valueOf(90L), 1.0),
      (java.lang.Long.valueOf(0L), java.lang.Long.valueOf(60L), 2.0),
      (null.asInstanceOf[java.lang.Long], java.lang.Long.valueOf(40L), 3.0),
      (java.lang.Long.valueOf(3L), null.asInstanceOf[java.lang.Long], 4.0),
      (java.lang.Long.valueOf(3L), java.lang.Long.valueOf(70000L), 5.0))
      .toDF("k", "rt", "v")
    for (outer <- Seq(false, true); tol <- Seq(None, Some(5000L));
         fwd <- Seq(false, true)) {
      val native = JoinOps.asOfJoinNative(l, r, "k", "k", "t", "rt",
        rightVals = Seq("rt", "v"), leftOuter = outer, forward = fwd,
        tolerance = tol)
      val sliced = JoinOps.asOfJoinTimeSliced(l, r, "k", "k", "t", "rt",
        rightVals = Seq("rt", "v"), sliceWidth = 1000L,
        leftOuter = outer, forward = fwd, tolerance = tol)
      assert(canon(sliced) == canon(native),
        s"outer=$outer tol=$tol fwd=$fwd")
    }
  }

  test("time-sliced forward == native forward on the skewed fixture") {
    val (l, r) = skewed(2000, seed = 19)
    val native = JoinOps.asOfJoinNative(l, r, "k", "k", "t", "rt",
      rightVals = Seq("rt", "v"), forward = true)
    val sliced = JoinOps.asOfJoinTimeSliced(l, r, "k", "k", "t", "rt",
      rightVals = Seq("rt", "v"), sliceWidth = 7000L, forward = true)
    assert(canon(sliced) == canon(native))
  }

  test("time-sliced == native on timestamp time columns") {
    val s = spark
    import s.implicits._
    val l = Seq((1L, "a", "2024-01-01 10:00:00"),
      (2L, "a", "2024-01-03 10:00:00"), (3L, "b", "2024-01-02 00:00:00"))
      .toDF("id", "k", "ts").withColumn("ts", to_timestamp(col("ts")))
    val r = Seq(("a", "2024-01-01 09:00:00", 1.0),
      ("a", "2024-01-02 09:00:00", 2.0), ("b", "2024-01-01 23:00:00", 3.0))
      .toDF("k", "rts", "v").withColumn("rts", to_timestamp(col("rts")))
    val native = JoinOps.asOfJoinNative(l, r, "k", "k", "ts", "rts",
      rightVals = Seq("rts", "v"))
    val sliced = JoinOps.asOfJoinTimeSliced(l, r, "k", "k", "ts", "rts",
      rightVals = Seq("rts", "v"), sliceWidth = 86400000000L) // 1 day
    assert(canon(sliced) == canon(native))
  }

  // ---- round-16: automatic skew routing --------------------------------

  private def asOfNodes(df: DataFrame): Seq[graft.plans.AsOfJoin] =
    df.queryExecution.optimizedPlan.collect {
      case a: graft.plans.AsOfJoin => a }

  test("auto routing picks the sliced plan for hot keys and equals native") {
    val (l, r) = skewed(3000, seed = 23)
    for (outer <- Seq(false, true); fwd <- Seq(false, true)) {
      val native = JoinOps.asOfJoinNative(l, r, "k", "k", "t", "rt",
        rightVals = Seq("rt", "v"), leftOuter = outer, forward = fwd)
      val auto = JoinOps.asOfJoinAuto(l, r, "k", "k", "t", "rt",
        rightVals = Seq("rt", "v"), leftOuter = outer, forward = fwd)
      // key 0 owns ~80% of 3000 rows >> total/parallelism, so the plan
      // must carry TWO as-of joins: the sliced one (struct (k, slice)
      // composite key) for the hot split plus the native cold path
      val nodes = asOfNodes(auto)
      assert(nodes.size == 2, s"outer=$outer fwd=$fwd:\n$nodes")
      assert(nodes.count(_.leftKey.dataType
        .isInstanceOf[org.apache.spark.sql.types.StructType]) == 1)
      assert(canon(auto) == canon(native), s"outer=$outer fwd=$fwd")
    }
  }

  test("auto routing with NO hot keys degenerates to the single native plan") {
    val s = spark
    import s.implicits._
    // uniform: every key appears twice — nothing crosses total/par
    val l = (1 to 200).map(i => (i.toLong, i.toLong % 100, i * 10L))
      .toDF("id", "k", "t")
    val r = (1 to 200).map(i => (i.toLong % 100, i * 7L + 1, i * 1.0))
      .toDF("k", "rt", "v")
    val auto = JoinOps.asOfJoinAuto(l, r, "k", "k", "t", "rt",
      rightVals = Seq("rt", "v"))
    assert(asOfNodes(auto).size == 1)
    assert(canon(auto) == canon(JoinOps.asOfJoinNative(l, r, "k", "k",
      "t", "rt", rightVals = Seq("rt", "v"))))
  }

  test("auto routing honors targetRowsPerTask and strict composes") {
    val (l, r) = skewed(1500, seed = 29)
    // absurdly high target -> no hot keys even on the Zipf fixture
    val cold = JoinOps.asOfJoinAuto(l, r, "k", "k", "t", "rt",
      rightVals = Seq("v"), targetRowsPerTask = 10000000L)
    assert(asOfNodes(cold).size == 1)
    // tiny target -> hot routing; strict threads through both branches
    val auto = JoinOps.asOfJoinAuto(l, r, "k", "k", "t", "rt",
      rightVals = Seq("v"), strict = true, targetRowsPerTask = 50L)
    assert(asOfNodes(auto).size == 2)
    assert(canon(auto) == canon(JoinOps.asOfJoinNative(l, r, "k", "k",
      "t", "rt", rightVals = Seq("v"), strict = true)))
  }

  test("the auto histogram is scanned ONCE: the unpruned broadcast " +
      "total reuses the histogram's exchange") {
    // pins asOfJoinAuto's one-scan claim, exactly as the operator
    // composes it: the total aggregate references __mn/__mx too, so
    // column pruning cannot narrow its subtree — the two exchanges
    // stay equal and ReuseExchange fires. Drop the __gmn/__gmx
    // references and this test fails with two independent scans
    // (measured round 16), which is the silent 2x-input-cost shape at
    // 100 TB.
    import org.apache.spark.sql.functions.{broadcast, coalesce, count,
      expr, greatest, lit, max, min, sum}
    val (l, _) = skewed(2000, seed = 31)
    val hist = l.filter(col("k").isNotNull)
      .groupBy(col("k").as("__k"))
      .agg(count(lit(1)).as("__n"),
        min(col("t")).as("__mn"), max(col("t")).as("__mx"))
    val totalDf = hist.agg(
      coalesce(sum(col("__n")), lit(0L)).as("__total"),
      min(col("__mn")).as("__gmn"), max(col("__mx")).as("__gmx"))
    // select EXACTLY what the operator selects: both sides must need
    // (count, min, max) for the subtrees to stay prune-identical
    val sel = hist.crossJoin(broadcast(totalDf))
      .filter(col("__n") > greatest(expr("__total div 32"), lit(1L)))
      .select(col("__k"), col("__n"), col("__mn"), col("__mx"),
        greatest(expr("__total div 32"), lit(1L)).as("__target"),
        col("__gmn"), col("__gmx"))
    sel.collect()
    val p = sel.queryExecution.executedPlan.toString
    assert(p.toLowerCase.contains("reused"),
      s"no exchange reuse — the planner scanned the input twice:\n$p")
  }

  test("auto routing survives a hot key whose times are all NULL") {
    val s = spark
    import s.implicits._
    // key 0 has the most rows but every time is NULL: it can never
    // match, so it must not enter the hot-key arithmetic (an unfiltered
    // histogram would surface null mn/mx into the driver's getLong) —
    // it routes cold and, under outer, pads
    val l = ((1 to 80).map(i =>
        (i.toLong, java.lang.Long.valueOf(0L),
          null.asInstanceOf[java.lang.Long])) ++
      (1 to 60).map(i =>
        (100L + i, java.lang.Long.valueOf(1L),
          java.lang.Long.valueOf(i * 10L))))
      .toDF("id", "k", "t")
    val r = (1 to 30).map(i => (1L, i * 17L + 1, i * 1.0))
      .toDF("k", "rt", "v")
    for (outer <- Seq(false, true)) {
      val native = JoinOps.asOfJoinNative(l, r, "k", "k", "t", "rt",
        rightVals = Seq("v"), leftOuter = outer)
      val auto = JoinOps.asOfJoinAuto(l, r, "k", "k", "t", "rt",
        rightVals = Seq("v"), leftOuter = outer, targetRowsPerTask = 20L)
      // key 1 (60 rows, real times) is the only hot key -> 2 nodes
      assert(asOfNodes(auto).size == 2, s"outer=$outer")
      assert(canon(auto) == canon(native), s"outer=$outer")
    }
  }

  // ---- round-17: sketch-fed detection, caps, SQL reachability ----------

  test("sketch and exact histogram find the SAME hot set and width") {
    val (l, _) = skewed(3000, seed = 37)
    val exact = JoinOps.asOfSkewPlan(l, "k", "t",
      targetRowsPerTask = 50L, exactHistogram = true)
    val sketch = JoinOps.asOfSkewPlan(l, "k", "t", targetRowsPerTask = 50L)
    assert(exact.isDefined && sketch.isDefined, s"$exact / $sketch")
    assert(exact.get._1.toSet == sketch.get._1.toSet,
      s"hot sets diverge: exact=${exact.get._1} sketch=${sketch.get._1}")
    assert(exact.get._2 == sketch.get._2,
      s"widths diverge: exact=${exact.get._2} sketch=${sketch.get._2}")
  }

  test("explicit target finer than the sketch can certify falls back " +
      "to the exact histogram") {
    val (l, _) = skewed(3000, seed = 41)
    // capacity floors at parallelism (4 here): err = 3000/4 >> 8, so
    // the sketch cannot prove every key above 8 rows is present —
    // the plan must come from the exact twin
    val fb = JoinOps.asOfSkewPlan(l, "k", "t",
      targetRowsPerTask = 8L, sketchCapacity = 2)
    val exact = JoinOps.asOfSkewPlan(l, "k", "t",
      targetRowsPerTask = 8L, exactHistogram = true)
    assert(fb.isDefined && exact.isDefined)
    assert(fb.get._1.toSet == exact.get._1.toSet)
    assert(fb.get._2 == exact.get._2)
  }

  test("hot set is capped at top-K by count; routing stays correct") {
    val s = spark
    import s.implicits._
    // 400 keys x ~5 rows each, target=1: EVERY key crosses the bar —
    // the round-16 shape where the driver list and the isin literal
    // grew key-cardinality-sized (advice r16); the cap bounds both,
    // and the un-capped remainder routes cold, which must not change
    // results
    val l = (1 to 2000).map(i =>
      (i.toLong, (i % 400).toLong, (i * 13 % 10000).toLong))
      .toDF("id", "k", "t")
    val r = (1 to 1200).map(i =>
      ((i % 400).toLong, i * 17L + 1, i * 1.0)).toDF("k", "rt", "v")
    val maxHot = math.max(
      4 * spark.sparkContext.defaultParallelism, 64)
    for (exact <- Seq(false, true)) {
      val plan = JoinOps.asOfSkewPlan(l, "k", "t",
        targetRowsPerTask = 1L, exactHistogram = exact)
      assert(plan.isDefined, s"exact=$exact")
      assert(plan.get._1.size <= maxHot,
        s"exact=$exact: hot set ${plan.get._1.size} > cap $maxHot")
    }
    val native = JoinOps.asOfJoinNative(l, r, "k", "k", "t", "rt",
      rightVals = Seq("rt", "v"))
    val auto = JoinOps.asOfJoinAuto(l, r, "k", "k", "t", "rt",
      rightVals = Seq("rt", "v"), targetRowsPerTask = 1L)
    assert(canon(auto) == canon(native))
  }

  test("auto == native across strict x tolerance x outer x forward " +
      "with hot routing live") {
    val (l, r) = skewed(1500, seed = 43)
    for (outer <- Seq(false, true); fwd <- Seq(false, true);
         strict <- Seq(false, true); tol <- Seq(None, Some(5000L))) {
      val native = JoinOps.asOfJoinNative(l, r, "k", "k", "t", "rt",
        rightVals = Seq("rt", "v"), leftOuter = outer, forward = fwd,
        tolerance = tol, strict = strict)
      val auto = JoinOps.asOfJoinAuto(l, r, "k", "k", "t", "rt",
        rightVals = Seq("rt", "v"), leftOuter = outer, forward = fwd,
        tolerance = tol, strict = strict, targetRowsPerTask = 50L)
      assert(asOfNodes(auto).size == 2,
        s"outer=$outer fwd=$fwd strict=$strict tol=$tol: routing dead")
      assert(canon(auto) == canon(native),
        s"outer=$outer fwd=$fwd strict=$strict tol=$tol")
    }
  }

  test("asof_join_auto TVF: the hot key gets the sliced plan through " +
      "pure SQL, results equal the plain TVF") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(47)
    // same shape as the e43 gate's fixture: 40 users, 3/4 of them
    // collapse onto k=0 inside the TVF's inline CASE
    val ev = (1 to 2000).map { i =>
      (i.toLong, 1L + rnd.nextInt(40),
        new java.sql.Timestamp(1700000000000L + i * 1000L),
        if (i % 3 == 0) "purchase" else "click", rnd.nextDouble())
    }.toDF("event_id", "user_id", "ts", "event_type", "value")
    ev.createOrReplaceTempView("events")
    try {
      val auto = spark.sql(graft.queries.Events.asofAutoTvfSql)
      val nodes = asOfNodes(auto)
      assert(nodes.size == 2, s"SQL auto routing did not split:\n$nodes")
      assert(nodes.count(_.leftKey.dataType
        .isInstanceOf[org.apache.spark.sql.types.StructType]) == 1,
        s"no sliced (struct-keyed) node:\n$nodes")
      val plain = spark.sql(graft.queries.Events.asofAutoTvfSql
        .replace("asof_join_auto", "asof_join"))
      assert(canon(auto) == canon(plain))
    } finally spark.catalog.dropTempView("events")
  }

  test("asof_join_auto TVF optional integers: [tolerance[, target]], " +
      "and Long.MaxValue tolerance means unbounded") {
    val s = spark
    import s.implicits._
    val ev = (1 to 600).map { i =>
      (i.toLong, (i % 5).toLong + 1L,
        new java.sql.Timestamp(1700000000000L + i * 60000L),
        if (i % 3 == 0) "purchase" else "click", i * 1.0)
    }.toDF("event_id", "user_id", "ts", "event_type", "value")
    ev.createOrReplaceTempView("events")
    try {
      def run(fn: String, extra: String) = canon(spark.sql(s"""
        SELECT * FROM $fn(
          'SELECT event_id, user_id, ts FROM events
           WHERE event_type = ''purchase''',
          'SELECT user_id, ts, value FROM events
           WHERE event_type = ''click''',
          'user_id', 'user_id', 'ts', 'ts'$extra, 'ts', 'value')"""))
      // tolerance literal behaves exactly like the plain TVF's
      assert(run("asof_join_auto", ", 600000000") ==
        run("asof_join", ", 600000000"))
      // second integer = targetRowsPerTask: a tiny target must not
      // change results (routing invariance), only the plan
      assert(run("asof_join_auto", ", 600000000, 8") ==
        run("asof_join", ", 600000000"))
      // Long.MaxValue tolerance normalizes to unbounded — lets a SQL
      // caller set a target with no real tolerance bound
      assert(run("asof_join_auto", ", 9223372036854775807, 8") ==
        run("asof_join", ""))
      // the NAMED form supersedes the sentinel: 'target=N' sets the
      // target with no tolerance at all
      assert(run("asof_join_auto", ", 'target=8'") == run("asof_join", ""))
      // ... and composes after a real tolerance
      assert(run("asof_join_auto", ", 600000000, 'target=8'") ==
        run("asof_join", ", 600000000"))
      // 'target=N' on a NON-auto family is a loud error, not a payload
      // column lookup failure
      val e = intercept[Exception] { run("asof_join", ", 'target=8'") }
      def msgs(t: Throwable): String =
        if (t == null) "" else t.getMessage + "\n" + msgs(t.getCause)
      assert(msgs(e).contains("asof_join_auto family"), msgs(e))
      // the MaxValue normalization applies to EVERY family (advice r17):
      // the exec's None is defined as MaxValue internally, so the
      // non-auto TVF with a MaxValue tolerance must equal the unbounded
      // form plan-for-plan and row-for-row
      assert(run("asof_join", ", 9223372036854775807") ==
        run("asof_join", ""))
      // case-insensitive column arguments, exactly like the non-auto
      // siblings (the router resolves names with the session resolver
      // before the Scala API's case-sensitive schema lookups)
      val upper = canon(spark.sql("""
        SELECT * FROM asof_join_auto(
          'SELECT event_id, user_id, ts FROM events
           WHERE event_type = ''purchase''',
          'SELECT user_id, ts, value FROM events
           WHERE event_type = ''click''',
          'USER_ID', 'User_Id', 'TS', 'Ts', 'TS', 'VALUE')"""))
      // payload aliases follow the TYPED spelling, like asof_join's
      assert(upper.nonEmpty)
      assert(run("asof_join", "") == upper)
    } finally spark.catalog.dropTempView("events")
  }

  test("the full auto TVF matrix (8 names) equals each non-auto " +
      "sibling with routing live") {
    // round-18: _forward, _forward_left, _strict_left, _strict_forward,
    // _strict_forward_left joined the r17 trio — every direction/shape
    // combination the Scala router supports is now SQL-reachable. Each
    // auto name must (a) actually route on the Zipf fixture (the
    // struct-keyed sliced node appears) and (b) equal its non-auto
    // sibling row-for-row.
    val (l, r) = skewed(1200, seed = 53)
    l.createOrReplaceTempView("skm_l")
    r.createOrReplaceTempView("skm_r")
    try {
      for (sfx <- Seq("", "_left", "_forward", "_forward_left", "_strict",
          "_strict_left", "_strict_forward", "_strict_forward_left")) {
        def sql(fn: String, opt: String) = spark.sql(s"""
          SELECT * FROM $fn('skm_l', 'skm_r',
            'k', 'k', 't', 'rt'$opt, 'rt', 'v')""")
        val auto = sql(s"asof_join_auto$sfx", ", 'target=50'")
        val nodes = asOfNodes(auto)
        assert(nodes.size == 2, s"$sfx: routing dead\n$nodes")
        assert(nodes.count(_.leftKey.dataType
          .isInstanceOf[org.apache.spark.sql.types.StructType]) == 1, sfx)
        assert(canon(auto) == canon(sql(s"asof_join$sfx", "")), sfx)
      }
    } finally {
      spark.catalog.dropTempView("skm_l")
      spark.catalog.dropTempView("skm_r")
    }
  }

  test("degenerate widths: one giant slice and one-row slices") {
    val (l, r) = skewed(500, seed = 3)
    val native = canon(JoinOps.asOfJoinNative(l, r, "k", "k", "t", "rt",
      rightVals = Seq("v")))
    for (w <- Seq(1L, 1000000000L)) {
      val sliced = JoinOps.asOfJoinTimeSliced(l, r, "k", "k", "t", "rt",
        rightVals = Seq("v"), sliceWidth = w)
      assert(canon(sliced) == native, s"width=$w")
    }
  }
}
