package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.EventStreams
import graft.streaming.EventStreams.Event

class EventStreamsSpec extends SparkSpec {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("windowedCounts aggregates a micro-batched stream like batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = EventStreams.windowedCounts(input.toDF(), watermarkDelay = "1 minute")
      .writeStream.format("memory").queryName("wc")
      .outputMode("complete").start()
    try {
      input.addData(
        Event(ts("2024-01-01 10:05:00"), 1, "click", 2.0),
        Event(ts("2024-01-01 10:55:00"), 2, "click", 3.0),
        Event(ts("2024-01-01 11:05:00"), 1, "view", 5.0))
      q.processAllAvailable()
      val rows = spark.table("wc").collect()
        .map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2),
          r.getDouble(3))).toSet
      assert(rows == Set(
        ("2024-01-01 10:00:00.0", "click", 2L, 5.0),
        ("2024-01-01 11:00:00.0", "view", 1L, 5.0)))
    } finally q.stop()
  }

  test("dedupStream drops repeated keys within the watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = EventStreams.dedupStream(input.toDF(), Seq("user_id"), "ts",
        watermarkDelay = "1 hour")
      .writeStream.format("memory").queryName("dd")
      .outputMode("append").start()
    try {
      input.addData(
        Event(ts("2024-01-01 10:00:00"), 1, "click", 1.0),
        Event(ts("2024-01-01 10:01:00"), 1, "click", 2.0), // dup key
        Event(ts("2024-01-01 10:02:00"), 2, "view", 3.0))
      q.processAllAvailable()
      input.addData(Event(ts("2024-01-01 10:03:00"), 1, "click", 4.0)) // dup
      q.processAllAvailable()
      val users = spark.table("dd").collect().map(_.getLong(1)).sorted
      assert(users.toSeq == Seq(1L, 2L))
    } finally q.stop()
  }

  test("enrichStream decorates a stream with a broadcast static dim") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq((1L, "gold"), (2L, "silver")).toDF("user_id", "tier")
    val input = MemoryStream[Event]
    val q = EventStreams.enrichStream(input.toDF(), dim, Seq("user_id"))
      .writeStream.format("memory").queryName("en")
      .outputMode("append").start()
    try {
      input.addData(
        Event(ts("2024-01-01 10:00:00"), 1, "click", 1.0),
        Event(ts("2024-01-01 10:01:00"), 2, "view", 2.0),
        Event(ts("2024-01-01 10:02:00"), 3, "click", 3.0)) // no dim row
      q.processAllAvailable()
      val rows = spark.table("en").collect()
        .map(r => (r.getAs[Long]("user_id"), r.getAs[String]("tier"))).toSet
      assert(rows == Set((1L, "gold"), (2L, "silver"))) // inner join drops 3
    } finally q.stop()
  }

  test("streamStreamJoin matches within the window on two live streams") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val purchases = MemoryStream[Event]
    val clicks = MemoryStream[Event]
    // both sides keep their natural "ts" name — the join must qualify
    // its references rather than force callers to pre-rename
    val joined = EventStreams.streamStreamJoin(
      purchases.toDF().select($"user_id", $"ts", $"value".as("p_val")),
      clicks.toDF().select($"user_id", $"ts", $"value".as("c_val")),
      key = "user_id", leftTime = "ts", rightTime = "ts",
      windowSec = 600, watermarkDelay = "1 minute")
    val q = joined.writeStream.format("memory").queryName("ssj")
      .outputMode("append").start()
    try {
      clicks.addData(
        Event(ts("2024-01-01 10:00:00"), 1, "click", 1.0),   // in window
        Event(ts("2024-01-01 09:40:00"), 1, "click", 2.0),   // too old
        Event(ts("2024-01-01 10:00:00"), 2, "click", 3.0))   // other user
      purchases.addData(Event(ts("2024-01-01 10:05:00"), 1, "purchase", 9.0))
      q.processAllAvailable()
      val rows = spark.table("ssj").collect()
        .map(r => (r.getAs[Long]("user_id"), r.getAs[Double]("c_val")))
      assert(rows.toSeq == Seq((1L, 1.0))) // only the in-window same-user click
    } finally q.stop()
  }

  test("sessionize closes a session when the gap is exceeded") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = EventStreams.sessionize(input.toDS(), gapMs = 10 * 60 * 1000L)
      .writeStream.format("memory").queryName("sess")
      .outputMode("append").start()
    try {
      // one user, two bursts 40 minutes apart -> first burst closes when
      // the second arrives (gap 40 min > 10 min)
      input.addData(
        Event(ts("2024-01-01 09:00:00"), 7, "click", 1.0),
        Event(ts("2024-01-01 09:05:00"), 7, "click", 1.0))
      q.processAllAvailable()
      input.addData(Event(ts("2024-01-01 09:45:00"), 7, "click", 1.0))
      q.processAllAvailable()
      val rows = spark.table("sess").collect()
        .map(r => (r.getLong(0), r.getTimestamp(1).toString,
          r.getTimestamp(2).toString, r.getLong(3)))
      assert(rows.toSeq == Seq(
        (7L, "2024-01-01 09:00:00.0", "2024-01-01 09:05:00.0", 2L)))
    } finally q.stop()
  }
  test("asOfEnrichStream: state crosses batches, ties inclusive, " +
      "facts without priors drop") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.EventStreams.{AsOfInput, AsOfOut}
    val input = MemoryStream[AsOfInput]
    val q = EventStreams.asOfEnrichStream(input.toDS())
      .writeStream.format("memory").queryName("asof_st")
      .outputMode("append").start()
    def rows() = spark.table("asof_st").collect()
      .map(r => (r.getLong(0), r.getTimestamp(3).toString, r.getDouble(4)))
      .toSet
    try {
      // batch 1: a purchase BEFORE any click drops; a click seeds state;
      // an equal-timestamp purchase matches it (inclusive <=); within
      // the batch, arrival order is scrambled — event-time sort rules
      input.addData(
        AsOfInput(100L, 1L, ts("2024-01-01 10:05:00"), true, 0.0),
        AsOfInput(101L, 1L, ts("2024-01-01 10:01:00"), true, 0.0),
        AsOfInput(0L, 1L, ts("2024-01-01 10:05:00"), false, 7.5),
        AsOfInput(1L, 1L, ts("2024-01-01 10:03:00"), false, 3.5))
      q.processAllAvailable()
      assert(rows() == Set((100L, "2024-01-01 10:05:00.0", 7.5)),
        s"batch 1: ${rows()}")
      // batch 2: the 10:05 click survives IN STATE across the batch
      // boundary; a fresher click then supersedes it for later facts
      input.addData(
        AsOfInput(102L, 1L, ts("2024-01-01 10:10:00"), true, 0.0),
        AsOfInput(2L, 1L, ts("2024-01-01 10:12:00"), false, 9.0),
        AsOfInput(103L, 1L, ts("2024-01-01 10:15:00"), true, 0.0),
        // a different key starts from empty state — no cross-talk
        AsOfInput(104L, 2L, ts("2024-01-01 10:15:00"), true, 0.0))
      q.processAllAvailable()
      assert(rows() == Set(
        (100L, "2024-01-01 10:05:00.0", 7.5),
        (102L, "2024-01-01 10:05:00.0", 7.5),
        (103L, "2024-01-01 10:12:00.0", 9.0)), s"batch 2: ${rows()}")
    } finally q.stop()
  }

  test("asOfEnrichStreamForward: facts buffer across batches until the " +
      "next reference arrives; the first at-or-after wins, inclusive") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.EventStreams.AsOfInput
    val input = MemoryStream[AsOfInput]
    val q = EventStreams.asOfEnrichStreamForward(input.toDS())
      .writeStream.format("memory").queryName("asof_fwd")
      .outputMode("append").start()
    def rows() = spark.table("asof_fwd").collect()
      .map(r => (r.getLong(0), r.getTimestamp(3).toString, r.getDouble(4)))
      .toSet
    try {
      // batch 1: two purchases, NO click yet -> both buffer, nothing
      // emits; an equal-timestamp click matches inclusively
      input.addData(
        AsOfInput(200L, 1L, ts("2024-01-01 10:01:00"), true, 0.0),
        AsOfInput(201L, 1L, ts("2024-01-01 10:03:00"), true, 0.0))
      q.processAllAvailable()
      assert(rows().isEmpty, s"facts must wait for a reference: ${rows()}")
      // batch 2: the first click releases BOTH pending facts (it is the
      // earliest at-or-after for each); a later click matches nothing
      input.addData(
        AsOfInput(2L, 1L, ts("2024-01-01 10:03:00"), false, 5.5),
        AsOfInput(3L, 1L, ts("2024-01-01 10:09:00"), false, 9.9))
      q.processAllAvailable()
      assert(rows() == Set(
        (200L, "2024-01-01 10:03:00.0", 5.5),
        (201L, "2024-01-01 10:03:00.0", 5.5)), s"batch 2: ${rows()}")
      // batch 3: a new fact after all clicks stays pending forever
      // (inner drop); a same-batch fact+click pair resolves in order
      input.addData(
        AsOfInput(202L, 1L, ts("2024-01-01 10:20:00"), true, 0.0),
        AsOfInput(203L, 1L, ts("2024-01-01 10:10:00"), true, 0.0),
        AsOfInput(4L, 1L, ts("2024-01-01 10:12:00"), false, 1.25))
      q.processAllAvailable()
      assert(rows() == Set(
        (200L, "2024-01-01 10:03:00.0", 5.5),
        (201L, "2024-01-01 10:03:00.0", 5.5),
        (203L, "2024-01-01 10:12:00.0", 1.25)), s"batch 3: ${rows()}")
    } finally q.stop()
  }

  test("late-arrival counter fires on cross-batch time descents and the " +
      "machines degrade safely, never corrupt") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.EventStreams.AsOfInput
    // backward machine
    val late = spark.sparkContext.longAccumulator("late_bwd")
    val input = MemoryStream[AsOfInput]
    val q = EventStreams.asOfEnrichStream(input.toDS(), Some(late))
      .writeStream.format("memory").queryName("asof_late")
      .outputMode("append").start()
    try {
      input.addData(
        AsOfInput(10L, 1L, ts("2024-01-01 10:10:00"), false, 7.0),
        AsOfInput(300L, 1L, ts("2024-01-01 10:11:00"), true, 0.0))
      q.processAllAvailable()
      assert(late.value == 0L, "in-order batch must not count late")
      // batch 2 delivers OLDER events: one late ref (must not regress
      // state), one late fact (must not be enriched by the FUTURE ref)
      input.addData(
        AsOfInput(11L, 1L, ts("2024-01-01 10:02:00"), false, 3.0),
        AsOfInput(301L, 1L, ts("2024-01-01 10:01:00"), true, 0.0))
      q.processAllAvailable()
      assert(late.value == 2L, s"both descents must count: ${late.value}")
      val got = spark.table("asof_late").collect()
        .map(r => (r.getLong(0), r.getDouble(4))).toSet
      // 301 (ts 10:01) found no ref at-or-before itself: dropped, NOT
      // matched to the 10:10 ref sitting in state
      assert(got == Set((300L, 7.0)), s"late fact must drop: $got")
      // batch 3: a fresh fact still sees the 10:10 ref — the late 10:02
      // ref did not regress the state
      input.addData(AsOfInput(302L, 1L, ts("2024-01-01 10:30:00"), true, 0.0))
      q.processAllAvailable()
      val got3 = spark.table("asof_late").collect()
        .map(r => (r.getLong(0), r.getDouble(4))).toSet
      assert(got3 == Set((300L, 7.0), (302L, 7.0)),
        s"state must hold the NEWEST ref: $got3")
    } finally q.stop()
    // forward machine: same counter contract
    val lateF = spark.sparkContext.longAccumulator("late_fwd")
    val inputF = MemoryStream[AsOfInput]
    val qf = EventStreams.asOfEnrichStreamForward(inputF.toDS(), Some(lateF))
      .writeStream.format("memory").queryName("asof_late_fwd")
      .outputMode("append").start()
    try {
      inputF.addData(AsOfInput(400L, 1L, ts("2024-01-01 10:10:00"), true, 0.0))
      qf.processAllAvailable()
      inputF.addData(AsOfInput(20L, 1L, ts("2024-01-01 10:05:00"), false, 2.0))
      qf.processAllAvailable()
      assert(lateF.value == 1L, s"forward descent must count: ${lateF.value}")
      // the late 10:05 ref is BEFORE the pending 10:10 fact — no match
      assert(spark.table("asof_late_fwd").isEmpty,
        "a late earlier ref must not match a later pending fact")
      // the next in-order ref releases it
      inputF.addData(AsOfInput(21L, 1L, ts("2024-01-01 10:15:00"), false, 4.0))
      qf.processAllAvailable()
      val gotF = spark.table("asof_late_fwd").collect()
        .map(r => (r.getLong(0), r.getDouble(4))).toSet
      assert(gotF == Set((400L, 4.0)), s"forward release: $gotF")
    } finally qf.stop()
    // forward machine: a LATE FACT must DROP, never resolve against a
    // LATER ref than its batch-correct earliest (which may already have
    // passed through unconsumed)
    val lateF2 = spark.sparkContext.longAccumulator("late_fwd2")
    val inputF2 = MemoryStream[AsOfInput]
    val qf2 = EventStreams.asOfEnrichStreamForward(inputF2.toDS(), Some(lateF2))
      .writeStream.format("memory").queryName("asof_late_fwd2")
      .outputMode("append").start()
    try {
      // batch 1: ref R1 at 10:05 — no pending facts, consumed + discarded
      inputF2.addData(AsOfInput(40L, 1L, ts("2024-01-01 10:05:00"), false, 1.0))
      qf2.processAllAvailable()
      // batch 2: LATE fact at 10:00 (its batch answer is R1, already gone)
      inputF2.addData(AsOfInput(600L, 1L, ts("2024-01-01 10:00:00"), true, 0.0))
      qf2.processAllAvailable()
      assert(lateF2.value == 1L)
      // batch 3: ref R2 at 10:15 must NOT resolve the late fact — a
      // wrong value is worse than the inner drop
      inputF2.addData(AsOfInput(41L, 1L, ts("2024-01-01 10:15:00"), false, 2.0))
      qf2.processAllAvailable()
      assert(spark.table("asof_late_fwd2").isEmpty,
        "a late fact must drop, not match a later ref")
    } finally qf2.stop()
  }

  test("outer + tolerance streaming as-of: pad-on-arrival is final, " +
      "stale matches drop (backward) or leave pending (forward)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.EventStreams.AsOfInput
    val tol = Some(600000000L) // 10 min in micros
    // backward OUTER with tolerance: enriched / padded-no-prior /
    // padded-stale, all three in one replay
    val input = MemoryStream[AsOfInput]
    val q = EventStreams.asOfEnrichStreamOuter(input.toDS(), None, tol)
      .writeStream.format("memory").queryName("asof_outer")
      .outputMode("append").start()
    try {
      input.addData(
        AsOfInput(500L, 1L, ts("2024-01-01 09:00:00"), true, 0.0), // no prior
        AsOfInput(30L, 1L, ts("2024-01-01 10:00:00"), false, 6.0))
      q.processAllAvailable()
      input.addData(
        AsOfInput(501L, 1L, ts("2024-01-01 10:05:00"), true, 0.0), // fresh
        AsOfInput(502L, 1L, ts("2024-01-01 11:05:00"), true, 0.0)) // stale
      q.processAllAvailable()
      val got = spark.table("asof_outer").collect()
        .map(r => (r.getLong(0), Option(r.getTimestamp(3)).map(_.toString),
          if (r.isNullAt(4)) None else Some(r.getDouble(4)))).toSet
      assert(got == Set(
        (500L, None, None),
        (501L, Some("2024-01-01 10:00:00.0"), Some(6.0)),
        (502L, None, None)), s"outer+tol: $got")
    } finally q.stop()
    // backward INNER with tolerance: the stale fact drops entirely
    val input2 = MemoryStream[AsOfInput]
    val q2 = EventStreams.asOfEnrichStream(input2.toDS(), None, tol)
      .writeStream.format("memory").queryName("asof_tol")
      .outputMode("append").start()
    try {
      input2.addData(
        AsOfInput(30L, 1L, ts("2024-01-01 10:00:00"), false, 6.0),
        AsOfInput(503L, 1L, ts("2024-01-01 10:05:00"), true, 0.0),
        AsOfInput(504L, 1L, ts("2024-01-01 11:05:00"), true, 0.0))
      q2.processAllAvailable()
      assert(spark.table("asof_tol").collect().map(_.getLong(0)).toSet ==
        Set(503L), "stale fact must drop under inner")
    } finally q2.stop()
    // forward with tolerance: the first at-or-after ref resolves the
    // fact FINALLY — staler than the bound means no emit, and the fact
    // must NOT wait for (or match) an even-later ref
    val input3 = MemoryStream[AsOfInput]
    val q3 = EventStreams.asOfEnrichStreamForward(input3.toDS(), None, tol)
      .writeStream.format("memory").queryName("asof_fwd_tol")
      .outputMode("append").start()
    try {
      input3.addData(
        AsOfInput(505L, 1L, ts("2024-01-01 10:00:00"), true, 0.0))
      q3.processAllAvailable()
      input3.addData( // 65 min later: STALE -> final no-match
        AsOfInput(31L, 1L, ts("2024-01-01 11:05:00"), false, 8.0),
        // this later in-tolerance-of-NOTHING ref must not revive 505
        AsOfInput(32L, 1L, ts("2024-01-01 11:06:00"), false, 9.0),
        // a fresh fact matched within tolerance still works
        AsOfInput(506L, 1L, ts("2024-01-01 11:00:00"), true, 0.0))
      q3.processAllAvailable()
      val gotF = spark.table("asof_fwd_tol").collect()
        .map(r => (r.getLong(0), r.getDouble(4))).toSet
      assert(gotF == Set((506L, 8.0)), s"fwd+tol: $gotF")
    } finally q3.stop()
  }

  test("bounded forward as-of: refs stop arriving mid-stream -> the " +
      "watermark evicts pending facts (outer pads, inner drops), state " +
      "does not grow forever") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.EventStreams.AsOfInput
    val tol = 600000000L // 10 min in micros
    // OUTER: key 1 gets facts, then its refs go silent; key 2 keeps the
    // watermark moving. Each key-1 fact must emit null-padded once its
    // tolerance horizon is passed, and the evictions counter must count it.
    val ev = spark.sparkContext.longAccumulator("evict_outer")
    val input = MemoryStream[AsOfInput]
    val q = EventStreams.asOfEnrichStreamForwardOuter(input.toDS(),
        tolerance = tol, watermarkDelay = "10 seconds", evictions = Some(ev))
      .writeStream.format("memory").queryName("asof_fwd_outer")
      .outputMode("append").start()
    try {
      input.addData(
        AsOfInput(700L, 1L, ts("2024-01-01 10:00:00"), true, 0.0),
        AsOfInput(50L, 1L, ts("2024-01-01 10:01:00"), false, 3.0), // matches 700
        AsOfInput(701L, 1L, ts("2024-01-01 10:02:00"), true, 0.0)) // then silence
      q.processAllAvailable()
      // advance the watermark far past 701's horizon (10:12) via key 2
      input.addData(
        AsOfInput(800L, 2L, ts("2024-01-01 11:00:00"), true, 0.0))
      q.processAllAvailable()
      // one more batch so the post-watermark-advance timeout pass runs
      // even if no no-data batch fired; it ALSO pushes the watermark
      // past 800's own horizon (11:10), so 800 evicts too — the
      // mechanism is per-fact, not per-silent-key
      input.addData(
        AsOfInput(801L, 2L, ts("2024-01-01 11:30:00"), true, 0.0))
      q.processAllAvailable()
      val got = spark.table("asof_fwd_outer").collect()
        .map(r => (r.getLong(0), Option(r.getTimestamp(3)).map(_.toString)))
        .toSet
      assert(got == Set(
        (700L, Some("2024-01-01 10:01:00.0")),
        (701L, None), (800L, None)), s"outer eviction: $got")
      assert(ev.value == 2L, s"evictions counted: ${ev.value}")
    } finally q.stop()
    // INNER bounded: same silence — the evicted fact drops silently and
    // the machine matches the unbounded inner's output exactly
    val ev2 = spark.sparkContext.longAccumulator("evict_inner")
    val input2 = MemoryStream[AsOfInput]
    val q2 = EventStreams.asOfEnrichStreamForward(input2.toDS(),
        tolerance = Some(tol), watermarkDelay = Some("10 seconds"),
        evictions = Some(ev2))
      .writeStream.format("memory").queryName("asof_fwd_bounded")
      .outputMode("append").start()
    try {
      input2.addData(
        AsOfInput(700L, 1L, ts("2024-01-01 10:00:00"), true, 0.0),
        AsOfInput(50L, 1L, ts("2024-01-01 10:01:00"), false, 3.0),
        AsOfInput(701L, 1L, ts("2024-01-01 10:02:00"), true, 0.0))
      q2.processAllAvailable()
      input2.addData(AsOfInput(800L, 2L, ts("2024-01-01 11:00:00"), true, 0.0))
      q2.processAllAvailable()
      input2.addData(AsOfInput(801L, 2L, ts("2024-01-01 11:30:00"), true, 0.0))
      q2.processAllAvailable()
      val got2 = spark.table("asof_fwd_bounded").collect()
        .map(r => (r.getLong(0), r.getDouble(4))).toSet
      assert(got2 == Set((700L, 3.0)), s"inner bounded: $got2")
      assert(ev2.value == 2L, s"inner evictions counted: ${ev2.value}")
    } finally q2.stop()
  }

  test("st16 novelty filter: both bloom branches carry traffic") {
    // the split direction matters: keep-probable-matches (the semi-join
    // bloom composition) would drop exactly the novel traffic — this
    // pins that the gate admits novel arrivals AND suppresses seen ones
    import org.apache.spark.sql.functions._
    val out = SparkEntry.queries("st16_stream_novelty_filter")(spark, sfTiny)
    val novel = out.count()
    val ev = graft.io.Tables.events(spark, sfTiny)
    val Array(mn, mx) = ev
      .agg(min(unix_micros(col("ts"))), max(unix_micros(col("ts"))))
      .head().toSeq.map(_.asInstanceOf[Long]).toArray
    val cut = mn + (mx - mn) / 2
    val arrivals = ev.filter(unix_micros(col("ts")) >= cut).count()
    assert(novel > 0, "no novel arrivals admitted")
    assert(novel < arrivals,
      s"nothing suppressed: $novel of $arrivals arrivals emitted")
  }

  test("strict backward streaming as-of: ties excluded, the demoted " +
      "reference crosses batches in state") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.EventStreams.AsOfInput
    val input = MemoryStream[AsOfInput]
    val q = EventStreams.asOfEnrichStream(input.toDS(), strict = true)
      .writeStream.format("memory").queryName("asof_strict_st")
      .outputMode("append").start()
    def rows() = spark.table("asof_strict_st").collect()
      .map(r => (r.getLong(0), r.getTimestamp(3).toString, r.getDouble(4)))
      .toSet
    try {
      // clicks at 10:03 and 10:05; a purchase TIED with 10:05 must match
      // 10:03 (tie excluded), a later purchase matches 10:05 normally
      input.addData(
        AsOfInput(1L, 1L, ts("2024-01-01 10:03:00"), false, 3.5),
        AsOfInput(2L, 1L, ts("2024-01-01 10:05:00"), false, 7.5),
        AsOfInput(100L, 1L, ts("2024-01-01 10:05:00"), true, 0.0))
      q.processAllAvailable()
      assert(rows() == Set((100L, "2024-01-01 10:03:00.0", 3.5)),
        s"batch 1: ${rows()}")
      // batch 2: the DEMOTED 10:03 reference survived the boundary — a
      // new same-time-as-held-ref purchase still reaches it; a strictly
      // later purchase takes the held 10:05
      input.addData(
        AsOfInput(101L, 1L, ts("2024-01-01 10:05:00"), true, 0.0),
        AsOfInput(102L, 1L, ts("2024-01-01 10:06:00"), true, 0.0))
      q.processAllAvailable()
      assert(rows() == Set(
        (100L, "2024-01-01 10:03:00.0", 3.5),
        (101L, "2024-01-01 10:03:00.0", 3.5),
        (102L, "2024-01-01 10:05:00.0", 7.5)), s"batch 2: ${rows()}")
    } finally q.stop()
  }

  test("strict backward streaming as-of: a LATE reference strictly " +
      "between refBefore and ref upgrades refBefore (advice r16)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.EventStreams.AsOfInput
    val input = MemoryStream[AsOfInput]
    val q = EventStreams.asOfEnrichStream(input.toDS(), strict = true)
      .writeStream.format("memory").queryName("asof_strict_late_ref")
      .outputMode("append").start()
    def rows() = spark.table("asof_strict_late_ref").collect()
      .map(r => (r.getLong(0), r.getTimestamp(3).toString, r.getDouble(4)))
      .toSet
    try {
      // batch 1: refs at 10:01 and 10:05 -> ref = 10:05, refBefore = 10:01
      input.addData(
        AsOfInput(1L, 1L, ts("2024-01-01 10:01:00"), false, 1.0),
        AsOfInput(2L, 1L, ts("2024-01-01 10:05:00"), false, 5.0))
      q.processAllAvailable()
      // batch 2: a LATE 10:03 reference (below the 10:05 high-water
      // mark) is strictly between refBefore and ref — it must upgrade
      // refBefore, so the tied 10:05 fact matches 10:03 (the batch
      // ASOF answer), not the staler 10:01 the old state held
      input.addData(
        AsOfInput(3L, 1L, ts("2024-01-01 10:03:00"), false, 3.0),
        AsOfInput(100L, 1L, ts("2024-01-01 10:05:00"), true, 0.0))
      q.processAllAvailable()
      assert(rows() == Set((100L, "2024-01-01 10:03:00.0", 3.0)),
        s"late ref not upgraded into refBefore: ${rows()}")
      // a late ref OLDER than refBefore must NOT regress it
      input.addData(
        AsOfInput(4L, 1L, ts("2024-01-01 10:02:00"), false, 2.0),
        AsOfInput(101L, 1L, ts("2024-01-01 10:05:00"), true, 0.0))
      q.processAllAvailable()
      assert(rows() == Set(
        (100L, "2024-01-01 10:03:00.0", 3.0),
        (101L, "2024-01-01 10:03:00.0", 3.0)),
        s"older late ref regressed refBefore: ${rows()}")
    } finally q.stop()
  }

  test("strict forward streaming as-of: a same-time reference does not " +
      "resolve; the fact waits for a strictly-later one") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.EventStreams.AsOfInput
    val input = MemoryStream[AsOfInput]
    val q = EventStreams.asOfEnrichStreamForward(input.toDS(), strict = true)
      .writeStream.format("memory").queryName("asof_strict_fwd_st")
      .outputMode("append").start()
    def rows() = spark.table("asof_strict_fwd_st").collect()
      .map(r => (r.getLong(0), r.getTimestamp(3).toString, r.getDouble(4)))
      .toSet
    try {
      // the tied click is consumed WITHOUT resolving the purchase (no
      // strictly-earlier pending facts) — non-strict would emit here
      input.addData(
        AsOfInput(100L, 1L, ts("2024-01-01 10:05:00"), true, 0.0),
        AsOfInput(1L, 1L, ts("2024-01-01 10:05:00"), false, 1.0))
      q.processAllAvailable()
      assert(rows().isEmpty, s"tie resolved under strict: ${rows()}")
      // the next, strictly-later click is the match
      input.addData(
        AsOfInput(2L, 1L, ts("2024-01-01 10:07:00"), false, 2.0))
      q.processAllAvailable()
      assert(rows() == Set((100L, "2024-01-01 10:07:00.0", 2.0)),
        s"after late click: ${rows()}")
    } finally q.stop()
  }
}
