package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import java.sql.Timestamp

/** Structured Streaming surface: the batch Events transforms re-expressed
  * incrementally. Every function takes a DataFrame that may be built from
  * `readStream` (file source, Kafka, rate, MemoryStream in tests) — the
  * plan is identical either way, which is the point: declare the logical
  * plan once, run it batch or incremental.
  *
  * State discipline for unbounded streams:
  *  - windowed aggs carry a watermark so Spark can drop window state once
  *    event time passes window_end + delay;
  *  - sessionization uses flatMapGroupsWithState with a processing-time
  *    timeout — per-user state is one (start, last, count) triple, evicted
  *    on timeout, so state size is O(active users), not O(events).
  */
object EventStreams {

  /** tumbling-window counts/sums with late-data tolerance */
  def windowedCounts(events: DataFrame, watermarkDelay: String = "10 minutes",
                     windowLen: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), windowLen).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** HOPPING (sliding) window counts/sums: windows of `windowLen` that
    * START every `slide` — each event lands in windowLen/slide
    * overlapping windows (Spark's window() with a slide duration expands
    * the event row-locally before the keyed aggregation, so state is
    * (windows × groups)-sized, not event-sized). The moving-average /
    * rate-monitor shape tumbling can't express: a spike is visible in
    * every overlapping window, not just the bucket it fell into. */
  def hoppingCounts(events: DataFrame, watermarkDelay: String = "10 minutes",
                    windowLen: String = "1 hour",
                    slide: String = "15 minutes"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), windowLen, slide).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** streaming exact dedup: drop rows whose key was already seen within
    * the watermark horizon — state for a key is evicted once event time
    * passes its arrival + delay, so state is bounded by stream rate x
    * delay instead of growing forever. The incremental form of
    * DedupOps.exactDedupRanks' keep-first semantics. */
  def dedupStream(events: DataFrame, idCols: Seq[String], tsCol: String,
                  watermarkDelay: String = "10 minutes"): DataFrame =
    events.withWatermark(tsCol, watermarkDelay)
      .dropDuplicatesWithinWatermark(idCols)

  case class Event(ts: Timestamp, user_id: Long, event_type: String, value: Double)
  case class SessionState(start: Long, last: Long, n: Long)
  case class Session(user_id: Long, session_start: Timestamp,
                     session_end: Timestamp, n_events: Long)

  /** gap-based sessionization with explicit state: a session closes when
    * a newer event exceeds the inactivity gap, or when the event-time
    * watermark passes last+gap (event-time timeout — deterministic,
    * unlike processing-time timeouts, and it lets Spark bound state by
    * the watermark instead of wall clock). */
  def sessionize(events: Dataset[Event], gapMs: Long = 30 * 60 * 1000L,
                 watermarkDelay: String = "10 minutes"): Dataset[Session] = {
    import events.sparkSession.implicits._
    events.withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, rows: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val out = state.getOption.map(s =>
              Session(userId, new Timestamp(s.start), new Timestamp(s.last), s.n))
            state.remove()
            out.iterator
          } else {
            val sorted = rows.toSeq.sortBy(_.ts.getTime)
            var cur = state.getOption
            val closed = Seq.newBuilder[Session]
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.last <= gapMs =>
                  cur = Some(s.copy(last = t, n = s.n + 1))
                case Some(s) =>
                  closed += Session(userId, new Timestamp(s.start),
                    new Timestamp(s.last), s.n)
                  cur = Some(SessionState(t, t, 1))
                case None =>
                  cur = Some(SessionState(t, t, 1))
              }
            }
            cur.foreach { s =>
              state.update(s)
              // fire once the watermark passes the session's gap horizon;
              // max() guards states older than the current watermark
              state.setTimeoutTimestamp(
                math.max(s.last + gapMs,
                  state.getCurrentWatermarkMs() + 1))
            }
            closed.result().iterator
          }
      }
  }

  case class AsOfInput(event_id: Long, user_id: Long, ts: Timestamp,
                       is_purchase: Boolean, value: Double)
  case class AsOfState(ts: Timestamp, value: Double)
  case class AsOfOut(event_id: Long, user_id: Long, ts: Timestamp,
                     asof_ts: Timestamp, asof_value: Double)
  /** LEFT OUTER output: unmatched facts survive with None asof_* —
    * a separate type so the inner machines' output schema (and the
    * st17/st18 oracles hashing it) stays untouched */
  case class AsOfOutOuter(event_id: Long, user_id: Long, ts: Timestamp,
                          asof_ts: Option[Timestamp],
                          asof_value: Option[Double])
  /** backward enrichment state: the latest reference + the max event
    * time this key has PROCESSED — the high-water mark that makes
    * out-of-order delivery detectable instead of silent. `refBefore`
    * (round-16) is the second-latest DISTINCT-TIME reference, carried
    * for the STRICT machines: a fact tied with the current reference's
    * time must match the latest strictly-earlier one, which the single
    * `ref` no longer holds once the tie overwrote it. Defaults keep
    * the non-strict machines' constructor unchanged. */
  case class AsOfEnrichState(ref: Option[AsOfState], maxSeen: Long,
                             refBefore: Option[AsOfState] = None)
  /** forward enrichment state: facts buffered until their next
    * reference arrives (bounded by ref-arrival rate) + the same
    * high-water mark */
  case class AsOfFwdState(pending: List[AsOfInput], maxSeen: Long)

  /** Streaming backward as-of enrichment — e24's operator as a live
    * state machine: one interleaved stream of reference rows (clicks,
    * `is_purchase = false`) and fact rows (purchases); each fact is
    * enriched with the LATEST reference at-or-before its event time on
    * the same key. Per-key state is ONE (ts, value) pair however long
    * the stream runs — the as-of join's O(1) merge state (see
    * AsOfJoinExec) living in the state store.
    *
    * Correctness contract: within a micro-batch, events are processed
    * in event-time order (microsecond-exact — `Timestamp.getTime` is
    * millis and would tear sub-ms order, the reason for the Instant
    * math below) with references before facts at equal timestamps, so
    * "<=" is inclusive. ACROSS batches the operator sees arrival
    * order; delivered time-ascending (a time-ranged file split, a
    * time-ordered log), the result equals the batch ASOF JOIN exactly
    * — the st17 gate replays 8 time-ranged files against the e24
    * DuckDB oracle. A production deployment tolerating late reference
    * data would buffer facts behind a watermark instead; that variant
    * trades latency for reordering tolerance, the same design axis as
    * st13/st15's withheld-tail convention.
    *
    * The ordering precondition is a RUNTIME SIGNAL, not a silent
    * assumption: each key's state carries its processed-time high-water
    * mark, every event arriving below it increments `lateArrivals`
    * (driver-visible, Spark-UI-visible accumulator), and late events
    * can only DEGRADE toward batch semantics, never corrupt:
    *  - a late reference is ignored unless newer than the held one
    *    (state never regresses, later facts still get the latest ref);
    *  - a late fact matches only a reference at-or-before ITS OWN time
    *    (it may miss — inner semantics drop it — but it can never be
    *    enriched with a FUTURE reference).
    * An out-of-order source is therefore detectable (counter > 0) and
    * its damage is bounded to dropped late facts.
    *
    * Inner semantics: facts with no prior reference emit nothing (the
    * e24 contract). NoTimeout: state is one pair per key, bounded by
    * key cardinality; an unbounded-key stream would add an event-time
    * timeout eviction like [[sessionize]]'s. */
  def asOfEnrichStream(events: Dataset[AsOfInput],
                       lateArrivals: Option[org.apache.spark.util
                         .LongAccumulator] = None,
                       tolerance: Option[Long] = None,
                       strict: Boolean = false): Dataset[AsOfOut] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[AsOfEnrichState, AsOfOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, rows: Iterator[AsOfInput],
         state: GroupState[AsOfEnrichState]) =>
          backwardBatch(userId, rows, state, lateArrivals, tolerance,
              strict)
            .collect { case (e, Some(c)) =>
              AsOfOut(e.event_id, userId, e.ts, c.ts, c.value)
            }.iterator
      }
  }

  /** LEFT OUTER twin of [[asOfEnrichStream]]: every fact emits on
    * arrival — enriched when a fresh-enough reference exists, None-padded
    * otherwise. Valid STREAMING outer only for the backward direction: a
    * backward match can never be improved by FUTURE data (later refs are
    * later in time), so padding on arrival is final, exactly the batch
    * ASOF LEFT row; a forward outer would have to hold unmatched facts
    * until a watermark declares no reference is coming (timeout
    * eviction), a latency/completeness trade this engine leaves to the
    * caller. Same late-arrival counter and tolerance semantics. */
  def asOfEnrichStreamOuter(events: Dataset[AsOfInput],
                            lateArrivals: Option[org.apache.spark.util
                              .LongAccumulator] = None,
                            tolerance: Option[Long] = None,
                            strict: Boolean = false)
      : Dataset[AsOfOutOuter] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[AsOfEnrichState, AsOfOutOuter](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, rows: Iterator[AsOfInput],
         state: GroupState[AsOfEnrichState]) =>
          backwardBatch(userId, rows, state, lateArrivals, tolerance,
              strict)
            .map { case (e, m) =>
              AsOfOutOuter(e.event_id, userId, e.ts,
                m.map(_.ts), m.map(_.value))
            }.iterator
      }
  }

  /** shared backward merge step: processes one micro-batch group and
    * returns every FACT with its fresh-enough match (None = no match —
    * inner drops it, outer pads it). Tolerance in the time column's
    * units (micros): a staler match is NO match, the batch exec's
    * exact rule (AsOfJoinExec). */
  private def backwardBatch(userId: Long, rows: Iterator[AsOfInput],
                            state: GroupState[AsOfEnrichState],
                            lateArrivals: Option[org.apache.spark.util
                              .LongAccumulator],
                            tolerance: Option[Long],
                            strict: Boolean = false)
      : Seq[(AsOfInput, Option[AsOfState])] = {
    val tol = tolerance.getOrElse(Long.MaxValue)
    val sorted = rows.toSeq.sortBy(e => (micros(e.ts), e.is_purchase))
    val st0 = state.getOption.getOrElse(AsOfEnrichState(None, Long.MinValue))
    var ref = st0.ref
    // strict needs the second-latest distinct-time reference too: a
    // fact TIED with ref's time must match the latest strictly-earlier
    // one (batch AsOfJoinExec's tie exclusion); refs ascend, so either
    // ref is strictly earlier than the fact (use it) or tied (use
    // refBefore). A LATE reference strictly between refBefore and ref
    // upgrades refBefore (below) — without the upgrade a subsequent
    // tied fact would silently match the OLDER refBefore, a
    // staler-than-batch value (advice r16). For a LATE fact refBefore
    // is used only when strictly earlier — exactly the batch answer
    // among references that ARRIVED before it, or the fact misses
    // (degrade-to-drop, same contract as the non-strict late path;
    // references arriving after a fact emitted can never retract it —
    // Append mode's inherent late-data bound, counted by
    // `lateArrivals`).
    var refBefore = st0.refBefore
    var maxSeen = st0.maxSeen
    val out = Seq.newBuilder[(AsOfInput, Option[AsOfState])]
    sorted.foreach { e =>
      val m = micros(e.ts)
      // in-batch order is sorted, so m < maxSeen can only mean a
      // cross-batch descent: delivery order violated time order
      if (m < maxSeen) lateArrivals.foreach(_.add(1L))
      if (!e.is_purchase) {
        if (ref.forall(c => micros(c.ts) <= m)) {
          // a strictly-newer reference demotes the old one to
          // refBefore; a same-time replacement keeps refBefore (the
          // demoted ref shares the new one's time — not strictly
          // earlier)
          if (ref.exists(c => micros(c.ts) < m)) refBefore = ref
          ref = Some(AsOfState(e.ts, e.value))
        } else if (refBefore.forall(c => micros(c.ts) <= m)) {
          // LATE reference (this branch: strictly older than the held
          // ref) strictly between refBefore and ref is still the best
          // strictly-earlier candidate — upgrade refBefore so a later
          // fact TIED with ref's time matches IT (the batch answer),
          // not the staler value it displaced (advice r16). Tied with
          // refBefore's own time, the later arrival wins — the same
          // convention as ref's same-time replacement above.
          refBefore = Some(AsOfState(e.ts, e.value))
        }
      } else {
        val cand =
          if (!strict) ref.filter(c => micros(c.ts) <= m)
          else ref.filter(c => micros(c.ts) < m)
            .orElse(refBefore.filter(c => micros(c.ts) < m))
        out += ((e, cand.filter(c => m - micros(c.ts) <= tol)))
      }
      if (m > maxSeen) maxSeen = m
    }
    state.update(AsOfEnrichState(ref, maxSeen, refBefore))
    out.result()
  }

  /** FORWARD streaming as-of enrichment — e27's direction as a live
    * state machine: each fact is enriched with the EARLIEST reference
    * at-or-AFTER its event time on the same key ("the next quote after
    * the order"). Backward holds one reference and emits facts on
    * arrival; forward must WAIT — facts buffer in state until the next
    * reference arrives, then every pending fact at-or-before it emits
    * with that reference (in time order, the first reference after a
    * fact IS its earliest).
    *
    * TWO state regimes, picked by `watermarkDelay`:
    *  - None (default): NoTimeout — pending-list size is bounded only
    *    by the key's fact rate x its reference inter-arrival gap, and a
    *    key whose references STOP arriving grows state forever. This is
    *    inherent to an UNBOUNDED forward wait, not an implementation
    *    gap: no watermark can prove "no in-tolerance reference is still
    *    coming" when the tolerance is infinite.
    *  - Some(delay) (requires a finite `tolerance`): event-time-timeout
    *    eviction retires each pending fact once the watermark passes
    *    its tolerance horizon — a FINAL, batch-exact no-match (any
    *    on-time reference still to arrive is provably staler than the
    *    bound), silently dropped under these inner semantics. State is
    *    then capped at fact-rate x (tolerance + delay) per key however
    *    long references stay silent; `evictions` counts the retired
    *    facts. See [[asOfEnrichStreamForwardOuter]] for the same
    *    mechanism padding instead of dropping.
    *
    * Delivered time-ascending, the bounded replay equals the batch
    * FORWARD as-of join exactly (facts whose reference never arrives
    * stay pending and drop at stream end — precisely the batch inner
    * drop); st18 shares e27's DuckDB oracle across real micro-batch
    * boundaries. Same late-arrival discipline as [[asOfEnrichStream]]:
    * the counter fires on any cross-batch time descent, and a late fact
    * DROPS rather than buffering — references at-or-after its time may
    * already have passed through (a forward ref with no pending facts is
    * consumed and discarded), so buffering would resolve it against a
    * LATER ref than its batch-correct earliest: a wrong value, where the
    * contract is that late events only ever degrade toward the inner
    * drop. */
  def asOfEnrichStreamForward(events: Dataset[AsOfInput],
                              lateArrivals: Option[org.apache.spark.util
                                .LongAccumulator] = None,
                              tolerance: Option[Long] = None,
                              watermarkDelay: Option[String] = None,
                              evictions: Option[org.apache.spark.util
                                .LongAccumulator] = None,
                              strict: Boolean = false)
      : Dataset[AsOfOut] = {
    import events.sparkSession.implicits._
    watermarkDelay match {
      case Some(delay) =>
        // BOUNDED machine (see [[asOfEnrichStreamForwardOuter]] for the
        // eviction argument): state is capped at fact-rate x (tolerance
        // + delay); a timed-out fact is a FINAL batch-exact no-match
        // and drops silently (inner). Requires a finite tolerance —
        // without one, no watermark can ever prove "no in-tolerance
        // reference is still coming", which is exactly why the
        // unbounded variant below exists.
        val tol = tolerance.getOrElse(throw new IllegalArgumentException(
          "bounded forward as-of requires a finite tolerance: the " +
            "watermark can only retire a fact once its tolerance " +
            "horizon has provably passed"))
        events.withWatermark("ts", delay)
          .groupByKey(_.user_id)
          .flatMapGroupsWithState[AsOfFwdState, AsOfOut](
            OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
            (userId: Long, rows: Iterator[AsOfInput],
             state: GroupState[AsOfFwdState]) =>
              forwardStep(rows, state, lateArrivals, tol,
                bounded = true, evictions, strict)
                .collect { case (f, Some(c)) =>
                  AsOfOut(f.event_id, userId, f.ts, c.ts, c.value)
                }.iterator
          }
      case None =>
        events.groupByKey(_.user_id)
          .flatMapGroupsWithState[AsOfFwdState, AsOfOut](
            OutputMode.Append, GroupStateTimeout.NoTimeout) {
            (userId: Long, rows: Iterator[AsOfInput],
             state: GroupState[AsOfFwdState]) =>
              forwardStep(rows, state, lateArrivals,
                tolerance.getOrElse(Long.MaxValue), bounded = false, None,
                strict)
                .collect { case (f, Some(c)) =>
                  AsOfOut(f.event_id, userId, f.ts, c.ts, c.value)
                }.iterator
          }
    }
  }

  /** FORWARD LEFT OUTER streaming as-of — the one matrix cell a
    * pad-on-arrival design cannot reach (st19's scaladoc: a forward
    * outer must know "no reference is coming" before it pads), closed
    * here by watermark-timeout eviction. Requires a finite `tolerance`:
    * once the event-time watermark passes a pending fact's tolerance
    * horizon (fact time + tolerance), every on-time reference still to
    * arrive is provably staler than the bound, so padding the fact is
    * FINAL and batch-exact — precisely the e31-with-reversed-inequality
    * cut, no approximation. Facts whose earliest at-or-after reference
    * exists but is staler than the bound pad at that reference's
    * arrival (no later reference can be closer); only never-referenced
    * facts need the timeout.
    *
    * This same mechanism is what BOUNDS the state: the pending list the
    * unbounded inner machine grows on a key whose references stop
    * arriving (the round-14 scale flag) is here capped at fact-rate x
    * (tolerance + delay) — each fact leaves state at its reference or
    * at its horizon, whichever first. The `evictions` accumulator
    * counts timed-out facts (driver- and Spark-UI-visible), the same
    * observability pattern as `lateArrivals`.
    *
    * Replay-end contract (st15's convention): a pending fact whose
    * horizon the FINAL watermark (max event time - delay) never passes
    * stays in state unemitted — a bounded replay's oracle must withhold
    * exactly those rows (the st24 gate's oracle does, in the same
    * floor-to-millisecond arithmetic Spark's watermark uses).
    *
    * With EventTimeTimeout Spark drops input rows older than the
    * current watermark BEFORE the machine sees them, so cross-batch
    * descents deeper than `watermarkDelay` are absorbed there; the
    * late-arrival counter still fires on descents above the watermark,
    * and a late fact still drops rather than buffering. */
  def asOfEnrichStreamForwardOuter(events: Dataset[AsOfInput],
                                   lateArrivals: Option[org.apache.spark
                                     .util.LongAccumulator] = None,
                                   tolerance: Long,
                                   watermarkDelay: String = "10 seconds",
                                   evictions: Option[org.apache.spark.util
                                     .LongAccumulator] = None,
                                   strict: Boolean = false)
      : Dataset[AsOfOutOuter] = {
    import events.sparkSession.implicits._
    events.withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[AsOfFwdState, AsOfOutOuter](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, rows: Iterator[AsOfInput],
         state: GroupState[AsOfFwdState]) =>
          forwardStep(rows, state, lateArrivals, tolerance,
            bounded = true, evictions, strict)
            .map { case (f, m) =>
              AsOfOutOuter(f.event_id, userId, f.ts,
                m.map(_.ts), m.map(_.value))
            }.iterator
      }
  }

  /** shared forward merge step: processes one micro-batch group (or a
    * timeout firing — empty `rows`) and returns every RESOLVED fact
    * with its match (None = final no-match: the earliest at-or-after
    * reference was staler than the bound, or — bounded mode — the
    * watermark passed the fact's tolerance horizon; inner drops these,
    * outer pads them).
    *
    * Bounded mode evicts in MILLISECOND arithmetic because that is the
    * watermark's native unit (Spark floors event-time micros to ms
    * before the max/delay subtraction): a fact expires when
    * floor((fact_us + tol) / 1000) < watermark_ms — the exact predicate
    * a replay oracle must mirror. The re-armed timeout fires when the
    * watermark passes the earliest surviving horizon (Spark fires at
    * timestamp < watermark, so arming AT the horizon is exact; the
    * max-with-watermark guard only covers the disallowed
    * earlier-than-watermark case). */
  private def forwardStep(rows: Iterator[AsOfInput],
                          state: GroupState[AsOfFwdState],
                          lateArrivals: Option[org.apache.spark.util
                            .LongAccumulator],
                          tol: Long, bounded: Boolean,
                          evictions: Option[org.apache.spark.util
                            .LongAccumulator],
                          strict: Boolean = false)
      : Seq[(AsOfInput, Option[AsOfState])] = {
    val st0 = state.getOption.getOrElse(AsOfFwdState(Nil, Long.MinValue))
    var pending = st0.pending
    var maxSeen = st0.maxSeen
    val out = Seq.newBuilder[(AsOfInput, Option[AsOfState])]
    if (!state.hasTimedOut) {
      // facts BEFORE references at equal timestamps: ">=" inclusive
      val sorted = rows.toSeq.sortBy(e => (micros(e.ts), !e.is_purchase))
      sorted.foreach { e =>
        val m = micros(e.ts)
        val late = m < maxSeen
        if (late) lateArrivals.foreach(_.add(1L))
        // a LATE fact must DROP, not buffer: references at-or-after
        // its time may already have passed through (a forward ref
        // with no pending facts is consumed and discarded), so
        // buffering would resolve it against a LATER ref than its
        // batch-correct earliest — a wrong VALUE, which the
        // degrade-safely contract forbids; dropping mirrors the
        // backward machine's late-fact inner drop
        if (e.is_purchase) { if (!late) pending ::= e }
        else {
          // this ref RESOLVES every pending fact at-or-before it
          // (in time order it is each one's earliest at-or-after):
          // within tolerance -> match; staler -> final NO match (no
          // later ref can be closer) — either way the fact leaves
          // pending, resolved exactly once
          // strict: a same-time reference is NOT this fact's match —
          // the fact keeps waiting for a strictly-later one (the batch
          // exec's tie exclusion, mirrored)
          val (resolved, still) = pending.partition(f =>
            if (strict) micros(f.ts) < m else micros(f.ts) <= m)
          resolved.foreach { f =>
            out += ((f, if (m - micros(f.ts) <= tol)
              Some(AsOfState(e.ts, e.value)) else None))
          }
          pending = still
        }
        if (m > maxSeen) maxSeen = m
      }
    }
    if (bounded) {
      val wmMs = state.getCurrentWatermarkMs()
      val (expired, alive) =
        pending.partition(f => horizonMs(f, tol) < wmMs)
      expired.foreach { f =>
        evictions.foreach(_.add(1L))
        out += ((f, None))
      }
      pending = alive
      state.update(AsOfFwdState(pending, maxSeen))
      if (pending.nonEmpty)
        state.setTimeoutTimestamp(
          math.max(pending.map(f => horizonMs(f, tol)).min,
            math.max(wmMs, 1L)))
    } else {
      state.update(AsOfFwdState(pending, maxSeen))
    }
    out.result()
  }

  /** last watermark millisecond in which an in-tolerance reference for
    * this fact can still be on time (saturating: the unbounded machine
    * never calls this) */
  private def horizonMs(f: AsOfInput, tol: Long): Long = {
    val m = micros(f.ts)
    val h = m + tol
    if (h < m) Long.MaxValue / 1000 else h / 1000
  }

  private def micros(t: Timestamp): Long = {
    val i = t.toInstant
    i.getEpochSecond * 1000000L + i.getNano / 1000L
  }

  /** stream-static enrichment: join each streaming event to a static
    * dimension frame. Spark plans the static side as a broadcast per
    * micro-batch (re-resolved each batch, so slowly-changing dims are
    * picked up on re-read) — the standard pattern for decorating an
    * event stream with reference data without any stateful join. */
  def enrichStream(events: DataFrame, dim: DataFrame,
                   joinCols: Seq[String]): DataFrame =
    events.join(broadcast(dim), joinCols)

  /** Two-sided watermarked interval join: each left event matched to
    * right events on the same key within `windowSec` BEFORE it. Both
    * sides carry watermarks and the join condition bounds right-time on
    * both ends, so Spark evicts buffered rows once the watermark passes
    * their horizon — state is bounded by rate x (delay + window), the
    * condition that makes a stream-stream join runnable forever. All
    * references are side-qualified, so the two streams may share column
    * names (both sides named `ts` is the natural call). `joinType`
    * extends the inner default to the outer variants ("leftOuter"/
    * "rightOuter"/"fullOuter"): Spark emits the null-padded row for an
    * unmatched side only when the GLOBAL watermark (min across both
    * sides) passes the row's join-window bound and its state is
    * evicted — rows the final watermark never passes stay in state
    * unemitted, which a bounded replay must account for. st15 handles
    * this with an empty trailing input file (the empty batch carries
    * the watermark update so eviction runs inside a real batch) plus
    * an oracle that withholds the tail rows the watermark never
    * flushes; a far-future-sentinel design was rejected there because
    * the output filter hiding the sentinels gets pushed down into the
    * scans and removes them before the watermark node sees them. */
  def streamStreamJoin(left: DataFrame, right: DataFrame, key: String,
                       leftTime: String, rightTime: String,
                       windowSec: Long,
                       watermarkDelay: String = "10 minutes",
                       joinType: String = "inner"): DataFrame = {
    val l = left.withWatermark(leftTime, watermarkDelay)
    val r = right.withWatermark(rightTime, watermarkDelay)
    l.join(r,
      l(key) === r(key) &&
        r(rightTime) >= l(leftTime) - expr(s"INTERVAL $windowSec SECONDS") &&
        r(rightTime) <= l(leftTime),
      joinType)
      .drop(r(key))
  }
}
