package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._
import graft.io.Tables
import graft.streaming.EventStreams

/** Gate-visible Structured Streaming queries: each entry replays
  * `events.parquet` through `readStream` with `Trigger.AvailableNow`,
  * runs one of the graft.streaming.EventStreams operators incrementally,
  * collects the result from a memory sink, and returns it as a plain
  * DataFrame — so the driver's DuckDB oracle checks the STREAMING
  * execution path (micro-batch planner, stateful operators, sinks)
  * against batch SQL semantics.
  *
  * Determinism discipline: a bounded replay must produce the exact batch
  * answer regardless of how the source splits micro-batches, so
  *  - aggregations run in `complete` mode (state never evicted, final
  *    emission covers every group), and
  *  - row-level operators (dedup, joins) use a watermark delay far past
  *    the data's time span, so no state is evicted mid-replay and the
  *    output set equals the batch result.
  * An unbounded production run flips those knobs (append mode, real
  * watermark) — the operator code is identical; EventStreamsSpec covers
  * the eviction/timeout behavior with MemoryStream.
  *
  * The memory sink is gate plumbing only (results are small aggregates /
  * bounded pair lists); a production job writes `writeStream.format(
  * "parquet")` with a checkpoint dir instead.
  */
object StreamingQueries {

  /** The file stream source needs an explicit schema, and the fixture's
    * ts physical type varies by generator version (int64 nanos under
    * nanosAsLong vs timestamp[us]/NTZ — see Tables.events). Take the
    * schema from a one-footer batch read at plan time, then apply the
    * same ts normalization as the batch loader so every streaming
    * operator sees the session LTZ type. */
  private def normalizeTs(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case LongType => df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampNTZType => df.withColumn("ts", expr("cast(ts as timestamp)"))
      case _ => df
    }

  private def eventsStream(s: SparkSession, d: String): DataFrame = {
    val rawSchema = s.read.parquet(s"$d/events.parquet").schema
    // the fixture is a single parquet FILE; the file stream source
    // requires a directory or glob path (a bare file fails basePath
    // validation), so address the file through a one-file glob
    normalizeTs(s.readStream.schema(rawSchema).parquet(s"$d/events.parque[t]"))
  }

  /** run a streaming frame to completion on the bounded source and hand
    * back the sink contents. AvailableNow processes all currently-
    * available files then stops — the batch-replay trigger.
    *
    * The stream is built and run in a CHILD session (`newSession()`:
    * shared SparkContext, isolated SQLConf + temp-view catalog) because
    * state-store partition count is a per-job sizing decision pinned into
    * the checkpoint at first start (unlike batch, AQE cannot re-plan it):
    * size to the stream's key cardinality. The fixture replay carries
    * ~150 users / 5 event types, so a handful of state partitions is the
    * correct sizing; a high-volume production stream would set hundreds.
    * Isolating the setting in a child session means concurrent batch
    * queries on the shared session never observe it, and two interleaved
    * replays can't clobber each other's conf (builder-level configs like
    * nanosAsLong live in the shared SparkConf, so the child inherits
    * them). */
  private def replay(s: SparkSession, name: String, mode: String,
                     confs: Map[String, String] = Map.empty)
                    (build: SparkSession => DataFrame): DataFrame = {
    val child = s.newSession()
    child.conf.set("spark.sql.shuffle.partitions", "8")
    confs.foreach { case (k, v) => child.conf.set(k, v) }
    val q = build(child).writeStream.format("memory").queryName(name)
      .outputMode(mode).trigger(Trigger.AvailableNow()).start()
    try q.awaitTermination() finally if (q.isActive) q.stop()
    child.table(name)
  }

  // watermark far past the fixture's span: bounded replay, nothing evicted
  private val unbounded = "36500 days"

  /** per-JVM scratch root for the file-sink gate (same isolation
    * rationale as IoQueries.scratchRoot) */
  private lazy val scratchRoot: java.nio.file.Path =
    java.nio.file.Files.createTempDirectory("graft_st_")

  val qs: Seq[Q] = Seq(

    // ---- incremental tumbling-window aggregation ------------------------
    Q("st01_stream_tumbling",
      (s, d) => replay(s, "st01", mode = "complete")(c =>
        EventStreams.windowedCounts(eventsStream(c, d),
          watermarkDelay = unbounded)),
      Some("""
        SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start, event_type,
          COUNT(*) AS n,
          CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        FROM events GROUP BY 1, 2""")),

    // ---- incremental HOPPING-window aggregation --------------------------
    //      1-hour windows sliding every 15 minutes — the moving-average
    //      shape tumbling can't express (a spike shows in all 4
    //      overlapping windows). Spark expands each event into its 4
    //      windows row-locally BEFORE the keyed agg (state stays
    //      windows × groups, never event-sized); the oracle replays the
    //      expansion with an explicit k = 0..3 cross join against the
    //      same epoch-aligned bucket arithmetic.
    Q("st22_stream_hopping",
      (s, d) => replay(s, "st22", mode = "complete")(c =>
        EventStreams.hoppingCounts(eventsStream(c, d),
          watermarkDelay = unbounded)),
      Some("""
        WITH h AS (
          SELECT event_type, value,
            time_bucket(INTERVAL '15 minutes', ts) - to_minutes(15 * k.k)
              AS window_start
          FROM events, (SELECT unnest(range(0, 4)) AS k) k)
        SELECT window_start, event_type, COUNT(*) AS n,
          CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        FROM h GROUP BY 1, 2""")),

    // ---- streaming exact dedup (dropDuplicatesWithinWatermark) ----------
    //      output projected to the dedup key: WHICH duplicate survives a
    //      batch is an execution detail, the surviving key set is the
    //      operator's contract
    Q("st02_stream_dedup",
      (s, d) => replay(s, "st02", mode = "append")(c =>
        EventStreams.dedupStream(eventsStream(c, d),
          Seq("user_id", "event_type"), "ts", unbounded)
          .select(col("user_id"), col("event_type"))),
      Some("SELECT DISTINCT user_id, event_type FROM events")),

    // ---- incremental sessionization via session_window ------------------
    //      merge-on-overlap semantics: an event at ts extends a session
    //      to [start, ts + gap); a gap >= 30 min starts a new session.
    //      (The flatMapGroupsWithState formulation with real timeout
    //      eviction lives in EventStreams.sessionize / its spec; this is
    //      the aggregation-operator form of the same analysis.)
    Q("st03_stream_sessions",
      (s, d) => replay(s, "st03", mode = "complete")(c =>
        eventsStream(c, d).withWatermark("ts", unbounded)
          .groupBy(col("user_id"),
            session_window(col("ts"), "30 minutes").as("w"))
          .agg(count(lit(1)).as("n_events"), min(col("ts")).as("session_start"),
            max(col("ts")).as("session_end"))
          .select(col("user_id"), col("session_start"), col("session_end"),
            col("n_events"))),
      // boundary mirror: strict session-window semantics split at
      // diff >= gap on MICROsecond precision (epoch_us), unlike e03's
      // whole-second > 1800 rule
      Some("""
        WITH g AS (
          SELECT user_id, ts,
            CASE WHEN LAG(ts) OVER w IS NULL
                   OR epoch_us(ts) - epoch_us(LAG(ts) OVER w)
                      >= 1800 * 1000000 THEN 1 ELSE 0 END AS new_session
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC)),
        sess AS (
          SELECT user_id, ts,
            SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts ASC
              ROWS UNBOUNDED PRECEDING) AS seq
          FROM g)
        SELECT user_id, MIN(ts) AS session_start, MAX(ts) AS session_end,
          COUNT(*) AS n_events
        FROM sess GROUP BY user_id, seq""")),

    // ---- watermarked stream-stream join ---------------------------------
    //      purchases matched to same-user clicks in the preceding hour;
    //      the inner-join match set is batch-equal for a bounded replay
    Q("st04_stream_stream_join",
      (s, d) => replay(s, "st04", mode = "append") { c =>
        val clicks = eventsStream(c, d).filter(col("event_type") === "click")
          .select(col("user_id").as("c_user"), col("ts").as("click_ts"),
            col("event_id").as("click_id"))
        val purchases = eventsStream(c, d)
          .filter(col("event_type") === "purchase")
          .select(col("user_id").as("c_user"), col("ts").as("purchase_ts"),
            col("event_id").as("purchase_id"))
        EventStreams.streamStreamJoin(purchases, clicks, "c_user",
          "purchase_ts", "click_ts", windowSec = 3600,
          watermarkDelay = unbounded)
          .select(col("c_user").as("user_id"), col("purchase_id"),
            col("click_id"))
      },
      Some("""
        SELECT p.user_id, p.event_id AS purchase_id, c.event_id AS click_id
        FROM events p JOIN events c
          ON p.user_id = c.user_id
          AND p.event_type = 'purchase' AND c.event_type = 'click'
          AND c.ts >= p.ts - INTERVAL 1 HOUR AND c.ts <= p.ts""")),

    // ---- stream-static enrichment (per-micro-batch broadcast join) ------
    //      events decorated with the user's nation from the static
    //      customer dim; per-nation spend is the enriched rollup
    Q("st05_stream_enrich",
      (s, d) => replay(s, "st05", mode = "complete") { c =>
        val dim = Tables.customer(c, d)
          .select(col("c_custkey").as("user_id"), col("c_nationkey"))
        EventStreams.enrichStream(
            eventsStream(c, d).filter(col("event_type") === "purchase"),
            dim, Seq("user_id"))
          .withWatermark("ts", unbounded)
          .groupBy(col("c_nationkey"))
          .agg(count(lit(1)).as("n_purchases"),
            sum(col("value").cast("decimal(18,2)")).cast("double")
              .as("total_value"))
      },
      Some("""
        SELECT c.c_nationkey AS c_nationkey, COUNT(*) AS n_purchases,
          CAST(SUM(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        FROM events e JOIN customer c ON e.user_id = c.c_custkey
        WHERE e.event_type = 'purchase'
        GROUP BY 1""")),

    // ---- custom TypedImperativeAggregate through the micro-batch planner
    //      the engine's own minhash_agg runs as STREAMING state: its
    //      serialize/deserialize round-trips through the state store
    //      between micro-batches. The stream's final signature must equal
    //      the batch signature over the same rows (minhash is
    //      order-independent: element-wise min) — emitted as a boolean
    //      the oracle asserts, since DuckDB can't evaluate the sketch.
    Q("st06_stream_custom_agg",
      (s, d) => {
        val streamed = replay(s, "st06", mode = "complete") { c =>
          graft.expressions.VectorExpressions.registerAll(c)
          eventsStream(c, d)
            .withWatermark("ts", unbounded)
            .groupBy("event_type")
            .agg(expr("minhash_agg(xxhash64(user_id), 16)").as("sig_stream"),
              count(lit(1)).as("n"))
        }
        graft.expressions.VectorExpressions.registerAll(s)
        val batch = Tables.events(s, d)
          .groupBy(col("event_type").as("bt"))
          .agg(expr("minhash_agg(xxhash64(user_id), 16)").as("sig_batch"))
        streamed.join(batch, col("event_type") === col("bt"))
          .select(col("event_type"), col("n"),
            (col("sig_stream") <=> col("sig_batch")).as("sig_equal"))
      },
      Some("""
        SELECT event_type, COUNT(*) AS n, TRUE AS sig_equal
        FROM events GROUP BY event_type""")),

    // ---- Misra-Gries summary as STREAMING state -------------------------
    //      the engine's mg_topk_agg (ds04) through the micro-batch
    //      planner: its serialize/merge path round-trips the state store
    //      between micro-batches. Capacity (4096) exceeds the fixture's
    //      per-type user cardinality (150 @sf0.01 / 1500 @sf0.1), so the
    //      summary is provably EXACT (no eviction ever fires) and the
    //      streamed map must equal the batch per-user counts key for key
    //      — asserted as a per-type boolean over a full outer join, the
    //      st06 discipline (DuckDB can't evaluate the sketch itself).
    Q("st07_stream_heavy_hitters",
      (s, d) => {
        val streamed = replay(s, "st07", mode = "complete") { c =>
          graft.expressions.VectorExpressions.registerAll(c)
          eventsStream(c, d)
            .withWatermark("ts", unbounded)
            .groupBy("event_type")
            .agg(expr("mg_topk_agg(user_id, 4096)").as("mg"),
              count(lit(1)).as("n"))
        }
        val est = streamed.select(col("event_type"), col("n"),
          explode(col("mg")).as(Seq("uid", "est")))
        val batch = Tables.events(s, d)
          .groupBy(col("event_type").as("bt"), col("user_id"))
          .agg(count(lit(1)).as("cnt"))
        est.join(batch,
            col("event_type") === col("bt") && col("uid") === col("user_id"),
            "full_outer")
          .groupBy(coalesce(col("event_type"), col("bt")).as("event_type"))
          .agg(max(col("n")).as("n"), count(lit(1)).as("n_users"),
            (sum(when(col("est") === col("cnt"), 0).otherwise(1)) === 0)
              .as("all_exact"))
      },
      Some("""
        SELECT event_type, COUNT(*) AS n,
          COUNT(DISTINCT user_id) AS n_users, TRUE AS all_exact
        FROM events GROUP BY event_type""")),

    // ---- the production sink path: parquet file sink + checkpoint --------
    //      every other st* gate collects from a memory sink; this one
    //      runs the real exactly-once file sink — streaming dedup writes
    //      zstd parquet under a checkpointed output manifest, and the
    //      gate aggregates what a DOWNSTREAM BATCH READER actually sees.
    //      Re-running in the same JVM is the production restart case:
    //      the checkpoint shows nothing new, no files are duplicated,
    //      and the read-back result is unchanged (exactly-once across
    //      restarts is the file sink's whole contract). The scratch
    //      path is keyed by the data dir so sf0.001 spec runs and
    //      sf0.01 gate runs never share a checkpoint.
    Q("st08_file_sink",
      (s, d) => {
        val base = scratchRoot.resolve(
          "st08-" + d.replaceAll("[^A-Za-z0-9.]", "_")).toString
        val child = s.newSession()
        child.conf.set("spark.sql.shuffle.partitions", "8")
        val q = EventStreams.dedupStream(eventsStream(child, d),
            Seq("user_id", "event_type"), "ts", unbounded)
          .select(col("user_id"), col("event_type"))
          .writeStream.format("parquet")
          .option("path", s"$base/out")
          .option("checkpointLocation", s"$base/ckpt")
          .option("compression", "zstd")
          .outputMode("append")
          .trigger(Trigger.AvailableNow()).start()
        try q.awaitTermination() finally if (q.isActive) q.stop()
        s.read.parquet(s"$base/out")
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_pairs"),
            countDistinct(col("user_id")).as("n_users"))
      },
      Some("""
        SELECT event_type, COUNT(*) AS n_pairs,
          COUNT(DISTINCT user_id) AS n_users
        FROM (SELECT DISTINCT user_id, event_type FROM events)
        GROUP BY event_type""")),

    // ---- multi-micro-batch replay ----------------------------------------
    //      the single-file fixture makes AvailableNow a ONE-batch replay,
    //      so the other st* gates exercise state mostly within a batch.
    //      Here the fixture is split into 8 time-ranged files and the
    //      source is throttled to one file per trigger — eight real
    //      micro-batches flowing through the state store — and the
    //      complete-mode windowed aggregate must still equal batch SQL
    //      exactly, however the data was batched.
    Q("st09_multibatch_replay",
      (s, d) => {
        val base = scratchRoot.resolve(
          "st09-" + d.replaceAll("[^A-Za-z0-9.]", "_")).toString
        val child = s.newSession()
        child.conf.set("spark.sql.shuffle.partitions", "8")
        val stream = child.readStream
          .schema(Tables.events(s, d).schema)
          .option("maxFilesPerTrigger", "1")
          .parquet(base)
        val q = EventStreams.windowedCounts(stream,
            watermarkDelay = unbounded)
          .writeStream.format("memory").queryName("st09")
          .outputMode("complete")
          .trigger(Trigger.AvailableNow()).start()
        try q.awaitTermination() finally if (q.isActive) q.stop()
        child.table("st09")
      },
      Some("""
        SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
          event_type, COUNT(*) AS n,
          CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        FROM events GROUP BY 1, 2"""),
      // the 8-file time-ranged source split is input staging, not the
      // replay's steady-state cost — Bench runs it once untimed
      setup = Some((s, d) => Tables.events(s, d)
        .repartitionByRange(8, col("ts"))
        .write.mode("overwrite").option("compression", "zstd")
        .parquet(scratchRoot.resolve(
          "st09-" + d.replaceAll("[^A-Za-z0-9.]", "_")).toString))),

    // ---- incremental anti-entropy checksum ------------------------------
    //      w11's order-independent table fingerprint maintained by the
    //      micro-batch planner: the commutative 60-bit md5 sum is
    //      exactly the shape streaming aggregation state wants (one
    //      decimal + one count, merged per batch), so a live table can
    //      carry its own replica-comparison checksum without rescans.
    //      Complete mode, global aggregate — no watermark needed.
    Q("st10_stream_checksum",
      (s, d) => replay(s, "st10", mode = "complete")(c =>
        eventsStream(c, d)
          .select(concat_ws("|", col("event_id"), col("user_id"),
            col("event_type")).as("r"))
          .select(expr("CAST(conv(substring(md5(CAST(r AS BINARY)), 1, 15)" +
            ", 16, 10) AS BIGINT)").as("h"))
          .agg(count(lit(1)).as("n_rows"),
            sum(col("h").cast("decimal(38,0)")).cast("string")
              .as("checksum"))),
      Some("""
        WITH r AS (
          SELECT concat_ws('|', event_id, user_id, event_type) AS r
          FROM events),
        h AS (
          SELECT CAST(concat('0x', substr(md5(r), 1, 15)) AS BIGINT) AS h
          FROM r)
        SELECT COUNT(*) AS n_rows,
          CAST(SUM(CAST(h AS DECIMAL(38,0))) AS VARCHAR) AS checksum
        FROM h""")),

    // ---- RocksDB state store backend ------------------------------------
    //      the state backend a production stream actually runs at scale:
    //      the default HDFS-backed provider keeps every key in executor
    //      heap (state size is a hard memory ceiling), RocksDB spills
    //      state to local disk with bounded memtables — unbounded key
    //      cardinality at fixed executor memory. The operator code is
    //      UNCHANGED (same windowedCounts as st01); only the per-query
    //      child-session conf flips the provider, and the replay must
    //      produce the identical batch answer — proving state semantics
    //      don't depend on the backend and the engine can switch per job.
    Q("st11_rocksdb_state",
      (s, d) => replay(s, "st11", mode = "complete", confs = Map(
        "spark.sql.streaming.stateStore.providerClass" ->
          "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"))(
        c => EventStreams.windowedCounts(eventsStream(c, d),
          watermarkDelay = unbounded)),
      Some("""
        SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start, event_type,
          COUNT(*) AS n,
          CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        FROM events GROUP BY 1, 2""")),

    // ---- exactly-once across a mid-stream KILL + resume -----------------
    //      the crash-recovery gate: a checkpointed file-sink query over
    //      an 8-file one-file-per-trigger source is STOPPED as soon as
    //      its third micro-batch commits (an in-flight batch aborts:
    //      state uncommitted, sink manifest not advanced, orphan data
    //      files possibly on disk), then a NEW query resumes from the
    //      same checkpoint and drains the rest. The aggregate of what a
    //      downstream batch reader sees (spark.read routes through the
    //      _spark_metadata manifest, which is what excludes orphans)
    //      must equal batch DISTINCT exactly — a duplicate emission
    //      inflates n_pairs over the oracle, a hole deflates it. The
    //      stateful dedup makes the recovery REAL: the resumed query
    //      must restore the seen-pairs state store or it would re-emit
    //      pairs the killed run already wrote. Sink + checkpoint are
    //      wiped at the start of every run so each rep exercises the
    //      kill, not a no-op restart.
    Q("st12_exactly_once_resume",
      (s, d) => {
        val base = scratchRoot.resolve(
          "st12-" + d.replaceAll("[^A-Za-z0-9.]", "_"))
        val out = base.resolve("out").toString
        val ckpt = base.resolve("ckpt").toString
        Seq(base.resolve("out"), base.resolve("ckpt")).foreach { p =>
          if (java.nio.file.Files.exists(p))
            java.nio.file.Files.walk(p)
              .sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
              .forEach(x => java.nio.file.Files.delete(x))
        }
        val child = s.newSession()
        child.conf.set("spark.sql.shuffle.partitions", "8")
        def startRun() = EventStreams.dedupStream(
            child.readStream.schema(Tables.events(s, d).schema)
              .option("maxFilesPerTrigger", "1")
              .parquet(base.resolve("src").toString),
            Seq("user_id", "event_type"), "ts", unbounded)
          .select(col("user_id"), col("event_type"))
          .writeStream.format("parquet")
          .option("path", out).option("checkpointLocation", ckpt)
          .option("compression", "zstd")
          .outputMode("append")
          .trigger(Trigger.AvailableNow()).start()
        // run 1: kill after the third committed batch (8 remain on a
        // slow host, fewer on a fast one; if the replay outruns the
        // 10 ms poll the run degrades to st08's restart case — still a
        // valid pass, the kill path just didn't land this rep)
        val q1 = startRun()
        val deadline = System.currentTimeMillis() + 120000
        while (q1.isActive &&
               (q1.lastProgress == null || q1.lastProgress.batchId < 2) &&
               System.currentTimeMillis() < deadline) Thread.sleep(10)
        q1.stop()
        q1.awaitTermination()
        // run 2: resume from the same checkpoint, drain to completion
        val q2 = startRun()
        try q2.awaitTermination() finally if (q2.isActive) q2.stop()
        s.read.parquet(out)
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_pairs"),
            countDistinct(col("user_id")).as("n_users"))
      },
      Some("""
        SELECT event_type, COUNT(*) AS n_pairs,
          COUNT(DISTINCT user_id) AS n_users
        FROM (SELECT DISTINCT user_id, event_type FROM events)
        GROUP BY event_type"""),
      // the 8-file time-ranged source split is input staging (st09's
      // pattern) — Bench runs it once untimed
      setup = Some((s, d) => Tables.events(s, d)
        .repartitionByRange(8, col("ts"))
        .write.mode("overwrite").option("compression", "zstd")
        .parquet(scratchRoot.resolve(
          "st12-" + d.replaceAll("[^A-Za-z0-9.]", "_"))
          .resolve("src").toString))),

    // ---- watermark late-data accounting (REAL drops, REAL finalization) -
    //      the other st* gates neutralize the watermark (unbounded
    //      delay); this one exercises what it is FOR. Three files arrive
    //      in pinned modification-time order: the first 12 days, then
    //      the rest of the month (advancing the 1-hour watermark to
    //      max(ts)-1h), then a REPLAY of week-one rows — late arrivals a
    //      feed retry would produce. The append-mode windowed aggregate
    //      must (a) drop every replayed row (its window finalized long
    //      ago — no double counting) and (b) emit exactly the windows
    //      the final watermark passed, holding back the still-open tail
    //      hour. The oracle states that contract in batch SQL: hourly
    //      counts over the ORIGINAL events, windows with end <= max(ts)
    //      - 1h only. A dropped-row leak or an early/late emission both
    //      turn the row red.
    Q("st13_late_data_audit",
      (s, d) => {
        val base = scratchRoot.resolve(
          "st13-" + d.replaceAll("[^A-Za-z0-9.]", "_"))
        val child = s.newSession()
        child.conf.set("spark.sql.shuffle.partitions", "8")
        val stream = child.readStream.schema(Tables.events(s, d).schema)
          .option("maxFilesPerTrigger", "1")
          .parquet(base.resolve("src").toString)
        val q = EventStreams.windowedCounts(stream, watermarkDelay = "1 hour")
          .writeStream.format("memory").queryName("st13")
          .outputMode("append").trigger(Trigger.AvailableNow()).start()
        try q.awaitTermination() finally if (q.isActive) q.stop()
        child.table("st13")
      },
      Some("""
        WITH wm AS (SELECT MAX(ts) - INTERVAL 1 HOUR AS w FROM events)
        SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
          event_type, COUNT(*) AS n,
          CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        FROM events, wm
        WHERE time_bucket(INTERVAL '1 hour', ts) + INTERVAL 1 HOUR <= wm.w
        GROUP BY 1, 2"""),
      // the ordered 3-file source (on-time, future, late replay) is
      // input staging — Bench runs it once untimed. Modification times
      // are pinned so the file source's delivery order is deterministic.
      setup = Some((s, d) => {
        val base = scratchRoot.resolve(
          "st13-" + d.replaceAll("[^A-Za-z0-9.]", "_"))
        val src = base.resolve("src")
        if (java.nio.file.Files.exists(base))
          java.nio.file.Files.walk(base)
            .sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
            .forEach(p => java.nio.file.Files.delete(p))
        java.nio.file.Files.createDirectories(src)
        val ev = Tables.events(s, d)
        def writeOne(df: DataFrame, name: String, mtimeMs: Long): Unit = {
          val tmp = base.resolve("tmp_" + name).toString
          df.coalesce(1).write.mode("overwrite")
            .option("compression", "zstd").parquet(tmp)
          val part = java.nio.file.Files.list(java.nio.file.Paths.get(tmp))
            .filter(p => p.getFileName.toString.startsWith("part-"))
            .findFirst().get()
          val dest = src.resolve(name)
          java.nio.file.Files.move(part, dest,
            java.nio.file.StandardCopyOption.REPLACE_EXISTING)
          java.nio.file.Files.setLastModifiedTime(dest,
            java.nio.file.attribute.FileTime.fromMillis(mtimeMs))
        }
        val cut = lit("2024-01-13").cast("timestamp")
        val lateCut = lit("2024-01-04").cast("timestamp")
        writeOne(ev.filter(col("ts") < cut), "f1.parquet", 1700000000000L)
        writeOne(ev.filter(col("ts") >= cut), "f2.parquet", 1700000010000L)
        writeOne(ev.filter(col("ts") < lateCut), "f3.parquet", 1700000020000L)
      })),

    // ---- incremental materialized view via foreachBatch MERGE -----------
    //      the durable-table twin of the complete-mode aggregates: a
    //      per-user purchase rollup maintained OUTSIDE the state store,
    //      as versioned parquet a downstream batch reader can query
    //      mid-stream. Each micro-batch aggregates its own rows (8
    //      time-ranged files -> 8 real batches), then merges into the
    //      previous version by key — union + keyed re-aggregation, the
    //      engine-agnostic MERGE. Spend rides in DECIMAL(38,2) so the
    //      8-level merge tree is exact and order-free: the final table
    //      must equal the one-shot batch rollup hash-for-hash however
    //      the stream was batched. Versioned dirs keep each merge's
    //      input immutable (v_{n-1} read, v_n written) — the pattern's
    //      scale story is that per-batch cost is |batch keys| + |table|,
    //      with the table itself never passing through the driver.
    Q("st14_incremental_mv",
      (s, d) => {
        val base = scratchRoot.resolve(
          "st14-" + d.replaceAll("[^A-Za-z0-9.]", "_"))
        val stateDir = base.resolve("state")
        val ckpt = base.resolve("ckpt")
        Seq(stateDir, ckpt).foreach { p =>
          if (java.nio.file.Files.exists(p))
            java.nio.file.Files.walk(p)
              .sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
              .forEach(x => java.nio.file.Files.delete(x))
        }
        val child = s.newSession()
        child.conf.set("spark.sql.shuffle.partitions", "8")
        val q = child.readStream.schema(Tables.events(s, d).schema)
          .option("maxFilesPerTrigger", "1")
          .parquet(base.resolve("src").toString)
          .writeStream
          .option("checkpointLocation", ckpt.toString)
          .foreachBatch { (batch: DataFrame, batchId: Long) =>
            val inc = batch.filter(col("event_type") === "purchase")
              .groupBy(col("user_id"))
              .agg(count(lit(1)).as("n_purchases"),
                sum(col("value").cast("decimal(18,2)"))
                  .cast("decimal(38,2)").as("spend"))
            val prev = stateDir.resolve(s"v${batchId - 1}")
            val merged =
              if (java.nio.file.Files.exists(prev))
                batch.sparkSession.read.parquet(prev.toString)
                  .unionByName(inc)
                  .groupBy(col("user_id"))
                  .agg(sum(col("n_purchases")).as("n_purchases"),
                    sum(col("spend")).cast("decimal(38,2)").as("spend"))
              else inc
            merged.write.mode("overwrite").option("compression", "zstd")
              .parquet(stateDir.resolve(s"v$batchId").toString)
            // retention: drop versions >= 3 batches behind — without
            // this the MV keeps one full table copy per micro-batch
            // forever; keep=3 leaves any reader that resolved the
            // latest version two further batches to finish its scan
            // (see VersionedState for the contract + spec)
            graft.streaming.VersionedState.vacuum(stateDir, batchId, keep = 3)
            ()
          }
          .trigger(Trigger.AvailableNow()).start()
        try q.awaitTermination() finally if (q.isActive) q.stop()
        val last = graft.streaming.VersionedState.latestVersion(stateDir).get
        s.read.parquet(stateDir.resolve(s"v$last").toString)
          .select(col("user_id"), col("n_purchases"),
            col("spend").cast("double").as("total_spend"))
      },
      Some("""
        SELECT user_id, COUNT(*) AS n_purchases,
          CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_spend
        FROM events WHERE event_type = 'purchase'
        GROUP BY user_id"""),
      // the 8-file time-ranged source split is input staging (st09's
      // pattern) — Bench runs it once untimed
      setup = Some((s, d) => Tables.events(s, d)
        .repartitionByRange(8, col("ts"))
        .write.mode("overwrite").option("compression", "zstd")
        .parquet(scratchRoot.resolve(
          "st14-" + d.replaceAll("[^A-Za-z0-9.]", "_"))
          .resolve("src").toString))),

    // ---- LEFT OUTER stream-stream join (watermark-driven null rows) -----
    //      st04's outer twin, and the semantically hard part of outer
    //      stream joins: the null-padded row for an unmatched purchase
    //      is emitted ONLY when the global watermark (the MIN of the
    //      purchase-side and click-side watermarks) evicts its state.
    //      Matched rows emit in the batch where both sides meet; the
    //      unmatched tail whose purchase_ts the final watermark never
    //      passes stays in state UNEMITTED — the st13 withheld-tail
    //      honesty, extended from aggregates to join state, and the
    //      oracle models exactly that cut:
    //        emit iff matched OR p.ts < min(maxP, maxC) - 1 hour.
    //      The staged source is two time-ranged files plus one EMPTY
    //      trailing file: the empty batch carries the watermark update
    //      derived from f2's data, so eviction runs inside a real
    //      batch (AvailableNow does not reliably run a trailing
    //      no-data batch). A far-future-sentinel design was tried and
    //      rejected: any output filter that would hide the sentinels
    //      gets PUSHED DOWN through the join into the scans and kills
    //      them before the watermark node ever sees their event time.
    Q("st15_stream_outer_join",
      (s, d) => {
        val base = scratchRoot.resolve(
          "st15-" + d.replaceAll("[^A-Za-z0-9.]", "_"))
        val child = s.newSession()
        child.conf.set("spark.sql.shuffle.partitions", "8")
        val stream = child.readStream.schema(Tables.events(s, d).schema)
          .option("maxFilesPerTrigger", "1")
          .parquet(base.resolve("src").toString)
        val clicks = stream.filter(col("event_type") === "click")
          .select(col("user_id").as("c_user"), col("ts").as("click_ts"),
            col("event_id").as("click_id"))
        val purchases = stream.filter(col("event_type") === "purchase")
          .select(col("user_id").as("c_user"), col("ts").as("purchase_ts"),
            col("event_id").as("purchase_id"))
        val joined = EventStreams.streamStreamJoin(purchases, clicks,
          "c_user", "purchase_ts", "click_ts", windowSec = 3600,
          watermarkDelay = "1 hour", joinType = "leftOuter")
          .select(col("c_user").as("user_id"), col("purchase_id"),
            col("click_id"))
        val q = joined.writeStream.format("memory").queryName("st15")
          .outputMode("append").trigger(Trigger.AvailableNow()).start()
        try q.awaitTermination() finally if (q.isActive) q.stop()
        child.table("st15")
      },
      Some("""
        WITH wm AS (
          SELECT LEAST(
              (SELECT MAX(ts) FROM events WHERE event_type = 'purchase'),
              (SELECT MAX(ts) FROM events WHERE event_type = 'click'))
            - INTERVAL 1 HOUR AS w)
        SELECT p.user_id, p.event_id AS purchase_id, c.event_id AS click_id
        FROM events p LEFT JOIN events c
          ON p.user_id = c.user_id AND c.event_type = 'click'
          AND c.ts >= p.ts - INTERVAL 1 HOUR AND c.ts <= p.ts
        WHERE p.event_type = 'purchase'
          AND (c.event_id IS NOT NULL OR p.ts < (SELECT w FROM wm))"""),
      setup = Some((s, d) => {
        val base = scratchRoot.resolve(
          "st15-" + d.replaceAll("[^A-Za-z0-9.]", "_"))
        val src = base.resolve("src")
        if (java.nio.file.Files.exists(base))
          java.nio.file.Files.walk(base)
            .sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
            .forEach(p => java.nio.file.Files.delete(p))
        java.nio.file.Files.createDirectories(src)
        val ev = Tables.events(s, d)
        def writeOne(df: DataFrame, name: String, mtimeMs: Long): Unit = {
          val tmp = base.resolve("tmp_" + name).toString
          df.coalesce(1).write.mode("overwrite")
            .option("compression", "zstd").parquet(tmp)
          val part = java.nio.file.Files.list(java.nio.file.Paths.get(tmp))
            .filter(p => p.getFileName.toString.startsWith("part-"))
            .findFirst().get()
          val dest = src.resolve(name)
          java.nio.file.Files.move(part, dest,
            java.nio.file.StandardCopyOption.REPLACE_EXISTING)
          java.nio.file.Files.setLastModifiedTime(dest,
            java.nio.file.attribute.FileTime.fromMillis(mtimeMs))
        }
        val cut = lit("2024-01-13").cast("timestamp")
        writeOne(ev.filter(col("ts") < cut), "f1.parquet", 1700000000000L)
        writeOne(ev.filter(col("ts") >= cut), "f2.parquet", 1700000010000L)
        // empty trailing file: a schema-only batch whose only job is to
        // carry the f2-derived watermark update into a real batch
        writeOne(ev.filter(lit(false)), "f3.parquet", 1700000020000L)
      })),

    // ---- streaming novelty filter against the historical corpus --------
    //      the ingestion-dedup loop that ties the st and d families
    //      together: "admit only what the lake has never seen". History =
    //      all events before the midpoint of the fixture's time range
    //      (cut computed in exact integer MICROseconds — both engines
    //      replay the same floor-divided epoch arithmetic); arrivals =
    //      the stream filtered to ts >= cut; novelty key = (user_id,
    //      props) — the content identity (fixture: 3770 of 5171 arrivals
    //      novel at sf0.01, so both branches fire). The plan is the
    //      production shape end to end — the textbook anti-join bloom
    //      split: the historical key set is compressed into a KB-scale
    //      bloom literal evaluated INSIDE the stream's per-batch scan;
    //      rows the bloom has NEVER seen are DEFINITELY novel (no false
    //      negatives) and bypass the join entirely, while only the
    //      maybe-seen minority reaches the stream-static LEFT ANTI join
    //      that makes the exact call (catching the ~fpp false
    //      positives). Note the direction: `bloomPreFilter` (keep
    //      probable matches) composes with SEMI joins; an ANTI join
    //      needs this keep-both-paths split or it drops exactly the
    //      novel traffic it exists to admit. Nothing stateful grows
    //      with stream history (the history frame is static, re-planned
    //      per micro-batch); stateless append mode, no watermark.
    Q("st16_stream_novelty_filter",
      (s, d) => {
        val ev = Tables.events(s, d)
        val Array(mn, mx) = ev
          .agg(min(unix_micros(col("ts"))), max(unix_micros(col("ts"))))
          .head().toSeq.map(_.asInstanceOf[Long]).toArray
        val cut = mn + (mx - mn) / 2
        replay(s, "st16", mode = "append") { c =>
          graft.expressions.VectorExpressions.registerAll(c)
          val hist = Tables.events(c, d)
            .filter(unix_micros(col("ts")) < cut)
            .select(col("user_id"), col("props")).distinct()
          val bloomBytes = hist
            .agg(call_function("bloom_agg",
              xxhash64(col("user_id"), col("props")),
              lit(1000000L), lit(0.01)).as("bf"))
            .head().getAs[Array[Byte]](0)
          val seen = call_function("bloom_contains", lit(bloomBytes),
            xxhash64(col("user_id"), col("props")))
          val arrivals = eventsStream(c, d)
            .filter(unix_micros(col("ts")) >= cut)
          val out = Seq(
            arrivals.filter(!seen),
            arrivals.filter(seen)
              .join(hist, Seq("user_id", "props"), "left_anti"))
            .map(_.select(col("event_id"), col("user_id"),
              col("event_type"), col("props")))
          out.head.unionByName(out.last)
        }
      },
      Some("""
        WITH c AS (SELECT epoch_us(MIN(ts))
                     + (epoch_us(MAX(ts)) - epoch_us(MIN(ts))) // 2 AS cut
                   FROM events),
        h AS (SELECT DISTINCT user_id, props FROM events
              WHERE epoch_us(ts) < (SELECT cut FROM c))
        SELECT e.event_id, e.user_id, e.event_type, e.props
        FROM events e
        WHERE epoch_us(e.ts) >= (SELECT cut FROM c)
          AND NOT EXISTS (SELECT 1 FROM h
            WHERE h.user_id = e.user_id AND h.props = e.props)"""))
  ,

    // ---- streaming as-of enrichment -------------------------------------
    //      e24's as-of join as a LIVE state machine: clicks and purchases
    //      interleave on one stream; per-user state is the latest click
    //      (one (ts, value) pair — the as-of merge's O(1) state in the
    //      state store), each purchase emits its enrichment on arrival.
    //      The replay is 8 TIME-RANGED files delivered one per trigger in
    //      ascending order (the setup writes slices SEQUENTIALLY because
    //      FileStreamSource orders by modification time — st09's
    //      simultaneous range write is fine for its commutative agg but
    //      would be an ordering bug here), so state genuinely crosses
    //      batches and the result equals the batch ASOF JOIN — the SAME
    //      DuckDB oracle as e24/e25, now pinning the streaming plan too.
    Q("st17_stream_asof",
      (s, d) => runAsOfGate(s, d, "st17") { (input, late) =>
        graft.streaming.EventStreams.asOfEnrichStream(input,
          lateArrivals = Some(late)).toDF()
      },
      Some("""
        SELECT p.event_id, p.user_id, p.ts,
          c.ts AS asof_ts, c.value AS asof_value
        FROM (SELECT event_id, user_id, ts FROM events
              WHERE event_type = 'purchase') p
        ASOF JOIN (SELECT user_id, ts, value FROM events
                   WHERE event_type = 'click') c
          ON p.user_id = c.user_id AND p.ts >= c.ts"""),
      // time-ranged slices written ONE AT A TIME with strictly
      // increasing mtimes — delivery order IS time order
      setup = Some((s, d) => writeTimeSlices(s, d, "st17"))),

    // ---- FORWARD streaming as-of enrichment ------------------------------
    //      st17's direction mirror and e27's streaming twin: each
    //      purchase enriched with the user's EARLIEST click at-or-AFTER
    //      it. Where backward holds one reference per key and emits on
    //      fact arrival, forward must WAIT — facts buffer in the state
    //      store until the next reference arrives (pending list bounded
    //      by the key's ref inter-arrival gap), which is why this is a
    //      distinct state machine and not a parameter flip. Facts whose
    //      reference never arrives stay pending through stream end —
    //      exactly the batch inner drop, so the bounded replay shares
    //      e27's DuckDB oracle (reversed inequality) across real
    //      micro-batch boundaries. Same late-arrival signal as st17.
    Q("st18_stream_asof_fwd",
      (s, d) => runAsOfGate(s, d, "st18") { (input, late) =>
        graft.streaming.EventStreams.asOfEnrichStreamForward(input,
          lateArrivals = Some(late)).toDF()
      },
      Some("""
        SELECT p.event_id, p.user_id, p.ts,
          c.ts AS asof_ts, c.value AS asof_value
        FROM (SELECT event_id, user_id, ts FROM events
              WHERE event_type = 'purchase') p
        ASOF JOIN (SELECT user_id, ts, value FROM events
                   WHERE event_type = 'click') c
          ON p.user_id = c.user_id AND p.ts <= c.ts"""),
      setup = Some((s, d) => writeTimeSlices(s, d, "st18"))),

    // ---- streaming PSI drift monitor (w15's live twin) -------------------
    //      the curation-ops loop closed on a stream: the REFERENCE
    //      histogram (first time-half) is batch metadata; the LIVE
    //      half's (type, bin) counts aggregate INCREMENTALLY in the
    //      state store (complete mode — the monitor's running totals),
    //      and the PSI arithmetic runs over the two tiny histograms
    //      (types × 10 bins — KBs at any stream rate). Same +1/+10
    //      Laplace smoothing, same 1e9-quantized single ln as w15, and
    //      the SAME w15 oracle: stream-counted PSI must equal the
    //      batch-computed PSI value-for-value.
    Q("st23_stream_psi",
      (s, d) => {
        import s.implicits._
        val ev = Tables.events(s, d).select(col("event_type"),
          col("value"), unix_micros(col("ts")).as("us"))
        val mm = ev.agg(min(col("us")), max(col("us"))).head()
        val cut = mm.getLong(0) + (mm.getLong(1) - mm.getLong(0)) / 2
        val bin = expr("least(CAST(floor(value / 50.0D) AS BIGINT), 9L)")
        val ref = ev.filter(col("us") < cut)
          .select(col("event_type"), bin.as("bin"))
          .groupBy("event_type", "bin").agg(count(lit(1)).as("n1"))
        val live = replay(s, "st23", mode = "complete")(c =>
          eventsStream(c, d)
            .filter(unix_micros(col("ts")) >= cut)
            .select(col("event_type"), bin.as("bin"))
            .groupBy(col("event_type"), col("bin"))
            .agg(count(lit(1)).as("n2")))
        val t1s = ref.groupBy("event_type").agg(sum(col("n1")).as("t1"))
        val t2s = live.groupBy("event_type").agg(sum(col("n2")).as("t2"))
        val grid = ref.select("event_type")
          .union(live.select("event_type")).distinct()
          .crossJoin((0L to 9L).toDF("bin"))
        grid
          .join(ref, Seq("event_type", "bin"), "left")
          .join(live, Seq("event_type", "bin"), "left")
          .join(broadcast(t1s), "event_type")
          .join(broadcast(t2s), "event_type")
          .select(col("event_type"), col("t1"), col("t2"),
            expr("""CAST(FLOOR(
              ((coalesce(n1, 0L) + 1) / CAST(t1 + 10 AS DOUBLE)
                - (coalesce(n2, 0L) + 1) / CAST(t2 + 10 AS DOUBLE))
              * ln(((coalesce(n1, 0L) + 1) / CAST(t1 + 10 AS DOUBLE))
                / ((coalesce(n2, 0L) + 1) / CAST(t2 + 10 AS DOUBLE)))
              * 1000000000D + 0.5D) AS BIGINT)""").as("term_q9"))
          .groupBy(col("event_type"))
          .agg(first(col("t1")).as("n_first"),
            first(col("t2")).as("n_second"),
            sum(col("term_q9")).as("psi_q9"))
      },
      Some("""
        WITH ev AS (SELECT event_type, value, epoch_us(ts) AS us
                    FROM events),
        c AS (SELECT MIN(us) + (MAX(us) - MIN(us)) // 2 AS cut FROM ev),
        b AS (SELECT event_type,
                LEAST(CAST(FLOOR(value / 50.0) AS BIGINT), 9) AS bin,
                us < (SELECT cut FROM c) AS h1
              FROM ev),
        cnt AS (SELECT event_type, bin, h1, COUNT(*) AS n
                FROM b GROUP BY 1, 2, 3),
        tot AS (SELECT event_type, h1, COUNT(*) AS tot
                FROM b GROUP BY 1, 2),
        grid AS (SELECT DISTINCT event_type, g.bin
                 FROM b CROSS JOIN (SELECT unnest(range(0, 10)) AS bin) g),
        g2 AS (SELECT grid.event_type, t1.tot AS t1, t2.tot AS t2,
                 CAST(FLOOR(
                   ((COALESCE(c1.n, 0) + 1) / CAST(t1.tot + 10 AS DOUBLE)
                     - (COALESCE(c2.n, 0) + 1) / CAST(t2.tot + 10 AS DOUBLE))
                   * ln(((COALESCE(c1.n, 0) + 1)
                       / CAST(t1.tot + 10 AS DOUBLE))
                     / ((COALESCE(c2.n, 0) + 1)
                       / CAST(t2.tot + 10 AS DOUBLE)))
                   * 1e9 + 0.5) AS BIGINT) AS term_q9
               FROM grid
               LEFT JOIN cnt c1 ON c1.event_type = grid.event_type
                 AND c1.bin = grid.bin AND c1.h1
               LEFT JOIN cnt c2 ON c2.event_type = grid.event_type
                 AND c2.bin = grid.bin AND NOT c2.h1
               JOIN tot t1 ON t1.event_type = grid.event_type AND t1.h1
               JOIN tot t2 ON t2.event_type = grid.event_type AND NOT t2.h1)
        SELECT event_type, CAST(ANY_VALUE(t1) AS BIGINT) AS n_first,
          CAST(ANY_VALUE(t2) AS BIGINT) AS n_second,
          CAST(SUM(term_q9) AS BIGINT) AS psi_q9
        FROM g2 GROUP BY event_type""")),

    // ---- LEFT OUTER streaming as-of (backward) ---------------------------
    //      e26's streaming twin: every purchase emits on arrival —
    //      enriched when a prior click exists, None-padded otherwise.
    //      Outer is STREAMABLE only backward: a backward match can never
    //      be improved by future data (later refs are later in time), so
    //      the pad decision on arrival is final — exactly the batch ASOF
    //      LEFT row. (Forward outer would need watermark-timeout
    //      eviction to know no reference is coming; documented on the
    //      operator.) Shares e26's DuckDB oracle.
    Q("st19_stream_asof_left",
      (s, d) => runAsOfGate(s, d, "st19") { (input, late) =>
        graft.streaming.EventStreams.asOfEnrichStreamOuter(input,
          lateArrivals = Some(late)).toDF()
      },
      Some("""
        SELECT p.event_id, p.user_id, p.ts,
          c.ts AS asof_ts, c.value AS asof_value
        FROM (SELECT event_id, user_id, ts FROM events
              WHERE event_type = 'purchase') p
        ASOF LEFT JOIN (SELECT user_id, ts, value FROM events
                        WHERE event_type = 'click') c
          ON p.user_id = c.user_id AND p.ts >= c.ts"""),
      setup = Some((s, d) => writeTimeSlices(s, d, "st19"))),

    // ---- tolerance-bounded streaming as-of, both directions --------------
    //      e30/e31's staleness cap in the live machines: ONE extra
    //      comparison against the per-key O(1) state (backward) or at
    //      pending-fact release (forward — where a staler-than-bound
    //      first reference is a FINAL no-match: no later ref can be
    //      closer, so the fact leaves pending without emitting, exactly
    //      the batch inner drop). st20 shares e30's oracle; st21 is
    //      e27's oracle with the mirrored staleness predicate.
    Q("st20_stream_asof_tol",
      (s, d) => runAsOfGate(s, d, "st20") { (input, late) =>
        graft.streaming.EventStreams.asOfEnrichStream(input,
          lateArrivals = Some(late), tolerance = Some(600000000L)).toDF()
      },
      Some("""
        SELECT p.event_id, p.user_id, p.ts,
          c.ts AS asof_ts, c.value AS asof_value
        FROM (SELECT event_id, user_id, ts FROM events
              WHERE event_type = 'purchase') p
        ASOF JOIN (SELECT user_id, ts, value FROM events
                   WHERE event_type = 'click') c
          ON p.user_id = c.user_id AND p.ts >= c.ts
        WHERE epoch_us(p.ts) - epoch_us(c.ts) <= 600000000"""),
      setup = Some((s, d) => writeTimeSlices(s, d, "st20"))),

    //      st21 runs the BOUNDED forward machine (round 15): with a
    //      finite tolerance the event-time timeout can retire each
    //      pending fact at its tolerance horizon — state capped at
    //      fact-rate x (tolerance + delay) instead of growing on silent
    //      keys — and under inner semantics eviction emits NOTHING, so
    //      the output (and e27+staleness oracle) is bit-identical to the
    //      unbounded machine's.
    Q("st21_stream_asof_fwd_tol",
      (s, d) => runAsOfGate(s, d, "st21") { (input, late) =>
        graft.streaming.EventStreams.asOfEnrichStreamForward(input,
          lateArrivals = Some(late), tolerance = Some(600000000L),
          watermarkDelay = Some("10 seconds")).toDF()
      },
      Some("""
        SELECT p.event_id, p.user_id, p.ts,
          c.ts AS asof_ts, c.value AS asof_value
        FROM (SELECT event_id, user_id, ts FROM events
              WHERE event_type = 'purchase') p
        ASOF JOIN (SELECT user_id, ts, value FROM events
                   WHERE event_type = 'click') c
          ON p.user_id = c.user_id AND p.ts <= c.ts
        WHERE epoch_us(c.ts) - epoch_us(p.ts) <= 600000000"""),
      setup = Some((s, d) => writeTimeSlices(s, d, "st21"))),

    // ---- FORWARD LEFT OUTER streaming as-of: the LAST matrix cell -------
    //      st19's scaladoc named the hole: a forward outer must know "no
    //      reference is coming" before it pads, which pad-on-arrival
    //      cannot. Closed by watermark-timeout eviction: with a finite
    //      tolerance, once the watermark passes a fact's horizon
    //      (fact_ts + tolerance), any on-time reference still to arrive
    //      is provably staler than the bound — padding is FINAL and
    //      batch-exact. The oracle is e31's CASE-padded form with the
    //      inequality reversed, plus the replay-end cut the watermark
    //      semantics define (st15's withheld-tail convention): a
    //      never-referenced fact whose horizon the FINAL watermark
    //      (max event ms - delay) never passes stays in state unemitted,
    //      so the oracle withholds exactly those rows — in the same
    //      floor-to-millisecond arithmetic Spark's watermark uses.
    //      Completes the direction x shape matrix live: st17/st19
    //      backward inner/outer, st18 forward inner, st24 forward outer
    //      (st20/st21 the tolerance twins).
    Q("st24_stream_asof_fwd_left",
      (s, d) => runAsOfGate(s, d, "st24") { (input, late) =>
        graft.streaming.EventStreams.asOfEnrichStreamForwardOuter(input,
          lateArrivals = Some(late), tolerance = 600000000L,
          watermarkDelay = "10 seconds").toDF()
      },
      Some("""
        WITH src AS (SELECT event_id, user_id, ts, event_type, value,
                       epoch_us(ts) AS us
                     FROM events
                     WHERE event_type IN ('purchase', 'click')),
        wm AS (SELECT MAX(us) // 1000 - 10000 AS wm_ms FROM src),
        p AS (SELECT event_id, user_id, ts, us FROM src
              WHERE event_type = 'purchase'),
        c AS (SELECT user_id, ts, value FROM src
              WHERE event_type = 'click')
        SELECT p.event_id, p.user_id, p.ts,
          CASE WHEN c.ts IS NOT NULL
                 AND epoch_us(c.ts) - p.us <= 600000000
               THEN c.ts END AS asof_ts,
          CASE WHEN c.ts IS NOT NULL
                 AND epoch_us(c.ts) - p.us <= 600000000
               THEN c.value END AS asof_value
        FROM p ASOF LEFT JOIN c
          ON p.user_id = c.user_id AND p.ts <= c.ts
        WHERE NOT (c.ts IS NULL
          AND (p.us + 600000000) // 1000 >= (SELECT wm_ms FROM wm))"""),
      setup = Some((s, d) => writeTimeSlices(s, d, "st24"))),

    // ---- STATELESS streaming as-of: stream facts x STATIC dim history ----
    //      the enrichment shape most production streams actually run
    //      (facts stream in, the rate/config/quote history is a TABLE):
    //      JoinOps.asOfJoinBroadcast composes into a stream-static
    //      broadcast join + a per-row codegen'd probe — NO state store,
    //      no watermark, no ordering requirement on the stream (each
    //      fact row sees the FULL static history, so batch-equality is
    //      structural, not a state-machine invariant like st17-st24's).
    //      8 slices, one file per trigger, proves multi-batch; e24's
    //      DuckDB ASOF oracle verbatim.
    Q("st25_stream_asof_static",
      (s, d) => {
        val base = scratchRoot.resolve(
          "st25-" + d.replaceAll("[^A-Za-z0-9.]", "_")).toString
        val child = s.newSession()
        child.conf.set("spark.sql.shuffle.partitions", "8")
        val stream = child.readStream
          .schema(Tables.events(s, d).schema)
          .option("maxFilesPerTrigger", "1")
          .parquet(base)
          .filter(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"), col("ts"))
        val clicks = Tables.events(child, d)
          .filter(col("event_type") === "click")
          .select(col("user_id"), col("ts"), col("value"))
        val out = graft.operators.JoinOps.asOfJoinBroadcast(
          stream, clicks, leftKey = "user_id", rightKey = "user_id",
          leftTime = "ts", rightTime = "ts",
          rightVals = Seq("ts", "value"))
        val q = out.writeStream.format("memory").queryName("st25")
          .outputMode("append")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        try q.awaitTermination() finally if (q.isActive) q.stop()
        child.table("st25")
      },
      Some("""
        SELECT p.event_id, p.user_id, p.ts,
          c.ts AS asof_ts, c.value AS asof_value
        FROM (SELECT event_id, user_id, ts FROM events
              WHERE event_type = 'purchase') p
        ASOF JOIN (SELECT user_id, ts, value FROM events
                   WHERE event_type = 'click') c
          ON p.user_id = c.user_id AND p.ts >= c.ts"""),
      setup = Some((s, d) => writeTimeSlices(s, d, "st25"))),

    // ---- STRICT streaming as-of, both directions (round 16) --------------
    //      e41's tie-excluding comparators in the live machines, keeping
    //      batch and stream dialect-symmetric. Backward strict needs real
    //      state machinery (the key's state carries the second-latest
    //      distinct-time reference, because a fact TIED with the held
    //      reference's time must match the strictly-earlier one the tie
    //      overwrote); forward strict is one comparison flip — a
    //      same-time reference no longer resolves a pending fact, which
    //      keeps waiting for a strictly-later one. Oracles are the
    //      strict-comparator DuckDB ASOF forms, same replay harness and
    //      zero-late-arrival discipline as st17/st18.
    Q("st26_stream_asof_strict",
      (s, d) => runAsOfGate(s, d, "st26") { (input, late) =>
        graft.streaming.EventStreams.asOfEnrichStream(input,
          lateArrivals = Some(late), strict = true).toDF()
      },
      Some("""
        SELECT p.event_id, p.user_id, p.ts,
          c.ts AS asof_ts, c.value AS asof_value
        FROM (SELECT event_id, user_id, ts FROM events
              WHERE event_type = 'purchase') p
        ASOF JOIN (SELECT user_id, ts, value FROM events
                   WHERE event_type = 'click') c
          ON p.user_id = c.user_id AND p.ts > c.ts"""),
      setup = Some((s, d) => writeTimeSlices(s, d, "st26"))),

    Q("st27_stream_asof_fwd_strict",
      (s, d) => runAsOfGate(s, d, "st27") { (input, late) =>
        graft.streaming.EventStreams.asOfEnrichStreamForward(input,
          lateArrivals = Some(late), strict = true).toDF()
      },
      Some("""
        SELECT p.event_id, p.user_id, p.ts,
          c.ts AS asof_ts, c.value AS asof_value
        FROM (SELECT event_id, user_id, ts FROM events
              WHERE event_type = 'purchase') p
        ASOF JOIN (SELECT user_id, ts, value FROM events
                   WHERE event_type = 'click') c
          ON p.user_id = c.user_id AND p.ts < c.ts"""),
      setup = Some((s, d) => writeTimeSlices(s, d, "st27")))
  )

  /** shared harness for the streaming as-of gates: read the gate's
    * time-sliced source one file per trigger in a child session, run the
    * machine to completion with a late-arrival accumulator, require ZERO
    * late arrivals (the mtime discipline's runtime check — failing loud
    * beats a silent non-batch-equal diff), hand back the memory sink. */
  private def runAsOfGate(s: SparkSession, d: String, tag: String)(
      build: (org.apache.spark.sql.Dataset[
          graft.streaming.EventStreams.AsOfInput],
        org.apache.spark.util.LongAccumulator) => DataFrame): DataFrame = {
    val base = scratchRoot.resolve(
      tag + "-" + d.replaceAll("[^A-Za-z0-9.]", "_")).toString
    val child = s.newSession()
    child.conf.set("spark.sql.shuffle.partitions", "8")
    import child.implicits._
    val input = child.readStream
      .schema(Tables.events(s, d).schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(base)
      .filter(col("event_type").isin("purchase", "click"))
      .select(col("event_id"), col("user_id"), col("ts"),
        (col("event_type") === "purchase").as("is_purchase"),
        col("value"))
      .as[graft.streaming.EventStreams.AsOfInput]
    val late = child.sparkContext.longAccumulator(tag + "_late")
    val q = build(input, late)
      .writeStream.format("memory").queryName(tag)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    try q.awaitTermination() finally if (q.isActive) q.stop()
    require(late.value == 0L,
      s"$tag: ${late.value} late arrivals — slice delivery out of order")
    child.table(tag)
  }

  /** 8 time-ranged slices of the purchase/click stream written ONE AT A
    * TIME with strictly increasing EXPLICIT mtimes: FileStreamSource
    * orders by mtime, and on coarse-granularity filesystems two
    * sequential writes can share a stamp and deliver out of order — so
    * each slice's part-files are stamped (mtimeBase + slice second)
    * after writing; delivery order is time order by construction, not
    * by race. Shared by the st17 (backward) and st18 (forward) gates. */
  private def writeTimeSlices(s: SparkSession, d: String,
                              tag: String): Unit = {
    val dir = scratchRoot.resolve(
      tag + "-" + d.replaceAll("[^A-Za-z0-9.]", "_")).toString
    val ev = Tables.events(s, d)
      .filter(col("event_type").isin("purchase", "click"))
      .withColumn("_sec", unix_micros(col("ts")))
      // cache lifecycle: scoped to this call — unpersisted below
      .persist()
    val Array(lo, hi) = ev.agg(min(col("_sec")), max(col("_sec")))
      .head().toSeq.map(_.asInstanceOf[Long]).toArray
    val w = math.max(1L, (hi - lo) / 8 + 1)
    val mtimeBase = System.currentTimeMillis()
    val seen = scala.collection.mutable.Set[String]()
    for (i <- 0 until 8) {
      ev.filter(col("_sec") >= lo + i * w &&
          col("_sec") < lo + (i + 1) * w)
        .drop("_sec").coalesce(1)
        .write.mode(if (i == 0) "overwrite" else "append")
        .option("compression", "zstd").parquet(dir)
      new java.io.File(dir).listFiles()
        .filter(f => f.getName.startsWith("part-") &&
          !seen.contains(f.getName))
        .foreach { f =>
          f.setLastModified(mtimeBase + (i + 1) * 1000L)
          seen += f.getName
        }
    }
    ev.unpersist()
  }
}
