package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Join operators beyond the built-in surface: backward as-of join and a
  * salted equi-join for skewed keys.
  *
  * Both are compositions of stock Catalyst operators, chosen for their
  * scale shape: the as-of join is ONE shuffle of the unioned inputs plus
  * a keyed window (no time-range cross product, no per-row probing); the
  * salted join trades k-fold duplication of the build side for breaking
  * a hot key across k reducers.
  */
object JoinOps {

  /** Backward as-of join: for each left row, the most recent right row
    * with rightTime <= leftTime on the same key. Inner semantics by
    * default (left rows with no prior right row are dropped);
    * `leftOuter = true` retains them with null `asof_*` columns — the
    * ASOF LEFT JOIN shape, including SQL LEFT JOIN null-key behavior: a
    * NULL key/time never matches but the left row itself survives.
    *
    * Implementation: tag and union both inputs, then per-key
    * last-non-null over the merged time order — right rows sort before
    * left rows at equal timestamps so "<=" is inclusive. Cost is a
    * single hash shuffle on the key + an in-partition sort: O((L+R) log)
    * per key, independent of time-range density — the shape that
    * survives 100 TB where an inequality-join range explosion would not.
    *
    * `rightVals` are the right-side columns to carry; they appear
    * prefixed with `asof_`. */
  def asOfJoinBackward(left: DataFrame, right: DataFrame,
                       leftKey: String, rightKey: String,
                       leftTime: String, rightTime: String,
                       rightVals: Seq[String],
                       leftOuter: Boolean = false,
                       tolerance: Option[Long] = None): DataFrame =
    asOfJoinComposed(left, right, leftKey, rightKey, leftTime, rightTime,
      rightVals, leftOuter, forward = false, tolerance)

  /** Forward as-of join: for each left row, the EARLIEST right row with
    * rightTime >= leftTime on the same key (pandas merge_asof
    * direction='forward' — "the next event after this one": next quote
    * after an order, next maintenance slot after a failure). The exact
    * time-mirror of [[asOfJoinBackward]]: the merged window scans time
    * DESCENDING so last-non-null picks the nearest FUTURE right row;
    * everything else (null semantics, leftOuter, cost shape) is
    * identical. */
  def asOfJoinForward(left: DataFrame, right: DataFrame,
                      leftKey: String, rightKey: String,
                      leftTime: String, rightTime: String,
                      rightVals: Seq[String],
                      leftOuter: Boolean = false,
                      tolerance: Option[Long] = None): DataFrame =
    asOfJoinComposed(left, right, leftKey, rightKey, leftTime, rightTime,
      rightVals, leftOuter, forward = true, tolerance)

  /** a time column as a raw long in its own units (micros for
    * timestamps) — the units `tolerance` is stated in */
  private def timeAsLong(c: Column,
                         dt: org.apache.spark.sql.types.DataType): Column =
    dt match {
      case org.apache.spark.sql.types.TimestampType => unix_micros(c)
      case _ => c.cast("long")
    }

  private def asOfJoinComposed(left: DataFrame, right: DataFrame,
                               leftKey: String, rightKey: String,
                               leftTime: String, rightTime: String,
                               rightVals: Seq[String],
                               leftOuter: Boolean,
                               forward: Boolean,
                               tolerance: Option[Long] = None): DataFrame = {
    val leftCols = left.columns.toSeq
    require(tolerance.isEmpty || !rightVals.contains("_mt"),
      "rightVals may not contain the reserved name _mt when tolerance is set")
    // the right payload travels as ONE nullable struct: null on left rows,
    // non-null on every right row (even when individual fields are null),
    // so one last(ignoreNulls) both finds the match and keeps its fields
    // atomic — per-column fills could tear values from different rows.
    // With a tolerance, the match's own time rides INSIDE the struct
    // (field _mt) so the staleness check reads the time of the exact row
    // last() picked — a separate column could tear.
    val mtCols: Seq[Column] = if (tolerance.isDefined)
      Seq(timeAsLong(col(rightTime), right.schema(rightTime).dataType)
        .as("_mt"))
    else Nil
    val mtFields: Seq[org.apache.spark.sql.types.StructField] =
      if (tolerance.isDefined)
        Seq(org.apache.spark.sql.types.StructField("_mt",
          org.apache.spark.sql.types.LongType))
      else Nil
    val payload = struct(mtCols ++ rightVals.map(col): _*)
    val l = left
      .withColumn("_k", col(leftKey)).withColumn("_t", col(leftTime))
      .withColumn("_is_left", lit(1))
      .withColumn("_p", lit(null).cast(
        org.apache.spark.sql.types.StructType(
          mtFields ++ rightVals.map(v => right.schema(v)))))
    val rAligned = leftCols.foldLeft(
      right.withColumn("_k", col(rightKey)).withColumn("_t", col(rightTime))
        .withColumn("_is_left", lit(0)).withColumn("_p", payload))(
      (df, c) => if (df.columns.contains(c)) df
        else df.withColumn(c, lit(null).cast(left.schema(c).dataType)))
      .select(l.columns.map(col).toSeq: _*)

    // SQL join null semantics: a NULL key or time never matches. Without
    // this filter the window partitioning would group null-key rows
    // TOGETHER (groupBy-style null equality) and happily as-of-match
    // them — the divergence the native exec's equality spec caught.
    val merged = l.unionByName(rAligned)
      .filter(col("_k").isNotNull && col("_t").isNotNull)
    // right rows sort before left rows at equal timestamps (either
    // direction), so the time inequality stays inclusive
    val tOrder = if (forward) col("_t").desc else col("_t").asc
    val w = Window.partitionBy(col("_k"))
      .orderBy(tOrder, col("_is_left").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val windowed0 = merged
      .withColumn("_p", last(col("_p"), ignoreNulls = true).over(w))
      .filter(col("_is_left") === 1)
    // staleness cap: a match farther than `tolerance` (in the time
    // column's own units) from the left row is NO match — nulled here,
    // BEFORE the inner/outer resolution, so inner drops and outer
    // null-pads, exactly like the never-matched case
    val windowed = tolerance.map { tol =>
      val lt = timeAsLong(col("_t"), left.schema(leftTime).dataType)
      val diff = if (forward) col("_p._mt") - lt else lt - col("_p._mt")
      windowed0.withColumn("_p",
        when(col("_p").isNotNull && diff <= tol, col("_p")))
    }.getOrElse(windowed0)
    val resolved =
      if (!leftOuter) windowed.filter(col("_p").isNotNull)
      // outer: unmatched left rows keep their null payload; null-key/time
      // left rows (excluded from the window above) rejoin here, also
      // null-padded — they carry _p = null already
      else windowed.unionByName(
        l.filter(col("_k").isNull || col("_t").isNull))
    resolved.select(leftCols.map(col) ++
      rightVals.map(v => col(s"_p.$v").as(s"asof_$v")): _*)
  }

  /** [[asOfJoinBackward]] through the NATIVE whole-operator plan
    * ([[graft.plans.AsOfJoin]] → AsOfJoinExec): same inner backward
    * as-of semantics and the same (leftCols..., asof_<v>...) output
    * shape, but planned as a co-partitioned two-sided sort + one O(1)-
    * state streaming merge per partition instead of union + window —
    * no null padding through the shuffle, no window buffering. Key
    * columns may be ANY orderable type (bigint, string, date, decimal,
    * or a struct for composite keys), same type on both sides; time
    * columns bigint/timestamp (the exec's contract). `tolerance`
    * (time-column units; micros for timestamps) caps the match's
    * staleness — pandas merge_asof(tolerance=...): a too-distant match
    * drops (inner) or null-pads (leftOuter), identical to never-matched.
    * The spec pins result equality with the composed form; e24 gates it
    * against the DuckDB ASOF JOIN oracle, e29 the string-keyed form,
    * e30 the tolerance form. */
  def asOfJoinNative(left: DataFrame, right: DataFrame,
                     leftKey: String, rightKey: String,
                     leftTime: String, rightTime: String,
                     rightVals: Seq[String],
                     leftOuter: Boolean = false,
                     forward: Boolean = false,
                     tolerance: Option[Long] = None,
                     strict: Boolean = false): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute}
    import org.apache.spark.sql.catalyst.plans.logical.Project
    val spark = left.sparkSession
    val lPlan = left.queryExecution.analyzed
    // fresh-alias the right side: when both inputs derive from the same
    // source (the self-join case), their outputs share exprIds, and the
    // analyzer's DeduplicateRelations only rewrites built-in Join nodes —
    // without this the optimizer resolves right-side references against
    // the LEFT's identical ids and prunes the right child's columns away
    val rAliases = right.queryExecution.analyzed.output
      .map(a => Alias(a, a.name)())
    val rPlan = Project(rAliases, right.queryExecution.analyzed)
    def attr(out: Seq[Attribute], n: String) =
      out.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(s"column $n not found"))
    val plan = graft.plans.AsOfJoin(lPlan, rPlan,
      attr(lPlan.output, leftKey), attr(rPlan.output, rightKey),
      attr(lPlan.output, leftTime), attr(rPlan.output, rightTime),
      leftOuter, forward, tolerance, strict)
    // positional rename: output = left columns ++ right columns, which
    // may share names — rename right side to asof_<name>, then cut to
    // the requested payload
    val renamed = org.apache.spark.sql.GraftPlanBridge.ofRows(spark, plan)
      .toDF(left.columns.toSeq ++ right.columns.map("asof_" + _): _*)
    renamed.select(left.columns.map(col).toSeq ++
      rightVals.map(v => col(s"asof_$v")): _*)
  }

  /** Broadcast as-of join — the shuffle-free scale path when the RIGHT
    * side is dimension-sized (a rate table, a config history, a quotes
    * snapshot): [[asOfJoinNative]] shuffles BOTH sides on the key, which
    * at 100 TB means moving the entire fact table to look up a table
    * that fits in one executor. Here the right side collapses to one row
    * per key holding its time-sorted (time, payload) array (one small
    * keyed shuffle over the DIM side only), that aggregate BROADCASTS,
    * and the fact side flows scan -> BroadcastHashJoin -> project with
    * ZERO exchanges — the plan shape is pinned in AsOfBroadcastSpec.
    * The per-row match is `element_at(filter(arr, ...), -1/1)`: a linear
    * scan of the key's history inside whole-stage codegen, O(rows per
    * key) per probe — the right trade when the history is dim-sized
    * (the broadcast bound, ~10MB-1GB, enforces that honestly).
    *
    * Full contract parity with the native exec, proven by equality
    * specs: backward/forward, inner/LEFT OUTER, tolerance, SQL-null
    * semantics (NULL key/time never matches; inner drops the row, outer
    * null-pads). Ties on (key, rightTime) break by payload order (the
    * sort_array tiebreak) vs physical order natively — both unspecified
    * contracts. Output is `left.columns ++ asof_<rightVals>`, same as
    * every as-of variant, so all share one oracle. */
  def asOfJoinBroadcast(left: DataFrame, right: DataFrame,
                        leftKey: String, rightKey: String,
                        leftTime: String, rightTime: String,
                        rightVals: Seq[String],
                        leftOuter: Boolean = false,
                        forward: Boolean = false,
                        tolerance: Option[Long] = None): DataFrame = {
    import org.apache.spark.sql.types.TimestampType
    // reserved internal names — fail loud instead of silently shadowing
    Seq("__bk", "__arr", "__m").foreach(n =>
      require(!left.columns.contains(n) && !right.columns.contains(n),
        s"asOfJoinBroadcast reserves the column name `$n`; rename the " +
          "caller's column first"))
    def micros(df: DataFrame, c: String, e: Column): Column =
      if (df.schema(c).dataType == TimestampType) unix_micros(e) else
        e.cast("long")
    // dim side: one row per key, history sorted by (time, payload) —
    // ascending, so backward takes the LAST qualifying element and
    // forward the FIRST
    val rAgg = right
      .filter(col(rightKey).isNotNull && col(rightTime).isNotNull)
      .groupBy(col(rightKey).as("__bk"))
      .agg(sort_array(collect_list(struct(
        col(rightTime).as("__rt"),
        struct(rightVals.distinct.map(col).toIndexedSeq: _*).as("__pv"))))
        .as("__arr"))
    // always a LEFT broadcast join: inner as-of semantics are applied
    // AFTER the match probe (a key present in the dim table whose rows
    // are all out of tolerance must still drop under inner — a plain
    // inner join would keep it through the probe)
    val probe = left.join(broadcast(rAgg),
      col(leftKey) === col("__bk"), "left")
    val lt = micros(left, leftTime, col(leftTime))
    def inBound(x: Column): Column = {
      val rt = micros(right, rightTime, x("__rt"))
      val dir = if (forward) rt >= lt else rt <= lt
      tolerance.fold(dir)(tol =>
        dir && (if (forward) rt - lt else lt - rt) <= lit(tol))
    }
    // try_element_at, not element_at: an empty qualifying set must be
    // NULL (no match), never an ANSI out-of-bounds error
    val m = try_element_at(
      filter(col("__arr"), inBound _), lit(if (forward) 1 else -1))
    val withMatch = probe.withColumn("__m",
      when(col(leftTime).isNotNull, m))
    val kept = if (leftOuter) withMatch
               else withMatch.filter(col("__m").isNotNull)
    kept.select((left.columns.map(col) ++ rightVals.map(v =>
      col(s"__m.__pv.$v").as(s"asof_$v"))).toIndexedSeq: _*)
  }

  /** Time-sliced skew-split as-of join — the hot-key scale path for
    * [[asOfJoinNative]]. AQE's skew-join optimization pattern-matches
    * only the built-in SortMergeJoin/ShuffledHashJoin execs, so the
    * native as-of exec's ClusteredDistribution exchanges are OUTSIDE
    * runtime skew splitting (pinned by AsOfSkewSpec): one key carrying
    * half the rows lands on one task. This operator is the documented
    * mitigation, the as-of analogue of the w14 salt planner: partition
    * the TIME axis into `sliceWidth`-wide slices and join on the
    * composite key `(key, slice)` — a hot key now spreads across as many
    * tasks as it has active slices.
    *
    * Salting an as-of join needs more than duplicating the build side: a
    * left row's match may live in an EARLIER slice. Correctness comes
    * from carry-ins — for every (key, slice) the left side occupies, the
    * single latest right row from any earlier slice is replicated into
    * that slice. The latest right row at-or-before each left time is
    * then either in the same slice (kept as-is) or the carry-in, never
    * lost. Carry-ins are computed on AGGREGATED frames (one row per
    * (key, slice)), so the extra work is metadata-scale: the slice
    * inequality join touches |keys| x |slices| rows, not the corpus.
    *
    * Same output contract and null semantics as [[asOfJoinNative]]
    * (NULL key/time never matches; inner drops, `leftOuter` pads) — the
    * composite struct key is nulled whenever either component is null so
    * struct ordering cannot resurrect SQL-null equality. `forward` is
    * the exact mirror: the carried row becomes the EARLIEST right row
    * from any LATER slice (min-slice representative, each slice
    * represented by its earliest row). `tolerance` composes unchanged:
    * a carried row that is too stale fails the exec's bound exactly
    * like the unsliced plan.
    * Ties on (key, rightTime) are broken by the payload struct order
    * here vs physical order natively — both unspecified contracts;
    * callers needing determinism must dedup (key, time) first.
    *
    * `sliceWidth` is in the time column's own units (micros for
    * timestamps, via unix_micros — NOT the seconds a timestamp->long
    * cast would give). Sizing: the w19 slice planner
    * (`queries/Warehouse.scala`, w14's arithmetic on the time axis)
    * derives it from the key histogram — per hot key,
    * span / ceil(rows / targetRowsPerTask); take the MIN across hot
    * keys as the global width. */
  def asOfJoinTimeSliced(left: DataFrame, right: DataFrame,
                         leftKey: String, rightKey: String,
                         leftTime: String, rightTime: String,
                         rightVals: Seq[String],
                         sliceWidth: Long,
                         leftOuter: Boolean = false,
                         forward: Boolean = false,
                         tolerance: Option[Long] = None,
                         strict: Boolean = false): DataFrame = {
    require(sliceWidth > 0, s"sliceWidth must be > 0, got $sliceWidth")
    // reserved internal names — fail loud instead of silently shadowing
    Seq("__t", "__slice", "__kk").foreach(n =>
      require(!left.columns.contains(n) && !right.columns.contains(n),
        s"asOfJoinTimeSliced reserves the column name `$n`; rename the " +
          "caller's column first"))
    import org.apache.spark.sql.types.TimestampType
    def micros(df: DataFrame, c: String): Column =
      if (df.schema(c).dataType == TimestampType) unix_micros(col(c))
      else col(c).cast("long")
    // exact floor division on longs: pmod keeps negatives correct and
    // `div` is INTEGRAL division — `/` would route through double and
    // round above 2^53; the subtraction makes the quotient exact
    def slice(tCol: String): Column =
      expr(s"($tCol - pmod($tCol, ${sliceWidth}L)) div ${sliceWidth}L")
    // composite key fields are aliased (k, s) at every construction site:
    // the exec compares struct types INCLUDING field names, and
    // unionByName matches nested names
    def compositeKey(k: Column, s: Column): Column =
      when(k.isNull || s.isNull, lit(null))
        .otherwise(struct(k.as("k"), s.as("s")))

    val lS = left.withColumn("__t", micros(left, leftTime))
      .withColumn("__slice", slice("__t"))
      .withColumn("__kk", compositeKey(col(leftKey), col("__slice")))
    val rS = right.withColumn("__t", micros(right, rightTime))
      .withColumn("__slice", slice("__t"))
      .withColumn("__kk", compositeKey(col(rightKey), col("__slice")))
      .filter(col("__kk").isNotNull) // null key/time never matches anyway

    // one representative per (key, slice): the slice's LATEST right row
    // backward / EARLIEST forward (payload struct breaks rt ties
    // deterministically)
    val payload = struct(right.columns.map(col).toIndexedSeq: _*)
    val repPerSlice = rS
      .groupBy(col(rightKey).as("__k"), col("__slice").as("__rs"))
      .agg((if (forward) min_by(payload, struct(col("__t"), payload))
            else max_by(payload, struct(col("__t"), payload))).as("__row"))
    // slices the LEFT occupies (only these can emit output)
    val leftSlices = lS.filter(col("__kk").isNotNull)
      .select(col(leftKey).as("__k"), col("__slice").as("__ls")).distinct()
    // carried row per occupied slice: backward, the latest representative
    // from any EARLIER slice; forward, the earliest from any LATER one —
    // an inequality join, but over per-(key,slice) aggregates, so
    // |keys| x |slices|^2 at worst, never corpus-scale
    val carries = leftSlices.join(repPerSlice,
        leftSlices("__k") === repPerSlice("__k") &&
          (if (forward) col("__rs") > col("__ls")
           else col("__rs") < col("__ls")))
      .groupBy(leftSlices("__k").as("__gk"), col("__ls"))
      .agg((if (forward) min_by(col("__row"), col("__rs"))
            else max_by(col("__row"), col("__rs"))).as("__row"))
      .select((right.columns.map(c => col(s"__row.$c")) ++
        Seq(col("__ls"))).toIndexedSeq: _*)
      .withColumn("__slice", col("__ls"))
      // rebuild the composite key in the DESTINATION slice (the carried
      // row's key/time are non-null by construction)
      .withColumn("__kk", compositeKey(col(rightKey), col("__ls")))
      .drop("__ls")
    val rAug = rS.select((right.columns.map(col) ++
        Seq(col("__slice"), col("__kk"))).toIndexedSeq: _*)
      .unionByName(carries.select((right.columns.map(col) ++
        Seq(col("__slice"), col("__kk"))).toIndexedSeq: _*))

    // strict threads straight through: a carried row always comes from
    // a DIFFERENT slice (strictly earlier backward, strictly later
    // forward — the __rs </> __ls join branch), so its time can never
    // tie with a left time in the destination slice — only the
    // within-slice merge needs the tie exclusion, and the native exec
    // applies it
    asOfJoinNative(lS, rAug, leftKey = "__kk", rightKey = "__kk",
        leftTime = leftTime, rightTime = rightTime,
        rightVals = rightVals, leftOuter = leftOuter,
        forward = forward, tolerance = tolerance, strict = strict)
      .select((left.columns.map(col) ++
        rightVals.map(v => col(s"asof_$v"))).toIndexedSeq: _*)
  }

  /** Auto-skew-routed as-of join — the last rung of the as-of planning
    * ladder (round-16, sketch-fed round-17): the physical TIER is
    * already cost-based ([[graft.plans.AsOfJoinStrategy]] picks
    * broadcast vs shuffled merge from stats), but Spark's AQE cannot
    * split the custom exec's skewed partitions (OptimizeSkewedJoin
    * pattern-matches only the built-in join execs — pinned in
    * AsOfSkewSpec), so a hot key serializes onto one task unless the
    * caller reads the w19 slice plan and calls [[asOfJoinTimeSliced]]
    * manually. This operator does that read-and-route automatically:
    *
    *  1. [[asOfSkewPlan]] detects hot keys — by default a Misra-Gries
    *     pass (ds04's `mg_topk_agg`): O(capacity) state per partition,
    *     NO keyed shuffle, so skew detection never pays a
    *     key-cardinality exchange over a 100 TB input — and derives
    *     each hot key's slice width from an exact count+span lookup
    *     over just the candidate keys (a pruned second pass); the MIN
    *     width across hot keys becomes the global sliceWidth (w19's
    *     arithmetic). `exactHistogram = true` keeps the round-16
    *     exact-groupBy twin (one full keyed shuffle, ReuseExchange'd
    *     total — the w19 gate shape, and the fallback when an explicit
    *     `targetRowsPerTask` is finer than the sketch can certify);
    *  2. keys above `targetRowsPerTask` (default: left total /
    *     defaultParallelism — w14's hot bar) are HOT, capped at the
    *     top max(4*parallelism, 64) by count (the remainder routes
    *     cold — still correct, just unsplit), so the driver-side list
    *     and the isin literal stay metadata-scale even when a caller
    *     passes a test-scale target that thousands of keys exceed;
    *  3. both inputs split on hot-key membership (an isin predicate —
    *     it folds into the scan as an In filter, no extra shuffle):
    *     hot rows route through [[asOfJoinTimeSliced]] at the planned
    *     width, cold rows through [[asOfJoinNative]] (which keeps the
    *     cost-based broadcast/shuffled choice), results union.
    *
    * No hot keys → the plain native plan, zero routing overhead beyond
    * the detection pass. Requires an ATOMIC key column (the detection
    * collect and the isin literal need a scalar); composite keys:
    * pre-concat or call the sliced form directly. NULL left keys route
    * cold, preserving the exec's null semantics (never match; outer
    * still pads). */
  def asOfJoinAuto(left: DataFrame, right: DataFrame,
                   leftKey: String, rightKey: String,
                   leftTime: String, rightTime: String,
                   rightVals: Seq[String],
                   leftOuter: Boolean = false,
                   forward: Boolean = false,
                   tolerance: Option[Long] = None,
                   strict: Boolean = false,
                   targetRowsPerTask: Long = 0L,
                   exactHistogram: Boolean = false,
                   sketchCapacity: Int = 4096): DataFrame = {
    require(!left.schema(leftKey).dataType
      .isInstanceOf[org.apache.spark.sql.types.StructType],
      "asOfJoinAuto requires an atomic key column — composite keys: " +
        "pre-concat, or size asOfJoinTimeSliced from the w19 plan directly")
    def native(l: DataFrame, r: DataFrame): DataFrame =
      asOfJoinNative(l, r, leftKey, rightKey, leftTime, rightTime,
        rightVals, leftOuter, forward, tolerance, strict)
    asOfSkewPlan(left, leftKey, leftTime, targetRowsPerTask,
        exactHistogram, sketchCapacity) match {
      case None => native(left, right)
      case Some((hotKeys, sliceWidth)) =>
        val lHot = left.filter(col(leftKey).isInCollection(hotKeys))
        val lCold = left.filter(col(leftKey).isNull ||
          !col(leftKey).isInCollection(hotKeys))
        val rHot = right.filter(col(rightKey).isInCollection(hotKeys))
        val rCold = right.filter(col(rightKey).isNull ||
          !col(rightKey).isInCollection(hotKeys))
        asOfJoinTimeSliced(lHot, rHot, leftKey, rightKey, leftTime,
            rightTime, rightVals, sliceWidth, leftOuter, forward,
            tolerance, strict)
          .unionByName(native(lCold, rCold))
    }
  }

  /** Hot-key detection + slice sizing for [[asOfJoinAuto]]: returns the
    * hot keys (capped, count-descending) and the global sliceWidth, or
    * None when nothing crosses the target.
    *
    * Default (sketch) path — two passes, NO key-cardinality shuffle:
    *
    *  1. one Misra-Gries `mg_topk_agg` pass over `xxhash64(key)` (any
    *     atomic key type sketches through its hash; a hash collision
    *     can only ADD a candidate, which the exact pass 2 then rejects)
    *     plus the grand total, partial-aggregated to O(capacity) per
    *     partition — the only state that crosses the wire. MG's
    *     deterministic bounds make the candidate set a SUPERSET of the
    *     true hot set whenever target >= total/capacity: every key with
    *     true count > total/capacity is present, and est >= true -
    *     total/capacity, so filtering est > target - total/capacity
    *     keeps every truly-hot key;
    *  2. an exact count+span aggregate over ONLY candidate-key rows
    *     (the isin on the hash folds into the scan; map-side combine
    *     leaves <= |candidates| rows to shuffle) supplies the exact
    *     counts the w19 width arithmetic needs — estimates never size
    *     slices.
    *
    * CAP CAVEAT (mirroring the exact path's "keys past the cap just
    * route cold"): the candidate list is truncated at 4*maxHot by MG
    * ESTIMATED count, and estimate order need not match true-count
    * order — so when more candidates pass the est filter than the
    * truncation keeps, a truly-hot key can fall to a near-hot false
    * candidate and route cold, unsplit. Results stay correct either
    * way (routing is result-invariant); the superset guarantee — and
    * the sketch==exact hot-set equality AsOfSkewSpec pins — holds
    * below the truncation, which needs > 4*max(4*par, 64) concurrent
    * candidates to breach.
    *
    * The exact twin (`exactHistogram = true`, or the automatic fallback
    * when an explicit target < total/capacity, where the sketch cannot
    * certify presence) is the round-16 shape: one full keyed histogram
    * whose grand total composes for ReuseExchange (pinned in
    * AsOfSkewSpec — the total's aggregate deliberately references
    * __mn/__mx so column pruning cannot break the exchange equality),
    * now with the same top-K cap applied as TakeOrdered inside the
    * query rather than an unbounded driver collect. Default targets
    * never fall back: capacity is floored at parallelism, so
    * total/parallelism >= total/capacity always certifies. */
  private[graft] def asOfSkewPlan(left: DataFrame, leftKey: String,
      leftTime: String, targetRowsPerTask: Long,
      exactHistogram: Boolean = false,
      sketchCapacity: Int = 4096): Option[(Seq[Any], Long)] = {
    import org.apache.spark.sql.types.TimestampType
    def micros(c: String): Column =
      if (left.schema(c).dataType == TimestampType) unix_micros(col(c))
      else col(c).cast("long")
    val par = left.sparkSession.sparkContext.defaultParallelism
    val maxHot = math.max(4 * par, 64)
    // NULL key/time rows are excluded on purpose: they never match in
    // the exec, so they cannot make a key hot — and a key whose times
    // are ALL null would otherwise surface null mn/mx into the driver
    // arithmetic below
    val filtered = left.filter(
      col(leftKey).isNotNull && micros(leftTime).isNotNull)
    // w19's sizing: per hot key span / ceil(n/target); global = MIN so
    // the hottest key's tasks hit ~target rows
    def width(rows: Array[org.apache.spark.sql.Row], target: Long): Long =
      rows.map { r =>
        val n = r.getLong(1); val span = r.getLong(3) - r.getLong(2) + 1
        val nSlices = math.max(1L, math.ceil(n.toDouble / target).toLong)
        math.max(1L, math.ceil(span.toDouble / nSlices).toLong)
      }.min

    def exactPlan(): Option[(Seq[Any], Long)] = {
      // the grand total joins back as a broadcast one-row frame, and
      // the total's aggregate deliberately references __mn/__mx too
      // (as __gmn/__gmx, selected into the collect and ignored) so
      // column pruning cannot narrow its subtree — pruned, the two
      // exchanges stop being equal and ReuseExchange never fires,
      // which silently plans TWO full input scans (measured, round
      // 16; the reuse shape is pinned in AsOfSkewSpec)
      val hist = filtered
        .groupBy(col(leftKey).as("__k"))
        .agg(count(lit(1)).as("__n"),
          min(micros(leftTime)).as("__mn"),
          max(micros(leftTime)).as("__mx"))
      val totalDf = hist.agg(
        coalesce(sum(col("__n")), lit(0L)).as("__total"),
        min(col("__mn")).as("__gmn"), max(col("__mx")).as("__gmx"))
      val targetCol =
        if (targetRowsPerTask > 0) lit(targetRowsPerTask)
        else greatest(expr(s"__total div $par"), lit(1L))
      // top-K by count INSIDE the query (TakeOrdered, not a global
      // sort): with a caller-supplied small target the unbounded
      // collect was key-cardinality-sized (advice r16); the cap keeps
      // it metadata-scale, and keys past the cap just route cold
      // secondary sort on the key: count ties at the cap boundary must
      // pick the same hot set on every run/engine (review r17)
      val hot = hist.crossJoin(broadcast(totalDf))
        .filter(col("__n") > targetCol)
        .select(col("__k"), col("__n"), col("__mn"), col("__mx"),
          targetCol.as("__target"), col("__gmn"), col("__gmx"))
        .orderBy(col("__n").desc, col("__k").asc).limit(maxHot).collect()
      if (hot.isEmpty) None
      else {
        val target = math.max(1L, hot.head.getLong(4))
        Some((hot.map(_.get(0)).toSeq, width(hot, target)))
      }
    }

    if (exactHistogram) return exactPlan()
    val cap = math.max(sketchCapacity, par)
    val sk = filtered.select(xxhash64(col(leftKey)).as("__h"))
      .agg(expr(s"mg_topk_agg(__h, $cap)").as("__mg"),
        count(lit(1)).as("__total")).head()
    val total = sk.getLong(1)
    if (total == 0L) return None
    val target =
      if (targetRowsPerTask > 0) targetRowsPerTask
      else math.max(total / par, 1L)
    val err = total / cap // MG bound: true(x) - est(x) <= total/cap
    if (target < err) return exactPlan() // only reachable with explicit target
    val cand = sk.getMap[Long, Long](0).toSeq
      .filter(_._2 > target - err)
      .sortBy { case (h, c) => (-c, h) }.take(4 * maxHot).map(_._1)
    if (cand.isEmpty) return None
    val spans = filtered
      .filter(xxhash64(col(leftKey)).isInCollection(cand))
      .groupBy(col(leftKey).as("__k"))
      .agg(count(lit(1)).as("__n"),
        min(micros(leftTime)).as("__mn"),
        max(micros(leftTime)).as("__mx"))
      .filter(col("__n") > lit(target))
      .orderBy(col("__n").desc, col("__k").asc).limit(maxHot).collect()
    if (spans.isEmpty) None
    else Some((spans.map(_.get(0)).toSeq, width(spans, target)))
  }

  /** Binned range join: pairs (l, r) with
    * rightTime in [leftTime - windowSec, leftTime]. Instead of an
    * inequality join (nested-loop at any scale), both sides are bucketed
    * into windowSec-wide time bins and equi-joined on the bin — the left
    * side probes its own and the previous bin, which covers every pair a
    * window of that length can span — then the exact range predicate
    * filters within the bin pairs. One shuffle on the bin key; cost is
    * linear in events-per-bin, not in the cross product. Column names
    * must be disjoint between the two inputs. Optional `keys` add
    * equality predicates INTO the bin join (e.g. same-user pairs only),
    * which shrinks both the shuffle groups and the within-bin pairing —
    * at scale the keyed form is the one to use whenever an equality key
    * exists (e28 attribution: (user, bin) groups instead of whole
    * bins). */
  def rangeJoinBinned(left: DataFrame, right: DataFrame,
                      leftTime: String, rightTime: String,
                      windowSec: Long,
                      keys: Seq[(String, String)] = Nil): DataFrame = {
    require(left.columns.toSet.intersect(right.columns.toSet).isEmpty,
      "left/right column names must be disjoint")
    val binMicros = windowSec * 1000000L
    val lBin = expr(s"unix_micros($leftTime) div $binMicros")
    val l = left.withColumn("_bin", explode(array(lBin - 1, lBin)))
    val r = right.withColumn("_bin", expr(s"unix_micros($rightTime) div $binMicros"))
    val cond = keys.foldLeft(l("_bin") === r("_bin")) {
      case (c, (lk, rk)) => c && l(lk) === r(rk)
    }
    l.join(r, cond)
      .filter(col(rightTime) >= col(leftTime) - expr(s"INTERVAL $windowSec SECONDS") &&
        col(rightTime) <= col(leftTime))
      .drop(l("_bin")).drop(r("_bin"))
  }

  /** LEFT OUTER [[rangeJoinBinned]]: left rows with NO right row in
    * their window survive null-padded — the shape that keeps zero-touch
    * facts visible (e28's inner form silently drops a purchase with no
    * prior-hour click, corrupting a "credit per purchase" denominator).
    *
    * The bin-explode makes a naive outer join WRONG two ways: a left row
    * probes TWO bins, so (a) it would pad once per unmatched bin
    * (duplicates), and (b) a row matched in one bin would ALSO pad from
    * its other bin. So the outer form composes from the inner result —
    * and identifies unmatched left ROWS by an internal
    * monotonically_increasing_id tag, not by tuple equality: duplicate
    * left rows each pad/match independently and NULLs in left columns
    * are inert (the round-14 footguns, closed here instead of pushed
    * onto callers — the anti-join now compares one non-null long). The
    * tag requires `left`'s row order to be deterministic per partition
    * (any scan-rooted plan is; a nondeterministically-ordered input —
    * e.g. fresh round-robin repartition — is the one remaining caller
    * contract, shared by every id-tagging operator). Cost: the inner
    * result projected to one long + distinct, one long-keyed anti-join
    * over `left`, union — all keyed shuffles on scalar keys. */
  def rangeJoinBinnedLeft(left: DataFrame, right: DataFrame,
                          leftTime: String, rightTime: String,
                          windowSec: Long,
                          keys: Seq[(String, String)] = Nil): DataFrame = {
    // fail LOUD, not by silently overwriting and dropping a caller
    // column that happens to use the operator's internal tag name
    require(!left.columns.contains("_rjid"),
      "rangeJoinBinnedLeft reserves the column name `_rjid` for its " +
        "internal row tag; rename the caller's column first")
    val tagged = left.withColumn("_rjid", monotonically_increasing_id())
    val inner = rangeJoinBinned(tagged, right, leftTime, rightTime,
      windowSec, keys)
    val pads = tagged.join(inner.select(col("_rjid")).distinct(),
      Seq("_rjid"), "left_anti")
    val padded = right.columns.foldLeft(pads)((df, c) =>
      df.withColumn(c, lit(null).cast(right.schema(c).dataType)))
    inner.unionByName(padded).drop("_rjid")
  }

  /** Bloom semi-join reduction: filter `fact` down to rows whose key
    * PROBABLY appears in `build`'s key set, using a bloom filter built
    * with [[graft.expressions.BloomAgg]] and probed per-row with
    * [[graft.expressions.BloomMightContain]].
    *
    * False negatives are impossible, so `bloomPreFilter(...)` followed by
    * the exact join is result-identical to the plain join — but the
    * shuffle the join needs now carries only probable matches (true
    * matches + ~fpp of the rest). The filter itself is a driver-side
    * scalar (one aggregate row, KBs–MBs regardless of build row count)
    * bound into the probe as a literal — the same life cycle as a
    * broadcast variable, reusable against any number of scans across
    * queries. Spark's own runtime bloom injection (RuntimeFilterSpec)
    * does this only within a single query's join. */
  def bloomPreFilter(fact: DataFrame, factKey: String,
                     build: DataFrame, buildKey: String,
                     expectedItems: Long, fpp: Double): DataFrame = {
    graft.expressions.VectorExpressions.registerAll(fact.sparkSession)
    val bytes = build
      .agg(call_function("bloom_agg", col(buildKey),
        lit(expectedItems), lit(fpp)).as("bf"))
      .head().getAs[Array[Byte]](0)
    fact.filter(call_function("bloom_contains", lit(bytes), col(factKey)))
  }

  /** Binned interval-overlap join: pairs (l, r) whose CLOSED intervals
    * [lStart, lEnd] and [rStart, rEnd] (timestamp columns) intersect,
    * i.e. lStart <= rEnd AND rStart <= lEnd.
    *
    * A naive inequality join is a nested-loop cross product at any
    * scale. Here each interval is exploded onto every `binSec`-wide time
    * bin it touches and the two sides are EQUI-joined on the bin — one
    * hash shuffle, cost linear in sum-of-per-bin pairs (the true output
    * work), not |L|·|R|. An overlapping pair co-occurs in every bin both
    * intervals share, so to emit it exactly once WITHOUT a distinct
    * (a second full shuffle), the pair is kept only in its canonical
    * bin — the bin holding the later of the two starts, which both
    * intervals provably cover when they overlap.
    *
    * Choose binSec near the typical interval length: duplication factor
    * is ceil(len/binSec)+1 per row. Column names must be disjoint.
    *
    * Binning uses exact FLOOR division (not `div`'s toward-zero
    * truncation), so pre-1970 timestamps get uniform binSec-wide bins
    * too — with `div`, bin 0 would span (-binSec, +binSec) and the
    * duplication-factor bound would silently degrade around the epoch. */
  def intervalOverlapJoin(left: DataFrame, right: DataFrame,
                          lStart: String, lEnd: String,
                          rStart: String, rEnd: String,
                          binSec: Long): DataFrame = {
    require(left.columns.toSet.intersect(right.columns.toSet).isEmpty,
      "left/right column names must be disjoint")
    require(binSec > 0, "binSec must be positive")
    val binMicros = binSec * 1000000L
    // exact long floor-division: `div` truncates toward zero, so shift
    // the quotient down by one whenever a negative dividend leaves a
    // remainder (no IEEE double in the path — micros exceed 2^53 range)
    def floorBin(tsExpr: String) =
      s"((unix_micros($tsExpr) div $binMicros) - " +
        s"(CASE WHEN unix_micros($tsExpr) % $binMicros < 0 THEN 1 ELSE 0 END))"
    def spannedBins(st: String, en: String) =
      expr(s"sequence(${floorBin(st)}, ${floorBin(en)})")
    val l = left.withColumn("_bin", explode(spannedBins(lStart, lEnd)))
    val r = right.withColumn("_bin", explode(spannedBins(rStart, rEnd)))
    l.join(r, "_bin")
      .filter(col(lStart) <= col(rEnd) && col(rStart) <= col(lEnd))
      .filter(col("_bin") ===
        expr(floorBin(s"greatest($lStart, $rStart)")))
      .drop("_bin")
  }

  /** Salted equi-join for skewed fact keys: the dimension side is
    * replicated `salt` times, the fact side picks a deterministic salt
    * from row identity, and the join key becomes (key, salt) — a hot key
    * now lands on `salt` reducers instead of one. Results are identical
    * to the unsalted join. (AQE's skew-join handles most cases at
    * runtime; explicit salting remains the tool when one logical key
    * exceeds what any single task can hold.) */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String, salt: Int,
                 saltBy: Column): DataFrame = {
    require(salt > 1, "salt must be > 1")
    val saltedFact = fact.withColumn("_salt", pmod(xxhash64(saltBy), lit(salt)))
    val saltedDim = dim
      .withColumn("_salt", explode(array((0 until salt).map(i => lit(i.toLong)): _*)))
    saltedFact.join(saltedDim,
      saltedFact(key) === saltedDim(key) && saltedFact("_salt") === saltedDim("_salt"))
      .drop(saltedDim(key)).drop("_salt")
  }
}
