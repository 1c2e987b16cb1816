package graft.queries

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._
import graft.io.Tables

/** Extended relational surface: grouping sets, pivot, lateral explode,
  * exact percentiles, moment statistics, regexp, array/map aggregation,
  * scalar subqueries, date arithmetic, and the SQL frontend.
  *
  * Determinism discipline continues from Relational: any aggregate of a
  * double goes through DECIMAL on both engines; moment statistics
  * (variance/correlation) are computed from decimal-exact component sums
  * with the identical double formula on both sides, so partial-agg order
  * can never perturb the result.
  */
object Relational2 {

  private def dec(c: Column): Column = c.cast("decimal(18,2)")

  val qs: Seq[Q] = Seq(

    // ---- grouping sets (finer than rollup/cube) -------------------------
    Q("q21_grouping_sets",
      (s, d) => Tables.lineitem(s, d)
        .groupingSets(
          Seq(Seq(col("l_returnflag"), col("l_linestatus")),
            Seq(col("l_returnflag")), Seq.empty),
          col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"),
          sum(dec(col("l_quantity"))).cast("double").as("sum_qty"))
        .select(coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
          col("n"), col("sum_qty")),
      Some("""
        SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
               COALESCE(l_linestatus, 'ALL') AS linestatus,
               COUNT(*) AS n,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
                                (l_returnflag), ())""")),

    // ---- pivot (explicit value list => stable schema) -------------------
    Q("q22_pivot",
      (s, d) => Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .pivot("l_linestatus", Seq("O", "F"))
        .agg(sum(dec(col("l_quantity"))).cast("double"))
        .select(col("l_returnflag"), col("O").as("qty_open"),
          col("F").as("qty_finished")),
      Some("""
        SELECT l_returnflag,
          CAST(SUM(CASE WHEN l_linestatus = 'O'
            THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS qty_open,
          CAST(SUM(CASE WHEN l_linestatus = 'F'
            THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS qty_finished
        FROM lineitem GROUP BY l_returnflag""")),

    // ---- lateral explode with position ----------------------------------
    Q("q23_posexplode",
      (s, d) => Tables.orders(s, d)
        .filter(col("o_orderkey") < 100)
        .select(col("o_orderkey"),
          posexplode(sequence(lit(1), (col("o_orderkey") % 4 + 1).cast("int"))))
        .select(col("o_orderkey"), col("pos").cast("long").as("pos"),
          col("col").cast("long").as("v")),
      Some("""
        SELECT o_orderkey, v - 1 AS pos, v
        FROM orders CROSS JOIN unnest(range(1, o_orderkey % 4 + 2)) t(v)
        WHERE o_orderkey < 100""")),

    // ---- exact interpolated percentiles ---------------------------------
    Q("q24_percentiles",
      (s, d) => Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(expr("percentile(l_quantity, 0.25)").as("p25"),
          expr("percentile(l_quantity, 0.5)").as("p50"),
          expr("percentile(l_quantity, 0.75)").as("p75")),
      Some("""
        SELECT l_returnflag,
          CAST(quantile_cont(l_quantity, 0.25) AS DOUBLE) AS p25,
          CAST(quantile_cont(l_quantity, 0.5) AS DOUBLE) AS p50,
          CAST(quantile_cont(l_quantity, 0.75) AS DOUBLE) AS p75
        FROM lineitem GROUP BY l_returnflag""")),

    // ---- moment statistics from decimal-exact component sums ------------
    Q("q25_moment_stats",
      (s, d) => Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
          sum(dec(col("l_quantity"))).as("sx"),
          sum(dec(col("l_quantity")) * dec(col("l_quantity"))).as("sxx"),
          sum(dec(col("l_extendedprice"))).as("sy"),
          sum(dec(col("l_extendedprice")) * dec(col("l_extendedprice"))).as("syy"),
          sum(dec(col("l_quantity")) * dec(col("l_extendedprice"))).as("sxy"))
        .select(col("l_returnflag"), col("n"),
          ((col("sxx").cast("double") -
            col("sx").cast("double") * col("sx").cast("double") / col("n"))
            / (col("n") - 1)).as("var_qty"),
          // the correlation is quantized to 1e-12 by exact IEEE ops
          // (floor/multiply — identical on both engines): its sxx/syy
          // inputs are DECIMAL sums whose scaled integer exceeds 2^53,
          // and DuckDB's int128->double conversion can double-round a
          // value the JVM's BigDecimal rounds once — a 1-ulp input
          // difference that surfaced at sf0.001. |corr| <= 1, so the
          // scaled value is far under 2^53 and the quantizer is exact.
          // A zero-variance group makes the denominator 0 and the ratio
          // NaN; floor(NaN) is 0 on Spark but an error under DuckDB's
          // BIGINT cast, so the denominator is nullif'd to 0 on BOTH
          // engines first — degenerate groups report NULL, not 0.0.
          (floor(((col("n") * col("sxy").cast("double") -
            col("sx").cast("double") * col("sy").cast("double")) /
            nullif(sqrt(col("n") * col("sxx").cast("double") -
              col("sx").cast("double") * col("sx").cast("double")) *
              sqrt(col("n") * col("syy").cast("double") -
                col("sy").cast("double") * col("sy").cast("double")),
              lit(0.0)))
            * lit(1e12) + lit(0.5)) / lit(1e12))
            .as("corr_qty_price")),
      Some("""
        WITH m AS (
          SELECT l_returnflag, COUNT(*) AS n,
            SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sx,
            SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS sxx,
            SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS sy,
            SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS syy,
            SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS sxy
          FROM lineitem GROUP BY l_returnflag)
        SELECT l_returnflag, n,
          (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / n)
            / (n - 1) AS var_qty,
          CAST(FLOOR(
            (n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
              NULLIF(sqrt(n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) *
               sqrt(n * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)), 0)
            * 1e12 + 0.5) AS BIGINT) / 1e12
            AS corr_qty_price
        FROM m""")),

    // ---- regexp extract / replace / match filter ------------------------
    Q("q26_regexp",
      (s, d) => Tables.orders(s, d)
        .filter(col("o_orderpriority").rlike("^[123]-"))
        .select(col("o_orderkey"),
          regexp_extract(col("o_orderpriority"), "^(\\d+)-(\\w+)", 1)
            .cast("long").as("prio_num"),
          regexp_extract(col("o_orderpriority"), "^(\\d+)-(\\w+)", 2)
            .as("prio_word"),
          regexp_replace(col("o_orderpriority"), "[AEIOU]", "_")
            .as("devoweled"),
          element_at(split(col("o_orderpriority"), "-"), 2).as("after_dash")),
      Some("""
        SELECT o_orderkey,
          CAST(regexp_extract(o_orderpriority, '^(\d+)-(\w+)', 1) AS BIGINT) AS prio_num,
          regexp_extract(o_orderpriority, '^(\d+)-(\w+)', 2) AS prio_word,
          regexp_replace(o_orderpriority, '[AEIOU]', '_', 'g') AS devoweled,
          split_part(o_orderpriority, '-', 2) AS after_dash
        FROM orders WHERE regexp_matches(o_orderpriority, '^[123]-')""")),

    // ---- array aggregation + predicates ---------------------------------
    // array columns never reach the output: the driver's pandas compare
    // cannot sort ndarray cells, so the sorted set is emitted as a CSV
    // string (array_join) while the array ops stay on the Spark side
    Q("q27_array_agg",
      (s, d) => Tables.customer(s, d)
        .groupBy("c_nationkey")
        .agg(sort_array(collect_set(col("c_mktsegment"))).as("segments"))
        .select(col("c_nationkey"),
          array_join(col("segments"), ",").as("segments_csv"),
          size(col("segments")).cast("long").as("n_segments"),
          array_contains(col("segments"), "BUILDING").as("has_building")),
      Some("""
        SELECT c_nationkey,
          array_to_string(list_sort(list(DISTINCT c_mktsegment)), ',')
            AS segments_csv,
          CAST(len(list(DISTINCT c_mktsegment)) AS BIGINT) AS n_segments,
          list_contains(list(DISTINCT c_mktsegment), 'BUILDING') AS has_building
        FROM customer GROUP BY c_nationkey""")),

    // ---- map column built from aggregation, scalar lookups --------------
    Q("q28_map_lookup",
      (s, d) => Tables.customer(s, d)
        .groupBy("c_nationkey", "c_mktsegment")
        .agg(count(lit(1)).as("cnt"))
        .groupBy("c_nationkey")
        .agg(map_from_entries(
          sort_array(collect_list(struct(col("c_mktsegment"), col("cnt")))))
          .as("seg_counts"))
        .select(col("c_nationkey"),
          coalesce(element_at(col("seg_counts"), "BUILDING"), lit(0L))
            .as("n_building"),
          size(col("seg_counts")).cast("long").as("n_segments")),
      Some("""
        SELECT c_nationkey,
          CAST(COALESCE(SUM(CASE WHEN c_mktsegment = 'BUILDING'
                              THEN 1 ELSE 0 END), 0) AS BIGINT)
            AS n_building,
          COUNT(DISTINCT c_mktsegment) AS n_segments
        FROM customer GROUP BY c_nationkey""")),

    // ---- scalar aggregate subquery --------------------------------------
    Q("q29_scalar_subquery",
      (s, d) => {
        val c = Tables.customer(s, d)
        val avgBal = c.agg(
          (sum(dec(col("c_acctbal"))).cast("double") / count(lit(1)))
            .as("avg_bal"))
        c.crossJoin(broadcast(avgBal))
          .filter(col("c_acctbal") > col("avg_bal"))
          .groupBy("c_mktsegment")
          .agg(count(lit(1)).as("n_above_avg"))
      },
      Some("""
        SELECT c_mktsegment, COUNT(*) AS n_above_avg
        FROM customer
        WHERE c_acctbal > (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2)))
                             AS DOUBLE) / COUNT(*) FROM customer)
        GROUP BY c_mktsegment""")),

    // ---- date arithmetic -------------------------------------------------
    Q("q30_date_arith",
      (s, d) => Tables.orders(s, d).select(
        col("o_orderkey"),
        date_add(col("o_orderdate").cast("date"), 30).as("ship_by"),
        datediff(col("o_orderdate").cast("date"), lit("1995-01-01").cast("date"))
          .cast("long").as("days_since_95"),
        date_trunc("month", col("o_orderdate")).cast("date").as("month_start"),
        last_day(col("o_orderdate").cast("date")).as("month_end"),
        quarter(col("o_orderdate")).cast("long").as("q")),
      Some("""
        SELECT o_orderkey,
          CAST(o_orderdate AS DATE) + 30 AS ship_by,
          CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE))
            AS BIGINT) AS days_since_95,
          CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
          last_day(CAST(o_orderdate AS DATE)) AS month_end,
          CAST(EXTRACT(quarter FROM o_orderdate) AS BIGINT) AS q
        FROM orders""")),

    // ---- the SQL frontend (parser -> same Catalyst plans) ---------------
    Q("q31_sql_frontend",
      (s, d) => {
        Tables.customer(s, d).createOrReplaceTempView("v_customer")
        Tables.orders(s, d).createOrReplaceTempView("v_orders")
        Tables.lineitem(s, d).createOrReplaceTempView("v_lineitem")
        s.sql("""
          SELECT o_orderkey, o_orderdate,
            CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) *
              (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
              AS DECIMAL(30,4))) AS DOUBLE) AS revenue
          FROM v_customer JOIN v_orders ON c_custkey = o_custkey
            JOIN v_lineitem ON l_orderkey = o_orderkey
          WHERE c_mktsegment = 'BUILDING'
          GROUP BY o_orderkey, o_orderdate
          ORDER BY revenue DESC, o_orderkey ASC
          LIMIT 10""")
      },
      Some("""
        SELECT o_orderkey, o_orderdate,
          CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) *
            (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
            AS DECIMAL(30,4))) AS DOUBLE) AS revenue
        FROM customer JOIN orders ON c_custkey = o_custkey
          JOIN lineitem ON l_orderkey = o_orderkey
        WHERE c_mktsegment = 'BUILDING'
        GROUP BY o_orderkey, o_orderdate
        ORDER BY revenue DESC, o_orderkey ASC
        LIMIT 10""")),

    // ---- remaining window-function families (distribution + value) -----
    Q("q32_window_misc",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("o_orderstatus"))
          .orderBy(col("o_totalprice").asc, col("o_orderkey").asc)
        Tables.orders(s, d).select(
          col("o_orderkey"), col("o_orderstatus"),
          ntile(4).over(w).cast("long").as("quartile"),
          percent_rank().over(w).as("pct_rank"),
          cume_dist().over(w).as("cume"),
          first(col("o_orderkey")).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .as("cheapest_key"))
      },
      Some("""
        SELECT o_orderkey, o_orderstatus,
          CAST(NTILE(4) OVER w AS BIGINT) AS quartile,
          PERCENT_RANK() OVER w AS pct_rank,
          CUME_DIST() OVER w AS cume,
          FIRST_VALUE(o_orderkey) OVER w AS cheapest_key
        FROM orders
        WINDOW w AS (PARTITION BY o_orderstatus
                     ORDER BY o_totalprice ASC, o_orderkey ASC)""")),

    // ---- scalable global row index (range partition + offsets, never a
    //      single-partition window) --------------------------------------
    Q("q33_global_index",
      (s, d) => graft.operators.IndexOps.globalRowIndex(
        Tables.orders(s, d).select("o_orderkey", "o_totalprice"),
        Seq(col("o_totalprice").asc, col("o_orderkey").asc)),
      Some("""
        SELECT o_orderkey, o_totalprice,
          ROW_NUMBER() OVER (ORDER BY o_totalprice ASC, o_orderkey ASC) - 1
            AS row_idx
        FROM orders""")),

    // ---- deterministic cross-engine sampling (md5-prefix threshold) -----
    Q("q34_hash_sample",
      (s, d) => graft.operators.IndexOps.portableHashSample(
          Tables.orders(s, d), col("o_orderkey"), 0.125)
        .select(col("o_orderkey"), col("o_orderstatus")),
      Some("""
        SELECT o_orderkey, o_orderstatus FROM orders
        WHERE md5(CAST(o_orderkey AS VARCHAR)) <
          '20000000000000000000000000000000'""")),

    // ---- left outer join: keep customers with zero matching orders ------
    Q("q35_left_outer",
      (s, d) => {
        val c = Tables.customer(s, d)
        val o = Tables.orders(s, d)
          .filter(col("o_orderdate") >= lit("1998-01-01").cast("timestamp"))
        c.join(o, c("c_custkey") === o("o_custkey"), "left")
          .groupBy(col("c_custkey"), col("c_mktsegment"))
          .agg(count(col("o_orderkey")).as("n_recent_orders"))
      },
      Some("""
        SELECT c_custkey, c_mktsegment, COUNT(o_orderkey) AS n_recent_orders
        FROM customer LEFT JOIN
          (SELECT * FROM orders WHERE o_orderdate >= TIMESTAMP '1998-01-01') o
          ON c_custkey = o_custkey
        GROUP BY c_custkey, c_mktsegment""")),

    // ---- full outer join with asymmetric sides --------------------------
    Q("q36_full_outer",
      (s, d) => {
        val c = Tables.customer(s, d).filter(col("c_acctbal") > 9000)
          .groupBy("c_nationkey").agg(count(lit(1)).as("n_rich_cust"))
        val sup = Tables.supplier(s, d).filter(col("s_acctbal") > 5000)
          .groupBy("s_nationkey").agg(count(lit(1)).as("n_rich_supp"))
        c.join(sup, c("c_nationkey") === sup("s_nationkey"), "full_outer")
          .select(
            coalesce(col("c_nationkey"), col("s_nationkey")).as("nationkey"),
            coalesce(col("n_rich_cust"), lit(0L)).as("n_rich_cust"),
            coalesce(col("n_rich_supp"), lit(0L)).as("n_rich_supp"))
      },
      Some("""
        SELECT COALESCE(c.c_nationkey, s.s_nationkey) AS nationkey,
          COALESCE(c.n_rich_cust, 0) AS n_rich_cust,
          COALESCE(s.n_rich_supp, 0) AS n_rich_supp
        FROM (SELECT c_nationkey, COUNT(*) AS n_rich_cust FROM customer
              WHERE c_acctbal > 9000 GROUP BY c_nationkey) c
        FULL OUTER JOIN
             (SELECT s_nationkey, COUNT(*) AS n_rich_supp FROM supplier
              WHERE s_acctbal > 5000 GROUP BY s_nationkey) s
          ON c.c_nationkey = s.s_nationkey""")),

    // ---- approximate percentile sketch, q17-style oracle: emit the exact
    //      value plus a deterministic "sketch within 5%" boolean ---------
    Q("q37_approx_percentile",
      (s, d) => Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(expr("percentile(l_extendedprice, 0.5)").as("exact_median"),
          expr("percentile_approx(l_extendedprice, 0.5, 1000)").as("approx_raw"))
        .select(col("l_returnflag"), col("exact_median"),
          (abs(col("approx_raw") - col("exact_median")) /
            col("exact_median") <= 0.05).as("within_5pct")),
      Some("""
        SELECT l_returnflag,
          CAST(quantile_cont(l_extendedprice, 0.5) AS DOUBLE) AS exact_median,
          TRUE AS within_5pct
        FROM lineitem GROUP BY l_returnflag""")),

    // ---- distribution window functions: ntile / percent_rank / cume_dist
    //      (rank-based rationals — exact integer-ratio doubles on both
    //      engines; the order key is made total with o_orderkey so tile
    //      assignment is deterministic) -----------------------------------
    Q("q38_window_extras",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("o_orderpriority"))
          .orderBy(col("o_totalprice").asc, col("o_orderkey").asc)
        Tables.orders(s, d).select(col("o_orderkey"), col("o_orderpriority"),
          ntile(4).over(w).cast("long").as("quartile"),
          percent_rank().over(w).as("pct_rank"),
          cume_dist().over(w).as("cume"))
      },
      Some("""
        SELECT o_orderkey, o_orderpriority,
          CAST(NTILE(4) OVER w AS BIGINT) AS quartile,
          PERCENT_RANK() OVER w AS pct_rank,
          CUME_DIST() OVER w AS cume
        FROM orders
        WINDOW w AS (PARTITION BY o_orderpriority
                     ORDER BY o_totalprice ASC, o_orderkey ASC)""")),

    // ---- correlated EXISTS / NOT EXISTS through the SQL frontend --------
    //      (Catalyst rewrites both to semi/anti joins — the declarative
    //      subquery form of q05/q06) --------------------------------------
    Q("q39_exists_subquery",
      (s, d) => {
        Tables.customer(s, d).createOrReplaceTempView("v_customer")
        Tables.orders(s, d).createOrReplaceTempView("v_orders")
        s.sql("""
          SELECT c_mktsegment,
            COUNT(*) AS n_customers,
            COUNT(CASE WHEN EXISTS (
              SELECT 1 FROM v_orders
              WHERE o_custkey = c_custkey AND o_totalprice > 200000)
              THEN 1 END) AS n_big_spenders,
            COUNT(CASE WHEN NOT EXISTS (
              SELECT 1 FROM v_orders WHERE o_custkey = c_custkey)
              THEN 1 END) AS n_inactive
          FROM v_customer
          GROUP BY c_mktsegment""")
      },
      Some("""
        SELECT c_mktsegment,
          COUNT(*) AS n_customers,
          COUNT(CASE WHEN EXISTS (
            SELECT 1 FROM orders
            WHERE o_custkey = c_custkey AND o_totalprice > 200000)
            THEN 1 END) AS n_big_spenders,
          COUNT(CASE WHEN NOT EXISTS (
            SELECT 1 FROM orders WHERE o_custkey = c_custkey)
            THEN 1 END) AS n_inactive
        FROM customer
        GROUP BY c_mktsegment""")),

    // ---- date-spine densification: generated day series left-joined to
    //      daily aggregates, zero-filled (the gap-filling shape reporting
    //      pipelines need; the spine is a generator, not a scan) ----------
    Q("q40_date_spine",
      (s, d) => {
        val days = s.range(1).select(explode(expr(
          "sequence(to_date('1995-01-01'), to_date('1995-02-28'), interval 1 day)"))
          .as("day"))
        val daily = Tables.orders(s, d)
          .filter(col("o_orderdate") >= lit("1995-01-01") &&
            col("o_orderdate") < lit("1995-03-01"))
          .groupBy(to_date(col("o_orderdate")).as("day"))
          .agg(count(lit(1)).as("n_orders"),
            sum(dec(col("o_totalprice"))).cast("double").as("revenue"))
        days.join(daily, Seq("day"), "left")
          .select(col("day"), coalesce(col("n_orders"), lit(0L)).as("n_orders"),
            coalesce(col("revenue"), lit(0.0)).as("revenue"))
      },
      Some("""
        WITH spine AS (
          SELECT CAST(UNNEST(generate_series(DATE '1995-01-01',
            DATE '1995-02-28', INTERVAL 1 DAY)) AS DATE) AS day),
        daily AS (
          SELECT CAST(o_orderdate AS DATE) AS day, COUNT(*) AS n_orders,
            CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
          FROM orders
          WHERE o_orderdate >= TIMESTAMP '1995-01-01'
            AND o_orderdate < TIMESTAMP '1995-03-01'
          GROUP BY 1)
        SELECT spine.day,
          CAST(COALESCE(daily.n_orders, 0) AS BIGINT) AS n_orders,
          COALESCE(daily.revenue, 0.0) AS revenue
        FROM spine LEFT JOIN daily USING (day)""")),

    // ---- ordered string aggregation (LISTAGG WITHIN GROUP) --------------
    //      deterministic only WITH the in-group order clause — unordered
    //      listagg concatenates in partition arrival order. The filter
    //      keeps group payloads bounded; at scale an unbounded listagg is
    //      a memory hazard, not a query.
    Q("q51_listagg",
      (s, d) => {
        Tables.customer(s, d).createOrReplaceTempView("v_cust_q51")
        s.sql("""
          SELECT c_mktsegment,
            COUNT(*) AS n,
            listagg(c_name, ',') WITHIN GROUP (ORDER BY c_name) AS names
          FROM v_cust_q51
          WHERE c_acctbal > 9900.0
          GROUP BY c_mktsegment""")
      },
      Some("""
        SELECT c_mktsegment, COUNT(*) AS n,
          string_agg(c_name, ',' ORDER BY c_name) AS names
        FROM customer
        WHERE c_acctbal > 9900.0
        GROUP BY c_mktsegment""")),

    // ---- skew-salted join under the correctness gate --------------------
    //      JoinOps.saltedJoin spreads each hot key over `salt` reducers
    //      (fact side salted by row hash, dim side exploded salt-ways);
    //      the oracle is the PLAIN join — salting must be result-
    //      invariant, which is exactly the property worth gating.
    Q("q41_salted_join",
      (s, d) => {
        val dim = Tables.supplier(s, d)
          .select(col("s_suppkey").as("l_suppkey"), col("s_nationkey"))
        graft.operators.JoinOps.saltedJoin(
            Tables.lineitem(s, d), dim, key = "l_suppkey", salt = 8,
            saltBy = struct(col("l_orderkey"), col("l_linenumber")))
          .groupBy("s_nationkey")
          .agg(count(lit(1)).as("n"),
            sum(dec(col("l_quantity"))).cast("double").as("sum_qty"))
      },
      Some("""
        SELECT s_nationkey, COUNT(*) AS n,
          CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        GROUP BY s_nationkey""")),

    // ---- schema-evolution union: old ingest batches lack a column -------
    //      unionByName(allowMissingColumns) null-fills by NAME, the
    //      correct ingest semantics when a field was added mid-stream
    //      (positional union would silently misalign) ---------------------
    Q("q42_schema_evolution",
      (s, d) => {
        val legacy = Tables.orders(s, d)
          .filter(col("o_orderdate") < lit("1997-01-01"))
          .select("o_orderkey", "o_totalprice")
        val current = Tables.orders(s, d)
          .filter(col("o_orderdate") >= lit("1997-01-01"))
          .select("o_orderkey", "o_totalprice", "o_orderpriority")
        legacy.unionByName(current, allowMissingColumns = true)
          .groupBy(coalesce(col("o_orderpriority"), lit("UNKNOWN"))
            .as("priority"))
          .agg(count(lit(1)).as("n"),
            sum(dec(col("o_totalprice"))).cast("double").as("total"))
      },
      Some("""
        WITH unioned AS (
          SELECT o_orderkey, o_totalprice, NULL AS o_orderpriority
          FROM orders WHERE o_orderdate < TIMESTAMP '1997-01-01'
          UNION ALL
          SELECT o_orderkey, o_totalprice, o_orderpriority
          FROM orders WHERE o_orderdate >= TIMESTAMP '1997-01-01')
        SELECT COALESCE(o_orderpriority, 'UNKNOWN') AS priority,
          COUNT(*) AS n,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        FROM unioned GROUP BY 1""")),

    // ---- aggregate pushdown below the join (q04's 100 TB rewrite) -------
    //      lineitem is partially aggregated by orderkey BEFORE the join:
    //      the shuffle is on the same key the join needs anyway, the join
    //      then carries one row per order instead of every line item, and
    //      the expensive countDistinct of q04 degenerates to count(*).
    //      Catalyst does not do this rewrite itself (it changes
    //      intermediate cardinality) — it is the canonical manual
    //      optimization for fact-fact joins whose downstream only needs
    //      per-key aggregates.
    Q("q43_preagg_join",
      (s, d) => {
        val perOrder = Tables.lineitem(s, d)
          .groupBy(col("l_orderkey"))
          .agg(sum(Relational.discPrice()).as("order_rev"))
        Tables.orders(s, d)
          .join(perOrder, col("o_orderkey") === col("l_orderkey"))
          .groupBy("o_orderpriority")
          .agg(sum(col("order_rev")).cast("double").as("revenue"),
            count(lit(1)).as("n_orders"))
      },
      Some(s"""
        WITH per_order AS (
          SELECT l_orderkey, SUM(${Relational.discPriceSql}) AS order_rev
          FROM lineitem GROUP BY l_orderkey)
        SELECT o_orderpriority,
          CAST(SUM(order_rev) AS DOUBLE) AS revenue,
          COUNT(*) AS n_orders
        FROM orders JOIN per_order ON o_orderkey = l_orderkey
        GROUP BY o_orderpriority""")),

    // ---- null-safe equi-join: null keys MATCH each other ---------------
    //      <=> (IS NOT DISTINCT FROM) joins the null bucket instead of
    //      dropping it — the semantics ingest pipelines want when a
    //      sentinel key was nulled out on both sides. Still a hash join
    //      in Spark (EqualNullSafe is a supported join key), not a
    //      degenerate theta join.
    Q("q44_nullsafe_join",
      (s, d) => {
        val c = Tables.customer(s, d)
          .select(nullif(col("c_nationkey"), lit(3)).as("ck"))
          .groupBy("ck").agg(count(lit(1)).as("n_cust"))
        val su = Tables.supplier(s, d)
          .select(nullif(col("s_nationkey"), lit(3)).as("sk"))
          .groupBy("sk").agg(count(lit(1)).as("n_supp"))
        c.join(su, col("ck") <=> col("sk"))
          .select(col("ck").as("nationkey"), col("n_cust"), col("n_supp"))
      },
      Some("""
        WITH c AS (SELECT NULLIF(c_nationkey, 3) AS ck, COUNT(*) AS n_cust
                   FROM customer GROUP BY 1),
        su AS (SELECT NULLIF(s_nationkey, 3) AS sk, COUNT(*) AS n_supp
               FROM supplier GROUP BY 1)
        SELECT c.ck AS nationkey, c.n_cust, su.n_supp
        FROM c JOIN su ON c.ck IS NOT DISTINCT FROM su.sk""")),

    // ---- unpivot / melt: wide measures to long (measure, value) rows ----
    //      the inverse of q22's pivot; the long form is what generic
    //      per-metric aggregation and plotting pipelines consume
    Q("q45_unpivot",
      (s, d) => Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_quantity"),
          col("l_extendedprice"), col("l_discount"))
        .unpivot(Array(col("l_orderkey")),
          Array(col("l_quantity"), col("l_extendedprice"), col("l_discount")),
          "measure", "value")
        .groupBy("measure")
        .agg(count(lit(1)).as("n"),
          sum(dec(col("value"))).cast("double").as("total")),
      Some("""
        WITH long AS (
          SELECT l_orderkey, 'l_quantity' AS measure, l_quantity AS value
          FROM lineitem
          UNION ALL
          SELECT l_orderkey, 'l_extendedprice', l_extendedprice FROM lineitem
          UNION ALL
          SELECT l_orderkey, 'l_discount', l_discount FROM lineitem)
        SELECT measure, COUNT(*) AS n,
          CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
        FROM long GROUP BY measure""")),

    // ---- correlated LATERAL subquery: top-2 per group, declaratively ----
    //      the SQL-frontend form of q07's window top-n; Catalyst rewrites
    //      the correlated limit into a ranked join
    Q("q46_lateral_topn",
      (s, d) => {
        Tables.nation(s, d).createOrReplaceTempView("v_nation")
        Tables.customer(s, d).createOrReplaceTempView("v_customer")
        s.sql("""
          SELECT n_nationkey, n_name, t.c_custkey, t.c_acctbal
          FROM v_nation,
          LATERAL (SELECT c_custkey, c_acctbal FROM v_customer
                   WHERE c_nationkey = n_nationkey
                   ORDER BY c_acctbal DESC, c_custkey ASC LIMIT 2) t""")
      },
      Some("""
        SELECT n_nationkey, n_name, t.c_custkey, t.c_acctbal
        FROM nation,
        LATERAL (SELECT c_custkey, c_acctbal FROM customer
                 WHERE c_nationkey = n_nationkey
                 ORDER BY c_acctbal DESC, c_custkey ASC LIMIT 2) t""")),

    // ---- percent-of-total (ratio-to-report): aggregate once, window the
    //      group totals over the aggregated frame — the window runs over
    //      |groups| rows, never over the fact table ----------------------
    Q("q47_pct_of_total",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val byStatus = Tables.orders(s, d)
          .groupBy("o_orderstatus", "o_orderpriority")
          .agg(sum(dec(col("o_totalprice"))).as("rev"))
        byStatus
          .withColumn("status_rev",
            sum(col("rev")).over(Window.partitionBy(col("o_orderstatus"))))
          .select(col("o_orderstatus"), col("o_orderpriority"),
            col("rev").cast("double").as("revenue"),
            (col("rev").cast("double") / col("status_rev").cast("double"))
              .as("pct_of_status"))
      },
      Some("""
        WITH a AS (
          SELECT o_orderstatus, o_orderpriority,
            SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
          FROM orders GROUP BY 1, 2)
        SELECT o_orderstatus, o_orderpriority,
          CAST(rev AS DOUBLE) AS revenue,
          CAST(rev AS DOUBLE) /
            CAST(SUM(rev) OVER (PARTITION BY o_orderstatus) AS DOUBLE)
            AS pct_of_status
        FROM a""")),

    // ---- array set algebra: per-nation segment sets compared ------------
    //      intersect/union/except on aggregated arrays (q27 built them;
    //      this operates on them), emitted as scalars for the oracle
    Q("q48_array_setops",
      (s, d) => {
        def segs(src: org.apache.spark.sql.DataFrame, key: String,
                 out: String) =
          src.filter(col(key) <= 2)
            .groupBy(col(key).as("nk"))
            .agg(sort_array(collect_set(col("c_mktsegment"))).as(out))
        val cur = segs(Tables.customer(s, d), "c_nationkey", "segs_a")
        val prev = segs(Tables.customer(s, d)
            .filter(col("c_custkey") % 2 === 0), "c_nationkey", "segs_b")
        cur.join(prev, "nk")
          .select(col("nk"),
            size(array_intersect(col("segs_a"), col("segs_b"))).cast("long")
              .as("n_common"),
            size(array_union(col("segs_a"), col("segs_b"))).cast("long")
              .as("n_union"),
            array_join(array_sort(array_except(col("segs_a"), col("segs_b"))), ",")
              .as("lost_csv"))
      },
      Some("""
        WITH a AS (SELECT c_nationkey AS nk,
                     list_sort(list(DISTINCT c_mktsegment)) AS segs_a
                   FROM customer WHERE c_nationkey <= 2 GROUP BY 1),
        b AS (SELECT c_nationkey AS nk,
                list_sort(list(DISTINCT c_mktsegment)) AS segs_b
              FROM customer WHERE c_nationkey <= 2 AND c_custkey % 2 = 0
              GROUP BY 1)
        SELECT a.nk,
          CAST(len(list_intersect(segs_a, segs_b)) AS BIGINT) AS n_common,
          CAST(len(list_distinct(list_concat(segs_a, segs_b))) AS BIGINT)
            AS n_union,
          COALESCE(array_to_string(list_sort(list_filter(segs_a,
            x -> NOT list_contains(segs_b, x))), ','), '') AS lost_csv
        FROM a JOIN b USING (nk)""")),

    // ---- time-range window frames (RANGE over event time) ---------------
    //      per-customer rolling 30-day order stats: a RANGE frame bounded
    //      by an epoch-seconds offset, not a row count — ties (same-day
    //      orders) are frame peers on both engines. Still one keyed
    //      shuffle; the frame is evaluated per partition at any scale.
    Q("q49_time_range_window",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(unix_timestamp(col("o_orderdate")))
          .rangeBetween(-30L * 86400, 0)
        Tables.orders(s, d)
          .select(col("o_custkey"), col("o_orderkey"),
            count(lit(1)).over(w).as("n_30d"),
            sum(dec(col("o_totalprice"))).over(w).cast("double").as("sum_30d"))
      },
      Some("""
        SELECT o_custkey, o_orderkey,
          COUNT(*) OVER w AS n_30d,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE)
            AS sum_30d
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY epoch(o_orderdate)
          RANGE BETWEEN 2592000 PRECEDING AND CURRENT ROW)""")),

    // ---- correlation / covariance from exact decimal moments ------------
    //      Pearson corr per group, computed RATIONALLY: the five decimal
    //      power sums are exact (order-independent), and the final
    //      (n·Sxy − Sx·Sy) / √((n·Sxx − Sx²)(n·Syy − Sy²)) is the same
    //      IEEE expression on both engines — unlike the engines' built-in
    //      corr() aggregates, whose streaming update orders differ.
    Q("q50_correlation",
      (s, d) => {
        val x = col("l_quantity").cast("decimal(18,2)")
        val y = col("l_extendedprice").cast("decimal(18,2)")
        Tables.lineitem(s, d)
          .groupBy("l_returnflag")
          .agg(count(lit(1)).as("n"),
            sum(x).cast("double").as("sx"),
            sum(y).cast("double").as("sy"),
            sum((x * x).cast("decimal(30,4)")).cast("double").as("sxx"),
            sum((y * y).cast("decimal(30,4)")).cast("double").as("syy"),
            sum((x * y).cast("decimal(30,4)")).cast("double").as("sxy"))
          .select(col("l_returnflag"), col("n"),
            // quantized to 1e-12 for the same reason as q25: the large
            // sxx/syy decimal->double conversions can differ by 1 ulp
            // cross-engine (int128 double-rounding), and only the
            // corr path consumes them
            (floor(((col("n") * col("sxy") - col("sx") * col("sy")) /
              sqrt((col("n") * col("sxx") - col("sx") * col("sx")) *
                (col("n") * col("syy") - col("sy") * col("sy"))))
              * lit(1e12) + lit(0.5)) / lit(1e12))
              .as("corr_qty_price"),
            ((col("n") * col("sxy") - col("sx") * col("sy")) / col("n") / col("n"))
              .as("covar_pop"))
      },
      Some("""
        WITH m AS (
          SELECT l_returnflag, COUNT(*) AS n,
            CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sx,
            CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sy,
            CAST(SUM(CAST(CAST(l_quantity AS DECIMAL(18,2)) *
              CAST(l_quantity AS DECIMAL(18,2)) AS DECIMAL(30,4))) AS DOUBLE) AS sxx,
            CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) *
              CAST(l_extendedprice AS DECIMAL(18,2)) AS DECIMAL(30,4))) AS DOUBLE) AS syy,
            CAST(SUM(CAST(CAST(l_quantity AS DECIMAL(18,2)) *
              CAST(l_extendedprice AS DECIMAL(18,2)) AS DECIMAL(30,4))) AS DOUBLE) AS sxy
          FROM lineitem GROUP BY l_returnflag)
        SELECT l_returnflag, n,
          CAST(FLOOR(
            (n * sxy - sx * sy) /
              sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
            * 1e12 + 0.5) AS BIGINT) / 1e12 AS corr_qty_price,
          (n * sxy - sx * sy) / n / n AS covar_pop
        FROM m""")),

    // ---- array higher-order functions (lambda surface) ------------------
    //      transform/filter/aggregate/slice as codegen'd lambda
    //      expressions over per-supplier price arrays — the HOF route
    //      that replaces a UDF for per-row collection math. Prices are
    //      held as integer cents (exact; a decimal accumulator would
    //      change type under lambda addition) and the array is sorted,
    //      so every fold is order-fixed on both engines.
    Q("q52_array_hof",
      (s, d) => Tables.lineitem(s, d)
        .select(col("l_suppkey"),
          (col("l_extendedprice").cast("decimal(18,2)") * 100)
            .cast("long").as("cents"))
        .groupBy("l_suppkey")
        .agg(array_sort(collect_list(col("cents"))).as("arr"))
        .select(col("l_suppkey"),
          size(col("arr")).cast("long").as("n_items"),
          expr("aggregate(arr, 0L, (acc, x) -> acc + x)").as("total_cents"),
          size(expr("filter(arr, x -> x > 500000L)")).cast("long")
            .as("n_big"),
          expr("aggregate(slice(arr, -3, 3), 0L, (acc, x) -> acc + x)")
            .as("top3_cents")),
      Some("""
        WITH a AS (
          SELECT l_suppkey, list_sort(list(
            CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)))
            AS arr
          FROM lineitem GROUP BY 1)
        SELECT l_suppkey, CAST(len(arr) AS BIGINT) AS n_items,
          list_reduce(list_prepend(CAST(0 AS BIGINT), arr),
            (acc, x) -> acc + x) AS total_cents,
          CAST(len(list_filter(arr, x -> x > 500000)) AS BIGINT) AS n_big,
          list_reduce(list_prepend(CAST(0 AS BIGINT), arr[-3:]),
            (acc, x) -> acc + x) AS top3_cents
        FROM a""")),

    // ---- SQL pipe syntax (Spark 4 |> frontend) --------------------------
    //      the linear filter->aggregate flow written in pipe syntax and
    //      executed by Spark's parser; the oracle is the equivalent ANSI
    //      form (DuckDB has no pipe dialect). Same plan as the ANSI
    //      query — this gates the FRONTEND path, not a new operator.
    Q("q53_pipe_syntax",
      (s, d) => {
        Tables.lineitem(s, d).createOrReplaceTempView("q53_lineitem")
        s.sql("""
          FROM q53_lineitem
          |> WHERE l_quantity > 10
          |> AGGREGATE COUNT(*) AS n,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                 AS sum_qty,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                 AS sum_price
             GROUP BY l_returnflag""")
      },
      Some("""
        SELECT l_returnflag, COUNT(*) AS n,
          CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
          CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
            AS sum_price
        FROM lineitem WHERE l_quantity > 10
        GROUP BY l_returnflag""")),

    // ---- deterministic mode (most-frequent value) per group -------------
    //      two-level aggregation: count per (group, value), then argmax
    //      by a lexicographic (count, value) struct max — ties broken by
    //      the larger value, so the answer is a pure function of the data
    //      (Spark's builtin `mode` is tie-nondeterministic, useless under
    //      a hash gate). Two keyed hash aggregations, partial-combined on
    //      both levels; no window, no sort — the 100 TB shape.
    Q("q54_mode_per_group",
      (s, d) => Tables.orders(s, d)
        .groupBy(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("cnt"))
        .groupBy(col("o_orderstatus"))
        .agg(max(struct(col("cnt"), col("o_orderpriority"))).as("m"))
        .select(col("o_orderstatus"),
          col("m.o_orderpriority").as("mode_priority"),
          col("m.cnt").as("mode_count")),
      Some("""
        WITH c AS (
          SELECT o_orderstatus, o_orderpriority, COUNT(*) AS cnt
          FROM orders GROUP BY 1, 2)
        SELECT o_orderstatus, o_orderpriority AS mode_priority,
          cnt AS mode_count
        FROM c
        QUALIFY ROW_NUMBER() OVER (PARTITION BY o_orderstatus
          ORDER BY cnt DESC, o_orderpriority DESC) = 1""")),

    // ---- fixed-width histogram --------------------------------------
    //      the data-profiling staple: bucket by floor(x / width) — one
    //      codegen'd projection + one keyed aggregation, no global pass
    //      to find min/max first (the literal width makes the histogram
    //      mergeable across partitions and across days at 100 TB).
    //      Bucket ids are exact (floor of a double division is the same
    //      IEEE value on both engines); sums go through decimal.
    Q("q55_histogram",
      (s, d) => Tables.orders(s, d)
        .select(floor(col("o_totalprice") / 25000.0).cast("long")
            .as("bucket"),
          col("o_totalprice"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n_orders"),
          sum(col("o_totalprice").cast("decimal(18,2)")).cast("double")
            .as("sum_price")),
      Some("""
        SELECT CAST(FLOOR(o_totalprice / 25000.0) AS BIGINT) AS bucket,
          COUNT(*) AS n_orders,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
            AS sum_price
        FROM orders GROUP BY 1""")),

    // ---- equi-depth deciles per group (q55 is equi-WIDTH) ---------------
    //      ntile(10) within each priority keyed by (price, orderkey) — a
    //      unique sort key, so bucket assignment is deterministic on any
    //      engine (ntile is order-sensitive; ties without the id column
    //      would make the gate flaky). Keyed window — the sort shuffles
    //      by o_orderpriority, never globally. Output is integer counts
    //      plus RAW min/max doubles (no arithmetic), strict-hash-safe.
    Q("q56_equidepth_deciles",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("o_orderpriority"))
          .orderBy(col("o_totalprice"), col("o_orderkey"))
        Tables.orders(s, d)
          .select(col("o_orderpriority"), col("o_totalprice"),
            ntile(10).over(w).as("decile"))
          .groupBy(col("o_orderpriority"), col("decile"))
          .agg(count(lit(1)).as("n_orders"),
            min(col("o_totalprice")).as("lo"),
            max(col("o_totalprice")).as("hi"))
      },
      Some("""
        WITH t AS (
          SELECT o_orderpriority, o_totalprice,
            NTILE(10) OVER (PARTITION BY o_orderpriority
              ORDER BY o_totalprice, o_orderkey) AS decile
          FROM orders)
        SELECT o_orderpriority, CAST(decile AS INT) AS decile,
          COUNT(*) AS n_orders, MIN(o_totalprice) AS lo,
          MAX(o_totalprice) AS hi
        FROM t GROUP BY 1, 2""")),

    // ---- SQL-frontend aggregate FILTER clauses ---------------------------
    //      the ANSI FILTER (WHERE ...) aggregate modifier through
    //      Spark's parser — one pass computes every conditional
    //      aggregate (the idiom that replaces N self-joins for "count
    //      the subsets"); the body below runs VERBATIM on both engines.
    Q("q57_filtered_agg",
      (s, d) => {
        Tables.orders(s, d).createOrReplaceTempView("q57_orders")
        s.sql(filteredAggSql("q57_orders"))
      },
      Some(filteredAggSql("orders"))),

    // ---- multiset INTERSECT ALL / EXCEPT ALL -----------------------------
    //      bag semantics through both engines' parsers, body VERBATIM on
    //      both; Spark plans these as counted-replication joins — no
    //      row-by-row dedup, stays a keyed shuffle at any scale.
    Q("q58_multiset_setops",
      (s, d) => {
        Tables.lineitem(s, d).createOrReplaceTempView("q58_lineitem")
        s.sql(multisetSql("q58_lineitem"))
      },
      Some(multisetSql("lineitem"))),

    // ---- GROUP BY ALL shorthand ------------------------------------------
    //      every non-aggregate select item becomes a grouping key — the
    //      Spark 4 / DuckDB shared dialect feature, body verbatim.
    Q("q59_group_by_all",
      (s, d) => {
        Tables.orders(s, d).createOrReplaceTempView("q59_orders")
        s.sql(groupByAllSql("q59_orders"))
      },
      Some(groupByAllSql("orders"))),

    // ---- VALUES inline table as a banding dimension ----------------------
    //      config-as-data: the band edges live in a literal VALUES table
    //      that the planner broadcasts against the fact side (a 3-row
    //      nested-loop probe, not a CASE expression someone has to edit
    //      in every query). Body verbatim on both engines.
    Q("q60_inline_bands",
      (s, d) => {
        Tables.orders(s, d).createOrReplaceTempView("q60_orders")
        s.sql(inlineBandsSql("q60_orders"))
      },
      Some(inlineBandsSql("orders"))),

    // ---- ANSI-safe arithmetic: try_divide / try_cast ---------------------
    //      error-tolerant expressions as data, not exceptions: division
    //      by zero and malformed casts become NULLs that flow through
    //      aggregation (the behavior a 100 TB job needs — one malformed
    //      row must not kill stage 40). The malformed fixture rate is
    //      0.1%, the realistic regime: try_cast absorbs failures via a
    //      caught exception PER FAILING ROW, so an always-failing
    //      try_cast is an anti-pattern (measured ~10x slower here) —
    //      gate every row through it, but expect few to fail. DuckDB
    //      spells try_divide as NULLIF-division; try_cast is shared.
    Q("q61_try_arithmetic",
      (s, d) => Tables.lineitem(s, d)
        .select(
          expr("try_divide(l_extendedprice, l_quantity - 1)").as("dv"),
          expr("""try_cast(CASE WHEN l_orderkey % 1000 = 0
              THEN concat('#', l_linenumber)
              ELSE CAST(l_linenumber AS STRING) END AS INT)""")
            .as("line_i"))
        .agg(count(lit(1)).as("n_rows"),
          sum(col("dv").isNull.cast("long")).as("n_div_by_zero"),
          sum(floor(col("dv") * 100).cast("decimal(38,0)")).cast("long")
            .as("div_cents_sum"), // PROBE
          (count(lit(1)) - count(col("line_i"))).as("n_malformed"),
          count(col("line_i")).as("n_line_casts"),
          min(col("line_i")).as("min_line")),
      Some("""
        SELECT COUNT(*) AS n_rows,
          CAST(SUM(CASE WHEN l_quantity - 1 = 0 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_div_by_zero,
          CAST(SUM(CAST(FLOOR(
            l_extendedprice / NULLIF(l_quantity - 1, 0) * 100)
            AS DECIMAL(38,0))) AS BIGINT) AS div_cents_sum,
          CAST(COUNT(*) - COUNT(TRY_CAST(CASE WHEN l_orderkey % 1000 = 0
            THEN concat('#', l_linenumber)
            ELSE CAST(l_linenumber AS VARCHAR) END AS INT)) AS BIGINT)
            AS n_malformed,
          COUNT(TRY_CAST(CASE WHEN l_orderkey % 1000 = 0
            THEN concat('#', l_linenumber)
            ELSE CAST(l_linenumber AS VARCHAR) END AS INT)) AS n_line_casts,
          CAST(MIN(TRY_CAST(CASE WHEN l_orderkey % 1000 = 0
            THEN concat('#', l_linenumber)
            ELSE CAST(l_linenumber AS VARCHAR) END AS INT)) AS INT)
            AS min_line
        FROM lineitem"""))
  )

  /** dialect-shared VALUES-banding body (see q60) */
  private def inlineBandsSql(orders: String): String = s"""
    WITH bands AS (
      SELECT * FROM (VALUES
        ('small', 0, 150000),
        ('mid', 150000, 300000),
        ('big', 300000, 1000000)) AS t(band, lo, hi))
    SELECT b.band, COUNT(*) AS n_orders,
      CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS rev
    FROM $orders o JOIN bands b
      ON o.o_totalprice >= b.lo AND o.o_totalprice < b.hi
    GROUP BY b.band"""

  /** dialect-shared GROUP BY ALL body (see q59) */
  private def groupByAllSql(orders: String): String = s"""
    SELECT o_orderpriority, o_orderstatus, COUNT(*) AS n,
      CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS rev
    FROM $orders GROUP BY ALL"""

  /** dialect-shared FILTER-clause aggregation (see q57) */
  private def filteredAggSql(orders: String): String = s"""
    SELECT o_orderpriority,
      COUNT(*) AS n_all,
      COUNT(*) FILTER (WHERE o_totalprice > 200000) AS n_big,
      COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_finished,
      CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
        FILTER (WHERE o_orderstatus = 'F') AS DOUBLE) AS rev_finished
    FROM $orders GROUP BY o_orderpriority"""

  /** dialect-shared multiset set-ops body (see q58): INTERSECT ALL keeps
    * min(multiplicity), EXCEPT ALL subtracts it — the bag semantics the
    * DISTINCT forms in q10 erase. Lineitem supplier/part key streams
    * have real multiplicity, so the ALL and DISTINCT answers differ. */
  private def multisetSql(lineitem: String): String = s"""
    SELECT 'intersect_all' AS op, COUNT(*) AS n_rows,
      COUNT(DISTINCT k) AS n_keys
    FROM (
      SELECT l_suppkey AS k FROM $lineitem WHERE l_quantity < 10
      INTERSECT ALL
      SELECT l_suppkey FROM $lineitem WHERE l_discount > 0.05)
    UNION ALL
    SELECT 'except_all', COUNT(*), COUNT(DISTINCT k)
    FROM (
      SELECT l_suppkey AS k FROM $lineitem WHERE l_quantity < 10
      EXCEPT ALL
      SELECT l_suppkey FROM $lineitem WHERE l_discount > 0.05)"""
}
