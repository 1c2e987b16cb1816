package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.io.Tables

/** Relational operator surface over the star-schema testdata: scans,
  * filters/projections, joins (broadcast/sort-merge/semi/anti), hash
  * aggregation, rollup/cube, windows, top-k, set ops, scalar functions.
  *
  * The reference itself has none of these beyond a null-filter and ten
  * projections (SURVEY.md §2.3-§2.6 "Absent" rows) — this is the standard
  * analytics surface the engine provides on top of reference parity.
  *
  * Scale notes (100 TB discipline):
  *  - dimension joins (region/nation/supplier) are explicitly
  *    `broadcast(...)` — no shuffle of the fact side;
  *  - fact-fact joins (orders⋈lineitem) shuffle on the join key and rely
  *    on AQE for runtime coalescing/skew handling;
  *  - every aggregate is a single-pass partial+final hash agg (no
  *    driver-side collects anywhere);
  *  - filters/projections sit directly on the scan so Catalyst pushes
  *    predicates and prunes columns into the parquet reader.
  */
object Relational {

  /** Exact-decimal cast for money/qty doubles: aggregation goes through
    * DECIMAL on both the Spark and DuckDB side so the final double is
    * bit-identical regardless of partial-aggregation order. */
  private def dec(c: Column): Column = c.cast("decimal(18,2)")
  private val one: Column = lit(1).cast("decimal(18,2)")

  /** l_extendedprice * (1 - l_discount) as exact decimal(30,4) —
    * package-visible so every revenue query (q04, q31, q43) shares ONE
    * definition with its SQL twin below. */
  private[queries] def discPrice(): Column =
    (dec(col("l_extendedprice")) * (one - dec(col("l_discount"))))
      .cast("decimal(30,4)")

  private[queries] val discPriceSql =
    "CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * " +
      "(CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) " +
      "AS DECIMAL(30,4))"

  val qs: Seq[Q] = Seq(

    // ---- aggregation ----------------------------------------------------
    Q("q01_agg",
      (s, d) => Tables.lineitem(s, d)
        .filter(col("l_shipdate") <= lit("1998-09-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum(dec(col("l_quantity"))).cast("double").as("sum_qty"),
          sum(dec(col("l_extendedprice"))).cast("double").as("sum_base_price"),
          sum(discPrice()).cast("double").as("sum_disc_price"),
          (sum(dec(col("l_quantity"))).cast("double") / count(lit(1))).as("avg_qty"),
          count(lit(1)).as("count_order")),
      Some("""
        SELECT l_returnflag, l_linestatus,
          CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
          CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
          CAST(SUM(""" + discPriceSql + """) AS DOUBLE) AS sum_disc_price,
          CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
          COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-01'
        GROUP BY l_returnflag, l_linestatus""")),

    // ---- filter + projection (pushdown-friendly: both sit on the scan) --
    Q("q02_filter_project",
      (s, d) => Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
          col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
        .select(col("l_orderkey"), col("l_linenumber"),
          (dec(col("l_extendedprice")) * dec(col("l_discount")))
            .cast("double").as("disc_revenue")),
      Some("""
        SELECT l_orderkey, l_linenumber,
          CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2)) AS DOUBLE) AS disc_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
          AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""")),

    // ---- broadcast dimension join chain ---------------------------------
    Q("q03_join_broadcast",
      (s, d) => Tables.customer(s, d)
        .join(broadcast(Tables.nation(s, d)),
          col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, d)),
          col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name")
        .agg(count(lit(1)).as("n_customers"),
          sum(dec(col("c_acctbal"))).cast("double").as("sum_acctbal")),
      Some("""
        SELECT r_name, COUNT(*) AS n_customers,
          CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_acctbal
        FROM customer JOIN nation ON c_nationkey = n_nationkey
          JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name""")),

    // ---- fact-fact shuffle join (sort-merge / AQE-decided) --------------
    Q("q04_join_factfact",
      (s, d) => Tables.orders(s, d)
        .join(Tables.lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
        .groupBy("o_orderpriority")
        .agg(sum(discPrice()).cast("double").as("revenue"),
          countDistinct(col("o_orderkey")).as("n_orders")),
      Some("""
        SELECT o_orderpriority,
          CAST(SUM(""" + discPriceSql + """) AS DOUBLE) AS revenue,
          COUNT(DISTINCT o_orderkey) AS n_orders
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        GROUP BY o_orderpriority""")),

    // ---- semi join (EXISTS) ---------------------------------------------
    Q("q05_join_semi",
      (s, d) => Tables.customer(s, d)
        .join(Tables.orders(s, d)
            .filter(col("o_orderdate") >= lit("1998-01-01").cast("timestamp")),
          col("c_custkey") === col("o_custkey"), "left_semi")
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_active")),
      Some("""
        SELECT c_mktsegment, COUNT(*) AS n_active
        FROM customer
        WHERE EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderdate >= TIMESTAMP '1998-01-01')
        GROUP BY c_mktsegment""")),

    // ---- anti join (NOT EXISTS) -----------------------------------------
    Q("q06_join_anti",
      (s, d) => Tables.customer(s, d)
        .join(Tables.orders(s, d)
            .filter(col("o_orderdate") >= lit("2000-01-01").cast("timestamp")),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_mktsegment")),
      Some("""
        SELECT c_custkey, c_mktsegment FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                          AND o_orderdate >= TIMESTAMP '2000-01-01')""")),

    // ---- window: ranking (top-3 orders per customer) --------------------
    Q("q07_window_rank",
      (s, d) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        Tables.orders(s, d)
          .withColumn("rn", row_number().over(w).cast("long"))
          .withColumn("rnk", rank().over(w).cast("long"))
          .filter(col("rn") <= 3)
          .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
            col("rn"), col("rnk"))
      },
      Some("""
        SELECT o_custkey, o_orderkey, o_totalprice, rn, rnk FROM (
          SELECT o_custkey, o_orderkey, o_totalprice,
            ROW_NUMBER() OVER w AS rn, RANK() OVER w AS rnk
          FROM orders
          WINDOW w AS (PARTITION BY o_custkey
                       ORDER BY o_totalprice DESC, o_orderkey ASC))
        WHERE rn <= 3""")),

    // ---- window: running/frame aggregates + lag/lead --------------------
    Q("q08_window_running",
      (s, d) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
        Tables.orders(s, d)
          .withColumn("running_spend",
            sum(dec(col("o_totalprice")))
              .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
              .cast("double"))
          .withColumn("prev_price", lag(col("o_totalprice"), 1).over(w))
          .withColumn("next_price", lead(col("o_totalprice"), 1).over(w))
          .select(col("o_custkey"), col("o_orderkey"), col("running_spend"),
            col("prev_price"), col("next_price"))
      },
      Some("""
        SELECT o_custkey, o_orderkey,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER
            (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend,
          LAG(o_totalprice, 1) OVER w AS prev_price,
          LEAD(o_totalprice, 1) OVER w AS next_price
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC)""")),

    // ---- top-k (TakeOrderedAndProject physically — no full sort) --------
    Q("q09_topk",
      (s, d) => Tables.orders(s, d)
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(10)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice")),
      Some("""
        SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10""")),

    // ---- set operations --------------------------------------------------
    Q("q10_setops",
      (s, d) => {
        val building = Tables.customer(s, d)
          .filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
        val rich = Tables.customer(s, d)
          .filter(col("c_acctbal") > 5000).select("c_custkey")
        building.intersect(rich).withColumn("op", lit("intersect"))
          .unionByName(building.exceptAll(rich).distinct()
            .withColumn("op", lit("except")))
      },
      Some("""
        SELECT c_custkey, 'intersect' AS op FROM
          (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
           INTERSECT
           SELECT c_custkey FROM customer WHERE c_acctbal > 5000)
        UNION ALL
        SELECT c_custkey, 'except' AS op FROM
          (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
           EXCEPT
           SELECT c_custkey FROM customer WHERE c_acctbal > 5000)""")),

    // ---- distinct --------------------------------------------------------
    Q("q11_distinct",
      (s, d) => Tables.customer(s, d)
        .select(col("c_nationkey"), col("c_mktsegment")).distinct(),
      Some("SELECT DISTINCT c_nationkey, c_mktsegment FROM customer")),

    // ---- rollup ----------------------------------------------------------
    Q("q12_rollup",
      (s, d) => Tables.lineitem(s, d)
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(dec(col("l_quantity"))).cast("double").as("sum_qty"),
          count(lit(1)).as("n"))
        .select(coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
          col("sum_qty"), col("n")),
      Some("""
        SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
               COALESCE(l_linestatus, 'ALL') AS linestatus,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
               COUNT(*) AS n
        FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)""")),

    // ---- cube ------------------------------------------------------------
    Q("q13_cube",
      (s, d) => Tables.orders(s, d)
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"))
        .select(coalesce(col("o_orderstatus"), lit("ALL")).as("orderstatus"),
          coalesce(col("o_orderpriority"), lit("ALL")).as("orderpriority"),
          col("n")),
      Some("""
        SELECT COALESCE(o_orderstatus, 'ALL') AS orderstatus,
               COALESCE(o_orderpriority, 'ALL') AS orderpriority,
               COUNT(*) AS n
        FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)""")),

    // ---- scalar function surface (string/date/math/conditional) ---------
    Q("q14_scalar_funcs",
      (s, d) => Tables.orders(s, d).select(
        col("o_orderkey"),
        upper(col("o_orderpriority")).as("prio_upper"),
        substring(col("o_orderpriority"), 1, 1).as("prio_code"),
        length(col("o_orderpriority")).cast("long").as("prio_len"),
        concat_ws("-", col("o_orderstatus"), col("o_orderpriority")).as("status_prio"),
        year(col("o_orderdate")).cast("long").as("y"),
        month(col("o_orderdate")).cast("long").as("m"),
        dayofmonth(col("o_orderdate")).cast("long").as("dom"),
        floor(col("o_totalprice")).as("price_floor"),
        abs(col("o_totalprice") - 1000.0).as("dist_1000"),
        (col("o_orderkey") % 7).as("key_mod7"),
        greatest(col("o_totalprice"), lit(50000.0)).as("price_hi"),
        when(col("o_orderstatus") === "F", lit("final"))
          .when(col("o_orderstatus") === "O", lit("open"))
          .otherwise(lit("other")).as("status_word")),
      Some("""
        SELECT o_orderkey,
          UPPER(o_orderpriority) AS prio_upper,
          SUBSTRING(o_orderpriority, 1, 1) AS prio_code,
          CAST(LENGTH(o_orderpriority) AS BIGINT) AS prio_len,
          CONCAT_WS('-', o_orderstatus, o_orderpriority) AS status_prio,
          CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS y,
          CAST(EXTRACT(month FROM o_orderdate) AS BIGINT) AS m,
          CAST(EXTRACT(day FROM o_orderdate) AS BIGINT) AS dom,
          CAST(FLOOR(o_totalprice) AS BIGINT) AS price_floor,
          ABS(o_totalprice - 1000.0) AS dist_1000,
          o_orderkey % 7 AS key_mod7,
          GREATEST(o_totalprice, 50000.0) AS price_hi,
          CASE WHEN o_orderstatus = 'F' THEN 'final'
               WHEN o_orderstatus = 'O' THEN 'open'
               ELSE 'other' END AS status_word
        FROM orders""")),

    // ---- having (post-aggregation filter) -------------------------------
    Q("q15_having",
      (s, d) => Tables.customer(s, d)
        .groupBy("c_nationkey")
        .agg(count(lit(1)).as("n_customers"),
          (sum(dec(col("c_acctbal"))).cast("double") / count(lit(1))).as("avg_acctbal"))
        .filter(col("n_customers") >= 5),
      Some("""
        SELECT c_nationkey, COUNT(*) AS n_customers,
          CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_acctbal
        FROM customer GROUP BY c_nationkey HAVING COUNT(*) >= 5""")),

    // ---- count distinct (exact) -----------------------------------------
    Q("q16_countdistinct",
      (s, d) => Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(countDistinct(col("l_partkey")).as("n_parts"),
          countDistinct(col("l_suppkey")).as("n_supps"),
          count(lit(1)).as("n_rows")),
      Some("""
        SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS n_parts,
          COUNT(DISTINCT l_suppkey) AS n_supps, COUNT(*) AS n_rows
        FROM lineitem GROUP BY l_returnflag""")),

    // ---- approx distinct (HLL sketch). The sketch value itself isn't
    //      oracle-comparable, so the query emits the exact count plus a
    //      deterministic "HLL within 10% of exact" boolean — on fixed data
    //      Spark's HLL is deterministic, so the oracle asserts TRUE. ------
    Q("q17_approx_distinct",
      (s, d) => Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(countDistinct(col("l_partkey")).as("exact_parts"),
          approx_count_distinct(col("l_partkey")).as("approx_raw"))
        .select(col("l_returnflag"), col("exact_parts"),
          (abs(col("approx_raw") - col("exact_parts")).cast("double") /
            col("exact_parts") <= 0.1).as("within_10pct")),
      Some("""
        SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS exact_parts,
          TRUE AS within_10pct
        FROM lineitem GROUP BY l_returnflag""")),

    // ---- case-band aggregation ------------------------------------------
    Q("q18_case_bands",
      (s, d) => Tables.orders(s, d)
        .select(when(col("o_totalprice") < 50000, lit("low"))
          .when(col("o_totalprice") < 150000, lit("mid"))
          .otherwise(lit("high")).as("band"))
        .groupBy("band").agg(count(lit(1)).as("n")),
      Some("""
        SELECT CASE WHEN o_totalprice < 50000 THEN 'low'
                    WHEN o_totalprice < 150000 THEN 'mid'
                    ELSE 'high' END AS band, COUNT(*) AS n
        FROM orders GROUP BY 1""")),

    // ---- union-by-name over heterogeneous relations ---------------------
    Q("q19_union_entities",
      (s, d) => Tables.customer(s, d)
        .select(col("c_name").as("name"), col("c_acctbal").as("acctbal"),
          lit("customer").as("kind"))
        .unionByName(Tables.supplier(s, d)
          .select(col("s_name").as("name"), col("s_acctbal").as("acctbal"),
            lit("supplier").as("kind"))),
      Some("""
        SELECT c_name AS name, c_acctbal AS acctbal, 'customer' AS kind FROM customer
        UNION ALL
        SELECT s_name AS name, s_acctbal AS acctbal, 'supplier' AS kind FROM supplier""")),

    // ---- multi-way star join (5 tables, mixed broadcast + shuffle) ------
    Q("q20_star_join",
      (s, d) => Tables.lineitem(s, d)
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name")
        .agg(sum(discPrice()).cast("double").as("revenue"),
          count(lit(1)).as("n_lineitems")),
      Some("""
        SELECT r_name,
          CAST(SUM(""" + discPriceSql + """) AS DOUBLE) AS revenue,
          COUNT(*) AS n_lineitems
        FROM lineitem
          JOIN orders ON l_orderkey = o_orderkey
          JOIN customer ON o_custkey = c_custkey
          JOIN nation ON c_nationkey = n_nationkey
          JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name"""))
  )
}
