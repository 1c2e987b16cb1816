package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.io.Tables
import graft.ops.TripMetrics

/** Oracle-checked parity queries for the reference's core transform — the
  * 10 derived trip columns (nyc_taxi_etl.py:50-100) — exercised through
  * `TripMetrics.withTripMetrics` on a taxi-shaped frame built
  * deterministically from the `orders` table.
  *
  * Value-grid discipline: every double the oracle hashes is either an
  * exact binary fraction (quarters/halves — so double→string rendering in
  * `trip_summary` is identical across Spark and DuckDB) or the result of
  * the same left-to-right IEEE double expression on both sides (guarded
  * divisions in speed/tip/cost — bit-identical without any decimal
  * detour). Null injection on ~1% of rows exercises the any-null row drop
  * (nyc_taxi_etl.py:53); DuckDB mirrors it with an explicit WHERE.
  *
  * Scale note: the whole surface is row-local projection + filter — no
  * shuffle at any size; Catalyst collapses the withColumn chain into one
  * Project over the scan (SURVEY.md §4.1).
  */
object TripParity {

  /** Deterministic taxi-shaped frame: timestamps at 30-second granularity
    * (durations = multiples of 0.5 min), money/distance in exact quarters
    * and halves, location ids covering the airport set {1,2,3} and not. */
  def taxiFrame(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d).select(
      col("o_orderkey"),
      expr("timestampadd(HOUR, CAST(o_orderkey % 24 AS INT), o_orderdate)")
        .as("tpep_pickup_datetime"),
      expr("timestampadd(SECOND, CAST((o_orderkey % 40) * 30 AS INT), " +
        "timestampadd(HOUR, CAST(o_orderkey % 24 AS INT), o_orderdate))")
        .as("tpep_dropoff_datetime"),
      ((col("o_orderkey") % 80).cast("double") / 4.0).as("trip_distance"),
      when(col("o_orderkey") % 97 === 0, lit(null).cast("double"))
        .otherwise((col("o_custkey") % 9).cast("double") / 2.0)
        .as("passenger_count"),
      ((col("o_custkey") % 50).cast("double") / 2.0).as("fare_amount"),
      when(col("o_orderkey") % 89 === 0, lit(null).cast("double"))
        .otherwise((col("o_orderkey") % 20).cast("double") / 4.0)
        .as("tip_amount"),
      (col("o_orderkey") % 7).cast("int").as("PULocationID"),
      (col("o_custkey") % 11).cast("int").as("DOLocationID"))
      .withColumn("total_amount", col("fare_amount") + col("tip_amount"))

  /** DuckDB mirror of [[taxiFrame]] + the reference's any-null drop. */
  private val taxiCte = """
    WITH taxi AS (
      SELECT o_orderkey,
        o_orderdate + INTERVAL (o_orderkey % 24) HOUR AS pickup,
        o_orderdate + INTERVAL (o_orderkey % 24) HOUR
          + INTERVAL ((o_orderkey % 40) * 30) SECOND AS dropoff,
        CAST(o_orderkey % 80 AS DOUBLE) / 4.0 AS trip_distance,
        CAST(o_custkey % 9 AS DOUBLE) / 2.0 AS passenger_count,
        CAST(o_custkey % 50 AS DOUBLE) / 2.0 AS fare_amount,
        CAST(o_orderkey % 20 AS DOUBLE) / 4.0 AS tip_amount,
        CAST(o_custkey % 50 AS DOUBLE) / 2.0
          + CAST(o_orderkey % 20 AS DOUBLE) / 4.0 AS total_amount,
        CAST(o_orderkey % 7 AS INTEGER) AS pu_loc,
        CAST(o_custkey % 11 AS INTEGER) AS do_loc
      FROM orders
      WHERE o_orderkey % 97 <> 0 AND o_orderkey % 89 <> 0),
    metrics AS (
      SELECT *, (epoch(dropoff) - epoch(pickup)) / 60.0 AS trip_duration
      FROM taxi)
  """

  val qs: Seq[Q] = Seq(

    // ---- the 8 numeric/boolean derived columns (P1-P9) ------------------
    Q("p01_tripmetrics_core",
      (s, d) => TripMetrics.withTripMetrics(taxiFrame(s, d))
        .select(col("o_orderkey"), col("trip_duration"), col("speed_mph"),
          col("is_airport_trip"), col("tip_percentage"), col("cost_per_mile"),
          col("pickup_hour").cast("long").as("pickup_hour"),
          col("is_peak_hour")),
      Some(taxiCte + """
        SELECT o_orderkey, trip_duration,
          CASE WHEN trip_duration <> 0
               THEN trip_distance / (trip_duration / 60.0) END AS speed_mph,
          (pu_loc IN (1,2,3) OR do_loc IN (1,2,3)) AS is_airport_trip,
          CASE WHEN fare_amount <> 0
               THEN tip_amount / fare_amount * 100.0 END AS tip_percentage,
          CASE WHEN trip_distance <> 0
               THEN total_amount / trip_distance END AS cost_per_mile,
          CAST(EXTRACT(hour FROM pickup) AS BIGINT) AS pickup_hour,
          (EXTRACT(hour FROM pickup) BETWEEN 7 AND 9
             OR EXTRACT(hour FROM pickup) BETWEEN 17 AND 19) AS is_peak_hour
        FROM metrics""")),

    // ---- trip_summary (P10): concat_ws with truncating int cast ---------
    Q("p02_trip_summary",
      (s, d) => TripMetrics.withTripMetrics(taxiFrame(s, d))
        .select(col("o_orderkey"), col("trip_summary")),
      Some(taxiCte + """
        SELECT o_orderkey,
          CONCAT_WS(' ', 'Trip from location', CAST(pu_loc AS VARCHAR),
            'to', CAST(do_loc AS VARCHAR),
            'with', CAST(CAST(TRUNC(passenger_count) AS INTEGER) AS VARCHAR),
            'passenger(s), covering', CAST(trip_distance AS VARCHAR),
            'miles in', CAST(trip_duration AS VARCHAR),
            'minutes.') AS trip_summary
        FROM metrics""")),

    // ---- any-null row drop (P1): kept vs input counts -------------------
    Q("p03_nulldrop",
      (s, d) => {
        val frame = taxiFrame(s, d)
        frame.na.drop().agg(count(lit(1)).as("n_kept"))
          .crossJoin(frame.agg(count(lit(1)).as("n_input")))
          .select(col("n_input"), col("n_kept"),
            (col("n_input") - col("n_kept")).as("n_dropped"))
      },
      Some("""
        SELECT (SELECT COUNT(*) FROM orders) AS n_input,
               (SELECT COUNT(*) FROM orders
                WHERE o_orderkey % 97 <> 0 AND o_orderkey % 89 <> 0) AS n_kept,
               (SELECT COUNT(*) FROM orders) -
               (SELECT COUNT(*) FROM orders
                WHERE o_orderkey % 97 <> 0 AND o_orderkey % 89 <> 0) AS n_dropped"""))
  )
}
