package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType

/** The reference's full transform surface as pure `Column` builders.
  *
  * Replicates the 10 derived columns of the reference ETL
  * (nyc_taxi_etl.py:50-100) with exact null-guard semantics:
  * `when(cond, e).otherwise(null)` yields null when the guard is false,
  * `trip_duration` may be negative (no filter removes dropoff < pickup),
  * `passenger_count` is truncated toward zero via an int cast before
  * stringification (nyc_taxi_etl.py:90), and the peak-hour `between`
  * bounds are inclusive on both ends (nyc_taxi_etl.py:79).
  *
  * Everything here is a stock Catalyst expression — the whole transform
  * stays inside whole-stage codegen, and per-partition application equals
  * whole-table application (all expressions are row-local), which is the
  * invariant that made the reference's chunked execution correct
  * (SURVEY.md §1.5).
  */
object TripMetrics {

  /** minutes between two timestamps, second precision (unix_timestamp
    * truncates sub-second) — nyc_taxi_etl.py:56-59 */
  def tripDurationMin(pickup: Column, dropoff: Column): Column =
    (unix_timestamp(dropoff) - unix_timestamp(pickup)) / 60.0

  /** mph; null when duration == 0 — nyc_taxi_etl.py:60-63 */
  def speedMph(distance: Column, durationMin: Column): Column =
    when(durationMin =!= 0, distance / (durationMin / 60.0))
      .otherwise(lit(null))

  /** either endpoint in locations {1,2,3} — nyc_taxi_etl.py:64-67 */
  def isAirportTrip(puLoc: Column, doLoc: Column): Column =
    puLoc.isin(1, 2, 3) || doLoc.isin(1, 2, 3)

  /** tip as % of fare; null when fare == 0 — nyc_taxi_etl.py:68-71 */
  def tipPercentage(tip: Column, fare: Column): Column =
    when(fare =!= 0, tip / fare * 100.0).otherwise(lit(null))

  /** $/mile; null when distance == 0 — nyc_taxi_etl.py:72-75 */
  def costPerMile(total: Column, distance: Column): Column =
    when(distance =!= 0, total / distance).otherwise(lit(null))

  /** hour-of-day of pickup — nyc_taxi_etl.py:76 */
  def pickupHour(pickup: Column): Column = hour(pickup)

  /** 7-9 or 17-19 inclusive, never null — nyc_taxi_etl.py:77-80 */
  def isPeakHour(hourCol: Column): Column =
    when(hourCol.between(7, 9) || hourCol.between(17, 19), lit(true))
      .otherwise(lit(false))

  /** human-readable summary string — nyc_taxi_etl.py:81-97; the int cast
    * on passengers truncates fractional counts toward zero */
  def tripSummary(puLoc: Column, doLoc: Column, passengers: Column,
                  distance: Column, durationMin: Column): Column =
    concat_ws(" ",
      lit("Trip from location"), puLoc.cast("string"),
      lit("to"), doLoc.cast("string"),
      lit("with"), passengers.cast(IntegerType).cast("string"),
      lit("passenger(s), covering"), distance.cast("string"),
      lit("miles in"), durationMin.cast("string"), lit("minutes."))

  /** The complete reference transform: any-null row drop
    * (nyc_taxi_etl.py:53) then all derived columns appended, source
    * columns untouched (the reference never prunes — SURVEY.md §1.3). */
  def withTripMetrics(df: DataFrame): DataFrame = {
    val cleaned = df.na.drop()
      .withColumn("tpep_pickup_datetime", to_timestamp(col("tpep_pickup_datetime")))
      .withColumn("tpep_dropoff_datetime", to_timestamp(col("tpep_dropoff_datetime")))
    cleaned
      .withColumn("trip_duration",
        tripDurationMin(col("tpep_pickup_datetime"), col("tpep_dropoff_datetime")))
      .withColumn("speed_mph", speedMph(col("trip_distance"), col("trip_duration")))
      .withColumn("is_airport_trip", isAirportTrip(col("PULocationID"), col("DOLocationID")))
      .withColumn("tip_percentage", tipPercentage(col("tip_amount"), col("fare_amount")))
      .withColumn("cost_per_mile", costPerMile(col("total_amount"), col("trip_distance")))
      .withColumn("pickup_hour", pickupHour(col("tpep_pickup_datetime")))
      .withColumn("is_peak_hour", isPeakHour(col("pickup_hour")))
      .withColumn("trip_summary",
        tripSummary(col("PULocationID"), col("DOLocationID"), col("passenger_count"),
          col("trip_distance"), col("trip_duration")))
  }
}
