package graft

import java.sql.Timestamp
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import graft.ops.TripMetrics

/** Parity tests for the reference transform semantics (SURVEY.md §1.4,
  * FIXTURES.md §1): null guards, negative durations, truncating int cast,
  * inclusive peak-hour bounds, any-null row drop. */
class TripMetricsSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("tpep_pickup_datetime", TimestampType),
    StructField("tpep_dropoff_datetime", TimestampType),
    StructField("passenger_count", DoubleType),
    StructField("trip_distance", DoubleType),
    StructField("PULocationID", IntegerType),
    StructField("DOLocationID", IntegerType),
    StructField("fare_amount", DoubleType),
    StructField("tip_amount", DoubleType),
    StructField("total_amount", DoubleType),
    StructField("VendorID", LongType)))

  private def ts(s: String) = Timestamp.valueOf(s)

  private def fixture = spark.createDataFrame(
    spark.sparkContext.parallelize(Seq(
      // ordinary trip, peak morning hour 8
      Row(ts("2024-01-15 08:00:00"), ts("2024-01-15 08:30:00"),
        2.0, 6.0, 1, 100, 20.0, 5.0, 27.0, 1L),
      // zero duration -> speed_mph null; hour 10 off-peak
      Row(ts("2024-01-15 10:00:00"), ts("2024-01-15 10:00:00"),
        1.0, 1.0, 50, 50, 10.0, 0.0, 11.0, 1L),
      // negative duration (dropoff < pickup), hour 19 boundary peak
      Row(ts("2024-01-15 19:59:00"), ts("2024-01-15 19:49:00"),
        1.5, 2.0, 4, 3, 8.0, 2.0, 12.0, 1L),
      // zero fare -> tip_percentage null; zero distance -> cost_per_mile null
      Row(ts("2024-01-15 06:59:00"), ts("2024-01-15 07:09:00"),
        3.0, 0.0, 7, 8, 0.0, 1.0, 1.0, 1L),
      // null passenger_count -> whole row dropped by na.drop
      Row(ts("2024-01-15 12:00:00"), ts("2024-01-15 12:10:00"),
        null, 1.0, 9, 9, 5.0, 1.0, 6.5, 1L))),
    schema)

  private lazy val out = TripMetrics.withTripMetrics(fixture)
    .orderBy("tpep_pickup_datetime").collect()

  test("na.drop removes any-null rows only") {
    assert(out.length == 4)
  }

  test("trip_duration in minutes, negative allowed") {
    val byHour = out.map(r => r.getAs[Int]("pickup_hour") -> r).toMap
    assert(byHour(8).getAs[Double]("trip_duration") == 30.0)
    assert(byHour(19).getAs[Double]("trip_duration") == -10.0)
  }

  test("speed_mph null on zero duration, else distance/hours") {
    val byHour = out.map(r => r.getAs[Int]("pickup_hour") -> r).toMap
    assert(byHour(10).isNullAt(byHour(10).fieldIndex("speed_mph")))
    assert(byHour(8).getAs[Double]("speed_mph") == 12.0) // 6 mi / 0.5 h
  }

  test("tip_percentage / cost_per_mile null guards") {
    val r = out.find(_.getAs[Int]("pickup_hour") == 6).get
    assert(r.isNullAt(r.fieldIndex("tip_percentage"))) // fare 0
    assert(r.isNullAt(r.fieldIndex("cost_per_mile")))  // distance 0
    val r8 = out.find(_.getAs[Int]("pickup_hour") == 8).get
    assert(r8.getAs[Double]("tip_percentage") == 25.0)
    assert(r8.getAs[Double]("cost_per_mile") == 4.5)
  }

  test("is_airport_trip via isin on either endpoint") {
    val byHour = out.map(r => r.getAs[Int]("pickup_hour") -> r).toMap
    assert(byHour(8).getAs[Boolean]("is_airport_trip"))   // PU=1
    assert(!byHour(10).getAs[Boolean]("is_airport_trip")) // 50/50
    assert(byHour(19).getAs[Boolean]("is_airport_trip"))  // DO=3
  }

  test("is_peak_hour inclusive bounds: 8 and 19 peak; 6 and 10 not") {
    val byHour = out.map(r => r.getAs[Int]("pickup_hour") -> r).toMap
    assert(byHour(8).getAs[Boolean]("is_peak_hour"))
    assert(byHour(19).getAs[Boolean]("is_peak_hour"))
    assert(!byHour(6).getAs[Boolean]("is_peak_hour"))
    assert(!byHour(10).getAs[Boolean]("is_peak_hour"))
  }

  test("trip_summary truncates fractional passengers toward zero") {
    val r = out.find(_.getAs[Int]("pickup_hour") == 19).get
    val s = r.getAs[String]("trip_summary")
    assert(s == "Trip from location 4 to 3 with 1 passenger(s), " +
      "covering 2.0 miles in -10.0 minutes.")
  }

  test("source columns are carried through untouched") {
    assert(out.head.schema.fieldNames.contains("VendorID"))
  }
}
