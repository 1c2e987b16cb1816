package graft

import java.sql.Timestamp
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.ops.TripMetrics

/** Property tests for the reference transform's null-guard and rounding
  * semantics (SURVEY.md §1.4, §5 item 3): scalacheck generates adversarial
  * trip rows — zero durations/fares/distances, negative durations,
  * fractional and negative passenger counts, boundary hours — and every
  * invariant is checked on the REAL Spark output for the whole batch. */
case class Trip(tpep_pickup_datetime: Timestamp,
                tpep_dropoff_datetime: Timestamp,
                trip_distance: Double, PULocationID: Int,
                DOLocationID: Int, fare_amount: Double,
                tip_amount: Double, total_amount: Double,
                passenger_count: Double)

class TripMetricsPropertySpec extends SparkSpec {
  import spark.implicits._

  private val base = Timestamp.valueOf("2024-01-15 00:00:00").getTime

  private val genTrip: Gen[Trip] = for {
    // offsets in whole seconds; dropoff may precede pickup (real TLC data)
    pickS <- Gen.chooseNum(0L, 72 * 3600L)
    durS <- Gen.oneOf(Gen.const(0L), Gen.chooseNum(-3600L, 4 * 3600L))
    dist <- Gen.oneOf(Gen.const(0.0), Gen.chooseNum(0.1, 80.0))
    pu <- Gen.chooseNum(1, 260)
    doL <- Gen.chooseNum(1, 260)
    fare <- Gen.oneOf(Gen.const(0.0), Gen.chooseNum(2.5, 300.0))
    tip <- Gen.chooseNum(0.0, 60.0)
    total <- Gen.chooseNum(0.0, 400.0)
    pax <- Gen.oneOf(Gen.const(0.0), Gen.chooseNum(-2.9, 6.9))
  } yield Trip(new Timestamp(base + pickS * 1000),
    new Timestamp(base + (pickS + durS) * 1000),
    dist, pu, doL, fare, tip, total, pax)

  test("derived-column invariants hold on 400 generated adversarial rows") {
    val trips = Gen.listOfN(400, genTrip)
      .apply(Gen.Parameters.default, Seed(42L)).get
    val out = TripMetrics.withTripMetrics(trips.toDF()).collect()
    assert(out.length == trips.length) // no nulls generated -> na.drop keeps all

    out.foreach { r =>
      val pickup = r.getAs[Timestamp]("tpep_pickup_datetime")
      val dropoff = r.getAs[Timestamp]("tpep_dropoff_datetime")
      val dur = r.getAs[Double]("trip_duration")
      val dist = r.getAs[Double]("trip_distance")
      val fare = r.getAs[Double]("fare_amount")
      val pax = r.getAs[Double]("passenger_count")

      // duration: second-precision minutes, sign preserved
      assert(dur == (dropoff.getTime - pickup.getTime) / 1000.0 / 60.0)
      // guarded divisions: null exactly when the guard is zero
      assert(r.isNullAt(r.fieldIndex("speed_mph")) == (dur == 0.0))
      if (dur != 0.0)
        assert(r.getAs[Double]("speed_mph") == dist / (dur / 60.0))
      assert(r.isNullAt(r.fieldIndex("tip_percentage")) == (fare == 0.0))
      assert(r.isNullAt(r.fieldIndex("cost_per_mile")) == (dist == 0.0))
      // airport membership
      val airport = Set(1, 2, 3)
      assert(r.getAs[Boolean]("is_airport_trip") ==
        (airport(r.getAs[Int]("PULocationID")) ||
          airport(r.getAs[Int]("DOLocationID"))))
      // peak hour: inclusive bounds, never null
      val h = r.getAs[Int]("pickup_hour")
      assert(r.getAs[Boolean]("is_peak_hour") ==
        ((h >= 7 && h <= 9) || (h >= 17 && h <= 19)))
      // summary carries the toward-zero truncated passenger count
      assert(r.getAs[String]("trip_summary")
        .contains(s"with ${pax.toInt} passenger(s)"))
    }
  }

  test("per-partition application equals whole-table application") {
    val trips = Gen.listOfN(200, genTrip)
      .apply(Gen.Parameters.default, Seed(7L)).get
    val whole = TripMetrics.withTripMetrics(trips.toDF())
      .orderBy("tpep_pickup_datetime", "trip_summary").collect().toSeq
    val chunked = TripMetrics.withTripMetrics(trips.toDF().repartition(13))
      .orderBy("tpep_pickup_datetime", "trip_summary").collect().toSeq
    assert(whole == chunked) // SURVEY §1.5: row-local transform
  }
}
