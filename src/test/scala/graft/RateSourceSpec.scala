package graft

import org.apache.spark.sql.functions._

/** The streaming surface is source-AGNOSTIC, demonstrated on a non-file
  * source: `rate-micro-batch` (ships in every Spark, deterministic —
  * each micro-batch emits `rowsPerBatch` rows stamped
  * startTimestamp + batchId * advanceMillisPerBatch, values globally
  * sequential) drives the SAME `EventStreams.windowedCounts` transform
  * the file/MemoryStream gates use. This pins SURVEY §2.8's Kafka
  * exclusion as source-plumbing only: swapping in
  * `format("kafka")` changes the source line and a deserialization
  * projection, not the operators — if windowedCounts were accidentally
  * file-source-shaped, this spec could not run at all. */
class RateSourceSpec extends SparkSpec {

  test("windowedCounts runs unchanged on the rate-micro-batch source") {
    val rate = spark.readStream.format("rate-micro-batch")
      .option("rowsPerBatch", "50")
      .option("numPartitions", "2")
      .option("startTimestamp", "0")          // epoch 0: windows exact
      .option("advanceMillisPerBatch", "1000")
      .load()                                  // (timestamp, value)
    // adapt the source's schema to the transform's contract — exactly
    // the projection a Kafka value-deserializer would sit in
    val events = rate.select(
      col("timestamp").as("ts"),
      when(col("value") % 2 === 0, "even").otherwise("odd")
        .as("event_type"),
      (col("value") % 100).cast("double").as("value"))
    val agg = graft.streaming.EventStreams.windowedCounts(
      events, watermarkDelay = "0 seconds", windowLen = "2 seconds")
    val q = agg.writeStream.format("memory").queryName("rate_smoke")
      .outputMode("complete").start()
    try {
      // poll until batches 0..3 have landed (3+ distinct windows means
      // the generator is past them, so windows 0 and 1 are stable)
      val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
      def windows(): Long =
        spark.table("rate_smoke").select("window_start").distinct().count()
      while (windows() < 3 && System.nanoTime() < deadline)
        Thread.sleep(100)
      assert(windows() >= 3, "rate source produced < 3 windows in 60 s")
      // window [0s, 2s) = batches 0 and 1 = values 0..99: 50 even
      // (sum 0+2+..+98 = 2450) and 50 odd (sum 2500), timestamps epoch
      // 0 and 1 s — deterministic by the source's contract
      val w0 = spark.table("rate_smoke")
        .filter(col("window_start") === lit("1970-01-01 00:00:00")
          .cast("timestamp"))
        .collect().map(r => (r.getString(1), r.getLong(2), r.getDouble(3)))
        .sortBy(_._1)
      assert(w0.toSeq == Seq(("even", 50L, 2450.0), ("odd", 50L, 2500.0)),
        w0.mkString(", "))
    } finally q.stop()
  }
}
