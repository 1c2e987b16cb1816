package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr

/** Readers/writers for the star-schema testdata and generic parquet IO.
  *
  * Schema-on-read from the parquet footer (the reference does the same:
  * parquet_slicer.py:50, nyc_taxi_etl.py:42); explicit StructType schemas
  * are used only in test fixtures where strictness matters.
  *
  * At 100 TB these readers are unchanged: `spark.read.parquet(dir)` maps
  * row-groups/file-splits to tasks natively, replacing the reference's
  * manual row-range chunking (parquet_slicer.py:53-58) with Spark's own
  * split planning (`spark.sql.files.maxPartitionBytes` is the tuning knob).
  */
object Tables {
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")
  /** events.ts normalized to the session timestamp type (LTZ, session tz
    * pinned to UTC), adapting to the footer's physical type — generator
    * versions have shipped both:
    *  - TIMESTAMP(NANOS): Spark has no nanosecond timestamp, so the
    *    session reads it as raw int64 (`spark.sql.legacy.parquet
    *    .nanosAsLong`) and we truncate to microseconds (integer div —
    *    the value exceeds double's 2^53 mantissa, so float division
    *    would corrupt it). DuckDB performs the same ns→us truncation.
    *  - timestamp[us] (no tz): Spark reads TIMESTAMP_NTZ; with the
    *    session tz at UTC the cast to LTZ is a pure retag of the same
    *    micros value, matching DuckDB's naive read wall-clock for
    *    wall-clock.
    * Downstream code (window(), unix_micros, the streaming watermarks)
    * is written against the LTZ type, so normalizing here keeps every
    * consumer oblivious to the generator's footer choice. */
  def events(s: SparkSession, d: String): DataFrame = {
    val raw = table(s, d, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts", expr("cast(ts as timestamp)"))
      case _ => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  /** zstd parquet sink — the reference's designed output format
    * (parquet_assembler.py:34-37) without its lossy text round-trip. */
  def writeZstd(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("compression", "zstd").parquet(path)

  /** hive-layout partitioned zstd parquet sink. At 100 TB the partition
    * column IS the primary index: a reader filtering on it prunes whole
    * directories at planning time (PartitionFilters in the scan, zero IO
    * for excluded partitions), which no row-group statistic can match.
    * Partition by low-cardinality, always-filtered columns (date, lang,
    * source); never by high-cardinality keys — millions of tiny
    * directories kill the file listing before any query runs. */
  def writePartitioned(df: DataFrame, path: String, cols: String*): Unit =
    df.write.mode("overwrite").option("compression", "zstd")
      .partitionBy(cols: _*).parquet(path)
}
