package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ordering/sampling operators whose naive forms don't survive scale.
  *
  * A global `row_number()` over an unpartitioned window collapses the
  * whole dataset into ONE task — the canonical scale anti-pattern.
  * [[globalRowIndex]] produces the identical numbering with range
  * partitioning: sort partitions cover disjoint key ranges, each task
  * numbers its own rows, and per-partition row counts (a few hundred
  * longs collected to the driver — metadata, not data) become offsets.
  */
object IndexOps {

  /** deterministic 0-based dense global index by `sortCols` (which must
    * be a unique ordering for the numbering to be well-defined) */
  def globalRowIndex(df: DataFrame, sortCols: Seq[Column],
                     indexName: String = "row_idx"): DataFrame = {
    // persisted because the frame is traversed twice — the counts action
    // below and the caller's eventual action over the numbered result.
    // Without the cache each pass re-runs the scan + range exchange +
    // in-partition sort: a full extra pass over the dataset at 100 TB.
    // Lifecycle: the cache is catalog-tracked, so the harness's
    // clearCache() between queries (Bench/Verify) reclaims it; callers
    // embedding this in a longer job should unpersist after their action.
    val sorted = df.repartitionByRange(sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val outSchema = org.apache.spark.sql.types.StructType(
      sorted.schema.fields :+
        org.apache.spark.sql.types.StructField(indexName,
          org.apache.spark.sql.types.LongType, nullable = false))
    // per-partition counts -> exclusive prefix offsets (tiny driver-side
    // metadata, same technique as RDD.zipWithIndex); this action also
    // populates the cache the numbering pass reads
    val counts = sorted.rdd.mapPartitionsWithIndex { case (pid, it) =>
      Iterator((pid, it.size.toLong))
    }.collect().sortBy(_._1).map(_._2)
    val offsets = counts.scanLeft(0L)(_ + _)
    val indexed = sorted.rdd.mapPartitionsWithIndex { case (pid, it) =>
      var i = offsets(pid)
      it.map { row =>
        val r = org.apache.spark.sql.Row.fromSeq(row.toSeq :+ i)
        i += 1
        r
      }
    }
    df.sparkSession.createDataFrame(indexed, outSchema)
  }

  /** Deterministic epoch shuffle for training-order assignment: a
    * reproducible pseudo-random permutation of the corpus, seeded — the
    * step between curation and the training loader (every epoch
    * reshuffles with a new seed; a run that restarts must rebuild the
    * SAME order). The sort key is md5(seed ':' id) — portable (any
    * engine replays it; xxhash64 is not) and effectively collision-free,
    * with the id as tiebreak so the order is well-defined regardless.
    * Position assignment rides [[globalRowIndex]]'s range-partition +
    * offsets machinery — sorting by the hash is embarrassingly balanced
    * (the key IS uniform), so no single-task global sort at any scale.
    * Output adds `shuffle_pos` (0-based) and `shard_id`
    * (= pos div shardSize) — the writer-side alignment for fixed-size
    * training shards. */
  def epochShuffle(df: DataFrame, idCol: Column, seed: Long,
                   shardSize: Long): DataFrame = {
    require(shardSize >= 1, s"shardSize must be >= 1, got $shardSize")
    val key = md5(concat(lit(seed.toString), lit(":"),
      idCol.cast("string")).cast("binary"))
    globalRowIndex(df.withColumn("_sk", key), Seq(col("_sk"), idCol),
        "shuffle_pos")
      // integer division, not `/` (which is DOUBLE division in Spark SQL)
      .withColumn("shard_id", expr(s"shuffle_pos div $shardSize"))
      .drop("_sk")
  }

  /** [[hashSample]] but keyed on an md5 hex prefix, for when the sample
    * must be reproducible by OTHER engines too (md5 is universal;
    * xxhash64 is not): keep rows with md5(key) below the 32-hex-char
    * threshold. fraction granularity is 1/2^24 (6 hex digits). */
  def portableHashSample(df: DataFrame, keyCol: Column, fraction: Double): DataFrame = {
    require(fraction > 0 && fraction <= 1, "fraction must be in (0, 1]")
    val cut = f"${(fraction * (1 << 24)).toLong}%06x" + "0" * 26
    df.filter(md5(keyCol.cast("string").cast("binary")) < lit(cut))
  }

  /** deterministic pseudo-random sample: keep rows whose 64-bit hash of
    * `keyCol` falls in the lowest `fraction` of the hash space. Unlike
    * `df.sample`, the decision is a pure function of the key — stable
    * across runs, executors, and engines (any system with xxhash64 can
    * reproduce the exact sample). */
  def hashSample(df: DataFrame, keyCol: Column, fraction: Double): DataFrame = {
    require(fraction > 0 && fraction <= 1, "fraction must be in (0, 1]")
    val threshold = (fraction * (1L << 62)).toLong
    df.filter(pmod(xxhash64(keyCol), lit(1L << 62)) < threshold)
  }
}
