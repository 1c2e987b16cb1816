package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column support: media payloads as opaque `binary` columns
  * with typed metadata structs, plus a partition-parallel feature
  * extraction pipeline.
  *
  * The decode step is a clearly-marked deterministic STUB (this
  * environment ships no image/audio codecs): it derives a fixed-size
  * "feature vector" from the raw bytes. Everything around it — the
  * asset schema, the binary column plumbing, the mapPartitions batch
  * shape, the downstream joins — is the real production shape: swap
  * `decodeStub` for a codec call and nothing else changes. Decoding is
  * per-row CPU work with no shuffle, so it scales linearly with
  * executors at any corpus size.
  */
object MultimodalOps {

  case class MediaMeta(format: String, byte_len: Long, checksum: String)
  case class MediaAsset(asset_id: Long, content: Array[Byte], meta: MediaMeta)
  case class MediaFeatures(asset_id: Long, n_bytes: Long, mean_byte: Double,
                           feature: Array[Double])

  /** documents -> binary assets: content is the UTF-8 payload (standing
    * in for image/audio bytes), metadata is computed from the bytes. */
  def buildAssets(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("asset_id"),
      col("text").cast("binary").as("content"),
      struct(
        lit("text/plain").as("format"),
        length(col("text").cast("binary")).cast("long").as("byte_len"),
        md5(col("text").cast("binary")).as("checksum")).as("meta"))

  /** STUB decode: a real implementation would decode image/audio bytes
    * (e.g. via a JNI codec) inside the same mapPartitions loop. The fake
    * "feature" is an 8-bin byte histogram, normalized — deterministic,
    * so tests and the oracle can pin it. */
  def decodeStub(assets: Dataset[MediaAsset]): Dataset[MediaFeatures] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      it.map { a =>
        val bytes = a.content
        val hist = new Array[Double](8)
        var sum = 0L
        var i = 0
        while (i < bytes.length) {
          val b = bytes(i) & 0xff
          hist(b >> 5) += 1.0
          sum += b
          i += 1
        }
        val n = math.max(bytes.length, 1)
        MediaFeatures(a.asset_id, bytes.length.toLong,
          sum.toDouble / n, hist.map(_ / n))
      }
    }
  }

  /** STUB resize: a real implementation would decode, rescale, and
    * re-encode (JNI codec) in this same per-row loop. The fake keeps
    * every `factor`-th byte — deterministic, shape-preserving (output
    * length = ceil(len/factor)), and exactly the per-partition compute
    * profile of a real downsample: row-local CPU work, no shuffle. */
  def resizeStub(assets: Dataset[MediaAsset], factor: Int): Dataset[MediaAsset] = {
    require(factor >= 1, s"factor must be >= 1, got $factor")
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      it.map { a =>
        val src = a.content
        val out = new Array[Byte]((src.length + factor - 1) / factor)
        var i = 0
        while (i < out.length) {
          out(i) = src(i * factor)
          i += 1
        }
        a.copy(content = out,
          meta = a.meta.copy(byte_len = out.length.toLong))
      }
    }
  }

  /** end-to-end typed pipeline: docs -> assets -> decoded features */
  def featurePipeline(spark: SparkSession, docs: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    decodeStub(buildAssets(docs).as[MediaAsset])
  }
}
