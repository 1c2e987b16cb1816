package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column support: media payloads as opaque `binary` columns
  * with typed metadata structs, plus a partition-parallel feature
  * extraction pipeline.
  *
  * Two decode paths share the MediaAsset -> MediaFeatures interface:
  *
  *  - `encodePng`/`decodeImage` run a REAL image codec (pure-JVM
  *    javax.imageio — PNG/BMP/GIF): actual pixel rasters in, luminance
  *    histograms out.
  *  - `decodeStub`/`resizeStub` remain the clearly-marked deterministic
  *    byte-math twins for payloads with no decodable format (and for
  *    codecs this environment doesn't ship, e.g. audio/video): same
  *    schema, same batch shape, swap in a JNI codec and nothing else
  *    changes.
  *
  * Either way decoding is per-row CPU work with no shuffle, so it
  * scales linearly with executors at any corpus size.
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

  /** end-to-end typed pipeline: docs -> binary assets -> features out
    * of the REAL codec (grayscale PNG encode -> javax.imageio decode —
    * the default path is the production-shaped one; the byte-math stub
    * above stays available only as the deterministic twin for payloads
    * with no decodable format, reachable by explicit call, not from
    * here). n_bytes in the result is the decoded PIXEL count (payload
    * bytes zero-padded to the 32-wide raster grid). */
  def featurePipeline(spark: SparkSession, docs: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    decodeImage(encodePng(buildAssets(docs).as[MediaAsset]))
  }

  // ------------------------------------------------------------------
  // REAL codec path (pure-JVM javax.imageio — PNG/BMP/GIF, no native
  // deps). Same MediaAsset -> MediaFeatures interface as the stub, so
  // the two are swappable; the stub remains the deterministic twin for
  // payloads that are not images at all.
  // ------------------------------------------------------------------

  private def md5hex(bytes: Array[Byte]): String =
    java.security.MessageDigest.getInstance("MD5").digest(bytes)
      .map("%02x".format(_)).mkString

  /** Decode image bytes or null. ImageIO.read throws more than
    * IOException on malformed input (RuntimeExceptions from codec
    * internals), and the corrupt-blob contract is "pass through", so
    * any non-fatal failure maps to null. */
  private def readImageOrNull(bytes: Array[Byte]): java.awt.image.BufferedImage =
    try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    catch { case scala.util.control.NonFatal(_) => null }

  /** Luminance of one pixel for any band layout: gray reads band 0,
    * gray+alpha reads the gray band (0), 3+ bands average the first
    * three color bands. */
  private def lum(raster: java.awt.image.Raster, bands: Int, x: Int, y: Int): Int =
    if (bands <= 2) raster.getSample(x, y, 0)
    else (raster.getSample(x, y, 0) + raster.getSample(x, y, 1) +
      raster.getSample(x, y, 2)) / 3

  /** Encode each asset's payload as a REAL grayscale PNG: byte i of the
    * payload becomes pixel i (row-major, `width` pixels per row; the
    * ragged tail row pads with zeros). Gray PNG is lossless, so decode
    * recovers the exact bytes — which is what lets the DuckDB oracle
    * recompute pixel statistics from the original text while the Spark
    * side goes through the actual codec. Per-row CPU work in
    * mapPartitions: no shuffle, scales linearly with executors. */
  def encodePng(assets: Dataset[MediaAsset], width: Int = 32): Dataset[MediaAsset] = {
    require(width >= 1, s"width must be >= 1, got $width")
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      // no disk-backed stream cache inside executors
      javax.imageio.ImageIO.setUseCache(false)
      it.map { a =>
        val src = a.content
        val h = math.max(1, (src.length + width - 1) / width)
        val img = new java.awt.image.BufferedImage(
          width, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
        val raster = img.getRaster
        var i = 0
        while (i < src.length) {
          raster.setSample(i % width, i / width, 0, src(i) & 0xff)
          i += 1
        }
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", bos)
        val png = bos.toByteArray
        MediaAsset(a.asset_id, png,
          MediaMeta("image/png", png.length.toLong, md5hex(png)))
      }
    }
  }

  /** REAL decode via javax.imageio (PNG, BMP, GIF — whatever ImageIO
    * sniffs from the bytes): per-pixel luminance histogram (8 bins of
    * 32 levels), mean luminance, and the pixel count in `n_bytes`.
    * Single-band images read band 0 exactly; multi-band images use the
    * integer mean of the first three bands. Undecodable payloads keep
    * their row with `mean_byte = -1` and an empty feature vector — a
    * 100 TB corpus always carries corrupt blobs, and dropping them
    * silently would make the audit numbers lie. */
  def decodeImage(assets: Dataset[MediaAsset]): Dataset[MediaFeatures] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.map { a =>
        val img = readImageOrNull(a.content)
        if (img == null)
          MediaFeatures(a.asset_id, a.content.length.toLong, -1.0, Array.empty)
        else {
          val raster = img.getRaster
          val bands = raster.getNumBands
          val w = img.getWidth
          val h = img.getHeight
          val hist = new Array[Double](8)
          var sum = 0L
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val v = lum(raster, bands, x, y)
              hist(math.min(v, 255) >> 5) += 1.0
              sum += v
              x += 1
            }
            y += 1
          }
          val n = w.toLong * h
          MediaFeatures(a.asset_id, n, sum.toDouble / n, hist.map(_ / n))
        }
      }
    }
  }

  /** REAL resize: decode (javax.imageio), NEAREST-NEIGHBOR downsample
    * by an integer `factor` (resized pixel (x, y) = source pixel
    * (x*factor, y*factor) — pure index arithmetic, no interpolation
    * kernel, so the result is bit-deterministic and an independent
    * engine can replay it from the source bytes), re-encode as gray
    * PNG. Output dims are ceil(w/f) x ceil(h/f), covering every source
    * pixel row/col stripe once. Undecodable payloads pass through
    * unchanged with their original metadata — same corrupt-blob
    * discipline as decodeImage. Per-row mapPartitions CPU work: zero
    * shuffles, linear scaling with executors; at 100 TB the resize
    * pass co-locates with the scan and writes a corpus ~factor^2
    * smaller. */
  def resizeImage(assets: Dataset[MediaAsset], factor: Int): Dataset[MediaAsset] = {
    require(factor >= 1, s"factor must be >= 1, got $factor")
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.map { a =>
        val img = readImageOrNull(a.content)
        if (img == null) a
        else {
          val raster = img.getRaster
          val bands = raster.getNumBands
          val w2 = (img.getWidth + factor - 1) / factor
          val h2 = (img.getHeight + factor - 1) / factor
          val out = new java.awt.image.BufferedImage(
            w2, h2, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
          val or = out.getRaster
          var y = 0
          while (y < h2) {
            var x = 0
            while (x < w2) {
              val v = lum(raster, bands, x * factor, y * factor)
              or.setSample(x, y, 0, v)
              x += 1
            }
            y += 1
          }
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(out, "png", bos)
          val png = bos.toByteArray
          MediaAsset(a.asset_id, png,
            MediaMeta("image/png", png.length.toLong, md5hex(png)))
        }
      }
    }
  }

  // ------------------------------------------------------------------
  // REAL audio codec path (pure-JVM javax.sound.sampled — WAV/PCM, no
  // native deps): the audio twin of encodePng/decodeImage. 8-bit PCM
  // WAV is lossless over byte payloads, so the decoded sample stream
  // is exactly the original bytes — which lets the DuckDB oracle
  // recompute the sample statistics from the source text while the
  // Spark side goes through the actual container parse + codec.
  // ------------------------------------------------------------------

  case class AudioFeatures(asset_id: Long, n_samples: Long, sample_rate: Long,
                           sum_amp: Long, sum_sq: Long, n_crossings: Long)

  /** Encode each asset's payload as a REAL WAV file: byte i of the
    * payload becomes 8-bit unsigned PCM sample i (mono, 8 kHz) behind a
    * canonical 44-byte RIFF header. Per-row CPU work in mapPartitions:
    * no shuffle, linear with executors at any corpus size. */
  def encodeWav(assets: Dataset[MediaAsset], sampleRate: Int = 8000): Dataset[MediaAsset] = {
    require(sampleRate >= 1, s"sampleRate must be >= 1, got $sampleRate")
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      it.map { a =>
        val pcm = a.content
        val bb = java.nio.ByteBuffer.allocate(44 + pcm.length)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + pcm.length)
          .put("WAVE".getBytes("US-ASCII"))
          .put("fmt ".getBytes("US-ASCII")).putInt(16)
          .putShort(1)                   // PCM
          .putShort(1)                   // mono
          .putInt(sampleRate)
          .putInt(sampleRate)            // byte rate (8-bit mono)
          .putShort(1)                   // block align
          .putShort(8)                   // bits per sample
          .put("data".getBytes("US-ASCII")).putInt(pcm.length)
          .put(pcm)
        val wav = bb.array()
        MediaAsset(a.asset_id, wav,
          MediaMeta("audio/wav", wav.length.toLong, md5hex(wav)))
      }
    }
  }

  /** REAL decode via javax.sound.sampled (whatever AudioSystem sniffs
    * from the bytes — WAV here): per-sample amplitude statistics as
    * EXACT integers (sum, sum of squares over the unsigned 8-bit
    * samples) plus the count of level-64 threshold crossings between
    * adjacent samples — the integer skeleton of RMS energy /
    * zero-crossing-rate audio features, kept integral so the oracle
    * comparison is bit-exact. Undecodable payloads keep their row with
    * `sample_rate = -1` and zeroed stats (same corrupt-blob honesty as
    * decodeImage). */
  def decodeAudio(assets: Dataset[MediaAsset]): Dataset[AudioFeatures] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      it.map { a =>
        val ais =
          try javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(a.content))
          catch {
            case _: javax.sound.sampled.UnsupportedAudioFileException => null
            case _: java.io.IOException => null
          }
        if (ais == null)
          AudioFeatures(a.asset_id, 0L, -1L, 0L, 0L, 0L)
        else {
          val fmt = ais.getFormat
          val pcm = ais.readAllBytes()
          ais.close()
          var sum = 0L
          var sumSq = 0L
          var crossings = 0L
          var i = 0
          while (i < pcm.length) {
            val v = pcm(i) & 0xff
            sum += v
            sumSq += v.toLong * v
            if (i > 0 && (((pcm(i - 1) & 0xff) >= 64) != (v >= 64)))
              crossings += 1
            i += 1
          }
          AudioFeatures(a.asset_id, pcm.length.toLong,
            fmt.getSampleRate.toLong, sum, sumSq, crossings)
        }
      }
    }
  }

  case class VadStats(asset_id: Long, n_frames: Long, n_speech: Long,
                      n_segments: Long, sum_energy: Long)

  /** Frame-level energy voice-activity detection over the REAL-decoded
    * PCM (the m12 gate): non-overlapping 100-sample frames, a frame is
    * "speech" when its energy sum exceeds 100·10000 (i.e. a mean
    * squared amplitude over 10000 — between the fixture's silence-like
    * space runs and its letter-band amplitudes, so both branches
    * fire), and contiguous speech frames merge into segments. The
    * classic energy-gate VAD skeleton (Rabiner & Sammur 1975 shape)
    * kept all-integer so the oracle replays it bit-exactly from the
    * source text bytes (8-bit PCM is lossless). Row-local mapPartitions
    * through javax.sound — zero shuffles at any corpus size.
    * Undecodable payloads keep their row with n_frames = -1. */
  def vadStats(assets: Dataset[MediaAsset], frameLen: Int = 100,
               meanSqThreshold: Long = 10000L): Dataset[VadStats] = {
    import assets.sparkSession.implicits._
    require(frameLen >= 1 && meanSqThreshold >= 0)
    assets.mapPartitions { it =>
      it.map { a =>
        val ais =
          try javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(a.content))
          catch {
            case _: javax.sound.sampled.UnsupportedAudioFileException => null
            case _: java.io.IOException => null
          }
        if (ais == null) VadStats(a.asset_id, -1L, 0L, 0L, 0L)
        else {
          val pcm = ais.readAllBytes()
          ais.close()
          val nFrames = (pcm.length + frameLen - 1) / frameLen
          var f = 0
          var nSpeech = 0L
          var nSegments = 0L
          var sumEnergy = 0L
          var prevSpeech = false
          while (f < nFrames) {
            var e = 0L
            var i = f * frameLen
            val end = math.min(i + frameLen, pcm.length)
            while (i < end) {
              val v = pcm(i) & 0xff
              e += v.toLong * v
              i += 1
            }
            sumEnergy += e
            // threshold scales with the ACTUAL frame length so the
            // short tail frame is judged by the same mean-sq bar
            val speech = e > (end - f.toLong * frameLen) * meanSqThreshold
            if (speech) {
              nSpeech += 1
              if (!prevSpeech) nSegments += 1
            }
            prevSpeech = speech
            f += 1
          }
          VadStats(a.asset_id, nFrames.toLong, nSpeech, nSegments,
            sumEnergy)
        }
      }
    }
  }

  /** Perceptual difference hash (dHash, Krawetz 2013) of each decoded
    * image: sample a 9x8 luminance grid by pure index arithmetic
    * (sample (gx, gy) reads pixel (gx*w/9, gy*h/8) — nearest-neighbor,
    * no interpolation kernel, bit-deterministic like resizeImage), set
    * bit gy*8+gx iff the left sample is brighter than its right
    * neighbor. Near-identical images differ in a few bits; crops and
    * re-encodes survive because the hash tracks gradients, not values.
    * Undecodable payloads get a null hash (flagged, not dropped).
    * Row-local mapPartitions through the REAL codec — no shuffle. */
  def dHash64(assets: Dataset[MediaAsset]): DataFrame = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.map { a =>
        val img = readImageOrNull(a.content)
        if (img == null) (a.asset_id, Option.empty[Long])
        else {
          val r = img.getRaster
          val w = img.getWidth
          val h = img.getHeight
          val bands = r.getNumBands
          var hash = 0L
          var gy = 0
          while (gy < 8) {
            val sy = gy * h / 8
            var gx = 0
            while (gx < 8) {
              val p0 = lum(r, bands, gx * w / 9, sy)
              val p1 = lum(r, bands, (gx + 1) * w / 9, sy)
              if (p0 > p1) hash |= (1L << (gy * 8 + gx))
              gx += 1
            }
            gy += 1
          }
          (a.asset_id, Some(hash))
        }
      }
    }.toDF("asset_id", "dhash")
  }

  /** Image near-duplicate pairs by dHash Hamming distance <= maxHamming,
    * candidates generated by 16-bit LSH BANDING (4 bands of 16 bits)
    * before the exact popcount verify. For maxHamming <= 3 banding is
    * EXACT by pigeonhole: 3 flipped bits damage at most 3 of 4 bands,
    * so every true pair shares at least one intact band — candidates
    * are bounded by band-bucket sizes, never all-pairs. (At production
    * scale cap hot band-buckets the way substring dedup caps grams —
    * a uniform-background band value is the boilerplate of images.) */
  def dHashNearDups(assets: Dataset[MediaAsset], maxHamming: Int): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 3,
      s"banding is exact only for maxHamming <= 3, got $maxHamming")
    val dh = dHash64(assets).filter(col("dhash").isNotNull)
    val banded = dh.select(col("asset_id"), col("dhash"),
        explode(expr("sequence(0, 3)")).as("band"))
      .withColumn("bkey", expr("shiftright(dhash, band * 16) & 65535"))
    val a = banded.select(col("band"), col("bkey"),
      col("asset_id").as("id_a"), col("dhash").as("ha"))
    val b = banded.select(col("band"), col("bkey"),
      col("asset_id").as("id_b"), col("dhash").as("hb"))
    a.join(b, Seq("band", "bkey"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("ha").bitwiseXOR(col("hb"))).cast("long").as("ham"))
      .filter(col("ham") <= maxHamming)
      .distinct()
  }
}
