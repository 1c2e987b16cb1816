package graft.queries

import org.apache.spark.sql.functions._
import graft.io.Tables
import graft.operators.MultimodalOps

/** Multimodal surface: documents joined to their embeddings carried as
  * nested struct columns, and a binary-asset pipeline with computed
  * metadata. Struct columns are the Spark-side representation; query
  * outputs are flat so the oracle hash compares scalars.
  *
  * Aggregates over float columns go through min/max (order-insensitive)
  * — never a float sum, whose partial-aggregation order would not be
  * reproducible across engines.
  */
object Multimodal {

  val qs: Seq[Q] = Seq(

    // ---- struct-column pipeline: join, nest, filter/agg on nested fields
    Q("m01_struct_join",
      (s, d) => Tables.documents(s, d)
        .join(Tables.embeddings(s, d), col("doc_id") === col("vec_id"))
        .select(col("doc_id"),
          struct(col("text"), col("lang"), col("source"), col("n_chars")).as("doc"),
          struct(col("embedding"), col("label")).as("vec"))
        .filter(col("doc.n_chars") > 100)
        .groupBy(col("doc.lang").as("lang"), col("vec.label").as("label"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("doc.n_chars")).as("sum_chars"),
          min(element_at(col("vec.embedding").cast("array<double>"), 1)).as("min_e1"),
          max(element_at(col("vec.embedding").cast("array<double>"), 1)).as("max_e1")),
      Some("""
        SELECT lang, label, COUNT(*) AS n_docs,
          CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
          MIN(CAST(embedding[1] AS DOUBLE)) AS min_e1,
          MAX(CAST(embedding[1] AS DOUBLE)) AS max_e1
        FROM documents JOIN embeddings ON doc_id = vec_id
        WHERE n_chars > 100
        GROUP BY lang, label""")),

    // ---- binary-asset metadata pipeline (content as opaque bytes) -------
    //      the "magic" prefix hex stands in for media-format sniffing
    Q("m02_binary_assets",
      (s, d) => MultimodalOps.buildAssets(Tables.documents(s, d))
        .select(col("asset_id"), col("meta.format").as("format"),
          col("meta.byte_len").as("byte_len"),
          col("meta.checksum").as("checksum"),
          lower(hex(substring(col("content").cast("string"), 1, 4))).as("magic")),
      Some("""
        SELECT doc_id AS asset_id, 'text/plain' AS format,
          CAST(octet_length(text::BLOB) AS BIGINT) AS byte_len,
          md5(text) AS checksum,
          lower(hex(substring(text, 1, 4))) AS magic
        FROM documents""")),

    // ---- frame sampling: fixed-width strided windows over the payload ---
    //      (the video/audio frame-extraction shape: one row per frame with
    //      its offset and checksum; text payload stands in for the codec
    //      output, the plumbing — strided offsets, ragged tail, per-frame
    //      rows — is the real thing)
    Q("m03_frame_sample",
      (s, d) => Tables.documents(s, d)
        .select(col("doc_id"),
          explode(sequence(lit(1), length(col("text")), lit(48))).as("frame_off"))
        .join(Tables.documents(s, d).select(col("doc_id"), col("text")), "doc_id")
        .select(col("doc_id"), col("frame_off").cast("long").as("frame_off"),
          md5(substring(col("text"), col("frame_off").cast("int"), lit(64))
            .cast("binary")).as("frame_md5")),
      Some("""
        SELECT doc_id, CAST(frame_off AS BIGINT) AS frame_off,
          md5(substring(text, CAST(frame_off AS INTEGER), 64)) AS frame_md5
        FROM documents
        CROSS JOIN LATERAL unnest(range(1, LENGTH(text) + 1, 48)) t(frame_off)""")),

    // ---- typed mapPartitions decode path, oracle-checked ----------------
    //      featurePipeline now runs the REAL codec by default (round 15):
    //      PNG encode -> javax.imageio decode, the same lossless
    //      round-trip m08 proves — so the oracle recomputes the pixel
    //      statistics from the source text plus the known zero padding
    //      (n_bytes = decoded pixel count = 32 * ceil(len/32), min one
    //      row; pad pixels land in bin 0 and the mean's denominator).
    //      The byte-math decodeStub is no longer reachable from any
    //      gate — it survives only as the spec-pinned deterministic
    //      twin for undecodable payload classes.
    Q("m04_decode_features",
      (s, d) => MultimodalOps.featurePipeline(s, Tables.documents(s, d))
        .select(col("asset_id"), col("n_bytes"), col("mean_byte"),
          element_at(col("feature"), 2).as("space_ratio"),
          element_at(col("feature"), 4).as("letter_ratio")),
      Some("""
        WITH a AS (SELECT doc_id AS asset_id,
                     32 * GREATEST(CAST(CEIL(LENGTH(text) / 32.0)
                       AS BIGINT), 1) AS n_pixels,
                     list_transform(string_split(text, ''), x -> ascii(x)) cs
                   FROM documents)
        SELECT asset_id, n_pixels AS n_bytes,
          CAST(list_reduce(list_prepend(0, cs), (x, y) -> x + y) AS DOUBLE)
            / n_pixels AS mean_byte,
          CAST(len(list_filter(cs, x -> x // 32 = 1)) AS DOUBLE)
            / n_pixels AS space_ratio,
          CAST(len(list_filter(cs, x -> x // 32 = 3)) AS DOUBLE)
            / n_pixels AS letter_ratio
        FROM a""")),

    // ---- modality mix report: format x size-band histogram --------------
    //      the storage-planning summary a multimodal corpus publishes
    //      (here one format; the shape is per-format x band)
    Q("m05_modality_mix",
      (s, d) => MultimodalOps.buildAssets(Tables.documents(s, d))
        .groupBy(col("meta.format").as("format"),
          floor(col("meta.byte_len") / 100).cast("long").as("size_band"))
        .agg(count(lit(1)).as("n_assets"),
          sum(col("meta.byte_len")).as("total_bytes"),
          count_distinct(col("meta.checksum")).as("n_distinct")),
      Some("""
        SELECT 'text/plain' AS format,
          CAST(FLOOR(LENGTH(text) / 100) AS BIGINT) AS size_band,
          COUNT(*) AS n_assets,
          CAST(SUM(LENGTH(text)) AS BIGINT) AS total_bytes,
          COUNT(DISTINCT md5(text)) AS n_distinct
        FROM documents GROUP BY 1, 2""")),

    // ---- binary-asset dedup by content hash ------------------------------
    //      "dedup the images by checksum": group the OPAQUE binary column
    //      by its content hash — the multimodal twin of d01's exact text
    //      dedup, except the key is computed from bytes, so the same
    //      plan handles image/audio/video blobs unchanged. Duplicate
    //      groups keep their min asset id as the canonical survivor.
    Q("m06_asset_dedup",
      (s, d) => MultimodalOps.buildAssets(Tables.documents(s, d))
        .groupBy(col("meta.checksum").as("checksum"))
        .agg(count(lit(1)).as("n_copies"))
        .agg(count(lit(1)).as("n_distinct_assets"),
          sum(col("n_copies")).as("n_assets"),
          count(when(col("n_copies") >= 2, 1)).as("n_dup_groups"),
          sum(col("n_copies") - 1).as("n_redundant_copies")),
      Some("""
        WITH g AS (SELECT md5(text) AS checksum, COUNT(*) AS n_copies
                   FROM documents GROUP BY 1)
        SELECT COUNT(*) AS n_distinct_assets,
          CAST(SUM(n_copies) AS BIGINT) AS n_assets,
          COUNT(CASE WHEN n_copies >= 2 THEN 1 END) AS n_dup_groups,
          CAST(SUM(n_copies - 1) AS BIGINT) AS n_redundant_copies
        FROM g""")),

    // ---- byte-budgeted shard packing per modality ------------------------
    //      the multimodal twin of t14's token packing: assets are
    //      assigned (in deterministic doc_id order) to ~100 KB training
    //      shards within their modality via a keyed running byte sum —
    //      shard_id = (cumsum - own_len) / budget, one window shuffle
    //      keyed by modality, no global sort. The modality split is a
    //      deterministic stand-in (doc_id % 3) for the format column a
    //      real asset table carries.
    Q("m07_shard_budget",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val budget = 100000L
        val assets = Tables.documents(s, d)
          .select(col("doc_id"),
            element_at(array(lit("image"), lit("audio"), lit("video")),
              (col("doc_id") % 3 + 1).cast("int")).as("modality"),
            octet_length(col("text").cast("binary")).cast("long")
              .as("byte_len"))
        val w = Window.partitionBy(col("modality")).orderBy(col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        assets
          // exact integral `div` (matches the oracle's `//`): byte sums
          // near 2^53 would round through IEEE double under `/ + cast`
          .withColumn("prior_bytes",
            sum(col("byte_len")).over(w) - col("byte_len"))
          .withColumn("shard_id", expr(s"prior_bytes div $budget"))
          .groupBy(col("modality"), col("shard_id"))
          .agg(count(lit(1)).as("n_assets"),
            sum(col("byte_len")).as("shard_bytes"))
      },
      Some("""
        WITH a AS (
          SELECT doc_id,
            (['image', 'audio', 'video'])[CAST(doc_id % 3 + 1 AS INT)]
              AS modality,
            CAST(octet_length(text::BLOB) AS BIGINT) AS byte_len
          FROM documents),
        sh AS (
          SELECT modality, byte_len,
            CAST((SUM(byte_len) OVER (PARTITION BY modality
                ORDER BY doc_id ROWS UNBOUNDED PRECEDING) - byte_len)
              // 100000 AS BIGINT) AS shard_id
          FROM a)
        SELECT modality, shard_id, COUNT(*) AS n_assets,
          CAST(SUM(byte_len) AS BIGINT) AS shard_bytes
        FROM sh GROUP BY 1, 2""")),

    // ---- REAL codec round-trip: PNG encode -> javax.imageio decode ------
    //      each document's bytes become pixels of a genuine grayscale
    //      PNG (32 px wide, zero-padded ragged tail row), and the
    //      features come out of the DECODED raster — an actual image
    //      codec in the loop, not the stub. Gray PNG is lossless, so
    //      the oracle recomputes the same pixel statistics from the
    //      original text plus the known padding: n_bytes is the PIXEL
    //      count (width * ceil(len/32), min one row), pad pixels are
    //      zeros landing in histogram bin 0 and the luminance mean.
    Q("m08_image_decode",
      (s, d) => {
        import s.implicits._
        MultimodalOps.decodeImage(MultimodalOps.encodePng(
            MultimodalOps.buildAssets(Tables.documents(s, d))
              .as[MultimodalOps.MediaAsset]))
          .select(col("asset_id"), col("n_bytes").as("n_pixels"),
            col("mean_byte").as("mean_luma"),
            element_at(col("feature"), 2).as("space_ratio"),
            element_at(col("feature"), 4).as("letter_ratio"))
      },
      Some("""
        WITH a AS (SELECT doc_id AS asset_id,
                     LENGTH(text) AS n_bytes,
                     32 * GREATEST(CAST(CEIL(LENGTH(text) / 32.0) AS BIGINT), 1)
                       AS n_pixels,
                     list_transform(string_split(text, ''), x -> ascii(x)) cs
                   FROM documents)
        SELECT asset_id, n_pixels,
          CAST(list_reduce(list_prepend(0, cs), (x, y) -> x + y) AS DOUBLE)
            / n_pixels AS mean_luma,
          CAST(len(list_filter(cs, x -> x // 32 = 1)) AS DOUBLE)
            / n_pixels AS space_ratio,
          CAST(len(list_filter(cs, x -> x // 32 = 3)) AS DOUBLE)
            / n_pixels AS letter_ratio
        FROM a""")),

    // ---- REAL resize: PNG -> nearest-neighbor 4x down -> PNG -> stats ---
    //      the full image pipeline shape: encode real PNGs, decode +
    //      downsample by pure index arithmetic (resized (x,y) = source
    //      (4x,4y) — no interpolation kernel, so bit-deterministic),
    //      re-encode, decode AGAIN for stats. Grid math: source is
    //      32 x h (h = ceil(len/32)), resized is 8 x ceil(h/4), so
    //      resized pixel (x,y) is payload byte 128y + 4x (0 when past
    //      the text — the pad stripe). The oracle replays exactly that
    //      arithmetic from the source text; dark_ratio counts the <32
    //      luminance bin, i.e. sampled pad zeros (fixture text is all
    //      printable >= 32). Three codec passes, all row-local
    //      mapPartitions — zero shuffles end to end.
    Q("m10_image_resize",
      (s, d) => {
        import s.implicits._
        MultimodalOps.decodeImage(MultimodalOps.resizeImage(
            MultimodalOps.encodePng(
              MultimodalOps.buildAssets(Tables.documents(s, d))
                .as[MultimodalOps.MediaAsset]),
            factor = 4))
          .select(col("asset_id"), col("n_bytes").as("n_pixels"),
            col("mean_byte").as("mean_luma"),
            element_at(col("feature"), 1).as("dark_ratio"))
      },
      Some("""
        WITH a AS (SELECT doc_id AS asset_id, LENGTH(text) AS len,
                     CAST(CEIL(GREATEST(CAST(CEIL(LENGTH(text) / 32.0)
                         AS BIGINT), 1) / 4.0) AS BIGINT) AS h2,
                     text FROM documents),
        v AS (SELECT asset_id, h2,
                CASE WHEN 128 * (i // 8) + 4 * (i % 8) < len
                  THEN ascii(substring(text,
                    CAST(128 * (i // 8) + 4 * (i % 8) + 1 AS BIGINT), 1))
                  ELSE 0 END AS v
              FROM a CROSS JOIN LATERAL unnest(range(0, h2 * 8)) t(i))
        SELECT asset_id, 8 * h2 AS n_pixels,
          CAST(SUM(v) AS DOUBLE) / (8 * h2) AS mean_luma,
          CAST(SUM(CASE WHEN v < 32 THEN 1 ELSE 0 END) AS DOUBLE)
            / (8 * h2) AS dark_ratio
        FROM v GROUP BY asset_id, h2""")),

    // ---- REAL audio codec: payload -> WAV -> javax.sound decode ---------
    //      the audio twin of m08: each payload becomes an actual WAV
    //      file (8-bit unsigned PCM mono behind a canonical RIFF
    //      header), then AudioSystem parses the container and streams
    //      the samples back out. 8-bit PCM is lossless over bytes, so
    //      the oracle recomputes the same sample statistics from the
    //      original text's character codes: amplitude sum, energy
    //      (sum of squares) and level-64 threshold crossings — all
    //      EXACT integers, immune to aggregation order. Encode and
    //      decode are per-row mapPartitions work: zero shuffles, the
    //      plan scales linearly with executors at 100 TB.
    Q("m09_audio_decode",
      (s, d) => {
        import s.implicits._
        MultimodalOps.decodeAudio(MultimodalOps.encodeWav(
            MultimodalOps.buildAssets(Tables.documents(s, d))
              .as[MultimodalOps.MediaAsset]))
          .toDF()
      },
      Some("""
        WITH a AS (SELECT doc_id AS asset_id,
                     CAST(LENGTH(text) AS BIGINT) AS n_samples,
                     list_transform(string_split(text, ''), x -> ascii(x)) cs
                   FROM documents)
        SELECT asset_id, n_samples, CAST(8000 AS BIGINT) AS sample_rate,
          CAST(list_reduce(list_prepend(0, cs), (x, y) -> x + y) AS BIGINT)
            AS sum_amp,
          CAST(list_reduce(list_prepend(0,
              list_transform(cs, x -> x * x)), (x, y) -> x + y) AS BIGINT)
            AS sum_sq,
          CAST(len(list_filter(range(1, len(cs)),
              i -> (cs[i] >= 64) <> (cs[i + 1] >= 64))) AS BIGINT)
            AS n_crossings
        FROM a""")),

    // ---- perceptual-hash (dHash) image near-dup -------------------------
    //      the multimodal twin of s21: every REAL-decoded PNG hashes to
    //      64 gradient bits over a 9x8 nearest-neighbor luminance grid,
    //      candidate pairs come from 16-bit LSH bands (EXACT for
    //      Hamming <= 3 by pigeonhole — see MultimodalOps.dHashNearDups),
    //      verified by popcount. Gray PNG is lossless and the sample
    //      grid is index arithmetic, so the oracle recomputes every
    //      hash from the ORIGINAL text bytes (zero-padded grid, m08's
    //      convention) and pairs all-pairs — banding + verify must
    //      equal the all-pairs filter exactly, which is the pigeonhole
    //      claim the gate pins. Corpus duplicates surface as ham=0.
    Q("m11_image_dhash_neardup",
      (s, d) => {
        import s.implicits._
        MultimodalOps.dHashNearDups(MultimodalOps.encodePng(
          MultimodalOps.buildAssets(Tables.documents(s, d))
            .as[MultimodalOps.MediaAsset]), maxHamming = 3)
      },
      Some(s"""
        WITH a AS (SELECT doc_id,
                     GREATEST(CAST(CEIL(LENGTH(text) / 32.0) AS BIGINT), 1)
                       AS h,
                     list_transform(string_split(text, ''), x -> ascii(x))
                       AS cs
                   FROM documents),
        dh AS (SELECT doc_id, ${dhashTermsSql()} AS hash FROM a)
        SELECT x.doc_id AS id_a, y.doc_id AS id_b,
          CAST(bit_count(xor(x.hash, y.hash)) AS BIGINT) AS ham
        FROM dh x JOIN dh y ON x.doc_id < y.doc_id
        WHERE bit_count(xor(x.hash, y.hash)) <= 3""")),

    // ---- energy-gate voice-activity detection (VAD) ---------------------
    //      the audio-curation twin of the text quality filters: REAL
    //      WAV decode, non-overlapping 100-sample frames, speech =
    //      frame mean-squared amplitude over 10000 (between the
    //      fixture's space runs and letter band, so both branches
    //      fire), contiguous speech frames merged into segments — the
    //      speech-fraction / segment-count numbers an audio-corpus
    //      builder filters on. All-integer row-local mapPartitions;
    //      8-bit PCM is lossless so the oracle replays every frame
    //      decision from the source text bytes, segments via a lag
    //      window over the frame table.
    Q("m12_audio_vad",
      (s, d) => {
        import s.implicits._
        MultimodalOps.vadStats(MultimodalOps.encodeWav(
            MultimodalOps.buildAssets(Tables.documents(s, d))
              .as[MultimodalOps.MediaAsset]))
          .toDF()
      },
      Some("""
        WITH a AS (SELECT doc_id AS asset_id,
                     CAST(LENGTH(text) AS BIGINT) AS n,
                     list_transform(string_split(text, ''), x -> ascii(x))
                       AS cs
                   FROM documents),
        f AS (SELECT asset_id, t.f,
                list_slice(cs, t.f * 100 + 1, t.f * 100 + 100) AS fr
              FROM a CROSS JOIN LATERAL
                unnest(range(0, (n + 99) // 100)) t(f)),
        e AS (SELECT asset_id, f,
                CAST(COALESCE(list_sum(list_transform(fr, x -> x * x)), 0)
                  AS BIGINT) AS e,
                len(fr) AS alen
              FROM f),
        g AS (SELECT asset_id, f, e, (e > alen * 10000) AS speech FROM e),
        h AS (SELECT asset_id, e, speech,
                CASE WHEN speech AND NOT COALESCE(LAG(speech) OVER (
                  PARTITION BY asset_id ORDER BY f), FALSE)
                  THEN 1 ELSE 0 END AS st
              FROM g)
        SELECT a.asset_id, CAST((a.n + 99) // 100 AS BIGINT) AS n_frames,
          CAST(COALESCE(SUM(CASE WHEN h.speech THEN 1 ELSE 0 END), 0)
            AS BIGINT) AS n_speech,
          CAST(COALESCE(SUM(h.st), 0) AS BIGINT) AS n_segments,
          CAST(COALESCE(SUM(h.e), 0) AS BIGINT) AS sum_energy
        FROM a LEFT JOIN h USING (asset_id)
        GROUP BY a.asset_id, a.n"""))
  )

  /** m11 oracle: the 64 dHash gradient bits as explicit CASE terms —
    * per-bit literal values from Scala (DuckDB raises on 1 << 63), grid
    * columns precomputed (width fixed at encodePng's 32), the row
    * offset (gy*h//8)*32 left dynamic per document. Pixel (sx, sy) is
    * byte sy*32+sx of the text, zero beyond the end (the PNG pad). */
  private def dhashTermsSql(): String =
    (for (gy <- 0 until 8; gx <- 0 until 8) yield {
      val sx0 = gx * 32 / 9
      val sx1 = (gx + 1) * 32 / 9
      val bit = 1L << (gy * 8 + gx)
      s"""CASE WHEN COALESCE(cs[($gy*h//8)*32 + ${sx0 + 1}], 0)
         |  > COALESCE(cs[($gy*h//8)*32 + ${sx1 + 1}], 0)
         |  THEN CAST($bit AS BIGINT) ELSE CAST(0 AS BIGINT) END"""
        .stripMargin
    }).mkString("(", "\n          + ", ")")
}
