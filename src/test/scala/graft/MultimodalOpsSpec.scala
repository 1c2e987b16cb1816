package graft

import graft.operators.MultimodalOps

class MultimodalOpsSpec extends SparkSpec {
  import spark.implicits._

  test("featurePipeline runs the REAL codec by default: PNG round-trip " +
      "pixel stats, zero padding accounted") {
    val docs = Seq((1L, "abc"), (2L, "")).toDF("doc_id", "text")
    val feats = MultimodalOps.featurePipeline(spark, docs)
      .collect().map(f => f.asset_id -> f).toMap
    // 'abc' becomes one 32x1 gray PNG row: 3 letter pixels + 29 pad
    // zeros; n_bytes is the decoded PIXEL count
    val f1 = feats(1L)
    assert(f1.n_bytes == 32)
    assert(math.abs(f1.mean_byte - (97 + 98 + 99) / 32.0) < 1e-12)
    assert(math.abs(f1.feature(0) - 29.0 / 32) < 1e-12) // pad zeros
    assert(math.abs(f1.feature(3) - 3.0 / 32) < 1e-12)  // 96-127 bin
    // empty payload still decodes: one all-pad row
    val f2 = feats(2L)
    assert(f2.n_bytes == 32 && f2.mean_byte == 0.0 && f2.feature(0) == 1.0)
  }

  test("decodeStub (the spec-only twin for undecodable payloads) stays " +
      "deterministic byte math") {
    val docs = Seq((1L, "abc"), (2L, "")).toDF("doc_id", "text")
    val feats = MultimodalOps.decodeStub(MultimodalOps.buildAssets(docs)
        .as[MultimodalOps.MediaAsset](
          org.apache.spark.sql.Encoders.product[MultimodalOps.MediaAsset]))
      .collect().map(f => f.asset_id -> f).toMap
    val f1 = feats(1L)
    assert(f1.n_bytes == 3)
    // 'a'=97 'b'=98 'c'=99 -> all in histogram bin 3 (96-127)
    assert(f1.feature.toSeq == Seq(0.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0, 0.0))
    assert(math.abs(f1.mean_byte - 98.0) < 1e-12)
    val f2 = feats(2L) // empty payload stays well-defined
    assert(f2.n_bytes == 0 && f2.mean_byte == 0.0)
  }

  test("resizeStub downsamples bytes and refreshes metadata") {
    val assets = MultimodalOps.buildAssets(
      Seq((9L, "abcdefghij")).toDF("doc_id", "text"))
    val r = MultimodalOps.resizeStub(
      assets.as[MultimodalOps.MediaAsset](
        org.apache.spark.sql.Encoders.product[MultimodalOps.MediaAsset]), 3)
      .collect().head
    assert(new String(r.content) == "adgj") // every 3rd byte
    assert(r.meta.byte_len == 4)
  }

  test("buildAssets computes metadata from the bytes") {
    val a = MultimodalOps.buildAssets(Seq((5L, "hello")).toDF("doc_id", "text"))
      .select("asset_id", "meta.byte_len", "meta.checksum").collect().head
    assert(a.getLong(0) == 5L && a.getLong(1) == 5L)
    assert(a.getString(2) == "5d41402abc4b2a76b9719d911017c592") // md5("hello")
  }

  test("encodePng -> decodeImage is a lossless real-codec round trip") {
    // 35 'a' bytes at width 32 -> 32x2 gray PNG with 29 zero pad pixels
    val docs = Seq((1L, "a" * 35)).toDF("doc_id", "text")
    val assets = MultimodalOps.buildAssets(docs)
      .as[MultimodalOps.MediaAsset]
    val enc = MultimodalOps.encodePng(assets).collect().head
    assert(enc.meta.format == "image/png")
    // a real PNG came out: magic bytes 89 50 4E 47
    assert((enc.content(0) & 0xff) == 0x89 && enc.content(1) == 'P'.toByte)
    val f = MultimodalOps.decodeImage(
      MultimodalOps.encodePng(assets)).collect().head
    assert(f.n_bytes == 64, s"pixel count: ${f.n_bytes}") // 32 x 2
    // 35 pixels of 'a'=97 (bin 3), 29 pad zeros (bin 0)
    assert(math.abs(f.mean_byte - 35.0 * 97 / 64) < 1e-12)
    assert(math.abs(f.feature(3) - 35.0 / 64) < 1e-12)
    assert(math.abs(f.feature(0) - 29.0 / 64) < 1e-12)
  }

  test("decodeImage reads BMP too and flags undecodable payloads") {
    // hand-build a 2x1 gray BMP through the same codec library
    val img = new java.awt.image.BufferedImage(
      2, 1, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    img.getRaster.setSample(0, 0, 0, 10)
    img.getRaster.setSample(1, 0, 0, 250)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "bmp", bos)
    val assets = Seq(
      MultimodalOps.MediaAsset(1L, bos.toByteArray,
        MultimodalOps.MediaMeta("image/bmp", bos.size().toLong, "x")),
      MultimodalOps.MediaAsset(2L, "not an image".getBytes,
        MultimodalOps.MediaMeta("text/plain", 12L, "y"))).toDS()
    val out = MultimodalOps.decodeImage(assets)
      .collect().map(f => f.asset_id -> f).toMap
    assert(out(1L).n_bytes == 2 && math.abs(out(1L).mean_byte - 130.0) < 1e-12)
    assert(out(1L).feature(0) == 0.5 && out(1L).feature(7) == 0.5)
    assert(out(2L).mean_byte == -1.0 && out(2L).feature.isEmpty)
  }

  test("encodeWav -> decodeAudio is a lossless real-codec round trip") {
    val docs = Seq((1L, "aA!"), (2L, "")).toDF("doc_id", "text")
    val wav = MultimodalOps.encodeWav(
      MultimodalOps.buildAssets(docs).as[MultimodalOps.MediaAsset])
    val metas = wav.collect().map(a => a.asset_id -> a).toMap
    assert(metas(1L).meta.format == "audio/wav")
    assert(metas(1L).content.length == 44 + 3) // canonical RIFF header
    val f = MultimodalOps.decodeAudio(wav)
      .collect().map(x => x.asset_id -> x).toMap
    // 'a'=97 'A'=65 '!'=33 — one level-64 crossing (65 -> 33)
    val f1 = f(1L)
    assert(f1.n_samples == 3 && f1.sample_rate == 8000)
    assert(f1.sum_amp == 97 + 65 + 33)
    assert(f1.sum_sq == 97 * 97 + 65 * 65 + 33 * 33)
    assert(f1.n_crossings == 1)
    // empty payload stays a valid zero-frame WAV
    val f2 = f(2L)
    assert(f2.n_samples == 0 && f2.sample_rate == 8000)
    assert(f2.sum_amp == 0 && f2.sum_sq == 0 && f2.n_crossings == 0)
  }

  test("decodeAudio flags undecodable payloads instead of dropping them") {
    val bad = Seq(MultimodalOps.MediaAsset(7L, Array[Byte](1, 2, 3),
      MultimodalOps.MediaMeta("application/octet-stream", 3L, "z"))).toDS()
    val f = MultimodalOps.decodeAudio(bad).collect().head
    assert(f.asset_id == 7L && f.sample_rate == -1L && f.n_samples == 0L)
  }

  test("resizeImage picks exactly the (x*f, y*f) source pixels") {
    // payload "abcdef" at width 2 is a 2x3 gray PNG:
    //   a b        factor-2 resize -> 1x2, pixels (0,0)='a', (0,2)='e'
    //   c d
    //   e f
    val docs = Seq((1L, "abcdef")).toDF("doc_id", "text")
    val png = MultimodalOps.encodePng(
      MultimodalOps.buildAssets(docs).as[MultimodalOps.MediaAsset], width = 2)
    val rs = MultimodalOps.resizeImage(png, factor = 2)
    val f = MultimodalOps.decodeImage(rs).collect().head
    assert(f.n_bytes == 2, s"resized pixel count: ${f.n_bytes}")
    assert(f.mean_byte == ('a' + 'e') / 2.0, s"mean: ${f.mean_byte}")
    val meta = rs.collect().head.meta
    assert(meta.format == "image/png" && meta.byte_len > 0)
  }

  test("resizeImage passes undecodable payloads through unchanged") {
    val bad = Seq(MultimodalOps.MediaAsset(7L, Array[Byte](1, 2, 3),
      MultimodalOps.MediaMeta("application/octet-stream", 3L, "z"))).toDS()
    val out = MultimodalOps.resizeImage(bad, factor = 4).collect().head
    assert(out.asset_id == 7L && out.meta.checksum == "z" &&
      out.content.toSeq == Seq[Byte](1, 2, 3))
  }

  /** a legal GRAY+ALPHA (2-band) PNG — the band layout that used to hit
    * the "average bands 0..2" branch and throw on band 2 */
  private def grayAlphaPng(w: Int, h: Int, gray: Int): Array[Byte] = {
    val cs = java.awt.color.ColorSpace.getInstance(
      java.awt.color.ColorSpace.CS_GRAY)
    val cm = new java.awt.image.ComponentColorModel(cs, true, false,
      java.awt.Transparency.TRANSLUCENT,
      java.awt.image.DataBuffer.TYPE_BYTE)
    val raster = cm.createCompatibleWritableRaster(w, h)
    for (y <- 0 until h; x <- 0 until w) {
      raster.setSample(x, y, 0, gray) // gray band
      raster.setSample(x, y, 1, 255)  // alpha band
    }
    val img = new java.awt.image.BufferedImage(cm, raster, false, null)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("decodeImage and resizeImage handle 2-band gray+alpha PNGs") {
    val png = grayAlphaPng(4, 4, gray = 200)
    val assets = Seq(MultimodalOps.MediaAsset(11L, png,
      MultimodalOps.MediaMeta("image/png", png.length.toLong, "x"))).toDS()
    val f = MultimodalOps.decodeImage(assets).collect().head
    // band 0 (gray) is the luminance; alpha must be ignored, not
    // averaged in, and band index 2 must never be read
    assert(f.n_bytes == 16 && f.mean_byte == 200.0,
      s"n=${f.n_bytes} mean=${f.mean_byte}")
    val r = MultimodalOps.resizeImage(assets, factor = 2).collect().head
    assert(r.meta.format == "image/png" && r.content.nonEmpty)
    val rf = MultimodalOps.decodeImage(
      Seq(r).toDS()).collect().head
    assert(rf.n_bytes == 4 && rf.mean_byte == 200.0,
      s"resized n=${rf.n_bytes} mean=${rf.mean_byte}")
  }

  test("dHashNearDups: near-identical images pair, different ones don't") {
    import org.apache.spark.sql.functions._
    val base = ("The quick brown fox jumps over the lazy dog. " * 8).getBytes("UTF-8")
    val tweaked = base.clone(); tweaked(40) = 'X'.toByte // one-pixel change
    val other = ("0123456789" * 36).getBytes("UTF-8")
    def asset(id: Long, bytes: Array[Byte]) = MultimodalOps.MediaAsset(
      id, bytes, MultimodalOps.MediaMeta("application/octet-stream",
        bytes.length.toLong, "x"))
    val assets = MultimodalOps.encodePng(
      Seq(asset(1L, base), asset(2L, tweaked), asset(3L, other),
        asset(4L, base)).toDS())
    val pairs = MultimodalOps.dHashNearDups(assets, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(pairs.get((1L, 4L)).contains(0L), s"exact dup missed: $pairs")
    assert(pairs.contains((1L, 2L)), s"near dup missed: $pairs") // <=3 bits
    assert(!pairs.keys.exists(p => p._1 == 3L || p._2 == 3L),
      s"unrelated image paired: $pairs")
    // corrupt payloads get a null hash and are excluded, not crashed on
    val withCorrupt = Seq(asset(9L, Array[Byte](1, 2, 3))).toDS()
    val dh = MultimodalOps.dHash64(withCorrupt).collect().head
    assert(dh.isNullAt(1))
  }

  test("vadStats: energy gate, segment merging, short-tail scaling, corrupt") {
    // 'z' (122^2 = 14884) clears the 10000 mean-sq bar, ' ' (1024) does
    // not; frames are 100 samples, so z*100 + ' '*100 + z*50 is
    // speech / silence / speech -> 2 segments, and the 50-sample tail
    // is judged by the SAME mean-sq bar (threshold scales with actual
    // frame length)
    val docs = Seq(
      (1L, "z" * 100 + " " * 100 + "z" * 50),
      (2L, "z" * 150),    // two contiguous speech frames -> 1 segment
      (3L, " " * 120))    // all silence
      .toDF("doc_id", "text")
    val got = MultimodalOps.vadStats(MultimodalOps.encodeWav(
        MultimodalOps.buildAssets(docs).as[MultimodalOps.MediaAsset]))
      .collect().map(v => v.asset_id ->
        ((v.n_frames, v.n_speech, v.n_segments))).toMap
    assert(got(1L) == ((3L, 2L, 2L)), s"got ${got(1L)}")
    assert(got(2L) == ((2L, 2L, 1L)), s"got ${got(2L)}")
    assert(got(3L) == ((2L, 0L, 0L)), s"got ${got(3L)}")
    // undecodable payloads keep their row, flagged
    val corrupt = MultimodalOps.vadStats(Seq(
      MultimodalOps.MediaAsset(9L, Array[Byte](1, 2, 3),
        MultimodalOps.MediaMeta("application/octet-stream", 3L, "x")))
      .toDS()).collect().head
    assert(corrupt.n_frames == -1L)
  }
}
