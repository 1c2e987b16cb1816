package graft

import graft.operators.MultimodalOps

class MultimodalOpsSpec extends SparkSpec {
  import spark.implicits._

  test("featurePipeline decodes deterministic features from bytes") {
    val docs = Seq((1L, "abc"), (2L, "")).toDF("doc_id", "text")
    val feats = MultimodalOps.featurePipeline(spark, docs)
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
}
