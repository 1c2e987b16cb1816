package graft

import org.apache.spark.sql.functions._
import graft.expressions.VectorExpressions
import graft.operators.DedupOps

class MinHashAggSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    1L -> "the quick brown fox jumps over the lazy dog",
    2L -> "the quick brown fox jumps over the lazy cat",
    3L -> "completely different text with no shared shingles at all"
  ).toDF("doc_id", "text")

  test("one-pass aggregate matches the column-wise signatures exactly") {
    VectorExpressions.registerAll(spark)
    val k = 16
    val cols = DedupOps.minHashSignatures(docs, 3, k)
      .collect().map(r => r.getLong(0) -> (1 to k).map(i => r.getLong(i))).toMap
    val agg = DedupOps.shinglePostings(docs, 3)
      .groupBy("doc_id")
      .agg(call_function("minhash_agg", col("gram_id"), lit(k)).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(cols.keySet == agg.keySet)
    cols.foreach { case (id, sig) => assert(agg(id) == sig, s"doc $id") }
  }

  test("all-NULL groups evaluate to NULL like min()") {
    VectorExpressions.registerAll(spark)
    val r = Seq((1L, Option.empty[Long]), (1L, Option.empty[Long]),
        (2L, Some(42L)))
      .toDF("g", "x")
      .groupBy("g").agg(call_function("minhash_agg", col("x"), lit(4)).as("sig"))
      .collect().map(x => x.getLong(0) -> Option(x.get(1))).toMap
    assert(r(1L).isEmpty)
    assert(r(2L).isDefined)
  }

  test("k must be a positive integer literal") {
    VectorExpressions.registerAll(spark)
    intercept[Exception] {
      docs.groupBy("doc_id")
        .agg(call_function("minhash_agg", xxhash64(col("text")), lit(0)))
        .collect()
    }
  }
}
