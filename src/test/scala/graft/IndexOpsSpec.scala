package graft

import org.apache.spark.sql.functions._
import graft.operators.IndexOps

class IndexOpsSpec extends SparkSpec {
  import spark.implicits._

  test("globalRowIndex matches a global row_number without one-task sort") {
    val df = (1 to 997).map(i => ((i * 7919) % 1000, i)).toDF("key", "payload")
      .repartition(13)
    val indexed = IndexOps.globalRowIndex(df,
      Seq(col("key").asc, col("payload").asc))
    val got = indexed.orderBy("row_idx").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
    val expected = (1 to 997).map(i => ((i * 7919) % 1000, i))
      .sortBy(identity).zipWithIndex
      .map { case ((k, p), i) => (k, p, i.toLong) }
    assert(got.toSeq == expected)
  }

  test("hashSample is deterministic and key-stable") {
    val df = (1L to 10000L).toDF("id")
    val s1 = IndexOps.hashSample(df, col("id"), 0.1).collect().map(_.getLong(0)).toSet
    val s2 = IndexOps.hashSample(df, col("id"), 0.1).collect().map(_.getLong(0)).toSet
    assert(s1 == s2)
    assert(s1.size > 700 && s1.size < 1300, s"got ${s1.size}")
    // monotone: a larger fraction strictly contains the smaller sample
    val s3 = IndexOps.hashSample(df, col("id"), 0.2).collect().map(_.getLong(0)).toSet
    assert(s1.subsetOf(s3))
  }

  test("epochShuffle: seeded permutation is reproducible, partitioning-" +
      "invariant, seed-sensitive, and shards are contiguous runs") {
    import org.apache.spark.sql.functions._
    val docs = (0L until 500L).toDF("id")
    def order(df: org.apache.spark.sql.DataFrame, seed: Long) =
      IndexOps.epochShuffle(df, col("id"), seed, shardSize = 64L)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val a = order(docs, seed = 1L)
    // a permutation: every position exactly once
    assert(a.map(_._2).sorted.toSeq == (0L until 500L))
    // reproducible across runs AND input partitionings
    assert(order(docs.repartition(17), 1L).sortBy(_._1).toSeq ==
      a.sortBy(_._1).toSeq)
    // a different seed is a different permutation
    assert(order(docs, 2L).sortBy(_._1).map(_._2).toSeq !=
      a.sortBy(_._1).map(_._2).toSeq)
    // shard_id = pos div 64, so shards are contiguous position runs of 64
    assert(a.forall { case (_, pos, sh) => sh == pos / 64 })
    assert(a.map(_._3).distinct.sorted.toSeq == (0L to 499L / 64))
  }

  test("portableHashSample thresholds on the md5 hex prefix") {
    val df = (1L to 10000L).toDF("id")
    val s = IndexOps.portableHashSample(df, col("id"), 0.125)
      .collect().map(_.getLong(0)).toSet
    assert(s.size > 1000 && s.size < 1500, s"got ${s.size}")
  }
}
