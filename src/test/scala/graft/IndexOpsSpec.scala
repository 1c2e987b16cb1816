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

  test("portableHashSample thresholds on the md5 hex prefix") {
    val df = (1L to 10000L).toDF("id")
    val s = IndexOps.portableHashSample(df, col("id"), 0.125)
      .collect().map(_.getLong(0)).toSet
    assert(s.size > 1000 && s.size < 1500, s"got ${s.size}")
  }
}
