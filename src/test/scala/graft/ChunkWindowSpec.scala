package graft

import org.apache.spark.sql.functions._

/** Hand-computed boundary cases for the t21 chunk-window addressing —
  * the oracle checks per-source aggregates, this pins the per-document
  * arithmetic: ceil(max(n-size,0)/stride)+1 windows, window k covering
  * chars [k*stride+1, k*stride+size], last window short but never
  * empty, full text covered. */
class ChunkWindowSpec extends SparkSpec {
  import spark.implicits._

  private val (size, stride) = (500, 400)

  private def chunk(df: org.apache.spark.sql.DataFrame) =
    df.select(col("doc_id"),
      posexplode(expr(
        s"""transform(
              sequence(0, int(ceil(greatest(length(text) - $size, 0)
                                   / $stride.0D))),
              i -> substring(text, i * $stride + 1, $size))"""))
        .as(Seq("seq", "chunk")))

  test("window counts and lengths at the size/stride boundaries") {
    // n -> expected chunk count: <=500 -> 1; 501 -> 2 (ceil(1/400)=1);
    // 900 -> 2 (ceil(400/400)=1); 901 -> 3; 1300 -> 3
    val cases = Seq(1 -> 1, 400 -> 1, 500 -> 1, 501 -> 2, 900 -> 2,
      901 -> 3, 1300 -> 3)
    val docs = cases.zipWithIndex
      .map { case ((n, _), i) => (i.toLong, "x" * n) }.toDF("doc_id", "text")
    val got = chunk(docs).groupBy("doc_id")
      .agg(count(lit(1)).as("n_chunks"), max(length(col("chunk"))).as("maxlen"),
        min(length(col("chunk"))).as("minlen"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getInt(2), r.getInt(3)))
      .toMap
    cases.zipWithIndex.foreach { case ((n, want), i) =>
      val (nc, maxlen, minlen) = got(i.toLong)
      assert(nc == want, s"n=$n: expected $want chunks, got $nc")
      assert(maxlen <= size && minlen >= 1,
        s"n=$n: window lengths out of range [$minlen, $maxlen]")
    }
  }

  test("windows tile the text: every char covered, overlap = size - stride") {
    // distinct characters make coverage checkable by set union
    val text = (0 until 1300).map(i => ('a' + i % 26).toChar).mkString
    val rows = chunk(Seq((1L, text)).toDF("doc_id", "text"))
      .orderBy("seq").collect()
    assert(rows.length == 3)
    rows.zipWithIndex.foreach { case (r, k) =>
      val expected = text.slice(k * stride, k * stride + size)
      assert(r.getString(2) == expected, s"window $k mismatch")
    }
    // neighbors overlap by exactly size - stride = 100 chars
    assert(rows(0).getString(2).takeRight(100) == rows(1).getString(2).take(100))
  }
}
