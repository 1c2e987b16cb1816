package graft

import org.apache.spark.sql.functions._
import graft.operators.UnigramOps

/** Hand-computed pins for the unigram-LM trainer: the Viterbi DP, its
  * longer-piece tie-break, the coverage conservation law, and one full
  * EM round on a corpus small enough to verify on paper. */
class UnigramOpsSpec extends SparkSpec {

  private def wordsDf(ws: (String, Long)*) = {
    val s = spark
    import s.implicits._
    ws.toSeq.toDF("word", "freq")
  }

  private def countsMap(df: org.apache.spark.sql.DataFrame)
      : Map[String, Long] =
    df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("chars-only vocab degenerates to character counts") {
    val w = wordsDf("ab" -> 3L, "c" -> 1L)
    val vocab = Seq("a" -> 3L, "b" -> 3L, "c" -> 1L)
    assert(countsMap(UnigramOps.segmentCounts(w, vocab)) ==
      Map("a" -> 3L, "b" -> 3L, "c" -> 1L))
  }

  test("Viterbi picks fewest pieces, then highest usage") {
    // "aab": [a, ab] (2 pieces, usage 15) beats [aa, b] (2 pieces,
    // usage 3 + 1... using counts a=10 ab=5: usage 15 vs aa=2,b=1 -> 3)
    // and [a, a, b] (3 pieces)
    val w = wordsDf("aab" -> 1L)
    val vocab = Seq("a" -> 10L, "b" -> 1L, "aa" -> 2L, "ab" -> 5L)
    assert(countsMap(UnigramOps.segmentCounts(w, vocab)) ==
      Map("a" -> 1L, "ab" -> 1L))
  }

  test("exact cost ties break toward the longer LAST piece") {
    // [aa, b] and [a, ab] both cost 2*Big - 7; the dp CASE scans the
    // longer candidate first at the final position, so [a, ab] wins
    val w = wordsDf("aab" -> 1L)
    val vocab = Seq("a" -> 5L, "b" -> 5L, "aa" -> 2L, "ab" -> 2L)
    assert(countsMap(UnigramOps.segmentCounts(w, vocab)) ==
      Map("a" -> 1L, "ab" -> 1L))
  }

  test("coverage conservation: segment lengths sum to word lengths") {
    val w = wordsDf("banana" -> 7L, "bandana" -> 3L, "nab" -> 5L,
      "anna" -> 2L, "b" -> 11L)
    val vocab = Seq("a" -> 9L, "b" -> 4L, "n" -> 7L, "an" -> 6L,
      "na" -> 8L, "ban" -> 3L, "ana" -> 5L, "nan" -> 2L)
    val counts = UnigramOps.segmentCounts(w, vocab)
      .select(sum(col("cnt") * length(col("piece")))).head().getLong(0)
    val expected = w.select(sum(col("freq") * length(col("word"))))
      .head().getLong(0)
    assert(counts == expected)
  }

  test("one EM round end-to-end on a paper-checkable corpus") {
    val s = spark
    import s.implicits._
    val docs = Seq("ab ab ab c").toDF("text")
    // seed: chars a/b (3 each), c (1); multi 'ab' (3). Round 1
    // segments 'ab' as the single piece ab, 'c' as c: chars a/b end
    // at usage 0 (kept — the floor), c at 1, ab at 3.
    val out = countsMap(UnigramOps.train(docs, rounds = 1))
    assert(out == Map("a" -> 0L, "b" -> 0L, "c" -> 1L, "ab" -> 3L))
  }

  test("encodeCounts applies the trained vocab and reports merged units") {
    val s = spark
    import s.implicits._
    val docs = Seq("ab ab ab c").toDF("text")
    // trained round-1 vocab = {a:0, b:0, c:1, ab:3}; encoding segments
    // 'ab' as [ab] and 'c' as [c]; only length>=2 units are reported
    assert(countsMap(UnigramOps.encodeCounts(docs, rounds = 1)) ==
      Map("ab" -> 3L))
  }

  test("segmentationLengths reports Viterbi piece counts per word") {
    val w = wordsDf("ab" -> 3L, "aab" -> 1L, "c" -> 2L)
    val vocab = Seq("a" -> 10L, "b" -> 1L, "c" -> 2L, "ab" -> 5L)
    val m = UnigramOps.segmentationLengths(w, vocab).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // 'ab' -> [ab] (1), 'aab' -> [a, ab] (2), 'c' -> [c] (1)
    assert(m == Map("ab" -> 1L, "aab" -> 2L, "c" -> 1L))
  }

  test("pruning keeps the char floor and at most the keep-schedule " +
      "of multi pieces") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      "abcd abcd dcba bacd cdab abab cdcd aabb ccdd adbc").toDF("text")
    // seedMulti=4 -> keep after r1 = 3, after r2 = 2
    val out = UnigramOps.train(docs, rounds = 2, seedMulti = 4).collect()
    val (chars, multi) = out.partition(_.getString(0).length == 1)
    assert(chars.map(_.getString(0)).toSet == Set("a", "b", "c", "d"))
    assert(multi.length <= 2, multi.mkString(", "))
  }
}
