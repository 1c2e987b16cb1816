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

  // ---- round-18: deep piece lengths + the per-length seed pool --------

  private def trainMap(docs: org.apache.spark.sql.DataFrame, rounds: Int,
      seedMulti: Int = 64, maxPieceLen: Int = UnigramOps.MaxPieceLen,
      seedPerLen: Int = 0): Map[String, Long] =
    countsMap(UnigramOps.train(docs, rounds, seedMulti, maxPieceLen,
      seedPerLen))

  test("the parameterized trainer at the small-cap config reproduces " +
      "the t50 chain value-for-value") {
    val s = spark
    import s.implicits._
    val docs = Seq("the banana band ban the bandana dan nab and",
      "an anna banana ad a banda and").toDF("text")
    // explicit (maxPieceLen=4, seedPerLen=0) must be the EXACT default
    // path — the t50/t51/t52 oracles replay the default constants, so
    // any drift here is a silent correctness break of three gates
    assert(trainMap(docs, rounds = 3) ==
      trainMap(docs, rounds = 3, maxPieceLen = 4, seedPerLen = 0))
    assert(countsMap(UnigramOps.encodeCounts(docs, rounds = 2)) ==
      countsMap(UnigramOps.encodeCounts(docs, rounds = 2,
        maxPieceLen = 4, seedPerLen = 0)))
  }

  test("deep config: pieces past 4 chars survive, floor intact, " +
      "deterministic, pool bounded") {
    val s = spark
    import s.implicits._
    // 'bananas' (7 chars) dominates: with maxPieceLen=8 + per-length
    // seeding it must survive as a single piece, which the len<=4
    // default can never produce
    val docs = Seq(("bananas bananas bananas bananas kiwi " * 3) +
      "grape melon").toDF("text")
    val deep = trainMap(docs, rounds = 2, maxPieceLen = 8, seedPerLen = 4)
    assert(deep.keys.exists(_.length > 4),
      s"no deep piece survived: ${deep.keys.toSeq.sorted}")
    assert(deep.contains("bananas"), deep.keys.toSeq.sorted.mkString(", "))
    // single-char floor: every corpus character present
    val alphabet = "bananaskiwigrapemelon".toSet.map((c: Char) => c.toString)
    assert(alphabet.subsetOf(deep.keySet))
    // multi-piece budget respects the shrink schedule from the
    // per-length pool: 4*(8-1)=28 -> 21 -> 15
    assert(deep.keys.count(_.length > 1) <= 15)
    // bit-determinism across runs (the EM chain has no float, no rand)
    assert(deep == trainMap(docs, rounds = 2, maxPieceLen = 8,
      seedPerLen = 4))
  }

  test("seedPoolPerLen keeps every length represented and bounds the " +
      "driver transfer") {
    val s = spark
    import s.implicits._
    val docs = Seq("abcdefgh abcdefgh abcd abcd ab ab xy xyz")
      .toDF("text")
    val w = UnigramOps.words(docs).localCheckpoint()
    try {
      val pool = UnigramOps.seedPoolPerLen(w, perLen = 2, maxPieceLen = 8)
      assert(pool.length <= 2 * 7)
      val byLen = pool.groupBy(_._1.length)
      // every length 2..8 with at least one candidate substring is in
      // the pool, at most perLen entries each
      for (l <- 2 to 8) {
        assert(byLen.getOrElse(l, Array.empty).length <= 2, s"len $l")
        assert(byLen.contains(l), s"len $l missing from the pool")
      }
      // and the global top-N shape would NOT have kept the longest: the
      // 2-char substrings alone outnumber a budget of 14 here
      assert(byLen(8).map(_._1).contains("abcdefgh"))
    } finally w.unpersist(false)
  }

  test("parameter validation fails loud") {
    val s = spark
    import s.implicits._
    val docs = Seq("ab").toDF("text")
    intercept[IllegalArgumentException] {
      UnigramOps.train(docs, rounds = 1, maxPieceLen = 1)
    }
    intercept[IllegalArgumentException] {
      UnigramOps.train(docs, rounds = 1,
        maxPieceLen = UnigramOps.MaxTrainPieceLen + 1)
    }
    intercept[IllegalArgumentException] {
      UnigramOps.train(docs, rounds = 1, maxPieceLen = 8, seedPerLen = -1)
    }
  }
}
