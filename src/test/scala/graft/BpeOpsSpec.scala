package graft

import graft.operators.BpeOps

/** Hand-computed BPE training on the Sennrich-style toy corpus:
  * low x5, lower x2, newest x3.
  *
  * Weighted pair counts, round by round (ties break count DESC then
  * left ASC then right ASC):
  *  1. (l,o)=7 ties (o,w)=7 -> 'l' < 'o' picks (l,o)      -> lo
  *  2. (lo,w)=7                                           -> low
  *  3. three-way tie at 3: (e,s) beats (e,w),(n,e),(s,t)  -> es
  *  4. (e,w)=3 beats (n,e),(w,es),(es,t) on left 'e'      -> ew
  *  5. (es,t)=3 beats (ew,es),(n,ew) on left 'es' < 'ew'  -> est
  */
class BpeOpsSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "low low low low low"),
    (2L, "lower lower"),
    (3L, "newest newest newest")).toDF("doc_id", "text")

  test("train learns the hand-computed merge table in order") {
    val merges = BpeOps.train(docs, rounds = 5).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
      .sortBy(_._1)
    assert(merges.toSeq == Seq(
      (1, "l", "o", 7L),
      (2, "lo", "w", 7L),
      (3, "e", "s", 3L),
      (4, "e", "w", 3L),
      (5, "es", "t", 3L)), merges.mkString(", "))
  }

  test("encode tokenizes unseen text with the learned merges") {
    val merges = Seq("l" -> "o", "lo" -> "w", "e" -> "s", "e" -> "w",
      "es" -> "t")
    val toks = BpeOps.encode(Seq((9L, "lowest")).toDF("doc_id", "text"), merges)
      .select("bpe_tokens").as[Seq[String]].collect().head
    // " l o w e s t " -> lo -> low -> es -> (no 'e w') -> est
    assert(toks == Seq("low", "est"), toks.mkString("|"))
  }

  test("train stops early when no pairs remain") {
    val tiny = Seq((1L, "ab ab")).toDF("doc_id", "text")
    val merges = BpeOps.train(tiny, rounds = 5).collect()
    // one merge (a,b) exhausts every word
    assert(merges.length == 1)
    assert(merges.head.getString(1) == "a" && merges.head.getString(2) == "b")
  }
}
