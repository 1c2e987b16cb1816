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

  private def tokensOf(df: org.apache.spark.sql.DataFrame): Map[Long, Seq[String]] =
    df.select("doc_id", "bpe_tokens").as[(Long, Seq[String])]
      .collect().toMap

  test("encodeBulk is bit-identical to encode, including the run quirk") {
    val merges = Seq("l" -> "o", "lo" -> "w", "e" -> "s", "e" -> "w",
      "es" -> "t", "w" -> "w")
    // "wwww" exercises the delimiter-consumption subtlety: the chained
    // replace merges symbols 0&1 and (skipping 2) NOT 2&3 within one
    // pass — " w w w w " -> " ww w w " — and encodeBulk must reproduce
    // exactly that, not the heap-greedy result [ww, ww]
    val docs = Seq((1L, "lowest"), (2L, "wwww low low"), (3L, ""),
      (4L, "a  b"), (5L, "low lower lowest newest")).toDF("doc_id", "text")
    val viaChain = tokensOf(BpeOps.encode(docs, merges))
    val viaBulk = tokensOf(BpeOps.encodeBulk(docs, merges))
    assert(viaBulk == viaChain,
      s"bulk $viaBulk\nchain $viaChain")
    assert(viaChain(2L).take(3) == Seq("ww", "w", "w"), viaChain(2L))
  }

  test("encodeBulk matches encode on the real corpus with trained merges") {
    val docs = spark.read.parquet(s"$sfTiny/documents.parquet")
      .select("doc_id", "text")
    val merges = BpeOps.train(docs, rounds = 8).collect()
      .sortBy(_.getInt(0)).map(r => (r.getString(1), r.getString(2))).toSeq
    assert(merges.length == 8)
    val viaChain = tokensOf(BpeOps.encode(docs, merges))
    val viaBulk = tokensOf(BpeOps.encodeBulk(docs, merges))
    assert(viaBulk == viaChain)
  }

  test("encodeBulk stays green at a 300-merge vocabulary") {
    // the literal-replace chain is plan-pathological here (300 nested
    // replace calls blow past the codegen method budget); the broadcast
    // table costs the plan ONE function call regardless of vocab size.
    // 295 junk merges over letters absent from the text must be no-ops;
    // the 5 real merges (ranked first) must still tokenize exactly.
    val junkChars = "bcdfghijkmnpqruvxyz" // no l/o/w/e/s/t, no 'a'
    val junk = (for {
      c1 <- junkChars; c2 <- junkChars
    } yield (c1.toString, c2.toString)).take(295)
    val merges = Seq("l" -> "o", "lo" -> "w", "e" -> "s", "e" -> "w",
      "es" -> "t") ++ junk
    assert(merges.length == 300)
    val toks = tokensOf(BpeOps.encodeBulk(
      Seq((9L, "lowest")).toDF("doc_id", "text"), merges))(9L)
    assert(toks == Seq("low", "est"), toks.mkString("|"))
  }

  test("trainBatched at batchSize=1 reproduces train bit-for-bit") {
    def table(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
      .sortBy(_._1).toSeq
    assert(table(BpeOps.trainBatched(docs, totalMerges = 5, batchSize = 1))
      == table(BpeOps.train(docs, rounds = 5)))
  }

  test("trainBatched learns symbol-disjoint batches with sequential counts") {
    // round-1 candidates: (l,o)=7, (o,w)=7, (w,e)=5, ... — accepted
    // greedily skipping symbol conflicts: (l,o) in, (o,w) OUT (shares
    // o), (w,e) in. Disjointness means each accepted count equals what
    // the sequential round would have seen ((w,e) is still 5 after the
    // (l,o) merge), and every merge stays applicable in rank order
    val merges = BpeOps.trainBatched(docs, totalMerges = 5, batchSize = 2)
      .collect().sortBy(_.getInt(0))
      .map(r => (r.getString(1), r.getString(2), r.getLong(3)))
    assert(merges.length == 5, merges.mkString(", "))
    assert(merges.head == (("l", "o", 7L)), merges.head)
    // the learned table must tokenize cleanly through encodeBulk
    val toks = tokensOf(BpeOps.encodeBulk(docs,
      merges.map(m => (m._1, m._2)).toSeq))
    assert(toks(1L).forall(_.nonEmpty))
  }
}
