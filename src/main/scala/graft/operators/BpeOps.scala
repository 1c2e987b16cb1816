package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding merge-table TRAINING, distributed the way the
  * algorithm actually scales (Sennrich et al. 2016, "Neural Machine
  * Translation of Rare Words with Subword Units"):
  *
  *  - train over the VOCABULARY (distinct pre-tokenized words with
  *    occurrence counts), never the raw corpus — at 100 TB the corpus
  *    has ~1e13 token occurrences but only ~1e7 distinct words, and
  *    every BPE statistic is a weighted sum over distinct words;
  *  - each word's symbol sequence is a SPACE-JOINED STRING (" l o w "),
  *    so one merge round is a plain `replace(' l r ' -> ' lr ')` —
  *    greedy, left-to-right, non-overlapping in exactly the same way
  *    on every SQL engine, which is what lets the DuckDB oracle replay
  *    training as a mechanical CTE chain (see bpeOracleSql);
  *  - one round = one pair-count shuffle (explode adjacent symbol
  *    pairs, sum word weights) + a ONE-ROW argmax collect (the chosen
  *    merge is a scalar, the only thing that ever reaches the driver)
  *    + a row-local substitution;
  *  - the vocab frame is eagerly localCheckpoint'ed every round — the
  *    same lineage-rotation discipline as the dedup fixpoint and the
  *    graph operators; without it round R replays R substitutions on
  *    top of the scan.
  *
  * Ties in pair counts break deterministically (count DESC, left ASC,
  * right ASC) so two engines — or two cluster runs — learn the same
  * table.
  */
object BpeOps {

  /** Pre-tokenize to lowercase alphanumeric words and weight each
    * distinct word by its corpus occurrence count. Symbols are then
    * single characters, space-joined with a leading/trailing space so
    * every symbol occurrence is ' '-delimited on both sides. */
  def vocab(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs
      .select(explode(split(lower(col(textCol)), "[^a-z0-9]+")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("w"))
      .select(
        concat(lit(" "), array_join(split(col("word"), ""), " "), lit(" "))
          .as("seq"),
        col("w"))

  /** one round's pair counts: adjacent symbol pairs weighted by word
    * frequency, one shuffle keyed by (left, right) */
  private def pairCounts(vocabDf: DataFrame): DataFrame = {
    val syms = split(trim(col("seq")), " ")
    vocabDf
      .select(col("w"), explode(arrays_zip(
        slice(syms, lit(1), size(syms) - 1),
        slice(syms, lit(2), size(syms) - 1))).as("p"))
      .select(col("p.0").as("lft"), col("p.1").as("rgt"), col("w"))
      .groupBy("lft", "rgt").agg(sum(col("w")).as("cnt"))
  }

  /** Train `rounds` merges; returns (merge_rank, lft, rgt, weight).
    * Stops early if the vocabulary runs out of mergeable pairs. */
  def train(docs: DataFrame, rounds: Int): DataFrame = {
    val spark = docs.sparkSession
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    var v = vocab(docs).localCheckpoint(true)
    val merges = scala.collection.mutable.ArrayBuffer[(Int, String, String, Long)]()
    var exhausted = false
    for (round <- 1 to rounds if !exhausted) {
      // deterministic argmax: ONE row to the driver — the merge decision
      // is a scalar; TakeOrdered(1) never materializes the pair table
      val best = pairCounts(v)
        .orderBy(desc("cnt"), asc("lft"), asc("rgt")).limit(1).collect()
      if (best.isEmpty) exhausted = true
      else {
        val (l, r, c) =
          (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        merges += ((round, l, r, c))
        val prev = v
        v = v.withColumn("seq", call_function("replace",
            col("seq"), lit(s" $l $r "), lit(s" $l$r ")))
          .localCheckpoint(true)
        prev.unpersist(false)
      }
    }
    v.unpersist(false)
    import spark.implicits._
    merges.toSeq.toDF("merge_rank", "lft", "rgt", "weight")
  }

  /** Tokenize with an already-learned merge table: apply the merges in
    * rank order to the space-joined character sequence — row-local
    * chained `replace`, no shuffle, no driver involvement; this is the
    * encode path a curation pipeline runs over the full corpus after
    * training on the vocab. `merges` is a small driver-side list (the
    * learned table), broadcast implicitly as literals in the plan. */
  def encode(docs: DataFrame, merges: Seq[(String, String)],
             textCol: String = "text"): DataFrame = {
    val seq0: Column =
      concat(lit(" "), array_join(split(lower(col(textCol)), ""), " "), lit(" "))
    val merged = merges.foldLeft(seq0) { case (c, (l, r)) =>
      call_function("replace", c, lit(s" $l $r "), lit(s" $l$r "))
    }
    docs.withColumn("bpe_tokens", split(trim(merged), " +"))
  }

  /** Corpus encode that scales to a REAL vocabulary (~32k merges):
    * the merge table rides to executors as ONE broadcast list and every
    * row folds it in plain JVM string code inside a single mapPartitions
    * pass — the plan carries one function call, not a `replace` chain
    * that grows (and blows the JVM 64KB codegen method limit) linearly
    * with the vocab. Bit-identical to [[encode]] BY CONSTRUCTION: per
    * merge it runs the same leftmost-non-overlapping
    * `" l r " -> " lr "` substitution (java.lang.String.replace has
    * exactly the SQL replace's semantics, including the subtle
    * delimiter-consumption behavior on runs — " a a a a " merges
    * symbols 0&1 and 3&4, never 1&2 — which is why this is a string
    * replay and NOT the heap-greedy rank merger: that algorithm merges
    * runs differently and would break the oracle equivalence the gate
    * depends on). A per-row symbol-presence set prunes merges whose
    * components can't occur, so a 32k-merge table costs one hash probe
    * per inapplicable merge, not a scan. */
  def encodeBulk(docs: DataFrame, merges: Seq[(String, String)],
                 textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    val bc = spark.sparkContext.broadcast(merges.toArray)
    val enc = udf { (text: String) =>
      // Locale.ROOT, not the JVM default: Spark's lower() (used by
      // encode/train) is locale-independent, and a Turkish/Azeri default
      // locale would map 'I' to dotless 'ı' here, breaking the documented
      // bit-identity between encodeBulk and encode.
      val t = if (text == null) "" else text.toLowerCase(java.util.Locale.ROOT)
      val sb = new java.lang.StringBuilder(t.length * 2 + 2)
      val present = new java.util.HashSet[String]()
      sb.append(' ')
      var i = 0
      while (i < t.length) {
        val c = t.charAt(i)
        sb.append(c).append(' ')
        present.add(String.valueOf(c))
        i += 1
      }
      var s = sb.toString
      for ((l, r) <- bc.value) {
        if (present.contains(l) && present.contains(r)) {
          val out = s.replace(s" $l $r ", s" $l$r ")
          if (out ne s) { s = out; present.add(l + r) }
        }
      }
      // mirror split(trim(s), ' +') exactly, including the empty-input
      // case where Spark's split yields [""] rather than []
      val t2 = s.trim
      if (t2.isEmpty) Array("") else t2.split(" +")
    }
    docs.withColumn("bpe_tokens", enc(col(textCol)))
  }

  /** Batched training: learn `totalMerges` merges taking up to
    * `batchSize` pairs per pair-count round instead of one — the
    * standard fix for the per-merge driver round trip that caps
    * sequential training at toy vocab sizes (a 32k-merge table costs
    * ~32k/B shuffles instead of 32k). Per round the top candidates come
    * back in ONE bounded collect (4*batchSize rows — a merge-table-
    * sized driver transfer, the TextOps:748 lifecycle, never data
    * rows); candidates are accepted greedily in (count DESC, lft, rgt)
    * order, SKIPPING any pair sharing a symbol with an already-accepted
    * pair in the same batch — symbol-disjoint merges can't change each
    * other's counts, so each accepted pair's count is exactly what a
    * sequential round would have seen. batchSize=1 reproduces [[train]]
    * bit-for-bit (spec-pinned); larger batches may legitimately diverge
    * from sequential training where a round's merge creates a new pair
    * that would have outranked the next candidate — the accepted
    * batching tradeoff (Sennrich's released subword-nmt trains
    * sequentially; production tokenizers batch). */
  def trainBatched(docs: DataFrame, totalMerges: Int,
                   batchSize: Int): DataFrame = {
    val spark = docs.sparkSession
    require(totalMerges >= 1, s"totalMerges must be >= 1, got $totalMerges")
    require(batchSize >= 1, s"batchSize must be >= 1, got $batchSize")
    var v = vocab(docs).localCheckpoint(true)
    val merges = scala.collection.mutable.ArrayBuffer[(Int, String, String, Long)]()
    var exhausted = false
    while (merges.length < totalMerges && !exhausted) {
      val want = math.min(batchSize, totalMerges - merges.length)
      val top = pairCounts(v)
        .orderBy(desc("cnt"), asc("lft"), asc("rgt"))
        .limit(want * 4).collect()
      if (top.isEmpty) exhausted = true
      else {
        val used = scala.collection.mutable.HashSet[String]()
        val accepted = scala.collection.mutable.ArrayBuffer[(String, String, Long)]()
        var j = 0
        while (j < top.length && accepted.length < want) {
          val (l, r, c) =
            (top(j).getString(0), top(j).getString(1), top(j).getLong(2))
          if (!used.contains(l) && !used.contains(r)) {
            accepted += ((l, r, c))
            used += l; used += r
          }
          j += 1
        }
        // fewer candidates than asked for AND none accepted -> the pair
        // table itself is exhausted
        if (accepted.isEmpty) exhausted = true
        else {
          val prev = v
          var seqCol: Column = col("seq")
          for ((l, r, c) <- accepted) {
            merges += ((merges.length + 1, l, r, c))
            seqCol = call_function("replace",
              seqCol, lit(s" $l $r "), lit(s" $l$r "))
          }
          v = v.withColumn("seq", seqCol).localCheckpoint(true)
          prev.unpersist(false)
        }
      }
    }
    v.unpersist(false)
    import spark.implicits._
    merges.toSeq.toDF("merge_rank", "lft", "rgt", "weight")
  }

  /** The DuckDB replay of `train` as an explicit CTE chain — the oracle
    * cannot loop, so each round is spelled out: p{i} counts pairs,
    * b{i} picks the argmax with the same tie-break, v{i} substitutes
    * with the same `replace`. Kept here so the training code and its
    * oracle stay in one file. The MATERIALIZED hints are load-bearing:
    * each v{i} is referenced twice, so an inlining planner would expand
    * the chain into 2^rounds scans of the base table (observed as a
    * file-handle exhaustion at rounds=8). */
  def bpeOracleSql(rounds: Int, table: String = "documents"): String =
    trainCtes(rounds, table) + "\n      " +
      (1 to rounds).map { i =>
        s"SELECT $i AS merge_rank, lft, rgt, CAST(cnt AS BIGINT) AS weight FROM b$i"
      }.mkString("\n      UNION ALL ")

  /** The CORPUS-ENCODE replay: learn the b1..b{rounds} merge table with
    * the same chain as `bpeOracleSql`, then apply the merges in rank
    * order to the character sequence of every document (the same
    * chained leftmost-non-overlapping `replace` as `encode`), and
    * aggregate the resulting merged tokens (length >= 2 — exactly the
    * learned units; single characters and punctuation fall out). An
    * exhausted round (b{i} empty — more rounds requested than the
    * corpus has mergeable pairs) is a NO-OP replace via COALESCE: the
    * target falls back to chr(1) repeated 3x — three adjacent non-space
    * chars can only occur inside a merged symbol, and merged symbols
    * are alnum-only (training tokenizes to [a-z0-9] words), so the
    * fallback pattern never matches — matching the engine side, which
    * simply skips the merge; without the guard the NULL scalar
    * subquery nulls the whole replace chain and the mismatch surfaces
    * as a confusing empty oracle rather than a no-op. */
  def encodeOracleSql(rounds: Int, table: String = "documents"): String =
    trainCtes(rounds, table) + s""",
      enc AS (SELECT ${encodeChainSql(rounds)} AS seq FROM $table),
      tok AS (SELECT unnest(string_split_regex(trim(seq), ' +')) AS token
              FROM enc)
      SELECT token, COUNT(*) AS n
      FROM tok WHERE LENGTH(token) >= 2 GROUP BY 1"""

  /** The ROUND-TRIP INTEGRITY replay (t38): learn the merge table,
    * encode every document, and check the invariant a tokenizer ships
    * with — detokenization loses nothing: the tokens concatenated back
    * together equal lower(text) with spaces removed (space is the BPE
    * word boundary here, spent by tokenization itself), plus the
    * chars-per-1000-tokens compression diagnostic as exact integers. */
  def roundtripOracleSql(rounds: Int, table: String = "documents"): String =
    trainCtes(rounds, table) + s""",
      enc AS (SELECT doc_id, text, ${encodeChainSql(rounds)} AS seq
              FROM $table),
      tok AS (SELECT doc_id, text,
                string_split_regex(trim(seq), ' +') AS toks
              FROM enc)
      SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
        array_to_string(toks, '') = replace(lower(text), ' ', '')
          AS roundtrip_ok,
        CAST(length(replace(lower(text), ' ', '')) * 1000 // len(toks)
          AS BIGINT) AS chars_per_kilo_token
      FROM tok"""

  /** the per-document chained-replace encode expression shared by
    * [[encodeOracleSql]] and [[encodePackOracleSql]] — see
    * encodeOracleSql's scaladoc for the chr(1) no-op-merge guard */
  private def encodeChainSql(rounds: Int): String = {
    val seq0 =
      s"' ' || array_to_string(string_split(lower(text), ''), ' ') || ' '"
    (1 to rounds).foldLeft(seq0) { (acc, i) =>
      s"""replace($acc,
            COALESCE(' ' || (SELECT lft FROM b$i) || ' ' || (SELECT rgt FROM b$i) || ' ',
                     chr(1) || chr(1) || chr(1)),
            COALESCE(' ' || (SELECT lft FROM b$i) || (SELECT rgt FROM b$i) || ' ', ''))"""
    }
  }

  /** The TOKEN-BUDGET-PACKING replay (t30): learn the merge table, BPE-
    * encode every document, count its tokens (ALL tokens — unmerged
    * single characters cost context length too, unlike t26's merged-
    * unit census), then replay t14's deterministic start-offset pack
    * assignment over the BPE counts: per lang in doc_id order,
    * pack_id = floor((cumsum − n_tok) / budget). */
  def encodePackOracleSql(rounds: Int, budget: Long,
                          table: String = "documents"): String =
    trainCtes(rounds, table) + s""",
      enc AS (SELECT doc_id, lang, ${encodeChainSql(rounds)} AS seq
              FROM $table),
      nt AS (SELECT doc_id, lang,
               CAST(len(string_split_regex(trim(seq), ' +')) AS BIGINT)
                 AS n_tok
             FROM enc),
      c AS (SELECT doc_id, lang, n_tok,
              SUM(n_tok) OVER (PARTITION BY lang ORDER BY doc_id ASC
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
            FROM nt)
      SELECT lang, CAST(FLOOR((cum - n_tok) / $budget) AS BIGINT) AS pack_id,
        COUNT(*) AS n_docs, CAST(SUM(n_tok) AS BIGINT) AS pack_tokens,
        MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
      FROM c GROUP BY 1, 2"""

  private def trainCtes(rounds: Int, table: String): String = {
    val head = s"""
      WITH v0 AS MATERIALIZED (
        SELECT ' ' || array_to_string(string_split(word, ''), ' ') || ' ' AS seq,
               COUNT(*) AS w
        FROM (SELECT unnest(string_split_regex(lower(text), '[^a-z0-9]+')) AS word
              FROM $table)
        WHERE LENGTH(word) > 0 GROUP BY 1)"""
    val stages = (1 to rounds).map { i =>
      s"""
      p$i AS (
        SELECT s[i] AS lft, s[i + 1] AS rgt, SUM(w) AS cnt
        FROM (SELECT string_split(trim(seq), ' ') AS s, w FROM v${i - 1}) t,
             unnest(range(1, len(s))) u(i)
        GROUP BY 1, 2),
      b$i AS MATERIALIZED (SELECT lft, rgt, cnt FROM p$i
              ORDER BY cnt DESC, lft ASC, rgt ASC LIMIT 1),
      v$i AS MATERIALIZED (
        SELECT replace(seq,
            ' ' || (SELECT lft FROM b$i) || ' ' || (SELECT rgt FROM b$i) || ' ',
            ' ' || (SELECT lft FROM b$i) || (SELECT rgt FROM b$i) || ' ') AS seq,
          w FROM v${i - 1})"""
    }.mkString(",", ",", "")
    head + stages
  }
}
