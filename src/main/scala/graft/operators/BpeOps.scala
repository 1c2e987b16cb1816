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
    * learned units; single characters and punctuation fall out). The
    * scalar subqueries on b{i} assume training does not exhaust (every
    * fixture SF has > rounds distinct pairs); an exhausted round would
    * replace with NULL on the oracle but skip on the engine. */
  def encodeOracleSql(rounds: Int, table: String = "documents"): String = {
    val seq0 =
      s"' ' || array_to_string(string_split(lower(text), ''), ' ') || ' '"
    val chained = (1 to rounds).foldLeft(seq0) { (acc, i) =>
      s"""replace($acc,
            ' ' || (SELECT lft FROM b$i) || ' ' || (SELECT rgt FROM b$i) || ' ',
            ' ' || (SELECT lft FROM b$i) || (SELECT rgt FROM b$i) || ' ')"""
    }
    trainCtes(rounds, table) + s""",
      enc AS (SELECT $chained AS seq FROM $table),
      tok AS (SELECT unnest(string_split_regex(trim(seq), ' +')) AS token
              FROM enc)
      SELECT token, COUNT(*) AS n
      FROM tok WHERE LENGTH(token) >= 2 GROUP BY 1"""
  }

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
