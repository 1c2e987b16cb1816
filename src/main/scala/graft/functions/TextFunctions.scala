package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for the LLM-data-pipeline surface: tokenize,
  * n-gram shingles, stopword scoring, rolling-hash fingerprints.
  *
  * Everything is a stock Catalyst expression (split / higher-order
  * functions) — no UDFs, so the whole surface stays inside whole-stage
  * codegen and is oracle-comparable against equivalent DuckDB list
  * lambdas. Helpers take column *names* (not Columns) because several
  * are built via `expr` HOF strings that must reference the input by
  * name.
  */
object TextFunctions {

  /** English function-word markers used by langid + quality scoring.
    * Tiny by design: deterministic and SQL-expressible on both engines. */
  val EnglishStopwords: Seq[String] =
    Seq("the", "a", "an", "and", "of", "to", "in", "is", "with", "for")

  /** whitespace tokenization; trim first so leading/trailing blanks
    * don't produce empty tokens */
  def tokens(textCol: String): Column = split(trim(col(textCol)), " +")

  /** word n-grams of an array<string> column as space-joined strings;
    * empty array when the doc has fewer than n tokens (guard needed:
    * Spark's sequence(1,0) would count *down*) */
  def wordNgrams(toksCol: String, n: Int): Column = {
    val parts = (0 until n).map(k => s"element_at($toksCol, CAST(i+$k AS INT))").mkString(", ")
    expr(
      s"""CASE WHEN size($toksCol) >= $n
         |THEN transform(sequence(1, size($toksCol)-${n - 1}), i -> concat_ws(' ', $parts))
         |ELSE array() END""".stripMargin)
  }

  /** how many tokens appear in `words` (with repetition) */
  def wordlistCount(toksCol: String, words: Seq[String]): Column = {
    val lst = words.map(w => s"'$w'").mkString(", ")
    expr(s"CAST(size(filter($toksCol, t -> t IN ($lst))) AS BIGINT)")
  }

  def tokenCount(toksCol: String): Column =
    expr(s"CAST(size($toksCol) AS BIGINT)")

  def distinctTokenCount(toksCol: String): Column =
    expr(s"CAST(size(array_distinct($toksCol)) AS BIGINT)")

  /** deterministic 31-base rolling hash over codepoints mod 1e9+7 —
    * a document fingerprint comparable to DuckDB's
    * list_reduce(list_prepend(0, list_transform(string_split(t,''), ascii)), ...).
    * Native codegen'd expression ([[graft.expressions.RollingHashExpr]],
    * registered by GraftExtensions) — the interpreted HOF form
    * `aggregate(split(text,''), ...)` it replaces materialized a
    * per-character string array per document; TextExpressionsSpec pins
    * equality between the two on ASCII/BMP input. */
  def rollingHashFingerprint(textCol: String): Column =
    call_function("rolling_hash", col(textCol))
}
