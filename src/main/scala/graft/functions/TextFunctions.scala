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

  /** URL canonicalization (RefinedWeb §3.2's URL-dedup prerequisite):
    * the row-local normalization that makes exact-URL dedup and
    * host-level stats meaningful on crawled corpora. Steps, in order —
    * stock regexp/HOF expressions, so the whole chain stays inside
    * codegen and replays verbatim in DuckDB (with the 'g' flag where
    * Spark's regexp_replace is implicitly global):
    *  1. drop the #fragment;
    *  2. lowercase scheme://host[:port] ONLY — paths are case-sensitive
    *     by spec and stay untouched;
    *  3. strip a leading www.;
    *  4. strip default ports (http:80 / https:443; a NON-default or
    *     mismatched port is meaningful and kept);
    *  5. strip utm_* tracking params by SPLITTING the query into params
    *     and filtering — a regex deletion cannot be safely anchored to
    *     the preceding separator without lookbehind (RE2 has none), and
    *     an unanchored pattern eats 'utm_' substrings inside OTHER
    *     params' names/values;
    *  6. strip trailing slashes from the PATH, before the kept query is
    *     re-attached — stripping the assembled string instead would eat
    *     a slash that ends the last query parameter's VALUE
    *     ('?p=/dir/' is not '?p=/dir'), conflating URLs that differ in
    *     a meaningful parameter.
    * Strings not shaped like a URL (no scheme://) pass through BYTE
    * UNCHANGED — the whole chain is gated on the shape, so dirty crawl
    * rows can't be mangled into false duplicates by the fragment/slash
    * steps. No lookarounds anywhere: DuckDB's RE2 has none, Java does —
    * the shared subset is the contract. */
  def canonicalUrl(u: Column): Column = {
    val isUrl = u.rlike("^[A-Za-z][A-Za-z0-9+.-]*://")
    val noFrag = regexp_replace(u, lit("#.*"), lit(""))
    val prefix = "^([^/]*//[^/?#]*)"
    val lowered = concat(
      lower(regexp_extract(noFrag, prefix, 1)),
      regexp_replace(noFrag, lit(prefix), lit("")))
    val noWww = regexp_replace(lowered,
      lit("^(https?://)www\\."), lit("$1"))
    val noPort = regexp_replace(
      regexp_replace(noWww,
        lit("^(http://[^/:?#]*):80([/?#].*)?$"), lit("$1$2")),
      lit("^(https://[^/:?#]*):443([/?#].*)?$"), lit("$1$2"))
    val base = regexp_replace(
      regexp_extract(noPort, "^([^?]*)", 1), lit("/+$"), lit(""))
    val query = regexp_extract(noPort, "\\?(.*)$", 1)
    val keptQuery = array_join(
      filter(split(query, "&"), p => !p.startsWith("utm_")), "&")
    val noUtm = concat(base,
      when(length(keptQuery) > 0, concat(lit("?"), keptQuery))
        .otherwise(lit("")))
    when(isUrl, noUtm).otherwise(u)
  }

  /** host of an (ideally canonicalized) URL — empty when not URL-shaped */
  def urlHost(u: Column): Column =
    regexp_extract(u, "^[^/]*//([^/:?#]+)", 1)

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
