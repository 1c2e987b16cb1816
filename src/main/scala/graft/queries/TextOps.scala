package graft.queries

import org.apache.spark.sql.functions._
import graft.io.Tables
import graft.functions.TextFunctions._

/** Text-analysis surface over the `documents` table: token statistics,
  * heuristic language ID, quality scoring, rolling-hash fingerprinting,
  * corpus n-gram profile. All single-pass, shuffle only where an
  * aggregation genuinely needs one — per-document metrics are pure
  * projections that scale embarrassingly at 100 TB.
  */
object TextOps {

  private val stopSql = EnglishStopwords.map(w => s"'$w'").mkString(", ")

  val qs: Seq[Q] = Seq(

    // ---- token statistics (pure projection, no shuffle) -----------------
    Q("t01_token_stats",
      (s, d) => Tables.documents(s, d)
        .withColumn("toks", tokens("text"))
        .select(col("doc_id"),
          tokenCount("toks").as("n_tokens"),
          distinctTokenCount("toks").as("n_distinct"),
          length(trim(col("text"))).cast("long").as("n_chars_trim"),
          (length(replace(trim(col("text")), lit(" "), lit("")))
            .cast("double") / tokenCount("toks")).as("avg_token_len")),
      Some("""
        SELECT doc_id,
          len(string_split_regex(trim(text), ' +')) AS n_tokens,
          len(list_distinct(string_split_regex(trim(text), ' +'))) AS n_distinct,
          CAST(LENGTH(trim(text)) AS BIGINT) AS n_chars_trim,
          CAST(LENGTH(REPLACE(trim(text), ' ', '')) AS DOUBLE)
            / len(string_split_regex(trim(text), ' +')) AS avg_token_len
        FROM documents""")),

    // ---- heuristic language ID (n-gram/marker-word scoring) -------------
    Q("t02_langid",
      (s, d) => Tables.documents(s, d)
        .withColumn("toks", tokens("text"))
        .withColumn("en_score", wordlistCount("toks", EnglishStopwords))
        .select(col("doc_id"), col("en_score"),
          (col("en_score").cast("double") / tokenCount("toks")).as("en_ratio"),
          when(col("en_score") > 0, lit("en")).otherwise(lit("und"))
            .as("predicted_lang")),
      Some(s"""
        WITH t AS (SELECT doc_id, string_split_regex(trim(text), ' +') toks FROM documents)
        SELECT doc_id,
          len(list_filter(toks, x -> x IN ($stopSql))) AS en_score,
          CAST(len(list_filter(toks, x -> x IN ($stopSql))) AS DOUBLE) / len(toks) AS en_ratio,
          CASE WHEN len(list_filter(toks, x -> x IN ($stopSql))) > 0
               THEN 'en' ELSE 'und' END AS predicted_lang
        FROM t""")),

    // ---- quality scoring -------------------------------------------------
    Q("t03_quality",
      (s, d) => Tables.documents(s, d)
        .withColumn("toks", tokens("text"))
        .withColumn("len_score",
          least(col("n_chars").cast("double") / 500.0, lit(1.0)))
        .withColumn("stop_ratio",
          wordlistCount("toks", EnglishStopwords).cast("double") / tokenCount("toks"))
        .withColumn("diversity",
          distinctTokenCount("toks").cast("double") / tokenCount("toks"))
        .select(col("doc_id"), col("len_score"), col("stop_ratio"), col("diversity"),
          (col("len_score") * 0.4 + col("stop_ratio") * 0.2 + col("diversity") * 0.4)
            .as("quality")),
      Some(s"""
        WITH t AS (SELECT doc_id, n_chars, string_split_regex(trim(text), ' +') toks FROM documents)
        SELECT doc_id,
          LEAST(CAST(n_chars AS DOUBLE) / 500.0, 1.0) AS len_score,
          CAST(len(list_filter(toks, x -> x IN ($stopSql))) AS DOUBLE) / len(toks) AS stop_ratio,
          CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) AS diversity,
          LEAST(CAST(n_chars AS DOUBLE) / 500.0, 1.0) * 0.4
            + CAST(len(list_filter(toks, x -> x IN ($stopSql))) AS DOUBLE) / len(toks) * 0.2
            + CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) * 0.4 AS quality
        FROM t""")),

    // ---- rolling-hash document fingerprint ------------------------------
    Q("t04_fingerprint",
      (s, d) => Tables.documents(s, d)
        .select(col("doc_id"), rollingHashFingerprint("text").as("fingerprint")),
      Some("""
        SELECT doc_id,
          list_reduce(
            list_prepend(CAST(0 AS BIGINT),
              list_transform(string_split(text, ''), c -> CAST(ascii(c) AS BIGINT))),
            (acc, c) -> (acc * 31 + c) % 1000000007) AS fingerprint
        FROM documents""")),

    // ---- corpus-level n-gram profile (top-20 bigrams) -------------------
    Q("t05_ngram_profile",
      (s, d) => Tables.documents(s, d)
        .withColumn("toks", tokens("text"))
        .select(explode(wordNgrams("toks", 2)).as("gram"))
        .groupBy("gram").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("gram").asc)
        .limit(20),
      Some("""
        WITH t AS (SELECT string_split_regex(trim(text), ' +') toks FROM documents),
        g AS (SELECT g.gram FROM t,
              unnest(list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1])) g(gram))
        SELECT gram, COUNT(*) AS n FROM g GROUP BY gram
        ORDER BY n DESC, gram ASC LIMIT 20""")),

    // ---- BPE-ish subword token counting ---------------------------------
    //      letter runs, single digits, and punctuation as separate tokens
    //      (the pre-tokenization shape BPE vocabularies are trained over);
    //      alternation branches are first-char-disjoint so Java regex and
    //      RE2 agree on every match
    Q("t06_bpe_tokens",
      (s, d) => Tables.documents(s, d).select(
        col("doc_id"),
        size(split(trim(col("text")), " +")).cast("long").as("ws_tokens"),
        size(regexp_extract_all(col("text"),
          lit("[A-Za-z]+|[0-9]|[^A-Za-z0-9 ]"), lit(0)))
          .cast("long").as("subword_tokens")),
      Some("""
        SELECT doc_id,
          len(string_split_regex(trim(text), ' +')) AS ws_tokens,
          len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9 ]'))
            AS subword_tokens
        FROM documents""")),

    // ---- corpus metadata statistics (per labeled lang x source) ---------
    Q("t07_corpus_stats",
      (s, d) => Tables.documents(s, d)
        .groupBy("lang", "source")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("sum_chars"),
          (sum(col("n_chars")).cast("double") / count(lit(1))).as("avg_chars"),
          min(col("doc_id")).as("first_doc")),
      Some("""
        SELECT lang, source, COUNT(*) AS n_docs,
          CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
          CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) AS avg_chars,
          MIN(doc_id) AS first_doc
        FROM documents GROUP BY lang, source""")),

    // ---- language-ID confusion matrix vs the labeled lang column -------
    Q("t08_langid_accuracy",
      (s, d) => Tables.documents(s, d)
        .withColumn("toks", tokens("text"))
        .withColumn("predicted",
          when(wordlistCount("toks", EnglishStopwords) > 0, lit("en"))
            .otherwise(lit("und")))
        .groupBy(col("lang"), col("predicted"))
        .agg(count(lit(1)).as("n")),
      Some(s"""
        SELECT lang,
          CASE WHEN len(list_filter(string_split_regex(trim(text), ' +'),
                 x -> x IN ($stopSql))) > 0
               THEN 'en' ELSE 'und' END AS predicted,
          COUNT(*) AS n
        FROM documents GROUP BY 1, 2""")),

    // ---- capstone: the composed training-data-prep pipeline -------------
    //      quality gate -> exact-dedup survivors -> per-lang token budget;
    //      each stage is an operator verified on its own above, composed
    //      here into the end-to-end curation query a data pipeline runs
    Q("t09_curation_pipeline",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val scored = docs
          .withColumn("toks", tokens("text"))
          .withColumn("quality",
            least(col("n_chars").cast("double") / 500.0, lit(1.0)) * 0.4 +
              (wordlistCount("toks", EnglishStopwords).cast("double") /
                tokenCount("toks")) * 0.2 +
              (distinctTokenCount("toks").cast("double") / tokenCount("toks")) * 0.4)
          .filter(col("quality") >= 0.5)
        // survivor selection inline (window over the gated frame) — a
        // join back to exactDedupRanks(scored) would scan and re-score
        // the corpus twice and add a shuffle for the same result
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(md5(col("text").cast("binary"))).orderBy(col("doc_id"))
        scored.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
          .groupBy("lang")
          .agg(count(lit(1)).as("n_docs"),
            sum(tokenCount("toks")).as("total_tokens"),
            sum(col("n_chars")).as("total_chars"))
      },
      Some(s"""
        WITH scored AS (
          SELECT doc_id, lang, n_chars, text,
            string_split_regex(trim(text), ' +') AS toks,
            LEAST(CAST(n_chars AS DOUBLE) / 500.0, 1.0) * 0.4
              + CAST(len(list_filter(string_split_regex(trim(text), ' +'),
                  x -> x IN ($stopSql))) AS DOUBLE)
                / len(string_split_regex(trim(text), ' +')) * 0.2
              + CAST(len(list_distinct(string_split_regex(trim(text), ' +')))
                  AS DOUBLE)
                / len(string_split_regex(trim(text), ' +')) * 0.4 AS quality
          FROM documents),
        gated AS (SELECT * FROM scored WHERE quality >= 0.5),
        canonical AS (
          SELECT doc_id FROM (
            SELECT doc_id, ROW_NUMBER() OVER
              (PARTITION BY md5(text) ORDER BY doc_id) AS rn FROM gated)
          WHERE rn = 1)
        SELECT lang, COUNT(*) AS n_docs,
          CAST(SUM(len(toks)) AS BIGINT) AS total_tokens,
          CAST(SUM(n_chars) AS BIGINT) AS total_chars
        FROM gated JOIN canonical USING (doc_id)
        GROUP BY lang"""))
  )
}
