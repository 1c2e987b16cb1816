package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HTML -> clean-text boilerplate extraction — the entry point of every
  * real pretraining corpus (crawled HTML in, prose out), shaped after
  * the jusText / trafilatura family of block-level heuristics
  * (Pomikálek, "Removing Boilerplate and Duplicate Content from Web
  * Corpora", 2011): segment the page into blocks at block-level tags,
  * then keep a block iff it looks like prose — low link density, and
  * either stopword-dense or long — and drop navigation, headers,
  * footers and link farms.
  *
  * Everything is stock Catalyst regexp/HOF expressions (no UDF), so the
  * whole pass is row-local inside whole-stage codegen: at 100 TB this
  * is a pure map over the corpus — zero shuffles until whatever
  * aggregation the CALLER puts downstream (here one groupBy doc_id to
  * reassemble kept blocks, which co-partitions with the raw pages and
  * combines map-side). Every density is integer permille arithmetic
  * (no floats), so the keep/drop decisions replay bit-exactly in the
  * DuckDB oracle (t29 gate).
  *
  * The reference has no crawl surface to cite — this extends SURVEY §7
  * per BASELINE.json's training-data north star.
  */
object HtmlOps {

  /** block-level tags that terminate a text block (HTML5 flow content
    * that implies a visual break; non-capturing group so split() is
    * group-agnostic on both regex engines) */
  private val BlockTags =
    "p|div|li|ul|ol|h1|h2|h3|h4|h5|h6|br|table|tr|td|th|section|article|" +
      "header|footer|nav|blockquote|aside|main|form"
  private[graft] val BlockSplitRe = s"(?i)</?(?:$BlockTags)[^>]*>"

  /** script/style/comment stripping — non-greedy, dot-matches-newline;
    * two passes instead of a backreferenced `</(script|style)>` because
    * RE2 (the oracle's engine) has no backreferences */
  private def stripNonContent(html: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(html, "(?is)<script[^>]*>.*?</script>", " "),
        "(?is)<style[^>]*>.*?</style>", " "),
      "(?s)<!--.*?-->", " ")

  /** Per-block segmentation + keep/drop decision. Output: one row per
    * NON-EMPTY block (tag-stripped, trimmed) with
    * (doc_id, pos, txt, link_chars, n_toks, n_stop, keep).
    *
    * keep = link_chars*1000 <= chars*maxLinkPermille  (not a link farm)
    *        AND n_toks > 0
    *        AND (n_stop*1000 >= n_toks*minStopPermille  (prose-like)
    *             OR chars >= minLongChars)              (jusText "near-good":
    *                                                     long low-link blocks
    *                                                     survive even when
    *                                                     stopword-sparse)
    */
  def blockDecisions(docs: DataFrame, htmlCol: String,
                     maxLinkPermille: Int, minStopPermille: Int,
                     minLongChars: Int,
                     stopwords: Seq[String]): DataFrame = {
    require(stopwords.nonEmpty && stopwords.forall(_.matches("[a-z]+")),
      "stopwords must be non-empty lowercase ascii words (SQL-literal safe)")
    val stopLst = stopwords.map(w => s"'$w'").mkString(", ")
    docs
      .select(col("doc_id"), stripNonContent(col(htmlCol)).as("h"))
      .select(col("doc_id"),
        posexplode(split(col("h"), BlockSplitRe)).as(Seq("pos", "block")))
      .withColumn("txt",
        trim(regexp_replace(col("block"), "(?s)<[^>]*>", "")))
      .filter(length(col("txt")) > 0)
      .withColumn("link_chars", expr(
        """aggregate(
          |  regexp_extract_all(block, '(?is)<a[^>]*>(.*?)</a>', 1),
          |  0L, (acc, x) -> acc + length(x))""".stripMargin))
      .withColumn("toks", expr("regexp_extract_all(txt, '[A-Za-z0-9]+', 0)"))
      .withColumn("n_toks", size(col("toks")).cast("long"))
      .withColumn("n_stop",
        expr(s"CAST(size(filter(toks, x -> x IN ($stopLst))) AS BIGINT)"))
      .withColumn("keep",
        col("link_chars") * 1000 <= length(col("txt")) * maxLinkPermille &&
          col("n_toks") > 0 &&
          (col("n_stop") * 1000 >= col("n_toks") * minStopPermille ||
            length(col("txt")) >= minLongChars))
      .drop("block", "toks")
  }

  /** Clean text per document: kept blocks rejoined in page order with
    * '\n', plus the kept/dropped audit counts. Every input doc_id
    * appears in the output — a page that is ALL boilerplate comes back
    * with clean_text = '' and n_blocks_kept = 0, it does not silently
    * vanish (the downstream curation filter decides what to do with
    * empties; losing rows here would corrupt corpus accounting).
    * Output: (doc_id, clean_text, n_blocks_kept, n_blocks_dropped). */
  def extractText(docs: DataFrame, htmlCol: String = "html",
                  maxLinkPermille: Int = 200,
                  minStopPermille: Int = 150,
                  minLongChars: Int = 100,
                  stopwords: Seq[String] =
                    graft.functions.TextFunctions.EnglishStopwords)
      : DataFrame = {
    val blocks = blockDecisions(docs, htmlCol, maxLinkPermille,
      minStopPermille, minLongChars, stopwords)
    val aggd = blocks.groupBy("doc_id").agg(
      // collect_list skips nulls, so only kept blocks enter; array_sort
      // on the (pos, txt) struct restores page order regardless of
      // shuffle arrival order
      array_join(
        transform(
          array_sort(collect_list(when(col("keep"),
            struct(col("pos"), col("txt"))))),
          x => x.getField("txt")),
        "\n").as("clean_text"),
      sum(when(col("keep"), 1L).otherwise(0L)).as("n_blocks_kept"),
      sum(when(col("keep"), 0L).otherwise(1L)).as("n_blocks_dropped"))
    docs.select(col("doc_id"))
      .join(aggd, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("clean_text"), lit("")).as("clean_text"),
        coalesce(col("n_blocks_kept"), lit(0L)).as("n_blocks_kept"),
        coalesce(col("n_blocks_dropped"), lit(0L)).as("n_blocks_dropped"))
  }
}
