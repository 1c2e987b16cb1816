package graft

/** Pins the properties the two data-selection operators exist to
  * deliver: t35 (DSIR, Xie et al. 2023) must ENRICH the selected subset
  * in the target distribution (lang = 'en') relative to the raw corpus
  * even though Gumbel noise keeps the tail diverse, and t36's trained
  * linear probe must actually DISCRIMINATE the target (AUC well above
  * chance) — the measured guard against the silent failure mode where
  * uncentered labels or unnormalized features make the probe learn
  * "document length" instead (AUC 0.49 before the fix).
  */
class DsirSpec extends SparkSpec {

  test("t35 selection is enriched in the target language") {
    val docs = spark.read.parquet(s"$sfTiny/documents.parquet")
    val baseEn = docs.filter("lang = 'en'").count().toDouble / docs.count()
    val sel = SparkEntry.queries("t35_dsir_select")(spark, sfTiny).collect()
    assert(sel.length == 100)
    val selEn = sel.count(_.getAs[String]("lang") == "en").toDouble / sel.length
    assert(selEn > baseEn * 1.2,
      s"selection not target-enriched: base en=$baseEn, selected en=$selEn")
    // every selected row's key is its weight plus noise — the noise must
    // not drown the signal entirely: mean logw of selected > corpus mean 0
    // is implied by enrichment; also all 5 langs may appear (soft sampling,
    // not a filter) but 'en' must be the plurality
    val plurality = sel.groupBy(_.getAs[String]("lang"))
      .view.mapValues(_.length).maxBy(_._2)._1
    assert(plurality == "en", s"plurality lang was $plurality")
  }

  test("t36 probe scores separate the target language (AUC > 0.6)") {
    val out = SparkEntry.queries("t36_quality_probe")(spark, sfTiny).collect()
    val (en, rest) = out.partition(_.getAs[String]("lang") == "en")
    val enS = en.map(_.getAs[Long]("score_q"))
    val restS = rest.map(_.getAs[Long]("score_q"))
    val wins = (for (a <- enS; b <- restS) yield if (a > b) 1.0 else 0.0).sum
    val auc = wins / (enS.length.toDouble * restS.length)
    assert(auc > 0.6, f"probe failed to learn: AUC $auc%.3f (0.653 expected)")
  }

  test("t37 flags exactly injected + natural contamination, nothing else") {
    // ground truth recomputed independently in plain Scala: the flagged
    // set must be the injected docs (doc_id % 7 == 0 gets the benchmark
    // snippet) UNION docs sharing a 13-gram with src19 naturally (the
    // sf0.001 fixture has two — near-dups that cross the source split,
    // i.e. exactly what the scan exists to catch). Any other extra flag
    // would be a bloom false positive leaking past the exact join.
    val raw = spark.read.parquet(s"$sfTiny/documents.parquet")
      .select("doc_id", "text", "source").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    def grams(t: String): Set[String] = {
      val toks = t.trim.split(" +")
      (0 to toks.length - 13).map(i =>
        toks.slice(i, i + 13).mkString(" ")).toSet
    }
    val testGrams = raw.filter(_._3 == "src19").map(t => grams(t._2))
      .fold(Set.empty)(_ ++ _)
    val natural = raw.filter(_._3 != "src19")
      .filter(t => (grams(t._2) & testGrams).nonEmpty).map(_._1).toSet
    val out = SparkEntry.queries("t37_contamination_scan")(spark, sfTiny)
      .collect()
    val flagged = out.filter(_.getAs[Boolean]("is_contaminated"))
      .map(_.getAs[Long]("doc_id")).toSet
    val injected = out.map(_.getAs[Long]("doc_id")).filter(_ % 7 == 0).toSet
    assert(natural.nonEmpty, "fixture should have natural cross-source dups")
    val expected = injected ++ natural
    assert(flagged == expected,
      s"extra: ${flagged -- expected}, missing: ${expected -- flagged}")
    assert(out.forall(r =>
      r.getAs[Long]("n_dirty_grams") <= r.getAs[Long]("n_grams")))
  }
}
