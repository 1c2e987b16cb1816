package graft.queries

import org.apache.spark.sql.functions._
import graft.io.Tables
import graft.operators.DedupOps

/** Deduplication surface over `documents`: exact content-hash dedup plus
  * three near-dup families (exact n-gram Jaccard, MinHash+LSH, SimHash).
  *
  * Oracle strategy: the DuckDB side computes ground-truth pairwise
  * 3-gram Jaccard with list operations. d02 (exact all-pairs) matches it
  * by construction. d03/d04 are approximate candidate generators whose
  * candidates are exact-verified (precision is exact); their band
  * configurations are chosen so the probability of missing a true pair
  * at the 0.6 threshold is negligible (MinHash r=2/b=64: (1-J²)^64,
  * ~4e-13 at J=0.6; SimHash: planted near-dups at J≈0.98 differ by a
  * handful of tokens ⇒ hamming far below the 7-of-8-bands guarantee), so
  * all three hash-match the same ground truth — which is exactly the
  * claim an approximate dedup ships with.
  */
object Dedup {

  private val jaccardCte = """
    WITH t AS (SELECT doc_id, string_split_regex(trim(text), ' +') toks
               FROM documents),
    g AS (SELECT doc_id,
            list_distinct(list_transform(range(1, len(toks) - 1),
              i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) grams
          FROM t),
    p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
            len(list_intersect(a.grams, b.grams)) AS common,
            len(a.grams) AS sa, len(b.grams) AS sb
          FROM g a JOIN g b ON a.doc_id < b.doc_id)
  """

  private val jaccardSelect = """
    SELECT doc_a, doc_b,
      CAST(common AS DOUBLE) / (sa + sb - common) AS jaccard
    FROM p WHERE CAST(common AS DOUBLE) / (sa + sb - common) >= 0.6
  """

  val qs: Seq[Q] = Seq(

    // ---- exact dedup: content-hash ranking ------------------------------
    Q("d01_exact_dedup",
      (s, d) => DedupOps.exactDedupRanks(Tables.documents(s, d)),
      Some("""
        SELECT doc_id, md5(text) AS content_hash,
          CAST(ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id)
            AS BIGINT) AS dup_rank,
          ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) = 1
            AS is_canonical
        FROM documents""")),

    // ---- exact pairwise 3-gram Jaccard (the ground-truth verifier) ------
    Q("d02_ngram_jaccard",
      (s, d) => DedupOps.ngramJaccardPairs(Tables.documents(s, d), 3, 0.6),
      Some(jaccardCte + jaccardSelect)),

    // ---- MinHash + LSH banding, exact-verified --------------------------
    Q("d03_minhash_lsh",
      (s, d) => DedupOps.minHashNearDups(Tables.documents(s, d),
        n = 3, k = 128, bands = 64, minJaccard = 0.6),
      Some(jaccardCte + jaccardSelect)),

    // ---- SimHash banding, exact-verified --------------------------------
    // multi-index config: 16 blocks, block-pair keys -> guaranteed recall
    // to hamming 14. The corpus' docs are short (8-31 distinct tokens) so
    // J≈0.98 pairs differ by up to 12 bits (measured at sf0.01/sf0.1) —
    // a wide radius that single-slice banding cannot index efficiently.
    Q("d04_simhash",
      (s, d) => DedupOps.simHashNearDups(Tables.documents(s, d),
        maxHamming = 14, n = 3, minJaccard = 0.6),
      Some(jaccardCte + jaccardSelect)),

    // ---- edit-distance verification on near-dup pairs -------------------
    //      (candidate generation by Jaccard, fuzzy-match scoring by
    //      levenshtein — the "how different are they textually" stage a
    //      dedup pipeline runs before choosing survivors)
    Q("d05_edit_distance",
      (s, d) => {
        val docs = Tables.documents(s, d)
        DedupOps.ngramJaccardPairs(docs, 3, 0.6).select("doc_a", "doc_b")
          .join(docs.select(col("doc_id").as("doc_a"), col("text").as("ta")), "doc_a")
          .join(docs.select(col("doc_id").as("doc_b"), col("text").as("tb")), "doc_b")
          .select(col("doc_a"), col("doc_b"),
            levenshtein(col("ta"), col("tb")).cast("long").as("edit_dist"))
      },
      Some(jaccardCte + """
        SELECT doc_a, doc_b,
          CAST(levenshtein(da.text, db.text) AS BIGINT) AS edit_dist
        FROM p JOIN documents da ON p.doc_a = da.doc_id
               JOIN documents db ON p.doc_b = db.doc_id
        WHERE CAST(common AS DOUBLE) / (sa + sb - common) >= 0.6""")),

    // ---- deterministic stratified sampling (training-mix construction) --
    //      exact 20% quota per lang: rows ranked per stratum by a content-
    //      independent hash (md5 of the id — reproducible on any engine,
    //      uncorrelated with ingestion order), cut at ceil(0.2 * n).
    //      One keyed shuffle for the rank; the quota side is a broadcast.
    //      This is the exact-quota variant of q34's Bernoulli hash-sample:
    //      sampleBy() gives probabilistic strata sizes, this gives exact.
    Q("d06_stratified_sample",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val docs = Tables.documents(s, d)
        val counts = docs.groupBy("lang").agg(count(lit(1)).as("n_lang"))
        val w = Window.partitionBy(col("lang"))
          .orderBy(col("skey").asc, col("doc_id").asc)
        docs.select(col("doc_id"), col("lang"),
            md5(col("doc_id").cast("string").cast("binary")).as("skey"))
          .withColumn("rn", row_number().over(w).cast("long"))
          .join(broadcast(counts), "lang")
          .filter(col("rn") <= ceil(col("n_lang") * 0.2))
          .select(col("lang"), col("doc_id"), col("rn"))
      },
      Some("""
        WITH c AS (SELECT lang, COUNT(*) AS n_lang FROM documents GROUP BY 1),
        r AS (SELECT doc_id, lang,
                ROW_NUMBER() OVER (PARTITION BY lang
                  ORDER BY md5(CAST(doc_id AS VARCHAR)) ASC, doc_id ASC) AS rn
              FROM documents)
        SELECT r.lang, r.doc_id, CAST(r.rn AS BIGINT) AS rn
        FROM r JOIN c USING (lang) WHERE rn <= CEIL(n_lang * 0.2)""")),

    // ---- mixture resampling (domain reweighting) ------------------------
    //      the training-mix construction step that FOLLOWS dedup: given a
    //      target weight per source and a global document budget (half
    //      the corpus), downsample each source at
    //      rate = min(1, share * budget / n_avail) — feasibility-capped,
    //      so an under-represented source is kept whole instead of
    //      upsampled. Membership is the q34 portable hash cut (md5 of the
    //      doc id against a per-source 24-bit threshold prefix), so the
    //      kept SET — not just the counts — is a pure function of the
    //      data, reproducible on any engine. Target weights derive from
    //      the source id ((idx % 4) + 1) so both engines compute the
    //      identical config without a side channel. Scale shape: one
    //      small keyed shuffle for per-source counts, the rate table is
    //      a broadcast, the filter is a codegen'd scan (no shuffle of the
    //      corpus), one final small keyed aggregate.
    Q("d09_mixture_resample",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val counts = docs.groupBy("source")
          .agg(count(lit(1)).as("n_avail"))
          .withColumn("weight",
            substring(col("source"), 4, 10).cast("long") % 4 + 1)
        val totals = counts.agg(
          sum(col("n_avail")).as("n_total"), sum(col("weight")).as("w_total"))
        val rates = counts.crossJoin(broadcast(totals))
          .withColumn("budget", floor(col("n_total").cast("double") * 0.5))
          .withColumn("rate", least(lit(1.0),
            col("weight").cast("double") / col("w_total") * col("budget")
              / col("n_avail")))
          .withColumn("cut", concat(
            lpad(lower(hex(floor(col("rate") * 16777216L))), 6, "0"),
            lit("0" * 26)))
          .select(col("source"), col("weight"), col("n_avail"),
            col("rate"), col("cut"))
        docs.join(broadcast(rates), "source")
          .filter(col("rate") >= 1.0 ||
            md5(col("doc_id").cast("string").cast("binary")) < col("cut"))
          .groupBy(col("source"), col("weight"), col("n_avail"))
          .agg(count(lit(1)).as("n_kept"))
      },
      Some("""
        WITH c AS (
          SELECT source, COUNT(*) AS n_avail,
            (CAST(substr(source, 4) AS BIGINT) % 4) + 1 AS weight
          FROM documents GROUP BY 1),
        t AS (SELECT CAST(SUM(n_avail) AS BIGINT) AS n_total,
                     CAST(SUM(weight) AS BIGINT) AS w_total FROM c),
        r AS (
          SELECT source, weight, n_avail,
            LEAST(CAST(1.0 AS DOUBLE),
              CAST(weight AS DOUBLE) / w_total
                * FLOOR(CAST(n_total AS DOUBLE) * 0.5) / n_avail) AS rate
          FROM c, t),
        cuts AS (
          SELECT source, weight, n_avail, rate,
            lpad(lower(to_hex(CAST(FLOOR(rate * 16777216) AS BIGINT))),
                 6, '0') || repeat('0', 26) AS cut
          FROM r)
        SELECT cu.source, CAST(cu.weight AS BIGINT) AS weight,
          CAST(cu.n_avail AS BIGINT) AS n_avail,
          CAST(COUNT(*) AS BIGINT) AS n_kept
        FROM documents d JOIN cuts cu ON d.source = cu.source
        WHERE cu.rate >= 1.0 OR md5(CAST(d.doc_id AS VARCHAR)) < cu.cut
        GROUP BY 1, 2, 3""")),

    // ---- entity resolution: blocked fuzzy match + verify ----------------
    //      record linkage between the customer table and a deterministic
    //      "dirty" copy (one character substituted mid-name): candidate
    //      pairs come only from BLOCKS (nation x last-3-chars of the
    //      name) — the linear-candidate discipline every dedup family
    //      here follows — then levenshtein-verified, best match by
    //      (distance, custkey) total order. Reported per nation with the
    //      candidate count (blocking efficiency) and how many best
    //      matches recovered the true source record.
    Q("d14_entity_resolution",
      (s, d) => {
        val clean = Tables.customer(s, d)
          .select(col("c_custkey"), col("c_name"), col("c_nationkey"),
            expr("right(c_name, 3)").as("blk"))
        val dirty = Tables.customer(s, d)
          .select(col("c_custkey").as("src_key"),
            expr("concat(substr(c_name, 1, 9), 'X', substr(c_name, 11))")
              .as("d_name"),
            col("c_nationkey").as("d_nation"),
            expr("right(c_name, 3)").as("blk"))
        val cands = dirty.join(clean,
          col("d_nation") === col("c_nationkey") && dirty("blk") === clean("blk"))
          .select(col("src_key"), col("d_nation"), col("c_custkey"),
            levenshtein(col("d_name"), col("c_name")).as("lev"))
        cands
          .groupBy(col("src_key"), col("d_nation"))
          .agg(count(lit(1)).as("n_cands"),
            min(struct(col("lev"), col("c_custkey"))).as("best"))
          .groupBy(col("d_nation").as("nation"))
          .agg(count(lit(1)).as("n_dirty"),
            sum(col("n_cands")).as("n_candidate_pairs"),
            sum((col("best.c_custkey") === col("src_key")).cast("long"))
              .as("n_correct"))
      },
      Some("""
        WITH clean AS (
          SELECT c_custkey, c_name, c_nationkey, right(c_name, 3) AS blk
          FROM customer),
        dirty AS (
          SELECT c_custkey AS src_key,
            concat(substr(c_name, 1, 9), 'X', substr(c_name, 11)) AS d_name,
            c_nationkey AS d_nation, right(c_name, 3) AS blk
          FROM customer),
        cands AS (
          SELECT d.src_key, d.d_nation, c.c_custkey,
            levenshtein(d.d_name, c.c_name) AS lev
          FROM dirty d JOIN clean c
            ON d.d_nation = c.c_nationkey AND d.blk = c.blk),
        best AS (
          SELECT src_key, d_nation, n_cands, c_custkey FROM (
            SELECT src_key, d_nation, c_custkey,
              COUNT(*) OVER (PARTITION BY src_key) AS n_cands,
              ROW_NUMBER() OVER (PARTITION BY src_key
                ORDER BY lev ASC, c_custkey ASC) AS rn
            FROM cands) WHERE rn = 1)
        SELECT d_nation AS nation, COUNT(*) AS n_dirty,
          CAST(SUM(n_cands) AS BIGINT) AS n_candidate_pairs,
          CAST(SUM(CASE WHEN c_custkey = src_key THEN 1 ELSE 0 END)
            AS BIGINT) AS n_correct
        FROM best GROUP BY 1""")),

    // ---- incremental dedup: new batch vs existing corpus ----------------
    //      the production shape — dedup never reruns over the whole
    //      corpus; each arriving batch anti-joins its content hashes
    //      against the corpus fingerprint table, then dedups within
    //      itself (min doc_id per hash). Here the corpus/batch split is
    //      doc_id % 5 (deterministic fixture stand-in for an ingestion-
    //      date partition). Scale shape: the fingerprint side projects
    //      to ONE hash column before the anti-join — the corpus text is
    //      never read twice — and the join is hash-keyed, broadcastable
    //      when the batch is small.
    Q("d13_incremental_dedup",
      (s, d) => {
        val docs = Tables.documents(s, d)
          .withColumn("h", DedupOps.contentHash(col("text")))
        val corpus = docs.filter(col("doc_id") % 5 < 4)
        val batch = docs.filter(col("doc_id") % 5 === 4)
        batch
          .join(corpus.select("h").distinct(), Seq("h"), "left_anti")
          .groupBy(col("h"))
          .agg(min(col("doc_id")).as("doc_id"),
            count(lit(1)).as("n_batch_copies"))
      },
      Some("""
        WITH d AS (SELECT doc_id, md5(text) AS h FROM documents),
        corpus AS (SELECT DISTINCT h FROM d WHERE doc_id % 5 < 4),
        batch AS (SELECT * FROM d WHERE doc_id % 5 = 4)
        SELECT b.h, MIN(b.doc_id) AS doc_id,
          CAST(COUNT(*) AS BIGINT) AS n_batch_copies
        FROM batch b ANTI JOIN corpus c ON b.h = c.h
        GROUP BY b.h""")),

    // ---- directed containment: the asymmetric dup criterion -------------
    //      a short doc living inside a long one scores low Jaccard
    //      (union is dominated by the long side) but high containment;
    //      RefinedWeb-style curation filters on both. Threshold 0.8 as
    //      an integer cross-multiply, ratio as integer parts-per-1e9 —
    //      the filter and the output are float-free.
    Q("d12_containment",
      (s, d) => DedupOps.containmentPairs(
        Tables.documents(s, d), n = 3, num = 4, den = 5),
      Some(jaccardCte + """
        SELECT doc_a AS contained_doc, doc_b AS container_doc,
          CAST(common * 1000000000 // sa AS BIGINT) AS c_e9
        FROM p WHERE common * 5 >= sa * 4
        UNION ALL
        SELECT doc_b, doc_a, CAST(common * 1000000000 // sb AS BIGINT)
        FROM p WHERE common * 5 >= sb * 4""")),

    // ---- epoch upsampling: the OVER-sampling regime d09 caps ------------
    //      when a source's target share exceeds its size, training mixes
    //      repeat it: rate 2.4 means every doc appears in 2 full epochs
    //      and a deterministic 40% hash-cut slice appears in a 3rd.
    //      Implementation is row-local after the broadcast rate join —
    //      explode(sequence(1, n_copies)) fans each doc out to its epoch
    //      copies with NO shuffle of the corpus (n_copies >= 1 filter
    //      first: Spark's sequence(1, 0) counts DOWN, it is not empty).
    //      Budget 1.5x the corpus so the fixture exercises rates on both
    //      sides of 1. Oracle replays the emitted (source, epoch) counts
    //      from per-source arithmetic + generate_series — an independent
    //      derivation, not a mirrored explode.
    Q("d11_epoch_upsample",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val counts = docs.groupBy("source")
          .agg(count(lit(1)).as("n_avail"))
          .withColumn("weight",
            substring(col("source"), 4, 10).cast("long") % 4 + 1)
        val totals = counts.agg(
          sum(col("n_avail")).as("n_total"), sum(col("weight")).as("w_total"))
        val rates = counts.crossJoin(broadcast(totals))
          .withColumn("rate",
            col("weight").cast("double") / col("w_total")
              * floor(col("n_total").cast("double") * 1.5)
              / col("n_avail"))
          .withColumn("copies", floor(col("rate")))
          .withColumn("cut", concat(
            lpad(lower(hex(floor((col("rate") - floor(col("rate")))
              * 16777216L))), 6, "0"),
            lit("0" * 26)))
          .select(col("source"), col("copies"), col("cut"))
        docs.join(broadcast(rates), "source")
          .withColumn("n_copies", col("copies") +
            when(md5(col("doc_id").cast("string").cast("binary"))
              < col("cut"), 1L).otherwise(0L))
          .filter(col("n_copies") >= 1)
          .select(col("source"),
            explode(sequence(lit(1L), col("n_copies"))).as("epoch"))
          .groupBy(col("source"), col("epoch"))
          .agg(count(lit(1)).as("n_docs"))
      },
      Some("""
        WITH c AS (
          SELECT source, COUNT(*) AS n_avail,
            (CAST(substr(source, 4) AS BIGINT) % 4) + 1 AS weight
          FROM documents GROUP BY 1),
        t AS (SELECT CAST(SUM(n_avail) AS BIGINT) AS n_total,
                     CAST(SUM(weight) AS BIGINT) AS w_total FROM c),
        r AS (
          SELECT source, n_avail,
            CAST(weight AS DOUBLE) / w_total
              * FLOOR(CAST(n_total AS DOUBLE) * 1.5) / n_avail AS rate
          FROM c, t),
        cuts AS (
          SELECT source, n_avail, CAST(FLOOR(rate) AS BIGINT) AS copies,
            lpad(lower(to_hex(CAST(FLOOR((rate - FLOOR(rate)) * 16777216)
              AS BIGINT))), 6, '0') || repeat('0', 26) AS cut
          FROM r),
        k AS (
          SELECT d.source, COUNT(*) AS n_frac
          FROM documents d JOIN cuts USING (source)
          WHERE md5(CAST(d.doc_id AS VARCHAR)) < cut GROUP BY 1)
        SELECT source, CAST(epoch AS BIGINT) AS epoch,
          CAST(n_docs AS BIGINT) AS n_docs
        FROM (
          SELECT source, unnest(generate_series(1, copies)) AS epoch,
            n_avail AS n_docs
          FROM cuts
          UNION ALL
          SELECT cu.source, cu.copies + 1 AS epoch, k.n_frac AS n_docs
          FROM cuts cu JOIN k ON cu.source = k.source)""")),

    // ---- survivor selection: the dedup DECISION -------------------------
    //      the step that turns d07's clusters into a keep/drop list: per
    //      near-dup cluster keep the longest document (doc_id breaks
    //      ties, so the choice is total-ordered and deterministic), drop
    //      the rest. One max_by aggregate over the cluster labels joined
    //      with the doc lengths — no window, no sort; reported per
    //      cluster with the byte savings the drop realizes. Oracle
    //      recomputes the closure recursively and picks survivors with a
    //      rank-1 filter over the identical (n_chars, doc_id) order.
    Q("d10_survivor_selection",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val clusters = DedupOps.nearDupClusters(
          DedupOps.ngramJaccardPairs(docs, 3, 0.6).select("doc_a", "doc_b"))
        clusters.join(docs.select(col("doc_id"), col("n_chars")), "doc_id")
          .groupBy(col("cluster_id"))
          .agg(
            max_by(col("doc_id"), struct(col("n_chars"), col("doc_id")))
              .as("survivor_id"),
            count(lit(1)).as("cluster_size"),
            (sum(col("n_chars")) -
              max(struct(col("n_chars"), col("doc_id")))
                .getField("n_chars")).cast("long").as("chars_removed"))
      },
      Some(jaccardCte.replaceFirst("WITH ", "WITH RECURSIVE ") + """
        , pr AS (SELECT doc_a, doc_b FROM p
                 WHERE CAST(common AS DOUBLE) / (sa + sb - common) >= 0.6),
        e AS (SELECT doc_a AS s, doc_b AS t FROM pr
              UNION ALL SELECT doc_b, doc_a FROM pr),
        reach AS (
          SELECT s, t FROM e
          UNION
          SELECT r.s, e.t FROM reach r JOIN e ON r.t = e.s),
        lab AS (SELECT s AS doc_id, LEAST(s, MIN(t)) AS cluster_id
                FROM reach GROUP BY s),
        ranked AS (
          SELECT cluster_id, doc_id, n_chars,
            ROW_NUMBER() OVER (PARTITION BY cluster_id
              ORDER BY n_chars DESC, doc_id DESC) AS rn
          FROM lab JOIN documents USING (doc_id))
        SELECT cluster_id,
          MAX(CASE WHEN rn = 1 THEN doc_id END) AS survivor_id,
          CAST(COUNT(*) AS BIGINT) AS cluster_size,
          CAST(SUM(CASE WHEN rn > 1 THEN n_chars ELSE 0 END) AS BIGINT)
            AS chars_removed
        FROM ranked GROUP BY 1""")),

    // ---- near-dup clustering: transitive closure of the pair list -------
    //      (the survivor-selection input: one cluster per connected
    //      component, labeled by its minimum doc_id). Oracle recomputes
    //      the closure with a recursive CTE over the same ground-truth
    //      pair list.
    Q("d07_neardup_clusters",
      (s, d) => DedupOps.nearDupClusters(
        DedupOps.ngramJaccardPairs(Tables.documents(s, d), 3, 0.6)
          .select("doc_a", "doc_b")),
      Some(jaccardCte.replaceFirst("WITH ", "WITH RECURSIVE ") + """
        , pr AS (SELECT doc_a, doc_b FROM p
                 WHERE CAST(common AS DOUBLE) / (sa + sb - common) >= 0.6),
        e AS (SELECT doc_a AS s, doc_b AS t FROM pr
              UNION ALL SELECT doc_b, doc_a FROM pr),
        reach AS (
          SELECT s, t FROM e
          UNION
          SELECT r.s, e.t FROM reach r JOIN e ON r.t = e.s)
        SELECT s AS doc_id, LEAST(s, MIN(t)) AS cluster_id
        FROM reach GROUP BY s""")),

    // ---- dedup outcome report: cluster-size histogram + removal count --
    //      the number a curation run actually publishes: how many near-
    //      dup clusters of each size, and how many docs survive (one
    //      canonical per cluster — everything else is removed)
    Q("d08_cluster_stats",
      (s, d) => {
        val clusters = DedupOps.nearDupClusters(
          DedupOps.ngramJaccardPairs(Tables.documents(s, d), 3, 0.6)
            .select("doc_a", "doc_b"))
        clusters.groupBy("cluster_id").agg(count(lit(1)).as("cluster_size"))
          .groupBy("cluster_size")
          .agg(count(lit(1)).as("n_clusters"),
            (count(lit(1)) * (col("cluster_size") - 1)).as("docs_removed"))
      },
      Some(jaccardCte.replaceFirst("WITH ", "WITH RECURSIVE ") + """
        , pr AS (SELECT doc_a, doc_b FROM p
                 WHERE CAST(common AS DOUBLE) / (sa + sb - common) >= 0.6),
        e AS (SELECT doc_a AS s, doc_b AS t FROM pr
              UNION ALL SELECT doc_b, doc_a FROM pr),
        reach AS (
          SELECT s, t FROM e
          UNION
          SELECT r.s, e.t FROM reach r JOIN e ON r.t = e.s),
        lab AS (SELECT s AS doc_id, LEAST(s, MIN(t)) AS cluster_id
                FROM reach GROUP BY s),
        sizes AS (SELECT cluster_id, COUNT(*) AS cluster_size
                  FROM lab GROUP BY 1)
        SELECT cluster_size, COUNT(*) AS n_clusters,
          COUNT(*) * (cluster_size - 1) AS docs_removed
        FROM sizes GROUP BY cluster_size""")),

    // ---- chunk-level SEMANTIC dedup: t21's windows x s07's IVF ----------
    //      the RAG-ingest shape — near-dup detection at retrieval
    //      granularity (500/400 sliding chunks), embed-proxy per chunk
    //      (16-dim integer char-class frequency vector), candidates
    //      bounded by IVF cells (same-cell, cross-doc only — NEVER
    //      all-pairs), and a sqrt-free squared-cosine gate so every
    //      comparison is exact integer/double math the oracle replays
    //      cell for cell. Per-cell audit row: members, candidate pairs,
    //      pairs over the cos^2 >= 0.998 bar.
    Q("d15_chunk_semantic",
      (s, d) => DedupOps.chunkNearDups(Tables.documents(s, d)),
      Some("""
        WITH ch AS MATERIALIZED (
          SELECT doc_id, doc_id * 2097152 + i AS ck,
            list_filter(string_split(lower(
                substring(text, CAST(i * 400 + 1 AS BIGINT), 500)), ''),
              c -> (c >= 'a' AND c <= 'z') OR (c >= '0' AND c <= '9')) AS cs
          FROM documents
          CROSS JOIN LATERAL unnest(range(0,
            CAST(ceil(greatest(length(text) - 500, 0) / 400.0)
              AS BIGINT) + 1)) t(i)),
        e2 AS MATERIALIZED (
          SELECT doc_id, ck, v,
            list_reduce(list_prepend(CAST(0 AS BIGINT),
              list_transform(v, x -> x * x)), (a, b) -> a + b) AS n2
          FROM (SELECT doc_id, ck,
                  list_transform(range(0, 16), j ->
                    CAST(len(list_filter(cs, c -> ascii(c) % 16 = j))
                      AS BIGINT)) AS v
                FROM ch)),
        seeds AS MATERIALIZED (
          SELECT ck AS cell, v AS cv FROM e2 ORDER BY ck LIMIT 16),
        x AS (
          SELECT e2.doc_id, e2.ck, e2.v, e2.n2, s.cell,
            row_number() OVER (PARTITION BY e2.ck ORDER BY
              list_reduce(list_prepend(CAST(0 AS BIGINT),
                list_transform(range(1, 17), j ->
                  (e2.v[j] - s.cv[j]) * (e2.v[j] - s.cv[j]))),
                (a, b) -> a + b) ASC, s.cell ASC) AS rn
          FROM e2 CROSS JOIN seeds s),
        a AS MATERIALIZED (
          SELECT doc_id, ck, v, n2, cell FROM x WHERE rn = 1),
        p AS (
          SELECT a1.cell,
            list_reduce(list_prepend(CAST(0 AS BIGINT),
              list_transform(range(1, 17), j -> a1.v[j] * a2.v[j])),
              (x, y) -> x + y) AS dot,
            a1.n2 AS na2, a2.n2 AS nb2
          FROM a a1 JOIN a a2 ON a1.cell = a2.cell AND a1.ck < a2.ck
            AND a1.doc_id <> a2.doc_id),
        pa AS (
          SELECT cell, COUNT(*) AS n_cand_pairs,
            SUM(CASE WHEN dot >= 0 AND CAST(dot * dot AS DOUBLE) >=
                  0.998 * CAST(na2 * nb2 AS DOUBLE)
                THEN 1 ELSE 0 END) AS n_dup_pairs
          FROM p GROUP BY 1)
        SELECT m.cell, m.n_chunks,
          COALESCE(pa.n_cand_pairs, 0) AS n_cand_pairs,
          CAST(COALESCE(pa.n_dup_pairs, 0) AS BIGINT) AS n_dup_pairs
        FROM (SELECT cell, COUNT(*) AS n_chunks FROM a GROUP BY 1) m
        LEFT JOIN pa USING (cell)""")),

    // ---- chunk dedup with CORPUS-SIZED cells (the d15 scale dial) ------
    //      d15 gates the fixed test-scale default (16 cells); this gates
    //      the production sizing rule: nCells = max(16, ceil(sqrt(N)))
    //      for N chunks (DedupOps.autoCells — the IVF nlist heuristic
    //      that keeps assignment N*C and within-cell pairing N^2/C
    //      balanced at O(N^1.5)). The cell count is data-derived on BOTH
    //      sides: the engine counts chunks (one scalar to the driver),
    //      the oracle computes the same ceil(sqrt(COUNT(*))) in its
    //      seeds CTE — so the gate breaks if the sizing rule ever
    //      drifts between code and doc.
    Q("d17_chunk_semantic_auto",
      (s, d) => DedupOps.chunkNearDupsAuto(Tables.documents(s, d)),
      Some("""
        WITH ch AS MATERIALIZED (
          SELECT doc_id, doc_id * 2097152 + i AS ck,
            list_filter(string_split(lower(
                substring(text, CAST(i * 400 + 1 AS BIGINT), 500)), ''),
              c -> (c >= 'a' AND c <= 'z') OR (c >= '0' AND c <= '9')) AS cs
          FROM documents
          CROSS JOIN LATERAL unnest(range(0,
            CAST(ceil(greatest(length(text) - 500, 0) / 400.0)
              AS BIGINT) + 1)) t(i)),
        e2 AS MATERIALIZED (
          SELECT doc_id, ck, v,
            list_reduce(list_prepend(CAST(0 AS BIGINT),
              list_transform(v, x -> x * x)), (a, b) -> a + b) AS n2
          FROM (SELECT doc_id, ck,
                  list_transform(range(0, 16), j ->
                    CAST(len(list_filter(cs, c -> ascii(c) % 16 = j))
                      AS BIGINT)) AS v
                FROM ch)),
        seeds AS MATERIALIZED (
          SELECT cell, cv FROM (
            SELECT ck AS cell, v AS cv,
              row_number() OVER (ORDER BY ck) AS rn FROM e2)
          WHERE rn <= (SELECT GREATEST(16,
            CAST(ceil(sqrt(COUNT(*))) AS BIGINT)) FROM e2)),
        x AS (
          SELECT e2.doc_id, e2.ck, e2.v, e2.n2, s.cell,
            row_number() OVER (PARTITION BY e2.ck ORDER BY
              list_reduce(list_prepend(CAST(0 AS BIGINT),
                list_transform(range(1, 17), j ->
                  (e2.v[j] - s.cv[j]) * (e2.v[j] - s.cv[j]))),
                (a, b) -> a + b) ASC, s.cell ASC) AS rn
          FROM e2 CROSS JOIN seeds s),
        a AS MATERIALIZED (
          SELECT doc_id, ck, v, n2, cell FROM x WHERE rn = 1),
        p AS (
          SELECT a1.cell,
            list_reduce(list_prepend(CAST(0 AS BIGINT),
              list_transform(range(1, 17), j -> a1.v[j] * a2.v[j])),
              (x, y) -> x + y) AS dot,
            a1.n2 AS na2, a2.n2 AS nb2
          FROM a a1 JOIN a a2 ON a1.cell = a2.cell AND a1.ck < a2.ck
            AND a1.doc_id <> a2.doc_id),
        pa AS (
          SELECT cell, COUNT(*) AS n_cand_pairs,
            SUM(CASE WHEN dot >= 0 AND CAST(dot * dot AS DOUBLE) >=
                  0.998 * CAST(na2 * nb2 AS DOUBLE)
                THEN 1 ELSE 0 END) AS n_dup_pairs
          FROM p GROUP BY 1)
        SELECT m.cell, m.n_chunks,
          COALESCE(pa.n_cand_pairs, 0) AS n_cand_pairs,
          CAST(COALESCE(pa.n_dup_pairs, 0) AS BIGINT) AS n_dup_pairs
        FROM (SELECT cell, COUNT(*) AS n_chunks FROM a GROUP BY 1) m
        LEFT JOIN pa USING (cell)""")),

    // ---- exact-substring duplicate spans (suffix-array approximation) ---
    //      WORD-ANCHORED 32-char grams: the first 32 chars of the text
    //      at every word boundary (content-defined sampling — the
    //      anchor positions move with the text, so a span repeated at
    //      DIFFERENT offsets in two docs still anchors identical grams;
    //      fixed-stride position sampling misses exactly those). See
    //      DedupOps.substringDupPairs — the Lee et al. 2022 dedup
    //      target, bulk-parallelized. Gram emit is row-local; one
    //      shuffle keys the postings by gram; grams in > 16 docs are
    //      dropped before pairing (bucket-cap discipline) so
    //      boilerplate can never go quadratic. Output: doc pairs with
    //      their shared-gram counts — at sf0.01 this finds the corpus's
    //      26 verbatim-duplicate pairs, up to 88 shared spans each.
    Q("d16_substring_dedup",
      (s, d) => DedupOps.substringDupPairs(
        Tables.documents(s, d), gramLen = 32, maxDocsPerGram = 16),
      Some("""
        WITH w AS MATERIALIZED (
          SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        g AS MATERIALIZED (
          SELECT DISTINCT doc_id,
            substring(array_to_string(
              ws[CAST(i AS BIGINT):CAST(i + 16 AS BIGINT)], ' '),
              1, 32) AS gram
          FROM w CROSS JOIN LATERAL unnest(range(1, len(ws) + 1)) t(i)
          WHERE length(substring(array_to_string(
              ws[CAST(i AS BIGINT):CAST(i + 16 AS BIGINT)], ' '),
              1, 32)) = 32),
        f AS (SELECT gram FROM g
              GROUP BY gram HAVING COUNT(*) BETWEEN 2 AND 16),
        gg AS MATERIALIZED (
          SELECT doc_id, gram FROM g WHERE gram IN (SELECT gram FROM f))
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_shared
        FROM gg a JOIN gg b ON a.gram = b.gram AND a.doc_id < b.doc_id
        GROUP BY 1, 2""")),

    // ---- weighted sampling without replacement (A-ES) -------------------
    //      Efraimidis-Spirakis exponential-keys sampling: key(doc) =
    //      ln(u)/w with u uniform in (0,1], take the k LARGEST keys —
    //      the top-k then IS a without-replacement sample with
    //      P(inclusion) proportional to weight w (here n_chars: the
    //      byte-budget-weighted doc selection a curation mix uses when
    //      "sample 50 docs" should mean "prefer the documents carrying
    //      more training signal"). Portability: u is md5-derived —
    //      (first 52 bits of md5(doc_id) + 1) / 2^52, an EXACT double on
    //      both engines — and the key is 1e-9-quantized before the cut
    //      so the ln/division ulp cannot reorder the top-k (the t23
    //      discipline). Row-local scoring + one TakeOrdered: no shuffle
    //      beyond the top-k at any corpus size.
    Q("d18_weighted_sample",
      (s, d) => {
        val h = md5(col("doc_id").cast("string").cast("binary"))
        Tables.documents(s, d)
          .filter(col("n_chars") > 0)
          .select(col("doc_id"), col("n_chars"))
          .withColumn("u",
            ((conv(substring(h, 1, 13), 16, 10).cast("long") + lit(1L))
              .cast("double")) / lit(4503599627370496.0))
          .withColumn("kq", floor(log(col("u")) /
            col("n_chars").cast("double") * lit(1e9)).cast("long"))
          .orderBy(col("kq").desc, col("doc_id").asc)
          .limit(50)
          .select(col("doc_id"), col("n_chars"), col("kq"))
      },
      Some("""
        SELECT doc_id, n_chars, kq FROM (
          SELECT doc_id, n_chars,
            CAST(FLOOR(ln(
                CAST(CAST(CONCAT('0x', substring(
                    md5(CAST(doc_id AS VARCHAR)), 1, 13)) AS BIGINT) + 1
                  AS DOUBLE) / 4503599627370496.0)
              / CAST(n_chars AS DOUBLE) * 1e9) AS BIGINT) AS kq
          FROM documents WHERE n_chars > 0)
        ORDER BY kq DESC, doc_id ASC LIMIT 50""")),

    // ---- dedup yield vs threshold (the tuning curve) --------------------
    //      pair counts and doc-touch counts at minJaccard in
    //      {0.5, 0.6, 0.7, 0.8} from ONE shingle-join pass — the curve a
    //      curation run reads before committing to a threshold (too low
    //      merges topical neighbors, too high misses light edits). The
    //      expensive pair generation runs once at the loosest threshold;
    //      the per-threshold rollup is conditional aggregation over the
    //      already-bounded pair set. (On this synthetic corpus the curve
    //      is flat — the jaccard distribution is bimodal, <0.15 or
    //      >=0.8, so every grid point sees the same 25 pairs; that IS
    //      the diagnostic working: it says the threshold choice is
    //      insensitive here, which a real crawl's long near-dup tail
    //      would not.)
    // ---- LSH banding tuning table (the b/r S-curve, measured) -----------
    //      d19 tunes the VERIFY threshold; this tunes the CANDIDATE
    //      GENERATOR: at fixed k = 16 signature functions, how many
    //      candidate pairs — and how many true >= 0.5-Jaccard pairs
    //      among them — each banding (b bands x r rows) produces. More
    //      bands = higher collision probability 1-(1-J^r)^b = more
    //      recall AND more junk candidates; the table is what a dedup
    //      run reads to pick its banding. ONE portable signature pass
    //      (d19's discipline): gram ids are md5-derived 60-bit integers
    //      (NOT the production xxhash64 — 8 bytes narrower on the
    //      shuffle, but opaque to an independent engine; the gate's job
    //      is replaying the banding algebra, so it pays the portable
    //      hash) and every banding reads the same 16 min-hash columns.
    //      Band keys here are concatenated strings for the same
    //      portability reason; production buckets hash them to 8 bytes
    //      (DedupOps.minHashCandidates).
    Q("d20_banding_curve",
      (s, d) => {
        import graft.functions.TextFunctions.{tokens, wordNgrams}
        import s.implicits._
        val k = 16
        val mm = graft.expressions.MinHashAgg.M
        val (has, hbs) = graft.expressions.MinHashAgg.hashFamily(k)
        val docs = Tables.documents(s, d)
        // r18 restructure (guide §1.2/§2.4 — one pass, shared work):
        // ONE distinct (doc, 3-gram-string) frame feeds BOTH the
        // portable md5 signature pass AND the exact-truth pair join;
        // previously the truth side re-ran its own tokenize + shingle +
        // distinct (DedupOps.ngramJaccardPairs), and each of the four
        // banding branches re-evaluated the truth join and the bucket
        // explode — 4x the self-join/dedup machinery for the same rows.
        val grams = docs.withColumn("toks", tokens("text"))
          .select(col("doc_id"), explode(wordNgrams("toks", 3)).as("g"))
          .distinct()
          // cache lifecycle: CALLER-owned — clearCache()/unpersist after the action (DedupOps class doc)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val gid31 = expr(
          "CAST(conv(substring(md5(CAST(g AS BINARY)), 1, 15), 16, 10) " +
            s"AS BIGINT) % $mm")
        val sigs = grams
          .withColumn("gid", gid31)
          .groupBy(col("doc_id"))
          .agg((0 until k).map(i =>
            min((lit(has(i)) * col("gid") + lit(hbs(i))) % lit(mm))
              .as(s"s$i")).head,
            (1 until k).map(i =>
              min((lit(has(i)) * col("gid") + lit(hbs(i))) % lit(mm))
                .as(s"s$i")): _*)
        // exact Jaccard >= 0.5 truth over the SAME gram frame; the pair
        // join runs on 8-byte hashed gram ids (the shinglePostings
        // discipline), identical pair set to ngramJaccardPairs
        val posts = grams.select(col("doc_id"), xxhash64(col("g")).as("gid"))
        val sizes = posts.groupBy("doc_id").agg(count(lit(1)).as("sz"))
        val truth = posts.as("a")
          .join(posts.as("b"),
            col("a.gid") === col("b.gid") &&
              col("a.doc_id") < col("b.doc_id"))
          .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
          .agg(count(lit(1)).as("common"))
          .join(sizes.as("sa"), col("doc_a") === col("sa.doc_id"))
          .join(sizes.as("sb"), col("doc_b") === col("sb.doc_id"))
          .filter(col("common").cast("double") /
            (col("sa.sz") + col("sb.sz") - col("common")) >= 0.5)
          .select(col("doc_a"), col("doc_b"))
        // ALL FOUR bandings ride one exploded frame (bset tags the
        // banding): ONE bucket self-join + ONE pair distinct + ONE truth
        // join + ONE keyed rollup where there were four of each
        val bandings = Seq((2, 8), (4, 4), (8, 2), (16, 1))
        val bandCols = for ((b, r) <- bandings; bnd <- 0 until b) yield
          struct(lit(b.toLong).as("bset"), lit(bnd).as("band"),
            concat_ws(",", (0 until r).map(j =>
              col(s"s${bnd * r + j}").cast("string")): _*).as("key"))
        val buckets = sigs.select(col("doc_id"),
            explode(array(bandCols: _*)).as("bk"))
          .select(col("doc_id"), col("bk.bset").as("bset"),
            col("bk.band").as("band"), col("bk.key").as("key"))
          // persisted: the self-join's two branches would otherwise each
          // recompute the 16-min-hash aggregation
          // cache lifecycle: CALLER-owned — clearCache()/unpersist after the action (DedupOps class doc)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val cand = buckets.as("x")
          .join(buckets.as("y"),
            col("x.bset") === col("y.bset") &&
              col("x.band") === col("y.band") &&
              col("x.key") === col("y.key") &&
              col("x.doc_id") < col("y.doc_id"))
          .select(col("x.bset").as("bset"),
            col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
          .distinct()
        val counts = cand
          .join(truth.withColumn("hit", lit(1)), Seq("doc_a", "doc_b"),
            "left")
          .groupBy(col("bset"))
          .agg(count(lit(1)).as("cand"), count(col("hit")).as("hits"))
        // anchor on the banding grid so a zero-candidate banding still
        // reports its (b, r, 0, 0) row (the kcorePeel anchor rule — the
        // old per-branch global aggregates emitted a row unconditionally)
        val spec = bandings.map { case (b, r) => (b.toLong, r.toLong) }
          .toDF("bands", "rows_per_band")
        spec.join(counts, col("bands") === col("bset"), "left")
          .select(col("bands"), col("rows_per_band"),
            coalesce(col("cand"), lit(0L)).as("n_cand_pairs"),
            coalesce(col("hits"), lit(0L)).as("n_true_pairs"))
      },
      Some {
        val k = 16
        val mm = graft.expressions.MinHashAgg.M
        val (has, hbs) = graft.expressions.MinHashAgg.hashFamily(k)
        val sigCols = (0 until k).map(i =>
          s"MIN((${has(i)} * gid + ${hbs(i)}) % $mm) AS s$i")
          .mkString(",\n             ")
        def branch(b: Int, r: Int): String = {
          val bandRows = (0 until b).map { bnd =>
            val key = (0 until r).map(j => s"CAST(s${bnd * r + j} AS VARCHAR)")
              .mkString(" || ',' || ")
            s"SELECT doc_id, $bnd AS band, $key AS key FROM sig"
          }.mkString("\n          UNION ALL ")
          s"""
        bk${b}_$r AS ($bandRows),
        cd${b}_$r AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
                 FROM bk${b}_$r x JOIN bk${b}_$r y
                   ON x.band = y.band AND x.key = y.key
                     AND x.doc_id < y.doc_id),
        rs${b}_$r AS (SELECT CAST($b AS BIGINT) AS bands,
                   CAST($r AS BIGINT) AS rows_per_band,
                   COUNT(*) AS n_cand_pairs,
                   COUNT(tr.doc_a) AS n_true_pairs
                 FROM cd${b}_$r
                 LEFT JOIN tr ON cd${b}_$r.doc_a = tr.doc_a
                   AND cd${b}_$r.doc_b = tr.doc_b)"""
        }
        jaccardCte + s"""
        , tr AS (SELECT doc_a, doc_b FROM p
                 WHERE CAST(common AS DOUBLE) / (sa + sb - common) >= 0.5),
        gr AS (SELECT DISTINCT doc_id, unnest(list_distinct(
                 list_transform(range(1, len(toks) - 1),
                   i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])))
                 AS g
               FROM t),
        gi AS (SELECT doc_id,
                 CAST(concat('0x', substr(md5(g), 1, 15)) AS BIGINT) % $mm
                   AS gid
               FROM gr),
        sig AS MATERIALIZED (
          SELECT doc_id,
             $sigCols
          FROM gi GROUP BY doc_id),
        ${branch(2, 8).stripPrefix("\n")},
        ${branch(4, 4).stripPrefix("\n")},
        ${branch(8, 2).stripPrefix("\n")},
        ${branch(16, 1).stripPrefix("\n")}
        SELECT * FROM rs2_8 UNION ALL SELECT * FROM rs4_4
        UNION ALL SELECT * FROM rs8_2 UNION ALL SELECT * FROM rs16_1"""
      }),

    // ---- corpus-level exact line dedup (C4 / RefinedWeb) ----------------
    //      the d-family dedups DOCUMENTS; crawled corpora also need the
    //      finer grain: drop every repeated LINE corpus-wide, keeping
    //      only its first occurrence (C4, Raffel 2020 §2.2 "we discarded
    //      ... any [line] occurring more than once"; RefinedWeb, Penedo
    //      2023 §3.4 exact line dedup) — the screen that strips nav bars,
    //      cookie banners and footers that repeat across a site. The
    //      fixture manufactures what the single-line corpus lacks:
    //      content lines = 8-token windows of each doc (near-dup docs
    //      therefore collide on real lines), plus two injected
    //      boilerplate lines (a newsletter plea on every doc, a
    //      copyright notice on doc_id % 3 == 0) that dedup must strip
    //      everywhere except their first carrier. First occurrence =
    //      min (doc_id, line_no): ONE row_number window keyed by the
    //      line (hash-shuffle only — no global sort), then one doc_id
    //      rollup whose collect_list is bounded by the doc's own line
    //      count. Scale note: the shuffle key here is the raw line text
    //      (the oracle replays string equality); production swaps in a
    //      128-bit fingerprint to cut shuffle width — same plan shape.
    Q("d21_line_dedup",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        import graft.functions.TextFunctions.tokens
        val newsLine = "subscribe to our newsletter for daily updates now"
        val copyLine = "all rights reserved contact the site administrator today"
        val lineStruct = "struct<line_no:bigint,line:string>"
        val withLines = Tables.documents(s, d)
          .select(col("doc_id"), tokens("text").as("toks"))
          .withColumn("nc", expr("CAST(ceil(size(toks) / 8.0) AS BIGINT)"))
          .select(col("doc_id"), concat(
            // nc > 0 guard: Spark's sequence(0, -1) DESCENDS to [0, -1]
            // (two phantom lines) where DuckDB's range(0, 0) is empty —
            // a zero-token document must contribute zero body lines
            expr("""CASE WHEN nc > 0 THEN
                      transform(sequence(0, CAST(nc AS INT) - 1),
                        i -> named_struct(
                          'line_no', CAST(i AS BIGINT),
                          'line', array_join(slice(toks, 8*i + 1, 8), ' ')))
                    ELSE CAST(array() AS
                      array<struct<line_no:bigint,line:string>>) END"""),
            array(struct(col("nc").as("line_no"),
              lit(newsLine).as("line"))),
            when(col("doc_id") % 3 === 0,
              array(struct((col("nc") + 1).as("line_no"),
                lit(copyLine).as("line"))))
              .otherwise(array().cast(s"array<$lineStruct>"))).as("ls"))
        val marked = withLines
          .select(col("doc_id"), explode(col("ls")).as("l"))
          .select(col("doc_id"), col("l.line_no").as("line_no"),
            col("l.line").as("line"))
          .withColumn("kept", row_number().over(
            Window.partitionBy("line").orderBy("doc_id", "line_no")) === 1)
        marked.groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_lines"),
            sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"),
            sum(when(col("kept"), 0L).otherwise(1L)).as("n_dropped"),
            sort_array(collect_list(struct(col("line_no"), col("kept"),
              col("line")))).as("sorted"))
          .select(col("doc_id"), col("n_lines"), col("n_kept"),
            col("n_dropped"),
            array_join(transform(filter(col("sorted"),
              x => x.getField("kept")), x => x.getField("line")), "\n")
              .as("clean_text"))
      },
      Some("""
        WITH t AS (SELECT doc_id, string_split_regex(trim(text), ' +') toks
                   FROM documents),
        le AS (SELECT doc_id, toks,
                 CAST(ceil(len(toks) / 8.0) AS BIGINT) AS nc
               FROM t),
        ls AS (SELECT doc_id, unnest(list_concat(list_concat(
                 list_transform(range(0, nc), i -> {
                   'line_no': i,
                   'line': array_to_string(toks[8*i+1:8*i+8], ' ')}),
                 [{'line_no': nc,
                   'line': 'subscribe to our newsletter for daily updates now'}]),
                 list_transform(range(0, CASE WHEN doc_id % 3 = 0
                                              THEN 1 ELSE 0 END), i -> {
                   'line_no': nc + 1,
                   'line': 'all rights reserved contact the site administrator today'}))) AS l
               FROM le),
        mk AS (SELECT doc_id, l.line_no AS line_no, l.line AS line,
                 row_number() OVER (PARTITION BY l.line
                                    ORDER BY doc_id, l.line_no) = 1 AS kept
               FROM ls)
        SELECT doc_id,
          COUNT(*) AS n_lines,
          CAST(SUM(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
          CAST(SUM(CASE WHEN kept THEN 0 ELSE 1 END) AS BIGINT) AS n_dropped,
          COALESCE(string_agg(CASE WHEN kept THEN line END, chr(10)
                              ORDER BY line_no), '') AS clean_text
        FROM mk GROUP BY doc_id""")),

    // ---- SemDeDup: semantic dedup via embedding clusters ---------------
    //      (Abbas et al. 2023) the EMBEDDING-space dedup the d-family's
    //      text-shingle operators can't see: k-means the corpus (the
    //      c-family Lloyd loop, 2 fixed passes), generate pairs only
    //      WITHIN clusters (the IVF bound — pair work is Σ|cell|², never
    //      |corpus|²; the √N cell rule of d17 applies at scale), flag
    //      pairs with cosine ≥ τ, and keep per duplicate group the
    //      member FURTHEST from its centroid (the paper's
    //      low-similarity-to-centroid keep rule, here as the pairwise
    //      dominance form: drop a vector iff some τ-neighbor has
    //      strictly greater (d2-to-centroid, vec_id)). The fixture's
    //      embeddings are near-isotropic (max pairwise cosine 0.51,
    //      measured), so the gate PLANTS exact semantic twins (vec_id %
    //      10 == 0 duplicated at +100000 — identical vectors land in
    //      the same cell and tie on d2, making the id tiebreak the
    //      spec-visible branch); production τ ~0.95 catches near-twins
    //      the same way. Oracle replays Lloyd + within-cell pairs +
    //      dominance value-for-value.
    Q("d22_semdedup",
      (s, d) => {
        val tau = 0.99
        val base = graft.operators.SimilarityOps
          .prepared(Tables.embeddings(s, d))
        val twins = base.filter(col("vec_id") % 10 === 0)
          .select((col("vec_id") + 100000L).as("vec_id"), col("v"),
            col("nrm"))
        val emb = base.select(col("vec_id"), col("v"), col("nrm"))
          .unionByName(twins)
        val an = Clustering
          .lloydPasses(emb.select(col("vec_id"), col("v")), k = 8,
            iters = 2).last
          .join(emb.select(col("vec_id"), col("nrm")), "vec_id")
        val pairs = an.as("x").join(an.as("y"),
            col("x.cell") === col("y.cell") &&
              col("x.vec_id") < col("y.vec_id"))
          .filter(call_function("vec_dot", col("x.v"), col("y.v")) /
            (col("x.nrm") * col("y.nrm")) >= tau)
          .select(col("x.vec_id").as("a"), col("x.d2").as("da"),
            col("y.vec_id").as("b"), col("y.d2").as("db"))
        val nb = pairs
          .select(col("a").as("vec_id"), col("db").as("nd2"),
            col("b").as("nid"))
          .unionByName(pairs.select(col("b").as("vec_id"),
            col("da").as("nd2"), col("a").as("nid")))
        val ag = nb.join(an.select(col("vec_id"), col("d2")), "vec_id")
          .groupBy(col("vec_id"))
          .agg(count(lit(1)).as("n_dups"),
            max(when(col("nd2") > col("d2") ||
              (col("nd2") === col("d2") && col("nid") > col("vec_id")),
              1L).otherwise(0L)).as("dom"))
        an.select(col("vec_id"), col("cell"))
          .join(ag, Seq("vec_id"), "left")
          .select(col("vec_id"), col("cell"),
            coalesce(col("n_dups"), lit(0L)).as("n_dups"),
            (coalesce(col("dom"), lit(0L)) === 0L).as("is_kept"))
      },
      Some {
        val dot = """list_reduce(list_prepend(0.0,
          list_transform(range(1, len(x.v) + 1), i -> x.v[i] * y.v[i])),
          (p, q) -> p + q)"""
        """
        WITH e0 AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) v
                    FROM embeddings),
        e AS (SELECT vec_id, v FROM e0
              UNION ALL
              SELECT vec_id + 100000, v FROM e0 WHERE vec_id % 10 = 0),
        n AS (SELECT vec_id, v,
                sqrt(list_reduce(list_prepend(0.0,
                  list_transform(range(1, len(v) + 1), i -> v[i] * v[i])),
                  (p, q) -> p + q)) AS nrm
              FROM e)""" +
          Clustering.lloydBodySql(8, 2) + s"""
        , an AS (SELECT a1.vec_id, a1.cell, d1.d2, n.v, n.nrm
                 FROM a1 JOIN d1 ON a1.vec_id = d1.vec_id
                   AND a1.cell = d1.cell
                 JOIN n ON a1.vec_id = n.vec_id),
        p AS (SELECT x.vec_id AS a, x.d2 AS da, y.vec_id AS b, y.d2 AS db
              FROM an x JOIN an y
                ON x.cell = y.cell AND x.vec_id < y.vec_id
              WHERE $dot / (x.nrm * y.nrm) >= 0.99),
        nb AS (SELECT a AS vec_id, db AS nd2, b AS nid FROM p
               UNION ALL SELECT b, da, a FROM p),
        ag AS (SELECT nb.vec_id, CAST(COUNT(*) AS BIGINT) AS n_dups,
                 CAST(MAX(CASE WHEN nb.nd2 > an.d2
                     OR (nb.nd2 = an.d2 AND nb.nid > an.vec_id)
                   THEN 1 ELSE 0 END) AS BIGINT) AS dom
               FROM nb JOIN an ON nb.vec_id = an.vec_id
               GROUP BY nb.vec_id)
        SELECT an.vec_id, an.cell,
          CAST(COALESCE(ag.n_dups, 0) AS BIGINT) AS n_dups,
          COALESCE(ag.dom, 0) = 0 AS is_kept
        FROM an LEFT JOIN ag ON an.vec_id = ag.vec_id"""
      }),

    Q("d19_threshold_curve",
      (s, d) => DedupOps.thresholdYieldCurve(
        DedupOps.ngramJaccardPairs(Tables.documents(s, d),
          n = 3, minJaccard = 0.5),
        Seq(0.5, 0.6, 0.7, 0.8)),
      Some(jaccardCte + """
        , nd AS (SELECT doc_a, doc_b,
                   CAST(common AS DOUBLE) / (sa + sb - common) AS j
                 FROM p
                 WHERE CAST(common AS DOUBLE) / (sa + sb - common) >= 0.5),
        th AS (SELECT t FROM (VALUES (0.5e0), (0.6e0), (0.7e0), (0.8e0))
               v(t)),
        x AS (SELECT th.t, nd.doc_a, nd.doc_b FROM th
              JOIN nd ON nd.j >= th.t)
        SELECT CAST(t AS DOUBLE) AS threshold,
          CAST(COUNT(*) / 2 AS BIGINT) AS n_pairs,
          CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs_touched
        FROM (SELECT t, doc_a AS doc_id FROM x
              UNION ALL SELECT t, doc_b FROM x)
        GROUP BY t""")),

    // ---- parameterized-template line detection --------------------------
    //      the boilerplate d21's EXACT line dedup cannot see: lines that
    //      differ only in a parameter ("copyright 2024 site 1731",
    //      "... site 1732" — session ids, years, usernames). Normalize
    //      each line to its SHAPE (lowercase, digit runs collapsed to
    //      '#') and profile shapes that span many docs with MANY
    //      DISTINCT raw forms — n_raw = 1 is d21's exact-dup territory;
    //      n_raw > 1 across >= 5 docs is a template. The fixture plants
    //      two parameterized lines (a doc-id-salted contact line on
    //      every doc, a year+id copyright on doc_id%2=0) on top of the
    //      8-token body windows, whose natural shapes stay under the
    //      doc threshold. One explode + shape projection + ONE keyed
    //      aggregation — the d21 plan with a normalization expression,
    //      same 100 TB shape (production keys the shuffle by a shape
    //      fingerprint).
    Q("d24_template_lines",
      (s, d) => {
        import graft.functions.TextFunctions.tokens
        val lineStruct = "struct<line_no:bigint,line:string>"
        val withLines = Tables.documents(s, d)
          .select(col("doc_id"), tokens("text").as("toks"))
          .withColumn("nc", expr("CAST(ceil(size(toks) / 8.0) AS BIGINT)"))
          .select(col("doc_id"), concat(
            // nc > 0 guard: Spark's sequence(0, -1) DESCENDS to [0, -1]
            // (two phantom lines) where DuckDB's range(0, 0) is empty —
            // a zero-token document must contribute zero body lines
            expr("""CASE WHEN nc > 0 THEN
                      transform(sequence(0, CAST(nc AS INT) - 1),
                        i -> named_struct(
                          'line_no', CAST(i AS BIGINT),
                          'line', array_join(slice(toks, 8*i + 1, 8), ' ')))
                    ELSE CAST(array() AS
                      array<struct<line_no:bigint,line:string>>) END"""),
            array(struct(col("nc").as("line_no"),
              concat(lit("contact support at extension "),
                (col("doc_id") % 97).cast("string")).as("line"))),
            when(col("doc_id") % 2 === 0,
              array(struct((col("nc") + 1).as("line_no"),
                concat(lit("copyright 2024 site "),
                  col("doc_id").cast("string")).as("line"))))
              .otherwise(array().cast(s"array<$lineStruct>"))).as("ls"))
        withLines
          .select(col("doc_id"), explode(col("ls")).as("l"))
          .select(col("doc_id"),
            regexp_replace(lower(col("l.line")), "[0-9]+", "#").as("shape"),
            col("l.line").as("line"))
          .groupBy(col("shape"))
          .agg(count_distinct(col("doc_id")).as("n_docs"),
            count(lit(1)).as("n_lines"),
            count_distinct(col("line")).as("n_raw"))
          .filter(col("n_docs") >= 5 && col("n_raw") >= 2)
      },
      Some("""
        WITH t AS (SELECT doc_id, string_split_regex(trim(text), ' +') toks
                   FROM documents),
        le AS (SELECT doc_id, toks,
                 CAST(ceil(len(toks) / 8.0) AS BIGINT) AS nc
               FROM t),
        ls AS (SELECT doc_id, unnest(list_concat(list_concat(
                 list_transform(range(0, nc), i -> {
                   'line_no': i,
                   'line': array_to_string(toks[8*i+1:8*i+8], ' ')}),
                 [{'line_no': nc,
                   'line': 'contact support at extension '
                             || CAST(doc_id % 97 AS VARCHAR)}]),
                 list_transform(range(0, CASE WHEN doc_id % 2 = 0
                                              THEN 1 ELSE 0 END), i -> {
                   'line_no': nc + 1,
                   'line': 'copyright 2024 site '
                             || CAST(doc_id AS VARCHAR)}))) AS l
               FROM le),
        sh AS (SELECT doc_id,
                 regexp_replace(lower(l.line), '[0-9]+', '#', 'g') AS shape,
                 l.line AS line
               FROM ls)
        SELECT shape, COUNT(DISTINCT doc_id) AS n_docs,
          COUNT(*) AS n_lines, COUNT(DISTINCT line) AS n_raw
        FROM sh GROUP BY shape
        HAVING COUNT(DISTINCT doc_id) >= 5 AND COUNT(DISTINCT line) >= 2""")),

    // ---- prefix-filtered EXACT similarity join (PPJoin family) ----------
    //      the deterministic counterpart to d03's MinHash LSH: same
    //      output contract as d02 (ALL pairs with J >= 0.6, no recall
    //      loss) but candidates come from a self-join on PREFIX postings
    //      under the rarest-gram-first global order, never from all
    //      pairs — the oracle is therefore the SAME exact all-pairs SQL
    //      as d02/d03, and equality with it proves completeness. The
    //      candidate bound itself is spec-pinned (DedupOpsSpec: result
    //      identical to ngramJaccardPairs, candidate count a fraction of
    //      n*(n-1)/2 on the fixture).
    Q("d23_prefix_filter_join",
      (s, d) => DedupOps.prefixFilterJaccardPairs(Tables.documents(s, d),
        n = 3, minJaccard = 0.6),
      Some(jaccardCte + jaccardSelect)),

    // ---- edit-distance join via deletion neighborhoods (FastSS/SymSpell)
    //      the string-variant near-dup the Jaccard family can't see:
    //      pairs within edit distance 1 (typos, off-by-one ids). Each
    //      distinct string generates itself + its |s| single-deletion
    //      variants; ED<=1 pairs MUST share a variant (substitution at i
    //      -> both i-deletions equal; insertion/deletion -> one side's
    //      deletion equals the other verbatim — the FastSS completeness
    //      argument, k=1), so ONE equi-join on the variant key yields
    //      candidates linear in corpus x length, never all-pairs, and
    //      exact levenshtein verifies. The production spell-correction
    //      blocking (SymSpell) as a relational plan: explode + shuffle
    //      on the variant + verify — holds at any corpus size because
    //      postings grow with |s|, not with pair count.
    Q("d25_symspell_join",
      (s, d) => DedupOps.symspellPairs(
        Tables.events(s, d).select(col("props").as("str")).distinct()
          .filter(length(col("str")) > 0)),
      Some("""
        WITH s AS (SELECT DISTINCT props AS str FROM events
                   WHERE length(props) > 0),
        v AS (SELECT str, unnest(list_prepend(str,
                list_transform(range(1, length(str) + 1),
                  i -> substr(str, 1, i - 1)
                    || substr(str, i + 1, length(str))))) AS var
              FROM s),
        c AS (SELECT DISTINCT a.str AS a, b.str AS b
              FROM v a JOIN v b ON a.var = b.var AND a.str < b.str)
        SELECT a, b, CAST(levenshtein(a, b) AS BIGINT) AS dist
        FROM c WHERE levenshtein(a, b) <= 1""")),

    // ---- span-level exact-substring dedup REMOVAL (Lee et al. 2022) -----
    //      d16 reports which doc pairs share verbatim spans; this is the
    //      operator a pipeline actually ships: remove every repeated
    //      anchored span from all occurrences but its corpus-wide FIRST
    //      (min (doc_id, word_index)) and emit the surviving text —
    //      d21's (doc_id, clean_text) contract at span grain. The oracle
    //      replays the whole chain byte-for-byte: same word-boundary
    //      anchors, same first-carrier window, same word-granularity
    //      excision ([i, i+17) per removed 32-char anchor), same
    //      space-rejoin. DedupOpsSpec pins that exactly one carrier
    //      keeps a span planted across three docs (and within one doc).
    Q("d26_substring_spans",
      (s, d) => DedupOps.substringDedupSpans(
        Tables.documents(s, d), gramLen = 32),
      Some("""
        WITH w AS MATERIALIZED (
          SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        a0 AS (SELECT doc_id, ws,
                 CAST(unnest(range(0, len(ws))) AS BIGINT) AS i
               FROM w),
        a AS MATERIALIZED (
          SELECT doc_id, i,
            substring(array_to_string(ws[i+1 : i+17], ' '), 1, 32) AS gram
          FROM a0
          WHERE length(substring(array_to_string(ws[i+1 : i+17], ' '),
                                 1, 32)) = 32),
        mk AS (SELECT doc_id, i,
                 row_number() OVER (PARTITION BY gram
                                    ORDER BY doc_id, i) AS rn,
                 COUNT(*) OVER (PARTITION BY gram) AS cnt
               FROM a),
        rmo AS (SELECT doc_id, i FROM mk WHERE cnt >= 2 AND rn > 1),
        rm AS (SELECT DISTINCT doc_id,
                 CAST(unnest(range(i, i + 17)) AS BIGINT) AS wi
               FROM rmo),
        wd AS (SELECT doc_id, CAST(unnest(range(0, len(ws))) AS BIGINT)
                 AS wi, ws FROM w),
        fl AS (SELECT wd.doc_id, wd.wi, wd.ws[wd.wi+1] AS word,
                 rm.wi IS NOT NULL AS rm
               FROM wd LEFT JOIN rm
                 ON wd.doc_id = rm.doc_id AND wd.wi = rm.wi)
        SELECT doc_id, COUNT(*) AS n_words,
          CAST(SUM(CASE WHEN rm THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
          COALESCE(string_agg(CASE WHEN NOT rm THEN word END, ' '
                              ORDER BY wi), '') AS clean_text
        FROM fl GROUP BY doc_id"""))
  )
}
