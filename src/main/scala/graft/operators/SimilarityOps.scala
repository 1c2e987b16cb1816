package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.VectorFunctions._
import graft.expressions.VectorExpressions

/** Similarity search over an embedding column (`array<float>`).
  *
  * Two paths with the same output contract (q_id, vec_id, cosine, rk):
  *  - brute-force exact top-k: broadcast the (small) query set against
  *    the corpus — a map-side-only scan at any corpus size, the correct
  *    baseline when |queries| is small;
  *  - bucketed ANN: sign-bit LSH partitions both sides, the join runs
  *    per bucket — candidate generation is linear in corpus size and the
  *    plane count trades recall for bucket size (at 100 TB you'd raise
  *    `planes` and add multiprobe on neighboring signatures; the operator
  *    shape is unchanged).
  *
  * The per-query top-k window is partitioned by q_id — no global sort at
  * any scale.
  */
object SimilarityOps {

  /** normalize schema once: vec_id, v (array<double>), nrm. Uses the
    * native codegen'd vec_dot expression (bit-identical to the HOF fold
    * in VectorFunctions.dot, minus its per-element lambda dispatch). */
  def prepared(embeddings: DataFrame): DataFrame = {
    VectorExpressions.registerAll(embeddings.sparkSession)
    val v = asDouble(col("embedding"))
    embeddings.select(col("vec_id"), v.as("v"))
      .withColumn("nrm", sqrt(call_function("vec_dot", col("v"), col("v"))))
  }

  private def dotNative(a: Column, b: Column): Column =
    call_function("vec_dot", a, b)

  private def topK(pairs: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cosine").desc, col("vec_id").asc)
    pairs.withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
  }

  /** exact cosine top-k of the corpus against each query vector */
  def bruteForceTopK(embeddings: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val corpus = prepared(embeddings)
    val qs = prepared(queries)
      .select(col("vec_id").as("q_id"), col("v").as("qv"), col("nrm").as("qnrm"))
    val pairs = corpus.crossJoin(broadcast(qs))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        cosineFromParts(dotNative(col("v"), col("qv")), col("nrm"), col("qnrm"))
          .as("cosine"))
    topK(pairs, k)
  }

  /** exact L2-distance top-k (nearest by Euclidean distance) — same
    * broadcast shape as bruteForceTopK with the metric swapped to the
    * native vec_l2sq expression */
  def l2TopK(embeddings: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val corpus = prepared(embeddings)
    val qs = prepared(queries)
      .select(col("vec_id").as("q_id"), col("v").as("qv"))
    val pairs = corpus.crossJoin(broadcast(qs))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        sqrt(call_function("vec_l2sq", col("v"), col("qv"))).as("l2_dist"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("l2_dist").asc, col("vec_id").asc)
    pairs.withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
  }

  /** Embedding-cosine near-duplicate pairs: all (a < b) pairs with
    * cosine >= minCosine. Exact all-pairs form — at corpus scale,
    * pre-partition both sides with [[graft.functions.VectorFunctions
    * .signBucket]] (the s02/lshTopK shape) so only same-bucket pairs are
    * scored; kept exact here because it is the ground-truth verifier. */
  def embeddingNearDups(embeddings: DataFrame, minCosine: Double): DataFrame = {
    val p = prepared(embeddings)
    val a = p.select(col("vec_id").as("id_a"), col("v").as("va"), col("nrm").as("na"))
    val b = p.select(col("vec_id").as("id_b"), col("v").as("vb"), col("nrm").as("nb"))
    a.join(b, col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        cosineFromParts(dotNative(col("va"), col("vb")), col("na"), col("nb"))
          .as("cosine"))
      .filter(col("cosine") >= minCosine)
  }

  /** IVF-style ANN: every corpus vector is assigned to its nearest coarse
    * centroid ("cell", L2, ties to the lowest cell id); each query probes
    * its `nProbe` nearest cells and is scored exactly only against those
    * cells' members. Centroids here are `nCells` fixed seed vectors
    * (vec_id < nCells) so the query is deterministic end-to-end; a
    * production index would k-means-train them offline — the operator
    * shape (assign partition / probe / exact-score within cell) is
    * identical and that shape is what scales: candidate work per query is
    * |corpus| * nProbe / nCells instead of |corpus|.
    *
    * Assignment is a broadcast-expand + partial-aggregated argmin
    * (min over a (distance, cell) struct — map-side combine collapses the
    * nCells-way expansion before any shuffle), never a window over the
    * expanded frame. */
  def ivfTopK(embeddings: DataFrame, queries: DataFrame, k: Int,
              nCells: Int, nProbe: Int): DataFrame =
    ivfTopKWith(embeddings, queries, k, centroids(embeddings, nCells), nProbe)

  /** [[ivfTopK]] against a caller-supplied centroid table (cell, cv:
    * array<double>) — the k-means-TRAINED index path the seed-centroid
    * overload's docstring defers to ("a production index would
    * k-means-train them offline"): feed it
    * `Clustering.refreshCentroids(lloydPasses(...).last)` and the
    * operator shape (assign / probe / exact-score within cells) is
    * unchanged while cells now follow the data distribution, which is
    * what keeps cell populations balanced (and recall stable) on
    * clustered real-world corpora. */
  def ivfTopKWith(embeddings: DataFrame, queries: DataFrame, k: Int,
                  cents: DataFrame, nProbe: Int): DataFrame = {
    val corpus = assignCells(prepared(embeddings), cents, take = 1)
    val qs = assignCells(prepared(queries), cents, take = nProbe)
      .select(col("vec_id").as("q_id"), col("v").as("qv"),
        col("nrm").as("qnrm"), col("cell"))
    val pairs = corpus.join(broadcast(qs), "cell")
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        cosineFromParts(dotNative(col("v"), col("qv")), col("nrm"), col("qnrm"))
          .as("cosine"))
    topK(pairs, k)
  }

  /** Flat-IVF twin of [[ivfPqBranches]] (the s23 curve): corpus cell
    * assignment and the exact within-cell cosine scores are computed
    * ONCE at the deepest probe depth, each candidate tagged with the
    * rank of its cell in the query's probe order; every curve point is
    * then a filter + keyed rank over the shared persisted frame. Each
    * returned frame equals [[ivfTopK]] at that depth (spec-asserted).
    * Cache contract: caller-owned ([[DedupOps.containmentPairs]]). */
  def ivfBranches(embeddings: DataFrame, queries: DataFrame, k: Int,
                  nCells: Int, probes: Seq[Int]): Seq[(Int, DataFrame)] = {
    require(probes.nonEmpty && probes.forall(_ >= 1))
    val maxP = probes.max
    val cents = centroids(embeddings, nCells)
    val corpus = assignCells(prepared(embeddings), cents, take = 1)
    val qc = {
      val w = Window.partitionBy(col("vec_id"))
        .orderBy(col("d2").asc, col("cell").asc)
      prepared(queries).crossJoin(broadcast(cents))
        .withColumn("d2", call_function("vec_l2sq", col("v"), col("cv")))
        .withColumn("pr", row_number().over(w))
        .filter(col("pr") <= maxP)
        .select(col("vec_id").as("q_id"), col("v").as("qv"),
          col("nrm").as("qnrm"), col("cell"), col("pr"))
    }
    val pairs = corpus.join(broadcast(qc), "cell")
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"), col("pr"),
        cosineFromParts(dotNative(col("v"), col("qv")), col("nrm"),
          col("qnrm")).as("cosine"))
      // cache lifecycle: CALLER-owned — clearCache()/unpersist after the action (DedupOps class doc)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    probes.map(p => (p, topK(pairs.filter(col("pr") <= p).drop("pr"), k)))
  }

  /** coarse centroids: the first `nCells` vectors by id (deterministic
    * seeds — a production index k-means-trains these offline) */
  private def centroids(embeddings: DataFrame, nCells: Int): DataFrame =
    prepared(embeddings.filter(col("vec_id") < nCells))
      .select(col("vec_id").as("cell"), col("v").as("cv"))

  /** nearest-cell assignment shared by every IVF operator: argmin over
    * the broadcast centroid table by L2, ties to the lowest cell id.
    * take=1 is a partial-aggregated min-struct (map-side combine
    * collapses the nCells-way expansion before any shuffle); take>1
    * keeps the `take` nearest cells per row via a keyed window. */
  private[graft] def assignCells(side: DataFrame, cents: DataFrame,
                                 take: Int): DataFrame = {
    val expanded = side.crossJoin(broadcast(cents))
      .withColumn("d2", call_function("vec_l2sq", col("v"), col("cv")))
    if (take == 1)
      expanded
        .groupBy(col("vec_id"))
        .agg(min(struct(col("d2"), col("cell"))).getField("cell").as("cell"),
          // v/nrm are constant within the group — first() is safe
          first(col("v")).as("v"), first(col("nrm")).as("nrm"))
    else {
      val w = Window.partitionBy(col("vec_id"))
        .orderBy(col("d2").asc, col("cell").asc)
      expanded.withColumn("pr", row_number().over(w))
        .filter(col("pr") <= take)
        .select(col("vec_id"), col("v"), col("nrm"), col("cell"))
    }
  }

  /** Near-duplicate pairs restricted to IVF cells: vectors are assigned
    * to their nearest coarse centroid (the same assignCells as ivfTopK)
    * and only same-cell pairs are scored — candidate work drops from
    * |corpus|² to sum over cells of |cell|², the scale path for
    * embeddingNearDups. Near-identical vectors sit at near-identical
    * centroid distances, so true near-dups virtually always share a
    * cell; raise nCells for smaller cells and add neighbor-cell probing
    * when the threshold loosens. */
  def ivfNearDups(embeddings: DataFrame, minCosine: Double,
                  nCells: Int): DataFrame = {
    val assigned = assignCells(prepared(embeddings),
        centroids(embeddings, nCells), take = 1)
      // cache lifecycle: CALLER-owned — clearCache()/unpersist after the action (DedupOps class doc)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // explicit plan aliases: a("cell")/b("cell") off the same cached frame
    // share an expression id, which relies on Spark's ambiguous-self-join
    // detection to disambiguate (and logs a trivially-true-predicate WARN)
    val a = assigned.select(col("cell"), col("vec_id").as("id_a"),
      col("v").as("va"), col("nrm").as("na")).as("ivf_a")
    val b = assigned.select(col("cell"), col("vec_id").as("id_b"),
      col("v").as("vb"), col("nrm").as("nb")).as("ivf_b")
    a.join(b, col("ivf_a.cell") === col("ivf_b.cell") &&
        col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        cosineFromParts(dotNative(col("va"), col("vb")), col("na"), col("nb"))
          .as("cosine"))
      .filter(col("cosine") >= minCosine)
  }

  /** ivfNearDups with the cell count derived from the corpus size via
    * the sqrt(N) IVF sizing rule ([[graft.operators.DedupOps.autoCells]]:
    * C = max(16, ceil(sqrt(N))) balances the N*C assignment cost against
    * the N²/C within-cell pairing at O(N^1.5) — the standard nlist
    * heuristic). One COUNT scalar to the driver buys cell growth that
    * keeps per-cell pair work bounded at any corpus size; a fixed
    * test-scale nCells shipped to a 100x corpus re-quadratizes pairing. */
  def ivfNearDupsAuto(embeddings: DataFrame, minCosine: Double): DataFrame =
    ivfNearDups(embeddings, minCosine,
      graft.operators.DedupOps.autoCells(embeddings.count()))

  /** IVF index maintenance WITHOUT retraining — the day-2 operation of
    * a production vector index (FAISS add/remove_ids): an incoming
    * batch is assigned to the EXISTING trained cells (same broadcast
    * argmin as search-time assignment), deletions are tombstones
    * resolved per cell, and the output is the per-cell population
    * ledger (n_before/n_inserted/n_deleted/n_after) — the numbers that
    * tell an operator when drift has unbalanced the cells enough to
    * retrain (Lloyd is the EXPENSIVE pass; assignment is one scan).
    * Every cell appears, including emptied ones. Scale shape: two
    * broadcast-argmin scans + three keyed counts; nothing driver-side. */
  def ivfMaintenance(base: DataFrame, incoming: DataFrame,
                     tombstones: DataFrame, cents: DataFrame): DataFrame = {
    val b = assignCells(prepared(base), cents, take = 1)
      .select(col("vec_id"), col("cell"))
    val i = assignCells(prepared(incoming), cents, take = 1)
      .select(col("cell"))
    val dAgg = b.join(tombstones, Seq("vec_id"), "left_semi")
      .groupBy(col("cell")).agg(count(lit(1)).as("n_deleted"))
    val bAgg = b.groupBy(col("cell")).agg(count(lit(1)).as("n_before"))
    val iAgg = i.groupBy(col("cell")).agg(count(lit(1)).as("n_inserted"))
    cents.select(col("cell"))
      .join(bAgg, Seq("cell"), "left")
      .join(iAgg, Seq("cell"), "left")
      .join(dAgg, Seq("cell"), "left")
      .select(col("cell"),
        coalesce(col("n_before"), lit(0L)).as("n_before"),
        coalesce(col("n_inserted"), lit(0L)).as("n_inserted"),
        coalesce(col("n_deleted"), lit(0L)).as("n_deleted"),
        (coalesce(col("n_before"), lit(0L)) +
          coalesce(col("n_inserted"), lit(0L)) -
          coalesce(col("n_deleted"), lit(0L))).as("n_after"))
  }

  /** The retrain DECISION over an [[ivfMaintenance]] ledger — turns the
    * per-cell population counts into the one bit an index operator
    * acts on: is the post-maintenance cell distribution drifted or
    * unbalanced enough to justify paying for a Lloyd retrain?
    *
    * Two complementary signals, both exact:
    *  - '''tvd''' — total variation distance between the before and
    *    after cell-population distributions,
    *    `sum(|n_after*TB - n_before*TA|) / (2*TA*TB)`. The numerator is
    *    a pure BIGINT sum (order-independent, bit-exact on any engine);
    *    the single final double division keeps the oracle hash-exact.
    *    TVD reads "what fraction of the index mass sits in different
    *    cells than before" — the DISTRIBUTION-shift signal that fires
    *    even when totals barely move.
    *  - '''imbalance''' — `max(n_after) * n_cells / TA`, the hottest
    *    cell's load relative to uniform. An IVF probe scans whole
    *    cells, so search cost is gated by the largest cell, not the
    *    mean — the signal that fires when insertions PILE UP somewhere
    *    (ratio 1 = perfectly balanced, k = everything in one cell).
    *
    * `retrain` = either signal over its threshold. Null (not fired)
    * when a side is empty — an empty index has nothing to retrain, and
    * inf/NaN would poison the comparison. Scale shape: the ledger is
    * already cell-sized (nlist rows, KBs at any corpus size), so this
    * is two single-row aggregates and a broadcast nested-loop of
    * one-row frames — nothing data-sized anywhere.
    *
    * Numeric bound: the TVD numerator sums `|n_after*tb - n_before*ta|`
    * as BIGINT products, so each per-cell count × grand total must stay
    * below 2^63 ≈ 9.2e18 (e.g. ≤3e9 docs in the hottest cell against a
    * 3e9-total index). Past that, Spark wraps silently while DuckDB
    * raises — rescale the ledger first (divide both count columns by a
    * common factor; TVD is scale-invariant in each distribution) rather
    * than trusting the raw counts.
    *
    * The recompute twin is [[graft.queries.Clustering.refreshCentroids]]:
    * SimilarityOpsSpec pins that on a drifted fixture the flag fires
    * AND the refresh actually reduces assignment distortion, while an
    * in-distribution batch leaves the flag off. */
  def retrainTrigger(ledger: DataFrame, tvdThreshold: Double,
                     imbalanceThreshold: Double): DataFrame = {
    val totals = ledger.agg(
      count(lit(1)).as("n_cells"),
      sum(col("n_before")).as("tb"),
      sum(col("n_after")).as("ta"),
      max(col("n_after")).as("max_after"))
    val tvdNum = ledger.crossJoin(broadcast(totals.select("tb", "ta")))
      .agg(coalesce(sum(abs(col("n_after") * col("tb") -
        col("n_before") * col("ta"))), lit(0L)).as("tvd_num"))
    val tvd = when(col("tb") > 0 && col("ta") > 0,
      col("tvd_num").cast("double") /
        (lit(2.0) * col("tb") * col("ta")))
    val imbalance = when(col("ta") > 0,
      (col("max_after") * col("n_cells")).cast("double") /
        col("ta").cast("double"))
    totals.crossJoin(broadcast(tvdNum))
      .select(col("n_cells"), col("tb").as("total_before"),
        col("ta").as("total_after"), col("tvd_num"),
        tvd.as("tvd"), col("max_after"), imbalance.as("imbalance"),
        (tvd > lit(tvdThreshold) ||
          imbalance > lit(imbalanceThreshold)).as("retrain"))
  }

  /** FILTERED vector search: exact cosine top-k where corpus candidates
    * must match the query's value in `attr` (here: the embeddings
    * `label` column) — the metadata-predicate + vector composition
    * ("filtered ANN") that trips dedicated vector stores, and that a
    * relational engine gets for free: the predicate joins INTO candidate
    * generation (broadcast query set keyed by attr), so low-selectivity
    * filters shrink the scan instead of post-filtering a top-k that may
    * then come up short. Output: (q_id, vec_id, cosine, rk). */
  def filteredTopK(embeddings: DataFrame, queries: DataFrame, k: Int,
                   attr: String): DataFrame = {
    VectorExpressions.registerAll(embeddings.sparkSession)
    def prep(df: DataFrame) =
      df.select(col("vec_id"), col(attr), asDouble(col("embedding")).as("v"))
        .withColumn("nrm", sqrt(call_function("vec_dot", col("v"), col("v"))))
    val corpus = prep(embeddings)
    val qs = prep(queries).select(col("vec_id").as("q_id"),
      col(attr).as("q_attr"), col("v").as("qv"), col("nrm").as("qnrm"))
    val pairs = corpus.join(broadcast(qs),
        col(attr) === col("q_attr") && col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        cosineFromParts(dotNative(col("v"), col("qv")), col("nrm"),
          col("qnrm")).as("cosine"))
    topK(pairs, k)
  }

  /** Binary-quantized ANN: every vector compresses to 64 sign bits in
    * one BIGINT (bit j set iff v[j+1] > 0), candidates are ranked by
    * HAMMING distance to the query's bits (bit_count(xor) — one codegen'd
    * instruction pair per pair), and only the `nCand` Hamming-nearest
    * are scored with the exact cosine. This is the modern
    * binary-embedding retrieval shape: the corpus scan touches 8 BYTES
    * per vector instead of dims*4, so the pre-filter is memory-bandwidth
    * cheap at billions of vectors, and the exact re-rank restores
    * ranking quality on the short candidate list. Differs from the LSH
    * bucket path (lshTopK): buckets require exact signature equality,
    * Hamming RANKING tolerates any number of flipped bits and needs no
    * probing schedule. Output: (q_id, vec_id, ham, cosine, rk). */
  def binaryHammingRerank(embeddings: DataFrame, queries: DataFrame,
                          k: Int, nCand: Int): DataFrame = {
    val bits = (0 until 64).map { j =>
      when(element_at(col("v"), j + 1) > 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)
    val p = prepared(embeddings).withColumn("bits", bits)
    val qs = prepared(queries).withColumn("bits", bits)
      .select(col("vec_id").as("q_id"), col("v").as("qv"),
        col("nrm").as("qnrm"), col("bits").as("qbits"))
    val wH = Window.partitionBy(col("q_id"))
      .orderBy(col("ham").asc, col("vec_id").asc)
    val cand = p.crossJoin(broadcast(qs))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("ham",
        bit_count(col("bits").bitwiseXOR(col("qbits"))).cast("long"))
      .withColumn("hr", row_number().over(wH))
      .filter(col("hr") <= nCand)
    val wC = Window.partitionBy(col("q_id"))
      .orderBy(col("cosine").desc, col("vec_id").asc)
    cand
      .withColumn("cosine",
        cosineFromParts(dotNative(col("v"), col("qv")), col("nrm"),
          col("qnrm")))
      .withColumn("rk", row_number().over(wC).cast("long"))
      .filter(col("rk") <= k)
      .select(col("q_id"), col("vec_id"), col("ham"), col("cosine"),
        col("rk"))
  }

  /** Maximal Marginal Relevance re-rank (Carbonell & Goldstein, SIGIR
    * 1998): greedily select `k` of the top-`nCand` hits for `queryId`,
    * each step maximizing lambda*rel(c) - (1-lambda)*max sim(c, s) over
    * the already-selected set s — the standard diversity-aware cut of a
    * retrieved candidate list. First pick is the pure-relevance argmax;
    * ties break to the lowest id at every step. Output: (sel_rank,
    * vec_id), 1-based in selection order.
    *
    * Scale shape: candidate retrieval (broadcast query vector,
    * TakeOrdered top-nCand) and the nCand x nCand candidate-pair cosine
    * matrix are distributed; only the greedy selection itself runs on
    * the driver over the collected O(nCand²) matrix (same bounded-
    * collect discipline as the BPE merge table) — MMR is inherently
    * sequential in k and its whole state fits in a few KB at any corpus
    * size because nCand bounds it, not the corpus. */
  def mmrRerank(embeddings: DataFrame, queryId: Long, nCand: Int,
                lambda: Double, k: Int): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val cand = bruteForceTopK(embeddings,
      embeddings.filter(col("vec_id") === queryId), nCand)
      .select(col("vec_id"), col("cosine").as("rel"))
    val rel = cand.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val p = prepared(embeddings)
      .join(broadcast(cand.select(col("vec_id"))), "vec_id")
    val a = p.select(col("vec_id").as("ia"), col("v").as("va"), col("nrm").as("na"))
    val b = p.select(col("vec_id").as("ib"), col("v").as("vb"), col("nrm").as("nb"))
    val sim = a.join(b, col("ia") < col("ib"))
      .select(col("ia"), col("ib"),
        cosineFromParts(dotNative(col("va"), col("vb")), col("na"), col("nb"))
          .as("sim"))
      .collect()
      .flatMap { r =>
        val (x, y, s) = (r.getLong(0), r.getLong(1), r.getDouble(2))
        Seq((x, y) -> s, (y, x) -> s)
      }.toMap
    val ids = rel.keys.toSeq.sorted
    val selected = scala.collection.mutable.ArrayBuffer.empty[Long]
    while (selected.size < math.min(k, ids.size)) {
      val remaining = ids.filterNot(selected.contains)
      val scored = remaining.map { c =>
        val s =
          if (selected.isEmpty) rel(c)
          else lambda * rel(c) -
            (1.0 - lambda) * selected.map(x => sim((c, x))).max
        (s, c)
      }
      // iterate in ascending-id order and require a STRICT improvement to
      // switch, so score ties keep the lowest id (= ORDER BY score DESC,
      // id ASC LIMIT 1)
      selected += scored.reduceLeft((x, y) => if (y._1 > x._1) y else x)._2
    }
    selected.zipWithIndex
      .map { case (id, i) => ((i + 1).toLong, id) }.toSeq
      .toDF("sel_rank", "vec_id")
  }

  /** Deterministic ±1 Johnson–Lindenstrauss sign matrix (the
    * database-friendly Achlioptas 2003 form): S[k][j] = +1 when the top
    * bit of the first byte of md5(str(k*inDims + j)) is 0, else -1.
    * md5 of the decimal string is computable identically in the JVM, in
    * Spark SQL, and in DuckDB, so engine and oracle can each rebuild the
    * SAME matrix independently — no shipped randomness, no seed drift. */
  def jlSignMatrix(inDims: Int, outDims: Int): Array[Array[Double]] =
    Array.tabulate(outDims, inDims) { (k, j) =>
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(String.valueOf(k * inDims + j).getBytes("UTF-8"))
      if ((d(0) & 0x80) == 0) 1.0 else -1.0
    }

  /** Random projection of the embedding column to `outDims` dimensions:
    * pv[k] = dot(v, S_k) / sqrt(outDims) with the [[jlSignMatrix]] rows
    * as literal arrays. By Johnson–Lindenstrauss, pairwise distances are
    * preserved within (1±eps) w.h.p. at outDims = O(log n / eps²) — the
    * standard cheap pre-step before ANN indexing when the raw dimension
    * is large.
    *
    * Scale shape: `outDims` codegen'd vec_dot calls against broadcast-
    * free plan literals — pure row-local projection, ZERO shuffle at any
    * corpus size; cost is linear in rows × inDims × outDims and
    * embarrassingly parallel. Output: (vec_id, v, pv). */
  def randomProject(embeddings: DataFrame, inDims: Int,
                    outDims: Int): DataFrame = {
    VectorExpressions.registerAll(embeddings.sparkSession)
    val sm = jlSignMatrix(inDims, outDims)
    val scale = math.sqrt(outDims.toDouble)
    val comps = (0 until outDims).map { k =>
      call_function("vec_dot", col("v"), typedLit(sm(k).toSeq)) / lit(scale)
    }
    embeddings.select(col("vec_id"), asDouble(col("embedding")).as("v"))
      .select(col("vec_id"), col("v"), array(comps: _*).as("pv"))
  }

  /** Reciprocal-rank fusion (Cormack, Clarke & Buettcher, SIGIR 2009) of
    * two ranked retrieval lists — the standard hybrid-retrieval merge of
    * a lexical (BM25) and a vector (cosine ANN) leg. Inputs are (id, rk)
    * frames with 1-based ranks; output is the top `topN` by
    * rrf = Σ 1/(kConst + rk) over the legs a document appears in
    * (kConst=60 in the paper), carrying both source ranks (null when the
    * doc is absent from that leg).
    *
    * Scale shape: both inputs are already top-K lists (thousands of rows
    * at most — the expensive global ranking happened inside each leg's
    * own TakeOrdered), so the full-outer join and final TakeOrdered here
    * are driver-trivial regardless of corpus size; fusion adds ZERO
    * corpus-scale work. The 1/(kConst+rk) terms are exact IEEE divisions
    * of small integers, so scores are bit-identical across engines and
    * the (rrf desc, id asc) cut is deterministic. */
  def rrfFusion(lexical: DataFrame, vector: DataFrame, kConst: Int,
                topN: Int): DataFrame = {
    val a = lexical.select(col("id"), col("rk").as("rk_lex"))
    val b = vector.select(col("id"), col("rk").as("rk_vec"))
    a.join(b, Seq("id"), "full_outer")
      .select(col("id"),
        (coalesce(lit(1.0) / (lit(kConst) + col("rk_lex")), lit(0.0)) +
         coalesce(lit(1.0) / (lit(kConst) + col("rk_vec")), lit(0.0)))
          .as("rrf"),
        col("rk_lex"), col("rk_vec"))
      .orderBy(col("rrf").desc, col("id").asc)
      .limit(topN)
  }

  /** All XOR masks of Hamming weight < `probes` over `planes` bits, in
    * (weight, numeric) order — mask 0 (the query's own bucket) first.
    * Driver-side enumeration: the mask COUNT (sum of C(planes, w)) is
    * what bounds per-query candidate work, so it is capped explicitly
    * rather than letting a generous probes value silently expand the
    * probe set toward 2^planes. */
  private[graft] def probeMasks(planes: Int, probes: Int): Seq[Long] = {
    require(planes >= 1 && planes <= 62, "planes must be in [1, 62]")
    require(probes >= 1, "probes must be >= 1")
    val masks = (0 until math.min(probes, planes + 1)).flatMap { w =>
      (0 until planes).combinations(w)
        .map(_.map(j => 1L << j).sum).toSeq.sorted
    }
    require(masks.size <= 4096,
      s"probe set too large: ${masks.size} buckets/query " +
        s"(planes=$planes, probes=$probes) — raise planes or lower probes")
    masks
  }

  /** ANN: exact cosine top-k restricted to the query's LSH bucket.
    * `probes = 1` searches only the query's own bucket; `probes = p`
    * additionally probes every bucket within Hamming distance p-1 of
    * the query signature (multiprobe LSH, Lv et al. VLDB 2007: recall
    * recovered by probing near buckets instead of shrinking the index).
    * Probe-set size is sum of C(planes, w) for w < p — the recall dial
    * at corpus scale, now open to any depth under the 4096-bucket
    * candidate-work cap. */
  def lshTopK(embeddings: DataFrame, queries: DataFrame, k: Int,
              planes: Int, probes: Int = 1): DataFrame = {
    val corpus = prepared(embeddings)
      .withColumn("bucket", signBucket(col("v"), planes))
    val qBucket = signBucket(col("v"), planes)
    val probeCols =
      array(probeMasks(planes, probes).map(m =>
        if (m == 0L) qBucket else qBucket.bitwiseXOR(lit(m))): _*)
    val qs = prepared(queries)
      .select(col("vec_id").as("q_id"), col("v").as("qv"),
        col("nrm").as("qnrm"), explode(probeCols).as("bucket"))
    val pairs = corpus.join(broadcast(qs), "bucket")
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        cosineFromParts(dotNative(col("v"), col("qv")), col("nrm"), col("qnrm"))
          .as("cosine"))
    topK(pairs, k)
  }

  // ------------------------------------------------------------------
  // Product quantization (Jégou et al. TPAMI 2011): vectors split into
  // m subvectors, each encoded as its nearest sub-centroid id — D
  // doubles compress to m small codes, and queries score the whole
  // corpus through an m×k lookup table (asymmetric distance, ADC)
  // without touching raw vectors. The memory/bandwidth story IS the
  // 100 TB story: a billion 64-dim vectors are 512 GB raw but 4 GB as
  // m=4 byte codes, and the scoring scan reads only codes. Codebook
  // TRAINING is the c-family's Lloyd loop run per subspace (offline);
  // here the codebook is the deterministic first-k seed convention so
  // the encode/ADC contract is oracle-replayable.
  // ------------------------------------------------------------------

  /** corpus exploded to (vec_id, sub, sv): row-local, no shuffle.
    * normalize=true divides by the L2 norm BEFORE slicing — the
    * cosine-metric PQ convention (normalized L2² = 2 − 2·cos, monotone
    * in cosine, so ADC ranking aligns with the exact-cosine gates). */
  private def subVectorsOf(emb: DataFrame, m: Int, subDim: Int,
                           normalize: Boolean): DataFrame = {
    val base = prepared(emb)
    val vv = if (normalize) expr("transform(v, x -> x / nrm)") else col("v")
    base.select(col("vec_id"), vv.as("v"))
      .select(col("vec_id"), explode(sequence(lit(0), lit(m - 1))).as("sub"),
        col("v"))
      .select(col("vec_id"), col("sub"),
        expr(s"slice(v, sub * $subDim + 1, $subDim)").as("sv"))
  }

  private def subVectors(emb: DataFrame, m: Int, subDim: Int): DataFrame =
    subVectorsOf(emb, m, subDim, normalize = false)

  /** deterministic seed codebook: (sub, cell, cv), m × nCodes rows —
    * tiny at any corpus size, always broadcast */
  def pqCodebook(emb: DataFrame, m: Int, subDim: Int, nCodes: Int): DataFrame =
    subVectors(emb.filter(col("vec_id") < nCodes), m, subDim)
      .select(col("sub"), col("vec_id").as("cell"), col("sv").as("cv"))

  /** PQ encode: per (vector, subspace) the argmin sub-centroid (d2 asc,
    * cell asc — a total order). One broadcast join + one map-side-
    * combined shuffle keyed by (vec_id, sub); output is m codes + the
    * per-subspace quantization error. */
  def pqEncode(emb: DataFrame, codebook: DataFrame, m: Int, subDim: Int): DataFrame =
    subVectors(emb, m, subDim)
      .join(broadcast(codebook), Seq("sub"))
      .withColumn("d2", call_function("vec_l2sq", col("sv"), col("cv")))
      .groupBy(col("vec_id"), col("sub"))
      .agg(min(struct(col("d2"), col("cell"))).as("best"))
      .select(col("vec_id"), col("sub"), col("best.cell").as("code"),
        col("best.d2").as("qerr2"))

  /** Composed IVF-PQ search (Jégou, Douze & Schmid, "Product
    * Quantization for Nearest Neighbor Search", TPAMI 2011 — the FAISS
    * IVFPQ shape): the query probes its `nProbe` nearest coarse cells
    * (the trained-IVF half, s20), and ONLY the codes of vectors living
    * in those cells are ADC-scored against the query's per-subspace
    * distance table (the PQ half, s15). This is the production
    * billion-vector index: per query the corpus-side work is
    * |corpus| * nProbe / nCells CODE rows (m small ints per vector,
    * bytes in a real layout — never raw vectors), and everything
    * query-sized (probe list, m×nCodes distance table) is broadcast.
    * The cell assignment and code table are index-build artifacts —
    * computed once here for self-containment, precomputed offline in a
    * deployment — joined key-by-vec_id (co-partitioned single shuffle).
    * ADC sums are integer-quantized (floor(x*1e9+0.5)) so ranking is
    * aggregation-order-free and the oracle replays it bit-for-bit.
    *
    * ADC is a PRE-RANKER here, not the final order: the `refine`
    * ADC-nearest candidates per query are re-ranked by exact cosine
    * (the FAISS IndexRefineFlat composition). That refinement is what
    * makes the index usable on isotropic/near-random corpora — this
    * fixture's top-5 cosine margins are ~0.01 while even a 256-code
    * seed codebook's quantization noise dwarfs that (pure-ADC recall
    * 0.12–0.28 in the round-11 probe, and more codes did NOT help), so
    * raw vectors are fetched for `refine` rows per query (bounded,
    * broadcast-joined) and recall climbs back to the flat-IVF band
    * (spec-pinned). Sub-vectors are L2-NORMALIZED before encoding
    * (cosine-metric PQ: normalized L2² = 2 − 2·cos). */
  def ivfPqTopK(embeddings: DataFrame, queries: DataFrame, k: Int,
                cents: DataFrame, nProbe: Int,
                m: Int, subDim: Int, nCodes: Int,
                refine: Int = 64): DataFrame = {
    // NORMALIZED sub-vectors on both sides (cosine-metric PQ): raw-L2
    // ADC would rank by a metric the exact-cosine gates don't use, and
    // on this corpus (unnormalized embeddings) that metric mismatch —
    // not quantization — collapsed recall to 0.24 vs flat-IVF's 0.92
    // in the round-11 probe; normalized it is quantization-only
    val subsAll = subVectorsOf(embeddings, m, subDim, normalize = true)
    val cb = subsAll.filter(col("vec_id") < nCodes)
      .select(col("sub"), col("vec_id").as("cell"), col("sv").as("cv"))
    val codes = subsAll
      .join(broadcast(cb), Seq("sub"))
      .withColumn("d2", call_function("vec_l2sq", col("sv"), col("cv")))
      .groupBy(col("vec_id"), col("sub"))
      .agg(min(struct(col("d2"), col("cell"))).as("best"))
      .select(col("vec_id"), col("sub"), col("best.cell").as("code"))
    val cells = assignCells(prepared(embeddings), cents, take = 1)
      .select(col("vec_id"), col("cell"))
    val qcells = assignCells(prepared(queries), cents, take = nProbe)
      .select(col("vec_id").as("q_id"), col("cell"))
    val qdist = subVectorsOf(queries, m, subDim, normalize = true)
      .select(col("vec_id").as("q_id"), col("sub"), col("sv"))
      .join(broadcast(cb), Seq("sub"))
      .select(col("q_id"), col("sub"), col("cell").as("code"),
        floor(call_function("vec_l2sq", col("sv"), col("cv")) * lit(1e9)
          + lit(0.5)).as("dq"))
    val wAdc = Window.partitionBy(col("q_id"))
      .orderBy(col("adc_q").asc, col("vec_id").asc)
    val shortlist = codes.join(cells, Seq("vec_id"))
      .join(broadcast(qcells), Seq("cell"))
      .filter(col("vec_id") =!= col("q_id"))
      .join(broadcast(qdist), Seq("q_id", "sub", "code"))
      .groupBy(col("q_id"), col("vec_id"))
      .agg(sum(col("dq")).as("adc_q"))
      .withColumn("ar", row_number().over(wAdc))
      .filter(col("ar") <= refine)
    // exact re-rank of the bounded shortlist: raw vectors join by
    // vec_id (refine rows per query — the only place full vectors are
    // read), query vectors broadcast
    val corpus = prepared(embeddings).select(col("vec_id"), col("v"),
      col("nrm"))
    val qvec = prepared(queries).select(col("vec_id").as("q_id"),
      col("v").as("qv"), col("nrm").as("qnrm"))
    val wCos = Window.partitionBy(col("q_id"))
      .orderBy(col("cosine").desc, col("vec_id").asc)
    shortlist.join(corpus, Seq("vec_id"))
      .join(broadcast(qvec), Seq("q_id"))
      .select(col("q_id"), col("vec_id"),
        (col("adc_q").cast("double") / lit(1e9)).as("adc"),
        cosineFromParts(dotNative(col("v"), col("qv")), col("nrm"),
          col("qnrm")).as("cosine"))
      .withColumn("rk", row_number().over(wCos).cast("long"))
      .filter(col("rk") <= k)
  }

  /** The s25 recall-curve shape: ONE shared index build (cells, codes,
    * ADC sums at the DEEPEST probe depth), then each curve point is a
    * filter + rank over the shared candidate frame — never a rebuild
    * per branch. Works because a corpus vector lives in exactly one
    * cell, so a candidate (q, x) belongs to depth p iff the rank of
    * cell(x) in q's probe order is <= p: compute every candidate once
    * at max(probes) tagged with that rank, and each depth is
    * `filter(pr <= p)` before its refine cut. The shared frame is
    * persisted (caller-owned cache, the [[DedupOps.containmentPairs]]
    * contract). Returns (probeDepth, topK frame) per requested depth —
    * each frame identical to [[ivfPqTopK]] at that depth
    * (spec-asserted). */
  def ivfPqBranches(embeddings: DataFrame, queries: DataFrame, k: Int,
                    cents: DataFrame, probes: Seq[Int],
                    m: Int, subDim: Int, nCodes: Int,
                    refine: Int = 64): Seq[(Int, DataFrame)] = {
    require(probes.nonEmpty && probes.forall(_ >= 1))
    val maxP = probes.max
    val subsAll = subVectorsOf(embeddings, m, subDim, normalize = true)
    val cb = subsAll.filter(col("vec_id") < nCodes)
      .select(col("sub"), col("vec_id").as("cell"), col("sv").as("cv"))
    val codes = subsAll
      .join(broadcast(cb), Seq("sub"))
      .withColumn("d2", call_function("vec_l2sq", col("sv"), col("cv")))
      .groupBy(col("vec_id"), col("sub"))
      .agg(min(struct(col("d2"), col("cell"))).as("best"))
      .select(col("vec_id"), col("sub"), col("best.cell").as("code"))
    val cells = assignCells(prepared(embeddings), cents, take = 1)
      .select(col("vec_id"), col("cell"))
    // probe list with the probe RANK retained (assignCells drops it)
    val qc = {
      val w = Window.partitionBy(col("vec_id"))
        .orderBy(col("d2").asc, col("cell").asc)
      prepared(queries).crossJoin(broadcast(cents))
        .withColumn("d2", call_function("vec_l2sq", col("v"), col("cv")))
        .withColumn("pr", row_number().over(w))
        .filter(col("pr") <= maxP)
        .select(col("vec_id").as("q_id"), col("cell"), col("pr"))
    }
    val qdist = subVectorsOf(queries, m, subDim, normalize = true)
      .select(col("vec_id").as("q_id"), col("sub"), col("sv"))
      .join(broadcast(cb), Seq("sub"))
      .select(col("q_id"), col("sub"), col("cell").as("code"),
        floor(call_function("vec_l2sq", col("sv"), col("cv")) * lit(1e9)
          + lit(0.5)).as("dq"))
    val adc = codes.join(cells, Seq("vec_id"))
      .join(broadcast(qc), Seq("cell"))
      .filter(col("vec_id") =!= col("q_id"))
      .join(broadcast(qdist), Seq("q_id", "sub", "code"))
      .groupBy(col("q_id"), col("vec_id"))
      // pr is constant within the group (one cell per corpus vector)
      .agg(sum(col("dq")).as("adc_q"), min(col("pr")).as("pr"))
      // cache lifecycle: CALLER-owned — clearCache()/unpersist after the action (DedupOps class doc)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val corpus = prepared(embeddings).select(col("vec_id"), col("v"),
      col("nrm"))
    val qvec = prepared(queries).select(col("vec_id").as("q_id"),
      col("v").as("qv"), col("nrm").as("qnrm"))
    probes.map { p =>
      val wAdc = Window.partitionBy(col("q_id"))
        .orderBy(col("adc_q").asc, col("vec_id").asc)
      val wCos = Window.partitionBy(col("q_id"))
        .orderBy(col("cosine").desc, col("vec_id").asc)
      val top = adc.filter(col("pr") <= p)
        .withColumn("ar", row_number().over(wAdc))
        .filter(col("ar") <= refine)
        .join(corpus, Seq("vec_id"))
        .join(broadcast(qvec), Seq("q_id"))
        .select(col("q_id"), col("vec_id"),
          (col("adc_q").cast("double") / lit(1e9)).as("adc"),
          cosineFromParts(dotNative(col("v"), col("qv")), col("nrm"),
            col("qnrm")).as("cosine"))
        .withColumn("rk", row_number().over(wCos).cast("long"))
        .filter(col("rk") <= k)
      (p, top)
    }
  }

  /** ADC top-k: the query's m×nCodes distance table (integer-quantized
    * by floor(x*1e9 + 0.5) so the per-vector sum is exact and
    * aggregation-order-free) joins the code table on (sub, code) — the
    * corpus-side scan touches CODES only, never raw vectors. Per-query
    * ranking is a keyed window, never a global sort. */
  def pqAdcTopK(emb: DataFrame, queries: DataFrame, k: Int, m: Int,
                subDim: Int, nCodes: Int): DataFrame = {
    val cb = pqCodebook(emb, m, subDim, nCodes)
    val codes = pqEncode(emb, cb, m, subDim)
    val qdist = subVectors(queries, m, subDim)
      .select(col("vec_id").as("q_id"), col("sub"), col("sv"))
      .join(cb, Seq("sub"))
      .select(col("q_id"), col("sub"), col("cell"),
        floor(call_function("vec_l2sq", col("sv"), col("cv")) * lit(1e9)
          + lit(0.5)).as("dq"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("adc_q").asc, col("vec_id").asc)
    codes.join(broadcast(qdist),
        codes("sub") === qdist("sub") && codes("code") === qdist("cell"))
      .filter(col("vec_id") =!= col("q_id"))
      .groupBy(col("q_id"), col("vec_id"))
      .agg(sum(col("dq")).as("adc_q"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
      .select(col("q_id"), col("vec_id"),
        (col("adc_q").cast("double") / lit(1e9)).as("adc"), col("rk"))
  }

  /** Deterministic NEGATIVE SAMPLING for contrastive training: for each
    * anchor doc, `k` pseudo-random negatives drawn from the corpus,
    * EXCLUDING the anchor itself and its known positives (near-dup
    * pairs — sampling a near-duplicate as a "negative" teaches the
    * model to push twins apart).
    *
    * The naive formulation ranks md5(anchor, candidate) over ALL pairs —
    * an all-pairs join, the shape this engine never materializes.
    * Instead each anchor makes `k + oversample` independent DRAWS into a
    * globally ROW-NUMBERED corpus ([[graft.operators.IndexOps
    * .globalRowIndex]]'s range-partition + offsets — no one-task sort):
    * draw j lands on position md5long(seed:anchor:j) mod N, one
    * equi-join on position resolves it to a doc, exclusions filter
    * (self by predicate, positives by LEFT ANTI on the pair key), and a
    * per-anchor window keeps the first `k` surviving draws in draw
    * order. Cost: anchors × (k+oversample) rows through ONE keyed join —
    * linear, never all-pairs. Oversample covers exclusion losses: the
    * chance a uniform draw hits the tiny excluded set is |excl|/N, so a
    * few spare draws make a short sample set vanishingly rare (callers
    * needing a HARD guarantee re-draw the rare short anchors).
    *
    * md5long = first 15 hex chars of md5 as a bigint (the d21 gid
    * construction) — portable, so an independent engine replays the
    * exact sample. Draw order (not hash order) ranks the keeps: a draw
    * is already uniform, and ranking by j keeps the per-anchor window
    * bounded by k+oversample rows.
    *
    * Output: (doc_id, neg_id, draw) with draw = the 0-based surviving
    * draw index. */
  def negativeSample(docs: DataFrame, positives: DataFrame, k: Int,
                     seed: Long, oversample: Int = 8): DataFrame = {
    require(k >= 1 && oversample >= 0)
    val idx = graft.operators.IndexOps.globalRowIndex(
      docs.select(col("doc_id")), Seq(col("doc_id")), "pos")
    // corpus size: driver-side metadata scalar (same lifecycle as the
    // offsets inside globalRowIndex itself)
    val n = idx.agg(coalesce(max(col("pos")), lit(-1L)))
      .collect()(0).getLong(0) + 1L
    require(n > 0, "negativeSample needs a non-empty corpus")
    val draws = docs.select(col("doc_id"))
      .select(col("doc_id"),
        explode(sequence(lit(0), lit(k + oversample - 1))).as("j"))
      .select(col("doc_id"), col("j"),
        pmod(conv(substring(md5(concat(lit(seed.toString), lit(":"),
          col("doc_id").cast("string"), lit(":"), col("j").cast("string"))
          .cast("binary")), 1, 15), 16, 10).cast("long"), lit(n)).as("pos"))
    val resolved = draws.as("dr")
      .join(idx.as("ix"), col("dr.pos") === col("ix.pos"))
      .select(col("dr.doc_id").as("doc_id"), col("dr.j").as("j"),
        col("ix.doc_id").as("neg_id"))
      .filter(col("neg_id") =!= col("doc_id"))
    // positives are excluded in BOTH orientations
    val excl = positives.select(col("doc_a"), col("doc_b"))
      .union(positives.select(col("doc_b"), col("doc_a")))
      .toDF("doc_id", "neg_id")
    val w = Window.partitionBy(col("doc_id")).orderBy(col("j").asc)
    resolved.join(excl, Seq("doc_id", "neg_id"), "left_anti")
      // draws are WITH replacement (independent hashes mod N can
      // collide), so the same candidate can arrive under two draw
      // indices — dedup to its EARLIEST draw before ranking, or an
      // anchor's k slots could hand contrastive training the same
      // negative twice
      .groupBy(col("doc_id"), col("neg_id"))
      .agg(min(col("j")).as("j"))
      .withColumn("draw", row_number().over(w).cast("long") - 1L)
      .filter(col("draw") < k)
      .select(col("doc_id"), col("neg_id"), col("draw"))
  }
}
