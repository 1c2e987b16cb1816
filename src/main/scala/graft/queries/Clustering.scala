package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.io.Tables
import graft.operators.SimilarityOps

/** Clustering analytics over `embeddings` — the k-means training the
  * IVF index docstring defers to ("a production index would k-means-train
  * these offline") plus nearest-centroid evaluation, as gate-checked
  * distributed operators.
  *
  * Assignment is the IVF shape: broadcast the centroid table, argmin by
  * L2 via a partial-aggregated min-struct — one shuffle keyed by vec_id,
  * linear in corpus size. Per-cluster means go through DECIMAL sums so
  * the oracle's aggregation order cannot change the result (double sums
  * are order-sensitive; decimal sums are exact and commutative); that
  * exactness is what lets c03 iterate — every derived centroid
  * coordinate is bit-identical on both sides, so the NEXT assignment
  * round agrees too, and the whole fixed-point replay stays hash-exact.
  *
  * At 100 TB: the corpus frame is persisted once and each Lloyd pass is
  * one broadcast-join scan + one keyed shuffle; centroids (k × dims
  * doubles) never leave the plan, there is no per-iteration driver
  * collect, and the iteration count is FIXED (deterministic replay — a
  * convergence threshold would be data-dependent and un-replayable by
  * the SQL oracle).
  */
object Clustering {

  /** nearest-centroid assignment: one broadcast join + one keyed
    * min-struct aggregation. Output: (vec_id, cell, d2, v) — d2 kept so
    * callers can compute the within-cluster SSE of a pass for free. */
  private[graft] def assignTo(emb: DataFrame, cents: DataFrame): DataFrame =
    emb.crossJoin(broadcast(cents))
      .withColumn("d2", call_function("vec_l2sq", col("v"), col("cv")))
      .groupBy(col("vec_id"))
      .agg(min(struct(col("d2"), col("cell"))).as("best"),
        first(col("v")).as("v"))
      .select(col("vec_id"), col("best.cell").as("cell"),
        col("best.d2").as("d2"), col("v"))

  /** Lloyd centroid refresh: exact decimal per-(cell, dim) means,
    * reassembled into ordered vectors. Empty cells vanish (the classic
    * k-means empty-cluster case) — the oracle replay does the same. */
  private[graft] def refreshCentroids(assigned: DataFrame): DataFrame =
    assigned
      .select(col("cell"), posexplode(col("v")).as(Seq("dim", "coord")))
      .groupBy(col("cell"), col("dim"))
      .agg((sum(col("coord").cast("decimal(18,9)")).cast("double") /
        count(lit(1))).as("m"))
      .groupBy(col("cell"))
      .agg(array_sort(collect_list(struct(col("dim"), col("m")))).as("dm"))
      .select(col("cell"), expr("transform(dm, x -> x.m)").as("cv"))

  /** the first-k deterministic seed centroids */
  private def seeds(emb: DataFrame, k: Int): DataFrame =
    emb.filter(col("vec_id") < k)
      .select(col("vec_id").as("cell"), col("v").as("cv"))

  /** corpus as (vec_id, v: array<double>) */
  private[graft] def corpus(s: SparkSession, d: String): DataFrame =
    SimilarityOps.prepared(Tables.embeddings(s, d))
      .select(col("vec_id"), col("v"))

  /** assignment passes a_0 .. a_{iters-1}: a_0 against the seed
    * centroids, each later pass against the refresh of the previous
    * assignment. All lazy — one DAG, no driver-side data movement. */
  private[graft] def lloydPasses(emb: DataFrame, k: Int, iters: Int): Seq[DataFrame] = {
    require(iters >= 1)
    Iterator.iterate(assignTo(emb, seeds(emb, k))) { a =>
      assignTo(emb, refreshCentroids(a))
    }.take(iters).toSeq
  }

  /** first-4-dimensions summary of an assignment (the c01/c03 report):
    * member counts and exact decimal-summed coordinate means per cell */
  private def report4(a: DataFrame): DataFrame =
    a.select(col("cell"), explode(array((0 until 4).map(lit): _*)).as("dim"),
        col("v"))
      .withColumn("coord", element_at(col("v"), col("dim") + 1))
      .groupBy(col("cell"), col("dim").cast("long").as("dim"))
      .agg(count(lit(1)).as("n_members"),
        sum(col("coord").cast("decimal(18,9)")).cast("double").as("sum_coord"))
      .withColumn("mean_coord", col("sum_coord") / col("n_members"))

  private def l2sqSql(a: String, b: String) =
    s"""list_reduce(list_prepend(0.0,
       list_transform(range(1, len($a) + 1),
         i -> ($a[i] - $b[i]) * ($a[i] - $b[i]))),
       (x, y) -> x + y)"""

  /** CTE chain replaying `iters` Lloyd passes: c0 = seeds, a_i = argmin
    * assignment against c_i, c_{i+1} = exact decimal centroid refresh of
    * a_i. The double arithmetic matches Spark bit-for-bit: left-fold L2
    * sums on both sides, decimal-exact means, ties broken by cell. */
  private def lloydCte(k: Int, iters: Int): String =
    s"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) v FROM embeddings)""" +
      lloydBodySql(k, iters)

  /** the Lloyd CTE chain without the WITH prelude — for oracles (s20)
    * that already define `e` (e.g. via the norm prelude) and append the
    * trained centroids as a further CTE. */
  private[graft] def lloydBodySql(k: Int, iters: Int): String = {
    val sb = new StringBuilder(s""",
    c0 AS (SELECT vec_id AS cell, v AS cv FROM e WHERE vec_id < $k)""")
    for (i <- 0 until iters) {
      sb ++= s""",
    d$i AS (SELECT e.vec_id, c$i.cell, ${l2sqSql("e.v", s"c$i.cv")} AS d2
            FROM e, c$i),
    a$i AS (SELECT vec_id, cell FROM (
              SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                ORDER BY d2 ASC, cell ASC) AS rk FROM d$i)
            WHERE rk = 1)"""
      if (i < iters - 1) sb ++= s""",
    c${i + 1} AS (SELECT cell, list(m ORDER BY dim) AS cv FROM (
              SELECT a.cell, t.dim AS dim,
                CAST(SUM(CAST(e.v[t.dim] AS DECIMAL(18,9))) AS DOUBLE)
                  / COUNT(*) AS m
              FROM a$i a JOIN e USING (vec_id)
              CROSS JOIN UNNEST(range(1, len(e.v) + 1)) AS t(dim)
              GROUP BY a.cell, t.dim) GROUP BY cell)"""
    }
    sb.toString
  }

  private def report4Sql(a: String) = s"""
    , m AS (SELECT $a.cell, t.dim, e.v[t.dim + 1] AS coord
            FROM $a JOIN e USING (vec_id)
            CROSS JOIN (VALUES (0), (1), (2), (3)) t(dim))
    SELECT cell, CAST(dim AS BIGINT) AS dim, COUNT(*) AS n_members,
      CAST(SUM(CAST(coord AS DECIMAL(18,9))) AS DOUBLE) AS sum_coord,
      CAST(SUM(CAST(coord AS DECIMAL(18,9))) AS DOUBLE) / COUNT(*)
        AS mean_coord
    FROM m GROUP BY cell, dim"""

  val qs: Seq[Q] = Seq(

    // ---- one Lloyd update step (assignment + per-cluster means) ---------
    //      reported for the first 4 dimensions: member counts and exact
    //      decimal-summed coordinate means — the centroid refresh an IVF
    //      index runs offline, expressed as broadcast-argmin + one keyed
    //      aggregation (no per-iteration driver involvement)
    Q("c01_kmeans_step",
      (s, d) => report4(lloydPasses(corpus(s, d), k = 8, iters = 1).last),
      Some(lloydCte(8, 1) + report4Sql("a0"))),

    // ---- nearest-centroid confusion vs the true labels ------------------
    //      the evaluation step of centroid-based classification/indexing:
    //      how each labeled class distributes over the 8 seed cells
    Q("c02_centroid_confusion",
      (s, d) => lloydPasses(corpus(s, d), k = 8, iters = 1).last
        .join(Tables.embeddings(s, d).select(col("vec_id"),
          col("label").cast("long").as("label")), "vec_id")
        .groupBy(col("label"), col("cell"))
        .agg(count(lit(1)).as("n")),
      Some(lloydCte(8, 1) + """
        SELECT CAST(label AS BIGINT) AS label, cell, COUNT(*) AS n
        FROM a0 JOIN embeddings USING (vec_id)
        GROUP BY 1, 2""")),

    // ---- convergent k-means: 3 full Lloyd passes -------------------------
    //      assignment -> exact-decimal centroid refresh -> reassignment,
    //      twice over, then the same 4-dim report as c01 — the offline
    //      IVF training loop end to end. The corpus frame is persisted
    //      for the duration (each pass re-scans it); KMeansSpec pins the
    //      monotone non-increasing within-cluster SSE across the passes.
    Q("c03_kmeans_converged",
      (s, d) => {
        val emb = corpus(s, d)
          // cache lifecycle: CALLER-owned — clearCache()/unpersist after the action (DedupOps class doc)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        report4(lloydPasses(emb, k = 8, iters = 3).last)
      },
      Some(lloydCte(8, 3) + report4Sql("a2"))),

    // ---- inference: per-cluster distortion of the trained index ---------
    //      the serving-side read of c03's training loop: assign the
    //      corpus to the final centroids and report each cell's size and
    //      within-cluster SSE — the number an IVF index operator watches
    //      to decide when to re-train. Same broadcast-argmin shape as
    //      every assignment pass; the SSE sum goes through decimal so
    //      the per-cell totals are aggregation-order-exact.
    Q("c04_assignment_distortion",
      (s, d) => {
        val emb = corpus(s, d)
          // cache lifecycle: CALLER-owned — clearCache()/unpersist after the action (DedupOps class doc)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        lloydPasses(emb, k = 8, iters = 3).last
          .groupBy(col("cell"))
          .agg(count(lit(1)).as("n_members"),
            // d2 is quantized by floor(d2 * 1e9), NOT a decimal cast:
            // cast rounds HALF_UP off the shortest decimal rendering on
            // the JVM but off the exact binary value in DuckDB, and the
            // two disagree exactly at rendered ...5 midpoints (observed
            // at sf0.01). floor of the identical IEEE product is the
            // same integer on both engines, and the integers sum exactly
            // inside decimal.
            (sum(floor(col("d2") * 1e9).cast("decimal(38,0)"))
              .cast("double") / 1e9).as("sse"))
      },
      Some(lloydCte(8, 3) + """
        , best AS (SELECT vec_id, cell, d2 FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
              ORDER BY d2 ASC, cell ASC) AS rk FROM d2)
            WHERE rk = 1)
        SELECT cell, COUNT(*) AS n_members,
          CAST(SUM(CAST(FLOOR(d2 * 1e9) AS DECIMAL(38,0))) AS DOUBLE) / 1e9
            AS sse
        FROM best GROUP BY cell""")),

    // ---- minibatch k-means: train on a sample, assign the corpus --------
    //      the 100 TB k-means practice: the Lloyd refresh runs over a
    //      deterministic 25% hash sample (the q34 portable md5 cut — any
    //      engine draws the identical sample), then the refreshed
    //      centroids assign the FULL corpus. Training cost scales with
    //      the sample, assignment stays one broadcast-join scan; the
    //      report is the full-corpus member counts + quantized SSE
    //      (the c04 floor(d2*1e9) discipline).
    Q("c06_minibatch_kmeans",
      (s, d) => {
        val e = corpus(s, d)
        val smp = e.filter(
          md5(col("vec_id").cast("string").cast("binary"))
            < lit("4" + "0" * 31))
        val a1 = assignTo(e, refreshCentroids(assignTo(smp, seeds(e, 8))))
        a1.groupBy(col("cell"))
          .agg(count(lit(1)).as("n_members"),
            (sum(floor(col("d2") * 1e9).cast("decimal(38,0)"))
              .cast("double") / 1e9).as("sse"))
      },
      Some(s"""
        WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) v
                   FROM embeddings),
        smp AS (SELECT * FROM e WHERE md5(CAST(vec_id AS VARCHAR))
                < '40000000000000000000000000000000'),
        c0 AS (SELECT vec_id AS cell, v AS cv FROM e WHERE vec_id < 8),
        d0 AS (SELECT smp.vec_id, c0.cell,
                 ${l2sqSql("smp.v", "c0.cv")} AS d2
               FROM smp, c0),
        a0 AS (SELECT vec_id, cell FROM (
                 SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                   ORDER BY d2 ASC, cell ASC) AS rk FROM d0)
               WHERE rk = 1),
        c1 AS (SELECT cell, list(m ORDER BY dim) AS cv FROM (
                 SELECT a.cell, t.dim AS dim,
                   CAST(SUM(CAST(e.v[t.dim] AS DECIMAL(18,9))) AS DOUBLE)
                     / COUNT(*) AS m
                 FROM a0 a JOIN e USING (vec_id)
                 CROSS JOIN UNNEST(range(1, len(e.v) + 1)) AS t(dim)
                 GROUP BY a.cell, t.dim) GROUP BY cell),
        d1 AS (SELECT e.vec_id, c1.cell,
                 ${l2sqSql("e.v", "c1.cv")} AS d2
               FROM e, c1),
        a1 AS (SELECT vec_id, cell, d2 FROM (
                 SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                   ORDER BY d2 ASC, cell ASC) AS rk FROM d1)
               WHERE rk = 1)
        SELECT cell, COUNT(*) AS n_members,
          CAST(SUM(CAST(FLOOR(d2 * 1e9) AS DECIMAL(38,0))) AS DOUBLE) / 1e9
            AS sse
        FROM a1 GROUP BY cell""")),

    // ---- farthest-point seeding (deterministic k-means++ skeleton) ------
    //      the init step the Lloyd queries' first-k seeds stand in for:
    //      start from vec 0, then 3x pick the vector farthest from the
    //      chosen set (argmax of running min-distance, ties to the
    //      smaller id — a total order, unlike kmeans++'s sampling).
    //      FULLY lazy: each argmax is a TakeOrdered(1) plan node feeding
    //      the next round's broadcast, the running min-distance evolves
    //      via least() (exact, order-free), and no seed ever visits the
    //      driver. Reported as member counts of the induced assignment.
    Q("c05_farthest_seeds",
      (s, d) => {
        val e = corpus(s, d)
        def l2(a: Column, b: Column) = call_function("vec_l2sq", a, b)
        val s0 = e.filter(col("vec_id") === 0)
          .select(col("vec_id").as("seed_id"), col("v").as("sv"))
        var seeds = s0
        var md = e.crossJoin(broadcast(s0.select(col("sv"))))
          .select(col("vec_id"), col("v"), l2(col("v"), col("sv")).as("md"))
        for (_ <- 1 to 3) {
          val nxt = md.orderBy(col("md").desc, col("vec_id").asc).limit(1)
            .select(col("vec_id").as("seed_id"), col("v").as("sv"))
          seeds = seeds.unionByName(nxt)
          md = md.crossJoin(broadcast(nxt.select(col("sv"))))
            .select(col("vec_id"), col("v"),
              least(col("md"), l2(col("v"), col("sv"))).as("md"))
        }
        e.crossJoin(broadcast(seeds))
          .select(col("vec_id"),
            struct(l2(col("v"), col("sv")).as("d2"), col("seed_id")).as("c"))
          .groupBy(col("vec_id"))
          .agg(min(col("c")).as("best"))
          .groupBy(col("best.seed_id").as("seed_id"))
          .agg(count(lit(1)).as("n_assigned"))
      },
      Some(s"""
        WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) v
                   FROM embeddings),
        s0 AS (SELECT vec_id AS seed_id, v AS sv FROM e WHERE vec_id = 0),
        m0 AS (SELECT e.vec_id, e.v, ${l2sqSql("e.v", "s0.sv")} AS md
               FROM e, s0),
        s1 AS (SELECT vec_id AS seed_id, v AS sv FROM m0
               ORDER BY md DESC, vec_id ASC LIMIT 1),
        m1 AS (SELECT m0.vec_id, m0.v,
                 LEAST(m0.md, ${l2sqSql("m0.v", "s1.sv")}) AS md
               FROM m0, s1),
        s2 AS (SELECT vec_id AS seed_id, v AS sv FROM m1
               ORDER BY md DESC, vec_id ASC LIMIT 1),
        m2 AS (SELECT m1.vec_id, m1.v,
                 LEAST(m1.md, ${l2sqSql("m1.v", "s2.sv")}) AS md
               FROM m1, s2),
        s3 AS (SELECT vec_id AS seed_id, v AS sv FROM m2
               ORDER BY md DESC, vec_id ASC LIMIT 1),
        seeds AS (SELECT * FROM s0 UNION ALL SELECT * FROM s1
                  UNION ALL SELECT * FROM s2 UNION ALL SELECT * FROM s3),
        d AS (SELECT e.vec_id, seeds.seed_id,
                ${l2sqSql("e.v", "seeds.sv")} AS d2
              FROM e, seeds),
        best AS (SELECT vec_id, seed_id FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
              ORDER BY d2 ASC, seed_id ASC) AS rk FROM d)
          WHERE rk = 1)
        SELECT seed_id, COUNT(*) AS n_assigned
        FROM best GROUP BY seed_id""")),

    // ---- simplified silhouette (centroid form) --------------------------
    //      the clustering-quality score an index trainer gates retraining
    //      on: per point, a = distance to its own (nearest) centroid and
    //      b = distance to the second-nearest, s = (b - a) / b (the
    //      centroid-based simplification of Rousseeuw's silhouette —
    //      full silhouette is all-pairs within clusters, quadratic and
    //      never run at corpus scale). With argmin assignment a <= b
    //      always, so max(a, b) = b. One broadcast of the k centroids,
    //      one shuffle keyed by vec_id for the per-point top-2 — the
    //      same shape and cost as an assignment pass, linear at 100 TB.
    //      Per-point scores are quantized by floor(s*1e9 + 0.5) (pure
    //      IEEE ops, identical on both engines) and summed as exact
    //      integers, so the per-cell mean is aggregation-order-free.
    Q("c07_silhouette",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val emb = corpus(s, d)
        val cents = seeds(emb, 8)
        val w = Window.partitionBy(col("vec_id"))
          .orderBy(col("d2").asc, col("cell").asc)
        val top2 = emb.crossJoin(broadcast(cents))
          .withColumn("d2", call_function("vec_l2sq", col("v"), col("cv")))
          .withColumn("rk", row_number().over(w))
          .filter(col("rk") <= 2)
        top2.groupBy(col("vec_id"))
          .agg(min(when(col("rk") === 1, col("cell"))).as("cell"),
            min(when(col("rk") === 1, col("d2"))).as("a2"),
            min(when(col("rk") === 2, col("d2"))).as("b2"))
          .select(col("cell"),
            floor((sqrt(col("b2")) - sqrt(col("a2"))) / sqrt(col("b2"))
              * lit(1e9) + lit(0.5)).as("sq"))
          .groupBy(col("cell"))
          .agg(count(lit(1)).as("n_members"),
            sum(col("sq")).as("sum_sil_q"),
            (sum(col("sq")).cast("double") / lit(1e9) / count(lit(1)))
              .as("mean_sil"))
      },
      Some(s"""
        WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) v
                   FROM embeddings),
        c0 AS (SELECT vec_id AS cell, v AS cv FROM e WHERE vec_id < 8),
        dd AS (SELECT e.vec_id, c0.cell, ${l2sqSql("e.v", "c0.cv")} AS d2
               FROM e, c0),
        p AS (SELECT vec_id,
                MIN(CASE WHEN rk = 1 THEN cell END) AS cell,
                MIN(CASE WHEN rk = 1 THEN d2 END) AS a2,
                MIN(CASE WHEN rk = 2 THEN d2 END) AS b2
              FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                      ORDER BY d2 ASC, cell ASC) AS rk FROM dd)
              WHERE rk <= 2 GROUP BY vec_id),
        sq AS (SELECT cell,
                 CAST(FLOOR((sqrt(b2) - sqrt(a2)) / sqrt(b2) * 1e9 + 0.5)
                   AS BIGINT) AS sq
               FROM p)
        SELECT cell, COUNT(*) AS n_members,
          CAST(SUM(sq) AS BIGINT) AS sum_sil_q,
          CAST(SUM(sq) AS DOUBLE) / 1e9 / COUNT(*) AS mean_sil
        FROM sq GROUP BY cell""")),

    // ---- cluster-balanced (diversity) sampling --------------------------
    //      d06's stratified quota sampling with LEARNED strata: assign
    //      every vector to its nearest centroid (one broadcast-argmin
    //      pass), then take an equal per-cluster quota by portable
    //      md5(vec_id) rank — the curation move that keeps a training
    //      sample from collapsing onto the densest embedding region.
    //      Scale: assignment is the one real pass; the quota window
    //      ranks within cells (at 100 TB, pre-filter each cell by an
    //      md5 prefix to an over-sample before the exact rank — the
    //      d06 note applies unchanged). Ties cannot occur: md5 input is
    //      the unique vec_id.
    Q("c08_cluster_balanced_sample",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val a = lloydPasses(corpus(s, d), k = 8, iters = 1).last
        val h = md5(col("vec_id").cast("string").cast("binary"))
        val w = Window.partitionBy(col("cell")).orderBy(h.asc, col("vec_id").asc)
        a.select(col("vec_id"), col("cell"))
          .withColumn("smp_rank", row_number().over(w).cast("long"))
          .filter(col("smp_rank") <= 5)
      },
      Some(lloydCte(8, 1) + """
        SELECT vec_id, cell, smp_rank FROM (
          SELECT vec_id, cell, CAST(ROW_NUMBER() OVER (PARTITION BY cell
            ORDER BY md5(CAST(vec_id AS VARCHAR)) ASC, vec_id ASC)
            AS BIGINT) AS smp_rank
          FROM a0)
        WHERE smp_rank <= 5"""))
    ,

    // ---- elbow curve: within-cluster SSE across k -----------------------
    //      the k-selection diagnostic: total within-cluster squared
    //      distance at k in {2,4,8,16} seed centroids — the curve whose
    //      knee picks k. Per-row min-distances are exact left-fold
    //      doubles quantized to 1e-6 integers BEFORE the corpus sum, so
    //      the total is shuffle-order-free and replays exactly. One
    //      broadcast-argmin scan per k; the four branches share the
    //      cached corpus and union into one frame.
    Q("c09_elbow_sse",
      (s, d) => {
        val emb = corpus(s, d)
        Seq(2, 4, 8, 16).map { k =>
          assignTo(emb, seeds(emb, k))
            .select(lit(k.toLong).as("k"),
              floor(col("d2") * lit(1e6)).cast("long").as("sq"))
        }.reduce(_ unionByName _)
          .groupBy(col("k"))
          .agg(count(lit(1)).as("n"), sum(col("sq")).as("sse_q"),
            (sum(col("sq")).cast("double") / lit(1e6)).as("sse"))
      },
      Some {
        val branches = Seq(2, 4, 8, 16).map { k =>
          s"""SELECT CAST($k AS BIGINT) AS k, COUNT(*) AS n,
             CAST(SUM(sq) AS BIGINT) AS sse_q,
             CAST(SUM(sq) AS DOUBLE) / 1e6 AS sse
           FROM (SELECT CAST(FLOOR(m * 1e6) AS BIGINT) AS sq FROM (
             SELECT e.vec_id,
               MIN(${l2sqSql("e.v", "c.cv")}) AS m
             FROM e CROSS JOIN
               (SELECT vec_id AS cell, v AS cv FROM e WHERE vec_id < $k) c
             GROUP BY e.vec_id))"""
        }
        """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) v
                      FROM embeddings)
        """ + branches.mkString("\n        UNION ALL\n        ")
      }),

    // ---- top principal component (power iteration) ----------------------
    //      the embedding-space diagnostic behind whitening, drift
    //      detection, and anisotropy checks: the covariance matrix's
    //      dominant eigenvector by 3 fixed power iterations from the
    //      uniform seed (1/sqrt(64) = 0.125 exactly in IEEE).
    //      Distribution shape: means and the 64x64 covariance are
    //      map-side-combined integer-quantized sums (the Gram-matrix
    //      accumulation — 4096 cells however large the corpus; each
    //      row's outer product is emitted row-locally); the 4096-entry
    //      matrix then comes to the driver (a model-sized transfer, the
    //      BPE-merge-table lifecycle) where the 3 iterations run with
    //      the SAME quantized arithmetic the oracle replays in SQL.
    //      Every sum that crosses a shuffle is floor(x*1e9+0.5) integer
    //      — order-free and cross-engine exact; sqrt and division are
    //      correctly-rounded IEEE on both engines.
    Q("c10_pca_power",
      (s, d) => {
        val dims = 64
        val e = corpus(s, d)
        val n = e.count()
        val x = e.select(posexplode(col("v")).as(Seq("j0", "x")))
          .select((col("j0") + 1).as("j"), col("x"))
        val mu = x.groupBy(col("j"))
          .agg((sum(floor(col("x") * lit(1e9) + lit(0.5)).cast("long"))
            .cast("double") / lit(1e9) / lit(n)).as("mu"))
          .orderBy(col("j")).collect().map(_.getDouble(1)) // 64 scalars
        val centered = e
          .withColumn("mu", array(mu.map(lit): _*))
          .withColumn("xc",
            expr("transform(v, (x, i) -> x - element_at(mu, i + 1))"))
        val cov = centered
          .select(col("xc"), posexplode(col("xc")).as(Seq("i0", "xi")))
          .select(col("i0"), col("xi"),
            posexplode(col("xc")).as(Seq("j0", "xj")))
          .select((col("i0") + 1).as("i"), (col("j0") + 1).as("j"),
            floor(col("xi") * col("xj") * lit(1e9) + lit(0.5)).cast("long")
              .as("q"))
          .groupBy(col("i"), col("j"))
          .agg((sum(col("q")).cast("double") / lit(1e9) / lit(n)).as("c"))
          .collect() // 4096 entries — model-sized, documented above
        val cm = Array.ofDim[Double](dims, dims)
        cov.foreach(r => cm(r.getAs[Number]("i").intValue - 1)(
          r.getAs[Number]("j").intValue - 1) = r.getAs[Double]("c"))
        var v = Array.fill(dims)(0.125)
        for (_ <- 1 to 3) {
          val w = Array.tabulate(dims) { i =>
            var acc = 0L
            var j = 0
            while (j < dims) {
              acc += math.floor(cm(i)(j) * v(j) * 1e9 + 0.5).toLong
              j += 1
            }
            acc / 1e9
          }
          var sq = 0L
          w.foreach(wi => sq += math.floor(wi * wi * 1e9 + 0.5).toLong)
          val nrm = math.sqrt(sq / 1e9)
          v = w.map(_ / nrm)
        }
        var lamQ = 0L
        for (i <- 0 until dims; j <- 0 until dims)
          lamQ += math.floor(cm(i)(j) * v(i) * v(j) * 1e9 + 0.5).toLong
        val lam = lamQ / 1e9
        import s.implicits._
        (1 to dims).map(i => (i.toLong, v(i - 1), lam))
          .toDF("dim", "loading", "eigval")
      },
      Some {
        def iter(t: Int): String = s"""
        w$t AS (SELECT c.i AS j,
                  CAST(SUM(CAST(FLOOR(c.c * v.v * 1e9 + 0.5) AS BIGINT))
                    AS DOUBLE) / 1e9 AS w
                FROM c JOIN v${t - 1} v ON c.j2 = v.j GROUP BY 1),
        nm$t AS (SELECT sqrt(CAST(SUM(CAST(FLOOR(w * w * 1e9 + 0.5)
                   AS BIGINT)) AS DOUBLE) / 1e9) AS nrm FROM w$t),
        v$t AS MATERIALIZED (SELECT j, w / (SELECT nrm FROM nm$t) AS v
                             FROM w$t)"""
        s"""
        WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) v
                   FROM embeddings),
        nn AS (SELECT COUNT(*) AS n FROM e),
        x AS (SELECT vec_id, t.j, v[t.j] AS x
              FROM e CROSS JOIN unnest(range(1, 65)) t(j)),
        m AS (SELECT j, CAST(SUM(CAST(FLOOR(x * 1e9 + 0.5) AS BIGINT))
                AS DOUBLE) / 1e9 / (SELECT n FROM nn) AS mu
              FROM x GROUP BY 1),
        xc AS MATERIALIZED (SELECT vec_id, x.j, x - mu AS xc
                            FROM x JOIN m ON x.j = m.j),
        c AS MATERIALIZED (
          SELECT a.j AS i, b.j AS j2,
            CAST(SUM(CAST(FLOOR(a.xc * b.xc * 1e9 + 0.5) AS BIGINT))
              AS DOUBLE) / 1e9 / (SELECT n FROM nn) AS c
          FROM xc a JOIN xc b ON a.vec_id = b.vec_id GROUP BY 1, 2),
        v0 AS (SELECT unnest(range(1, 65)) AS j, CAST(0.125 AS DOUBLE) AS v),
        ${iter(1).stripPrefix("\n")},
        ${iter(2).stripPrefix("\n")},
        ${iter(3).stripPrefix("\n")},
        lam AS (SELECT CAST(SUM(CAST(FLOOR(c.c * vi.v * vj.v * 1e9 + 0.5)
                  AS BIGINT)) AS DOUBLE) / 1e9 AS l
                FROM c JOIN v3 vi ON c.i = vi.j JOIN v3 vj ON c.j2 = vj.j)
        SELECT CAST(v3.j AS BIGINT) AS dim, v3.v AS loading,
          (SELECT l FROM lam) AS eigval
        FROM v3"""
      })
  )
}
