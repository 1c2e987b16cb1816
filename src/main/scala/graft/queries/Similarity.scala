package graft.queries

import org.apache.spark.sql.functions._
import graft.io.Tables
import graft.operators.SimilarityOps

/** Similarity search over `embeddings` (array<float>, 64-dim): exact
  * brute-force cosine top-k and a bucketed LSH ANN variant. Query set =
  * vec_id < 5 drawn from the corpus itself.
  *
  * The DuckDB oracle recomputes cosines with the identical left-to-right
  * double fold (list_reduce over a 0.0-prepended product list ==
  * Spark's aggregate(zip_with(...), 0.0, +)), so the doubles are
  * bit-identical and the top-k cut (ordered by cosine desc, vec_id asc)
  * is deterministic on both engines.
  */
object Similarity {

  /** shared oracle prelude: vectors as DOUBLE[], with left-fold norms */
  private val normCte = """
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) v FROM embeddings),
    n AS (SELECT vec_id, v,
            sqrt(list_reduce(list_prepend(0.0,
              list_transform(range(1, len(v) + 1), i -> v[i] * v[i])),
              (x, y) -> x + y)) AS nrm
          FROM e)
  """

  private def dotSql(a: String, b: String) =
    s"""list_reduce(list_prepend(0.0,
       list_transform(range(1, len($a) + 1), i -> $a[i] * $b[i])),
       (x, y) -> x + y)"""

  /** squared L2 distance with the same left-fold order as vec_l2sq */
  private def l2sqSql(a: String, b: String) =
    s"""list_reduce(list_prepend(0.0,
       list_transform(range(1, len($a) + 1),
         i -> ($a[i] - $b[i]) * ($a[i] - $b[i]))),
       (x, y) -> x + y)"""

  /** s14 oracle: exact top-5 plus one ANN branch per probe depth, the
    * probe-bucket lists generated from the SAME mask enumeration the
    * Scala operator uses (SimilarityOps.probeMasks), unioned into one
    * (probes, q_id, hits, recall) table. */
  private def multiprobeRecallSql: String = {
    val planes = 6
    val bucket6 = (0 until planes).map(j =>
      s"CASE WHEN v[${j + 1}] > 0 THEN ${1L << j} ELSE 0 END")
      .mkString("(", "\n                 + ", ")")
    def annBranch(p: Int): String = {
      val lst = graft.operators.SimilarityOps.probeMasks(planes, p)
        .map(m => if (m == 0L) "bucket" else s"xor(bucket, $m)")
        .mkString(", ")
      s"""
        qb$p AS (SELECT vec_id AS q_id, qv, qnrm, pb AS bucket
               FROM (SELECT vec_id, v AS qv, nrm AS qnrm, bucket FROM bkt6
                     WHERE vec_id < 5)
               CROSS JOIN LATERAL unnest([$lst]) t(pb)),
        pann$p AS (SELECT qb$p.q_id, c.vec_id,
                     ${dotSql("c.v", s"qb$p.qv")} / (c.nrm * qb$p.qnrm)
                       AS cosine
                   FROM bkt6 c JOIN qb$p USING (bucket)
                   WHERE c.vec_id <> qb$p.q_id),
        ann$p AS (SELECT q_id, vec_id FROM (
                    SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
                      ORDER BY cosine DESC, vec_id ASC) AS rk FROM pann$p)
                  WHERE rk <= 5),
        rec$p AS (SELECT CAST($p AS BIGINT) AS probes, ex.q_id,
                    COUNT(ann$p.vec_id) AS hits,
                    CAST(COUNT(ann$p.vec_id) AS DOUBLE) / 5 AS recall
                  FROM ex LEFT JOIN ann$p
                    ON ex.q_id = ann$p.q_id AND ex.vec_id = ann$p.vec_id
                  GROUP BY ex.q_id)"""
    }
    normCte + s"""
        , q AS (SELECT vec_id AS q_id, v AS qv, nrm AS qnrm FROM n
                WHERE vec_id < 5),
        pex AS (SELECT q.q_id, c.vec_id,
                  ${dotSql("c.v", "q.qv")} / (c.nrm * q.qnrm) AS cosine
                FROM n c, q WHERE c.vec_id <> q.q_id),
        ex AS (SELECT q_id, vec_id FROM (
                 SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
                   ORDER BY cosine DESC, vec_id ASC) AS rk FROM pex)
               WHERE rk <= 5),
        bkt6 AS (SELECT vec_id, v, nrm,
                  $bucket6 AS bucket
                FROM n),""" +
      Seq(1, 2, 3).map(annBranch).mkString(",") + """
        SELECT * FROM rec1
        UNION ALL SELECT * FROM rec2
        UNION ALL SELECT * FROM rec3"""
  }

  val qs: Seq[Q] = Seq(

    // ---- exact brute-force cosine top-10 --------------------------------
    Q("s01_cosine_topk",
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        SimilarityOps.bruteForceTopK(emb, emb.filter(col("vec_id") < 5), k = 10)
      },
      Some(normCte + s"""
        , q AS (SELECT vec_id AS q_id, v AS qv, nrm AS qnrm FROM n WHERE vec_id < 5),
        p AS (SELECT q.q_id, c.vec_id,
                ${dotSql("c.v", "q.qv")} / (c.nrm * q.qnrm) AS cosine
              FROM n c, q WHERE c.vec_id <> q.q_id)
        SELECT q_id, vec_id, cosine, rk FROM (
          SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY q_id
            ORDER BY cosine DESC, vec_id ASC) AS BIGINT) AS rk FROM p)
        WHERE rk <= 10""")),

    // ---- LSH-bucketed ANN top-5 (4 sign planes -> 16 buckets) -----------
    Q("s02_ann_lsh",
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        SimilarityOps.lshTopK(emb, emb.filter(col("vec_id") < 5), k = 5, planes = 4)
      },
      Some(normCte + s"""
        , b AS (SELECT vec_id, v, nrm,
                  (CASE WHEN v[1] > 0 THEN 1 ELSE 0 END
                 + CASE WHEN v[2] > 0 THEN 2 ELSE 0 END
                 + CASE WHEN v[3] > 0 THEN 4 ELSE 0 END
                 + CASE WHEN v[4] > 0 THEN 8 ELSE 0 END) AS bucket
                FROM n),
        q AS (SELECT vec_id AS q_id, v AS qv, nrm AS qnrm, bucket
              FROM b WHERE vec_id < 5),
        p AS (SELECT q.q_id, c.vec_id,
                ${dotSql("c.v", "q.qv")} / (c.nrm * q.qnrm) AS cosine
              FROM b c JOIN q USING (bucket) WHERE c.vec_id <> q.q_id)
        SELECT q_id, vec_id, cosine, rk FROM (
          SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY q_id
            ORDER BY cosine DESC, vec_id ASC) AS BIGINT) AS rk FROM p)
        WHERE rk <= 5""")),

    // ---- int8 scalar quantization + reconstruction error ----------------
    //      the storage-compression step before an ANN index ships: per-
    //      vector symmetric int8 (scale = 127/max|v|), with max/sum
    //      absolute reconstruction error as the quality report. Pure
    //      HOFs — round/abs/div are IEEE-identical on both engines, and
    //      sum_err folds left like every other vector reduction here.
    Q("s09_quantization",
      (s, d) => Tables.embeddings(s, d)
        .select(col("vec_id"),
          expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
        .withColumn("qscale",
          lit(127.0) / expr("nullif(array_max(transform(v, x -> abs(x))), 0.0)"))
        .withColumn("errs",
          expr("transform(v, x -> abs(round(x * qscale) / qscale - x))"))
        .select(col("vec_id"), col("qscale"),
          expr("array_max(errs)").as("max_err"),
          expr("aggregate(errs, 0.0D, (acc, x) -> acc + x)").as("sum_err")),
      Some("""
        WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) v FROM embeddings),
        m AS (SELECT vec_id, v,
                127.0 / NULLIF(list_max(list_transform(v, x -> abs(x))), 0.0)
                  AS qscale
              FROM e),
        r AS (SELECT vec_id, qscale,
                list_transform(v, x -> abs(round(x * qscale) / qscale - x))
                  AS errs
              FROM m)
        SELECT vec_id, qscale, list_max(errs) AS max_err,
          list_reduce(list_prepend(0.0, errs), (x, y) -> x + y) AS sum_err
        FROM r""")),

    // ---- native vector expressions through the SQL frontend -------------
    //      the functionRegistry route (VectorExpressions.registerAll /
    //      GraftExtensions): a pure-SQL caller computes cosine-to-anchor
    //      with the same codegen'd vec_dot the Column API uses
    Q("s10_sql_vector_frontend",
      (s, d) => {
        graft.expressions.VectorExpressions.registerAll(s)
        Tables.embeddings(s, d)
          .select(col("vec_id"),
            expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
          .createOrReplaceTempView("emb_s10")
        s.sql("""
          SELECT e.vec_id,
            vec_dot(e.v, a.av) / (sqrt(vec_dot(e.v, e.v)) *
              sqrt(vec_dot(a.av, a.av))) AS cosine_to_anchor
          FROM emb_s10 e
          CROSS JOIN (SELECT v AS av FROM emb_s10 WHERE vec_id = 0) a
          WHERE e.vec_id <> 0""")
      },
      Some(normCte + s"""
        , a AS (SELECT v AS av, nrm AS anrm FROM n WHERE vec_id = 0)
        SELECT e.vec_id,
          ${dotSql("e.v", "a.av")} / (e.nrm * a.anrm) AS cosine_to_anchor
        FROM n e, a WHERE e.vec_id <> 0""")),

    // ---- multiprobe ANN: own bucket + all hamming-1 buckets -------------
    Q("s04_ann_multiprobe",
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        SimilarityOps.lshTopK(emb, emb.filter(col("vec_id") < 5), k = 5,
          planes = 4, probes = 2)
      },
      Some(normCte + s"""
        , b AS (SELECT vec_id, v, nrm,
                  (CASE WHEN v[1] > 0 THEN 1 ELSE 0 END
                 + CASE WHEN v[2] > 0 THEN 2 ELSE 0 END
                 + CASE WHEN v[3] > 0 THEN 4 ELSE 0 END
                 + CASE WHEN v[4] > 0 THEN 8 ELSE 0 END) AS bucket
                FROM n),
        q AS (SELECT vec_id AS q_id, qv, qnrm, pb AS bucket
              FROM (SELECT vec_id, v AS qv, nrm AS qnrm, bucket FROM b
                    WHERE vec_id < 5)
              CROSS JOIN LATERAL unnest([bucket, xor(bucket, 1),
                xor(bucket, 2), xor(bucket, 4), xor(bucket, 8)]) t(pb)),
        p AS (SELECT q.q_id, c.vec_id,
                ${dotSql("c.v", "q.qv")} / (c.nrm * q.qnrm) AS cosine
              FROM b c JOIN q USING (bucket) WHERE c.vec_id <> q.q_id)
        SELECT q_id, vec_id, cosine, rk FROM (
          SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY q_id
            ORDER BY cosine DESC, vec_id ASC) AS BIGINT) AS rk FROM p)
        WHERE rk <= 5""")),

    // ---- exact L2-distance top-10 (second metric, same operator shape) --
    Q("s05_l2_topk",
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        SimilarityOps.l2TopK(emb, emb.filter(col("vec_id") < 5), k = 10)
      },
      Some(normCte + s"""
        , q AS (SELECT vec_id AS q_id, v AS qv FROM n WHERE vec_id < 5),
        p AS (SELECT q.q_id, c.vec_id,
                sqrt(list_reduce(list_prepend(0.0,
                  list_transform(range(1, len(c.v) + 1),
                    i -> (c.v[i] - q.qv[i]) * (c.v[i] - q.qv[i]))),
                  (x, y) -> x + y)) AS l2_dist
              FROM n c, q WHERE c.vec_id <> q.q_id)
        SELECT q_id, vec_id, l2_dist, rk FROM (
          SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY q_id
            ORDER BY l2_dist ASC, vec_id ASC) AS BIGINT) AS rk FROM p)
        WHERE rk <= 10""")),

    // ---- embedding-cosine near-duplicate pairs --------------------------
    Q("s03_embedding_neardup",
      (s, d) => SimilarityOps.embeddingNearDups(Tables.embeddings(s, d), 0.4),
      Some(normCte + s"""
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
          ${dotSql("a.v", "b.v")} / (a.nrm * b.nrm) AS cosine
        FROM n a JOIN n b ON a.vec_id < b.vec_id
        WHERE ${dotSql("a.v", "b.v")} / (a.nrm * b.nrm) >= 0.4""")),

    // ---- IVF-style ANN: 8 coarse cells, 2 probes ------------------------
    //      (cell assignment = argmin L2 to seed centroids; same left-fold
    //      distance on both engines so the argmin and therefore the cell
    //      partition is bit-deterministic)
    Q("s06_ann_ivf",
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        SimilarityOps.ivfTopK(emb, emb.filter(col("vec_id") < 5), k = 5,
          nCells = 8, nProbe = 2)
      },
      Some(normCte + s"""
        , cents AS (SELECT vec_id AS cell, v AS cv FROM n WHERE vec_id < 8),
        asg AS (SELECT vec_id, v, nrm, cell FROM (
          SELECT c.vec_id, c.v, c.nrm, t.cell,
            ROW_NUMBER() OVER (PARTITION BY c.vec_id ORDER BY ${l2sqSql("c.v", "t.cv")} ASC, t.cell ASC) AS rn
          FROM n c CROSS JOIN cents t) WHERE rn = 1),
        qa AS (SELECT q_id, qv, qnrm, cell FROM (
          SELECT c.vec_id AS q_id, c.v AS qv, c.nrm AS qnrm, t.cell,
            ROW_NUMBER() OVER (PARTITION BY c.vec_id ORDER BY ${l2sqSql("c.v", "t.cv")} ASC, t.cell ASC) AS pr
          FROM n c CROSS JOIN cents t WHERE c.vec_id < 5) WHERE pr <= 2),
        p AS (SELECT qa.q_id, a.vec_id,
                ${dotSql("a.v", "qa.qv")} / (a.nrm * qa.qnrm) AS cosine
              FROM asg a JOIN qa USING (cell) WHERE a.vec_id <> qa.q_id)
        SELECT q_id, vec_id, cosine, rk FROM (
          SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY q_id
            ORDER BY cosine DESC, vec_id ASC) AS BIGINT) AS rk FROM p)
        WHERE rk <= 5""")),

    // ---- IVF-celled near-dup join (the bounded form of s03) -------------
    //      candidate pairs restricted to same-cell members: per-cell
    //      quadratic instead of corpus-quadratic; the oracle replicates
    //      the cell assignment with the identical left-fold distance
    Q("s07_ivf_neardup",
      (s, d) => SimilarityOps.ivfNearDups(Tables.embeddings(s, d),
        minCosine = 0.4, nCells = 8),
      Some(normCte + s"""
        , cents AS (SELECT vec_id AS cell, v AS cv FROM n WHERE vec_id < 8),
        asg AS (SELECT vec_id, v, nrm, cell FROM (
          SELECT c.vec_id, c.v, c.nrm, t.cell,
            ROW_NUMBER() OVER (PARTITION BY c.vec_id ORDER BY ${l2sqSql("c.v", "t.cv")} ASC, t.cell ASC) AS rn
          FROM n c CROSS JOIN cents t) WHERE rn = 1)
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
          ${dotSql("a.v", "b.v")} / (a.nrm * b.nrm) AS cosine
        FROM asg a JOIN asg b
          ON a.cell = b.cell AND a.vec_id < b.vec_id
        WHERE ${dotSql("a.v", "b.v")} / (a.nrm * b.nrm) >= 0.4""")),

    // ---- in-engine ANN quality measurement: recall@5 of the LSH path ----
    //      exact top-5 left-joined to the ANN top-5 per query — the
    //      recall report an ANN deployment publishes continuously, run
    //      as one plan (both pipelines share the corpus scan)
    Q("s08_ann_recall",
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        val queries = emb.filter(col("vec_id") < 5)
        val exact = SimilarityOps.bruteForceTopK(emb, queries, k = 5)
          .select(col("q_id"), col("vec_id"))
        val ann = SimilarityOps.lshTopK(emb, queries, k = 5, planes = 4)
          .select(col("q_id").as("aq"), col("vec_id").as("av"))
        exact.join(ann,
            exact("q_id") === ann("aq") && exact("vec_id") === ann("av"),
            "left")
          .groupBy(col("q_id"))
          .agg(count(col("aq")).as("hits"),
            (count(col("aq")).cast("double") / lit(5)).as("recall"))
      },
      Some(normCte + s"""
        , q AS (SELECT vec_id AS q_id, v AS qv, nrm AS qnrm FROM n
                WHERE vec_id < 5),
        pex AS (SELECT q.q_id, c.vec_id,
                  ${dotSql("c.v", "q.qv")} / (c.nrm * q.qnrm) AS cosine
                FROM n c, q WHERE c.vec_id <> q.q_id),
        ex AS (SELECT q_id, vec_id FROM (
                 SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
                   ORDER BY cosine DESC, vec_id ASC) AS rk FROM pex)
               WHERE rk <= 5),
        bkt AS (SELECT vec_id, v, nrm,
                  (CASE WHEN v[1] > 0 THEN 1 ELSE 0 END
                 + CASE WHEN v[2] > 0 THEN 2 ELSE 0 END
                 + CASE WHEN v[3] > 0 THEN 4 ELSE 0 END
                 + CASE WHEN v[4] > 0 THEN 8 ELSE 0 END) AS bucket
                FROM n),
        qb AS (SELECT vec_id AS q_id, v AS qv, nrm AS qnrm, bucket
               FROM bkt WHERE vec_id < 5),
        pann AS (SELECT qb.q_id, c.vec_id,
                   ${dotSql("c.v", "qb.qv")} / (c.nrm * qb.qnrm) AS cosine
                 FROM bkt c JOIN qb USING (bucket)
                 WHERE c.vec_id <> qb.q_id),
        ann AS (SELECT q_id, vec_id FROM (
                  SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
                    ORDER BY cosine DESC, vec_id ASC) AS rk FROM pann)
                WHERE rk <= 5)
        SELECT ex.q_id, COUNT(ann.vec_id) AS hits,
          CAST(COUNT(ann.vec_id) AS DOUBLE) / 5 AS recall
        FROM ex LEFT JOIN ann
          ON ex.q_id = ann.q_id AND ex.vec_id = ann.vec_id
        GROUP BY ex.q_id""")),

    // ---- recall@5 vs multiprobe depth -----------------------------------
    //      the dial an ANN deployment tunes at corpus scale: the SAME
    //      6-plane index probed at Hamming radius 0 / 1 / 2 (probe sets
    //      of 1, 7 and 22 buckets from SimilarityOps.probeMasks — the
    //      Scala side and this oracle enumerate the identical masks),
    //      each depth scored as recall@5 against the exact top-5.
    //      Candidate sets are supersets as depth grows, and the rank
    //      order is total, so recall is provably nondecreasing — the
    //      SimilaritySpec asserts it; this gate pins the exact values.
    Q("s14_multiprobe_recall",
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        val queries = emb.filter(col("vec_id") < 5)
        val exact = SimilarityOps.bruteForceTopK(emb, queries, k = 5)
          .select(col("q_id"), col("vec_id"))
        Seq(1, 2, 3).map { p =>
          val ann = SimilarityOps
            .lshTopK(emb, queries, k = 5, planes = 6, probes = p)
            .select(col("q_id").as("aq"), col("vec_id").as("av"))
          exact.join(ann,
              exact("q_id") === ann("aq") && exact("vec_id") === ann("av"),
              "left")
            .groupBy(col("q_id"))
            .agg(count(col("aq")).as("hits"),
              (count(col("aq")).cast("double") / lit(5)).as("recall"))
            .withColumn("probes", lit(p.toLong))
            .select(col("probes"), col("q_id"), col("hits"), col("recall"))
        }.reduce(_ unionByName _)
      },
      Some(multiprobeRecallSql)),

    // ---- per-dimension embedding statistics ------------------------------
    //      the embedding-space health check every corpus pipeline runs
    //      before training (dead dims, scale drift, outliers): posexplode
    //      to (dim, value), one keyed aggregation — 64 groups whatever
    //      the corpus size, so the reduce side is trivially small and the
    //      map side is a shuffle-free partial aggregate. Moments go
    //      through exact decimal; min/max are order-independent.
    Q("s11_dim_stats",
      (s, d) => {
        val dv = Tables.embeddings(s, d)
          .select(posexplode(col("embedding")).as(Seq("dim", "f")))
          .select(col("dim").cast("long").as("dim"),
            col("f").cast("double").as("v"))
        val x = col("v").cast("decimal(18,7)")
        dv.groupBy("dim")
          .agg(count(lit(1)).as("n"),
            (sum(x).cast("double") / count(lit(1))).as("mean_v"),
            (sum((x * x).cast("decimal(38,14)")).cast("double")
              / count(lit(1))).as("m2"),
            min(col("v")).as("min_v"),
            max(col("v")).as("max_v"))
          .select(col("dim"), col("n"), col("mean_v"),
            (col("m2") - col("mean_v") * col("mean_v")).as("var_v"),
            col("min_v"), col("max_v"))
      },
      Some("""
        WITH dv AS (
          SELECT CAST(generate_subscripts(embedding, 1) - 1 AS BIGINT)
              AS dim,
            CAST(unnest(embedding) AS DOUBLE) AS v
          FROM embeddings),
        m AS (
          SELECT dim, COUNT(*) AS n,
            CAST(SUM(CAST(v AS DECIMAL(18,7))) AS DOUBLE) / COUNT(*)
              AS mean_v,
            CAST(SUM(CAST(CAST(v AS DECIMAL(18,7))
                * CAST(v AS DECIMAL(18,7)) AS DECIMAL(38,14)))
              AS DOUBLE) / COUNT(*) AS m2,
            MIN(v) AS min_v, MAX(v) AS max_v
          FROM dv GROUP BY dim)
        SELECT dim, n, mean_v, m2 - mean_v * mean_v AS var_v,
          min_v, max_v
        FROM m""")),

    // ---- label-separation matrix: pairwise centroid cosines --------------
    //      the class-separation diagnostic for labeled embeddings: one
    //      exact-decimal centroid per label (the refreshCentroids shape),
    //      then the cosine between every label pair. Pairwise work is
    //      k*(k-1)/2 over k labels — never over the corpus — so the only
    //      data-sized pass is the centroid aggregation's single shuffle.
    Q("s12_label_separation",
      (s, d) => {
        graft.expressions.VectorExpressions.registerAll(s)
        val emb = Tables.embeddings(s, d)
          .select(col("label").cast("long").as("label"),
            col("embedding").cast("array<double>").as("v"))
        val cents = emb
          .select(col("label"), posexplode(col("v")).as(Seq("dim", "coord")))
          .groupBy(col("label"), col("dim"))
          .agg((sum(col("coord").cast("decimal(18,9)")).cast("double") /
            count(lit(1))).as("m"))
          .groupBy(col("label"))
          .agg(array_sort(collect_list(struct(col("dim"), col("m"))))
            .as("dm"))
          .select(col("label"), expr("transform(dm, x -> x.m)").as("cv"))
          .withColumn("nrm",
            sqrt(call_function("vec_dot", col("cv"), col("cv"))))
        val a = cents.select(col("label").as("la"), col("cv").as("va"),
          col("nrm").as("na"))
        val b = cents.select(col("label").as("lb"), col("cv").as("vb"),
          col("nrm").as("nb"))
        a.join(b, col("la") < col("lb"))
          .select(col("la"), col("lb"),
            (call_function("vec_dot", col("va"), col("vb"))
              / (col("na") * col("nb"))).as("cosine"))
      },
      Some(s"""
        WITH dv AS (
          SELECT label, generate_subscripts(embedding, 1) AS dim,
            CAST(unnest(embedding) AS DOUBLE) AS coord
          FROM embeddings),
        m AS (
          SELECT label, dim,
            CAST(SUM(CAST(coord AS DECIMAL(18,9))) AS DOUBLE) / COUNT(*)
              AS m
          FROM dv GROUP BY 1, 2),
        c AS (SELECT label, list(m ORDER BY dim) AS cv FROM m
              GROUP BY label),
        n2 AS (SELECT CAST(label AS BIGINT) AS label, cv,
                 sqrt(${dotSql("cv", "cv")}) AS nrm
               FROM c)
        SELECT a.label AS la, b.label AS lb,
          ${dotSql("a.cv", "b.cv")} / (a.nrm * b.nrm) AS cosine
        FROM n2 a JOIN n2 b ON a.label < b.label""")),

    // ---- k-NN majority-vote classification (weak labeling) ---------------
    //      the embedding-space labeler a curation pipeline uses to extend
    //      a labeled seed set: every 5th vector is held out and receives
    //      the majority label of its 5 nearest labeled neighbors (L2;
    //      vote ties to the SMALLER label, rank ties to the smaller id —
    //      total orders, so prediction is deterministic). Reported as the
    //      confusion matrix against the held-out true labels. The vote
    //      argmax is max(struct(count, -label)) — an aggregate, no
    //      per-query sort; neighbor search is l2TopK's keyed window.
    Q("s13_knn_classify",
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        val labels = emb.select(col("vec_id"),
          col("label").cast("long").as("label"))
        val nn = SimilarityOps.l2TopK(
          emb.filter(col("vec_id") % 5 =!= 0),
          emb.filter(col("vec_id") % 5 === 0), k = 5)
        val pred = nn
          .join(broadcast(labels.select(col("vec_id"),
            col("label").as("nbr_label"))), "vec_id")
          .groupBy(col("q_id"), col("nbr_label"))
          .agg(count(lit(1)).as("c"))
          .groupBy(col("q_id"))
          .agg((max(struct(col("c"), (col("nbr_label") * -1).as("neg")))
            .getField("neg") * -1).as("pred_label"))
        pred
          .join(broadcast(labels), pred("q_id") === labels("vec_id"))
          .groupBy(col("label").as("true_label"), col("pred_label"))
          .agg(count(lit(1)).as("n"))
      },
      Some(s"""
        WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) v,
                     CAST(label AS BIGINT) AS label FROM embeddings),
        t AS (SELECT * FROM e WHERE vec_id % 5 = 0),
        l AS (SELECT * FROM e WHERE vec_id % 5 <> 0),
        p AS (SELECT t.vec_id AS q_id, t.label AS true_label,
                l.vec_id AS nid, l.label AS nbr_label,
                sqrt(${l2sqSql("l.v", "t.v")}) AS dist
              FROM t, l),
        nn AS (SELECT * FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
              ORDER BY dist ASC, nid ASC) AS rk FROM p)
          WHERE rk <= 5),
        v AS (SELECT q_id, true_label, nbr_label, COUNT(*) AS c
              FROM nn GROUP BY 1, 2, 3),
        pred AS (SELECT q_id, true_label, nbr_label AS pred_label FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
              ORDER BY c DESC, nbr_label ASC) AS rn FROM v)
          WHERE rn = 1)
        SELECT true_label, pred_label, COUNT(*) AS n
        FROM pred GROUP BY 1, 2""")),

    // ---- product quantization: encode + asymmetric-distance top-10 ------
    //      (Jégou et al. TPAMI 2011) 64 dims -> 4 subspaces x 16 dims,
    //      8 sub-centroids each: the corpus compresses to 4 codes per
    //      vector and the query scores it through a broadcast 4x8
    //      lookup table without touching raw vectors — the
    //      memory-bandwidth shape that makes billion-vector ANN
    //      serveable. Per-table distances are integer-quantized
    //      (floor(x*1e9 + 0.5)) so ADC sums are exact and the top-10
    //      cut (adc asc, vec_id asc) is deterministic on both engines.
    //      Codebook = deterministic first-8 seed convention (training
    //      is the c-family Lloyd loop, run offline per subspace).
    Q("s15_pq_adc",
      (s, d) => SimilarityOps.pqAdcTopK(Tables.embeddings(s, d),
        Tables.embeddings(s, d).filter(col("vec_id") < 3),
        k = 10, m = 4, subDim = 16, nCodes = 8),
      Some(normCte + s"""
        , subs AS (SELECT n.vec_id, t.sub,
                     list_slice(v, t.sub * 16 + 1, t.sub * 16 + 16) AS sv
                   FROM n CROSS JOIN (VALUES (0), (1), (2), (3)) t(sub)),
        cb AS (SELECT sub, vec_id AS cell, sv AS cv FROM subs
               WHERE vec_id < 8),
        enc AS (SELECT vec_id, sub, code FROM (
                  SELECT s.vec_id, s.sub, cb.cell AS code,
                    ROW_NUMBER() OVER (PARTITION BY s.vec_id, s.sub
                      ORDER BY ${l2sqSql("s.sv", "cb.cv")} ASC, cb.cell ASC)
                      AS rn
                  FROM subs s JOIN cb USING (sub)) WHERE rn = 1),
        qd AS (SELECT s.vec_id AS q_id, s.sub, cb.cell,
                 CAST(FLOOR(${l2sqSql("s.sv", "cb.cv")} * 1e9 + 0.5)
                   AS BIGINT) AS dq
               FROM subs s JOIN cb USING (sub) WHERE s.vec_id < 3),
        p AS (SELECT qd.q_id, enc.vec_id, CAST(SUM(qd.dq) AS BIGINT) AS adc_q
              FROM enc JOIN qd ON enc.sub = qd.sub AND enc.code = qd.cell
              WHERE enc.vec_id <> qd.q_id
              GROUP BY 1, 2)
        SELECT q_id, vec_id, CAST(adc_q AS DOUBLE) / 1e9 AS adc, rk FROM (
          SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY q_id
            ORDER BY adc_q ASC, vec_id ASC) AS BIGINT) AS rk FROM p)
        WHERE rk <= 10""")),

    // ---- IVF near-dup with CORPUS-SIZED cells (the s07 scale dial) ------
    //      s07 gates the fixed test-scale default (8 cells); this gates
    //      the production sizing rule nCells = max(16, ceil(sqrt(N)))
    //      (DedupOps.autoCells — same dial as d17). The cell count is
    //      data-derived on BOTH sides: the engine counts the corpus (one
    //      scalar to the driver), the oracle computes the identical
    //      GREATEST(16, ceil(sqrt(COUNT(*)))) in its centroid CTE — the
    //      gate breaks if the sizing rule drifts between code and doc.
    Q("s16_ivf_neardup_auto",
      (s, d) => SimilarityOps.ivfNearDupsAuto(Tables.embeddings(s, d),
        minCosine = 0.4),
      Some(normCte + s"""
        , cents AS (SELECT vec_id AS cell, v AS cv FROM n
                    WHERE vec_id < (SELECT GREATEST(16,
                      CAST(ceil(sqrt(COUNT(*))) AS BIGINT)) FROM n)),
        asg AS (SELECT vec_id, v, nrm, cell FROM (
          SELECT c.vec_id, c.v, c.nrm, t.cell,
            ROW_NUMBER() OVER (PARTITION BY c.vec_id ORDER BY ${l2sqSql("c.v", "t.cv")} ASC, t.cell ASC) AS rn
          FROM n c CROSS JOIN cents t) WHERE rn = 1)
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
          ${dotSql("a.v", "b.v")} / (a.nrm * b.nrm) AS cosine
        FROM asg a JOIN asg b
          ON a.cell = b.cell AND a.vec_id < b.vec_id
        WHERE ${dotSql("a.v", "b.v")} / (a.nrm * b.nrm) >= 0.4""")),

    // ---- hybrid retrieval: BM25 + cosine via reciprocal-rank fusion ----
    //      the RAG-pipeline merge: doc 1's tokens rank the corpus
    //      lexically (t23's quantized Okapi BM25), vec 1 ranks it by
    //      exact cosine (s01's broadcast brute force), and the two
    //      top-30 lists fuse by rrf = sum 1/(60+rank) (Cormack 2009).
    //      Fusion itself is corpus-scale-free — it joins two already-cut
    //      top-K lists — so the scale story is each leg's own (broadcast
    //      query terms / broadcast query vector, TakeOrdered cuts, no
    //      global sort). Ranks are deterministic on both engines: the
    //      BM25 leg orders by an exact integer score and the vector leg
    //      by a bit-identical left-fold double, both tie-broken by id.
    Q("s17_rrf_fusion",
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        val lex = TextOps.bm25Ranked(Tables.documents(s, d),
          queryDocId = 1L, topN = 30)
          .select(col("doc_id").as("id"), col("rk"))
        val vec = SimilarityOps.bruteForceTopK(emb,
          emb.filter(col("vec_id") === 1), k = 30)
          .select(col("vec_id").as("id"), col("rk"))
        SimilarityOps.rrfFusion(lex, vec, kConst = 60, topN = 20)
      },
      Some(normCte + s"""
        , qv AS (SELECT v, nrm FROM n WHERE vec_id = 1),
        vp AS (SELECT c.vec_id AS id,
                 ${dotSql("c.v", "qv.v")} / (c.nrm * qv.nrm) AS cosine
               FROM n c, qv WHERE c.vec_id <> 1),
        vr AS (SELECT id, rk_vec FROM (
                 SELECT id, CAST(ROW_NUMBER() OVER
                   (ORDER BY cosine DESC, id ASC) AS BIGINT) AS rk_vec
                 FROM vp) WHERE rk_vec <= 30),
        t AS (SELECT doc_id, unnest(string_split_regex(trim(text), ' +'))
                AS term FROM documents),
        tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM t GROUP BY 1, 2),
        dl AS (SELECT doc_id, len(string_split_regex(trim(text), ' +'))
                 AS dl FROM documents),
        df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
        st AS (SELECT COUNT(*) AS n_docs,
                 CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl FROM dl),
        qt AS (SELECT DISTINCT term FROM t WHERE doc_id = 1),
        sc AS (SELECT tf.doc_id,
                 CAST(FLOOR(
                   ln((st.n_docs - df.df + 0.5) / (df.df + 0.5) + 1.0) *
                   (tf.tf * (1.2 + 1.0) /
                     (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / st.avgdl)))
                   * 1e9 + 0.5) AS BIGINT) AS tsq
               FROM tf JOIN qt USING (term) JOIN df USING (term)
                 JOIN dl USING (doc_id), st),
        bs AS (SELECT doc_id, CAST(SUM(tsq) AS BIGINT) AS score_q
               FROM sc GROUP BY doc_id),
        br AS (SELECT id, rk_lex FROM (
                 SELECT doc_id AS id, CAST(ROW_NUMBER() OVER
                   (ORDER BY score_q DESC, doc_id ASC) AS BIGINT) AS rk_lex
                 FROM bs) WHERE rk_lex <= 30)
        SELECT COALESCE(br.id, vr.id) AS id,
          COALESCE(CAST(1 AS DOUBLE) / (60 + rk_lex), 0) +
          COALESCE(CAST(1 AS DOUBLE) / (60 + rk_vec), 0) AS rrf,
          rk_lex, rk_vec
        FROM br FULL OUTER JOIN vr ON br.id = vr.id
        ORDER BY rrf DESC, id ASC LIMIT 20""")),

    // ---- JL random projection: distance-distortion histogram -----------
    //      project 64-dim embeddings to 16 dims with the deterministic
    //      md5-derived ±1 matrix (SimilarityOps.jlSignMatrix) and
    //      histogram the ratio projected-L2² / original-L2² over
    //      consecutive-id pairs — the Johnson–Lindenstrauss check that
    //      the cheap pre-ANN dimension cut actually preserves geometry.
    //      The oracle rebuilds the SAME sign matrix (inlined below from
    //      the same jlSignMatrix call — the multiprobeRecallSql
    //      precedent) and replays every fold left-to-right, so ratios
    //      and bucket cuts are bit-identical. Projection is row-local
    //      (zero shuffle); the pair join keys by vec_id, the histogram
    //      is a tiny agg.
    Q("s18_jl_distortion",
      (s, d) => {
        val pr = SimilarityOps.randomProject(Tables.embeddings(s, d),
          inDims = 64, outDims = 16)
        val a = pr.select(col("vec_id").as("ida"), col("v").as("va"),
          col("pv").as("pa"))
        val b = pr.select((col("vec_id") - 1).as("ida"), col("v").as("vb"),
          col("pv").as("pb"))
        a.join(b, "ida")
          .select(
            call_function("vec_l2sq", col("pa"), col("pb")).as("d2p"),
            call_function("vec_l2sq", col("va"), col("vb")).as("d2o"))
          .filter(col("d2o") > 0)
          .select(floor(col("d2p") / col("d2o") * lit(10)).cast("long")
            .as("bucket"))
          .groupBy(col("bucket")).agg(count(lit(1)).as("n"))
      },
      Some(normCte + s"""
        , sm(k, srow) AS (VALUES ${jlMatrixValuesSql(64, 16)}),
        pj AS (SELECT vec_id, k,
                 ${dotSql("n.v", "sm.srow")} / sqrt(CAST(16 AS DOUBLE)) AS pk
               FROM n CROSS JOIN sm),
        pv AS (SELECT vec_id, array_agg(pk ORDER BY k) AS pv
               FROM pj GROUP BY vec_id),
        pairs AS (SELECT ${l2sqSql("a.pv", "b.pv")} AS d2p,
                    ${l2sqSql("av.v", "bv.v")} AS d2o
                  FROM pv a JOIN pv b ON b.vec_id = a.vec_id + 1
                    JOIN n av ON av.vec_id = a.vec_id
                    JOIN n bv ON bv.vec_id = b.vec_id)
        SELECT CAST(FLOOR(d2p / d2o * 10) AS BIGINT) AS bucket,
          COUNT(*) AS n
        FROM pairs WHERE d2o > 0 GROUP BY 1""")),

    // ---- MMR diversity re-rank of a retrieved candidate list -----------
    //      greedy maximal-marginal-relevance (Carbonell 1998, λ=0.5)
    //      over the top-30 cosine hits for query vec 1, selecting 10.
    //      The oracle replays the greedy loop as a recursive CTE that
    //      carries the chosen list and re-derives each step's argmax
    //      with the SAME tie rule (score DESC, id ASC); every rel/sim
    //      double is the bit-identical left-fold cosine, and λ=0.5
    //      makes both MMR terms exact halvings, so the selection
    //      sequence is deterministic across engines. Retrieval and the
    //      30x30 sim matrix are distributed; only the O(nCand²) greedy
    //      state is driver-side (see SimilarityOps.mmrRerank docs).
    Q("s19_mmr_rerank",
      (s, d) => SimilarityOps.mmrRerank(Tables.embeddings(s, d),
        queryId = 1L, nCand = 30, lambda = 0.5, k = 10),
      Some(normCte.replaceFirst("WITH ", "WITH RECURSIVE ") + s"""
        , qv AS (SELECT v, nrm FROM n WHERE vec_id = 1),
        vp AS (SELECT c.vec_id AS id,
                 ${dotSql("c.v", "qv.v")} / (c.nrm * qv.nrm) AS rel
               FROM n c, qv WHERE c.vec_id <> 1),
        cand AS (SELECT id, rel FROM (
                   SELECT id, rel, ROW_NUMBER() OVER
                     (ORDER BY rel DESC, id ASC) AS rk FROM vp)
                 WHERE rk <= 30),
        cv AS (SELECT cand.id, n.v, n.nrm FROM cand
               JOIN n ON n.vec_id = cand.id),
        sims AS (SELECT a.id AS a, b.id AS b,
                   ${dotSql("a.v", "b.v")} / (a.nrm * b.nrm) AS sim
                 FROM cv a JOIN cv b ON a.id <> b.id),
        sel(step, chosen) AS (
          SELECT CAST(1 AS BIGINT) AS step,
            [(SELECT id FROM cand ORDER BY rel DESC, id ASC LIMIT 1)]
              AS chosen
          UNION ALL
          SELECT s.step + 1, list_append(s.chosen, (
              SELECT c.id FROM cand c
              WHERE NOT list_contains(s.chosen, c.id)
              ORDER BY 0.5 * c.rel - 0.5 * (
                  SELECT MAX(m.sim) FROM sims m
                  WHERE m.a = c.id AND list_contains(s.chosen, m.b))
                DESC, c.id ASC
              LIMIT 1))
          FROM sel s
          WHERE s.step < (SELECT LEAST(10, COUNT(*)) FROM cand)),
        last AS (SELECT chosen FROM sel ORDER BY step DESC LIMIT 1)
        SELECT CAST(g.r AS BIGINT) AS sel_rank, chosen[g.r] AS vec_id
        FROM last CROSS JOIN LATERAL unnest(range(1, len(chosen) + 1)) g(r)""")),

    // ---- IVF ANN over k-means-TRAINED centroids ------------------------
    //      s06 probes cells seeded from the first-k vectors; this is the
    //      production form its docstring defers to: two Lloyd passes
    //      (the c-family trainer, decimal-exact centroid refresh) train
    //      the cell table offline, then the SAME assign / probe /
    //      exact-score shape searches it. Trained cells follow the data
    //      distribution — balanced populations, stable recall on
    //      clustered corpora. The oracle replays the full chain: Lloyd
    //      rounds (bit-identical left-fold L2, decimal means), trained-
    //      cell assignment, 2-cell probing, exact cosine top-5.
    Q("s20_ann_ivf_trained",
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        val trained = Clustering.refreshCentroids(
          Clustering.lloydPasses(Clustering.corpus(s, d), k = 8, iters = 2)
            .last)
        SimilarityOps.ivfTopKWith(emb, emb.filter(col("vec_id") < 5),
          k = 5, cents = trained, nProbe = 2)
      },
      Some(normCte + Clustering.lloydBodySql(8, 3) + s"""
        , asg AS (SELECT vec_id, v, nrm, cell FROM (
          SELECT c.vec_id, c.v, c.nrm, t.cell,
            ROW_NUMBER() OVER (PARTITION BY c.vec_id ORDER BY ${l2sqSql("c.v", "t.cv")} ASC, t.cell ASC) AS rn
          FROM n c CROSS JOIN c2 t) WHERE rn = 1),
        qa AS (SELECT q_id, qv, qnrm, cell FROM (
          SELECT c.vec_id AS q_id, c.v AS qv, c.nrm AS qnrm, t.cell,
            ROW_NUMBER() OVER (PARTITION BY c.vec_id ORDER BY ${l2sqSql("c.v", "t.cv")} ASC, t.cell ASC) AS pr
          FROM n c CROSS JOIN c2 t WHERE c.vec_id < 5) WHERE pr <= 2),
        p AS (SELECT qa.q_id, a.vec_id,
                ${dotSql("a.v", "qa.qv")} / (a.nrm * qa.qnrm) AS cosine
              FROM asg a JOIN qa USING (cell) WHERE a.vec_id <> qa.q_id)
        SELECT q_id, vec_id, cosine, rk FROM (
          SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY q_id
            ORDER BY cosine DESC, vec_id ASC) AS BIGINT) AS rk FROM p)
        WHERE rk <= 5""")),

    // ---- binary-quantized Hamming pre-filter + exact re-rank -----------
    //      the modern binary-embedding retrieval shape: 64 sign bits per
    //      vector (8 bytes — memory-bandwidth cheap at billions of
    //      vectors), candidates RANKED by bit_count(xor), the 32
    //      Hamming-nearest re-ranked by exact cosine. Unlike the s02
    //      LSH-bucket path this tolerates any number of flipped bits —
    //      no probing schedule. Everything is integer (bits, xor,
    //      popcount) or bit-identical left-fold doubles, so the oracle
    //      replays the full pipeline value-for-value.
    Q("s21_binary_hamming_rerank",
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        SimilarityOps.binaryHammingRerank(emb,
          emb.filter(col("vec_id") < 5), k = 5, nCand = 32)
      },
      Some(normCte + s"""
        , bq AS (SELECT vec_id, v, nrm, ${signBits64Sql("v")} AS bits
                 FROM n),
        qb AS (SELECT vec_id AS q_id, v AS qv, nrm AS qnrm,
                 bits AS qbits FROM bq WHERE vec_id < 5),
        hc AS (SELECT q_id, vec_id, v, nrm, qv, qnrm, ham FROM (
                 SELECT bq.vec_id, bq.v, bq.nrm, qb.q_id, qb.qv, qb.qnrm,
                   CAST(bit_count(xor(bq.bits, qb.qbits)) AS BIGINT)
                     AS ham,
                   ROW_NUMBER() OVER (PARTITION BY qb.q_id
                     ORDER BY bit_count(xor(bq.bits, qb.qbits)) ASC,
                       bq.vec_id ASC) AS hr
                 FROM bq CROSS JOIN qb WHERE bq.vec_id <> qb.q_id)
               WHERE hr <= 32),
        sc AS (SELECT q_id, vec_id, ham,
                 ${dotSql("hc.v", "hc.qv")} / (hc.nrm * hc.qnrm) AS cosine
               FROM hc)
        SELECT q_id, vec_id, ham, cosine, rk FROM (
          SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY q_id
            ORDER BY cosine DESC, vec_id ASC) AS BIGINT) AS rk FROM sc)
        WHERE rk <= 5"""))
  ) :+ filteredAnnEntry :+ ivfRecallEntry :+ ivfPqEntry :+
    ivfPqRecallEntry :+ ivfMaintenanceEntry :+ retrainTriggerEntry :+
    negativeSampleEntry

  private lazy val negativeSampleEntry: Q =
    // ---- deterministic negative sampling for contrastive training -------
    //      k pseudo-random negatives per anchor, excluding self and known
    //      positives (here: exact-duplicate pairs — a twin sampled as a
    //      "negative" teaches the model to push duplicates apart). The
    //      scale shape is the point: draws index into a globally
    //      row-numbered corpus (q33's range-partition machinery) via
    //      md5(seed:anchor:j) mod N — anchors × (k+oversample) rows
    //      through ONE position join, never the all-pairs md5 ranking
    //      the naive form implies. Fully deterministic, so the oracle
    //      replays the exact sample: same row numbering, same 15-hex-md5
    //      positions, same anti-join exclusions, same draw-order keeps.
    Q("s28_negative_sample",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val h = docs.select(col("doc_id"),
          md5(col("text").cast("binary")).as("h"))
        val positives = h.as("ha").join(h.as("hb"),
            col("ha.h") === col("hb.h") &&
              col("ha.doc_id") < col("hb.doc_id"))
          .select(col("ha.doc_id").as("doc_a"), col("hb.doc_id").as("doc_b"))
        SimilarityOps.negativeSample(docs, positives, k = 4, seed = 5L)
      },
      Some("""
        WITH ix AS (SELECT doc_id,
                      ROW_NUMBER() OVER (ORDER BY doc_id) - 1 AS pos
                    FROM documents),
        nn AS (SELECT COUNT(*) AS n FROM documents),
        dr AS (SELECT d.doc_id, j.j,
                 CAST(concat('0x', substr(
                   md5('5:' || d.doc_id || ':' || j.j), 1, 15)) AS BIGINT)
                   % (SELECT n FROM nn) AS pos
               FROM documents d,
                 (SELECT unnest(range(0, 12)) AS j) j),
        res AS (SELECT dr.doc_id, dr.j, ix.doc_id AS neg_id
                FROM dr JOIN ix ON dr.pos = ix.pos
                WHERE ix.doc_id <> dr.doc_id),
        pp AS (SELECT a.doc_id AS doc_id, b.doc_id AS neg_id
               FROM documents a JOIN documents b
                 ON md5(a.text) = md5(b.text) AND a.doc_id <> b.doc_id),
        flt AS (SELECT r.doc_id, r.j, r.neg_id
                FROM res r LEFT JOIN pp
                  ON r.doc_id = pp.doc_id AND r.neg_id = pp.neg_id
                WHERE pp.doc_id IS NULL),
        dd AS (SELECT doc_id, neg_id, MIN(j) AS j
               FROM flt GROUP BY 1, 2),
        rk AS (SELECT doc_id, neg_id,
                 ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY j) - 1
                   AS draw
               FROM dd)
        SELECT doc_id, neg_id, CAST(draw AS BIGINT) AS draw
        FROM rk WHERE draw < 4"""))

  private lazy val ivfMaintenanceEntry: Q =
    // ---- IVF index maintenance without retraining (FAISS add/remove) --
    //      day-2 of a production vector index: a new batch (the corpus
    //      with reversed coordinates under offset ids — deterministic,
    //      distribution-shifted so insertions spread unevenly) is
    //      assigned to the EXISTING s20-trained cells, deletions arrive
    //      as tombstones (vec_id % 7), and the per-cell population
    //      ledger (before/inserted/deleted/after) is what tells the
    //      operator when drift justifies paying for a retrain. Two
    //      broadcast-argmin scans + three keyed counts; every cell
    //      row present including emptied ones.
    Q("s26_ivf_maintenance",
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        val trained = Clustering.refreshCentroids(
          Clustering.lloydPasses(Clustering.corpus(s, d), k = 8, iters = 2)
            .last)
        val incoming = emb.select(
          (col("vec_id") + 1000000L).as("vec_id"),
          reverse(col("embedding")).as("embedding"))
        val tomb = emb.select(col("vec_id")).filter(col("vec_id") % 7 === 0)
        SimilarityOps.ivfMaintenance(emb, incoming, tomb, trained)
      },
      Some(maintenanceLedgerSql +
        " SELECT cell, n_before, n_inserted, n_deleted, n_after FROM led"))

  /** s26's ledger as CTEs ending in `led` — shared verbatim by s27 so
    * the trigger gate pins the DECISION over the exact same ledger the
    * maintenance gate already proves. */
  private lazy val maintenanceLedgerSql: String =
    normCte + Clustering.lloydBodySql(8, 3) + s"""
        , inc AS (SELECT vec_id + 1000000 AS vec_id,
                    list_transform(range(1, len(v) + 1),
                      i -> v[len(v) - i + 1]) AS v
                  FROM e),
        ab AS (SELECT vec_id, cell FROM (
                 SELECT b.vec_id, t.cell,
                   ROW_NUMBER() OVER (PARTITION BY b.vec_id
                     ORDER BY ${l2sqSql("b.v", "t.cv")} ASC, t.cell ASC)
                     AS rn
                 FROM e b CROSS JOIN c2 t) WHERE rn = 1),
        ai AS (SELECT vec_id, cell FROM (
                 SELECT b.vec_id, t.cell,
                   ROW_NUMBER() OVER (PARTITION BY b.vec_id
                     ORDER BY ${l2sqSql("b.v", "t.cv")} ASC, t.cell ASC)
                     AS rn
                 FROM inc b CROSS JOIN c2 t) WHERE rn = 1),
        bb AS (SELECT cell, COUNT(*) AS n FROM ab GROUP BY 1),
        ii AS (SELECT cell, COUNT(*) AS n FROM ai GROUP BY 1),
        dd AS (SELECT cell, COUNT(*) AS n FROM ab
               WHERE vec_id % 7 = 0 GROUP BY 1),
        led AS (SELECT c2.cell,
          CAST(COALESCE(bb.n, 0) AS BIGINT) AS n_before,
          CAST(COALESCE(ii.n, 0) AS BIGINT) AS n_inserted,
          CAST(COALESCE(dd.n, 0) AS BIGINT) AS n_deleted,
          CAST(COALESCE(bb.n, 0) + COALESCE(ii.n, 0) - COALESCE(dd.n, 0)
            AS BIGINT) AS n_after
        FROM c2
        LEFT JOIN bb ON c2.cell = bb.cell
        LEFT JOIN ii ON c2.cell = ii.cell
        LEFT JOIN dd ON c2.cell = dd.cell)"""

  private lazy val retrainTriggerEntry: Q =
    // ---- retrain trigger over the s26 ledger ---------------------------
    //      the DECISION s26's ledger exists to feed: total-variation
    //      distance between before/after cell distributions (BIGINT
    //      numerator, one final double division — hash-exact) plus the
    //      hottest-cell imbalance ratio, thresholded into a retrain
    //      flag. Instructive negative: the reversed-coordinate batch
    //      PERMUTES mass but lands near-proportionally, and after
    //      mixing 50/50 with the base the after-vs-before TVD is tiny
    //      (0.03 at sf0.001) — staying silent is the CORRECT decision
    //      for a batch that didn't concentrate anywhere. The firing
    //      case (a positive-orthant-folded batch piling into few
    //      cells) plus the recompute twin (refreshCentroids strictly
    //      reducing SSE on the drifted corpus; in-distribution batch
    //      exactly tvd=0) are pinned in SimilarityOpsSpec.
    Q("s27_retrain_trigger",
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        val trained = Clustering.refreshCentroids(
          Clustering.lloydPasses(Clustering.corpus(s, d), k = 8, iters = 2)
            .last)
        val incoming = emb.select(
          (col("vec_id") + 1000000L).as("vec_id"),
          reverse(col("embedding")).as("embedding"))
        val tomb = emb.select(col("vec_id")).filter(col("vec_id") % 7 === 0)
        SimilarityOps.retrainTrigger(
          SimilarityOps.ivfMaintenance(emb, incoming, tomb, trained),
          tvdThreshold = 0.15, imbalanceThreshold = 2.0)
      },
      Some(maintenanceLedgerSql + """
        , tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_cells,
                    CAST(SUM(n_before) AS BIGINT) AS tb,
                    CAST(SUM(n_after) AS BIGINT) AS ta,
                    CAST(MAX(n_after) AS BIGINT) AS max_after
                  FROM led),
        tn AS (SELECT CAST(COALESCE(SUM(ABS(
                 led.n_after * tot.tb - led.n_before * tot.ta)), 0)
                 AS BIGINT) AS tvd_num
               FROM led CROSS JOIN tot),
        fin AS (SELECT tot.n_cells, tot.tb AS total_before,
                  tot.ta AS total_after, tn.tvd_num,
                  CASE WHEN tot.tb > 0 AND tot.ta > 0 THEN
                    CAST(tn.tvd_num AS DOUBLE) / (2.0 * tot.tb * tot.ta)
                  END AS tvd,
                  tot.max_after,
                  CASE WHEN tot.ta > 0 THEN
                    CAST(tot.max_after * tot.n_cells AS DOUBLE)
                      / CAST(tot.ta AS DOUBLE)
                  END AS imbalance
                FROM tot CROSS JOIN tn)
        SELECT n_cells, total_before, total_after, tvd_num, tvd,
          max_after, imbalance,
          (tvd > 0.15 OR imbalance > 2.0) AS retrain
        FROM fin"""))

  private lazy val ivfPqRecallEntry: Q =
    // ---- IVF-PQ recall@5 vs nProbe (s23's curve for the composed index)
    //      the dial a deployment actually reads: how much of the exact
    //      top-5 the FULL composed index (trained cells -> ADC pre-rank
    //      -> refine-64 exact re-rank) recovers at probes 1/2/4. One
    //      exact pass + one s24-shaped branch per depth; every branch
    //      replays value-for-value, so the recall fractions are exact
    //      on both engines and the curve is a real measurement, not a
    //      spec assertion. Measured at sf0.01: 0.88 / 0.92 / 0.88 —
    //      the probe-4 DIP is real and instructive: more probes mean
    //      more ADC candidates competing for the FIXED refine-64
    //      shortlist, so a true top-5 member can get crowded below the
    //      cut by quantization noise. Production rule: scale `refine`
    //      with nProbe (FAISS ships k_factor for exactly this).
    Q("s25_ivf_pq_recall",
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        val qs = emb.filter(col("vec_id") < 5)
        val trained = Clustering.refreshCentroids(
          Clustering.lloydPasses(Clustering.corpus(s, d), k = 8, iters = 2)
            .last)
        val exact = SimilarityOps.bruteForceTopK(emb, qs, k = 5)
          .select(col("q_id"), col("vec_id"))
        // ONE shared index build (cells/codes/ADC at the deepest probe),
        // each depth a filter+rank over it — never a rebuild per branch
        SimilarityOps.ivfPqBranches(emb, qs, k = 5, cents = trained,
            probes = Seq(1, 2, 4), m = 4, subDim = 16, nCodes = 8,
            refine = 64)
          .map { case (p, ann) =>
            exact.join(ann.select(col("q_id"), col("vec_id"))
                .withColumn("hit", lit(1)), Seq("q_id", "vec_id"), "left")
              .groupBy(col("q_id"))
              .agg(count(col("hit")).as("hits"))
              .select(lit(p.toLong).as("probes"), col("q_id"), col("hits"),
                (col("hits").cast("double") / lit(5)).as("recall"))
          }.reduce(_ unionByName _)
      },
      Some {
        def branch(p: Int): String = s"""
        qa$p AS (SELECT q_id, cell FROM (
          SELECT c.vec_id AS q_id, t.cell,
            ROW_NUMBER() OVER (PARTITION BY c.vec_id
              ORDER BY ${l2sqSql("c.v", "t.cv")} ASC, t.cell ASC) AS pr
          FROM n c CROSS JOIN c2 t WHERE c.vec_id < 5) WHERE pr <= $p),
        cd$p AS (SELECT qa$p.q_id, enc.vec_id, enc.sub, enc.code
                 FROM enc JOIN asg ON enc.vec_id = asg.vec_id
                   JOIN qa$p ON asg.cell = qa$p.cell
                 WHERE enc.vec_id <> qa$p.q_id),
        pp$p AS (SELECT cd$p.q_id, cd$p.vec_id,
                   CAST(SUM(qd.dq) AS BIGINT) AS adc_q
                 FROM cd$p JOIN qd ON qd.q_id = cd$p.q_id
                   AND qd.sub = cd$p.sub AND qd.code = cd$p.code
                 GROUP BY 1, 2),
        sl$p AS (SELECT q_id, vec_id FROM (
                   SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
                     ORDER BY adc_q ASC, vec_id ASC) AS ar FROM pp$p)
                 WHERE ar <= 64),
        ann$p AS (SELECT q_id, vec_id FROM (
                    SELECT sl$p.q_id, sl$p.vec_id,
                      CAST(ROW_NUMBER() OVER (PARTITION BY sl$p.q_id
                        ORDER BY ${dotSql("c.v", "q.v")} / (c.nrm * q.nrm)
                          DESC, sl$p.vec_id ASC) AS BIGINT) AS rk
                    FROM sl$p JOIN n c ON c.vec_id = sl$p.vec_id
                      JOIN n q ON q.vec_id = sl$p.q_id) WHERE rk <= 5),
        rec$p AS (SELECT CAST($p AS BIGINT) AS probes, ex.q_id,
                    COUNT(ann$p.vec_id) AS hits,
                    CAST(COUNT(ann$p.vec_id) AS DOUBLE) / 5 AS recall
                  FROM ex LEFT JOIN ann$p
                    ON ex.q_id = ann$p.q_id AND ex.vec_id = ann$p.vec_id
                  GROUP BY ex.q_id)"""
        normCte + Clustering.lloydBodySql(8, 3) + s"""
        , asg AS (SELECT vec_id, cell FROM (
          SELECT c.vec_id, t.cell,
            ROW_NUMBER() OVER (PARTITION BY c.vec_id
              ORDER BY ${l2sqSql("c.v", "t.cv")} ASC, t.cell ASC) AS rn
          FROM n c CROSS JOIN c2 t) WHERE rn = 1),
        subs AS (SELECT n.vec_id, t.sub,
                   list_slice(list_transform(v, x -> x / nrm),
                     t.sub * 16 + 1, t.sub * 16 + 16) AS sv
                 FROM n CROSS JOIN (VALUES (0), (1), (2), (3)) t(sub)),
        cb AS (SELECT sub, vec_id AS cell, sv AS cv FROM subs
               WHERE vec_id < 8),
        enc AS (SELECT vec_id, sub, code FROM (
                  SELECT s.vec_id, s.sub, cb.cell AS code,
                    ROW_NUMBER() OVER (PARTITION BY s.vec_id, s.sub
                      ORDER BY ${l2sqSql("s.sv", "cb.cv")} ASC, cb.cell ASC)
                      AS rn
                  FROM subs s JOIN cb USING (sub)) WHERE rn = 1),
        qd AS (SELECT s.vec_id AS q_id, s.sub, cb.cell AS code,
                 CAST(FLOOR(${l2sqSql("s.sv", "cb.cv")} * 1e9 + 0.5)
                   AS BIGINT) AS dq
               FROM subs s JOIN cb USING (sub) WHERE s.vec_id < 5),
        q AS (SELECT vec_id AS q_id, v AS qv, nrm AS qnrm FROM n
              WHERE vec_id < 5),
        pex AS (SELECT q.q_id, c.vec_id,
                  ${dotSql("c.v", "q.qv")} / (c.nrm * q.qnrm) AS cosine
                FROM n c, q WHERE c.vec_id <> q.q_id),
        ex AS (SELECT q_id, vec_id FROM (
                 SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
                   ORDER BY cosine DESC, vec_id ASC) AS rk FROM pex)
               WHERE rk <= 5),
        ${branch(1).stripPrefix("\n")},
        ${branch(2).stripPrefix("\n")},
        ${branch(4).stripPrefix("\n")}
        SELECT probes, q_id, hits, recall FROM rec1
        UNION ALL SELECT probes, q_id, hits, recall FROM rec2
        UNION ALL SELECT probes, q_id, hits, recall FROM rec4"""
      })

  private lazy val ivfPqEntry: Q =
    // ---- composed IVF-PQ (the FAISS IVFPQ production index) ------------
    //      the two halves already gated separately compose: s20's
    //      Lloyd-trained coarse cells pick WHICH vectors are candidates
    //      (nProbe=2 of 8 cells), s15's PQ codes + ADC table PRE-RANK
    //      them without touching raw corpus vectors, and the top-64
    //      ADC shortlist is re-ranked by exact cosine (the FAISS
    //      IndexRefineFlat composition — see the operator scaladoc for
    //      why pure ADC cannot rank this near-isotropic fixture). The
    //      oracle replays the full chain — Lloyd training, cell
    //      assignment, probing, NORMALIZED sub-vector encode (argmin by
    //      l2, ties to low code), the query's integer-quantized
    //      distance table, the per-candidate ADC sum, the refine cut,
    //      and the exact-cosine re-rank — value-for-value. The recall
    //      band vs the s23 IVF-flat curve at equal probe depth is
    //      pinned by SimilarityOpsSpec, not this gate.
    Q("s24_ivf_pq",
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        val trained = Clustering.refreshCentroids(
          Clustering.lloydPasses(Clustering.corpus(s, d), k = 8, iters = 2)
            .last)
        SimilarityOps.ivfPqTopK(emb, emb.filter(col("vec_id") < 5), k = 5,
          cents = trained, nProbe = 2, m = 4, subDim = 16, nCodes = 8,
          refine = 64)
      },
      Some(normCte + Clustering.lloydBodySql(8, 3) + s"""
        , asg AS (SELECT vec_id, cell FROM (
          SELECT c.vec_id, t.cell,
            ROW_NUMBER() OVER (PARTITION BY c.vec_id
              ORDER BY ${l2sqSql("c.v", "t.cv")} ASC, t.cell ASC) AS rn
          FROM n c CROSS JOIN c2 t) WHERE rn = 1),
        qa AS (SELECT q_id, cell FROM (
          SELECT c.vec_id AS q_id, t.cell,
            ROW_NUMBER() OVER (PARTITION BY c.vec_id
              ORDER BY ${l2sqSql("c.v", "t.cv")} ASC, t.cell ASC) AS pr
          FROM n c CROSS JOIN c2 t WHERE c.vec_id < 5) WHERE pr <= 2),
        subs AS (SELECT n.vec_id, t.sub,
                   list_slice(list_transform(v, x -> x / nrm),
                     t.sub * 16 + 1, t.sub * 16 + 16) AS sv
                 FROM n CROSS JOIN (VALUES (0), (1), (2), (3)) t(sub)),
        cb AS (SELECT sub, vec_id AS cell, sv AS cv FROM subs
               WHERE vec_id < 8),
        enc AS (SELECT vec_id, sub, code FROM (
                  SELECT s.vec_id, s.sub, cb.cell AS code,
                    ROW_NUMBER() OVER (PARTITION BY s.vec_id, s.sub
                      ORDER BY ${l2sqSql("s.sv", "cb.cv")} ASC, cb.cell ASC)
                      AS rn
                  FROM subs s JOIN cb USING (sub)) WHERE rn = 1),
        qd AS (SELECT s.vec_id AS q_id, s.sub, cb.cell AS code,
                 CAST(FLOOR(${l2sqSql("s.sv", "cb.cv")} * 1e9 + 0.5)
                   AS BIGINT) AS dq
               FROM subs s JOIN cb USING (sub) WHERE s.vec_id < 5),
        cand AS (SELECT qa.q_id, enc.vec_id, enc.sub, enc.code
                 FROM enc JOIN asg ON enc.vec_id = asg.vec_id
                   JOIN qa ON asg.cell = qa.cell
                 WHERE enc.vec_id <> qa.q_id),
        p AS (SELECT cand.q_id, cand.vec_id,
                CAST(SUM(qd.dq) AS BIGINT) AS adc_q
              FROM cand JOIN qd ON qd.q_id = cand.q_id
                AND qd.sub = cand.sub AND qd.code = cand.code
              GROUP BY 1, 2),
        sl AS (SELECT q_id, vec_id, adc_q FROM (
                 SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
                   ORDER BY adc_q ASC, vec_id ASC) AS ar FROM p)
               WHERE ar <= 64),
        rr AS (SELECT sl.q_id, sl.vec_id,
                 CAST(sl.adc_q AS DOUBLE) / 1e9 AS adc,
                 ${dotSql("c.v", "q.v")} / (c.nrm * q.nrm) AS cosine
               FROM sl JOIN n c ON c.vec_id = sl.vec_id
                 JOIN n q ON q.vec_id = sl.q_id)
        SELECT q_id, vec_id, adc, cosine, rk FROM (
          SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY q_id
            ORDER BY cosine DESC, vec_id ASC) AS BIGINT) AS rk FROM rr)
        WHERE rk <= 5"""))

  private lazy val ivfRecallEntry: Q =
    // ---- IVF recall@5 vs nProbe (the s14 curve for the IVF index) ------
    //      how much of the exact top-5 the celled index recovers at
    //      probes 1/2/4 of 8 seed cells — the quality dial a deployment
    //      reads against its latency budget. One exact pass + one ANN
    //      branch per probe depth; every branch is the s06 shape and
    //      all arithmetic replays bit-for-bit, so the recall fractions
    //      are exact on both engines.
    Q("s23_ivf_recall",
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        val qs = emb.filter(col("vec_id") < 5)
        val exact = SimilarityOps.bruteForceTopK(emb, qs, k = 5)
          .select(col("q_id"), col("vec_id"))
        // shared assignment + within-cell scores at the deepest depth;
        // each curve point filters the persisted candidate frame
        SimilarityOps.ivfBranches(emb, qs, k = 5, nCells = 8,
            probes = Seq(1, 2, 4))
          .map { case (p, ann) =>
            exact.join(ann.select(col("q_id"), col("vec_id"))
                .withColumn("hit", lit(1)), Seq("q_id", "vec_id"), "left")
              .groupBy(col("q_id"))
              .agg(count(col("hit")).as("hits"))
              .select(lit(p.toLong).as("probes"), col("q_id"), col("hits"),
                (col("hits").cast("double") / lit(5)).as("recall"))
          }.reduce(_ unionByName _)
      },
      Some {
        def annBranch(p: Int): String = s"""
        qa$p AS (SELECT q_id, qv, qnrm, cell FROM (
          SELECT c.vec_id AS q_id, c.v AS qv, c.nrm AS qnrm, t.cell,
            ROW_NUMBER() OVER (PARTITION BY c.vec_id
              ORDER BY ${l2sqSql("c.v", "t.cv")} ASC, t.cell ASC) AS pr
          FROM n c CROSS JOIN cents t WHERE c.vec_id < 5) WHERE pr <= $p),
        ann$p AS (SELECT q_id, vec_id FROM (
          SELECT qa$p.q_id, a.vec_id,
            CAST(ROW_NUMBER() OVER (PARTITION BY qa$p.q_id ORDER BY
              ${dotSql("a.v", s"qa$p.qv")} / (a.nrm * qa$p.qnrm) DESC,
              a.vec_id ASC) AS BIGINT) AS rk
          FROM asg a JOIN qa$p USING (cell)
          WHERE a.vec_id <> qa$p.q_id) WHERE rk <= 5),
        rec$p AS (SELECT CAST($p AS BIGINT) AS probes, ex.q_id,
            COUNT(ann$p.vec_id) AS hits,
            CAST(COUNT(ann$p.vec_id) AS DOUBLE) / 5 AS recall
          FROM ex LEFT JOIN ann$p
            ON ex.q_id = ann$p.q_id AND ex.vec_id = ann$p.vec_id
          GROUP BY ex.q_id)"""
        normCte + s"""
        , cents AS (SELECT vec_id AS cell, v AS cv FROM n WHERE vec_id < 8),
        asg AS (SELECT vec_id, v, nrm, cell FROM (
          SELECT c.vec_id, c.v, c.nrm, t.cell,
            ROW_NUMBER() OVER (PARTITION BY c.vec_id
              ORDER BY ${l2sqSql("c.v", "t.cv")} ASC, t.cell ASC) AS rn
          FROM n c CROSS JOIN cents t) WHERE rn = 1),
        q AS (SELECT vec_id AS q_id, v AS qv, nrm AS qnrm FROM n
              WHERE vec_id < 5),
        ex AS (SELECT q_id, vec_id FROM (
          SELECT q.q_id, c.vec_id,
            CAST(ROW_NUMBER() OVER (PARTITION BY q.q_id ORDER BY
              ${dotSql("c.v", "q.qv")} / (c.nrm * q.qnrm) DESC,
              c.vec_id ASC) AS BIGINT) AS rk
          FROM n c, q WHERE c.vec_id <> q.q_id) WHERE rk <= 5),
        ${annBranch(1).stripPrefix("\n")},
        ${annBranch(2).stripPrefix("\n")},
        ${annBranch(4).stripPrefix("\n")}
        SELECT probes, q_id, hits, recall FROM rec1
        UNION ALL SELECT probes, q_id, hits, recall FROM rec2
        UNION ALL SELECT probes, q_id, hits, recall FROM rec4"""
      })

  private lazy val filteredAnnEntry: Q =
    // ---- filtered vector search (metadata predicate + top-k) -----------
    //      candidates must share the query's label: the predicate joins
    //      INTO candidate generation (broadcast query set keyed by
    //      label), so the filter SHRINKS the scan — post-filtering a
    //      global top-k instead can come up short on selective
    //      predicates, the classic filtered-ANN failure. Exact cosine,
    //      keyed top-5, oracle replays join + fold + rank.
    Q("s22_filtered_ann",
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        SimilarityOps.filteredTopK(emb, emb.filter(col("vec_id") < 5),
          k = 5, attr = "label")
      },
      Some(normCte + s"""
        , lab AS (SELECT vec_id, label FROM embeddings),
        q AS (SELECT n.vec_id AS q_id, lab.label AS q_attr,
                n.v AS qv, n.nrm AS qnrm
              FROM n JOIN lab USING (vec_id) WHERE n.vec_id < 5),
        p AS (SELECT q.q_id, c.vec_id,
                ${dotSql("c.v", "q.qv")} / (c.nrm * q.qnrm) AS cosine
              FROM n c JOIN lab cl ON cl.vec_id = c.vec_id
              JOIN q ON cl.label = q.q_attr AND c.vec_id <> q.q_id)
        SELECT q_id, vec_id, cosine, rk FROM (
          SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY q_id
            ORDER BY cosine DESC, vec_id ASC) AS BIGINT) AS rk FROM p)
        WHERE rk <= 5"""))

  /** s21 oracle: the 64-term sign-bit sum — literal values identical to
    * the engine's (1L << j) terms incl. the negative bit-63 literal. */
  private def signBits64Sql(v: String): String =
    (0 until 64).map { j =>
      s"CASE WHEN $v[${j + 1}] > 0 THEN CAST(${1L << j} AS BIGINT) ELSE CAST(0 AS BIGINT) END"
    }.mkString("(", "\n                 + ", ")")

  /** s18 oracle: the jlSignMatrix rows as DuckDB VALUES tuples, from the
    * SAME Scala call the engine embeds as plan literals. */
  private def jlMatrixValuesSql(inDims: Int, outDims: Int): String =
    graft.operators.SimilarityOps.jlSignMatrix(inDims, outDims)
      .zipWithIndex
      .map { case (row, k) =>
        s"($k, [${row.map(x => if (x > 0) "1.0" else "-1.0").mkString(", ")}])"
      }
      .mkString(",\n          ")
}
