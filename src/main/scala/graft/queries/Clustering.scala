package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.io.Tables
import graft.operators.SimilarityOps

/** Clustering analytics over `embeddings` — the k-means training step the
  * IVF index docstring defers to ("a production index would k-means-train
  * these offline") plus nearest-centroid evaluation, as gate-checked
  * distributed operators.
  *
  * Assignment is the IVF shape: broadcast the centroid table, argmin by
  * L2 via a partial-aggregated min-struct — one shuffle keyed by vec_id,
  * linear in corpus size. Per-cluster means go through DECIMAL sums so
  * the oracle's aggregation order cannot change the result (double sums
  * are order-sensitive; decimal sums are exact and commutative).
  */
object Clustering {

  /** corpus as (vec_id, v: array<double>) + the first-k deterministic
    * seed centroids, shared by both queries */
  private def assigned(s: SparkSession, d: String, k: Int): DataFrame = {
    val emb = SimilarityOps.prepared(Tables.embeddings(s, d))
      .select(col("vec_id"), col("v"))
    val cents = emb.filter(col("vec_id") < k)
      .select(col("vec_id").as("cell"), col("v").as("cv"))
    emb.crossJoin(broadcast(cents))
      .withColumn("d2", call_function("vec_l2sq", col("v"), col("cv")))
      .groupBy(col("vec_id"))
      .agg(min(struct(col("d2"), col("cell"))).getField("cell").as("cell"),
        first(col("v")).as("v"))
  }

  private def l2sqSql(a: String, b: String) =
    s"""list_reduce(list_prepend(0.0,
       list_transform(range(1, len($a) + 1),
         i -> ($a[i] - $b[i]) * ($a[i] - $b[i]))),
       (x, y) -> x + y)"""

  private val assignCte = s"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) v FROM embeddings),
    c AS (SELECT vec_id AS cell, v AS cv FROM e WHERE vec_id < 8),
    d AS (SELECT e.vec_id, c.cell, ${l2sqSql("e.v", "c.cv")} AS d2 FROM e, c),
    a AS (SELECT vec_id, cell FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
              ORDER BY d2 ASC, cell ASC) AS rk FROM d)
          WHERE rk = 1)
  """

  val qs: Seq[Q] = Seq(

    // ---- one Lloyd update step (assignment + per-cluster means) ---------
    //      reported for the first 4 dimensions: member counts and exact
    //      decimal-summed coordinate means — the centroid refresh an IVF
    //      index runs offline, expressed as broadcast-argmin + one keyed
    //      aggregation (no per-iteration driver involvement)
    Q("c01_kmeans_step",
      (s, d) => assigned(s, d, k = 8)
        .select(col("cell"), explode(array((0 until 4).map(lit): _*)).as("dim"),
          col("v"))
        .withColumn("coord", element_at(col("v"), col("dim") + 1))
        .groupBy(col("cell"), col("dim").cast("long").as("dim"))
        .agg(count(lit(1)).as("n_members"),
          sum(col("coord").cast("decimal(18,9)")).cast("double").as("sum_coord"))
        .withColumn("mean_coord", col("sum_coord") / col("n_members")),
      Some(assignCte + """
        , m AS (SELECT a.cell, t.dim, e.v[t.dim + 1] AS coord
                FROM a JOIN e USING (vec_id)
                CROSS JOIN (VALUES (0), (1), (2), (3)) t(dim))
        SELECT cell, CAST(dim AS BIGINT) AS dim, COUNT(*) AS n_members,
          CAST(SUM(CAST(coord AS DECIMAL(18,9))) AS DOUBLE) AS sum_coord,
          CAST(SUM(CAST(coord AS DECIMAL(18,9))) AS DOUBLE) / COUNT(*)
            AS mean_coord
        FROM m GROUP BY cell, dim""")),

    // ---- nearest-centroid confusion vs the true labels ------------------
    //      the evaluation step of centroid-based classification/indexing:
    //      how each labeled class distributes over the 8 seed cells
    Q("c02_centroid_confusion",
      (s, d) => assigned(s, d, k = 8)
        .join(Tables.embeddings(s, d).select(col("vec_id"),
          col("label").cast("long").as("label")), "vec_id")
        .groupBy(col("label"), col("cell"))
        .agg(count(lit(1)).as("n")),
      Some(assignCte + """
        SELECT CAST(label AS BIGINT) AS label, cell, COUNT(*) AS n
        FROM a JOIN embeddings USING (vec_id)
        GROUP BY 1, 2"""))
  )
}
