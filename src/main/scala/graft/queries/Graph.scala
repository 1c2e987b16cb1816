package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.io.Tables
import graft.operators.GraphOps

/** Gate-visible graph analytics over graphs derived from the star
  * schema:
  *  - the BIPARTITE trade graph — customer c and supplier s are linked
  *    iff c ordered from s (orders x lineitem, distinct pairs), node ids
  *    disambiguated as custkey*2 / suppkey*2+1, bidirectionalized so
  *    every node has out-edges;
  *  - the CO-PURCHASE part graph — parts u < v are linked iff they
  *    appear together in >= 2 orders (the noise-floor filter that keeps
  *    a co-occurrence graph sparse instead of quadratic-dense).
  *
  * Every query is a fixed-iteration computation so the DuckDB oracle
  * replays it exactly: PageRank as a CTE chain (one CTE per iteration),
  * BFS as a bounded recursive CTE, triangles as the canonical
  * a<b<c three-way self-join (count is orientation-independent, so the
  * oracle can use the simple formulation while Spark runs the
  * degree-oriented one that survives skew).
  */
object Graph {

  /** distinct customer->supplier pairs with disjoint long ids */
  private def bipartitePairs(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey"))
      .join(Tables.lineitem(s, d).select(col("l_orderkey"), col("l_suppkey")),
        col("o_orderkey") === col("l_orderkey"))
      .select((col("o_custkey") * 2).as("a"),
        (col("l_suppkey") * 2 + 1).as("b"))
      .distinct()

  /** both directions of the bipartite graph: (src, dst) */
  private def bipartiteEdges(s: SparkSession, d: String): DataFrame = {
    val und = bipartitePairs(s, d)
    und.select(col("a").as("src"), col("b").as("dst"))
      .union(und.select(col("b").as("src"), col("a").as("dst")))
  }

  private val bipartiteSql = """
    und AS (
      SELECT DISTINCT o_custkey * 2 AS a, l_suppkey * 2 + 1 AS b
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
    edges AS (
      SELECT a AS src, b AS dst FROM und
      UNION ALL
      SELECT b AS src, a AS dst FROM und)"""

  /** CTE chain replaying `iters` PageRank rounds with the same exact
    * decimal contribution sums as GraphOps.pageRank. */
  private def pageRankSql(iters: Int): String = {
    val sb = new StringBuilder("WITH" + bipartiteSql + """,
    deg AS (SELECT src, COUNT(*) AS outdeg FROM edges GROUP BY src),
    nn AS (SELECT COUNT(*) AS n FROM deg),
    r0 AS (SELECT src AS id, CAST(1.0 AS DOUBLE) / nn.n AS rank
           FROM deg, nn)""")
    // 1e-15 fixed-point quantization, mirrored from GraphOps.pageRank:
    // floor(x*1e15+0.5) into BIGINT is pure IEEE + integer arithmetic,
    // identical on both engines (double->DECIMAL casts round differently
    // on the JVM vs DuckDB — the g07 lesson)
    for (i <- 0 until iters) sb ++= s""",
    r${i + 1} AS (
      SELECT id, CAST(0.15 AS DOUBLE) / (SELECT n FROM nn)
               + CAST(0.85 AS DOUBLE) * m AS rank
      FROM (
        SELECT e.dst AS id,
          SUM(CAST(FLOOR(r.rank / d.outdeg * 1e15 + 0.5) AS BIGINT)) / 1e15
            AS m
        FROM edges e JOIN r$i r ON e.src = r.id JOIN deg d ON e.src = d.src
        GROUP BY e.dst))"""
    sb ++= s"""
    SELECT id,
      CASE WHEN id % 2 = 0 THEN 'customer' ELSE 'supplier' END AS kind,
      rank
    FROM r$iters"""
    sb.toString
  }

  /** the DIRECTED trade graph (customer -> supplier, no reverse
    * edges): suppliers are sinks and customers are sources — the graph
    * shape g07's dangling-mass PageRank exists for */
  private val directedSql = """
    und AS (
      SELECT DISTINCT o_custkey * 2 AS a, l_suppkey * 2 + 1 AS b
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
    edges AS (SELECT a AS src, b AS dst FROM und)"""

  /** CTE chain replaying `iters` dangling-mass PageRank rounds with the
    * same decimal-exact sums and the identical double expression tree
    * as GraphOps.pageRankDangling:
    *   rank' = 0.15/N + 0.85 * (COALESCE(m, 0) + dm/N)
    * with m the per-node decimal contribution sum and dm the decimal
    * sum of ranks on sink nodes. */
  private def pageRankDanglingSql(iters: Int): String = {
    val sb = new StringBuilder("WITH" + directedSql + """,
    deg AS (SELECT src, COUNT(*) AS outdeg FROM edges GROUP BY src),
    nodes AS (SELECT src AS id FROM edges UNION SELECT dst FROM edges),
    nn AS (SELECT COUNT(*) AS n FROM nodes),
    dang AS (SELECT id FROM nodes
             WHERE id NOT IN (SELECT src FROM edges)),
    r0 AS (SELECT id, CAST(1.0 AS DOUBLE) / nn.n AS rank FROM nodes, nn)""")
    // fixed-point quantization mirrors GraphOps.pageRankDangling exactly:
    // floor(x*1e15 + 0.5) into BIGINT is pure IEEE-double + integer
    // arithmetic, identical on both engines (a double->DECIMAL cast is
    // not: JVM rounds the shortest decimal rendering, DuckDB the binary
    // expansion)
    for (i <- 0 until iters) sb ++= s""",
    dm$i AS (
      SELECT COALESCE(
        SUM(CAST(FLOOR(rank * 1e15 + 0.5) AS BIGINT)) / 1e15,
        CAST(0 AS DOUBLE)) AS dm
      FROM r$i WHERE id IN (SELECT id FROM dang)),
    r${i + 1} AS (
      SELECT nd.id,
        CAST(0.15 AS DOUBLE) / (SELECT n FROM nn)
          + CAST(0.85 AS DOUBLE) * (COALESCE(c.m, CAST(0 AS DOUBLE))
              + (SELECT dm FROM dm$i) / (SELECT n FROM nn)) AS rank
      FROM nodes nd LEFT JOIN (
        SELECT e.dst AS id,
          SUM(CAST(FLOOR(r.rank / d.outdeg * 1e15 + 0.5) AS BIGINT)) / 1e15
            AS m
        FROM edges e JOIN r$i r ON e.src = r.id JOIN deg d ON e.src = d.src
        GROUP BY e.dst) c ON nd.id = c.id)"""
    sb ++= s"""
    SELECT id,
      CASE WHEN id % 2 = 0 THEN 'customer' ELSE 'supplier' END AS kind,
      rank
    FROM r$iters"""
    sb.toString
  }

  /** co-purchase part graph: canonical (u < v) pairs co-ordered >= 2
    * times — shared by g02 (triangles) and g04 (components) */
  private[graft] def coPurchasePairs(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
    li.as("x")
      .join(li.as("y"),
        col("x.ok") === col("y.ok") && col("x.pk") < col("y.pk"))
      .groupBy(col("x.pk").as("u"), col("y.pk").as("v"))
      .agg(count(lit(1)).as("w"))
      .filter(col("w") >= 2)
      .select(col("u"), col("v"))
  }

  private val coPurchaseSql = """
    pairs AS (
      SELECT x.l_partkey AS u, y.l_partkey AS v
      FROM lineitem x JOIN lineitem y
        ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey
      GROUP BY 1, 2 HAVING COUNT(*) >= 2)"""

  val qs: Seq[Q] = Seq(

    // ---- fixed-iteration PageRank over the trade graph ------------------
    //      3 rounds, damping 0.85: each round is one shuffle join of the
    //      rank frame against the persisted adjacency plus one keyed
    //      decimal-exact aggregation — the iterative-analytics shape
    //      (centrality over a source/link graph) with zero driver-side
    //      state. Oracle replays the identical arithmetic as a CTE chain.
    Q("g01_pagerank",
      (s, d) => GraphOps.pageRank(bipartiteEdges(s, d), iters = 3)
        .select(col("id"),
          when(col("id") % 2 === 0, "customer").otherwise("supplier")
            .as("kind"),
          col("rank")),
      Some(pageRankSql(3))),

    // ---- degree-oriented triangle census of the co-purchase graph -------
    //      edges = part pairs co-ordered >= 2 times; Spark runs the
    //      orientation-bounded wedge join (out-degree capped at
    //      O(sqrt(|E|)) — the formulation that survives power-law skew),
    //      the oracle counts the same triangles via the canonical
    //      a<b<c self-join. Global clustering = 3*triangles/wedges.
    Q("g02_triangle_count",
      (s, d) => GraphOps.triangleStats(coPurchasePairs(s, d)),
      Some("WITH " + coPurchaseSql + """,
        deg AS (
          SELECT id, COUNT(*) AS deg FROM (
            SELECT u AS id FROM pairs UNION ALL SELECT v AS id FROM pairs)
          GROUP BY id),
        tri AS (
          SELECT COUNT(*) AS n_triangles
          FROM pairs e1
          JOIN pairs e2 ON e1.v = e2.u
          JOIN pairs e3 ON e3.u = e1.u AND e3.v = e2.v)
        SELECT
          (SELECT COUNT(*) FROM deg) AS n_nodes,
          (SELECT COUNT(*) FROM pairs) AS n_edges,
          (SELECT CAST(SUM(deg * (deg - 1)) // 2 AS BIGINT) FROM deg)
            AS n_wedges,
          (SELECT n_triangles FROM tri) AS n_triangles,
          CAST(3.0 AS DOUBLE) * (SELECT n_triangles FROM tri)
            / (SELECT SUM(deg * (deg - 1)) // 2 FROM deg)
            AS global_clustering""")),

    // ---- bounded BFS reachability from one customer ---------------------
    //      3-hop frontier expansion from customer #1 (node id 2) over the
    //      trade graph: per-round work is frontier-out-edges only, the
    //      visited set is persisted and anti-joined — reachability sizes
    //      per hop. Oracle: bounded recursive CTE + min-hop dedup.
    Q("g03_bfs_reachability",
      (s, d) => GraphOps.bfsHops(bipartiteEdges(s, d), start = 2L, maxHops = 3)
        .groupBy(col("hop"))
        .agg(count(lit(1)).as("n_nodes")),
      Some("""
        WITH RECURSIVE""" + bipartiteSql + """,
        walk AS (
          SELECT CAST(2 AS BIGINT) AS id, CAST(0 AS BIGINT) AS hop
          UNION
          SELECT e.dst, w.hop + 1 FROM walk w
          JOIN edges e ON w.id = e.src
          WHERE w.hop < 3)
        SELECT min_hop AS hop, COUNT(*) AS n_nodes FROM (
          SELECT id, MIN(hop) AS min_hop FROM walk GROUP BY id)
        GROUP BY 1""")),

    // ---- connected components via large-star / small-star ---------------
    //      the log-round star-contraction algorithm (not naive min-label
    //      propagation, which needs diameter-many rounds) over the
    //      co-purchase graph; reported as the component-size histogram.
    //      Component labels are the minimum reachable node id —
    //      deterministic however the contraction converges — so the
    //      oracle's recursive-CTE transitive closure must agree exactly.
    Q("g04_connected_components",
      (s, d) => GraphOps.connectedComponents(coPurchasePairs(s, d))
        .groupBy(col("component"))
        .agg(count(lit(1)).as("component_size"))
        .groupBy(col("component_size"))
        .agg(count(lit(1)).as("n_components")),
      Some("WITH RECURSIVE " + coPurchaseSql + """,
        e AS (SELECT u AS s, v AS t FROM pairs
              UNION ALL SELECT v, u FROM pairs),
        reach AS (
          SELECT s, t FROM e
          UNION
          SELECT r.s, e.t FROM reach r JOIN e ON r.t = e.s),
        lab AS (SELECT s AS id, LEAST(s, MIN(t)) AS component
                FROM reach GROUP BY s),
        sizes AS (SELECT component, COUNT(*) AS component_size
                  FROM lab GROUP BY 1)
        SELECT component_size, COUNT(*) AS n_components
        FROM sizes GROUP BY component_size""")),

    // ---- label-propagation communities ----------------------------------
    //      2 synchronous LPA rounds over the co-purchase graph from
    //      identity labels; each node adopts its neighbors' most frequent
    //      label, smallest label on ties — a total order, so the rounds
    //      replay exactly on any engine (generic LPA is notoriously
    //      nondeterministic; the tiebreak is what makes it gateable).
    //      Reported as the community-size histogram.
    Q("g06_label_propagation",
      (s, d) => {
        // one pair frame referenced by both union branches — the two
        // self-join subtrees stay identical, so ReuseExchange computes
        // the co-purchase join once
        val p = coPurchasePairs(s, d)
        GraphOps.labelPropagation(
          p.select(col("u").as("src"), col("v").as("dst"))
            .unionByName(p.select(col("v").as("src"), col("u").as("dst"))),
          rounds = 2)
          .groupBy(col("label"))
          .agg(count(lit(1)).as("community_size"))
          .groupBy(col("community_size"))
          .agg(count(lit(1)).as("n_communities"))
      },
      Some("WITH " + coPurchaseSql + """,
        e AS (SELECT u AS src, v AS dst FROM pairs
              UNION ALL SELECT v, u FROM pairs),
        l0 AS (SELECT DISTINCT src AS id, src AS label FROM e),
        r1 AS (
          SELECT id, label FROM (
            SELECT e.dst AS id, l.label, COUNT(*) AS c,
              ROW_NUMBER() OVER (PARTITION BY e.dst
                ORDER BY COUNT(*) DESC, l.label ASC) AS rn
            FROM e JOIN l0 l ON e.src = l.id GROUP BY e.dst, l.label)
          WHERE rn = 1),
        r2 AS (
          SELECT id, label FROM (
            SELECT e.dst AS id, l.label, COUNT(*) AS c,
              ROW_NUMBER() OVER (PARTITION BY e.dst
                ORDER BY COUNT(*) DESC, l.label ASC) AS rn
            FROM e JOIN r1 l ON e.src = l.id GROUP BY e.dst, l.label)
          WHERE rn = 1),
        sizes AS (SELECT label, COUNT(*) AS community_size
                  FROM r2 GROUP BY 1)
        SELECT community_size, COUNT(*) AS n_communities
        FROM sizes GROUP BY 1""")),

    // ---- dangling-mass PageRank over the DIRECTED trade graph -----------
    //      customer -> supplier only: every supplier is a sink (no
    //      out-edges) and every customer a source (no in-edges) — the
    //      graph g01's precondition excludes. Each round redistributes
    //      the decimal-exact mass sitting on sinks uniformly (Page et
    //      al. 1999), so total rank stays ~1 instead of leaking to the
    //      teleport floor; sources keep rank rows via the node left
    //      join. Oracle replays the identical arithmetic per round.
    Q("g07_pagerank_dangling",
      (s, d) => GraphOps.pageRankDangling(
        bipartitePairs(s, d).select(col("a").as("src"), col("b").as("dst")),
        iters = 3)
        .select(col("id"),
          when(col("id") % 2 === 0, "customer").otherwise("supplier")
            .as("kind"),
          col("rank")),
      Some(pageRankDanglingSql(3))),

    // ---- incremental connected components -------------------------------
    //      the d13 story for graphs: base graph = 90% of co-purchase
    //      edges (deterministic (u+v)%10 split), labeled by full star
    //      contraction; the remaining 10% arrive as a NEW edge batch and
    //      only the component-level graph they touch is re-contracted —
    //      O(|batch|) work however large the base. The oracle computes
    //      components over ALL edges at once, so the gate proves
    //      incremental == full recompute, label for label.
    Q("g08_incremental_components",
      (s, d) => {
        val p = coPurchasePairs(s, d)
        val baseE = p.filter((col("u") + col("v")) % 10 =!= 0)
        val batch = p.filter((col("u") + col("v")) % 10 === 0)
        GraphOps.incrementalComponents(
          GraphOps.connectedComponents(baseE), batch)
      },
      Some("WITH RECURSIVE " + coPurchaseSql + """,
        e AS (SELECT u AS s, v AS t FROM pairs
              UNION ALL SELECT v, u FROM pairs),
        reach AS (
          SELECT s, t FROM e
          UNION
          SELECT r.s, e.t FROM reach r JOIN e ON r.t = e.s),
        lab AS (SELECT s AS id, LEAST(s, MIN(t)) AS component
                FROM reach GROUP BY s)
        SELECT id, component FROM lab""")),

    // ---- recursive CTE through the SQL FRONTEND --------------------------
    //      the same bounded reachability as g03, but parsed, planned and
    //      executed by Spark's own WITH RECURSIVE support (new in Spark
    //      4) — the body below runs VERBATIM on both engines, modulo
    //      dialect: Spark recursion requires UNION ALL (so the min-hop
    //      dedup happens outside the recursion), and the bound keeps the
    //      path expansion finite and small. Graph recursion at real
    //      scale still belongs to the checkpointed operators (g03/g04);
    //      this gates the frontend's iterative execution path itself.
    Q("g05_recursive_sql",
      (s, d) => {
        Tables.orders(s, d).createOrReplaceTempView("g05_orders")
        Tables.lineitem(s, d).createOrReplaceTempView("g05_lineitem")
        s.sql(recursiveWalk("g05_orders", "g05_lineitem"))
      },
      Some(recursiveWalk("orders", "lineitem"))),

    // ---- bounded weighted shortest paths (Bellman-Ford) -----------------
    //      5 relaxation sweeps from customer #1 (node 2) over the trade
    //      graph with deterministic integer edge weights 1 + (src+dst)%7
    //      — exact distances for all paths of <= 5 edges. Integer
    //      arithmetic + order-free min() make the fixed-round replay
    //      bit-exact; the oracle runs the same 5 sweeps as an explicit
    //      CTE chain (recursive SQL would enumerate PATHS — exponential
    //      — while Bellman-Ford carries one row per settled node).
    //      Reported as the distance histogram.
    Q("g09_weighted_paths",
      (s, d) => GraphOps.boundedSssp(
          bipartiteEdges(s, d).withColumn("w",
            lit(1) + (col("src") + col("dst")) % 7),
          start = 2L, rounds = 5)
        .groupBy(col("dist"))
        .agg(count(lit(1)).as("n_nodes")),
      Some(ssspSql(5))),

    // ---- fixed-round k-core peel ----------------------------------------
    //      5 peel rounds at k=3 over the co-purchase graph, reported as
    //      the survival curve (round, nodes, directed edges). At sf0.01
    //      the cascade is real: 1892 -> 1294 -> 1154 -> ... -> a 1065-
    //      node 3-core (each removal drops neighbors below k in turn);
    //      fixed rounds keep the replay exact whether or not the peel
    //      has converged at a given SF. The oracle repeats the identical
    //      rounds as MATERIALIZED CTEs (each e_i is referenced three
    //      times — by the next filter, the next edge set and its own
    //      stats row — so an inlining planner would expand the chain
    //      exponentially, the t22 lesson).
    Q("g10_kcore",
      (s, d) => {
        val p = coPurchasePairs(s, d)
        GraphOps.kcorePeel(
          p.select(col("u").as("src"), col("v").as("dst"))
            .union(p.select(col("v").as("src"), col("u").as("dst"))),
          k = 3, rounds = 5)
      },
      Some(kcoreSql(3, 5))),

    // ---- personalized PageRank (seed-restart, the g07 twin) -------------
    //      teleport AND dangling mass return to the seed customers
    //      (ids < 100, even = customers) instead of all nodes, so ranks
    //      measure proximity to the seeds — the domain-trust-from-seeds
    //      propagation a crawl-curation pipeline runs. Same directed
    //      customer->supplier graph, same 1e-15 fixed-point portability
    //      as g07; the oracle replays the identical expression tree
    //      with the seed CASE on every teleport/dangling term.
    Q("g11_personalized_pagerank",
      (s, d) => {
        import s.implicits._
        val seeds = (0L until 100L by 2).toDF("id")
        GraphOps.personalizedPageRank(
          bipartitePairs(s, d)
            .select(col("a").as("src"), col("b").as("dst")),
          seeds, iters = 3)
          .select(col("id"),
            when(col("id") % 2 === 0, "customer").otherwise("supplier")
              .as("kind"),
            col("rank"))
      },
      Some(pprSql(3))),

    // ---- HyperBall neighborhood function (Boldi & Vigna 2013) ----------
    //      the sketch-based reachability curve: N(t) = Σ_root |B(root,t)|
    //      for t = 0..2 over the bipartite trade graph, with per-node
    //      ball sizes estimated by HLL sketches instead of exact
    //      reachable sets (which are |V|² and infeasible at 100 TB —
    //      HyperBall is THE centrality/diameter algorithm at that
    //      scale). Gated the ds01 way: the curve is reported for a
    //      DETERMINISTIC ADAPTIVE root sample — modulus m = the smallest
    //      power of two with m·96 ≥ |V|, so ~100 roots at every SF (an
    //      integer rule both engines replay exactly; a fixed modulus
    //      would make the exact verification side quadratic at scale) —
    //      alongside the EXACT multi-source-BFS ball count and a
    //      within-band boolean. The accuracy/size dial is HyperBall's
    //      own: lgK 12 with a 2% band when |V| ≤ 4096 (fixture scale —
    //      sketches near-exact below/near sparse promotion, measured
    //      ≤0.8% off), lgK 9 with a 10% band above (512 B registers,
    //      measured ~3.5% off at sf0.1 — the bench-scale setting; the
    //      gate SFs always take the tight branch). The exact side
    //      exists ONLY to gate the sketch path (production runs
    //      sketches alone); with ~100 roots it is O(100·|ball|), not
    //      O(|V|·|ball|).
    Q("g12_hyperball",
      (s, d) => {
        import s.implicits._
        val e = bipartiteEdges(s, d).localCheckpoint(false)
        val nNodes = e.select(col("src")).distinct().count()
        val m = Iterator.iterate(2L)(_ * 2).find(_ * 96 >= nNodes).get
        val (lgK, band) = if (nNodes <= 4096) (12, 0.02) else (9, 0.10)
        val est = GraphOps.hyperBall(e, hops = 2, lgK = lgK)
          .filter(col("id") % m === 0)
          .groupBy(col("hop"))
          .agg(count(lit(1)).as("n_roots"), sum(col("est")).as("est_total"))
        val roots = e.select(col("src").as("id")).distinct()
          .filter(col("id") % m === 0)
        var ball = roots
          .select(col("id").as("root"), col("id"), lit(0L).as("mh"))
          .localCheckpoint(false)
        for (t <- 1 to 2) {
          ball = ball.join(e, ball("id") === e("src"))
            .select(col("root"), col("dst").as("id"), lit(t.toLong).as("mh"))
            .unionByName(ball)
            .groupBy(col("root"), col("id")).agg(min(col("mh")).as("mh"))
            .localCheckpoint(false)
        }
        val grid = Seq(0L, 1L, 2L).toDF("hop")
        val exact = grid.join(ball, ball("mh") <= grid("hop"))
          .groupBy(col("hop")).agg(count(lit(1)).as("n_ball_exact"))
        exact.join(est, Seq("hop"))
          .select(col("hop"), col("n_roots"), col("n_ball_exact"),
            (abs(col("est_total") - col("n_ball_exact")).cast("double") <=
              col("n_ball_exact").cast("double") * band)
              .as("est_within_band"))
      },
      Some("""
        WITH RECURSIVE""" + bipartiteSql + """,
        nodes AS (SELECT DISTINCT src FROM edges),
        nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM nodes),
        -- powers of 2 through 2^30: covers |V| up to ~10^11 so MIN(p)
        -- can never be NULL on any input this oracle will see (a NULL
        -- modulus would silently select zero roots)
        mm AS (SELECT MIN(CAST(p AS BIGINT)) AS m
               FROM (VALUES (2), (4), (8), (16), (32),
                 (64), (128), (256), (512), (1024), (2048), (4096),
                 (8192), (16384), (32768), (65536), (131072), (262144),
                 (524288), (1048576), (2097152), (4194304), (8388608),
                 (16777216), (33554432), (67108864), (134217728),
                 (268435456), (536870912), (1073741824)) v(p)
               WHERE CAST(p AS BIGINT) * 96 >= (SELECT n FROM nn)),
        roots AS (SELECT src AS root FROM nodes
                  WHERE src % (SELECT m FROM mm) = 0),
        walk AS (
          SELECT root, root AS id, CAST(0 AS BIGINT) AS hop FROM roots
          UNION
          SELECT w.root, e.dst, w.hop + 1 FROM walk w
          JOIN edges e ON w.id = e.src
          WHERE w.hop < 2),
        mh AS (SELECT root, id, MIN(hop) AS mh FROM walk GROUP BY 1, 2),
        grid AS (SELECT unnest(range(0, 3)) AS hop),
        nr AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_roots FROM roots)
        SELECT g.hop, (SELECT n_roots FROM nr) AS n_roots,
          COUNT(*) AS n_ball_exact, TRUE AS est_within_band
        FROM grid g JOIN mh ON mh.mh <= g.hop
        GROUP BY 1""")),

    // ---- truncated harmonic centrality (HyperBall's payload) -----------
    //      what the g12 sketches are FOR: per-root harmonic centrality
    //      H(v) = Σ_t (|B(v,t)| − |B(v,t−1)|)/t truncated at 2 hops —
    //      the centrality Boldi & Vigna compute at web scale because
    //      exact closeness needs all-pairs distances. Doubled to stay
    //      integer (h2x = 2·ΔB₁ + ΔB₂: hop-1 neighbors count double,
    //      the 1/t discount), EXACT from the sampled-root multi-source
    //      BFS (same adaptive modulus rule as g12), with the
    //      sketch-side estimate checked per root inside a 2% band
    //      (sparse-mode sketches are exact at fixture scale, so the
    //      booleans are deterministic; at bench scale the g12 lgK/band
    //      dial applies). Output: top 15 roots by exact centrality —
    //      rank by (h2x DESC, root ASC), a TakeOrdered cut.
    Q("g13_harmonic_centrality",
      (s, d) => {
        import s.implicits._
        val e = bipartiteEdges(s, d).localCheckpoint(false)
        val nNodes = e.select(col("src")).distinct().count()
        val m = Iterator.iterate(2L)(_ * 2).find(_ * 96 >= nNodes).get
        val (lgK, band) = if (nNodes <= 4096) (12, 0.02) else (9, 0.10)
        val est = GraphOps.hyperBall(e, hops = 2, lgK = lgK)
          .filter(col("id") % m === 0)
          .groupBy(col("id"))
          .pivot("hop", Seq(0, 1, 2))
          .agg(first(col("est")))
          .select(col("id").as("root"),
            (lit(2L) * (col("1") - col("0")) + (col("2") - col("1")))
              .as("h2x_est"))
        val roots = e.select(col("src").as("id")).distinct()
          .filter(col("id") % m === 0)
        var ball = roots
          .select(col("id").as("root"), col("id"), lit(0L).as("mh"))
          .localCheckpoint(false)
        for (t <- 1 to 2) {
          ball = ball.join(e, ball("id") === e("src"))
            .select(col("root"), col("dst").as("id"), lit(t.toLong).as("mh"))
            .unionByName(ball)
            .groupBy(col("root"), col("id")).agg(min(col("mh")).as("mh"))
            .localCheckpoint(false)
        }
        val exact = ball.groupBy(col("root"))
          .agg((lit(2L) * sum(when(col("mh") === 1L, 1L).otherwise(0L)) +
            sum(when(col("mh") === 2L, 1L).otherwise(0L))).as("h2x"))
        exact.join(est, Seq("root"))
          .select(col("root"), col("h2x"),
            (abs(col("h2x_est") - col("h2x")).cast("double") <=
              col("h2x").cast("double") * band).as("est_within_band"))
          .orderBy(col("h2x").desc, col("root").asc)
          .limit(15)
          .withColumn("rk", expr(
            "row_number() OVER (ORDER BY h2x DESC, root ASC)").cast("long"))
      },
      Some("""
        WITH RECURSIVE""" + bipartiteSql + """,
        nodes AS (SELECT DISTINCT src FROM edges),
        nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM nodes),
        -- powers of 2 through 2^30: covers |V| up to ~10^11 so MIN(p)
        -- can never be NULL on any input this oracle will see (a NULL
        -- modulus would silently select zero roots)
        mm AS (SELECT MIN(CAST(p AS BIGINT)) AS m
               FROM (VALUES (2), (4), (8), (16), (32),
                 (64), (128), (256), (512), (1024), (2048), (4096),
                 (8192), (16384), (32768), (65536), (131072), (262144),
                 (524288), (1048576), (2097152), (4194304), (8388608),
                 (16777216), (33554432), (67108864), (134217728),
                 (268435456), (536870912), (1073741824)) v(p)
               WHERE CAST(p AS BIGINT) * 96 >= (SELECT n FROM nn)),
        roots AS (SELECT src AS root FROM nodes
                  WHERE src % (SELECT m FROM mm) = 0),
        walk AS (
          SELECT root, root AS id, CAST(0 AS BIGINT) AS hop FROM roots
          UNION
          SELECT w.root, e.dst, w.hop + 1 FROM walk w
          JOIN edges e ON w.id = e.src
          WHERE w.hop < 2),
        mh AS (SELECT root, id, MIN(hop) AS mh FROM walk GROUP BY 1, 2),
        hx AS (SELECT root,
                 CAST(2 * SUM(CASE WHEN mh = 1 THEN 1 ELSE 0 END)
                   + SUM(CASE WHEN mh = 2 THEN 1 ELSE 0 END) AS BIGINT)
                   AS h2x
               FROM mh GROUP BY 1)
        SELECT root, h2x, TRUE AS est_within_band,
          CAST(ROW_NUMBER() OVER (ORDER BY h2x DESC, root ASC) AS BIGINT)
            AS rk
        FROM hx
        ORDER BY h2x DESC, root ASC LIMIT 15""")),

    // ---- k-truss survival curve -----------------------------------------
    //      cohesion one notch above k-core: a 4-truss edge must sit in
    //      >= 2 triangles among SURVIVING edges, so bridges and
    //      loosely-attached hubs peel away while clique-ish co-purchase
    //      cores survive. Fixed 3 rounds over the canonical (u<v) pair
    //      graph, O(rounds) output (round, n_edges) — the kcorePeel
    //      replayability contract; per round one canonical a<b<c
    //      triangle join + one keyed support count + one semi join.
    Q("g16_ktruss",
      (s, d) => GraphOps.trussPeel(coPurchasePairs(s, d), k = 4,
        rounds = 3),
      Some {
        val sb = new StringBuilder("WITH " + coPurchaseSql + """,
        e0 AS (SELECT u, v FROM pairs)""")
        for (i <- 0 until 3) sb ++= s""",
        t$i AS (SELECT x.u AS a, x.v AS b, y.v AS c
               FROM e$i x JOIN e$i y ON x.v = y.u
               JOIN e$i z ON z.u = x.u AND z.v = y.v),
        s$i AS (SELECT u, v FROM (
                 SELECT u, v, COUNT(*) AS sup FROM (
                   SELECT a AS u, b AS v FROM t$i
                   UNION ALL SELECT b, c FROM t$i
                   UNION ALL SELECT a, c FROM t$i)
                 GROUP BY 1, 2) WHERE sup >= 2),
        e${i + 1} AS (SELECT e.u, e.v FROM e$i e
                JOIN s$i s ON e.u = s.u AND e.v = s.v)"""
        sb ++= (0 to 3).map(i =>
          s"""
        SELECT CAST($i AS BIGINT) AS round,
          (SELECT COUNT(*) FROM e$i) AS n_edges""")
          .mkString("\n        UNION ALL")
        sb.toString
      }),

    // ---- modularity of the detected communities -------------------------
    //      the quality metric for g06's partition (Newman & Girvan 2004):
    //      Q = sum_c [ e_c/(2m) - (deg_c/(2m))^2 ] over the directed
    //      both-ways edge list (2m = |E_dir|, e_c = intra-community
    //      directed edges, deg_c = community degree sum). Emitted as the
    //      per-community INTEGER numerator q_num = e_c*2m - deg_c^2
    //      (so Q = sum(q_num)/(2m)^2) — exact, shuffle-order-free, no
    //      double summation to align across engines. Scale shape: labels
    //      come from the bounded-round LPA; the rest is two node-keyed
    //      joins (edge endpoints -> labels) + two keyed aggregations —
    //      PageRank-round data movement, nothing driver-side but the 2m
    //      scalar.
    Q("g14_modularity",
      (s, d) => {
        val p = coPurchasePairs(s, d)
        val e = p.select(col("u").as("src"), col("v").as("dst"))
          .unionByName(p.select(col("v").as("src"), col("u").as("dst")))
          .localCheckpoint(false)
        val labels = GraphOps.labelPropagation(e, rounds = 2)
        val m2 = e.count()
        val deg = e.groupBy(col("src").as("id"))
          .agg(count(lit(1)).as("deg"))
        val degC = deg.join(labels, Seq("id"))
          .groupBy(col("label"))
          .agg(count(lit(1)).as("n_nodes"), sum(col("deg")).as("deg_sum"))
        val la = labels.select(col("id").as("sid"), col("label").as("sl"))
        val lb = labels.select(col("id").as("did"), col("label").as("dl"))
        val intra = e.join(la, e("src") === la("sid"))
          .join(lb, e("dst") === lb("did"))
          .filter(col("sl") === col("dl"))
          .groupBy(col("sl").as("label"))
          .agg(count(lit(1)).as("e_in"))
        degC.join(intra, Seq("label"), "left")
          .select(col("label"), col("n_nodes"),
            coalesce(col("e_in"), lit(0L)).as("e_in_dir"), col("deg_sum"),
            (coalesce(col("e_in"), lit(0L)) * lit(m2) -
              col("deg_sum") * col("deg_sum")).as("q_num"))
      },
      Some("WITH " + coPurchaseSql + """,
        e AS (SELECT u AS src, v AS dst FROM pairs
              UNION ALL SELECT v, u FROM pairs),
        l0 AS (SELECT DISTINCT src AS id, src AS label FROM e),
        r1 AS (
          SELECT id, label FROM (
            SELECT e.dst AS id, l.label, COUNT(*) AS c,
              ROW_NUMBER() OVER (PARTITION BY e.dst
                ORDER BY COUNT(*) DESC, l.label ASC) AS rn
            FROM e JOIN l0 l ON e.src = l.id GROUP BY e.dst, l.label)
          WHERE rn = 1),
        r2 AS (
          SELECT id, label FROM (
            SELECT e.dst AS id, l.label, COUNT(*) AS c,
              ROW_NUMBER() OVER (PARTITION BY e.dst
                ORDER BY COUNT(*) DESC, l.label ASC) AS rn
            FROM e JOIN r1 l ON e.src = l.id GROUP BY e.dst, l.label)
          WHERE rn = 1),
        m2 AS (SELECT CAST(COUNT(*) AS BIGINT) AS m2 FROM e),
        deg AS (SELECT src AS id, CAST(COUNT(*) AS BIGINT) AS deg
                FROM e GROUP BY 1),
        ns AS (SELECT r2.label, COUNT(*) AS n_nodes,
                 CAST(SUM(deg.deg) AS BIGINT) AS deg_sum
               FROM r2 JOIN deg ON r2.id = deg.id GROUP BY 1),
        ie AS (SELECT la.label, CAST(COUNT(*) AS BIGINT) AS e_in
               FROM e JOIN r2 la ON e.src = la.id
                      JOIN r2 lb ON e.dst = lb.id
               WHERE la.label = lb.label GROUP BY 1)
        SELECT ns.label, ns.n_nodes,
          COALESCE(ie.e_in, CAST(0 AS BIGINT)) AS e_in_dir, ns.deg_sum,
          COALESCE(ie.e_in, CAST(0 AS BIGINT)) * (SELECT m2 FROM m2)
            - ns.deg_sum * ns.deg_sum AS q_num
        FROM ns LEFT JOIN ie ON ns.label = ie.label""")),

    // ---- common-neighbors link prediction -------------------------------
    //      the recommendation primitive: for NON-adjacent node pairs,
    //      score by shared-neighbor count and capped-Jaccard — "parts
    //      often co-ordered with both u and v, though u,v never co-occur".
    //      Candidate generation is bounded on BOTH sides (the neighbor-
    //      sampling discipline of Suri & Vassilvitskii 2011): each node
    //      keeps its 8 lowest-id out-neighbors (row_number cap), each
    //      wedge CENTER keeps its 12 lowest-id in-spokes — so one center
    //      yields <= 66 wedges regardless of how popular the part is,
    //      and the whole pair frame is O(12^2/2 * |V|) instead of the
    //      posting-squared blowup a raw shared-neighbor self-join has on
    //      power-law graphs. Degrees and Jaccard are over the SAME capped
    //      adjacency (documented estimator semantics, exact-replayable);
    //      jac_e6 = cn*1e6 div (du+dv-cn) keeps the output integer.
    //      Existing co-purchase edges are removed by an anti-join; final
    //      cut is top-15 by (cn DESC, u, v) — a TakeOrdered, never a
    //      global sort.
    Q("g15_link_prediction",
      (s, d) => {
        // defensive for externally-built sessions (idempotent; GraftSession
        // already injects via spark.sql.extensions)
        graft.expressions.VectorExpressions.registerAll(s)
        // cache lifecycle: CALLER-owned — clearCache()/unpersist after
        // the action (DedupOps class doc); p feeds three plan branches
        // (both direction projections of e + the existing-edge anti-
        // join), and unpersisted each branch replays the lineitem
        // self-join from scratch
        val p = coPurchasePairs(s, d)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val e = p.select(col("u").as("src"), col("v").as("dst"))
          .unionByName(p.select(col("v").as("src"), col("u").as("dst")))
        // the two degree caps as BOUNDED smallest-k aggregations
        // (smallest_k_agg — guide §2.3 "aggregate before you shuffle")
        // instead of the former two row_number windows: the window form
        // exchanged + fully sorted the edge list twice, while the agg
        // form bounds every key to k values ON THE MAP SIDE, so a hot
        // part's spokes collapse to <= 12 before either exchange. e has
        // one row per (src, dst) — values in a group are unique, so
        // "k smallest dst/src" is EXACTLY the row_number <= k cap.
        val byDst = e
          .groupBy(col("src"))
          .agg(expr("smallest_k_agg(dst, 8)").as("ds"))
          .select(col("src"), explode(col("ds")).as("dst"))
          .groupBy(col("dst"))
          .agg(expr("smallest_k_agg(src, 12)").as("srcs"))
          // cache lifecycle: CALLER-owned (same contract) — feeds the
          // degree aggregate and the wedge expansion
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val adj = byDst.select(explode(col("srcs")).as("src"), col("dst"))
        val cdeg = adj.groupBy(col("src")).agg(count(lit(1)).as("cdeg"))
        // wedges ROW-LOCALLY from each center's sorted unique in-spoke
        // array (<= 12, so <= 66 pairs) — replaces the adj-adj self-join
        // exchange; srcs is ascending and duplicate-free, so pairing
        // index i with every later index is exactly the x.src < y.src
        // join condition
        val wedges = byDst
          .select(explode(expr(
            "flatten(transform(srcs, (x, i) -> " +
              "transform(slice(srcs, i + 2, 12), y -> " +
              "struct(x AS u, y AS v))))")).as("w"))
          .groupBy(col("w.u").as("u"), col("w.v").as("v"))
          .agg(count(lit(1)).as("cn"))
        val cand = wedges.join(p, Seq("u", "v"), "left_anti")
        cand
          .join(cdeg.select(col("src").as("u"), col("cdeg").as("du")),
            Seq("u"))
          .join(cdeg.select(col("src").as("v"), col("cdeg").as("dv")),
            Seq("v"))
          .select(col("u"), col("v"), col("cn"), col("du"), col("dv"),
            expr("cn * CAST(1000000 AS BIGINT) div (du + dv - cn)")
              .as("jac_e6"))
          .orderBy(col("cn").desc, col("u").asc, col("v").asc)
          .limit(15)
          .withColumn("rk", expr(
            "row_number() OVER (ORDER BY cn DESC, u ASC, v ASC)")
            .cast("long"))
      },
      Some("WITH " + coPurchaseSql + """,
        e AS (SELECT u AS src, v AS dst FROM pairs
              UNION ALL SELECT v, u FROM pairs),
        a1 AS (SELECT src, dst FROM (
                 SELECT src, dst, ROW_NUMBER() OVER (PARTITION BY src
                   ORDER BY dst ASC) AS rn FROM e) WHERE rn <= 8),
        adj AS (SELECT src, dst FROM (
                 SELECT src, dst, ROW_NUMBER() OVER (PARTITION BY dst
                   ORDER BY src ASC) AS rn FROM a1) WHERE rn <= 12),
        cd AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS cdeg
               FROM adj GROUP BY 1),
        wg AS (SELECT x.src AS u, y.src AS v, CAST(COUNT(*) AS BIGINT) AS cn
               FROM adj x JOIN adj y
                 ON x.dst = y.dst AND x.src < y.src
               GROUP BY 1, 2),
        cand AS (SELECT wg.* FROM wg
                 LEFT JOIN pairs p ON wg.u = p.u AND wg.v = p.v
                 WHERE p.u IS NULL)
        SELECT c.u, c.v, c.cn, du.cdeg AS du, dv.cdeg AS dv,
          c.cn * CAST(1000000 AS BIGINT) // (du.cdeg + dv.cdeg - c.cn)
            AS jac_e6,
          CAST(ROW_NUMBER() OVER (ORDER BY c.cn DESC, c.u ASC, c.v ASC)
            AS BIGINT) AS rk
        FROM cand c JOIN cd du ON c.u = du.src JOIN cd dv ON c.v = dv.src
        ORDER BY c.cn DESC, c.u ASC, c.v ASC LIMIT 15"""))
  )

  /** CTE chain replaying `iters` personalized-PageRank rounds: the g07
    * dangling replay with every teleport / dangling-mass term gated by
    * the seed CASE (seeds = even ids < 100 present in the graph). */
  private def pprSql(iters: Int): String = {
    val sb = new StringBuilder("WITH" + directedSql + """,
    deg AS (SELECT src, COUNT(*) AS outdeg FROM edges GROUP BY src),
    nodes AS (SELECT src AS id FROM edges UNION SELECT dst FROM edges),
    dang AS (SELECT id FROM nodes
             WHERE id NOT IN (SELECT src FROM edges)),
    sd AS (SELECT id FROM nodes WHERE id % 2 = 0 AND id < 100),
    sc AS (SELECT COUNT(*) AS sn FROM sd),
    r0 AS (SELECT nd.id,
             CASE WHEN sd.id IS NOT NULL
               THEN CAST(1.0 AS DOUBLE) / (SELECT sn FROM sc)
               ELSE CAST(0 AS DOUBLE) END AS rank
           FROM nodes nd LEFT JOIN sd ON nd.id = sd.id)""")
    for (i <- 0 until iters) sb ++= s""",
    dm$i AS (
      SELECT COALESCE(
        SUM(CAST(FLOOR(rank * 1e15 + 0.5) AS BIGINT)) / 1e15,
        CAST(0 AS DOUBLE)) AS dm
      FROM r$i WHERE id IN (SELECT id FROM dang)),
    r${i + 1} AS (
      SELECT nd.id,
        CASE WHEN sd.id IS NOT NULL
          THEN CAST(0.15 AS DOUBLE) / (SELECT sn FROM sc)
          ELSE CAST(0 AS DOUBLE) END
        + CAST(0.85 AS DOUBLE) * (COALESCE(c.m, CAST(0 AS DOUBLE))
            + CASE WHEN sd.id IS NOT NULL
                THEN (SELECT dm FROM dm$i) / (SELECT sn FROM sc)
                ELSE CAST(0 AS DOUBLE) END) AS rank
      FROM nodes nd LEFT JOIN sd ON nd.id = sd.id
      LEFT JOIN (
        SELECT e.dst AS id,
          SUM(CAST(FLOOR(r.rank / d.outdeg * 1e15 + 0.5) AS BIGINT)) / 1e15
            AS m
        FROM edges e JOIN r$i r ON e.src = r.id JOIN deg d ON e.src = d.src
        GROUP BY e.dst) c ON nd.id = c.id)"""
    sb ++= s"""
    SELECT id,
      CASE WHEN id % 2 = 0 THEN 'customer' ELSE 'supplier' END AS kind,
      rank
    FROM r$iters"""
    sb.toString
  }

  /** CTE chain replaying `rounds` k-core peel rounds over the
    * co-purchase graph (see g10). */
  private def kcoreSql(k: Int, rounds: Int): String = {
    // the MATERIALIZED injection is load-bearing (e0 references pairs
    // twice; inlined, the chain expands exponentially — the t22 lesson),
    // so a silent no-op replace after a reformat of coPurchaseSql must
    // fail loudly, not resurrect the blowup
    val materialized =
      coPurchaseSql.replace("pairs AS (", "pairs AS MATERIALIZED (")
    require(materialized != coPurchaseSql,
      "kcoreSql: 'pairs AS (' not found in coPurchaseSql — the " +
        "MATERIALIZED injection silently no-opped; update the pattern")
    val sb = new StringBuilder("WITH " + materialized + """,
    e0 AS MATERIALIZED (
      SELECT u AS src, v AS dst FROM pairs
      UNION ALL
      SELECT v AS src, u AS dst FROM pairs)""")
    for (i <- 1 to rounds) sb ++= s""",
    k$i AS MATERIALIZED (
      SELECT src FROM e${i - 1} GROUP BY src HAVING COUNT(*) >= $k),
    e$i AS MATERIALIZED (
      SELECT e.src, e.dst FROM e${i - 1} e
      WHERE e.src IN (SELECT src FROM k$i)
        AND e.dst IN (SELECT src FROM k$i))"""
    sb ++= (0 to rounds).map(i => s"""
    SELECT CAST($i AS BIGINT) AS round, COUNT(DISTINCT src) AS n_nodes,
           COUNT(*) AS n_dir_edges FROM e$i""").mkString("\n    UNION ALL")
    sb.toString
  }

  /** CTE chain replaying `rounds` Bellman-Ford sweeps over the weighted
    * trade graph (see g09). */
  private def ssspSql(rounds: Int): String = {
    val sb = new StringBuilder("WITH" + bipartiteSql + """,
    we AS (SELECT src, dst, 1 + (src + dst) % 7 AS w FROM edges),
    r0 AS (SELECT CAST(2 AS BIGINT) AS id, CAST(0 AS BIGINT) AS dist)""")
    for (i <- 0 until rounds) sb ++= s""",
    r${i + 1} AS (
      SELECT id, MIN(dist) AS dist FROM (
        SELECT id, dist FROM r$i
        UNION ALL
        SELECT e.dst AS id, r.dist + e.w
        FROM r$i r JOIN we e ON r.id = e.src)
      GROUP BY id)"""
    sb ++= s"""
    SELECT dist, COUNT(*) AS n_nodes FROM r$rounds GROUP BY dist"""
    sb.toString
  }

  /** dialect-shared bounded-reachability recursion (see g05).
    *
    * The recursion is UNION ALL (Spark's requirement), so the row count
    * per step is the number of PATHS, not nodes — exponential in the
    * hop bound. Four hops exercises real iteration in the frontend, and
    * the key filters bound the fixture graph itself (<= 30 customers x
    * <= 20 suppliers, a cap independent of SF: at worst the bipartite
    * subgraph is complete and step 4 carries 20*30*20*30 = 360k path
    * rows at ANY scale factor). Unbounded-graph recursion at depth 4
    * would be ~1e9 paths at sf0.1 — that work belongs to the
    * checkpointed frontier operators (g03/g04), not the SQL frontend. */
  private def recursiveWalk(orders: String, lineitem: String): String = s"""
    WITH RECURSIVE und AS (
      SELECT DISTINCT o_custkey * 2 AS a, l_suppkey * 2 + 1 AS b
      FROM $orders JOIN $lineitem ON o_orderkey = l_orderkey
      WHERE o_custkey <= 30 AND l_suppkey <= 20),
    edges AS (
      SELECT a AS src, b AS dst FROM und
      UNION ALL
      SELECT b AS src, a AS dst FROM und),
    walk AS (
      -- anchor at the smallest customer node PRESENT in the subgraph:
      -- a fixed literal start can be isolated at some SFs (customer 1
      -- has no qualifying lineitem at sf0.1), which would quietly skip
      -- the iteration this query exists to gate
      SELECT CAST(MIN(a) AS BIGINT) AS id, CAST(0 AS BIGINT) AS hop
      FROM und
      UNION ALL
      SELECT e.dst, w.hop + 1 FROM walk w JOIN edges e ON w.id = e.src
      WHERE w.hop < 4)
    SELECT min_hop AS hop, COUNT(*) AS n_nodes FROM (
      SELECT id, MIN(hop) AS min_hop FROM walk GROUP BY id)
    GROUP BY 1"""
}
