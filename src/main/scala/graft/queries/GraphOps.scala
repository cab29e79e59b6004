package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Q._

/** Link-graph centrality queries: the events table's per-user click paths
  * induce a page-transition graph (src page → next page within a user's
  * timeline), and [[graft.ops.Graph.pageRank]] scores each page on it —
  * the curation signal that ranks crawl sources/pages for retention. The
  * DuckDB oracle replays the SAME integer fixed-point power iteration
  * unrolled as chained CTEs: because every step is integer arithmetic,
  * the two engines agree hash-for-hash, no float tolerance needed.
  */
object GraphOps {

  type Fn = (SparkSession, String) => DataFrame

  private val Iters = 3

  /** The click graph every entry here shares: per-user consecutive page
    * visits (props.k) become directed (page → next page) edges.
    */
  private def clickEdges(s: SparkSession, d: String): DataFrame = {
    val ev = t(s, d, "events").select(col("user_id"), col("ts"),
      col("event_id"),
      regexp_extract(col("props"), "\"k\": ([0-9]+)", 1)
        .cast("long").as("page"))
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ev.withColumn("next", lead("page", 1).over(w))
      .filter(col("next").isNotNull)
      .select(col("page").as("src"), col("next").as("dst"))
  }

  /** Canonical-undirected-simple-edges CTE (mirrors
    * Graph.canonicalUndirected), named so q_triangles and q_kcore share
    * one definition on the SQL side too.
    */
  private def canonCte(name: String): String =
    s"""$name AS MATERIALIZED (
       |  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
       |  FROM edges WHERE src <> dst)""".stripMargin

  /** The same click-graph derivation in DuckDB SQL (CTEs ev/eg/edges). */
  private val edgeCtes =
    """WITH ev AS (SELECT user_id, ts, event_id,
      |  CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS BIGINT) AS page FROM events),
      |eg AS (SELECT page AS src,
      |  lead(page) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS dst FROM ev),
      |edges AS (SELECT src, dst FROM eg WHERE dst IS NOT NULL)""".stripMargin

  /** The r0 → rN iteration CTEs, mirroring Graph.pageRank term for term
    * (85/100 damping, uniform dangling redistribution, truncating
    * division). Kept in one place so the Scala and SQL sides cannot
    * drift silently.
    */
  private def oracleIterCtes(iters: Int): String =
    (1 to iters).map { i =>
      s"""s$i AS (SELECT count(*) AS n, sum(pr) AS total,
         |  sum(CASE WHEN outdeg = 0 THEN pr ELSE 0 END) AS dangling FROM r${i - 1}),
         |c$i AS (SELECT e.dst AS cnode, sum(r.pr // r.outdeg) AS contrib
         |  FROM edges e JOIN r${i - 1} r ON e.src = r.node WHERE r.outdeg > 0
         |  GROUP BY 1),
         |r$i AS (SELECT b.node, b.outdeg,
         |  ((15 * (total // n)) // 100)
         |  + ((85 * (coalesce(contrib, 0) + (dangling // n))) // 100) AS pr
         |  FROM r${i - 1} b LEFT JOIN c$i ON b.node = c$i.cnode CROSS JOIN s$i)""".stripMargin
    }.mkString(",\n")

  val entries: Seq[(String, Fn, String)] = Seq(

    // -- PageRank over the click graph: per-user consecutive page visits
    //    (props.k) are the edges; 3 power-iteration rounds in exact
    //    integer mass units. One window for edge derivation, then one
    //    shuffle on dst per round -----------------------------------------
    ("q_pagerank",
      (s: SparkSession, d: String) =>
        graft.ops.Graph.pageRank(clickEdges(s, d), "src", "dst", iters = Iters)
          .orderBy("node"),
      edgeCtes +
        s""",
         |nodes AS (SELECT DISTINCT node FROM
         |  (SELECT src AS node FROM edges UNION ALL SELECT dst FROM edges) q),
         |od AS (SELECT src AS onode, count(*) AS outdeg FROM edges GROUP BY 1),
         |base AS (SELECT node, coalesce(outdeg, 0) AS outdeg
         |  FROM nodes LEFT JOIN od ON node = onode),
         |r0 AS (SELECT node, outdeg,
         |  1000000000000 // (SELECT count(*) FROM base) AS pr FROM base),
         |${oracleIterCtes(Iters)}
         |SELECT node, CAST(pr AS BIGINT) AS pr FROM r$Iters ORDER BY node""".stripMargin),

    // -- edge-WEIGHTED PageRank: the same click graph but transition
    //    multiplicity matters — (src,dst) pairs collapse to one weighted
    //    edge and each out-neighbor's share is (pr*w) div wout, a
    //    different truncation from q_pagerank's per-parallel-edge form
    //    (see Graph.weightedPageRank). Round shape unchanged: one
    //    groupBy(dst) shuffle per round over the grouped edge list -------
    ("q_pagerank_weighted",
      (s: SparkSession, d: String) =>
        // weight 1 per raw transition: the operator's own (src,dst)
        // grouping sums these into multiplicity weights — no redundant
        // pre-aggregation on the query side
        graft.ops.Graph.weightedPageRank(
            clickEdges(s, d).withColumn("w", lit(1L)),
            "src", "dst", "w", iters = Iters)
          .orderBy("node"),
      edgeCtes +
        s""",
         |we AS MATERIALIZED (SELECT src, dst, count(*) AS w
         |  FROM edges GROUP BY 1, 2),
         |nodes AS (SELECT DISTINCT node FROM
         |  (SELECT src AS node FROM we UNION ALL SELECT dst FROM we) q),
         |ow AS (SELECT src AS onode, sum(w) AS wout FROM we GROUP BY 1),
         |nn AS (SELECT count(*) AS n FROM nodes),
         |base AS (SELECT node, coalesce(wout, 0) AS wout
         |  FROM nodes LEFT JOIN ow ON node = onode),
         |r0 AS (SELECT node, wout,
         |  1000000000000 // (SELECT n FROM nn) AS pr FROM base),
         |${wprIterCtes(Iters)}
         |SELECT node, CAST(pr AS BIGINT) AS pr FROM r$Iters ORDER BY node""".stripMargin),

    // -- label propagation over the same click graph: pages with
    //    page % 5 = 0 are seeds labeled page % 3; three clamped
    //    synchronous rounds of labeled-neighbor majority vote (ties →
    //    smaller label). The oracle unrolls the SAME integer rounds as
    //    chained CTEs — two-step argmax (max count, then min label) in
    //    both engines so ties are deterministic ---------------------------
    ("q_label_prop",
      (s: SparkSession, d: String) => {
        val edges = clickEdges(s, d)
        val nodes = edges.select(col("src").as("node"))
          .union(edges.select(col("dst").as("node"))).distinct()
        val seeds = nodes.filter(col("node") % 5 === 0)
          .select(col("node"), (col("node") % 3).as("seed_label"))
        graft.ops.Graph.labelPropagate(edges, "src", "dst",
            seeds, "node", "seed_label", iters = Iters)
          .orderBy("node")
      },
      edgeCtes +
        s""",
         |sym AS (SELECT src, dst FROM edges UNION ALL SELECT dst, src FROM edges),
         |nodes AS (SELECT DISTINCT node FROM
         |  (SELECT src AS node FROM edges UNION ALL SELECT dst FROM edges) q),
         |l0 AS (SELECT node,
         |  CASE WHEN node % 5 = 0 THEN node % 3 END AS lbl,
         |  node % 5 = 0 AS is_seed FROM nodes),
         |${lpIterCtes(Iters)}
         |SELECT node, CAST(lbl AS BIGINT) AS label FROM l$Iters ORDER BY node""".stripMargin),

    // -- WEIGHTED label propagation: same seeds and clamped rounds as
    //    q_label_prop, but each labeled neighbor's vote carries an edge
    //    strength (per-transition weight 1+(src+dst)%5, q_sssp's
    //    synthetic-cost convention; parallel transitions add) — a path
    //    taken often outvotes one taken once. Same two-step
    //    deterministic argmax; the oracle unrolls the weighted rounds
    //    over the grouped symmetric edges ---------------------------------
    ("q_label_prop_weighted",
      (s: SparkSession, d: String) => {
        val edges = clickEdges(s, d)
          .withColumn("w", (col("src") + col("dst")) % 5 + 1)
        val nodes = edges.select(col("src").as("node"))
          .union(edges.select(col("dst").as("node"))).distinct()
        val seeds = nodes.filter(col("node") % 5 === 0)
          .select(col("node"), (col("node") % 3).as("seed_label"))
        graft.ops.Graph.weightedLabelPropagate(edges, "src", "dst", "w",
            seeds, "node", "seed_label", iters = Iters)
          .orderBy("node")
      },
      edgeCtes +
        s""",
         |we AS MATERIALIZED (SELECT src, dst,
         |    CAST(sum((src + dst) % 5 + 1) AS BIGINT) AS w
         |  FROM edges GROUP BY 1, 2),
         |sym AS (SELECT src, dst, w FROM we
         |        UNION ALL SELECT dst, src, w FROM we),
         |nodes AS (SELECT DISTINCT node FROM
         |  (SELECT src AS node FROM we UNION ALL SELECT dst FROM we) q),
         |l0 AS (SELECT node,
         |  CASE WHEN node % 5 = 0 THEN node % 3 END AS lbl,
         |  node % 5 = 0 AS is_seed FROM nodes),
         |${wlpIterCtes(Iters)}
         |SELECT node, CAST(lbl AS BIGINT) AS label FROM l$Iters ORDER BY node""".stripMargin),

    // -- personalized PageRank: teleport AND dangling mass return to the
    //    seed pages (page % 7 = 0) so rank measures proximity to the
    //    seeds — the "more like these" curation signal. Same integer
    //    fixed point as q_pagerank, seed count baked in as a literal ------
    ("q_ppr",
      (s: SparkSession, d: String) => {
        val edges = clickEdges(s, d)
        val nodes = edges.select(col("src").as("node"))
          .union(edges.select(col("dst").as("node"))).distinct()
        graft.ops.Graph.personalizedPageRank(edges, "src", "dst",
            nodes.filter(col("node") % 7 === 0), "node", iters = Iters)
          .orderBy("node")
      },
      edgeCtes +
        s""",
         |nodes AS (SELECT DISTINCT node FROM
         |  (SELECT src AS node FROM edges UNION ALL SELECT dst FROM edges) q),
         |sd AS (SELECT node FROM nodes WHERE node % 7 = 0),
         |ns AS (SELECT count(*) AS ns FROM sd),
         |od AS (SELECT src AS onode, count(*) AS outdeg FROM edges GROUP BY 1),
         |base AS (SELECT node, coalesce(outdeg, 0) AS outdeg,
         |    node % 7 = 0 AS is_seed
         |  FROM nodes LEFT JOIN od ON node = onode),
         |r0 AS (SELECT node, outdeg, is_seed,
         |  CASE WHEN is_seed THEN 1000000000000 // (SELECT ns FROM ns)
         |       ELSE 0 END AS pr FROM base),
         |${pprIterCtes(Iters)}
         |SELECT node, CAST(pr AS BIGINT) AS pr FROM r$Iters ORDER BY node""".stripMargin),

    // -- link prediction on the click graph: non-adjacent page pairs
    //    scored by shared neighborhood — common-neighbor count,
    //    Adamic–Adar in integer micro-units (round(1e6/ln deg) per
    //    shared neighbor), endpoint degrees (Jaccard derives exactly).
    //    Wedge centers capped at deg ≤ 25 (the dfCap-style hub guard —
    //    see Graph.linkPredict's recall note; active at sf0.01, where
    //    degrees reach 32); pairs need ≥ 2 shared neighbors. The raw
    //    click graph is near-complete at sf0.01 (nothing left to
    //    predict), so a deterministic hash keeps every third undirected
    //    edge — the held-out-edges evaluation setup link prediction is
    //    actually scored with. Both engines enumerate the same wedges ---
    ("q_link_predict",
      (s: SparkSession, d: String) =>
        graft.ops.Graph.linkPredict(
            clickEdges(s, d).filter(
              (least(col("src"), col("dst")) * 31 +
                greatest(col("src"), col("dst"))) % 3 === 0),
            "src", "dst", maxDeg = 25L, minCommon = 2L)
          .orderBy("a", "b"),
      edgeCtes +
        s""",
          |edges_h AS (SELECT src, dst FROM edges
          |  WHERE (least(src, dst) * 31 + greatest(src, dst)) % 3 = 0),
          |und AS MATERIALIZED (
          |  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
          |  FROM edges_h WHERE src <> dst),
          |dg AS MATERIALIZED (SELECT node, CAST(count(*) AS BIGINT) AS deg FROM
          |  (SELECT a AS node FROM und UNION ALL SELECT b FROM und) q GROUP BY 1),
          |sym AS (SELECT a AS x, b AS y FROM und
          |        UNION ALL SELECT b, a FROM und),
          |ctr AS MATERIALIZED (SELECT s.x, s.y,
          |    CAST(round(1000000.0 / ln(d.deg)) AS BIGINT) AS aa1
          |  FROM sym s JOIN dg d ON d.node = s.x
          |  WHERE d.deg BETWEEN 2 AND 25),
          |wg AS (SELECT c1.y AS a, c2.y AS b,
          |    CAST(count(*) AS BIGINT) AS common,
          |    CAST(sum(c1.aa1) AS BIGINT) AS aa_micro
          |  FROM ctr c1 JOIN ctr c2 ON c1.x = c2.x AND c1.y < c2.y
          |  GROUP BY 1, 2 HAVING count(*) >= 2)
          |SELECT w.a, w.b, w.common, w.aa_micro,
          |  da.deg AS deg_a, db.deg AS deg_b
          |FROM wg w
          |JOIN dg da ON da.node = w.a JOIN dg db ON db.node = w.b
          |WHERE NOT EXISTS (SELECT 1 FROM und e
          |                  WHERE e.a = w.a AND e.b = w.b)
          |ORDER BY w.a, w.b""".stripMargin),

    // -- per-node triangle counts by degree orientation: canonical
    //    undirected edges, each oriented low-(deg,id) → high, wedges at
    //    the lowest corner closed by one more oriented-edge join. The
    //    orientation caps out-degree at O(√|E|) so hub pages can't
    //    explode the wedge join (see Graph.triangles scaladoc). Both
    //    engines run the identical plan; integer counts hash-compare ----
    ("q_triangles",
      (s: SparkSession, d: String) =>
        graft.ops.Graph.triangles(clickEdges(s, d), "src", "dst")
          .orderBy("node"),
      edgeCtes +
        s""",
          |${canonCte("und")},
          |dg AS MATERIALIZED (SELECT node, CAST(count(*) AS BIGINT) AS deg FROM
          |  (SELECT a AS node FROM und UNION ALL SELECT b FROM und) q GROUP BY 1),
          |ori AS MATERIALIZED (
          |  SELECT CASE WHEN da.deg < db.deg OR (da.deg = db.deg AND u.a < u.b)
          |         THEN u.a ELSE u.b END AS src,
          |         CASE WHEN da.deg < db.deg OR (da.deg = db.deg AND u.a < u.b)
          |         THEN u.b ELSE u.a END AS dst,
          |         CASE WHEN da.deg < db.deg OR (da.deg = db.deg AND u.a < u.b)
          |         THEN db.deg ELSE da.deg END AS ddst
          |  FROM und u JOIN dg da ON da.node = u.a JOIN dg db ON db.node = u.b),
          |tri AS (
          |  SELECT e1.x, e1.y, e2.z
          |  FROM (SELECT src AS x, dst AS y, ddst AS dy FROM ori) e1
          |  JOIN (SELECT src AS x, dst AS z, ddst AS dz FROM ori) e2 USING (x)
          |  JOIN ori c ON c.src = e1.y AND c.dst = e2.z
          |  WHERE e1.dy < e2.dz OR (e1.dy = e2.dz AND e1.y < e2.z))
          |SELECT node, CAST(count(*) AS BIGINT) AS triangles FROM
          |  (SELECT x AS node FROM tri UNION ALL SELECT y FROM tri
          |   UNION ALL SELECT z FROM tri) q
          |GROUP BY 1 ORDER BY 1""".stripMargin),

    // -- single-source BFS hop distances from the smallest page id, 4
    //    bounded rounds over the symmetrized click graph; unreached nodes
    //    absent. The oracle unrolls the same frontier/anti-join rounds ---
    ("q_bfs_levels",
      (s: SparkSession, d: String) => {
        val edges = clickEdges(s, d)
        val srcNode = edges.agg(min(least(col("src"), col("dst"))))
          .head().getLong(0)
        graft.ops.Graph.bfsLevels(edges, "src", "dst", lit(srcNode),
            iters = 4)
          .orderBy("node")
      },
      edgeCtes +
        s""",
          |sym AS MATERIALIZED (SELECT DISTINCT src, dst FROM
          |  (SELECT src, dst FROM edges UNION ALL SELECT dst, src FROM edges) q),
          |d0 AS (SELECT (SELECT min(least(src, dst)) FROM edges) AS node,
          |       CAST(0 AS BIGINT) AS dist),
          |${bfsIterCtes(4)}
          |SELECT node, dist FROM d4 ORDER BY node""".stripMargin),

    // -- SAMPLED closeness centrality (Eppstein–Wang): multi-source BFS
    //    from the page % 7 = 0 sample over the symmetrized click graph,
    //    4 bounded rounds — per node, exact (n_sources, dist_sum) from
    //    the sampled sources; closeness derives as any normalization of
    //    the pair. All K sources share each round's edge scan (state
    //    O(K·reached), the reason sampling beats all-pairs at scale);
    //    the oracle unrolls the same seed-keyed frontier rounds ----------
    ("q_closeness",
      (s: SparkSession, d: String) => {
        val edges = clickEdges(s, d)
        val seeds = edges.select(col("src").as("node"))
          .union(edges.select(col("dst").as("node"))).distinct()
          .filter(col("node") % 7 === 0)
        graft.ops.Graph.closenessSampled(edges, "src", "dst",
            seeds, "node", iters = 4)
          .orderBy("node")
      },
      edgeCtes +
        s""",
          |sym AS MATERIALIZED (SELECT DISTINCT src, dst FROM
          |  (SELECT src, dst FROM edges UNION ALL SELECT dst, src FROM edges) q),
          |nodes AS (SELECT DISTINCT node FROM
          |  (SELECT src AS node FROM edges UNION ALL SELECT dst FROM edges) q),
          |c0 AS (SELECT node AS seed, node, CAST(0 AS BIGINT) AS dist
          |       FROM nodes WHERE node % 7 = 0),
          |${mbfsIterCtes(4)}
          |SELECT node, CAST(count(*) AS BIGINT) AS n_sources,
          |  CAST(sum(dist) AS BIGINT) AS dist_sum
          |FROM c4 GROUP BY 1 ORDER BY 1""".stripMargin),

    // -- SAMPLED STRESS centrality (the exact-integer betweenness
    //    variant, Brandes 2008): from the page % 7 = 0 seed sample,
    //    3-hop forward BFS carrying path counts σ, the shortest-path
    //    DAG, and backward suffix counts ψ(v) = Σ_succ(ψ+1); stress(v)
    //    = Σ_seeds σ·ψ counts the seed-rooted shortest paths with v
    //    INTERIOR — the "bridge" signal betweenness measures, kept
    //    BIGINT end to end (betweenness proper would need rational
    //    σ_st(v)/σ_st). The oracle unrolls all three phases -------------
    ("q_stress",
      (s: SparkSession, d: String) => {
        val edges = clickEdges(s, d)
        val seeds = edges.select(col("src").as("node"))
          .union(edges.select(col("dst").as("node"))).distinct()
          .filter(col("node") % 7 === 0)
        graft.ops.Graph.stressSampled(edges, "src", "dst",
            seeds, "node", iters = Iters)
          .orderBy("node")
      },
      edgeCtes +
        s""",
          |sym AS MATERIALIZED (SELECT DISTINCT src, dst FROM
          |  (SELECT src, dst FROM edges UNION ALL SELECT dst, src FROM edges) q),
          |nodes AS (SELECT DISTINCT node FROM
          |  (SELECT src AS node FROM edges UNION ALL SELECT dst FROM edges) q),
          |w0 AS (SELECT node AS seed, node, CAST(0 AS BIGINT) AS dist,
          |       CAST(1 AS BIGINT) AS sigma FROM nodes WHERE node % 7 = 0),
          |${stressFwdCtes(Iters)},
          |dg AS MATERIALIZED (SELECT u.seed, u.node AS u, wv.node AS w
          |  FROM sym e JOIN w$Iters u ON e.src = u.node
          |  JOIN w$Iters wv ON wv.seed = u.seed AND wv.node = e.dst
          |    AND wv.dist = u.dist + 1),
          |p$Iters AS (SELECT seed, node, dist, CAST(0 AS BIGINT) AS psi
          |  FROM w$Iters),
          |${stressBwdCtes(Iters)}
          |SELECT w.node, CAST(sum(w.sigma * p.psi) AS BIGINT) AS stress
          |FROM w$Iters w JOIN p1 p ON p.seed = w.seed AND p.node = w.node
          |WHERE w.node <> w.seed
          |GROUP BY 1 ORDER BY 1""".stripMargin),

    // -- sampled BETWEENNESS proper (Brandes 2001): the rational
    //    sigma_st(v)/sigma_st dependency over the same seed sample,
    //    forward sigma/DAG phases shared with q_stress, backward
    //    dependency carried as INTEGER ppm — each term is the truncating
    //    (sigma_u*(1e6+delta_ppm_w)) div sigma_w through a DECIMAL(38,0)/
    //    HUGEINT widening, so the whole statistic is BIGINT end to end
    //    (a dec6-double form split the engines on exact half-boundary
    //    rationals). Output per interior node: bc_ppm = sum over seeds ----
    ("q_betweenness",
      (s: SparkSession, d: String) => {
        val edges = clickEdges(s, d)
        val seeds = edges.select(col("src").as("node"))
          .union(edges.select(col("dst").as("node"))).distinct()
          .filter(col("node") % 7 === 0)
        graft.ops.Graph.betweennessSampled(edges, "src", "dst",
            seeds, "node", iters = Iters)
          .orderBy("node")
      },
      edgeCtes +
        s""",
          |sym AS MATERIALIZED (SELECT DISTINCT src, dst FROM
          |  (SELECT src, dst FROM edges UNION ALL SELECT dst, src FROM edges) q),
          |nodes AS (SELECT DISTINCT node FROM
          |  (SELECT src AS node FROM edges UNION ALL SELECT dst FROM edges) q),
          |w0 AS (SELECT node AS seed, node, CAST(0 AS BIGINT) AS dist,
          |       CAST(1 AS BIGINT) AS sigma FROM nodes WHERE node % 7 = 0),
          |${stressFwdCtes(Iters)},
          |dg AS MATERIALIZED (SELECT u.seed, u.node AS u, wv.node AS w
          |  FROM sym e JOIN w$Iters u ON e.src = u.node
          |  JOIN w$Iters wv ON wv.seed = u.seed AND wv.node = e.dst
          |    AND wv.dist = u.dist + 1),
          |dgs AS MATERIALIZED (SELECT d.seed, d.u, d.w,
          |  su.sigma AS sig_u, sw.sigma AS sig_w
          |  FROM dg d
          |  JOIN w$Iters su ON su.seed = d.seed AND su.node = d.u
          |  JOIN w$Iters sw ON sw.seed = d.seed AND sw.node = d.w),
          |q$Iters AS (SELECT seed, node, dist,
          |  CAST(0 AS BIGINT) AS delta FROM w$Iters),
          |${betwBwdCtes(Iters)}
          |SELECT node, CAST(sum(delta) AS BIGINT) AS bc_ppm
          |FROM q1 WHERE node <> seed
          |GROUP BY 1 ORDER BY 1""".stripMargin),

    // -- SAMPLING ERROR of that betweenness estimate: delete-one-stratum
    //    jackknife over the seed sample (seed % 3 strata), integer end to
    //    end — SE² numerator Σ(T − G·c_g)² exact via HUGEINT/DECIMAL(38,0)
    //    widening, doubles only in the final floor(sqrt(·)) (no round()
    //    tie-break anywhere — the q_betweenness half-boundary lesson).
    //    Same Brandes phases; one extra (node, stratum) aggregation -------
    ("q_betweenness_se",
      (s: SparkSession, d: String) => {
        val edges = clickEdges(s, d)
        val seeds = edges.select(col("src").as("node"))
          .union(edges.select(col("dst").as("node"))).distinct()
          .filter(col("node") % 7 === 0)
        graft.ops.Graph.betweennessJackknife(edges, "src", "dst",
            seeds, "node", nStrata = 3, iters = Iters)
          .orderBy("node")
      },
      edgeCtes +
        s""",
          |sym AS MATERIALIZED (SELECT DISTINCT src, dst FROM
          |  (SELECT src, dst FROM edges UNION ALL SELECT dst, src FROM edges) q),
          |nodes AS (SELECT DISTINCT node FROM
          |  (SELECT src AS node FROM edges UNION ALL SELECT dst FROM edges) q),
          |w0 AS (SELECT node AS seed, node, CAST(0 AS BIGINT) AS dist,
          |       CAST(1 AS BIGINT) AS sigma FROM nodes WHERE node % 7 = 0),
          |${stressFwdCtes(Iters)},
          |dg AS MATERIALIZED (SELECT u.seed, u.node AS u, wv.node AS w
          |  FROM sym e JOIN w$Iters u ON e.src = u.node
          |  JOIN w$Iters wv ON wv.seed = u.seed AND wv.node = e.dst
          |    AND wv.dist = u.dist + 1),
          |dgs AS MATERIALIZED (SELECT d.seed, d.u, d.w,
          |  su.sigma AS sig_u, sw.sigma AS sig_w
          |  FROM dg d
          |  JOIN w$Iters su ON su.seed = d.seed AND su.node = d.u
          |  JOIN w$Iters sw ON sw.seed = d.seed AND sw.node = d.w),
          |q$Iters AS (SELECT seed, node, dist,
          |  CAST(0 AS BIGINT) AS delta FROM w$Iters),
          |${betwBwdCtes(Iters)},
          |per AS MATERIALIZED (SELECT node, seed % 3 AS g,
          |    CAST(sum(delta) AS BIGINT) AS c
          |  FROM q1 WHERE node <> seed GROUP BY 1, 2),
          |gs AS (SELECT CAST(count(DISTINCT node % 3) AS BIGINT) AS gg
          |       FROM nodes WHERE node % 7 = 0),
          |tot AS (SELECT node, CAST(sum(c) AS BIGINT) AS bc_ppm,
          |        CAST(count(*) AS BIGINT) AS np FROM per GROUP BY 1),
          |se AS (SELECT t.node, t.bc_ppm, gs.gg, t.np,
          |   CAST(sum((CAST(t.bc_ppm AS HUGEINT) - gs.gg * CAST(p.c AS HUGEINT))
          |          * (CAST(t.bc_ppm AS HUGEINT) - gs.gg * CAST(p.c AS HUGEINT)))
          |     + (gs.gg - t.np) * CAST(t.bc_ppm AS HUGEINT)
          |       * CAST(t.bc_ppm AS HUGEINT)
          |     AS BIGINT) AS se2_num
          |   FROM per p JOIN tot t USING (node) CROSS JOIN gs
          |   GROUP BY 1, 2, 3, 4)
          |SELECT node, bc_ppm, gg AS n_strata, se2_num,
          |  CASE WHEN gg >= 2 THEN CAST(floor(sqrt(CAST(se2_num AS DOUBLE)
          |    / CAST(gg * (gg - 1) AS DOUBLE))) AS BIGINT) END AS se_ppm
          |FROM se ORDER BY node""".stripMargin),

    // -- weighted single-source shortest paths (4 Bellman–Ford rounds)
    //    from the smallest page: transition weight 1+((src*7+dst)%5) as
    //    synthetic cost, parallel edges keep the cheapest, symmetrized.
    //    After 4 rounds: exact shortest distance among ≤4-hop paths —
    //    the weighted twin of q_bfs_levels; the oracle unrolls the same
    //    min-union relaxation rounds ------------------------------------
    ("q_sssp",
      (s: SparkSession, d: String) => {
        val edges = clickEdges(s, d)
          .withColumn("w", (col("src") * 7 + col("dst")) % 5 + 1)
        val srcNode = edges.agg(min(least(col("src"), col("dst"))))
          .head().getLong(0)
        graft.ops.Graph.sssp(edges, "src", "dst", "w", lit(srcNode),
            iters = 4)
          .orderBy("node")
      },
      edgeCtes +
        s""",
          |we AS (SELECT src, dst, (src * 7 + dst) % 5 + 1 AS w FROM edges),
          |sym AS MATERIALIZED (SELECT src, dst, min(w) AS w FROM
          |  (SELECT src, dst, w FROM we UNION ALL SELECT dst, src, w FROM we) q
          |  GROUP BY 1, 2),
          |d0 AS (SELECT (SELECT min(least(src, dst)) FROM edges) AS node,
          |       CAST(0 AS BIGINT) AS dist),
          |${ssspIterCtes(4)}
          |SELECT node, dist FROM d4 ORDER BY node""".stripMargin),

    // -- k-core peeling (k=3, 4 synchronous rounds): survivors of
    //    iterated remove-degree-<k, with residual degree — the "densely
    //    embedded" curation filter one-hop thresholds can't express.
    //    Work shrinks every round; the oracle unrolls the same rounds ----
    ("q_kcore",
      (s: SparkSession, d: String) =>
        graft.ops.Graph.kCore(clickEdges(s, d), "src", "dst", k = 3,
            iters = 4)
          .orderBy("node"),
      edgeCtes +
        s""",
          |${canonCte("live0")},
          |${kcoreIterCtes(3, 4)}
          |SELECT node, CAST(count(*) AS BIGINT) AS deg FROM
          |  (SELECT a AS node FROM live4 UNION ALL SELECT b FROM live4) q
          |GROUP BY 1 ORDER BY 1""".stripMargin),

    // -- WEIGHTED k-core (k=40 total strength, 4 peel rounds): survival
    //    by summed incident transition weight — the engagement-weighted
    //    sibling of q_kcore, with the q_sssp synthetic weight convention
    //    and parallel transitions pre-summed per canonical pair. The
    //    oracle unrolls the same weighted rounds ---------------------------
    ("q_kcore_weighted",
      (s: SparkSession, d: String) =>
        graft.ops.Graph.kCoreWeighted(
            clickEdges(s, d).withColumn("w", (col("src") + col("dst")) % 5 + 1),
            "src", "dst", "w", k = 40L, iters = 4)
          .orderBy("node"),
      edgeCtes +
        s""",
          |wl0 AS MATERIALIZED (SELECT least(src, dst) AS a, greatest(src, dst) AS b,
          |    CAST(sum((src + dst) % 5 + 1) AS BIGINT) AS w
          |  FROM edges WHERE src <> dst GROUP BY 1, 2),
          |${wkcoreIterCtes(40, 4)}
          |SELECT node, CAST(sum(w) AS BIGINT) AS wdeg FROM
          |  (SELECT a AS node, w FROM wl4 UNION ALL SELECT b, w FROM wl4) q
          |GROUP BY 1 ORDER BY 1""".stripMargin),

    // -- reciprocity of the directed click graph: the share of distinct
    //    directed edges whose reverse also exists — "do transitions flow
    //    both ways" in one exact ppm number (plus the raw counts). One
    //    distinct + one self-join on the reversed key -----------------------
    ("q_reciprocity",
      (s: SparkSession, d: String) => {
        val de = clickEdges(s, d).filter(col("src") =!= col("dst"))
          .distinct()
          .localCheckpoint(true) // both sides of the reverse join
        val rev = de.select(col("dst").as("src"), col("src").as("dst"),
          lit(1L).as("has_rev"))
        de.join(rev, Seq("src", "dst"), "left")
          .agg(count(lit(1)).as("n_edges"),
            sum(coalesce(col("has_rev"), lit(0L))).as("n_reciprocal"))
          .select(col("n_edges"), col("n_reciprocal"),
            expr("(n_reciprocal * 1000000L) div n_edges").as("reciprocity_ppm"))
      },
      edgeCtes +
        """,
          |de AS MATERIALIZED (SELECT DISTINCT src, dst FROM edges WHERE src <> dst)
          |SELECT CAST(count(*) AS BIGINT) AS n_edges,
          |  CAST(sum(CASE WHEN r.src IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_reciprocal,
          |  CAST((sum(CASE WHEN r.src IS NOT NULL THEN 1 ELSE 0 END) * 1000000)
          |    // count(*) AS BIGINT) AS reciprocity_ppm
          |FROM de LEFT JOIN de r ON de.src = r.dst AND de.dst = r.src""".stripMargin),

    // -- degree assortativity (Newman 2002): Pearson correlation of
    //    endpoint degrees over the canonical undirected edge list, both
    //    orientations (the undirected convention) — one number telling
    //    whether hubs link to hubs (>0) or to leaves (<0), the structure
    //    signal behind crawl-frontier policies. The q_corr exact-moment
    //    machinery on (deg_a, deg_b) pairs: DECIMAL(38,0) sums, identical
    //    double trees, dec6 ------------------------------------------------
    ("q_assortativity",
      (s: SparkSession, d: String) => {
        val raw = clickEdges(s, d)
        val und = raw.filter(col("src") =!= col("dst"))
          .select(least(col("src"), col("dst")).as("a"),
            greatest(col("src"), col("dst")).as("b"))
          .distinct()
          .localCheckpoint(true) // read by deg + the pair join
        val deg = und.select(col("a").as("node"))
          .union(und.select(col("b").as("node")))
          .groupBy("node").agg(count(lit(1)).as("dg"))
        val pairs = und
          .join(deg.select(col("node").as("a"), col("dg").as("da")), Seq("a"))
          .join(deg.select(col("node").as("b"), col("dg").as("db")), Seq("b"))
        val sym2 = pairs.select(col("da").as("x"), col("db").as("y"))
          .union(pairs.select(col("db").as("x"), col("da").as("y")))
        val dec = org.apache.spark.sql.types.DecimalType(38, 0)
        val a = sym2.agg(
          count(lit(1)).cast(dec).as("n"),
          sum(col("x").cast(dec)).as("sx"),
          sum(col("y").cast(dec)).as("sy"),
          sum((col("x") * col("x")).cast(dec)).as("sxx"),
          sum((col("y") * col("y")).cast(dec)).as("syy"),
          sum((col("x") * col("y")).cast(dec)).as("sxy"))
        val nd = col("n").cast("double"); val sxd = col("sx").cast("double")
        val syd = col("sy").cast("double"); val sxxd = col("sxx").cast("double")
        val syyd = col("syy").cast("double"); val sxyd = col("sxy").cast("double")
        // a regular graph (all degrees equal — e.g. the click graph once
        // it saturates complete at large SF) has zero degree variance:
        // assortativity is undefined there, emitted NULL — the lazy CASE
        // keeps ANSI mode from throwing on the 0/0 before the guard
        val denom = (nd * sxxd - sxd * sxd) * (nd * syyd - syd * syd)
        a.select((col("n") / lit(2)).cast("long").as("n_edges"),
          when(denom > lit(0.0),
            round((nd * sxyd - sxd * syd) / sqrt(denom), 6))
            .as("assortativity"))
      },
      edgeCtes +
        s""",
          |${canonCte("und")},
          |dg AS (SELECT node, CAST(count(*) AS BIGINT) AS dg FROM
          |  (SELECT a AS node FROM und UNION ALL SELECT b FROM und) q GROUP BY 1),
          |pr AS (SELECT x.dg AS da, y.dg AS db
          |       FROM und JOIN dg x ON und.a = x.node JOIN dg y ON und.b = y.node),
          |s2 AS (SELECT da AS x, db AS y FROM pr
          |       UNION ALL SELECT db, da FROM pr),
          |a AS (SELECT count(*) AS nn,
          |  cast(count(*) AS DOUBLE) AS n,
          |  cast(sum(cast(x AS HUGEINT)) AS DOUBLE) AS sx,
          |  cast(sum(cast(y AS HUGEINT)) AS DOUBLE) AS sy,
          |  cast(sum(cast(x AS HUGEINT) * cast(x AS HUGEINT)) AS DOUBLE) AS sxx,
          |  cast(sum(cast(y AS HUGEINT) * cast(y AS HUGEINT)) AS DOUBLE) AS syy,
          |  cast(sum(cast(x AS HUGEINT) * cast(y AS HUGEINT)) AS DOUBLE) AS sxy
          |  FROM s2)
          |SELECT CAST(nn // 2 AS BIGINT) AS n_edges,
          |  CASE WHEN (n * sxx - sx * sx) * (n * syy - sy * sy) > 0.0
          |       THEN round((n * sxy - sx * sy)
          |         / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 6)
          |  END AS assortativity
          |FROM a""".stripMargin),

    // -- double-sweep diameter lower bound (the iFUB/BFS heuristic):
    //    BFS from the min-id node, re-root at its farthest reached node
    //    (ties → min id), BFS again — the second eccentricity is the
    //    classic diameter lower bound, exact on trees and near-tight on
    //    real graphs. The re-rooting stays IN-PLAN (the argmax feeds the
    //    second BFS's seed frame — no driver round trip), both sweeps
    //    share the frontier BFS core, 6-hop horizon. Two rounds of
    //    O(|E|) keyed shuffles --------------------------------------------
    ("q_diameter",
      (s: SparkSession, d: String) => {
        val edges = clickEdges(s, d).localCheckpoint(true) // both sweeps
        val nodes = edges.select(col("src").as("node"))
          .union(edges.select(col("dst").as("node"))).distinct()
        val start = nodes.agg(min(col("node")).as("node"))
        val b1 = graft.ops.Graph.multiBfsLevels(edges, "src", "dst",
          start, "node", iters = 6)
        val mx1 = b1.agg(max(col("dist")).as("ecc_start"))
        val far = b1.join(broadcast(mx1), col("dist") === col("ecc_start"))
          .agg(min(col("node")).as("node"))
        val b2 = graft.ops.Graph.multiBfsLevels(edges, "src", "dst",
          far, "node", iters = 6)
        val mx2 = b2.agg(max(col("dist")).as("diameter_lb"))
        start.select(col("node").as("start_node"))
          .crossJoin(broadcast(far.select(col("node").as("far_node"))))
          .crossJoin(broadcast(mx1))
          .crossJoin(broadcast(mx2)) // all 1-row frames
      },
      edgeCtes +
        s""",
          |sym AS MATERIALIZED (SELECT DISTINCT src, dst FROM
          |  (SELECT src, dst FROM edges UNION ALL SELECT dst, src FROM edges) q),
          |nodes AS (SELECT DISTINCT node FROM
          |  (SELECT src AS node FROM edges UNION ALL SELECT dst FROM edges) q),
          |c0 AS (SELECT min(node) AS seed, min(node) AS node,
          |       CAST(0 AS BIGINT) AS dist FROM nodes),
          |${mbfsIterCtes(6)},
          |m1 AS (SELECT max(dist) AS ecc_start FROM c6),
          |farn AS (SELECT min(node) AS far_node FROM c6 CROSS JOIN m1
          |         WHERE dist = ecc_start),
          |d0 AS (SELECT far_node AS seed, far_node AS node,
          |       CAST(0 AS BIGINT) AS dist FROM farn),
          |${mbfsIterCtes(6, c = "d", g = "h")},
          |m2 AS (SELECT max(dist) AS diameter_lb FROM d6)
          |SELECT (SELECT min(node) FROM nodes) AS start_node,
          |  far_node, ecc_start, diameter_lb
          |FROM farn CROSS JOIN m1 CROSS JOIN m2""".stripMargin),

    // -- MULTI-SOURCE approximate diameter: the q_diameter double sweep
    //    generalized to K=4 hash-spread sources. One shared multi-BFS
    //    computes all four forward eccentricities at one sweep's edge-
    //    scan cost, each source re-roots at its farthest node (ties →
    //    min id), and one more shared sweep from the (deduped) far set
    //    yields backward eccentricities — diameter_lb = max over all
    //    eight, never below the single double-sweep's bound and usually
    //    tighter. Seeds picked by md5 order (deterministic, spread,
    //    SQL-replayable); per-seed rows keep the gate informative -------
    ("q_diameter_multi",
      (s: SparkSession, d: String) => {
        val edges = clickEdges(s, d).localCheckpoint(true) // both sweeps
        val nodes = edges.select(col("src").as("node"))
          .union(edges.select(col("dst").as("node"))).distinct()
        val seeds = nodes
          .withColumn("h", expr(
            "conv(substr(md5(cast(node as string)), 1, 15), 16, 10)")
            .cast("long"))
          .orderBy(col("h"), col("node")).limit(4).select("node")
        val b1 = graft.ops.Graph.multiBfsLevels(edges, "src", "dst",
          seeds, "node", iters = 6)
        val ecc1 = b1.groupBy("seed").agg(max(col("dist")).as("ecc_fwd"))
        val far = b1
          .join(broadcast(ecc1), Seq("seed"))
          .filter(col("dist") === col("ecc_fwd"))
          .groupBy("seed").agg(min(col("node")).as("far_node"))
        val seeds2 = far.select(col("far_node").as("node")).distinct()
        val b2 = graft.ops.Graph.multiBfsLevels(edges, "src", "dst",
          seeds2, "node", iters = 6)
        val ecc2 = b2.groupBy(col("seed").as("far_node"))
          .agg(max(col("dist")).as("ecc_back"))
        val per = far.join(broadcast(ecc1), Seq("seed"))
          .join(broadcast(ecc2), Seq("far_node"))
        val lb = per.agg(max(greatest(col("ecc_fwd"), col("ecc_back")))
          .as("diameter_lb"))
        per.crossJoin(broadcast(lb))
          .select("seed", "ecc_fwd", "far_node", "ecc_back", "diameter_lb")
          .orderBy("seed")
      },
      edgeCtes +
        s""",
          |sym AS MATERIALIZED (SELECT DISTINCT src, dst FROM
          |  (SELECT src, dst FROM edges UNION ALL SELECT dst, src FROM edges) q),
          |nodes AS (SELECT DISTINCT node FROM
          |  (SELECT src AS node FROM edges UNION ALL SELECT dst FROM edges) q),
          |c0 AS (SELECT node AS seed, node, CAST(0 AS BIGINT) AS dist
          |       FROM (SELECT node FROM nodes
          |             ORDER BY ('0x' || substr(md5(cast(node AS VARCHAR)), 1, 15))::BIGINT,
          |               node LIMIT 4) q),
          |${mbfsIterCtes(6)},
          |e1 AS (SELECT seed, max(dist) AS ecc_fwd FROM c6 GROUP BY 1),
          |fr AS (SELECT c6.seed, min(c6.node) AS far_node
          |       FROM c6 JOIN e1 ON c6.seed = e1.seed AND c6.dist = e1.ecc_fwd
          |       GROUP BY 1),
          |d0 AS (SELECT far_node AS seed, far_node AS node,
          |       CAST(0 AS BIGINT) AS dist FROM (SELECT DISTINCT far_node FROM fr) q),
          |${mbfsIterCtes(6, c = "d", g = "h")},
          |e2 AS (SELECT seed AS far_node, max(dist) AS ecc_back FROM d6 GROUP BY 1),
          |per AS (SELECT fr.seed, e1.ecc_fwd, fr.far_node, e2.ecc_back
          |        FROM fr JOIN e1 ON fr.seed = e1.seed
          |        JOIN e2 ON fr.far_node = e2.far_node),
          |lb AS (SELECT max(greatest(ecc_fwd, ecc_back)) AS diameter_lb FROM per)
          |SELECT seed, ecc_fwd, far_node, ecc_back, diameter_lb
          |FROM per CROSS JOIN lb ORDER BY seed""".stripMargin),

    // -- sampled HARMONIC centrality (Boldi & Vigna 2014): Σ 1/d over
    //    reaching sample sources, ×lcm(1..4)=12 so every reciprocal is
    //    an integer — the disconnection-robust closeness (unreached
    //    pairs contribute 0 instead of poisoning the sum). Same sampled
    //    multi-BFS frame and %7 seed convention as q_closeness ----------
    ("q_harmonic",
      (s: SparkSession, d: String) => {
        val edges = clickEdges(s, d)
        val seeds = edges.select(col("src").as("node"))
          .union(edges.select(col("dst").as("node"))).distinct()
          .filter(col("node") % 7 === 0)
        graft.ops.Graph.harmonicSampled(edges, "src", "dst",
            seeds, "node", iters = 4)
          .orderBy("node")
      },
      edgeCtes +
        s""",
          |sym AS MATERIALIZED (SELECT DISTINCT src, dst FROM
          |  (SELECT src, dst FROM edges UNION ALL SELECT dst, src FROM edges) q),
          |nodes AS (SELECT DISTINCT node FROM
          |  (SELECT src AS node FROM edges UNION ALL SELECT dst FROM edges) q),
          |c0 AS (SELECT node AS seed, node, CAST(0 AS BIGINT) AS dist
          |       FROM nodes WHERE node % 7 = 0),
          |${mbfsIterCtes(4)}
          |SELECT node, CAST(count(*) AS BIGINT) AS n_reached,
          |  CAST(sum(12 // dist) AS BIGINT) AS harmonic12
          |FROM c4 WHERE dist >= 1 GROUP BY 1 ORDER BY 1""".stripMargin),

    // -- RANK-BIASED OVERLAP (Webber et al. 2010) between the PageRank
    //    top-20 and the in-degree top-20 — the indefinite-rank agreement
    //    measure for comparing two rankers (does the cheap degree proxy
    //    order pages like the expensive fixed point?). p = 1/2 makes
    //    every weight a dyadic rational, so rbo_scaled = Σ_d ov_d ·
    //    2^(20−d) · (lcm(1..20)/d) is EXACT in BIGINT and the double
    //    derives once. Ranks by count-of-better self-join on the BOUNDED
    //    node table (no partitionless window); depth sweep is a 20-row
    //    frame --------------------------------------------------------
    ("q_rbo",
      (s: SparkSession, d: String) => {
        val edges = clickEdges(s, d).localCheckpoint(true)
        val pr = graft.ops.Graph.pageRank(edges, "src", "dst", iters = Iters)
          .localCheckpoint(true) // node-table-sized, self-joined for ranks
        val deg = edges.groupBy(col("dst").as("node"))
          .agg(count(lit(1)).as("deg")).localCheckpoint(true)
        def top20(dfx: DataFrame, v: String, rkName: String): DataFrame = {
          val o = dfx.select(col("node").as("n2"), col(v).as("v2"))
          dfx.join(o,
              col("v2") > col(v) ||
                (col("v2") === col(v) && col("n2") < col("node")), "left")
            .groupBy("node").agg((count(col("n2")) + 1L).as(rkName))
            .filter(col(rkName) <= 20L)
        }
        val j = top20(pr, "pr", "rka")
          .join(top20(deg, "deg", "rkb"), Seq("node"))
          .localCheckpoint(true) // <= 20 rows, read by every depth
        val depths = s.range(1, 21).select(col("id").as("d"))
        val ov = depths.join(j,
            col("rka") <= col("d") && col("rkb") <= col("d"), "left")
          .groupBy("d").agg(count(col("node")).as("ov"))
        ov.agg(sum(expr(
            "ov * shiftleft(1L, cast(20 - d AS INT)) * (232792560L div d)"))
            .as("rbo_scaled"))
          .select(col("rbo_scaled"),
            round(col("rbo_scaled").cast("double") /
              (1048576.0 * 232792560.0), 6).as("rbo"))
      },
      edgeCtes +
        s""",
          |nodes AS (SELECT DISTINCT node FROM
          |  (SELECT src AS node FROM edges UNION ALL SELECT dst FROM edges) q),
          |od AS (SELECT src AS onode, count(*) AS outdeg FROM edges GROUP BY 1),
          |base AS (SELECT node, coalesce(outdeg, 0) AS outdeg
          |  FROM nodes LEFT JOIN od ON node = onode),
          |r0 AS (SELECT node, outdeg,
          |  1000000000000 // (SELECT count(*) FROM base) AS pr FROM base),
          |${oracleIterCtes(Iters)},
          |prt AS MATERIALIZED (SELECT node, CAST(pr AS BIGINT) AS pr FROM r$Iters),
          |dg AS MATERIALIZED (SELECT dst AS node, CAST(count(*) AS BIGINT) AS deg
          |  FROM edges GROUP BY 1),
          |ra AS (SELECT a.node, CAST(count(b.node) + 1 AS BIGINT) AS rka
          |  FROM prt a LEFT JOIN prt b
          |    ON b.pr > a.pr OR (b.pr = a.pr AND b.node < a.node)
          |  GROUP BY 1 HAVING count(b.node) + 1 <= 20),
          |rb AS (SELECT a.node, CAST(count(b.node) + 1 AS BIGINT) AS rkb
          |  FROM dg a LEFT JOIN dg b
          |    ON b.deg > a.deg OR (b.deg = a.deg AND b.node < a.node)
          |  GROUP BY 1 HAVING count(b.node) + 1 <= 20),
          |jj AS (SELECT ra.node, rka, rkb FROM ra JOIN rb USING (node)),
          |ov AS (SELECT d, CAST(count(jj.node) AS BIGINT) AS ov
          |  FROM range(1, 21) r(d) LEFT JOIN jj ON rka <= d AND rkb <= d
          |  GROUP BY 1),
          |agg AS (SELECT CAST(sum(ov * (1::BIGINT << CAST(20 - d AS INTEGER))
          |    * (232792560 // d)) AS BIGINT) AS rbo_scaled FROM ov)
          |SELECT rbo_scaled,
          |  round(CAST(rbo_scaled AS DOUBLE) / (1048576.0 * 232792560.0), 6)
          |    AS rbo
          |FROM agg""".stripMargin),

    // -- STRONGLY connected components via forward-backward min-label
    //    rounds (FW-BW coloring — Fleischer et al. 2000): f(v)=b(v)=m is
    //    a path certificate m →* v →* m, so the settle decision is sound
    //    at any horizon; settled SCCs peel off and the residual re-runs,
    //    each round opening with 4 TRIM passes (degree-0 nodes = their
    //    own SCC — the DAG fringe settles without waiting on the peel).
    //    3 outer × 8 inner rounds on the DIRECTED click graph (the CC
    //    family above is undirected — direction is what makes page A→B
    //    without B→A two components here). Gated as the component size
    //    census incl. the unsettled-horizon row; scc id = min member.
    //    Per inner step one O(|E|) keyed shuffle; DuckDB replays the
    //    identical rounds -------------------------------------------------
    ("q_scc",
      (s: SparkSession, d: String) =>
        // the raw click graph is one giant SCC at every SF (measured) —
        // hash-thin forward edges and keep 1-in-7 back edges so the gate
        // exercises multi-component peeling, not a single round-1 settle
        graft.ops.Graph.scc(clickEdges(s, d).filter(
            (col("src") < col("dst") &&
              (col("src") * 13 + col("dst")) % 4 === 0) ||
            (col("src") > col("dst") &&
              (col("src") * 7 + col("dst")) % 7 === 0)),
            // inner is now a loud-refusal STEP CAP: the engine loops min-
            // label propagation to fixpoint (extra steps are idempotent,
            // so the oracle's fixed unroll stays a valid mirror as long
            // as it covers the fixture's depth — measured 7 at sf0.01/
            // sf0.001, unrolled 10 for margin)
            "src", "dst", outer = 3, inner = 64)
          .groupBy("scc", "settled_round")
          .agg(count(lit(1)).as("n_nodes"))
          .select("scc", "n_nodes", "settled_round")
          .orderBy("scc"),
      edgeCtes +
        s""",
          |ed AS MATERIALIZED (SELECT DISTINCT src, dst FROM edges
          |  WHERE src <> dst AND
          |    ((src < dst AND (src * 13 + dst) % 4 = 0) OR
          |     (src > dst AND (src * 7 + dst) % 7 = 0))),
          |n1 AS (SELECT DISTINCT node FROM
          |  (SELECT src AS node FROM ed UNION ALL SELECT dst FROM ed) q),
          |er1 AS (SELECT src, dst FROM ed),
          |${(1 to 3).map(r => sccRoundCtes(r, 10, 4)).mkString(",\n")},
          |allset AS (
          |  SELECT * FROM done1 UNION ALL SELECT * FROM done2
          |  UNION ALL SELECT * FROM done3
          |  UNION ALL SELECT node, CAST(NULL AS BIGINT),
          |    CAST(NULL AS INTEGER) FROM n4)
          |SELECT scc, CAST(count(*) AS BIGINT) AS n_nodes, settled_round
          |FROM allset GROUP BY scc, settled_round ORDER BY scc""".stripMargin),

    // -- CONDENSATION-DAG stats over the scc output: contract every
    //    settled component to one node, keep inter-component edges of the
    //    same thinned click graph, and report per component its size and
    //    condensation in/out degree (distinct neighbor components) — the
    //    "which page clusters feed which" link-curation view; the
    //    condensation of a digraph is a DAG by construction. Unsettled
    //    (NULL-scc) nodes and their edges are excluded. Oracle replays
    //    the same scc rounds (fixpoint-covered unroll, see q_scc) then
    //    contracts relationally ------------------------------------------
    ("q_scc_condensation",
      (s: SparkSession, d: String) => {
        val edges = clickEdges(s, d).filter(
            (col("src") < col("dst") &&
              (col("src") * 13 + col("dst")) % 4 === 0) ||
            (col("src") > col("dst") &&
              (col("src") * 7 + col("dst")) % 7 === 0))
          .filter(col("src") =!= col("dst")).distinct()
          .localCheckpoint(true)
        val comp = graft.ops.Graph.scc(edges, "src", "dst",
            outer = 3, inner = 64)
          .filter(col("scc").isNotNull)
          .select(col("node"), col("scc"))
          .localCheckpoint(true)
        val contracted = edges
          .join(comp.select(col("node").as("src"), col("scc").as("cs")), "src")
          .join(comp.select(col("node").as("dst"), col("scc").as("cd")), "dst")
          .filter(col("cs") =!= col("cd"))
          .select(col("cs"), col("cd")).distinct()
          .localCheckpoint(true)
        val sizes = comp.groupBy(col("scc")).agg(count(lit(1)).as("n_nodes"))
        sizes
          .join(contracted.groupBy(col("cs").as("scc"))
            .agg(count(lit(1)).as("out_comps")), Seq("scc"), "left")
          .join(contracted.groupBy(col("cd").as("scc"))
            .agg(count(lit(1)).as("in_comps")), Seq("scc"), "left")
          .select(col("scc"), col("n_nodes"),
            coalesce(col("out_comps"), lit(0L)).as("out_comps"),
            coalesce(col("in_comps"), lit(0L)).as("in_comps"))
          .orderBy("scc")
      },
      edgeCtes +
        s""",
          |ed AS MATERIALIZED (SELECT DISTINCT src, dst FROM edges
          |  WHERE src <> dst AND
          |    ((src < dst AND (src * 13 + dst) % 4 = 0) OR
          |     (src > dst AND (src * 7 + dst) % 7 = 0))),
          |n1 AS (SELECT DISTINCT node FROM
          |  (SELECT src AS node FROM ed UNION ALL SELECT dst FROM ed) q),
          |er1 AS (SELECT src, dst FROM ed),
          |${(1 to 3).map(r => sccRoundCtes(r, 10, 4)).mkString(",\n")},
          |comp AS MATERIALIZED (
          |  SELECT node, scc FROM (
          |    SELECT * FROM done1 UNION ALL SELECT * FROM done2
          |    UNION ALL SELECT * FROM done3) q),
          |contracted AS (SELECT DISTINCT a.scc AS cs, b.scc AS cd
          |  FROM ed JOIN comp a ON ed.src = a.node
          |  JOIN comp b ON ed.dst = b.node
          |  WHERE a.scc <> b.scc),
          |sizes AS (SELECT scc, CAST(count(*) AS BIGINT) AS n_nodes
          |          FROM comp GROUP BY 1),
          |od AS (SELECT cs AS scc, CAST(count(*) AS BIGINT) AS out_comps
          |       FROM contracted GROUP BY 1),
          |id2 AS (SELECT cd AS scc, CAST(count(*) AS BIGINT) AS in_comps
          |        FROM contracted GROUP BY 1)
          |SELECT s.scc, s.n_nodes,
          |  CAST(coalesce(od.out_comps, 0) AS BIGINT) AS out_comps,
          |  CAST(coalesce(id2.in_comps, 0) AS BIGINT) AS in_comps
          |FROM sizes s LEFT JOIN od USING (scc) LEFT JOIN id2 USING (scc)
          |ORDER BY scc""".stripMargin),

    // -- iFUB diameter refinement (Crescenzi et al. 2013, "On computing
    //    the diameter of real-world undirected graphs"): BFS from the
    //    HIGHEST-DEGREE node (the published root heuristic), then
    //    eccentricities of the ENTIRE deepest level set F_k via one
    //    shared multi-BFS — after level k is exhausted, lb = max ecc over
    //    F_k and the diameter is EXACT iff lb ≥ 2(k−1) (remaining pairs
    //    both sit at depth ≤ k−1, so ≤ 2(k−1) apart); otherwise
    //    ub = 2(k−1), already tighter than the trivial 2k. The claim
    //    holds only when both sweeps EXHAUST (max dist < the 6-round
    //    cap — a capped ecc understates and could certify falsely, the
    //    GraphSpec two-paths regression), else ub/exact degrade to
    //    NULL/false. Unlike the
    //    double-sweep LOWER bound, this certifies from ABOVE. Cost: two
    //    shared sweeps; multi-BFS state is O(|F_k|·reached) — on
    //    real-world graphs the deepest level is a thin fringe, but a
    //    corpus-scale run should iterate levels k, k−1, … with a per-level
    //    seed cap the way the paper processes them incrementally ---------
    ("q_diameter_ifub",
      (s: SparkSession, d: String) => {
        val edges = clickEdges(s, d).localCheckpoint(true) // both sweeps
        val sym = edges.union(
            edges.select(col("dst").as("src"), col("src").as("dst")))
          .distinct()
        val deg = sym.groupBy(col("src").as("node"))
          .agg(count(lit(1)).as("deg"))
        val root = deg.orderBy(col("deg").desc, col("node")).limit(1)
          .localCheckpoint(true) // 1 row, read by BFS seed + final select
        val b1 = graft.ops.Graph.multiBfsLevels(edges, "src", "dst",
          root.select("node"), "node", iters = 6)
        val k = b1.agg(max(col("dist")).as("ecc_root"))
        val fringe = b1.join(broadcast(k), col("dist") === col("ecc_root"))
          .select("node")
        val b2 = graft.ops.Graph.multiBfsLevels(edges, "src", "dst",
          fringe, "node", iters = 6)
        val eccs = b2.groupBy("seed").agg(max(col("dist")).as("ecc"))
        val lbx = eccs.agg(max(col("ecc")).as("lb"),
          count(lit(1)).as("fringe_size"))
        // the iFUB certificate is only sound when BOTH sweeps EXHAUSTED
        // their frontiers: an ecc that merely hit the iteration cap (= 6)
        // understates the true eccentricity, and lb >= 2(k-1) could then
        // certify a FALSE diameter. max dist < cap proves the last round
        // added nothing, i.e. the BFS completed; otherwise ub is unknown
        val complete = col("ecc_root") < 6L && col("lb") < 6L
        root.select(col("node").as("root_node"), col("deg").as("root_deg"))
          .crossJoin(broadcast(k))
          .crossJoin(broadcast(lbx))
          .select(col("root_node"), col("root_deg"), col("ecc_root"),
            col("fringe_size"), col("lb"),
            when(complete,
              when(col("lb") >= (col("ecc_root") - 1) * 2, col("lb"))
                .otherwise((col("ecc_root") - 1) * 2)).as("ub"),
            (complete && col("lb") >= (col("ecc_root") - 1) * 2).as("exact"))
      },
      edgeCtes +
        s""",
          |sym AS MATERIALIZED (SELECT DISTINCT src, dst FROM
          |  (SELECT src, dst FROM edges UNION ALL SELECT dst, src FROM edges) q),
          |deg AS (SELECT src AS node, cast(count(*) AS BIGINT) AS deg
          |        FROM sym GROUP BY 1),
          |root AS (SELECT node, deg FROM deg ORDER BY deg DESC, node LIMIT 1),
          |c0 AS (SELECT node AS seed, node, CAST(0 AS BIGINT) AS dist FROM root),
          |${mbfsIterCtes(6)},
          |k AS (SELECT max(dist) AS ecc_root FROM c6),
          |fringe AS (SELECT c6.node FROM c6 CROSS JOIN k WHERE dist = ecc_root),
          |d0 AS (SELECT node AS seed, node, CAST(0 AS BIGINT) AS dist FROM fringe),
          |${mbfsIterCtes(6, c = "d", g = "h")},
          |e AS (SELECT seed, max(dist) AS ecc FROM d6 GROUP BY 1),
          |lbx AS (SELECT max(ecc) AS lb, cast(count(*) AS BIGINT) AS fringe_size
          |        FROM e)
          |SELECT root.node AS root_node, root.deg AS root_deg, ecc_root,
          |  fringe_size, lb,
          |  CASE WHEN ecc_root < 6 AND lb < 6 THEN
          |    CASE WHEN lb >= 2 * (ecc_root - 1) THEN lb
          |         ELSE 2 * (ecc_root - 1) END
          |  END AS ub,
          |  ecc_root < 6 AND lb < 6 AND lb >= 2 * (ecc_root - 1) AS exact
          |FROM root CROSS JOIN k CROSS JOIN lbx""".stripMargin),

    // -- WEIGHTED diameter lower bound: the q_diameter double sweep on
    //    the WEIGHTED click graph (q_sssp's synthetic per-edge costs) —
    //    two Bellman–Ford sweeps through the shared sssp core instead of
    //    BFS, so the bound is in accumulated edge WEIGHT (latency-like),
    //    not hops. Re-root at the max-distance node (ties → min id);
    //    the two scalar re-roots are 1-row collects (the q_sssp start
    //    convention). 5 relaxation rounds bound path length in hops ------
    ("q_diameter_weighted",
      (s: SparkSession, d: String) => {
        val edges = clickEdges(s, d)
          .withColumn("w", (col("src") * 7 + col("dst")) % 5 + 1)
          .localCheckpoint(true) // both sweeps
        val srcNode = edges.agg(min(least(col("src"), col("dst"))))
          .head().getLong(0)
        val d1 = graft.ops.Graph.sssp(edges, "src", "dst", "w",
            lit(srcNode), iters = 5)
          .localCheckpoint(true) // node-table-sized, read twice
        val ecc1 = d1.agg(max(col("dist"))).head().getLong(0)
        val far = d1.filter(col("dist") === ecc1)
          .agg(min(col("node"))).head().getLong(0)
        val d2 = graft.ops.Graph.sssp(edges, "src", "dst", "w",
          lit(far), iters = 5)
        val ecc2 = d2.agg(max(col("dist"))).head().getLong(0)
        import s.implicits._
        Seq((srcNode, ecc1, far, math.max(ecc1, ecc2)))
          .toDF("start_node", "ecc_start", "far_node", "wdiameter_lb")
      },
      edgeCtes +
        s""",
          |we AS (SELECT src, dst, (src * 7 + dst) % 5 + 1 AS w FROM edges),
          |sym AS MATERIALIZED (SELECT src, dst, min(w) AS w FROM
          |  (SELECT src, dst, w FROM we UNION ALL SELECT dst, src, w FROM we) q
          |  GROUP BY 1, 2),
          |d0 AS (SELECT (SELECT min(least(src, dst)) FROM edges) AS node,
          |       CAST(0 AS BIGINT) AS dist),
          |${ssspIterCtes(5)},
          |m1 AS (SELECT max(dist) AS ecc_start FROM d5),
          |farn AS (SELECT min(node) AS far_node FROM d5 CROSS JOIN m1
          |         WHERE dist = ecc_start),
          |e0 AS (SELECT far_node AS node, CAST(0 AS BIGINT) AS dist FROM farn),
          |${ssspIterCtes(5, c = "e")},
          |m2 AS (SELECT max(dist) AS ecc_back FROM e5)
          |SELECT (SELECT min(least(src, dst)) FROM edges) AS start_node,
          |  ecc_start, far_node,
          |  greatest(ecc_start, ecc_back) AS wdiameter_lb
          |FROM farn CROSS JOIN m1 CROSS JOIN m2""".stripMargin),

    // -- TextRank keyword scoring (Mihalcea & Tarau 2004): PageRank over
    //    the word co-occurrence graph (consecutive-token pairs per doc,
    //    symmetrized, multiplicity = co-occurrence count) — keyword
    //    extraction as a pure composition of the tokenizer and the SAME
    //    integer fixed-point core as q_pagerank, oracle iterations
    //    reused verbatim. One explode + the per-round O(|E|) shuffles ----
    ("q_textrank",
      (s: SparkSession, d: String) => {
        val tok = t(s, d, "documents")
          .select(expr("regexp_extract_all(text, '\\\\S+', 0)").as("w"))
        val pairs = tok.filter(size(col("w")) > 1)
          .select(explode(expr("transform(sequence(1, size(w) - 1), " +
            "i -> struct(element_at(w, i) AS src, element_at(w, i + 1) AS dst))"))
            .as("e"))
          .select(col("e.src").as("src"), col("e.dst").as("dst"))
          .filter(col("src") =!= col("dst"))
        val sym = pairs.union(
          pairs.select(col("dst").as("src"), col("src").as("dst")))
        graft.ops.Graph.pageRank(sym, "src", "dst", iters = Iters)
          .select(col("node").as("word"), col("pr"))
          .orderBy("word")
      },
      s"""WITH tok AS (SELECT regexp_extract_all(text, '\\S+') AS w
         |             FROM documents),
         |bg AS (SELECT unnest([w[i] || ' ' || w[i+1]
         |                     for i in range(1, len(w))]) AS bigram FROM tok),
         |e0 AS (SELECT split_part(bigram, ' ', 1) AS src,
         |              split_part(bigram, ' ', 2) AS dst FROM bg),
         |e1 AS (SELECT src, dst FROM e0 WHERE src <> dst),
         |edges AS (SELECT src, dst FROM e1 UNION ALL SELECT dst, src FROM e1),
         |nodes AS (SELECT DISTINCT node FROM
         |  (SELECT src AS node FROM edges UNION ALL SELECT dst FROM edges) q),
         |od AS (SELECT src AS onode, count(*) AS outdeg FROM edges GROUP BY 1),
         |base AS (SELECT node, coalesce(outdeg, 0) AS outdeg
         |  FROM nodes LEFT JOIN od ON node = onode),
         |r0 AS (SELECT node, outdeg,
         |  1000000000000 // (SELECT count(*) FROM base) AS pr FROM base),
         |${oracleIterCtes(Iters)}
         |SELECT node AS word, CAST(pr AS BIGINT) AS pr
         |FROM r$Iters ORDER BY word""".stripMargin),

    // -- k-truss (k=5, 3 peel rounds): iterated removal of edges in
    //    fewer than k−2 triangles — the edge-grained cohesion filter
    //    (q_kcore keeps hub-glued fluff a truss rejects). Triangle
    //    support per round reuses the degree-oriented wedge join (hub
    //    fanout capped at O(√|E|)); the oracle unrolls the same rounds
    //    with the orientation and tie-breaks mirrored term for term ------
    ("q_ktruss",
      (s: SparkSession, d: String) =>
        graft.ops.Graph.kTruss(clickEdges(s, d), "src", "dst", k = 5,
            iters = 3)
          .orderBy("a", "b"),
      edgeCtes +
        s""",
          |${canonCte("lv0")},
          |${trussIterCtes(5, 3)}
          |SELECT a, b, support FROM lv3 ORDER BY a, b""".stripMargin),

    // -- HITS hubs/authorities over the click graph (Kleinberg 1999) as
    //    an exact integer fixed point: per round two O(|E|) keyed
    //    shuffles (authority pass on dst, hub pass on src), each side
    //    L1-renormalized to 1e9 mass by a truncating division so both
    //    engines replay identical arithmetic (the q_pagerank contract,
    //    with the normalization multiply in DECIMAL/HUGEINT — a long
    //    product of raw·scale wraps). Parallel edges pre-sum to
    //    multiplicity weights ---------------------------------------------
    ("q_hits",
      (s: SparkSession, d: String) =>
        graft.ops.Graph.hits(clickEdges(s, d), "src", "dst", iters = Iters)
          .orderBy("node"),
      edgeCtes +
        s""",
          |we AS MATERIALIZED (SELECT src, dst, CAST(count(*) AS BIGINT) AS w
          |  FROM edges GROUP BY 1, 2),
          |nodes AS (SELECT DISTINCT node FROM
          |  (SELECT src AS node FROM we UNION ALL SELECT dst FROM we) q),
          |h0 AS (SELECT node, CAST(1000000 AS BIGINT) AS h FROM nodes),
          |${hitsIterCtes(Iters)}
          |SELECT n.node, h.h AS hub, a.a AS auth
          |FROM nodes n JOIN h$Iters h ON n.node = h.node
          |     JOIN a$Iters a ON n.node = a.node
          |ORDER BY n.node""".stripMargin),

    // -- exact Newman modularity audit of the q_label_prop communities:
    //    per community the intra-edge count, total degree, and the exact
    //    integer numerator q_num = 4·m·m_c − D_c² out of 4m² — the
    //    quality gate that decides whether a clustering is worth acting
    //    on, composed from the SAME unrolled label-prop rounds the
    //    oracle already replays. All keyed shuffles linear in |E|;
    //    output is communities-sized ---------------------------------------
    ("q_modularity",
      (s: SparkSession, d: String) => {
        val edges = clickEdges(s, d).localCheckpoint(true) // read by both
        val nodes = edges.select(col("src").as("node"))
          .union(edges.select(col("dst").as("node"))).distinct()
        val seeds = nodes.filter(col("node") % 5 === 0)
          .select(col("node"), (col("node") % 3).as("seed_label"))
        val labels = graft.ops.Graph.labelPropagate(edges, "src", "dst",
          seeds, "node", "seed_label", iters = Iters)
        graft.ops.Graph.modularity(edges, "src", "dst",
            labels, "node", "label")
          .orderBy("community")
      },
      edgeCtes +
        s""",
          |sym AS (SELECT src, dst FROM edges UNION ALL SELECT dst, src FROM edges),
          |nodes AS (SELECT DISTINCT node FROM
          |  (SELECT src AS node FROM edges UNION ALL SELECT dst FROM edges) q),
          |l0 AS (SELECT node,
          |  CASE WHEN node % 5 = 0 THEN node % 3 END AS lbl,
          |  node % 5 = 0 AS is_seed FROM nodes),
          |${lpIterCtes(Iters)},
          |${canonCte("und")},
          |mm AS (SELECT CAST(count(*) AS BIGINT) AS m FROM und),
          |dg AS (SELECT ln, CAST(count(*) AS BIGINT) AS deg FROM
          |  (SELECT a AS ln FROM und UNION ALL SELECT b FROM und) q GROUP BY 1),
          |lab AS MATERIALIZED (SELECT node AS ln, CAST(lbl AS BIGINT) AS lbl
          |  FROM l$Iters WHERE lbl IS NOT NULL),
          |intra AS (SELECT la.lbl AS community, CAST(count(*) AS BIGINT) AS m_intra
          |  FROM und JOIN lab la ON und.a = la.ln JOIN lab lb ON und.b = lb.ln
          |  WHERE la.lbl = lb.lbl GROUP BY 1),
          |comm AS (SELECT l.lbl AS community, CAST(count(*) AS BIGINT) AS n_nodes,
          |    CAST(sum(coalesce(deg, 0)) AS BIGINT) AS deg_total
          |  FROM lab l LEFT JOIN dg ON l.ln = dg.ln GROUP BY 1)
          |SELECT community, n_nodes, coalesce(m_intra, 0) AS m_intra, deg_total,
          |  4 * m * coalesce(m_intra, 0) - deg_total * deg_total AS q_num
          |FROM comm LEFT JOIN intra USING (community) CROSS JOIN mm
          |ORDER BY community""".stripMargin)
  )

  /** One WEIGHTED k-core peel round for q_kcore_weighted, mirroring
    * Graph.kCoreWeighted: weighted degrees over surviving edges, keep
    * nodes with total strength >= k, keep edges whose BOTH endpoints
    * survive.
    */
  private def wkcoreIterCtes(k: Long, iters: Int): String =
    (1 to iters).map { i =>
      s"""wdg$i AS (SELECT node, CAST(sum(w) AS BIGINT) AS wdeg FROM
         |  (SELECT a AS node, w FROM wl${i - 1} UNION ALL
         |   SELECT b, w FROM wl${i - 1}) q GROUP BY 1),
         |wkp$i AS (SELECT node FROM wdg$i WHERE wdeg >= $k),
         |wl$i AS MATERIALIZED (SELECT e.a, e.b, e.w FROM wl${i - 1} e
         |  JOIN wkp$i x ON e.a = x.node
         |  JOIN wkp$i y ON e.b = y.node)""".stripMargin
    }.mkString(",\n")

  /** One k-truss peel round for the q_ktruss oracle, mirroring
    * Graph.kTruss: degree orientation with the (deg, id) tie-break,
    * wedge join ordered by the same rank, per-edge support from the
    * 3-way triangle-edge explode, filter at k−2.
    */
  private def trussIterCtes(k: Int, iters: Int): String =
    (1 to iters).map { i =>
      s"""dg$i AS (SELECT node, count(*) AS deg FROM
         |  (SELECT a AS node FROM lv${i - 1} UNION ALL
         |   SELECT b FROM lv${i - 1}) q GROUP BY 1),
         |or$i AS MATERIALIZED (SELECT
         |    CASE WHEN da < db OR (da = db AND a < b) THEN a ELSE b END AS src,
         |    CASE WHEN da < db OR (da = db AND a < b) THEN b ELSE a END AS dst,
         |    CASE WHEN da < db OR (da = db AND a < b) THEN db ELSE da END AS ddst
         |  FROM (SELECT l.a, l.b, x.deg AS da, y.deg AS db
         |        FROM lv${i - 1} l JOIN dg$i x ON l.a = x.node
         |             JOIN dg$i y ON l.b = y.node)),
         |tr$i AS (SELECT e1.src AS x, e1.dst AS y, e2.dst AS z
         |  FROM or$i e1 JOIN or$i e2 ON e1.src = e2.src
         |    AND (e1.ddst < e2.ddst OR (e1.ddst = e2.ddst AND e1.dst < e2.dst))
         |  JOIN or$i e3 ON e3.src = e1.dst AND e3.dst = e2.dst),
         |sp$i AS (SELECT a, b, CAST(count(*) AS BIGINT) AS sup FROM (
         |    SELECT least(x, y) AS a, greatest(x, y) AS b FROM tr$i
         |    UNION ALL SELECT least(x, z), greatest(x, z) FROM tr$i
         |    UNION ALL SELECT least(y, z), greatest(y, z) FROM tr$i) q
         |  GROUP BY 1, 2),
         |lv$i AS (SELECT l.a, l.b, coalesce(s.sup, 0) AS support
         |  FROM lv${i - 1} l LEFT JOIN sp$i s ON l.a = s.a AND l.b = s.b
         |  WHERE coalesce(s.sup, 0) >= ${k - 2})""".stripMargin
    }.mkString(",\n")

  /** One HITS round for the q_hits oracle, mirroring Graph.hits term for
    * term: raw authority = Σ hub·w over in-edges (zero for sink-free
    * nodes via the nodes LEFT JOIN), L1-renormalize to 1e9 with the
    * HUGEINT multiply, then the hub pass symmetrically.
    */
  private def hitsIterCtes(iters: Int): String =
    (1 to iters).map { i =>
      s"""ar$i AS (SELECT e.dst AS node, CAST(sum(h.h * e.w) AS BIGINT) AS raw
         |  FROM we e JOIN h${i - 1} h ON e.src = h.node GROUP BY 1),
         |af$i AS (SELECT n.node, coalesce(r.raw, 0) AS raw
         |  FROM nodes n LEFT JOIN ar$i r ON n.node = r.node),
         |at$i AS (SELECT CAST(sum(raw) AS HUGEINT) AS tot FROM af$i),
         |a$i AS (SELECT node,
         |  CAST((CAST(raw AS HUGEINT) * 1000000000) // tot AS BIGINT) AS a
         |  FROM af$i CROSS JOIN at$i),
         |hr$i AS (SELECT e.src AS node, CAST(sum(a.a * e.w) AS BIGINT) AS raw
         |  FROM we e JOIN a$i a ON e.dst = a.node GROUP BY 1),
         |hf$i AS (SELECT n.node, coalesce(r.raw, 0) AS raw
         |  FROM nodes n LEFT JOIN hr$i r ON n.node = r.node),
         |ht$i AS (SELECT CAST(sum(raw) AS HUGEINT) AS tot FROM hf$i),
         |h$i AS (SELECT node,
         |  CAST((CAST(raw AS HUGEINT) * 1000000000) // tot AS BIGINT) AS h
         |  FROM hf$i CROSS JOIN ht$i)""".stripMargin
    }.mkString(",\n")

  /** One k-core peel round for the q_kcore oracle, mirroring Graph.kCore:
    * degrees over the surviving edges, keep nodes with deg >= k, keep
    * edges whose BOTH endpoints survive.
    */
  private def kcoreIterCtes(k: Int, iters: Int): String =
    (1 to iters).map { i =>
      s"""dg$i AS (SELECT node, count(*) AS deg FROM
         |  (SELECT a AS node FROM live${i - 1} UNION ALL
         |   SELECT b FROM live${i - 1}) q GROUP BY 1),
         |kp$i AS (SELECT node FROM dg$i WHERE deg >= $k),
         |live$i AS MATERIALIZED (SELECT e.a, e.b FROM live${i - 1} e
         |  JOIN kp$i x ON e.a = x.node
         |  JOIN kp$i y ON e.b = y.node)""".stripMargin
    }.mkString(",\n")

  /** One personalized-PageRank round for the q_ppr oracle, mirroring
    * Graph.personalizedPageRank term for term: teleport and dangling mass
    * flow to seeds only, contributions to all.
    */
  private def pprIterCtes(iters: Int): String =
    (1 to iters).map { i =>
      s"""s$i AS (SELECT sum(pr) AS total,
         |  sum(CASE WHEN outdeg = 0 THEN pr ELSE 0 END) AS dangling FROM r${i - 1}),
         |c$i AS (SELECT e.dst AS cnode, sum(r.pr // r.outdeg) AS contrib
         |  FROM edges e JOIN r${i - 1} r ON e.src = r.node WHERE r.outdeg > 0
         |  GROUP BY 1),
         |r$i AS (SELECT b.node, b.outdeg, b.is_seed,
         |  (CASE WHEN b.is_seed
         |    THEN (15 * (total // (SELECT ns FROM ns))) // 100 ELSE 0 END)
         |  + ((85 * (coalesce(contrib, 0) +
         |      CASE WHEN b.is_seed THEN dangling // (SELECT ns FROM ns)
         |           ELSE 0 END)) // 100) AS pr
         |  FROM r${i - 1} b LEFT JOIN c$i ON b.node = c$i.cnode CROSS JOIN s$i)""".stripMargin
    }.mkString(",\n")

  /** One weighted-PageRank round for the q_pagerank_weighted oracle,
    * mirroring Graph.weightedPageRank term for term: weighted shares
    * (pr*w) // wout per grouped edge, uniform teleport and dangling
    * redistribution over the fixed node count nn.
    */
  private def wprIterCtes(iters: Int): String =
    (1 to iters).map { i =>
      s"""s$i AS (SELECT sum(pr) AS total,
         |  sum(CASE WHEN wout = 0 THEN pr ELSE 0 END) AS dangling FROM r${i - 1}),
         |c$i AS (SELECT e.dst AS cnode, sum((r.pr * e.w) // r.wout) AS contrib
         |  FROM we e JOIN r${i - 1} r ON e.src = r.node WHERE r.wout > 0
         |  GROUP BY 1),
         |r$i AS (SELECT b.node, b.wout,
         |  ((15 * (total // (SELECT n FROM nn))) // 100)
         |  + ((85 * (coalesce(contrib, 0) + (dangling // (SELECT n FROM nn)))) // 100) AS pr
         |  FROM r${i - 1} b LEFT JOIN c$i ON b.node = c$i.cnode CROSS JOIN s$i)""".stripMargin
    }.mkString(",\n")

  /** One forward stress round for the q_stress oracle, mirroring
    * Graph.stressSampled phase 1: σ sums over the previous frontier's
    * predecessors BEFORE the freshness anti-join, so tied shortest
    * paths accumulate.
    */
  private def stressFwdCtes(iters: Int): String =
    (1 to iters).map { i =>
      s"""a$i AS (SELECT p.seed, e.dst AS node, CAST(sum(p.sigma) AS BIGINT) AS sigma
         |  FROM sym e JOIN w${i - 1} p ON e.src = p.node AND p.dist = ${i - 1}
         |  GROUP BY 1, 2),
         |w$i AS MATERIALIZED (SELECT * FROM w${i - 1} UNION ALL
         |  SELECT a.seed, a.node, CAST($i AS BIGINT), a.sigma FROM a$i a
         |  WHERE NOT EXISTS (SELECT 1 FROM w${i - 1} x
         |                    WHERE x.seed = a.seed AND x.node = a.node))""".stripMargin
    }.mkString(",\n")

  /** One backward stress round (deepest level first), mirroring
    * Graph.stressSampled phase 3: ψ at distance i = Σ over DAG
    * successors of (ψ + 1), deeper levels already final.
    */
  private def stressBwdCtes(iters: Int): String =
    ((iters - 1) to 1 by -1).map { i =>
      s"""sb$i AS (SELECT d.seed, d.u, CAST(sum(p2.psi + 1) AS BIGINT) AS sm
         |  FROM dg d JOIN p${i + 1} p2 ON p2.seed = d.seed AND p2.node = d.w
         |  GROUP BY 1, 2),
         |p$i AS MATERIALIZED (SELECT f.seed, f.node, f.dist,
         |  CASE WHEN f.dist = $i THEN CAST(coalesce(sb$i.sm, 0) AS BIGINT)
         |       ELSE f.psi END AS psi
         |  FROM p${i + 1} f LEFT JOIN sb$i
         |    ON f.seed = sb$i.seed AND f.node = sb$i.u)""".stripMargin
    }.mkString(",\n")

  /** One backward BETWEENNESS round (deepest level first), mirroring
    * Graph.betweennessSampled: delta_ppm at distance i = the truncating
    * HUGEINT-widened per-successor terms summed; deeper levels final.
    */
  private def betwBwdCtes(iters: Int): String =
    ((iters - 1) to 1 by -1).map { i =>
      s"""db$i AS (SELECT g.seed, g.u,
         |  CAST(sum((CAST(g.sig_u AS HUGEINT) * (1000000 + p.delta))
         |    // g.sig_w) AS BIGINT) AS sm
         |  FROM dgs g JOIN q${i + 1} p ON p.seed = g.seed AND p.node = g.w
         |  GROUP BY 1, 2),
         |q$i AS MATERIALIZED (SELECT f.seed, f.node, f.dist,
         |  CASE WHEN f.dist = $i
         |       THEN CAST(coalesce(db$i.sm, 0) AS BIGINT)
         |       ELSE f.delta END AS delta
         |  FROM q${i + 1} f LEFT JOIN db$i
         |    ON f.seed = db$i.seed AND f.node = db$i.u)""".stripMargin
    }.mkString(",\n")

  /** One multi-source BFS round for the q_closeness oracle, mirroring
    * Graph.multiBfsLevels: the seed-keyed frontier expands, dedupes, and
    * anti-joins against everything that seed already reached.
    */
  private def mbfsIterCtes(iters: Int, c: String = "c",
      g: String = "g"): String =
    (1 to iters).map { i =>
      s"""$g$i AS (SELECT DISTINCT p.seed, e.dst AS node FROM sym e
         |  JOIN $c${i - 1} p ON e.src = p.node AND p.dist = ${i - 1}),
         |$c$i AS MATERIALIZED (SELECT * FROM $c${i - 1} UNION ALL
         |  SELECT g.seed, g.node, CAST($i AS BIGINT) FROM $g$i g
         |  WHERE NOT EXISTS (SELECT 1 FROM $c${i - 1} x
         |                    WHERE x.seed = g.seed AND x.node = g.node))""".stripMargin
    }.mkString(",\n")

  /** One OUTER round of the q_scc oracle, mirroring Graph.scc: `inner`
    * min-label steps along the residual edges (f side) and against them
    * (b side), nodes with f = b settle, the rest become round r+1's
    * residual. Expects n$r (residual nodes) and er$r (residual edges) to
    * exist; emits done$r plus n${r+1}/er${r+1}.
    */
  private def sccRoundCtes(r: Int, inner: Int, trim: Int): String = {
    // every step CTE is MATERIALIZED: each references its predecessor
    // twice, so inlining would re-expand the whole chain exponentially
    // across 3 rounds × (trim + 2·inner) steps — the hang is real
    val trimCtes =
      s"k${r}_0 AS MATERIALIZED (SELECT node FROM n$r),\n" +
        s"e${r}_0 AS MATERIALIZED (SELECT src, dst FROM er$r),\n" +
        (1 to trim).map { t =>
          s"""k${r}_$t AS MATERIALIZED (SELECT node FROM k${r}_${t - 1}
             |  WHERE node IN (SELECT src FROM e${r}_${t - 1})
             |    AND node IN (SELECT dst FROM e${r}_${t - 1})),
             |e${r}_$t AS MATERIALIZED (SELECT e.src, e.dst FROM e${r}_${t - 1} e
             |  JOIN k${r}_$t ka ON e.src = ka.node
             |  JOIN k${r}_$t kb ON e.dst = kb.node)""".stripMargin
        }.mkString(",\n") +
        s""",
           |trimdone$r AS MATERIALIZED (SELECT node, node AS scc,
           |  CAST($r AS INTEGER) AS settled_round FROM n$r
           |  WHERE node NOT IN (SELECT node FROM k${r}_$trim))""".stripMargin
    def side(tag: String, sc: String, dc: String): String =
      s"${tag}${r}_0 AS MATERIALIZED (SELECT node, node AS lbl FROM k${r}_$trim),\n" +
        (1 to inner).map { i =>
          s"""${tag}c${r}_$i AS MATERIALIZED (SELECT e.$dc AS node, min(p.lbl) AS inlbl
             |  FROM e${r}_$trim e JOIN ${tag}${r}_${i - 1} p ON e.$sc = p.node
             |  GROUP BY 1),
             |${tag}${r}_$i AS MATERIALIZED (
             |  SELECT n.node, least(n.lbl, coalesce(c.inlbl, n.lbl)) AS lbl
             |  FROM ${tag}${r}_${i - 1} n
             |  LEFT JOIN ${tag}c${r}_$i c USING (node))""".stripMargin
        }.mkString(",\n")
    trimCtes + ",\n" +
      side("f", "src", "dst") + ",\n" + side("b", "dst", "src") +
      s""",
         |lab$r AS MATERIALIZED (SELECT f.node, f.lbl AS flbl, b.lbl AS blbl
         |  FROM f${r}_$inner f JOIN b${r}_$inner b USING (node)),
         |done$r AS MATERIALIZED (SELECT node, flbl AS scc,
         |  CAST($r AS INTEGER) AS settled_round
         |  FROM lab$r WHERE flbl = blbl
         |  UNION ALL SELECT node, scc, settled_round FROM trimdone$r),
         |n${r + 1} AS MATERIALIZED (SELECT node FROM lab$r WHERE flbl <> blbl),
         |er${r + 1} AS MATERIALIZED (SELECT e.src, e.dst FROM e${r}_$trim e
         |  JOIN n${r + 1} a ON e.src = a.node
         |  JOIN n${r + 1} b2 ON e.dst = b2.node)""".stripMargin
  }

  /** One BFS round for the q_bfs_levels oracle, mirroring Graph.bfsLevels:
    * expand only the previous round's frontier, dedupe, anti-join against
    * everything already reached.
    */
  private def bfsIterCtes(iters: Int): String =
    (1 to iters).map { i =>
      s"""f$i AS (SELECT DISTINCT e.dst AS node FROM sym e
         |  JOIN d${i - 1} p ON e.src = p.node AND p.dist = ${i - 1}),
         |d$i AS MATERIALIZED (SELECT * FROM d${i - 1} UNION ALL
         |  SELECT node, CAST($i AS BIGINT) FROM f$i
         |  WHERE node NOT IN (SELECT node FROM d${i - 1}))""".stripMargin
    }.mkString(",\n")

  /** One Bellman–Ford relaxation round for the q_sssp oracle, mirroring
    * Graph.sssp: min-union of the carried distances with every edge
    * relaxed from the previous round's frame.
    */
  private def ssspIterCtes(iters: Int, c: String = "d"): String =
    (1 to iters).map { i =>
      s"""$c$i AS MATERIALIZED (SELECT node, min(dist) AS dist FROM
         |  (SELECT node, dist FROM $c${i - 1}
         |   UNION ALL
         |   SELECT e.dst, p.dist + e.w FROM sym e
         |   JOIN $c${i - 1} p ON e.src = p.node) q
         |  GROUP BY 1)""".stripMargin
    }.mkString(",\n")

  /** One WEIGHTED label-propagation round for q_label_prop_weighted,
    * mirroring Graph.weightedLabelPropagate: votes sum edge weights
    * instead of counting rows; argmax and clamping identical to
    * [[lpIterCtes]].
    */
  private def wlpIterCtes(iters: Int): String =
    (1 to iters).map { i =>
      s"""v$i AS (SELECT e.dst AS cand, l.lbl AS vl, CAST(sum(e.w) AS BIGINT) AS c
         |  FROM sym e JOIN l${i - 1} l ON e.src = l.node
         |  WHERE l.lbl IS NOT NULL GROUP BY 1, 2),
         |m$i AS (SELECT cand, max(c) AS mc FROM v$i GROUP BY 1),
         |p$i AS (SELECT v.cand, min(v.vl) AS nl
         |  FROM v$i v JOIN m$i m ON v.cand = m.cand AND v.c = m.mc GROUP BY 1),
         |l$i AS (SELECT b.node,
         |  CASE WHEN b.is_seed THEN b.lbl ELSE coalesce(p.nl, b.lbl) END AS lbl,
         |  b.is_seed
         |  FROM l${i - 1} b LEFT JOIN p$i p ON b.node = p.cand)""".stripMargin
    }.mkString(",\n")

  /** One label-propagation round for the q_label_prop oracle, mirroring
    * Graph.labelPropagate term for term: vote counts from labeled
    * neighbors over the symmetrized edges, two-step deterministic argmax,
    * clamped seeds, carry-forward when no labeled neighbor voted.
    */
  private def lpIterCtes(iters: Int): String =
    (1 to iters).map { i =>
      s"""v$i AS (SELECT e.dst AS cand, l.lbl AS vl, count(*) AS c
         |  FROM sym e JOIN l${i - 1} l ON e.src = l.node
         |  WHERE l.lbl IS NOT NULL GROUP BY 1, 2),
         |m$i AS (SELECT cand, max(c) AS mc FROM v$i GROUP BY 1),
         |p$i AS (SELECT v.cand, min(v.vl) AS nl
         |  FROM v$i v JOIN m$i m ON v.cand = m.cand AND v.c = m.mc GROUP BY 1),
         |l$i AS (SELECT b.node,
         |  CASE WHEN b.is_seed THEN b.lbl ELSE coalesce(p.nl, b.lbl) END AS lbl,
         |  b.is_seed
         |  FROM l${i - 1} b LEFT JOIN p$i p ON b.node = p.cand)""".stripMargin
    }.mkString(",\n")
}
