package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Graph centrality over an edge list — the link-graph quality signal of
  * web-corpus curation (PageRank-family scores over the crawl's link or
  * click graph rank sources/pages for retention and sampling weight, the
  * same role the harmonic/centrality columns play in public crawl-data
  * releases). Complements [[ConnectedComponents]], which answers "which
  * nodes form one cluster" where this answers "how central is each node".
  *
  * Exact fixed-point arithmetic: ranks are carried as integer mass units
  * (`scale` total, default 10^12) and every step is integer arithmetic —
  * truncating `div`, order-independent long sums — so the result is
  * EXACTLY reproducible across engines, partitionings and reruns, where a
  * double-precision power iteration drifts with reduction order. That
  * determinism is what lets a 100 TB pipeline treat rank as a stable
  * content key (retry-safe, resumable) and what lets the DuckDB oracle
  * match hash-for-hash. Truncation leaks ≤1 unit of mass per node per
  * step — bounded and identical everywhere, by construction.
  */
object Graph {

  /** Default edge-pin budget for the peeling family ([[kCore]] /
    * [[kCoreWeighted]] / [[kTruss]]): 50M canonical edges ≈ 1–2 GB of
    * deserialized pinned blocks — comfortable on the 8g local harness,
    * proportional on a real cluster's executor storage.
    */
  val PeelMaxPinnedEdges: Long = 50000000L

  /** Checkpoint strategy for edge-peeling rounds. Every checkpoint of
    * the peel — the round-0 canonical list included — pins the full
    * SURVIVING edge list; work shrinks monotonically, so the initial
    * count bounds every round's pin. On the gated fixtures that's
    * thousands of rows; on a corpus-sized graph (web-scale link graph)
    * the pinned deserialized blocks are exactly the executor-storage
    * failure mode SCALE.md documents for q_spearman's 100× OOM.
    *
    * Guard input: the RAW edge-ROW count (one scan-count, no shuffle,
    * nothing materialized) — an upper bound on the canonical list, so
    * the pin-vs-spill decision lands BEFORE any corpus-sized frame is
    * pinned (a heavily-duplicated multigraph may spill when its
    * canonical form would have fit; conservative by design). At or
    * under `maxPinnedEdges`: memory-pinned localCheckpoint (fastest,
    * lineage-flat, the single-pass entry cost). Above it: RELIABLE
    * checkpoints — every round INCLUDING round 0 spills to the
    * configured checkpoint dir instead of executor memory — and with no
    * checkpoint dir set, fail loudly before round 0 rather than OOM
    * mid-peel.
    */
  private def peelCheckpointer(op: String, rawEdges: DataFrame,
      maxPinnedEdges: Long): DataFrame => DataFrame = {
    val n = rawEdges.count()
    if (n <= maxPinnedEdges) { df => df.localCheckpoint(true) }
    else {
      val sc = rawEdges.sparkSession.sparkContext
      require(sc.getCheckpointDir.isDefined,
        s"$op: $n edge rows exceed maxPinnedEdges=$maxPinnedEdges; " +
          "per-round localCheckpoint would pin the surviving edge list " +
          "in executor storage (the SCALE.md corpus-pinning OOM class). " +
          "Raise maxPinnedEdges deliberately, or set " +
          "spark.sparkContext.setCheckpointDir(...) so rounds spill to " +
          "reliable checkpoints instead of memory.")
      df => df.checkpoint(true)
    }
  }

  /** PageRank by `iters` rounds of power iteration over `edges` (one row
    * per edge; parallel edges weight naturally). Returns (node, pr) with
    * `pr` the integer rank mass out of ~`scale`.
    *
    * Per round: one equi-join of edges to ranks on src (contributions,
    * share = rank div outdeg), one aggregation keyed on dst, one left
    * join back to the node list, plus two scalar aggregates (total and
    * dangling mass) broadcast into the update — dangling mass is
    * redistributed uniformly, damping is the integer ratio
    * dampingNum/dampingDen. Each round's ranks are eagerly
    * localCheckpoint'ed: the frame is read three times by the next round,
    * and lineage would otherwise nest the whole iteration history
    * (same discipline as [[ConnectedComponents.components]]).
    *
    * Scale notes: node ids stay in their source type (no cast), the
    * heavy shuffle is the per-round groupBy(dst) over O(|E|) rows, and
    * `scale` should dwarf the node count — at 10^12 the per-node initial
    * mass is still ~1000 units for a billion-node graph. For skewed
    * in-degree (a few mega-hub pages) pre-salt the dst aggregation or
    * let AQE's skew handling split it.
    */
  def pageRank(edges0: DataFrame, srcCol: String, dstCol: String,
      iters: Int = 3, dampingNum: Long = 85L, dampingDen: Long = 100L,
      scale: Long = 1000000000000L): DataFrame = {
    // standard PageRank IS the seeds-equal-all-nodes special case of the
    // personalized update rule (uniform initial mass, teleport and
    // dangling mass split over n = ns): one shared iteration core, so the
    // round shape and checkpoint discipline cannot drift between the two
    val edges = edges0
      .select(col(srcCol).as("src"), col(dstCol).as("dst"))
    val nodes = edges.select(col("src").as("node"))
      .union(edges.select(col("dst").as("node"))).distinct()
    personalizedPageRank(edges, "src", "dst", nodes, "node",
      iters, dampingNum, dampingDen, scale)
  }

  /** Personalized PageRank (topic-sensitive, Haveliwala 2002): identical
    * integer fixed-point iteration to [[pageRank]], except teleport mass
    * — and dangling mass — returns to the SEED set (uniform among seeds)
    * instead of all nodes, so rank measures proximity to the seeds: the
    * "more like these" relevance signal for seed-anchored curation.
    * Initial mass also starts entirely on the seeds. Seeds absent from
    * the graph still receive teleport mass (they are part of the node
    * set via the outer join) — matching the replayed SQL exactly.
    *
    * Same per-round shape and localCheckpoint discipline as pageRank;
    * the one extra ingredient is the seed count, a driver-side scalar
    * over the (small) seed frame, baked into the update as a literal.
    */
  def personalizedPageRank(edges0: DataFrame, srcCol: String, dstCol: String,
      seeds: DataFrame, seedCol: String, iters: Int = 3,
      dampingNum: Long = 85L, dampingDen: Long = 100L,
      scale: Long = 1000000000000L): DataFrame = {
    require(iters >= 1, "personalizedPageRank: iters must be >= 1")
    require(dampingDen > 0 && dampingNum >= 0 && dampingNum <= dampingDen,
      "personalizedPageRank: damping must satisfy 0 <= num <= den")
    // materialize the edge list once — it is read every round and the
    // caller's subplan (often a window over the raw events) is expensive
    val edges = edges0
      .select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .localCheckpoint(true)
    // seed count observed on the seed checkpoint job (Ckpt.withMetrics,
    // optimization round 16 — one job, not two); same for nNodes below
    val (seedNodes, sm) = Ckpt.withMetrics(
      seeds.select(col(seedCol).as("node")).distinct(),
      Seq(count(lit(1)).as("n")))
    val ns = sm("n").asInstanceOf[Long]
    require(ns > 0, "personalizedPageRank: seed set is empty")
    val nodes = edges.select(col("src").as("node"))
      .union(edges.select(col("dst").as("node")))
      .union(seedNodes.select(col("node")))
      .distinct()
    val outDeg = edges.groupBy(col("src").as("onode"))
      .agg(count(lit(1)).as("outdeg"))
    val base = nodes.join(outDeg, col("node") === col("onode"), "left")
      .join(seedNodes.select(col("node"), lit(true).as("is_seed")),
        Seq("node"), "left")
      .select(col("node"), coalesce(col("outdeg"), lit(0L)).as("outdeg"),
        coalesce(col("is_seed"), lit(false)).as("is_seed"))
    // node count observed on the ranks checkpoint; on a SMALL node
    // set (e.g. a vocabulary co-occurrence graph whose edge multiplicity
    // is corpus-sized but whose vertex set is the vocabulary) the
    // per-round shares frame must BROADCAST into the edge join — the
    // checkpointed frame carries no size statistics, so without the hint
    // the planner shuffle-partitions the whole O(|E|) edge list per round
    // (measured: q_textrank 1.4 GB shuffle-write at 100× vs ~0 hinted)
    val (ranks0, rm) = Ckpt.withMetrics(base
      .selectExpr("node", "outdeg", "is_seed",
        s"CASE WHEN is_seed THEN ${scale}L div ${ns}L ELSE 0L END AS pr"),
      Seq(count(lit(1)).as("n")))
    var ranks = ranks0
    val nNodes = rm("n").asInstanceOf[Long]
    for (_ <- 1 to iters) {
      val scalars = ranks.agg(
        sum(col("pr")).as("total"),
        sum(when(col("outdeg") === 0L, col("pr")).otherwise(0L)).as("dangling"))
      val shares = PlanHints.maybeBroadcastSmall(
        ranks.filter(col("outdeg") > 0L)
          .selectExpr("node AS snode", "pr div outdeg AS share"), nNodes)
      val contrib = edges.join(shares, col("src") === col("snode"))
        .groupBy(col("dst").as("cnode"))
        .agg(sum(col("share")).as("contrib"))
      ranks = ranks.join(contrib, col("node") === col("cnode"), "left")
        .crossJoin(broadcast(scalars))
        .selectExpr("node", "outdeg", "is_seed",
          s"(CASE WHEN is_seed THEN (${dampingDen - dampingNum}L * " +
            s"(total div ${ns}L)) div ${dampingDen}L ELSE 0L END) + " +
            s"((${dampingNum}L * (coalesce(contrib, 0L) + " +
            s"CASE WHEN is_seed THEN dangling div ${ns}L ELSE 0L END)) " +
            s"div ${dampingDen}L) AS pr")
        .localCheckpoint(true)
    }
    ranks.select("node", "pr")
  }

  /** Edge-weighted PageRank: identical integer fixed-point scheme to
    * [[pageRank]] (uniform teleport and dangling redistribution over all
    * nodes), except each out-neighbor receives mass proportional to its
    * integer edge weight — share(u→v) = (pr(u) * w(u,v)) div wout(u),
    * wout(u) = Σ w(u,·). The natural weight for a click graph is edge
    * multiplicity (how often the transition was taken), which [[pageRank]]
    * only approximates: m parallel edges there contribute
    * m·(pr div outdeg), a DIFFERENT truncation from (pr·m) div wout, so
    * the two operators are not interchangeable and stay separate rather
    * than forcing one through the other's rounding.
    *
    * Weights must be positive integers; rows with the same (src, dst) are
    * pre-summed so each directed pair contributes exactly one truncated
    * share term — that grouping is what makes the round SQL-replayable
    * without ordering sensitivity. Overflow is guarded loud: the per-edge
    * product pr·w is bounded by scale·maxW, so maxW must stay under
    * Long.MaxValue/scale (~9.2e6 at the default 10^12 scale) — plenty for
    * multiplicity weights, and a real failure otherwise.
    *
    * Per-round shape matches [[pageRank]]: one equi-join of the grouped
    * edge list to ranks on src, one groupBy(dst) shuffle over O(|E|)
    * rows, two broadcast scalars, localCheckpoint per round.
    */
  def weightedPageRank(edges0: DataFrame, srcCol: String, dstCol: String,
      weightCol: String, iters: Int = 3, dampingNum: Long = 85L,
      dampingDen: Long = 100L, scale: Long = 1000000000000L): DataFrame = {
    require(iters >= 1, "weightedPageRank: iters must be >= 1")
    require(dampingDen > 0 && dampingNum >= 0 && dampingNum <= dampingDen,
      "weightedPageRank: damping must satisfy 0 <= num <= den")
    val cast = edges0
      .select(col(srcCol).as("src"), col(dstCol).as("dst"),
        col(weightCol).cast("long").as("w"))
    // null-aware fail-loud BEFORE grouping: sum() skips nulls, so a
    // null-weight row (e.g. a non-castable weight column) would silently
    // vanish from the walk instead of raising — breaking the documented
    // contract. Checked on the raw rows, where the null is still visible.
    val nulls = cast.agg(
      sum(when(col("w").isNull, 1L).otherwise(0L)).as("nulls")).head()
    if (!nulls.isNullAt(0) && nulls.getLong(0) > 0)
      throw new IllegalArgumentException(
        s"weightedPageRank: ${nulls.getLong(0)} edges have NULL weight " +
          "(non-castable or missing) — weights must be positive integers")
    val edges = cast
      .groupBy("src", "dst").agg(sum(col("w")).as("w"))
      .localCheckpoint(true)
    // bounds on the GROUPED weight — that is what multiplies pr
    val bad = edges.agg(min(col("w")).as("mn"), max(col("w")).as("mx")).head()
    if (!bad.isNullAt(0)) {
      require(bad.getLong(0) > 0,
        s"weightedPageRank: weights must be positive (min ${bad.getLong(0)})")
      require(bad.getLong(1) <= Long.MaxValue / scale,
        s"weightedPageRank: max grouped weight ${bad.getLong(1)} would " +
          s"overflow pr*w at scale $scale — rescale weights or lower scale")
    }
    val nodes = edges.select(col("src").as("node"))
      .union(edges.select(col("dst").as("node"))).distinct()
    val outW = edges.groupBy(col("src").as("onode"))
      .agg(sum(col("w")).as("wout"))
    val (base, bm) = Ckpt.withMetrics(
      nodes.join(outW, col("node") === col("onode"), "left")
        .select(col("node"), coalesce(col("wout"), lit(0L)).as("wout")),
      Seq(count(lit(1)).as("n")))
    val n = bm("n").asInstanceOf[Long]
    var ranks = base
      .selectExpr("node", "wout", s"${scale}L div ${n}L AS pr")
      .localCheckpoint(true)
    for (_ <- 1 to iters) {
      val scalars = ranks.agg(
        sum(col("pr")).as("total"),
        sum(when(col("wout") === 0L, col("pr")).otherwise(0L)).as("dangling"))
      // small-node-set broadcast policy — see [[PlanHints]]
      val shares = PlanHints.maybeBroadcastSmall(
        ranks.filter(col("wout") > 0L)
          .selectExpr("node AS snode", "pr", "wout"), n)
      val contrib = edges.join(shares, col("src") === col("snode"))
        .selectExpr("dst", "(pr * w) div wout AS share")
        .groupBy(col("dst").as("cnode"))
        .agg(sum(col("share")).as("contrib"))
      ranks = ranks.join(contrib, col("node") === col("cnode"), "left")
        .crossJoin(broadcast(scalars))
        .selectExpr("node", "wout",
          s"((${dampingDen - dampingNum}L * (total div ${n}L)) div ${dampingDen}L) + " +
            s"((${dampingNum}L * (coalesce(contrib, 0L) + " +
            s"(dangling div ${n}L))) div ${dampingDen}L) AS pr")
        .localCheckpoint(true)
    }
    ranks.select("node", "pr")
  }

  /** Semi-supervised label propagation (Zhu & Ghahramani 2002, the
    * clamped-seed variant): seed nodes carry fixed labels; every round,
    * each unlabeled-or-inferred node adopts the MAJORITY label among its
    * labeled neighbors (edges traversed both directions; parallel edges
    * count as weight), ties breaking toward the smaller label; seeds
    * never change; a node no labeled neighbor has reached keeps its
    * current (possibly null) label. All-integer and synchronous, so the
    * fixed round count is exactly SQL-replayable — the oracle unrolls the
    * same rounds as chained CTEs and the gate hash-compares.
    *
    * Scale shape mirrors [[pageRank]]: the per-round cost is one
    * groupBy(dst, label) over O(|E|) rows plus two node-sized aggregates
    * for the argmax; labels frames are localCheckpoint'd per round so the
    * plan never nests. Hub-node skew: the vote aggregation keys on
    * (node, label), which already splits a hub's inbox by label; for
    * single-label mega-hubs AQE's skew split applies.
    */
  def labelPropagate(edges0: DataFrame, srcCol: String, dstCol: String,
      seeds: DataFrame, seedNodeCol: String, seedLabelCol: String,
      iters: Int = 3): DataFrame =
    weightedLabelPropagate(
      edges0.select(col(srcCol).as("src"), col(dstCol).as("dst"),
        lit(1L).as("__w")),
      "src", "dst", "__w", seeds, seedNodeCol, seedLabelCol, iters)

  /** [[labelPropagate]] with integer edge weights: each labeled neighbor's
    * vote counts `w` instead of 1 (a transition taken 50 times should
    * outvote one taken once — the natural strength signal on a click or
    * link graph). Same clamped synchronous rounds, same two-step
    * deterministic argmax (max summed weight, ties to the smaller
    * label), same per-round shape: one groupBy(node, label) over
    * O(|E|) rows + two node-keyed aggregates, localCheckpoint per round.
    * The unweighted form IS the w=1 special case and delegates here, so
    * the round semantics cannot drift between the two.
    *
    * Weights must be positive non-null (checked loud, the
    * [[weightedPageRank]] contract); parallel edges pre-sum per
    * direction, and each undirected edge votes both ways with its
    * summed weight.
    */
  def weightedLabelPropagate(edges0: DataFrame, srcCol: String,
      dstCol: String, weightCol: String, seeds: DataFrame,
      seedNodeCol: String, seedLabelCol: String,
      iters: Int = 3): DataFrame = {
    require(iters >= 1, "weightedLabelPropagate: iters must be >= 1")
    val cast = edges0
      .select(col(srcCol).as("src"), col(dstCol).as("dst"),
        col(weightCol).cast("long").as("w"))
    val bad = cast.filter(col("w").isNull || col("w") <= 0L)
      .limit(1).collect()
    require(bad.isEmpty,
      "weightedLabelPropagate: weights must be positive non-null (found " +
        s"w=${if (bad.nonEmpty && !bad(0).isNullAt(2)) bad(0).getLong(2) else "NULL"})")
    val edges = cast
      .groupBy("src", "dst").agg(sum(col("w")).as("w"))
      .localCheckpoint(true)
    val sym = edges.union(
      edges.select(col("dst").as("src"), col("src").as("dst"), col("w")))
    val nodes = edges.select(col("src").as("node"))
      .union(edges.select(col("dst").as("node"))).distinct()
    var labels = nodes.join(
        seeds.select(col(seedNodeCol).as("node"), col(seedLabelCol).as("lbl")),
        Seq("node"), "left")
      .select(col("node"), col("lbl"), col("lbl").isNotNull.as("is_seed"))
      .localCheckpoint(true)
    for (_ <- 1 to iters) {
      val votes = sym.join(
          labels.filter(col("lbl").isNotNull)
            .select(col("node").as("vn"), col("lbl").as("vl")),
          col("src") === col("vn"))
        .groupBy(col("dst").as("cand"), col("vl"))
        .agg(sum(col("w")).as("c"))
      val mx = votes.groupBy("cand").agg(max(col("c")).as("mc"))
      val pick = votes.join(mx, Seq("cand")).filter(col("c") === col("mc"))
        .groupBy("cand").agg(min(col("vl")).as("nl"))
      labels = labels.join(pick, col("node") === col("cand"), "left")
        .select(col("node"),
          when(col("is_seed"), col("lbl"))
            .otherwise(coalesce(col("nl"), col("lbl"))).as("lbl"),
          col("is_seed"))
        .localCheckpoint(true)
    }
    labels.select(col("node"), col("lbl").as("label"))
  }

  /** HITS hubs/authorities (Kleinberg 1999, "Authoritative sources in a
    * hyperlinked environment") as an exact integer fixed point: per
    * round, authority(v) = Σ over in-edges of hub(u)·w(u,v), then
    * hub(u) = Σ over out-edges of authority'(v)·w(u,v), each side
    * L1-renormalized to total mass `scale` by the truncating division
    * a' = (a·scale) div Σa — the [[pageRank]] determinism contract, so
    * both engines replay identical arithmetic and the gate hash-compares
    * exactly. Parallel edges pre-sum to multiplicity weights (the click
    * graph's natural strength signal). Returns (node, hub, auth).
    *
    * Per round: two O(|E|) equi-join + groupBy shuffles (one keyed on
    * dst for the authority pass, one on src for the hub pass), two
    * 1-row scalar sums broadcast into the normalizations,
    * localCheckpoint per round (each side is read by the next pass and
    * by the scalar). Overflow bounds: post-normalization values sum to
    * `scale`, so a raw sum is < scale·maxW ≤ scale·|E|; the
    * normalization multiply raw·scale runs in DECIMAL(38,0) (a long
    * product would wrap once Σraw·scale exceeds 2^63 — at the 1e9
    * default that is any graph past ~9 edges of full mass concentration,
    * i.e. always).
    */
  def hits(edges0: DataFrame, srcCol: String, dstCol: String,
      iters: Int = 3, scale: Long = 1000000000L): DataFrame = {
    require(iters >= 1, "hits: iters must be >= 1")
    // overflow-guard scalars observed on the weighted-edge checkpoint job
    // (Ckpt.withMetrics, optimization round 16 — one job, not two)
    val (we, wm) = Ckpt.withMetrics(
      edges0
        .select(col(srcCol).as("src"), col(dstCol).as("dst"))
        .groupBy("src", "dst").agg(count(lit(1)).as("w")),
      Seq(max(col("w")).as("mx"), sum(col("w")).as("tw")))
    // loud overflow bounds, the weightedPageRank contract: post-
    // normalization scores are <= scale, so a per-edge product score*w
    // needs maxW <= MaxValue/scale; round 1 runs UNNORMALIZED on the 1e6
    // start mass, where the worst per-node sum is startMass * totalW
    if (wm("mx") != null) {
      require(wm("mx").asInstanceOf[Long] <= Long.MaxValue / scale,
        s"hits: max edge multiplicity ${wm("mx")} would overflow " +
          s"score*w at scale $scale — lower scale or pre-scale weights")
      require(wm("tw").asInstanceOf[Long] <= Long.MaxValue / 1000000L,
        s"hits: total edge multiplicity ${wm("tw")} would overflow " +
          "the unnormalized first-round sums at the 1e6 start mass")
    }
    // node count observed on the node-list checkpoint (Ckpt.withMetrics,
    // optimization round 16 — one job, not two)
    val (nodes, nm) = Ckpt.withMetrics(
      we.select(col("src").as("node"))
        .union(we.select(col("dst").as("node"))).distinct(),
      Seq(count(lit(1)).as("n")))
    // mass-`scale` is what each normalization restores, so any uniform
    // positive start converges to the same fixed point; 1e6 per node
    // keeps round 1's raw sums small
    var hub = nodes.select(col("node"), lit(1000000L).as("h"))
      .localCheckpoint(true)
    var auth: DataFrame = null
    // small-node-set broadcast policy — see [[PlanHints]]: a vocabulary-
    // sized vertex set must not shuffle the O(|E|) edge list per pass
    val nNodes = nm("n").asInstanceOf[Long]
    def maybeB(df: DataFrame): DataFrame =
      PlanHints.maybeBroadcastSmall(df, nNodes)
    def normalized(raw: DataFrame, vCol: String): DataFrame = {
      val tot = raw.agg(sum(col("raw")).as("tot"))
      raw.crossJoin(broadcast(tot)) // 1 scalar row
        .selectExpr("node",
          s"CAST((CAST(raw AS DECIMAL(38,0)) * ${scale}L) div tot AS LONG) AS $vCol")
        .localCheckpoint(true)
    }
    for (_ <- 1 to iters) {
      val araw = nodes.join(
          we.join(maybeB(hub.select(col("node").as("hn"), col("h"))),
              col("src") === col("hn"))
            .groupBy(col("dst").as("node"))
            .agg(sum(col("h") * col("w")).as("r")),
          Seq("node"), "left")
        .select(col("node"), coalesce(col("r"), lit(0L)).as("raw"))
      auth = normalized(araw, "a")
      val hraw = nodes.join(
          we.join(maybeB(auth.select(col("node").as("an"), col("a"))),
              col("dst") === col("an"))
            .groupBy(col("src").as("node"))
            .agg(sum(col("a") * col("w")).as("r")),
          Seq("node"), "left")
        .select(col("node"), coalesce(col("r"), lit(0L)).as("raw"))
      hub = normalized(hraw, "h")
    }
    hub.join(auth, Seq("node"))
      .select(col("node"), col("h").as("hub"), col("a").as("auth"))
  }

  /** Exact Newman modularity audit of a community assignment over the
    * canonical undirected simple graph: per community c,
    * Q_c = m_c/m − (D_c/2m)², carried as the exact integer numerator
    * q_num = 4·m·m_c − D_c² out of denominator 4m² (Σ q_num / 4m² is the
    * scalar modularity) — the quality gate one runs AFTER label
    * propagation or CC to decide whether the clustering is worth acting
    * on. Nodes with a NULL label are unassigned: they join no community
    * and their edges are never intra (matching how a partial label-prop
    * run leaves unreached nodes).
    *
    * Returns one row per community:
    * (community, n_nodes, m_intra, deg_total, q_num).
    *
    * Shape: canonicalization (one distinct), degree = one groupBy over
    * 2|E| endpoint rows, two label equi-joins onto the edge list, all
    * keyed shuffles linear in |E|; output is communities-sized. Overflow:
    * 4·m·m_c and D_c² stay under 2^63 while m < ~1.5e9; past that carry
    * the numerators in DECIMAL — fail-loud territory, not silent.
    */
  def modularity(edges0: DataFrame, srcCol: String, dstCol: String,
      labels: DataFrame, nodeCol: String, labelCol: String): DataFrame = {
    // |E| observed on the canonical-edge checkpoint job (one job, not two)
    val (und, um) = Ckpt.withMetrics(
      canonicalUndirectedLazy(edges0, srcCol, dstCol),
      Seq(count(lit(1)).as("n")))
    val lab = labels.select(col(nodeCol).as("ln"), col(labelCol).as("lbl"))
      .filter(col("lbl").isNotNull)
      .localCheckpoint(true) // read three times below
    val m = um("n").asInstanceOf[Long]
    val deg = und.select(col("a").as("ln"))
      .union(und.select(col("b").as("ln")))
      .groupBy("ln").agg(count(lit(1)).as("deg"))
    val intra = und
      .join(lab.select(col("ln").as("a"), col("lbl").as("la")), Seq("a"))
      .join(lab.select(col("ln").as("b"), col("lbl").as("lb")), Seq("b"))
      .filter(col("la") === col("lb"))
      .groupBy(col("la").as("community"))
      .agg(count(lit(1)).as("m_intra"))
    lab.join(deg, Seq("ln"), "left")
      .groupBy(col("lbl").as("community"))
      .agg(count(lit(1)).as("n_nodes"),
        sum(coalesce(col("deg"), lit(0L))).as("deg_total"))
      .join(intra, Seq("community"), "left")
      .select(col("community"), col("n_nodes"),
        coalesce(col("m_intra"), lit(0L)).as("m_intra"),
        col("deg_total"),
        (lit(4L) * lit(m) * coalesce(col("m_intra"), lit(0L)) -
          col("deg_total") * col("deg_total")).as("q_num"))
  }

  /** Per-node triangle counts by degree orientation (the standard
    * bounded-fanout trick: Schank & Wagner 2005 forward/compact-forward;
    * also the MPC formulation of Suri & Vassilvitskii 2011). Edges are
    * first collapsed to canonical undirected simple form (self-loops
    * dropped, duplicates and reversals merged), then each edge is
    * oriented from its lower-(degree, id) endpoint to the higher; every
    * triangle {p,q,r} with rank p<q<r is then found exactly once, as the
    * wedge (p→q, p→r) closed by the oriented edge q→r.
    *
    * Why this survives 100×: a naive neighbor-pair join explodes on hub
    * nodes (a degree-10^6 page contributes 10^12 wedges). Orientation
    * caps every node's OUT-degree at O(√|E|) regardless of its true
    * degree — hubs sit on the receiving end of their edges — so the wedge
    * join generates at most |E|^1.5 candidates in the worst case and far
    * fewer on real graphs. All three joins are plain equi-joins on node
    * ids (hash-partitionable, AQE-splittable); nothing is quadratic in a
    * single key's neighborhood.
    *
    * Returns (node, triangles) for nodes in >= 1 triangle. Integer
    * counts — SQL-replayable exactly.
    */
  /** Canonical undirected simple edge set (a < b): self-loops dropped,
    * duplicates and reversals collapsed; materialized — every caller
    * reads it repeatedly. Shared by [[triangles]] and [[kCore]] so the
    * canonicalization semantics cannot drift between them.
    */
  private def canonicalUndirected(edges0: DataFrame, srcCol: String,
      dstCol: String): DataFrame =
    canonicalUndirectedLazy(edges0, srcCol, dstCol).localCheckpoint(true)

  /** [[canonicalUndirected]] WITHOUT the eager pin — for the peeling
    * family, whose [[peelCheckpointer]] must decide pin-vs-spill BEFORE
    * any corpus-sized frame is materialized into executor storage (the
    * round-0 pin is the largest of the whole peel).
    */
  private def canonicalUndirectedLazy(edges0: DataFrame, srcCol: String,
      dstCol: String): DataFrame =
    edges0.select(col(srcCol).as("u"), col(dstCol).as("v"))
      .filter(col("u") =!= col("v"))
      .select(least(col("u"), col("v")).as("a"),
        greatest(col("u"), col("v")).as("b"))
      .distinct()

  /** Rank-oriented triangle enumeration over a canonical undirected
    * simple edge set (a < b): orient each edge from its lower-(deg, id)
    * endpoint to the higher (capping out-fanout at O(√|E|) — hubs sit on
    * the receiving end), enumerate wedges at the low-rank apex ordered by
    * the same rank, close with the oriented edge. Every triangle
    * {p,q,r} with rank p<q<r appears EXACTLY once as (x=p, y=q, z=r).
    * Shared by [[triangles]] and [[kTruss]] so the orientation and
    * tie-break semantics — which both operators' unrolled SQL oracles
    * mirror term for term — cannot drift between them.
    */
  private def orientedTriangles(und: DataFrame): DataFrame = {
    val deg = und.select(col("a").as("node"))
      .union(und.select(col("b").as("node")))
      .groupBy("node").agg(count(lit(1)).as("deg"))
    val withDeg = und
      .join(deg.select(col("node").as("a"), col("deg").as("da")), Seq("a"))
      .join(deg.select(col("node").as("b"), col("deg").as("db")), Seq("b"))
    // total order: rank(n) = (deg(n), n); ids are distinct so no ties
    val aFirst = col("da") < col("db") ||
      (col("da") === col("db") && col("a") < col("b"))
    val oriented = withDeg.select(
        when(aFirst, col("a")).otherwise(col("b")).as("src"),
        when(aFirst, col("b")).otherwise(col("a")).as("dst"),
        when(aFirst, col("db")).otherwise(col("da")).as("ddst"))
      .localCheckpoint(true) // read three times by the joins below
    val e1 = oriented.select(col("src").as("x"), col("dst").as("y"),
      col("ddst").as("dy"))
    val e2 = oriented.select(col("src").as("x2"), col("dst").as("z"),
      col("ddst").as("dz"))
    e1.join(e2, col("x") === col("x2") &&
        (col("dy") < col("dz") ||
          (col("dy") === col("dz") && col("y") < col("z"))))
      .join(oriented.select(col("src").as("cy"), col("dst").as("cz")),
        col("y") === col("cy") && col("z") === col("cz"))
      .select(col("x"), col("y"), col("z"))
  }

  def triangles(edges0: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val und = canonicalUndirected(edges0, srcCol, dstCol)
    orientedTriangles(und)
      .select(explode(array(col("x"), col("y"), col("z"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("triangles"))
  }

  /** Link prediction over the undirected simple graph: for every
    * non-adjacent pair (a, b) sharing at least `minCommon` neighbors,
    * the classic neighborhood scores — common-neighbor count,
    * Adamic–Adar (Σ 1/ln(deg(x)) over common neighbors x, carried as
    * round(1e6/ln deg) integer micro-units so the sum is order-free and
    * SQL-replayable), and both endpoint degrees (Jaccard derives exactly
    * as common/(deg_a + deg_b − common)). The candidate generation is
    * wedge enumeration at each shared neighbor — the "people you may
    * know" / related-page signal of link-graph curation.
    *
    * Scale: wedge fan-out is quadratic in the CENTER's degree, and —
    * unlike [[triangles]] — orientation can't help, because every wedge
    * is a candidate, not just the closed ones. The standard mitigation
    * is the same as Dedup's posting-list dfCap: centers with degree >
    * `maxDeg` are excluded from wedge generation (a hub adjacent to
    * everyone predicts nothing — its 1/ln(deg) weight is why Adamic–Adar
    * discounts hubs in the first place), bounding per-center work at
    * maxDeg² and total candidates at |V|·maxDeg². The cap is an explicit
    * recall tradeoff: pairs whose ONLY shared neighbors are mega-hubs
    * are not emitted. Everything else is equi-joins + one hash
    * aggregation keyed on the pair.
    */
  def linkPredict(edges0: DataFrame, srcCol: String, dstCol: String,
      maxDeg: Long = 1000L, minCommon: Long = 1L): DataFrame = {
    require(maxDeg >= 2, "linkPredict: maxDeg must be >= 2")
    val und = canonicalUndirected(edges0, srcCol, dstCol)
    val deg = und.select(col("a").as("node"))
      .union(und.select(col("b").as("node")))
      .groupBy("node").agg(count(lit(1)).as("deg"))
      .localCheckpoint(true)
    val sym = und.select(col("a").as("x"), col("b").as("y"))
      .union(und.select(col("b").as("x"), col("a").as("y")))
    // wedge centers: deg in [2, maxDeg] — deg-1 nodes have no wedges,
    // hubs are capped out (scaladoc); 1/ln(deg) is finite on this range
    val ctr = sym.join(deg.filter(col("deg") >= 2L && col("deg") <= maxDeg)
        .select(col("node").as("x"), col("deg")), Seq("x"))
      .withColumn("aa1", expr("CAST(round(1000000.0 / ln(deg)) AS BIGINT)"))
    val pairs = ctr.select(col("x"), col("y").as("pa"), col("aa1"))
      .join(ctr.select(col("x"), col("y").as("pb")),
        Seq("x"))
      .filter(col("pa") < col("pb"))
      .groupBy(col("pa").as("a"), col("pb").as("b"))
      .agg(count(lit(1)).as("common"), sum(col("aa1")).as("aa_micro"))
      .filter(col("common") >= minCommon)
    pairs
      .join(und, Seq("a", "b"), "left_anti") // only NOT-yet-linked pairs
      .join(deg.select(col("node").as("a"), col("deg").as("deg_a")), Seq("a"))
      .join(deg.select(col("node").as("b"), col("deg").as("deg_b")), Seq("b"))
      .select("a", "b", "common", "aa_micro", "deg_a", "deg_b")
  }

  /** k-core peeling, `iters` synchronous rounds: repeatedly drop every
    * node whose degree in the SURVIVING graph is < k (and its edges).
    * Returns (node, deg) for nodes still alive after `iters` rounds with
    * their residual degree — a superset of the true k-core that equals it
    * once a round removes nothing (long peel chains need more rounds;
    * the fixed count is what makes the rounds exactly SQL-replayable).
    * The k-core is the standard "densely embedded" filter for link-graph
    * curation: pages that survive have k neighbors that THEMSELVES
    * survive, which one-hop degree thresholds can't express.
    *
    * Per round: one degree aggregation over surviving edges + two
    * semi-joins back onto the edge list — all O(|E|) equi-joins keyed on
    * node ids, edge frame localCheckpoint'd so lineage stays flat. Work
    * SHRINKS monotonically round over round (edges only ever get
    * removed), the opposite of a fan-out.
    */
  def kCore(edges0: DataFrame, srcCol: String, dstCol: String, k: Int,
      iters: Int = 4,
      maxPinnedEdges: Long = PeelMaxPinnedEdges): DataFrame = {
    require(k >= 1 && iters >= 1, "kCore: need k >= 1, iters >= 1")
    val ckpt = peelCheckpointer("kCore",
      edges0.select(col(srcCol), col(dstCol)), maxPinnedEdges)
    val cnt = Seq(count(lit(1)).as("n"))
    val (live1, km0) = Ckpt.withMetrics(
      canonicalUndirectedLazy(edges0, srcCol, dstCol), cnt, ckpt)
    var live = live1
    // convergence early-stop via counts observed on the round's own
    // checkpoint job (the kTruss discipline, optimization round 16):
    // edge survival is monotone, so a round that drops no edge is the
    // fixed point and every further round recomputes identical degrees
    // and filters nothing — skipping them changes NO output
    var liveCount = km0("n").asInstanceOf[Long]
    var converged = false
    var round = 0
    while (round < iters && !converged) {
      round += 1
      val deg = live.select(col("a").as("node"))
        .union(live.select(col("b").as("node")))
        .groupBy("node").agg(count(lit(1)).as("deg"))
      val keep = deg.filter(col("deg") >= k).select("node")
      val (liveN, kmN) = Ckpt.withMetrics(live
        .join(keep.select(col("node").as("a")), Seq("a"), "left_semi")
        .join(keep.select(col("node").as("b")), Seq("b"), "left_semi"),
        cnt, ckpt)
      live = liveN
      converged = kmN("n").asInstanceOf[Long] == liveCount
      liveCount = kmN("n").asInstanceOf[Long]
    }
    live.select(col("a").as("node"))
      .union(live.select(col("b").as("node")))
      .groupBy("node").agg(count(lit(1)).as("deg"))
  }

  /** WEIGHTED k-core peeling: [[kCore]] with the survival test on summed
    * incident edge WEIGHT instead of edge count — a node stays while its
    * surviving neighbors connect to it with total strength ≥ k, the
    * engagement-weighted "densely embedded" filter (a page with two
    * heavily-trafficked links can outrank one with five trickles).
    * Weights must be positive non-null (the weightedPageRank contract);
    * parallel edges pre-sum per canonical undirected pair. Returns
    * (node, wdeg) for survivors after `iters` synchronous rounds — like
    * [[kCore]], a superset of the fixed point until a round drops
    * nothing. Same per-round shape: one weighted-degree aggregation +
    * two semi-joins, work shrinking monotonically.
    */
  def kCoreWeighted(edges0: DataFrame, srcCol: String, dstCol: String,
      weightCol: String, k: Long, iters: Int = 4,
      maxPinnedEdges: Long = PeelMaxPinnedEdges): DataFrame = {
    require(k >= 1 && iters >= 1, "kCoreWeighted: need k >= 1, iters >= 1")
    val cast = edges0.select(col(srcCol).as("u"), col(dstCol).as("v"),
      col(weightCol).cast("long").as("w"))
    val bad = cast.filter(col("w").isNull || col("w") <= 0L).limit(1).collect()
    require(bad.isEmpty,
      "kCoreWeighted: weights must be positive non-null (found " +
        s"w=${if (bad.nonEmpty && !bad(0).isNullAt(2)) bad(0).getLong(2) else "NULL"})")
    val presum = cast.filter(col("u") =!= col("v"))
      .select(least(col("u"), col("v")).as("a"),
        greatest(col("u"), col("v")).as("b"), col("w"))
      .groupBy("a", "b").agg(sum(col("w")).as("w"))
    val ckpt = peelCheckpointer("kCoreWeighted", cast, maxPinnedEdges)
    val cnt = Seq(count(lit(1)).as("n"))
    val (live1, km0) = Ckpt.withMetrics(presum, cnt, ckpt)
    var live = live1
    // same observed-count early-stop as [[kCore]] (edge survival is
    // monotone; a no-drop round is the fixed point)
    var liveCount = km0("n").asInstanceOf[Long]
    var converged = false
    var round = 0
    while (round < iters && !converged) {
      round += 1
      val deg = live.select(col("a").as("node"), col("w"))
        .union(live.select(col("b").as("node"), col("w")))
        .groupBy("node").agg(sum(col("w")).as("wdeg"))
      val keep = deg.filter(col("wdeg") >= k).select("node")
      val (liveN, kmN) = Ckpt.withMetrics(live
        .join(keep.select(col("node").as("a")), Seq("a"), "left_semi")
        .join(keep.select(col("node").as("b")), Seq("b"), "left_semi"),
        cnt, ckpt)
      live = liveN
      converged = kmN("n").asInstanceOf[Long] == liveCount
      liveCount = kmN("n").asInstanceOf[Long]
    }
    live.select(col("a").as("node"), col("w"))
      .union(live.select(col("b").as("node"), col("w")))
      .groupBy("node").agg(sum(col("w")).as("wdeg"))
  }

  /** k-truss decomposition (Cohen 2008): iterated removal of edges whose
    * triangle SUPPORT (number of triangles containing the edge) is below
    * k−2 — the edge-grained strengthening of [[kCore]]: a k-core keeps a
    * node for having neighbors, a k-truss keeps an edge only if its
    * endpoints share enough of them, which is why trusses isolate
    * actually-cohesive communities where cores still admit hub-glued
    * fluff. Fixed `iters` synchronous rounds (the SQL-replayable form,
    * like [[kCore]]); returns the surviving edges
    * (a, b, support) with each edge's support from its final round.
    *
    * Per round, triangle finding reuses [[triangles]]' degree
    * orientation — each node's out-fanout capped at O(√|E|), so the
    * wedge join never goes quadratic in a hub's neighborhood — followed
    * by a 3-way edge explode + one groupBy(a, b) to per-edge support and
    * a left join back. All keyed shuffles linear in |E| + triangle
    * count; work SHRINKS every round as edges drop. localCheckpoint per
    * round keeps lineage flat.
    */
  def kTruss(edges0: DataFrame, srcCol: String, dstCol: String, k: Int,
      iters: Int = 3,
      maxPinnedEdges: Long = PeelMaxPinnedEdges): DataFrame = {
    require(k >= 3, "kTruss: k must be >= 3")
    require(iters >= 1, "kTruss: iters must be >= 1")
    val ckpt = peelCheckpointer("kTruss",
      edges0.select(col(srcCol), col(dstCol)), maxPinnedEdges)
    val cnt = Seq(count(lit(1)).as("n"))
    val (live0, lm0) = Ckpt.withMetrics(
      canonicalUndirectedLazy(edges0, srcCol, dstCol), cnt, ckpt)
    var live: DataFrame = live0.withColumn("support", lit(0L))
    // convergence early-stop (the ConnectedComponents discipline): a
    // round that drops no edge is a fixed point — every further round
    // recomputes identical supports and filters nothing, so skipping
    // them changes NO output while saving the dead rounds' triangle
    // joins. The count rides each round's checkpoint job as an observed
    // metric (Ckpt.withMetrics, optimization round 16) — no probe job.
    var liveCount = lm0("n").asInstanceOf[Long]
    var round = 0
    var converged = false
    while (round < iters && !converged) {
      round += 1
      val edgesNow = live.select("a", "b")
      val tris = orientedTriangles(edgesNow)
      val sup = tris.select(explode(array(
          struct(least(col("x"), col("y")).as("a"),
            greatest(col("x"), col("y")).as("b")),
          struct(least(col("x"), col("z")).as("a"),
            greatest(col("x"), col("z")).as("b")),
          struct(least(col("y"), col("z")).as("a"),
            greatest(col("y"), col("z")).as("b")))).as("e"))
        .select(col("e.a").as("a"), col("e.b").as("b"))
        .groupBy("a", "b").agg(count(lit(1)).as("sup"))
      val (liveN, lmN) = Ckpt.withMetrics(
        edgesNow.join(sup, Seq("a", "b"), "left")
          .select(col("a"), col("b"),
            coalesce(col("sup"), lit(0L)).as("support"))
          .filter(col("support") >= (k - 2).toLong), cnt, ckpt)
      live = liveN
      val c = lmN("n").asInstanceOf[Long]
      // a no-drop round still refreshed every edge's `support` column to
      // its (identical) fixed-point value, so stopping here is exact
      converged = c == liveCount
      liveCount = c
    }
    live.select("a", "b", "support")
  }

  /** Single-source shortest paths with positive integer edge weights,
    * `iters` synchronous Bellman–Ford rounds over the symmetrized edge
    * set: each round relaxes EVERY edge (dist'(v) = min(dist(v),
    * min over in-edges (dist(u) + w))), so after k rounds the frame holds
    * the exact shortest distance among paths of ≤ k hops — the weighted
    * generalization of [[bfsLevels]] (unreached nodes absent). Integer
    * distances, fixed round count → exactly SQL-replayable as unrolled
    * min-union CTEs.
    *
    * Per round: one equi-join of the current distance frame to edges +
    * one min-aggregation keyed on dst — O(|E|) shuffle, hash-partitioned,
    * AQE-splittable, localCheckpoint'd so lineage stays flat. The
    * synchronous all-edges relax is deliberate (it is the replayable
    * form); a production path for large diameters would add a
    * changed-only frontier (delta stepping), trading SQL replayability
    * for touching only active edges — same tradeoff [[bfsLevels]]'s
    * frontier already demonstrates for the unweighted case.
    */
  def sssp(edges0: DataFrame, srcCol: String, dstCol: String,
      weightCol: String, source: Column, iters: Int = 4): DataFrame = {
    require(iters >= 1, "sssp: iters must be >= 1")
    val edges = edges0
      .select(col(srcCol).as("src"), col(dstCol).as("dst"),
        col(weightCol).cast("long").as("w"))
      .localCheckpoint(true)
    // null-aware: a non-castable weight becomes NULL, which `w <= 0`
    // would silently pass — and dist + NULL would then emit "reached"
    // nodes with no distance
    val neg = edges.filter(col("w").isNull || col("w") <= 0L)
      .limit(1).collect()
    require(neg.isEmpty, "sssp: weights must be positive non-null (found " +
      s"w=${if (neg.nonEmpty && !neg(0).isNullAt(2)) neg(0).getLong(2) else "NULL"})")
    val sym = edges
      .union(edges.select(col("dst").as("src"), col("src").as("dst"), col("w")))
      .groupBy("src", "dst").agg(min(col("w")).as("w")) // parallel edges: keep cheapest
      .localCheckpoint(true)
    var dist = edges0.sparkSession.range(1)
      .select(source.as("node"), lit(0L).as("dist"))
      .localCheckpoint(true)
    for (_ <- 1 to iters) {
      val relaxed = sym.join(dist.select(col("node").as("sn"), col("dist")),
          col("src") === col("sn"))
        .select(col("dst").as("node"), (col("dist") + col("w")).as("dist"))
      dist = dist.union(relaxed)
        .groupBy("node").agg(min(col("dist")).as("dist"))
        .localCheckpoint(true)
    }
    dist
  }

  /** Single-source BFS hop distances over the symmetrized edge set,
    * bounded at `iters` rounds (unreached nodes are absent). Frontier
    * style: round i expands only the nodes first reached at distance
    * i-1, an anti-join drops already-seen nodes, and the accumulated
    * (node, dist) frame is localCheckpoint'd per round so lineage never
    * nests. Per round: one equi-join of the frontier to edges + one
    * distinct + one anti-join — all O(frontier-adjacent edges), the
    * textbook distributed-BFS shape (each round touches each edge at
    * most once, total O(iters·|E|) worst case). Integer distances with a
    * fixed round count — exactly SQL-replayable as unrolled CTEs.
    *
    * `source` must be a literal; it is seeded at distance 0 WITHOUT a
    * graph-membership check (a full node-set distinct just to validate
    * one seed row would cost an extra edge-list shuffle) — a source
    * absent from the graph returns just its own (source, 0) row.
    */
  def bfsLevels(edges0: DataFrame, srcCol: String, dstCol: String,
      source: Column, iters: Int = 4): DataFrame = {
    require(iters >= 1, "bfsLevels: iters must be >= 1")
    val edges = edges0
      .select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .localCheckpoint(true)
    val sym = edges
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .localCheckpoint(true)
    var dist = edges0.sparkSession.range(1)
      .select(source.as("node"), lit(0L).as("dist"))
      .localCheckpoint(true)
    for (i <- 1 to iters) {
      val frontier = dist.filter(col("dist") === lit(i - 1L))
        .select(col("node").as("fn"))
      val reached = sym.join(frontier, col("src") === col("fn"))
        .select(col("dst").as("node")).distinct()
      val fresh = reached
        .join(dist.select(col("node").as("seen")),
          col("node") === col("seen"), "left_anti")
        .select(col("node"), lit(i.toLong).as("dist"))
      dist = dist.union(fresh).localCheckpoint(true)
    }
    dist
  }

  /** MULTI-source BFS: [[bfsLevels]] run from every row of `seeds` at
    * once, returning (seed, node, dist) — all sources share each round's
    * edge scan instead of |seeds| sequential traversals. Per round: one
    * equi-join of the (seed-keyed) frontier to the symmetrized edges +
    * one distinct + one anti-join on (seed, node), all keyed shuffles;
    * state is O(|seeds| · reached), which is exactly why the caller
    * samples seeds (the Eppstein–Wang estimator: K sampled sources
    * approximate centrality with error O(1/√K) independent of graph
    * size) rather than running all-pairs. Like [[bfsLevels]], seeds are
    * trusted at distance 0 without a membership check.
    */
  def multiBfsLevels(edges0: DataFrame, srcCol: String, dstCol: String,
      seeds: DataFrame, seedCol: String, iters: Int = 4): DataFrame = {
    require(iters >= 1, "multiBfsLevels: iters must be >= 1")
    val edges = edges0
      .select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .localCheckpoint(true)
    val sym = edges
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .localCheckpoint(true)
    var dist = seeds
      .select(col(seedCol).as("seed"), col(seedCol).as("node"),
        lit(0L).as("dist"))
      .localCheckpoint(true)
    for (i <- 1 to iters) {
      val frontier = dist.filter(col("dist") === lit(i - 1L))
        .select(col("seed"), col("node").as("fn"))
      val reached = sym.join(frontier, col("src") === col("fn"))
        .select(col("seed"), col("dst").as("node")).distinct()
      val fresh = reached
        .join(dist.select(col("seed").as("ss"), col("node").as("seen")),
          col("seed") === col("ss") && col("node") === col("seen"),
          "left_anti")
        .select(col("seed"), col("node"), lit(i.toLong).as("dist"))
      dist = dist.union(fresh).localCheckpoint(true)
    }
    dist
  }

  /** STRONGLY connected components via forward–backward min-label rounds
    * (the FW-BW / coloring family — Fleischer, Hendrickson & Pınar 2000;
    * Orzan 2004): per OUTER round on the residual graph, f(v) = min id
    * that REACHES v within `inner` hops (min-label propagation along edge
    * direction, self included) and b(v) = min id v REACHES within `inner`
    * hops (against it). f(v) = b(v) = m is a PATH CERTIFICATE m →* v →* m,
    * so v settles with scc = m — sound regardless of horizon. The min-
    * label propagation LOOPS TO FIXPOINT (labels are monotone non-
    * increasing over a finite lattice, so a fixpoint within ≤|V| steps is
    * guaranteed; each step is checked for stability and the loop stops
    * the first stable step). At fixpoint f and b are CONSTANT on an SCC
    * (members share reaching/reachable sets), so an SCC settles whole or
    * waits whole — NO fragmentation ever: a fixed horizon would peel the
    * residual minimum out of a longer cycle (f=b=m holds trivially for m
    * itself) and shatter the rest into singletons, silently. `inner` is
    * the per-round STEP CAP, a loud-refusal guard: hitting it while
    * labels still change throws instead of emitting wrong components
    * (size it ≥ the graph's directed reach diameter). Nodes unsettled
    * after `outer` rounds return NULL scc — a horizon verdict, not an
    * error. Each round opens with `trim` passes of the standard TRIM
    * step: a node with no residual in-edges or no out-edges cannot lie
    * on a cycle and settles immediately as its own SCC — without it
    * every DAG node waits on the peel.
    *
    * Shape: per inner step one O(|E|) edge⋈label shuffle + one node-keyed
    * min; per outer round 2·inner of those plus two residual semi-joins;
    * residual-sized label frames localCheckpoint per step (the pageRank
    * loop contract). Early-exits when the residual empties.
    * Returns (node, scc, settled_round 1-based).
    */
  def scc(edges0: DataFrame, srcCol: String, dstCol: String,
      outer: Int = 3, inner: Int = 64, trim: Int = 4): DataFrame = {
    require(outer >= 1 && inner >= 1 && trim >= 0,
      "scc: outer and inner must be >= 1, trim >= 0")
    val edgesAll = edges0
      .select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .filter(col("src") =!= col("dst"))
      .distinct()
      .localCheckpoint(true)
    // residual row count rides every residual checkpoint as an observed
    // metric (Ckpt.withMetrics, optimization round 16): the trim loop's
    // "did this round settle anything" test and the outer loop's
    // emptiness test become count comparisons with zero extra jobs
    // (kept ⊆ residual by construction, so |kept| = |residual| ⟺ the
    // anti-join is empty — same decision the old isEmpty probes made).
    val cnt = Seq(count(lit(1)).as("n"))
    var (residual, m0) = Ckpt.withMetrics(
      edgesAll.select(col("src").as("node"))
        .union(edgesAll.select(col("dst").as("node"))).distinct(), cnt)
    var residualCount = m0("n").asInstanceOf[Long]
    var edges = edgesAll
    var settled: DataFrame = null
    def minLabels(e: DataFrame): DataFrame = {
      var l = residual.select(col("node"), col("node").as("lbl"))
        .localCheckpoint(true)
      var step = 0
      var stable = false
      while (!stable) {
        step += 1
        // loud refusal beats silent fragmentation: a capped horizon would
        // settle the residual min as a singleton out of a longer cycle
        if (step > inner) throw new IllegalStateException(
          s"scc: min-label propagation did not reach fixpoint within " +
            s"inner=$inner steps — raise `inner` past the graph's " +
            "directed reach diameter (wrong components otherwise)")
        val in = e.join(l.select(col("node").as("src"), col("lbl")), "src")
          .groupBy(col("dst").as("node")).agg(min(col("lbl")).as("inlbl"))
        // stability probe OBSERVED on the checkpoint job (Ckpt.withMetrics,
        // optimization round 16): monotone labels mean "no row changed" IS
        // the fixpoint, and counting the changed rows during
        // materialization saves the old one-probe-job-per-step
        val (nxt, m) = Ckpt.withMetrics(
          l.withColumnRenamed("lbl", "old")
            .join(in, Seq("node"), "left")
            .select(col("node"), col("old"),
              least(col("old"), coalesce(col("inlbl"), col("old"))).as("lbl")),
          Seq(count(when(col("lbl") =!= col("old"), lit(1))).as("changed")))
        stable = m("changed").asInstanceOf[Long] == 0L
        l = nxt.select("node", "lbl")
      }
      l
    }
    def keep(settledNow: DataFrame): Unit = {
      settled = if (settled == null) settledNow.localCheckpoint(true)
        else settled.union(settledNow).localCheckpoint(true)
    }
    var r = 1
    var done = false
    while (r <= outer && !done) {
      // TRIM: a node with no residual in-edges or no residual out-edges
      // cannot lie on a cycle — it is its own SCC. Each pass exposes the
      // next layer of the DAG fringe; without this the f=b test leaves
      // every DAG node waiting on the peel (the FW-BW-Trim step).
      var t = 1
      var trimDone = false
      while (t <= trim && !trimDone) {
        val (kept, km) = Ckpt.withMetrics(residual
          .join(edges.select(col("src").as("node")).distinct(),
            Seq("node"), "left_semi")
          .join(edges.select(col("dst").as("node")).distinct(),
            Seq("node"), "left_semi"), cnt)
        val keptCount = km("n").asInstanceOf[Long]
        // kept ⊆ residual (semi-joins only drop), so equal counts ⟺ the
        // trimmed anti-join is empty — no probe job needed
        if (keptCount == residualCount) trimDone = true
        else {
          keep(residual.join(kept, Seq("node"), "left_anti")
            .select(col("node"), col("node").as("scc"),
              lit(r).as("settled_round")))
          residual = kept
          residualCount = keptCount
          edges = edges
            .join(kept.withColumnRenamed("node", "src"), Seq("src"), "left_semi")
            .join(kept.withColumnRenamed("node", "dst"), Seq("dst"), "left_semi")
            .localCheckpoint(true)
        }
        t += 1
      }
      val f = minLabels(edges).withColumnRenamed("lbl", "flbl")
      val b = minLabels(edges.select(col("dst").as("src"), col("src").as("dst")))
        .withColumnRenamed("lbl", "blbl")
      val lab = f.join(b, Seq("node")).localCheckpoint(true)
      keep(lab.filter(col("flbl") === col("blbl"))
        .select(col("node"), col("flbl").as("scc"),
          lit(r).as("settled_round")))
      val (res2, rm) = Ckpt.withMetrics(
        lab.filter(col("flbl") =!= col("blbl")).select("node"), cnt)
      residual = res2
      residualCount = rm("n").asInstanceOf[Long]
      if (residualCount == 0L) done = true
      else edges = edges
        .join(residual.withColumnRenamed("node", "src"), Seq("src"), "left_semi")
        .join(residual.withColumnRenamed("node", "dst"), Seq("dst"), "left_semi")
        .localCheckpoint(true)
      r += 1
    }
    settled.union(residual
      .select(col("node"), lit(null).cast("long").as("scc"),
        lit(null).cast("int").as("settled_round")))
  }

  /** Sampled STRESS centrality — the exact-integer member of the
    * betweenness family (Brandes 2008, "On variants of shortest-path
    * betweenness"): stress(v) = Σ_{s,t} σ_st(v), the NUMBER of shortest
    * paths through v, estimated from the `seeds` sample within an
    * `iters`-hop horizon. Betweenness proper needs the rational
    * σ_st(v)/σ_st; stress keeps every quantity a BIGINT, which is what
    * makes the sampled statistic bit-reproducible and SQL-replayable —
    * the same reason [[pageRank]] runs on integer mass units.
    *
    * Three phases, all O(rounds · |E|) keyed shuffles:
    *  1. forward multi-source BFS carrying path counts: σ_s(v) = Σ of
    *     σ over distance-(i−1) predecessors the round v is first
    *     reached (aggregate-then-anti-join, so ties sum before the
    *     freshness check);
    *  2. the shortest-path DAG: sym edges (u→w) with
    *     dist_w = dist_u + 1 in the same seed's tree;
    *  3. backward suffix-path counts ψ_s(v) = Σ_{w ∈ succ(v)} (ψ_s(w)+1)
    *     — the number of shortest paths from v to ANY later node in the
    *     horizon — peeled level by level from the deepest frontier
    *     (whose ψ is 0: nothing beyond the horizon is counted).
    * Then stress(v) = Σ_s σ_s(v)·ψ_s(v) over non-root appearances:
    * σ·ψ counts exactly the s-rooted shortest paths with v interior.
    * State is O(|seeds| · reached) like [[multiBfsLevels]] — the
    * sampling IS the scale plan.
    */
  def stressSampled(edges0: DataFrame, srcCol: String, dstCol: String,
      seeds: DataFrame, seedCol: String, iters: Int = 3): DataFrame = {
    require(iters >= 2, "stressSampled: iters must be >= 2")
    val (fw, dag) = brandesForward(edges0, srcCol, dstCol, seeds, seedCol, iters)
    var psi = fw.select(col("seed"), col("node"), col("dist"),
      lit(0L).as("psi")).localCheckpoint(true)
    for (i <- (iters - 1) to 1 by -1) {
      val contrib = dag
        .join(psi.select(col("seed").as("ps"), col("node").as("pw"),
          col("psi").as("wpsi")),
          col("seed") === col("ps") && col("w") === col("pw"))
        .groupBy(col("seed"), col("u"))
        .agg(sum(col("wpsi") + 1L).as("sm"))
      psi = psi
        .join(contrib.select(col("seed").as("cs"), col("u").as("cn"),
          col("sm")),
          col("seed") === col("cs") && col("node") === col("cn"),
          "left_outer")
        .select(col("seed"), col("node"), col("dist"),
          when(col("dist") === lit(i.toLong), coalesce(col("sm"), lit(0L)))
            .otherwise(col("psi")).as("psi"))
        .localCheckpoint(true)
    }
    fw.join(psi.select(col("seed").as("qs"), col("node").as("qn"),
        col("psi")),
        col("seed") === col("qs") && col("node") === col("qn"))
      .filter(col("node") =!= col("seed"))
      .groupBy("node")
      .agg(sum(col("sigma") * col("psi")).as("stress"))
  }

  /** Shared phases 1–2 of the Brandes family ([[stressSampled]],
    * [[betweennessSampled]]): the seed-keyed forward BFS carrying exact
    * path counts sigma, and the shortest-path DAG it induces. One
    * definition so the two statistics can never diverge on the tree.
    */
  private def brandesForward(edges0: DataFrame, srcCol: String,
      dstCol: String, seeds: DataFrame, seedCol: String,
      iters: Int): (DataFrame, DataFrame) = {
    val edges = edges0
      .select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .localCheckpoint(true)
    val sym = edges
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .localCheckpoint(true)
    var fw = seeds
      .select(col(seedCol).as("seed"), col(seedCol).as("node"),
        lit(0L).as("dist"), lit(1L).as("sigma"))
      .localCheckpoint(true)
    for (i <- 1 to iters) {
      val frontier = fw.filter(col("dist") === lit(i - 1L))
        .select(col("seed"), col("node").as("fn"), col("sigma"))
      val cand = sym.join(frontier, col("src") === col("fn"))
        .groupBy(col("seed"), col("dst").as("node"))
        .agg(sum(col("sigma")).as("sigma"))
      val fresh = cand
        .join(fw.select(col("seed").as("ss"), col("node").as("seen")),
          col("seed") === col("ss") && col("node") === col("seen"),
          "left_anti")
        .select(col("seed"), col("node"), lit(i.toLong).as("dist"),
          col("sigma"))
      fw = fw.union(fresh).localCheckpoint(true)
    }
    val dag = sym
      .join(fw.select(col("seed"), col("node").as("u"),
        col("dist").as("ud")), col("src") === col("u"))
      .join(fw.select(col("seed").as("ws"), col("node").as("w"),
        col("dist").as("wd")),
        col("seed") === col("ws") && col("dst") === col("w") &&
          col("wd") === col("ud") + 1L)
      .select(col("seed"), col("u"), col("w"))
      .localCheckpoint(true)
    (fw, dag)
  }

  /** Sampled BETWEENNESS proper (Brandes 2001 accumulation): the
    * rational-dependency sibling of [[stressSampled]] — delta_s(v) =
    * SUM over DAG successors w of (sigma_v / sigma_w) * (1 + delta_s(w)),
    * peeled from the horizon's deepest level, and betweenness(v) =
    * SUM over sampled seeds s of delta_s(v) for v interior (v != s).
    * Within the horizon each pair (s, t) contributes exactly
    * sigma_st(v)/sigma_st through the recursion — the fraction of s-t
    * shortest paths passing THROUGH v, the statistic stress's integer
    * path counts deliberately avoid.
    *
    * PURE-INTEGER arithmetic at ppm scale (the [[pageRank]] integer-mass
    * discipline): delta is carried as delta_ppm = delta * 1e6, and each
    * dependency term is the truncating integral division
    * (sigma_u * (1e6 + delta_ppm_w)) div sigma_w — the product widened
    * through DECIMAL(38,0) (HUGEINT in the oracle) so it cannot wrap.
    * No doubles anywhere: a dec6-rounded double form was measured to
    * split the engines on exact half-boundary rationals (sigma ratios
    * times dec6 deltas land on x.xxxxx5 exactly, where Spark's
    * BigDecimal.valueOf round and DuckDB's C round disagree on the
    * nearest-double side). Truncation bias < 1e-6 per term sits far
    * below the sampling + horizon error this estimator carries by
    * construction. Returns (node, bc_ppm BIGINT) — exact; callers derive
    * bc = bc_ppm / 1e6 at whatever precision they want.
    *
    * Shape: forward phases shared with stress; backward = one DAG-sized
    * join + keyed sum per level. State O(|seeds| x reached), the
    * [[multiBfsLevels]] contract.
    */
  def betweennessSampled(edges0: DataFrame, srcCol: String, dstCol: String,
      seeds: DataFrame, seedCol: String, iters: Int = 3): DataFrame =
    brandesDeltas(edges0, srcCol, dstCol, seeds, seedCol, iters)
      .filter(col("node") =!= col("seed"))
      .groupBy("node")
      .agg(sum(col("delta")).cast("long").as("bc_ppm"))

  /** The Brandes accumulation itself, per (seed, node): the delta_ppm
    * frame [[betweennessSampled]] sums over seeds and
    * [[betweennessJackknife]] sums per seed STRATUM. See
    * [[betweennessSampled]] for the integer-ppm arithmetic contract.
    */
  private def brandesDeltas(edges0: DataFrame, srcCol: String, dstCol: String,
      seeds: DataFrame, seedCol: String, iters: Int): DataFrame = {
    require(iters >= 2, "betweennessSampled: iters must be >= 2")
    val (fw, dag) = brandesForward(edges0, srcCol, dstCol, seeds, seedCol, iters)
    // sigma is static — attach it to the DAG once, not once per level
    val dagS = dag
      .join(fw.select(col("seed").as("s1"), col("node").as("n1"),
        col("sigma").as("sig_u")),
        col("seed") === col("s1") && col("u") === col("n1"))
      .join(fw.select(col("seed").as("s2"), col("node").as("n2"),
        col("sigma").as("sig_w")),
        col("seed") === col("s2") && col("w") === col("n2"))
      .select(col("seed"), col("u"), col("w"), col("sig_u"), col("sig_w"))
      .localCheckpoint(true)
    var delta = fw.select(col("seed"), col("node"), col("dist"),
      lit(0L).as("delta")).localCheckpoint(true)
    for (i <- (iters - 1) to 1 by -1) {
      val contrib = dagS
        .join(delta.select(col("seed").as("ds"), col("node").as("dw"),
          col("delta").as("wdelta")),
          col("seed") === col("ds") && col("w") === col("dw"))
        .groupBy(col("seed"), col("u"))
        .agg(sum(expr(
          "cast(cast(sig_u AS DECIMAL(38,0)) * (1000000L + wdelta) " +
            "div cast(sig_w AS DECIMAL(38,0)) AS BIGINT)")).as("sm"))
      delta = delta
        .join(contrib.select(col("seed").as("cs"), col("u").as("cn"),
          col("sm")),
          col("seed") === col("cs") && col("node") === col("cn"),
          "left_outer")
        .select(col("seed"), col("node"), col("dist"),
          when(col("dist") === lit(i.toLong),
            coalesce(col("sm"), lit(0L)))
            .otherwise(col("delta")).as("delta"))
        .localCheckpoint(true)
    }
    delta
  }

  /** SAMPLING ERROR of [[betweennessSampled]]: delete-one-STRATUM jackknife
    * over the seed sample, integer end to end. Seeds partition into
    * `nStrata` strata by `seed mod nStrata`; per node v the per-stratum
    * totals c_g(v) are additive in the seeds, so the estimator is the
    * group total T(v) = Σ_g c_g(v) (= bc_ppm, identical to
    * betweennessSampled) and the standard delete-group replicate is the
    * rescaled T̂_(−g) = G/(G−1) · (T − c_g), whose replicate mean is
    * exactly T. The SE then collapses to integers:
    * SE² = (G−1)/G · Σ_g (T̂_(−g) − T)² = Σ_g (T − G·c_g)² / (G·(G−1)) —
    * the squared numerators are exact BIGINTs (widened through
    * DECIMAL(38,0) like the dependency products; a stratum with no
    * contribution to v is a legitimate zero replicate, contributing T²).
    * Floating point appears ONLY in the final reported
    * se_ppm = floor(sqrt(se2_num / (G·(G−1)))) — deterministic IEEE ops on
    * identical inputs, no round() tie-break anywhere (the q_betweenness
    * half-boundary lesson).
    *
    * G counts the strata PRESENT in the seed set (an empty stratum is
    * not a sample group). Returns per interior node:
    * (node, bc_ppm, n_strata, se2_num, se_ppm); se_ppm NULL below G = 2.
    * Shape: the Brandes phases unchanged (the expensive part), then ONE
    * extra keyed aggregation at (node, stratum) granularity — G-bounded
    * fan-out, no new data-sized shuffle.
    */
  def betweennessJackknife(edges0: DataFrame, srcCol: String, dstCol: String,
      seeds: DataFrame, seedCol: String, nStrata: Int = 3,
      iters: Int = 3): DataFrame = {
    require(nStrata >= 2, "betweennessJackknife: need >= 2 strata")
    val g = seeds.select(pmod(col(seedCol), lit(nStrata.toLong)).as("g"))
      .distinct().count()
    val per = brandesDeltas(edges0, srcCol, dstCol, seeds, seedCol, iters)
      .filter(col("node") =!= col("seed"))
      .groupBy(col("node"), pmod(col("seed"), lit(nStrata.toLong)).as("g"))
      .agg(sum(col("delta")).cast("long").as("c"))
    val tot = per.groupBy("node").agg(
      sum(col("c")).cast("long").as("bc_ppm"),
      count(lit(1)).as("np"))
    val bcD = expr("cast(bc_ppm AS DECIMAL(38,0))")
    val term = expr(
      s"cast((cast(bc_ppm AS DECIMAL(38,0)) - ${g}L * cast(c AS DECIMAL(38,0))) * " +
        s"(cast(bc_ppm AS DECIMAL(38,0)) - ${g}L * cast(c AS DECIMAL(38,0))) " +
        "AS DECIMAL(38,0))")
    per.join(tot, "node")
      .groupBy(col("node"), col("bc_ppm"), col("np"))
      .agg(sum(term).as("sqp"))
      .select(col("node"), col("bc_ppm"), lit(g).as("n_strata"),
        (col("sqp") + (lit(g) - col("np")) * bcD * bcD)
          .cast("long").as("se2_num"), col("np"))
      .select(col("node"), col("bc_ppm"), col("n_strata"), col("se2_num"),
        when(lit(g) >= 2L,
          floor(sqrt(col("se2_num").cast("double") /
            lit((g * (g - 1)).toDouble))).cast("long")).as("se_ppm"))
  }

  /** Sampled closeness centrality (Eppstein–Wang): per node, the count
    * of sample sources that reach it within `iters` hops and the exact
    * summed hop distance — closeness estimates derive as
    * (n_sources − 1) / dist_sum (or any preferred normalization) from
    * the two exact integers, so the SAMPLED statistic itself is
    * bit-reproducible and SQL-replayable even though it approximates
    * the all-pairs quantity. One groupBy(node) over the
    * [[multiBfsLevels]] state.
    */
  def closenessSampled(edges0: DataFrame, srcCol: String, dstCol: String,
      seeds: DataFrame, seedCol: String, iters: Int = 4): DataFrame =
    multiBfsLevels(edges0, srcCol, dstCol, seeds, seedCol, iters)
      .groupBy("node")
      .agg(count(lit(1)).as("n_sources"),
        sum(col("dist")).as("dist_sum"))

  /** Sampled HARMONIC centrality (Boldi & Vigna 2014, "Axioms for
    * centrality" — the closeness variant that handles disconnection
    * gracefully): per node, Σ over reaching sample sources of 1/d,
    * scaled by lcm(1..`iters`) so every reciprocal is an INTEGER and the
    * sampled statistic stays bit-reproducible (the [[closenessSampled]]
    * contract; for the default iters = 4 the scale is 12 and 1/d ∈
    * {12, 6, 4, 3}). Unreached pairs contribute 0 — exactly the property
    * closeness lacks. Returns (node, n_reached, harmonic scaled).
    */
  def harmonicSampled(edges0: DataFrame, srcCol: String, dstCol: String,
      seeds: DataFrame, seedCol: String, iters: Int = 4): DataFrame = {
    val scale = (1 to iters).foldLeft(1L)((a, b) =>
      a * b / BigInt(a).gcd(BigInt(b)).toLong)
    multiBfsLevels(edges0, srcCol, dstCol, seeds, seedCol, iters)
      .filter(col("dist") >= 1L)
      .groupBy("node")
      .agg(count(lit(1)).as("n_reached"),
        sum(expr(s"${scale}L div dist")).as(s"harmonic$scale"))
  }
}
