package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Model-evaluation statistics under the oracle gate (graft.ops.Eval):
  * exact integer AUC and inter-model agreement. These reuse CartOps'
  * feature/label fixture and its trained models — the eval metrics are
  * graded against the same DuckDB replay that grades the trainers, so a
  * drift in either the model or the metric fails the gate.
  */
object EvalOps {

  type Fn = (SparkSession, String) => DataFrame

  /** (y, p_tree, p_forest) on the shared held-out split: the single CART
    * tree and the bagged forest's 2-of-3 vote, one feature scan. Shared
    * by q_model_agreement and q_mcnemar.
    */
  private def treeVsForest(s: SparkSession, d: String): DataFrame = {
    val feats = CartOps.featured(s, d).localCheckpoint(true)
    val trainHalf = feats.filter(pmod(col("doc_id"), lit(2)) === 0)
    // main tree + the three out-of-bag trees in ONE trainMany pass
    // (bit-identical to four Cart.train calls — CartSpec)
    val all = graft.ops.Cart.trainMany(trainHalf,
      lit(true) +: (0 until 3).map(b => CartOps.oobBag(b)),
      CartOps.features, "y", depth = 2, maxBins = 32)
    val (tree, trees) = (all.head, all.tail)
    val test = feats.filter(pmod(col("doc_id"), lit(2)) === 1)
    val withTree = graft.ops.Cart.classify(test, tree)
      .withColumnRenamed("pred", "p_tree")
    CartOps.forestVote(withTree, trees, "p_forest")
  }

  /** The matching oracle prelude: both trainings, both routings, and a
    * `pair` CTE of (y, pa = tree pred, pb = forest vote) per test doc.
    */
  private val treeVsForestCtes: String =
    CartOps.oraclePrelude +
      (0 until 3).map(b => CartOps.trainCtes(s"_$b",
        s"doc_id % 2 = 0 AND ${CartOps.bagSql(b, "<>")}")).mkString +
      ",\nte AS MATERIALIZED (SELECT * FROM lab WHERE doc_id % 2 = 1)" +
      CartOps.routeCtes("", "predt") +
      (0 until 3).map(b => CartOps.routeCtes(s"_$b", s"pred_$b")).mkString +
      """,
        |pair AS (
        |  SELECT t.y, t.p AS pa,
        |    CAST(CASE WHEN p0.p + p1.p + p2.p >= 2 THEN 1 ELSE 0 END
        |      AS BIGINT) AS pb
        |  FROM predt t JOIN pred_0 p0 USING (doc_id)
        |       JOIN pred_1 p1 USING (doc_id) JOIN pred_2 p2 USING (doc_id))""".stripMargin

  /** The jackknife oracle tail shared by q_auc_jackknife and
    * q_auc_jackknife_src — everything downstream of the `b` CTE (grp, s,
    * y rows) is grouping-agnostic; ONE copy so a convention fix (a cast,
    * the dec6 tail) can never reach only one of the two gates.
    */
  private val aucJackknifeOracleTail: String =
    """
        |gs AS MATERIALIZED (SELECT grp, s, CAST(count(*) AS BIGINT) AS n_gs,
        |      CAST(sum(y) AS BIGINT) AS pos_gs,
        |      CAST(count(*) - sum(y) AS BIGINT) AS neg_gs
        |      FROM b GROUP BY 1, 2),
        |bys AS (SELECT s, CAST(sum(pos_gs) AS BIGINT) AS pos,
        |        CAST(sum(neg_gs) AS BIGINT) AS neg FROM gs GROUP BY 1),
        |tot AS (SELECT CAST(sum(pos) AS BIGINT) AS n_pos,
        |        CAST(sum(neg) AS BIGINT) AS n_neg FROM bys),
        |pre AS MATERIALIZED (SELECT s, pos, neg,
        |  CAST(coalesce(sum(neg) OVER (ORDER BY s
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
        |    AS negbelow,
        |  CAST((SELECT n_pos FROM tot)
        |    - coalesce(sum(pos) OVER (ORDER BY s
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |    - pos AS BIGINT) AS posabove
        |  FROM bys),
        |u AS (SELECT CAST(sum(pos * (2 * negbelow + neg)) AS BIGINT) AS u2
        |      FROM pre),
        |g1 AS (SELECT g.grp, g.pos_gs, g.neg_gs,
        |  CAST(coalesce(sum(g.neg_gs) OVER (PARTITION BY g.grp ORDER BY g.s
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
        |    AS negbelow_gs,
        |  p.pos, p.neg, p.negbelow, p.posabove
        |  FROM gs g JOIN pre p USING (s)),
        |per AS (SELECT grp,
        |  CAST(sum(pos_gs) AS BIGINT) AS pos_g,
        |  CAST(sum(neg_gs) AS BIGINT) AS neg_g,
        |  CAST(sum(pos_gs * (2 * negbelow + neg)) AS BIGINT) AS a_g,
        |  CAST(sum(neg_gs * (2 * posabove + pos)) AS BIGINT) AS b_g,
        |  CAST(sum(pos_gs * (2 * negbelow_gs + neg_gs)) AS BIGINT) AS c_g
        |  FROM g1 GROUP BY 1),
        |aj AS MATERIALIZED (SELECT
        |  cast(round(cast(u2 - a_g - b_g + c_g AS DOUBLE)
        |    / cast(2 * (n_pos - pos_g) * (n_neg - neg_g) AS DOUBLE), 6)
        |    AS DECIMAL(18,6)) AS aucg
        |  FROM per CROSS JOIN tot CROSS JOIN u),
        |st AS (SELECT CAST(count(*) AS BIGINT) AS ng FROM aj),
        |md AS (SELECT round(cast(sum(aucg) AS DOUBLE)
        |         / cast((SELECT ng FROM st) AS DOUBLE), 6) AS adot FROM aj)
        |SELECT n_pos, n_neg,
        |  round(cast(u2 AS DOUBLE) / cast(2 * n_pos * n_neg AS DOUBLE), 6)
        |    AS auc,
        |  (SELECT ng FROM st) AS n_groups,
        |  round(sqrt(cast((SELECT ng FROM st) - 1 AS DOUBLE)
        |    / cast((SELECT ng FROM st) AS DOUBLE)
        |    * cast((SELECT sum(cast(round(
        |        (cast(aucg AS DOUBLE) - adot) * (cast(aucg AS DOUBLE) - adot),
        |        6) AS DECIMAL(18,6))) FROM aj CROSS JOIN md) AS DOUBLE)), 6)
        |    AS jack_se
        |FROM tot CROSS JOIN u""".stripMargin.stripPrefix("\n")

  val entries: Seq[(String, Fn, String)] = Seq(

    // -- exact ROC AUC of the f_chars feature as a scorer for the noisy
    //    label, by the Mann–Whitney rank-sum identity with midrank ties,
    //    doubled to stay integral: AUC = u2/den exactly. One corpus-sized
    //    groupBy(score) + a running sum over the bounded distinct-score
    //    table — no per-row window, no floats anywhere ---------------------
    ("q_auc_exact",
      (s: SparkSession, d: String) =>
        graft.ops.Eval.aucExact(CartOps.featured(s, d), "f_chars", "y"),
      CartOps.featureCtes +
        """,
          |bys AS (SELECT f_chars AS s, CAST(count(*) AS BIGINT) AS n,
          |        CAST(sum(y) AS BIGINT) AS pos FROM lab
          |        WHERE f_chars IS NOT NULL GROUP BY 1),
          |rk AS (SELECT s, n, pos,
          |  CAST(coalesce(sum(n) OVER (ORDER BY s
          |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
          |    AS below
          |  FROM bys),
          |ag AS (SELECT CAST(sum(pos) AS BIGINT) AS n_pos,
          |              CAST(sum(n - pos) AS BIGINT) AS n_neg,
          |              CAST(sum(pos * (2 * below + n + 1)) AS BIGINT) AS r2
          |       FROM rk)
          |SELECT n_pos, n_neg, r2 - n_pos * (n_pos + 1) AS u2,
          |  2 * n_pos * n_neg AS den
          |FROM ag""".stripMargin),

    // -- deterministic leave-one-group-out JACKKNIFE SE for that same
    //    AUC (doc_id % 16 groups): each group's held-out AUC computed
    //    EXACTLY by inclusion–exclusion on doubled pair counts (u2 −
    //    pos-in-g pairs − neg-in-g pairs + within-g pairs) — one corpus
    //    groupBy(grp, score), then bounded-table algebra; the variance
    //    estimate bootstrap CIs can't give under the rand-free gate -------
    ("q_auc_jackknife",
      (s: SparkSession, d: String) =>
        graft.ops.Eval.aucJackknife(CartOps.featured(s, d), "f_chars", "y",
          "doc_id", nGroups = 16),
      CartOps.featureCtes +
        """,
          |b AS (SELECT doc_id % 16 AS grp, f_chars AS s, y FROM lab
          |      WHERE f_chars IS NOT NULL),""".stripMargin + "\n" +
        aucJackknifeOracleTail),

    // -- the SAME jackknife STRATIFIED by corpus source (leave-one-
    //    SOURCE-out): "how much does this AUC lean on any single crawl
    //    source" — the deployment question hash shards average away.
    //    Identical inclusion–exclusion algebra, groups = the source
    //    column joined back onto the feature frame --------------------
    ("q_auc_jackknife_src",
      (s: SparkSession, d: String) => {
        val src = Q.t(s, d, "documents").select(col("doc_id"), col("source"))
        graft.ops.Eval.aucJackknifeBy(
          CartOps.featured(s, d).join(src, "doc_id"),
          "f_chars", "y", col("source"))
      },
      CartOps.featureCtes +
        """,
          |b AS (SELECT d.source AS grp, f_chars AS s, y
          |      FROM lab JOIN documents d USING (doc_id)
          |      WHERE f_chars IS NOT NULL),""".stripMargin + "\n" +
        aucJackknifeOracleTail),

    // -- the full precision/recall operating curve of the same scorer:
    //    one row per distinct threshold with exact (tp, fp, fn, tn) —
    //    any P/R/F1 point derives exactly; same bounded-domain cumsum
    //    shape as q_auc_exact --------------------------------------------
    ("q_pr_curve",
      (s: SparkSession, d: String) =>
        graft.ops.Eval.prCurve(CartOps.featured(s, d), "f_chars", "y")
          .orderBy("threshold"),
      CartOps.featureCtes +
        """,
          |bys AS MATERIALIZED (SELECT f_chars AS threshold,
          |        CAST(count(*) AS BIGINT) AS n, CAST(sum(y) AS BIGINT) AS pos
          |        FROM lab WHERE f_chars IS NOT NULL GROUP BY 1),
          |tot AS (SELECT CAST(sum(pos) AS BIGINT) AS npos,
          |        CAST(sum(n - pos) AS BIGINT) AS nneg FROM bys),
          |cum AS (SELECT threshold,
          |  CAST(sum(pos) OVER (ORDER BY threshold DESC) AS BIGINT) AS tp,
          |  CAST(sum(n) OVER (ORDER BY threshold DESC) AS BIGINT) AS pp
          |  FROM bys)
          |SELECT threshold, tp, pp - tp AS fp, npos - tp AS fn,
          |  nneg - (pp - tp) AS tn
          |FROM cum CROSS JOIN tot ORDER BY threshold""".stripMargin),

    // -- Cohen's kappa between TWO gated models — the single q_cart tree
    //    and the bagged forest's 2-of-3 vote — on the shared held-out
    //    split, as exact integers (kappa = kappa_num/kappa_den). The
    //    oracle replays both trainings, both routings, the confusion
    //    matrix and the marginal product, so model agreement itself is
    //    hash-graded. One groupBy(pa, pb) over the test split; everything
    //    after is label²-sized --------------------------------------------
    ("q_model_agreement",
      (s: SparkSession, d: String) =>
        graft.ops.Eval.cohensKappa(treeVsForest(s, d), "p_tree", "p_forest"),
      treeVsForestCtes +
        """,
          |cm AS (SELECT pa, pb, CAST(count(*) AS BIGINT) AS n
          |       FROM pair GROUP BY 1, 2),
          |tot AS (SELECT CAST(sum(n) AS BIGINT) AS total,
          |  CAST(sum(CASE WHEN pa = pb THEN n ELSE 0 END) AS BIGINT) AS agree
          |  FROM cm),
          |ma AS (SELECT pa, sum(n) AS na FROM cm GROUP BY 1),
          |mb AS (SELECT pb, sum(n) AS nb FROM cm GROUP BY 1),
          |pe AS (SELECT CAST(coalesce(sum(na * nb), 0) AS BIGINT) AS pe_num
          |       FROM ma JOIN mb ON ma.pa = mb.pb)
          |SELECT total, agree, pe_num,
          |  agree * total - pe_num AS kappa_num,
          |  total * total - pe_num AS kappa_den
          |FROM tot CROSS JOIN pe""".stripMargin),

    // -- McNemar's paired comparison of the same two models AGAINST the
    //    label: b = docs only the tree gets right, c = only the forest —
    //    the discordant pair counts that decide whether the ensemble's
    //    edge is real, with the exact statistic as the integer ratio
    //    chi2 = (b−c)²/(b+c). Kappa (above) measures agreement ignoring
    //    truth; this measures who wins where they disagree ----------------
    ("q_mcnemar",
      (s: SparkSession, d: String) =>
        treeVsForest(s, d).agg(
            sum(when(col("p_tree") === col("y") &&
              col("p_forest") =!= col("y"), 1L).otherwise(0L)).as("b"),
            sum(when(col("p_tree") =!= col("y") &&
              col("p_forest") === col("y"), 1L).otherwise(0L)).as("c"),
            count(lit(1)).as("n"))
          .select(col("b"), col("c"), col("n"),
            ((col("b") - col("c")) * (col("b") - col("c"))).as("chi2_num"),
            (col("b") + col("c")).as("chi2_den")),
      treeVsForestCtes +
        """
          |SELECT b, c, n, (b - c) * (b - c) AS chi2_num, b + c AS chi2_den
          |FROM (SELECT
          |  CAST(sum(CASE WHEN pa = y AND pb <> y THEN 1 ELSE 0 END) AS BIGINT) AS b,
          |  CAST(sum(CASE WHEN pa <> y AND pb = y THEN 1 ELSE 0 END) AS BIGINT) AS c,
          |  CAST(count(*) AS BIGINT) AS n FROM pair) q""".stripMargin),

    // -- Matthews correlation coefficient of the forest vote against the
    //    label: the chance-robust single-number summary of the full
    //    confusion matrix (Matthews 1975), exact integer numerator
    //    tp·tn − fp·fn plus the double MCC with per-marginal sqrt
    //    factoring — num/(√m1·√m2·√m3·√m4) instead of √(m1·m2·m3·m4),
    //    which would overflow a BIGINT product at ~3e6 held-out rows (the
    //    q_brier bound note). Any empty marginal → NULL (MCC undefined).
    //    One groupBy-free scalar aggregate over the shared pair scan ------
    ("q_mcc",
      (s: SparkSession, d: String) => {
        val cm = treeVsForest(s, d).agg(
          sum(when(col("y") === 1L && col("p_forest") === 1L, 1L)
            .otherwise(0L)).as("tp"),
          sum(when(col("y") === 0L && col("p_forest") === 1L, 1L)
            .otherwise(0L)).as("fp"),
          sum(when(col("y") === 1L && col("p_forest") === 0L, 1L)
            .otherwise(0L)).as("fn"),
          sum(when(col("y") === 0L && col("p_forest") === 0L, 1L)
            .otherwise(0L)).as("tn"))
        cm.select(col("tp"), col("fp"), col("fn"), col("tn"),
          (col("tp") * col("tn") - col("fp") * col("fn")).as("mcc_num"),
          when((col("tp") + col("fp")) > 0L && (col("tp") + col("fn")) > 0L &&
            (col("tn") + col("fp")) > 0L && (col("tn") + col("fn")) > 0L,
            round((col("tp") * col("tn") - col("fp") * col("fn"))
              .cast("double") /
              (sqrt((col("tp") + col("fp")).cast("double")) *
                sqrt((col("tp") + col("fn")).cast("double")) *
                sqrt((col("tn") + col("fp")).cast("double")) *
                sqrt((col("tn") + col("fn")).cast("double"))), 6))
            .as("mcc"))
      },
      treeVsForestCtes +
        """,
          |cm AS (SELECT
          |  CAST(sum(CASE WHEN y = 1 AND pb = 1 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
          |  CAST(sum(CASE WHEN y = 0 AND pb = 1 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
          |  CAST(sum(CASE WHEN y = 1 AND pb = 0 THEN 1 ELSE 0 END) AS BIGINT) AS fn,
          |  CAST(sum(CASE WHEN y = 0 AND pb = 0 THEN 1 ELSE 0 END) AS BIGINT) AS tn
          |  FROM pair)
          |SELECT tp, fp, fn, tn, tp * tn - fp * fn AS mcc_num,
          |  CASE WHEN tp + fp > 0 AND tp + fn > 0
          |        AND tn + fp > 0 AND tn + fn > 0
          |       THEN round(CAST(tp * tn - fp * fn AS DOUBLE) /
          |         (sqrt(CAST(tp + fp AS DOUBLE)) * sqrt(CAST(tp + fn AS DOUBLE)) *
          |          sqrt(CAST(tn + fp AS DOUBLE)) * sqrt(CAST(tn + fn AS DOUBLE))), 6)
          |  END AS mcc
          |FROM cm""".stripMargin),

    // -- binned-ECE reliability table: the tree's per-leaf training rate
    //    becomes each held-out doc's predicted probability, quantized to
    //    integer ppm ((tp*1e6) div tn) and binned equal-width into 10 —
    //    the standard calibration shape for a score with more levels
    //    than leaves, complementing q_leaf_calibration's leaf-grained
    //    table. Per bin: n, empirical positives, summed confidence, and
    //    the exact ECE numerator |1e6·pos − Σppm| (scalar ECE derives as
    //    Σece_num/(1e6·N)). One routing pass + one hash agg ---------------
    ("q_ece",
      (s: SparkSession, d: String) => {
        val feats = CartOps.featured(s, d).localCheckpoint(true)
        val tree = graft.ops.Cart.train(
          feats.filter(pmod(col("doc_id"), lit(2)) === 0),
          CartOps.features, "y", depth = 2, maxBins = 32)
        val leafPpm = tree.filter(_.feature == null)
          .map(t => (t.node, t.nPos * 1000000L / t.n))
        val spark2 = s
        import spark2.implicits._
        val probs = leafPpm.toDF("leaf", "p_ppm")
        graft.ops.Eval.eceBinned(
            graft.ops.Cart.routeLeaf(
                feats.filter(pmod(col("doc_id"), lit(2)) === 1), tree)
              .join(broadcast(probs), Seq("leaf")),
            "p_ppm", "y", bins = 10)
          .orderBy("bin")
      },
      CartOps.oraclePrelude +
        ",\nte AS MATERIALIZED (SELECT * FROM lab WHERE doc_id % 2 = 1)" +
        CartOps.routeCtes("", "predc") +
        """,
          |pp AS (SELECT b.y, (l.tp * 1000000) // l.tn AS ppm
          |       FROM predc_b b JOIN leaves l ON l.node = b.leaf),
          |bb AS (SELECT least((ppm * 10) // 1000000, 9) AS bin,
          |         CAST(count(*) AS BIGINT) AS n,
          |         CAST(sum(y) AS BIGINT) AS pos,
          |         CAST(sum(ppm) AS BIGINT) AS conf_ppm
          |       FROM pp GROUP BY 1)
          |SELECT bin, n, pos, conf_ppm,
          |  abs(1000000 * pos - conf_ppm) AS ece_num
          |FROM bb ORDER BY bin""".stripMargin),

    // -- calibration SLOPE/INTERCEPT (Eval.calibrationFit): weighted OLS
    //    of observed log-odds on predicted log-odds over q_ece's ppm bins
    //    — Cox-style calibration regression, binned. Both logits are ln of
    //    exact integer ratios (conf_ppm/(1e6n−conf_ppm), pos/(n−pos)), per-
    //    bin terms dec6 before the n-weighted sums, degenerate bins
    //    dropped, zero-x-variance → NULL (the q_zipf_fit conventions) ------
    ("q_calibration_fit",
      (s: SparkSession, d: String) => {
        val feats = CartOps.featured(s, d).localCheckpoint(true)
        val tree = graft.ops.Cart.train(
          feats.filter(pmod(col("doc_id"), lit(2)) === 0),
          CartOps.features, "y", depth = 2, maxBins = 32)
        val leafPpm = tree.filter(_.feature == null)
          .map(t => (t.node, t.nPos * 1000000L / t.n))
        val spark2 = s
        import spark2.implicits._
        val probs = leafPpm.toDF("leaf", "p_ppm")
        graft.ops.Eval.calibrationFit(
          graft.ops.Cart.routeLeaf(
              feats.filter(pmod(col("doc_id"), lit(2)) === 1), tree)
            .join(broadcast(probs), Seq("leaf")),
          "p_ppm", "y", bins = 10)
      },
      CartOps.oraclePrelude +
        ",\nte AS MATERIALIZED (SELECT * FROM lab WHERE doc_id % 2 = 1)" +
        CartOps.routeCtes("", "predc") +
        """,
          |pp AS (SELECT b.y, (l.tp * 1000000) // l.tn AS ppm
          |       FROM predc_b b JOIN leaves l ON l.node = b.leaf),
          |bb AS (SELECT least((ppm * 10) // 1000000, 9) AS bin,
          |         CAST(count(*) AS BIGINT) AS n,
          |         CAST(sum(y) AS BIGINT) AS pos,
          |         CAST(sum(ppm) AS BIGINT) AS conf_ppm
          |       FROM pp GROUP BY 1),
          |us AS (SELECT n, pos, conf_ppm,
          |         ln(CAST(conf_ppm AS DOUBLE) /
          |            CAST(1000000 * n - conf_ppm AS DOUBLE)) AS xr,
          |         ln(CAST(pos AS DOUBLE) / CAST(n - pos AS DOUBLE)) AS yr
          |       FROM bb
          |       WHERE pos > 0 AND pos < n
          |         AND conf_ppm > 0 AND conf_ppm < 1000000 * n),
          |tm AS (SELECT n,
          |         CAST(round(xr, 6) AS DECIMAL(18,6)) AS x,
          |         CAST(round(yr, 6) AS DECIMAL(18,6)) AS y,
          |         CAST(round(xr * xr, 6) AS DECIMAL(18,6)) AS xx,
          |         CAST(round(xr * yr, 6) AS DECIMAL(18,6)) AS xy
          |       FROM us),
          |a AS (SELECT CAST(count(*) AS BIGINT) AS n_bins,
          |        CAST(coalesce(sum(n), 0) AS BIGINT) AS n_rows,
          |        CAST(coalesce(sum(n), 0) AS DOUBLE) AS wv,
          |        CAST(sum(n * x) AS DOUBLE) AS sx,
          |        CAST(sum(n * y) AS DOUBLE) AS sy,
          |        CAST(sum(n * xx) AS DOUBLE) AS sxx,
          |        CAST(sum(n * xy) AS DOUBLE) AS sxy
          |      FROM tm)
          |SELECT n_bins, n_rows,
          |  CASE WHEN wv * sxx - sx * sx > 0.0 THEN
          |    round((wv * sxy - sx * sy) / (wv * sxx - sx * sx), 6)
          |  END AS slope,
          |  CASE WHEN wv * sxx - sx * sx > 0.0 THEN
          |    round((sy - (wv * sxy - sx * sy) / (wv * sxx - sx * sx) * sx)
          |      / wv, 6)
          |  END AS intercept
          |FROM a""".stripMargin),

    // -- calibrationFit on a CLOSED-FORM probability (ppm = n_chars·1e6
    //    div (n_chars+300), label from the q_ece fixture rule) — the
    //    SQLite-triangulable twin of q_calibration_fit: same binning + OLS
    //    algebra with no CART prelude, so scripts/triple_check.py can
    //    replay it in a third engine (the mirrored-oracle mitigation) -----
    ("q_calibration_heur",
      (s: SparkSession, d: String) =>
        graft.ops.Eval.calibrationFit(
          Q.t(s, d, "documents").select(
            expr("cast((n_chars * 1000000) div (n_chars + 300) AS BIGINT)")
              .as("p_ppm"),
            ((col("n_chars") > 310) =!= (pmod(col("doc_id"), lit(13)) === 0))
              .cast("long").as("y")),
          "p_ppm", "y", bins = 10),
      """WITH pp AS (SELECT (n_chars * 1000000) // (n_chars + 300) AS ppm,
        |              CAST((n_chars > 310) <> (doc_id % 13 = 0) AS BIGINT) AS y
        |            FROM documents),
        |bb AS (SELECT least((ppm * 10) // 1000000, 9) AS bin,
        |         CAST(count(*) AS BIGINT) AS n,
        |         CAST(sum(y) AS BIGINT) AS pos,
        |         CAST(sum(ppm) AS BIGINT) AS conf_ppm
        |       FROM pp GROUP BY 1),
        |us AS (SELECT n, pos, conf_ppm,
        |         ln(CAST(conf_ppm AS DOUBLE) /
        |            CAST(1000000 * n - conf_ppm AS DOUBLE)) AS xr,
        |         ln(CAST(pos AS DOUBLE) / CAST(n - pos AS DOUBLE)) AS yr
        |       FROM bb
        |       WHERE pos > 0 AND pos < n
        |         AND conf_ppm > 0 AND conf_ppm < 1000000 * n),
        |tm AS (SELECT n,
        |         CAST(round(xr, 6) AS DECIMAL(18,6)) AS x,
        |         CAST(round(yr, 6) AS DECIMAL(18,6)) AS y,
        |         CAST(round(xr * xr, 6) AS DECIMAL(18,6)) AS xx,
        |         CAST(round(xr * yr, 6) AS DECIMAL(18,6)) AS xy
        |       FROM us),
        |a AS (SELECT CAST(count(*) AS BIGINT) AS n_bins,
        |        CAST(coalesce(sum(n), 0) AS BIGINT) AS n_rows,
        |        CAST(coalesce(sum(n), 0) AS DOUBLE) AS wv,
        |        CAST(sum(n * x) AS DOUBLE) AS sx,
        |        CAST(sum(n * y) AS DOUBLE) AS sy,
        |        CAST(sum(n * xx) AS DOUBLE) AS sxx,
        |        CAST(sum(n * xy) AS DOUBLE) AS sxy
        |      FROM tm)
        |SELECT n_bins, n_rows,
        |  CASE WHEN wv * sxx - sx * sx > 0.0 THEN
        |    round((wv * sxy - sx * sy) / (wv * sxx - sx * sx), 6)
        |  END AS slope,
        |  CASE WHEN wv * sxx - sx * sx > 0.0 THEN
        |    round((sy - (wv * sxy - sx * sy) / (wv * sxx - sx * sx) * sx)
        |      / wv, 6)
        |  END AS intercept
        |FROM a""".stripMargin),

    // -- calibration drift BY SOURCE (Eval.calibrationFitBy): the heur
    //    fixture's slope/intercept fitted per crawl source — the
    //    q_auc_jackknife_src deployment question ("which shard is the
    //    pooled line hiding?") asked of calibration. Same binning + dec6
    //    weighted-OLS algebra, all aggregations source-keyed --------------
    ("q_calibration_by_source",
      (s: SparkSession, d: String) =>
        graft.ops.Eval.calibrationFitBy(
          Q.t(s, d, "documents").select(
            col("source"),
            expr("cast((n_chars * 1000000) div (n_chars + 300) AS BIGINT)")
              .as("p_ppm"),
            ((col("n_chars") > 310) =!= (pmod(col("doc_id"), lit(13)) === 0))
              .cast("long").as("y")),
          "source", "p_ppm", "y", bins = 10)
          .orderBy("source"),
      """WITH pp AS (SELECT source,
        |              (n_chars * 1000000) // (n_chars + 300) AS ppm,
        |              CAST((n_chars > 310) <> (doc_id % 13 = 0) AS BIGINT) AS y
        |            FROM documents),
        |bb AS (SELECT source, least((ppm * 10) // 1000000, 9) AS bin,
        |         CAST(count(*) AS BIGINT) AS n,
        |         CAST(sum(y) AS BIGINT) AS pos,
        |         CAST(sum(ppm) AS BIGINT) AS conf_ppm
        |       FROM pp GROUP BY 1, 2),
        |us AS (SELECT source, n, pos, conf_ppm,
        |         ln(CAST(conf_ppm AS DOUBLE) /
        |            CAST(1000000 * n - conf_ppm AS DOUBLE)) AS xr,
        |         ln(CAST(pos AS DOUBLE) / CAST(n - pos AS DOUBLE)) AS yr
        |       FROM bb
        |       WHERE pos > 0 AND pos < n
        |         AND conf_ppm > 0 AND conf_ppm < 1000000 * n),
        |tm AS (SELECT source, n,
        |         CAST(round(xr, 6) AS DECIMAL(18,6)) AS x,
        |         CAST(round(yr, 6) AS DECIMAL(18,6)) AS y,
        |         CAST(round(xr * xr, 6) AS DECIMAL(18,6)) AS xx,
        |         CAST(round(xr * yr, 6) AS DECIMAL(18,6)) AS xy
        |       FROM us),
        |a AS (SELECT source, CAST(count(*) AS BIGINT) AS n_bins,
        |        CAST(coalesce(sum(n), 0) AS BIGINT) AS n_rows,
        |        CAST(coalesce(sum(n), 0) AS DOUBLE) AS wv,
        |        CAST(sum(n * x) AS DOUBLE) AS sx,
        |        CAST(sum(n * y) AS DOUBLE) AS sy,
        |        CAST(sum(n * xx) AS DOUBLE) AS sxx,
        |        CAST(sum(n * xy) AS DOUBLE) AS sxy
        |      FROM tm GROUP BY 1)
        |SELECT source, n_bins, n_rows,
        |  CASE WHEN wv * sxx - sx * sx > 0.0 THEN
        |    round((wv * sxy - sx * sy) / (wv * sxx - sx * sx), 6)
        |  END AS slope,
        |  CASE WHEN wv * sxx - sx * sx > 0.0 THEN
        |    round((sy - (wv * sxy - sx * sy) / (wv * sxx - sx * sx) * sx)
        |      / wv, 6)
        |  END AS intercept
        |FROM a ORDER BY source""".stripMargin),

    // -- calibration drift ALERT: each source's slope compared against the
    //    POOLED slope at 2x the pooled leave-one-bin-out jackknife SE —
    //    the composition of q_calibration_by_source and
    //    q_calibration_jackknife into the deployment decision ("which
    //    shard drifted beyond sampling noise?"). All inputs are the two
    //    verified gates' own dec6 values, so the strict-> comparison is
    //    deterministic; a NULL comparison (degenerate source fit) flags 0
    //    in both engines (when().otherwise(0) ≡ CASE WHEN ... ELSE 0) -----
    ("q_calibration_drift_alert",
      (s: SparkSession, d: String) => {
        val fx = Q.t(s, d, "documents").select(
          col("source"),
          expr("cast((n_chars * 1000000) div (n_chars + 300) AS BIGINT)")
            .as("p_ppm"),
          ((col("n_chars") > 310) =!= (pmod(col("doc_id"), lit(13)) === 0))
            .cast("long").as("y"))
        val by = graft.ops.Eval.calibrationFitBy(fx, "source", "p_ppm", "y",
            bins = 10)
          .select(col("source"), col("slope").as("src_slope"))
        val jk = graft.ops.Eval.calibrationJackknife(fx.drop("source"),
            "p_ppm", "y", bins = 10)
          .select(col("slope").as("pooled_slope"), col("slope_se"))
        by.crossJoin(broadcast(jk))
          .select(col("source"), col("src_slope"), col("pooled_slope"),
            col("slope_se"),
            when(abs(col("src_slope") - col("pooled_slope")) >
                lit(2.0) * col("slope_se"), 1L).otherwise(0L)
              .as("drift_flag"))
          .orderBy("source")
      },
      """WITH pp AS (SELECT source,
        |              (n_chars * 1000000) // (n_chars + 300) AS ppm,
        |              CAST((n_chars > 310) <> (doc_id % 13 = 0) AS BIGINT) AS y
        |            FROM documents),
        |bb AS (SELECT source, least((ppm * 10) // 1000000, 9) AS bin,
        |         CAST(count(*) AS BIGINT) AS n,
        |         CAST(sum(y) AS BIGINT) AS pos,
        |         CAST(sum(ppm) AS BIGINT) AS conf_ppm
        |       FROM pp GROUP BY 1, 2),
        |us AS (SELECT source, n, pos, conf_ppm,
        |         ln(CAST(conf_ppm AS DOUBLE) /
        |            CAST(1000000 * n - conf_ppm AS DOUBLE)) AS xr,
        |         ln(CAST(pos AS DOUBLE) / CAST(n - pos AS DOUBLE)) AS yr
        |       FROM bb
        |       WHERE pos > 0 AND pos < n
        |         AND conf_ppm > 0 AND conf_ppm < 1000000 * n),
        |tm AS (SELECT source, n,
        |         CAST(round(xr, 6) AS DECIMAL(18,6)) AS x,
        |         CAST(round(yr, 6) AS DECIMAL(18,6)) AS y,
        |         CAST(round(xr * xr, 6) AS DECIMAL(18,6)) AS xx,
        |         CAST(round(xr * yr, 6) AS DECIMAL(18,6)) AS xy
        |       FROM us),
        |a AS (SELECT source,
        |        CAST(coalesce(sum(n), 0) AS DOUBLE) AS wv,
        |        CAST(sum(n * x) AS DOUBLE) AS sx,
        |        CAST(sum(n * y) AS DOUBLE) AS sy,
        |        CAST(sum(n * xx) AS DOUBLE) AS sxx,
        |        CAST(sum(n * xy) AS DOUBLE) AS sxy
        |      FROM tm GROUP BY 1),
        |srcfit AS (SELECT source,
        |  CASE WHEN wv * sxx - sx * sx > 0.0 THEN
        |    round((wv * sxy - sx * sy) / (wv * sxx - sx * sx), 6)
        |  END AS src_slope
        |  FROM a),
        |jbb AS (SELECT least((ppm * 10) // 1000000, 9) AS bin,
        |         CAST(count(*) AS BIGINT) AS n,
        |         CAST(sum(y) AS BIGINT) AS pos,
        |         CAST(sum(ppm) AS BIGINT) AS conf_ppm
        |       FROM pp GROUP BY 1),
        |jus AS (SELECT n, pos, conf_ppm,
        |         ln(CAST(conf_ppm AS DOUBLE) /
        |            CAST(1000000 * n - conf_ppm AS DOUBLE)) AS xr,
        |         ln(CAST(pos AS DOUBLE) / CAST(n - pos AS DOUBLE)) AS yr
        |       FROM jbb
        |       WHERE pos > 0 AND pos < n
        |         AND conf_ppm > 0 AND conf_ppm < 1000000 * n),
        |jtm AS MATERIALIZED (SELECT n,
        |         CAST(round(xr, 6) AS DECIMAL(18,6)) AS x,
        |         CAST(round(yr, 6) AS DECIMAL(18,6)) AS y,
        |         CAST(round(xr * xr, 6) AS DECIMAL(18,6)) AS xx,
        |         CAST(round(xr * yr, 6) AS DECIMAL(18,6)) AS xy
        |       FROM jus),
        |ja AS (SELECT
        |        CAST(coalesce(sum(n), 0) AS DOUBLE) AS wv,
        |        CAST(sum(n * x) AS DOUBLE) AS sx,
        |        CAST(sum(n * y) AS DOUBLE) AS sy,
        |        CAST(sum(n * xx) AS DOUBLE) AS sxx,
        |        CAST(sum(n * xy) AS DOUBLE) AS sxy
        |      FROM jtm),
        |jtot AS (SELECT CAST(sum(n) AS BIGINT) AS w,
        |        sum(n * x) AS tsx, sum(n * y) AS tsy,
        |        sum(n * xx) AS tsxx, sum(n * xy) AS tsxy FROM jtm),
        |jlo AS (SELECT
        |         CAST(w - n AS DOUBLE) AS wd,
        |         CAST(tsx - n * x AS DOUBLE) AS sxd,
        |         CAST(tsy - n * y AS DOUBLE) AS syd,
        |         CAST(tsxx - n * xx AS DOUBLE) AS sxxd,
        |         CAST(tsxy - n * xy AS DOUBLE) AS sxyd
        |       FROM jtm CROSS JOIN jtot),
        |jrep AS MATERIALIZED (SELECT
        |         CAST(round((wd * sxyd - sxd * syd)
        |           / (wd * sxxd - sxd * sxd), 6) AS DECIMAL(18,6)) AS sl
        |       FROM jlo WHERE wd * sxxd - sxd * sxd > 0.0),
        |jmeans AS (SELECT CAST(count(*) AS BIGINT) AS g,
        |         round(CAST(sum(sl) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6)
        |           AS msl
        |       FROM jrep),
        |jsq AS (SELECT
        |         CAST(sum(CAST(round((CAST(sl AS DOUBLE) - msl)
        |           * (CAST(sl AS DOUBLE) - msl), 6) AS DECIMAL(18,6)))
        |           AS DOUBLE) AS vsl
        |       FROM jrep CROSS JOIN jmeans),
        |pooled AS (SELECT
        |  CASE WHEN wv * sxx - sx * sx > 0.0 THEN
        |    round((wv * sxy - sx * sy) / (wv * sxx - sx * sx), 6)
        |  END AS pooled_slope,
        |  CASE WHEN m.g >= 2 THEN
        |    round(sqrt((CAST(m.g AS DOUBLE) - 1) / CAST(m.g AS DOUBLE)
        |      * s.vsl), 6) END AS slope_se
        |  FROM ja CROSS JOIN jmeans m CROSS JOIN jsq s)
        |SELECT f.source, f.src_slope, p.pooled_slope, p.slope_se,
        |  CAST(CASE WHEN abs(f.src_slope - p.pooled_slope) > 2 * p.slope_se
        |       THEN 1 ELSE 0 END AS BIGINT) AS drift_flag
        |FROM srcfit f CROSS JOIN pooled p
        |ORDER BY f.source""".stripMargin),

    // -- leave-one-BIN-out jackknife SE for the calibration slope/
    //    intercept (Eval.calibrationJackknife) on the same closed-form
    //    fixture as q_calibration_heur: replicate sums by inclusion–
    //    exclusion on the decimal-exact bin terms (double only at each
    //    final ratio), replicates dec6, SE = sqrt((g−1)/g · Σ dec6(Δ²))
    //    — the q_auc_jackknife discipline applied to the fitted line.
    //    Bins-sized algebra end to end: the corpus is touched exactly
    //    once (the q_ece binning scan) ------------------------------------
    ("q_calibration_jackknife",
      (s: SparkSession, d: String) =>
        graft.ops.Eval.calibrationJackknife(
          Q.t(s, d, "documents").select(
            expr("cast((n_chars * 1000000) div (n_chars + 300) AS BIGINT)")
              .as("p_ppm"),
            ((col("n_chars") > 310) =!= (pmod(col("doc_id"), lit(13)) === 0))
              .cast("long").as("y")),
          "p_ppm", "y", bins = 10),
      """WITH pp AS (SELECT (n_chars * 1000000) // (n_chars + 300) AS ppm,
        |              CAST((n_chars > 310) <> (doc_id % 13 = 0) AS BIGINT) AS y
        |            FROM documents),
        |bb AS (SELECT least((ppm * 10) // 1000000, 9) AS bin,
        |         CAST(count(*) AS BIGINT) AS n,
        |         CAST(sum(y) AS BIGINT) AS pos,
        |         CAST(sum(ppm) AS BIGINT) AS conf_ppm
        |       FROM pp GROUP BY 1),
        |us AS (SELECT n, pos, conf_ppm,
        |         ln(CAST(conf_ppm AS DOUBLE) /
        |            CAST(1000000 * n - conf_ppm AS DOUBLE)) AS xr,
        |         ln(CAST(pos AS DOUBLE) / CAST(n - pos AS DOUBLE)) AS yr
        |       FROM bb
        |       WHERE pos > 0 AND pos < n
        |         AND conf_ppm > 0 AND conf_ppm < 1000000 * n),
        |tm AS MATERIALIZED (SELECT n,
        |         CAST(round(xr, 6) AS DECIMAL(18,6)) AS x,
        |         CAST(round(yr, 6) AS DECIMAL(18,6)) AS y,
        |         CAST(round(xr * xr, 6) AS DECIMAL(18,6)) AS xx,
        |         CAST(round(xr * yr, 6) AS DECIMAL(18,6)) AS xy
        |       FROM us),
        |a AS (SELECT CAST(count(*) AS BIGINT) AS n_bins,
        |        CAST(coalesce(sum(n), 0) AS BIGINT) AS n_rows,
        |        CAST(coalesce(sum(n), 0) AS DOUBLE) AS wv,
        |        CAST(sum(n * x) AS DOUBLE) AS sx,
        |        CAST(sum(n * y) AS DOUBLE) AS sy,
        |        CAST(sum(n * xx) AS DOUBLE) AS sxx,
        |        CAST(sum(n * xy) AS DOUBLE) AS sxy
        |      FROM tm),
        |tot AS (SELECT CAST(sum(n) AS BIGINT) AS w,
        |        sum(n * x) AS tsx, sum(n * y) AS tsy,
        |        sum(n * xx) AS tsxx, sum(n * xy) AS tsxy FROM tm),
        |lo AS (SELECT
        |         CAST(w - n AS DOUBLE) AS wd,
        |         CAST(tsx - n * x AS DOUBLE) AS sxd,
        |         CAST(tsy - n * y AS DOUBLE) AS syd,
        |         CAST(tsxx - n * xx AS DOUBLE) AS sxxd,
        |         CAST(tsxy - n * xy AS DOUBLE) AS sxyd
        |       FROM tm CROSS JOIN tot),
        |rep AS MATERIALIZED (SELECT
        |         CAST(round((wd * sxyd - sxd * syd)
        |           / (wd * sxxd - sxd * sxd), 6) AS DECIMAL(18,6)) AS sl,
        |         CAST(round((syd - (wd * sxyd - sxd * syd)
        |             / (wd * sxxd - sxd * sxd) * sxd) / wd, 6)
        |           AS DECIMAL(18,6)) AS ic
        |       FROM lo WHERE wd * sxxd - sxd * sxd > 0.0),
        |means AS (SELECT CAST(count(*) AS BIGINT) AS g,
        |         round(CAST(sum(sl) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6)
        |           AS msl,
        |         round(CAST(sum(ic) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6)
        |           AS mic
        |       FROM rep),
        |sq AS (SELECT
        |         CAST(sum(CAST(round((CAST(sl AS DOUBLE) - msl)
        |           * (CAST(sl AS DOUBLE) - msl), 6) AS DECIMAL(18,6)))
        |           AS DOUBLE) AS vsl,
        |         CAST(sum(CAST(round((CAST(ic AS DOUBLE) - mic)
        |           * (CAST(ic AS DOUBLE) - mic), 6) AS DECIMAL(18,6)))
        |           AS DOUBLE) AS vic
        |       FROM rep CROSS JOIN means)
        |SELECT a.n_bins,
        |  CASE WHEN wv * sxx - sx * sx > 0.0 THEN
        |    round((wv * sxy - sx * sy) / (wv * sxx - sx * sx), 6)
        |  END AS slope,
        |  CASE WHEN wv * sxx - sx * sx > 0.0 THEN
        |    round((sy - (wv * sxy - sx * sy) / (wv * sxx - sx * sx) * sx)
        |      / wv, 6)
        |  END AS intercept,
        |  m.g AS n_reps,
        |  CASE WHEN m.g >= 2 THEN
        |    round(sqrt((CAST(m.g AS DOUBLE) - 1) / CAST(m.g AS DOUBLE)
        |      * s.vsl), 6) END AS slope_se,
        |  CASE WHEN m.g >= 2 THEN
        |    round(sqrt((CAST(m.g AS DOUBLE) - 1) / CAST(m.g AS DOUBLE)
        |      * s.vic), 6) END AS intercept_se
        |FROM a CROSS JOIN means m CROSS JOIN sq s""".stripMargin),

    // -- exact Brier score numerator at ppm² scale: Σ(1e6·y − ppm)² over
    //    the held-out docs (Brier = num / (n·1e12) derives exactly) —
    //    the proper-scoring-rule companion to q_ece's calibration table,
    //    on the same ppm-quantized leaf probabilities. Bounded exactly:
    //    (1e6)² × corpus < 2^63 up to ~9.2e6 rows; corpora past that
    //    split the sum by a partition key first. One routing pass + one
    //    scalar aggregate ------------------------------------------------
    ("q_brier",
      (s: SparkSession, d: String) => {
        val feats = CartOps.featured(s, d).localCheckpoint(true)
        val tree = graft.ops.Cart.train(
          feats.filter(pmod(col("doc_id"), lit(2)) === 0),
          CartOps.features, "y", depth = 2, maxBins = 32)
        val leafPpm = tree.filter(_.feature == null)
          .map(t => (t.node, t.nPos * 1000000L / t.n))
        val spark2 = s
        import spark2.implicits._
        val probs = leafPpm.toDF("leaf", "p_ppm")
        graft.ops.Cart.routeLeaf(
            feats.filter(pmod(col("doc_id"), lit(2)) === 1), tree)
          .join(broadcast(probs), Seq("leaf"))
          .agg(count(lit(1)).as("n"),
            sum(expr("(1000000L * y - p_ppm) * (1000000L * y - p_ppm)"))
              .cast("long").as("brier_num"))
      },
      CartOps.oraclePrelude +
        ",\nte AS MATERIALIZED (SELECT * FROM lab WHERE doc_id % 2 = 1)" +
        CartOps.routeCtes("", "predc") +
        """,
          |pp AS (SELECT b.y, (l.tp * 1000000) // l.tn AS ppm
          |       FROM predc_b b JOIN leaves l ON l.node = b.leaf)
          |SELECT CAST(count(*) AS BIGINT) AS n,
          |  CAST(sum((1000000 * y - ppm) * (1000000 * y - ppm)) AS BIGINT)
          |    AS brier_num
          |FROM pp""".stripMargin),

    // -- lift / cumulative-gains deciles of the f_chars scorer: rows
    //    ranked best-first (doc_id tiebreak = a total order, so the cut
    //    is cross-engine exact), 10 equal-count buckets, each carrying
    //    exact integers incl. lift@decile = lift_num/lift_den =
    //    (cum_pos·N)/(cum_n·P) — the campaign-targeting companion to
    //    q_pr_curve. Rank WITHOUT a global window: distinct-score prefix
    //    sums + per-tie-group row_number (see Eval.liftDeciles) -----------
    ("q_lift_deciles",
      (s: SparkSession, d: String) =>
        graft.ops.Eval.liftDeciles(CartOps.featured(s, d), "f_chars", "y",
            "doc_id", buckets = 10)
          .orderBy("decile"),
      CartOps.featureCtes +
        """,
          |rk AS (SELECT doc_id, y,
          |    row_number() OVER (ORDER BY f_chars DESC, doc_id) AS r
          |  FROM lab WHERE f_chars IS NOT NULL),
          |tot AS (SELECT CAST(count(*) AS BIGINT) AS n_total,
          |        CAST(sum(y) AS BIGINT) AS pos_total FROM rk),
          |dec AS (SELECT CAST(((r - 1) * 10) // n_total AS BIGINT) AS decile,
          |         CAST(count(*) AS BIGINT) AS n, CAST(sum(y) AS BIGINT) AS pos
          |       FROM rk CROSS JOIN tot GROUP BY 1),
          |cum AS (SELECT decile, n, pos,
          |  CAST(sum(n) OVER (ORDER BY decile) AS BIGINT) AS cum_n,
          |  CAST(sum(pos) OVER (ORDER BY decile) AS BIGINT) AS cum_pos
          |  FROM dec)
          |SELECT decile, n, pos, cum_n, cum_pos,
          |  cum_pos * n_total AS lift_num, cum_n * pos_total AS lift_den
          |FROM cum CROSS JOIN tot ORDER BY decile""".stripMargin),

    // -- per-leaf calibration (the reliability table at the model's own
    //    granularity): each leaf's TRAINING positive rate (its implicit
    //    predicted probability tp/tn) beside the HELD-OUT empirical rate
    //    — all exact integers, no binning of a float score needed because
    //    the tree's leaves are the bins. A well-calibrated leaf has
    //    test_pos/test_n ≈ train_pos/train_n; the gate proves the table,
    //    ECE at any weighting derives from it -----------------------------
    ("q_leaf_calibration",
      (s: SparkSession, d: String) => {
        val feats = CartOps.featured(s, d).localCheckpoint(true)
        val tree = graft.ops.Cart.train(
          feats.filter(pmod(col("doc_id"), lit(2)) === 0),
          CartOps.features, "y", depth = 2, maxBins = 32)
        val leafStats = tree.filter(_.feature == null)
          .map(t => (t.node, t.n, t.nPos))
        val spark2 = s
        import spark2.implicits._
        val trainSide = leafStats.toDF("leaf", "train_n", "train_pos")
        graft.ops.Cart.routeLeaf(
            feats.filter(pmod(col("doc_id"), lit(2)) === 1), tree)
          .groupBy("leaf")
          .agg(count(lit(1)).as("test_n"), sum(col("y")).as("test_pos"))
          .join(broadcast(trainSide), Seq("leaf"))
          .select("leaf", "train_n", "train_pos", "test_n", "test_pos")
          .orderBy("leaf")
      },
      CartOps.oraclePrelude +
        ",\nte AS MATERIALIZED (SELECT * FROM lab WHERE doc_id % 2 = 1)" +
        CartOps.routeCtes("", "predc") +
        """
          |SELECT b.leaf, l.tn AS train_n, l.tp AS train_pos,
          |  CAST(count(*) AS BIGINT) AS test_n, CAST(sum(b.y) AS BIGINT) AS test_pos
          |FROM predc_b b JOIN leaves l ON l.node = b.leaf
          |GROUP BY 1, 2, 3 ORDER BY 1""".stripMargin))
}
