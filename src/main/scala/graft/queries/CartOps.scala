package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import Q._

/** CART decision-tree training under the oracle gate — the fifth trained
  * model (PageRank, BPE, Lloyd, Naive Bayes, CART). DuckDB replays the
  * ENTIRE training — binning, prefix-sum split scoring, argmin with
  * deterministic ties, the strict-improvement stop rule — as a two-level
  * unrolled CTE, then reclassifies the held-out half through the same
  * tree; hash equality grades train, model shape and inference at once.
  * Determinism rests on the misclassification-count criterion being pure
  * BIGINT arithmetic end to end (see [[graft.ops.Cart]]).
  *
  * The fixture's documents are lowercase prose with no digits, so the
  * features are character/word/letter counts and the label is a
  * two-feature threshold rule ((f_chars > 310) AND (f_e > 30)) XOR a
  * doc_id-keyed noise flip — learnable but imperfect, so the gated tree
  * exhibits real structure (root splits one rule feature, a child splits
  * the other) rather than two engines agreeing on a constant. Train on
  * even doc_id, classify odd (the q_nb_classify convention).
  */
object CartOps {

  type Fn = (SparkSession, String) => DataFrame

  private[queries] val features = Seq("f_a", "f_chars", "f_e", "f_words")

  /** doc_id, the four integer features, and the noisy label y. */
  private[queries] def featured(s: SparkSession, d: String): DataFrame =
    t(s, d, "documents").select(
        col("doc_id"),
        (length(col("text")) - length(expr("replace(text, 'a', '')")))
          .cast("long").as("f_a"),
        length(col("text")).cast("long").as("f_chars"),
        (length(col("text")) - length(expr("replace(text, 'e', '')")))
          .cast("long").as("f_e"),
        size(expr("regexp_extract_all(text, '\\\\S+', 0)"))
          .cast("long").as("f_words"))
      .withColumn("y",
        ((col("f_chars") > 310 && col("f_e") > 30) =!=
          (pmod(col("doc_id"), lit(13)) === 0)).cast("long"))

  private[queries] def train(s: SparkSession, d: String): Seq[graft.ops.Cart.TreeNode] =
    graft.ops.Cart.train(
      featured(s, d).filter(pmod(col("doc_id"), lit(2)) === 0),
      features, "y", depth = 2, maxBins = 32)

  /** md5(doc_id) mod-3 bag id — the house hex→int convention, Spark side. */
  private def bagCol = pmod(expr(
    "conv(substr(md5(cast(doc_id as string)), 1, 15), 16, 10)")
    .cast("long"), lit(3))

  /** Out-of-bag membership for bag `b` (rows whose bag id differs) — the
    * subset column EvalOps' fused tree+forest training passes to
    * Cart.trainMany.
    */
  private[queries] def oobBag(b: Int): org.apache.spark.sql.Column =
    bagCol =!= b

  /** The SAME bag id in DuckDB SQL, compared to bag `b` with `op` — the
    * single source for every oracle bag predicate so tr (op "<>") and its
    * OOB complement trb (op "=") cannot drift apart.
    */
  private[queries] def bagSql(b: Int, op: String): String =
    "('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 3 " +
      s"$op $b"

  /** The forest's base layer: three depth-2 trees, tree b trained on the
    * even-doc_id rows OUTSIDE bag b. Shared by q_forest_classify and
    * q_stacked_classify so "base layer = the trees above" is enforced in
    * code, not just documented.
    */
  private[queries] def baseTrees(trainAll: DataFrame): Seq[Seq[graft.ops.Cart.TreeNode]] =
    // the three out-of-bag subsets train in ONE level-synchronous pass
    // (Cart.trainMany) — bit-identical trees, a third of the scans/jobs
    graft.ops.Cart.trainMany(trainAll, (0 until 3).map(b => bagCol =!= b),
      features, "y", depth = 2, maxBins = 32)

  /** Route `test` through all three trees and add the 2-of-3 majority vote
    * as column `voteAs`.
    */
  private[queries] def forestVote(test: DataFrame,
      trees: Seq[Seq[graft.ops.Cart.TreeNode]], voteAs: String): DataFrame =
    trees.zipWithIndex.foldLeft(test) { case (df, (tr, i)) =>
        graft.ops.Cart.classify(df, tr).withColumnRenamed("pred", s"__p$i")
      }
      .withColumn(voteAs,
        (col("__p0") + col("__p1") + col("__p2") >= 2).cast("long"))
      .drop("__p0", "__p1", "__p2")

  /** The shared feature/label CTEs every cart/forest oracle starts with. */
  private[queries] val featureCtes =
    """WITH f0 AS (
      |  SELECT doc_id,
      |    CAST(length(text) - length(replace(text, 'a', '')) AS BIGINT) AS f_a,
      |    CAST(length(text) AS BIGINT) AS f_chars,
      |    CAST(length(text) - length(replace(text, 'e', '')) AS BIGINT) AS f_e,
      |    CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS f_words
      |  FROM documents),
      |lab AS MATERIALIZED (
      |  SELECT doc_id, f_a, f_chars, f_e, f_words,
      |    CAST(CASE WHEN (f_chars > 310 AND f_e > 30) <> (doc_id % 13 = 0)
      |         THEN 1 ELSE 0 END AS BIGINT) AS y
      |  FROM f0)""".stripMargin

  /** UNION-ALL melt of `alias` over the feature columns `fs`:
    * (`key`, f, v, y) — one arm per feature.
    */
  private def melt(fs: Seq[String], key: String, alias: String): String =
    fs.map(f => s"SELECT $key, '$f' AS f, $f AS v, y FROM $alias")
      .mkString(" UNION ALL\n  ")

  /** `CASE b.f ... END` dereferencing row-alias `p`'s copy of the chosen
    * split feature.
    */
  private def fcase(fs: Seq[String], p: String): String = {
    require(fs.size >= 2,
      s"fcase needs >= 2 features (got $fs): a single feature would emit " +
        "'CASE b.f ELSE ... END' with no WHEN arm")
    "(CASE b.f " + fs.init.map(f => s"WHEN '$f' THEN $p.$f").mkString(" ") +
      s" ELSE $p.${fs.last} END)"
  }

  /** The two-level training unroll, CTE names suffixed `$x` so a forest
    * oracle can instantiate one copy per bag — and parameterized over the
    * feature list and source relation so the STACKED meta-tree trains the
    * same way on OOB predictions: train split, melt, bin widths,
    * prefix-sum split scoring, deterministic argmin, strict-improvement
    * gates, and final leaf stats. Multiply-referenced CTEs are
    * MATERIALIZED: without it DuckDB re-inlines each reference, and the
    * stacked oracle's meta level (which references three whole base-tree
    * DAGs) blows up exponentially — >6 min where the materialized form
    * runs in seconds.
    */
  private[queries] def trainCtes(x: String, trainWhere: String,
      fs: Seq[String] = features, src: String = "lab"): String =
    s""",
      |tr$x AS MATERIALIZED (SELECT * FROM $src WHERE $trainWhere),
      |m1$x AS MATERIALIZED (
      |  ${melt(fs, "doc_id", s"tr$x")}),
      |wd$x AS (SELECT f, CAST(min(v) AS BIGINT) AS mn,
      |         CAST(greatest(1, (max(v) - min(v) + 32) // 32) AS BIGINT) AS w
      |       FROM m1$x GROUP BY 1),
      |c1$x AS (SELECT m1$x.f, mn + ((v - mn) // w) * w + (w - 1) AS vb,
      |         CAST(count(*) AS BIGINT) AS n, CAST(sum(y) AS BIGINT) AS pos
      |       FROM m1$x JOIN wd$x USING (f) GROUP BY 1, 2),
      |s1$x AS (SELECT f, vb,
      |         CAST(sum(n) OVER (PARTITION BY f ORDER BY vb) AS BIGINT) AS cn,
      |         CAST(sum(pos) OVER (PARTITION BY f ORDER BY vb) AS BIGINT) AS cp,
      |         CAST(sum(n) OVER (PARTITION BY f) AS BIGINT) AS tn,
      |         CAST(sum(pos) OVER (PARTITION BY f) AS BIGINT) AS tp
      |       FROM c1$x),
      |e1$x AS (SELECT f, vb, tn, tp,
      |         (cn - greatest(cp, cn - cp)) +
      |         ((tn - cn) - greatest(tp - cp, (tn - cn) - (tp - cp))) AS e
      |       FROM s1$x WHERE cn < tn),
      |b1$x AS (SELECT f, vb, e, tn, tp FROM e1$x
      |       QUALIFY row_number() OVER (ORDER BY e, f, vb) = 1),
      |b1ok$x AS MATERIALIZED (SELECT * FROM b1$x WHERE e < tn - greatest(tp, tn - tp)),
      |a2$x AS MATERIALIZED (
      |  SELECT t.*, CAST(CASE WHEN b.f IS NULL THEN 1
      |    WHEN ${fcase(fs, "t")} <= b.vb THEN 2
      |    ELSE 3 END AS BIGINT) AS node
      |  FROM tr$x t LEFT JOIN b1ok$x b ON true),
      |m2$x AS MATERIALIZED (
      |  ${melt(fs, "node", s"a2$x")}),
      |c2$x AS (SELECT node, m2$x.f, mn + ((v - mn) // w) * w + (w - 1) AS vb,
      |         CAST(count(*) AS BIGINT) AS n, CAST(sum(y) AS BIGINT) AS pos
      |       FROM m2$x JOIN wd$x USING (f) GROUP BY 1, 2, 3),
      |s2$x AS (SELECT node, f, vb,
      |         CAST(sum(n) OVER (PARTITION BY node, f ORDER BY vb) AS BIGINT) AS cn,
      |         CAST(sum(pos) OVER (PARTITION BY node, f ORDER BY vb) AS BIGINT) AS cp,
      |         CAST(sum(n) OVER (PARTITION BY node, f) AS BIGINT) AS tn,
      |         CAST(sum(pos) OVER (PARTITION BY node, f) AS BIGINT) AS tp
      |       FROM c2$x),
      |e2$x AS (SELECT node, f, vb, tn, tp,
      |         (cn - greatest(cp, cn - cp)) +
      |         ((tn - cn) - greatest(tp - cp, (tn - cn) - (tp - cp))) AS e
      |       FROM s2$x WHERE cn < tn),
      |b2$x AS (SELECT node, f, vb, e, tn, tp FROM e2$x
      |       QUALIFY row_number() OVER (PARTITION BY node ORDER BY e, f, vb) = 1),
      |b2ok$x AS MATERIALIZED (SELECT * FROM b2$x
      |         WHERE node <> 1 AND e < tn - greatest(tp, tn - tp)),
      |a3$x AS (
      |  SELECT a.y, CAST(CASE WHEN b.node IS NULL THEN a.node
      |    WHEN ${fcase(fs, "a")} <= b.vb
      |    THEN 2 * a.node ELSE 2 * a.node + 1 END AS BIGINT) AS leaf
      |  FROM a2$x a LEFT JOIN b2ok$x b ON b.node = a.node),
      |leaves$x AS MATERIALIZED (SELECT leaf AS node, CAST(count(*) AS BIGINT) AS tn,
      |             CAST(sum(y) AS BIGINT) AS tp
      |           FROM a3$x GROUP BY 1)""".stripMargin

  /** Route relation `src` (doc_id-keyed, carrying `fs` and y) through
    * tree `$x`: emits CTE `$out` = (doc_id, y, p) with the reached leaf's
    * majority prediction. `out` names the emitted CTEs so one tree can
    * route several relations (test split, OOB bag) without collisions.
    */
  private[queries] def routeCtes(x: String, out: String, src: String = "te",
      fs: Seq[String] = features): String =
    s""",
      |${out}_a AS (
      |  SELECT t.*, CAST(CASE WHEN b.f IS NULL THEN 1
      |    WHEN ${fcase(fs, "t")} <= b.vb THEN 2
      |    ELSE 3 END AS BIGINT) AS node
      |  FROM $src t LEFT JOIN b1ok$x b ON true),
      |${out}_b AS (
      |  SELECT a.doc_id, a.y, CAST(CASE WHEN b.node IS NULL THEN a.node
      |    WHEN ${fcase(fs, "a")} <= b.vb
      |    THEN 2 * a.node ELSE 2 * a.node + 1 END AS BIGINT) AS leaf
      |  FROM ${out}_a a LEFT JOIN b2ok$x b ON b.node = a.node),
      |$out AS MATERIALIZED (
      |  SELECT b.doc_id, b.y,
      |    CAST(CASE WHEN 2 * l.tp > l.tn THEN 1 ELSE 0 END AS BIGINT) AS p
      |  FROM ${out}_b b JOIN leaves$x l ON l.node = b.leaf)""".stripMargin

  private[queries] val oraclePrelude =
    featureCtes + trainCtes("", "doc_id % 2 = 0")

  val entries: Seq[(String, Fn, String)] = Seq(

    // -- the trained tree itself: internal nodes (feature, threshold,
    //    node totals, error before the split) + leaves (majority pred) ---
    ("q_cart_train",
      (s: SparkSession, d: String) =>
        graft.ops.Cart.treeDF(s, train(s, d)).orderBy("node"),
      oraclePrelude +
        """
          |SELECT CAST(1 AS BIGINT) AS node, f AS feature, vb AS threshold,
          |  tn AS n, tp AS n_pos, tn - greatest(tp, tn - tp) AS err,
          |  CAST(-1 AS BIGINT) AS pred
          |FROM b1ok
          |UNION ALL
          |SELECT node, f, vb, tn, tp, tn - greatest(tp, tn - tp), -1 FROM b2ok
          |UNION ALL
          |SELECT node, CAST(NULL AS VARCHAR), CAST(-1 AS BIGINT), tn, tp,
          |  tn - greatest(tp, tn - tp),
          |  CAST(CASE WHEN 2 * tp > tn THEN 1 ELSE 0 END AS BIGINT)
          |FROM leaves
          |ORDER BY node""".stripMargin),

    // -- held-out classification: odd doc_ids routed through the trained
    //    tree (pure when-chain, no join), graded as the confusion matrix -
    ("q_cart_classify",
      (s: SparkSession, d: String) =>
        graft.ops.Cart.classify(
            featured(s, d).filter(pmod(col("doc_id"), lit(2)) === 1), train(s, d))
          .groupBy("y", "pred").agg(count(lit(1)).as("n"))
          .orderBy("y", "pred"),
      oraclePrelude +
        ",\nte AS MATERIALIZED (SELECT * FROM lab WHERE doc_id % 2 = 1)" +
        routeCtes("", "predc") +
        """
          |SELECT y, p AS pred, CAST(count(*) AS BIGINT) AS n
          |FROM predc GROUP BY 1, 2 ORDER BY y, pred""".stripMargin),

    // -- BAGGED FOREST under the gate: three depth-2 trees, each trained
    //    on a content-addressed 2/3 subbag (md5(doc_id) mod 3 — the house
    //    hex→int convention, so DuckDB draws the identical bags), held-out
    //    docs classified by 2-of-3 majority vote. The oracle instantiates
    //    the two-level training unroll once per bag (suffixed CTEs) and
    //    re-votes — ensemble training, per-tree inference and the vote all
    //    under one hash compare. Training scans are per-bag passes over
    //    the same frame; inference is three stacked when-chains, still
    //    shuffle-free ------------------------------------------------------
    ("q_forest_classify",
      (s: SparkSession, d: String) => {
        // one feature-extraction scan: trainings and routings below replay
        // the frame 6+ times
        val feats = featured(s, d).localCheckpoint(true)
        val trees = baseTrees(feats.filter(pmod(col("doc_id"), lit(2)) === 0))
        val test = feats.filter(pmod(col("doc_id"), lit(2)) === 1)
        forestVote(test, trees, "pred")
          .groupBy("y", "pred").agg(count(lit(1)).as("n"))
          .orderBy("y", "pred")
      },
      featureCtes +
        (0 until 3).map(b => trainCtes(s"_$b",
          s"doc_id % 2 = 0 AND ${bagSql(b, "<>")}")).mkString +
        ",\nte AS MATERIALIZED (SELECT * FROM lab WHERE doc_id % 2 = 1)" +
        (0 until 3).map(b => routeCtes(s"_$b", s"pred_$b")).mkString +
        """
          |SELECT p0.y AS y,
          |  CAST(CASE WHEN p0.p + p1.p + p2.p >= 2 THEN 1 ELSE 0 END AS BIGINT) AS pred,
          |  CAST(count(*) AS BIGINT) AS n
          |FROM pred_0 p0 JOIN pred_1 p1 USING (doc_id) JOIN pred_2 p2 USING (doc_id)
          |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),

    // -- STACKED CART (the sixth trained model): a depth-2 meta-tree
    //    learns when to trust the bagged forest. Base layer = the three
    //    subbagged trees above; the meta-feature p_base for each TRAINING
    //    row is its OUT-OF-BAG prediction — with md5(doc_id) mod 3 bags
    //    every training row is out-of-bag for exactly one tree, so the
    //    meta-feature is leak-free without a second holdout (a gradient-
    //    boosted variant would need RATIONAL instance weights and lose
    //    integer-exactness; stacking keeps every split objective BIGINT).
    //    Meta-tree trains on (f_chars, f_e, p_base); at inference p_base
    //    is the forest's 2-of-3 vote. The oracle instantiates the training
    //    unroll FOUR times (three bags + the meta level over the OOB
    //    relation), routes the held-out split through base trees and
    //    meta-tree alike, and the gate hash-compares the (y, p_base,
    //    pred) confusion cube — base votes AND meta corrections both
    //    proven. Same scale shape as the forest: per-level bounded-count
    //    shuffles for training, stacked when-chains (zero shuffle) for
    //    inference -------------------------------------------------------
    ("q_stacked_classify",
      (s: SparkSession, d: String) => {
        val feats = featured(s, d).localCheckpoint(true)
        val trainAll = feats.filter(pmod(col("doc_id"), lit(2)) === 0)
        val trees = baseTrees(trainAll)
        // OOB meta-feature: route each training row through the ONE tree
        // whose bag excluded it
        val withBag = trainAll.withColumn("__bag", bagCol)
        val oob = (0 until 3).map(b =>
            graft.ops.Cart.classify(withBag.filter(col("__bag") === b),
              trees(b)).withColumnRenamed("pred", "p_base"))
          .reduce(_.unionByName(_))
        val metaFeatures = Seq("f_chars", "f_e", "p_base")
        val meta = graft.ops.Cart.train(oob, metaFeatures, "y",
          depth = 2, maxBins = 32)
        // inference: forest vote feeds the meta-tree's p_base input
        val test = feats.filter(pmod(col("doc_id"), lit(2)) === 1)
        val voted = forestVote(test, trees, "p_base")
        graft.ops.Cart.classify(voted, meta)
          .groupBy("y", "p_base", "pred").agg(count(lit(1)).as("n"))
          .orderBy("y", "p_base", "pred")
      },
      featureCtes +
        (0 until 3).map(b => trainCtes(s"_$b",
          s"doc_id % 2 = 0 AND ${bagSql(b, "<>")}")).mkString +
        ",\nte AS MATERIALIZED (SELECT * FROM lab WHERE doc_id % 2 = 1)" +
        (0 until 3).map(b => routeCtes(s"_$b", s"pred_$b")).mkString +
        (0 until 3).map(b =>
          s""",
            |trb_$b AS (SELECT * FROM lab WHERE doc_id % 2 = 0
            |  AND ${bagSql(b, "=")})""".stripMargin +
            routeCtes(s"_$b", s"oobp_$b", s"trb_$b")).mkString +
        """,
          |oobsrc AS MATERIALIZED (
          |  SELECT l.doc_id, l.f_chars, l.f_e, p.p AS p_base, l.y
          |  FROM lab l JOIN (SELECT * FROM oobp_0 UNION ALL
          |                   SELECT * FROM oobp_1 UNION ALL
          |                   SELECT * FROM oobp_2) p USING (doc_id))""".stripMargin +
        trainCtes("_m", "true", Seq("f_chars", "f_e", "p_base"), "oobsrc") +
        """,
          |te_m AS MATERIALIZED (
          |  SELECT te.doc_id, te.y, te.f_chars, te.f_e,
          |    CAST(CASE WHEN p0.p + p1.p + p2.p >= 2 THEN 1 ELSE 0 END AS BIGINT) AS p_base
          |  FROM te JOIN pred_0 p0 USING (doc_id)
          |          JOIN pred_1 p1 USING (doc_id)
          |          JOIN pred_2 p2 USING (doc_id))""".stripMargin +
        routeCtes("_m", "pred_m", "te_m", Seq("f_chars", "f_e", "p_base")) +
        """
          |SELECT pm.y AS y, tm.p_base AS p_base, pm.p AS pred,
          |  CAST(count(*) AS BIGINT) AS n
          |FROM pred_m pm JOIN te_m tm USING (doc_id)
          |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin),

    // -- K-FOLD CROSS-VALIDATION (k=3) under the gate: the model-selection
    //    harness itself, not another model. Folds are the md5 mod-3 bags
    //    over the WHOLE corpus; fold f's tree trains on the other two
    //    folds and classifies fold f, and the gate hash-compares the
    //    per-fold confusion matrices — so fold assignment, three
    //    trainings, and three routings are all proven at once. At scale
    //    each fold's training is the same bounded-shuffle shape as
    //    q_cart_train (≤ nodes×features×bins count rows per level) and
    //    the k passes are independent jobs over the same cached frame ----
    ("q_cart_cv",
      (s: SparkSession, d: String) => {
        val withFold = featured(s, d).withColumn("__fold", bagCol)
          .localCheckpoint(true)
        // the three fold-complement trainings run in ONE trainMany pass
        val trees = graft.ops.Cart.trainMany(withFold,
          (0 until 3).map(f => col("__fold") =!= f), features, "y",
          depth = 2, maxBins = 32)
        (0 until 3).map { f =>
            graft.ops.Cart.classify(withFold.filter(col("__fold") === f),
                trees(f))
              .withColumn("fold", lit(f.toLong))
          }
          .reduce(_.unionByName(_))
          .groupBy("fold", "y", "pred").agg(count(lit(1)).as("n"))
          .orderBy("fold", "y", "pred")
      },
      featureCtes +
        (0 until 3).map(f => trainCtes(s"_$f", bagSql(f, "<>"))).mkString +
        (0 until 3).map(f =>
          s",\nfold_$f AS (SELECT * FROM lab WHERE ${bagSql(f, "=")})" +
            routeCtes(s"_$f", s"cvp_$f", s"fold_$f")).mkString +
        """
          |SELECT fold, y, pred, CAST(count(*) AS BIGINT) AS n FROM (
          |  SELECT CAST(0 AS BIGINT) AS fold, y, p AS pred FROM cvp_0
          |  UNION ALL SELECT 1, y, p FROM cvp_1
          |  UNION ALL SELECT 2, y, p FROM cvp_2)
          |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin))
}
