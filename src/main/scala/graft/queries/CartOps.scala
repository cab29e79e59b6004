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

  private val features = Seq("f_a", "f_chars", "f_e", "f_words")

  /** doc_id, the four integer features, and the noisy label y. */
  private def featured(s: SparkSession, d: String): DataFrame =
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

  private def train(s: SparkSession, d: String): Seq[graft.ops.Cart.TreeNode] =
    graft.ops.Cart.train(
      featured(s, d).filter(pmod(col("doc_id"), lit(2)) === 0),
      features, "y", depth = 2, maxBins = 32)

  /** The shared oracle prelude: features, label, train split, melt,
    * per-feature bin widths, and the level-1 split choice.
    */
  private val oraclePrelude =
    """WITH f0 AS (
      |  SELECT doc_id,
      |    CAST(length(text) - length(replace(text, 'a', '')) AS BIGINT) AS f_a,
      |    CAST(length(text) AS BIGINT) AS f_chars,
      |    CAST(length(text) - length(replace(text, 'e', '')) AS BIGINT) AS f_e,
      |    CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS f_words
      |  FROM documents),
      |lab AS (
      |  SELECT doc_id, f_a, f_chars, f_e, f_words,
      |    CAST(CASE WHEN (f_chars > 310 AND f_e > 30) <> (doc_id % 13 = 0)
      |         THEN 1 ELSE 0 END AS BIGINT) AS y
      |  FROM f0),
      |tr AS (SELECT * FROM lab WHERE doc_id % 2 = 0),
      |m1 AS (
      |  SELECT doc_id, 'f_a' AS f, f_a AS v, y FROM tr UNION ALL
      |  SELECT doc_id, 'f_chars', f_chars, y FROM tr UNION ALL
      |  SELECT doc_id, 'f_e', f_e, y FROM tr UNION ALL
      |  SELECT doc_id, 'f_words', f_words, y FROM tr),
      |wd AS (SELECT f, CAST(min(v) AS BIGINT) AS mn,
      |         CAST(greatest(1, (max(v) - min(v) + 32) // 32) AS BIGINT) AS w
      |       FROM m1 GROUP BY 1),
      |c1 AS (SELECT m1.f, mn + ((v - mn) // w) * w + (w - 1) AS vb,
      |         CAST(count(*) AS BIGINT) AS n, CAST(sum(y) AS BIGINT) AS pos
      |       FROM m1 JOIN wd USING (f) GROUP BY 1, 2),
      |s1 AS (SELECT f, vb,
      |         CAST(sum(n) OVER (PARTITION BY f ORDER BY vb) AS BIGINT) AS cn,
      |         CAST(sum(pos) OVER (PARTITION BY f ORDER BY vb) AS BIGINT) AS cp,
      |         CAST(sum(n) OVER (PARTITION BY f) AS BIGINT) AS tn,
      |         CAST(sum(pos) OVER (PARTITION BY f) AS BIGINT) AS tp
      |       FROM c1),
      |e1 AS (SELECT f, vb, tn, tp,
      |         (cn - greatest(cp, cn - cp)) +
      |         ((tn - cn) - greatest(tp - cp, (tn - cn) - (tp - cp))) AS e
      |       FROM s1 WHERE cn < tn),
      |b1 AS (SELECT f, vb, e, tn, tp FROM e1
      |       QUALIFY row_number() OVER (ORDER BY e, f, vb) = 1),
      |b1ok AS (SELECT * FROM b1 WHERE e < tn - greatest(tp, tn - tp)),
      |a2 AS (
      |  SELECT t.*, CAST(CASE WHEN b.f IS NULL THEN 1
      |    WHEN (CASE b.f WHEN 'f_a' THEN t.f_a WHEN 'f_chars' THEN t.f_chars
      |          WHEN 'f_e' THEN t.f_e ELSE t.f_words END) <= b.vb THEN 2
      |    ELSE 3 END AS BIGINT) AS node
      |  FROM tr t LEFT JOIN b1ok b ON true),
      |m2 AS (
      |  SELECT node, 'f_a' AS f, f_a AS v, y FROM a2 UNION ALL
      |  SELECT node, 'f_chars', f_chars, y FROM a2 UNION ALL
      |  SELECT node, 'f_e', f_e, y FROM a2 UNION ALL
      |  SELECT node, 'f_words', f_words, y FROM a2),
      |c2 AS (SELECT node, m2.f, mn + ((v - mn) // w) * w + (w - 1) AS vb,
      |         CAST(count(*) AS BIGINT) AS n, CAST(sum(y) AS BIGINT) AS pos
      |       FROM m2 JOIN wd USING (f) GROUP BY 1, 2, 3),
      |s2 AS (SELECT node, f, vb,
      |         CAST(sum(n) OVER (PARTITION BY node, f ORDER BY vb) AS BIGINT) AS cn,
      |         CAST(sum(pos) OVER (PARTITION BY node, f ORDER BY vb) AS BIGINT) AS cp,
      |         CAST(sum(n) OVER (PARTITION BY node, f) AS BIGINT) AS tn,
      |         CAST(sum(pos) OVER (PARTITION BY node, f) AS BIGINT) AS tp
      |       FROM c2),
      |e2 AS (SELECT node, f, vb, tn, tp,
      |         (cn - greatest(cp, cn - cp)) +
      |         ((tn - cn) - greatest(tp - cp, (tn - cn) - (tp - cp))) AS e
      |       FROM s2 WHERE cn < tn),
      |b2 AS (SELECT node, f, vb, e, tn, tp FROM e2
      |       QUALIFY row_number() OVER (PARTITION BY node ORDER BY e, f, vb) = 1),
      |b2ok AS (SELECT * FROM b2
      |         WHERE node <> 1 AND e < tn - greatest(tp, tn - tp)),
      |a3 AS (
      |  SELECT a2.y, CAST(CASE WHEN b.node IS NULL THEN a2.node
      |    WHEN (CASE b.f WHEN 'f_a' THEN a2.f_a WHEN 'f_chars' THEN a2.f_chars
      |          WHEN 'f_e' THEN a2.f_e ELSE a2.f_words END) <= b.vb
      |    THEN 2 * a2.node ELSE 2 * a2.node + 1 END AS BIGINT) AS leaf
      |  FROM a2 LEFT JOIN b2ok b ON b.node = a2.node),
      |leaves AS (SELECT leaf AS node, CAST(count(*) AS BIGINT) AS tn,
      |             CAST(sum(y) AS BIGINT) AS tp
      |           FROM a3 GROUP BY 1)""".stripMargin

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
        """,
          |te AS (SELECT * FROM lab WHERE doc_id % 2 = 1),
          |t2 AS (
          |  SELECT t.*, CAST(CASE WHEN b.f IS NULL THEN 1
          |    WHEN (CASE b.f WHEN 'f_a' THEN t.f_a WHEN 'f_chars' THEN t.f_chars
          |          WHEN 'f_e' THEN t.f_e ELSE t.f_words END) <= b.vb THEN 2
          |    ELSE 3 END AS BIGINT) AS node
          |  FROM te t LEFT JOIN b1ok b ON true),
          |t3 AS (
          |  SELECT t2.y, CAST(CASE WHEN b.node IS NULL THEN t2.node
          |    WHEN (CASE b.f WHEN 'f_a' THEN t2.f_a WHEN 'f_chars' THEN t2.f_chars
          |          WHEN 'f_e' THEN t2.f_e ELSE t2.f_words END) <= b.vb
          |    THEN 2 * t2.node ELSE 2 * t2.node + 1 END AS BIGINT) AS leaf
          |  FROM t2 LEFT JOIN b2ok b ON b.node = t2.node),
          |pr AS (SELECT node,
          |         CAST(CASE WHEN 2 * tp > tn THEN 1 ELSE 0 END AS BIGINT) AS pred
          |       FROM leaves)
          |SELECT y, pred, CAST(count(*) AS BIGINT) AS n
          |FROM t3 JOIN pr ON pr.node = t3.leaf
          |GROUP BY 1, 2 ORDER BY y, pred""".stripMargin))
}
