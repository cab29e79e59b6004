package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact model-evaluation statistics as integer aggregates — the
  * eval half of a training pipeline (the trainers are Cart/Lloyd/Bpe/
  * NaiveBayes/Graph). Every statistic here is carried as exact BIGINT
  * numerator/denominator pairs instead of floats, so results are
  * reduction-order-independent, bit-reproducible across engines and
  * reruns, and SQL-replayable under the oracle gate — the same
  * determinism contract as [[Graph.pageRank]]'s integer mass units.
  */
object Eval {

  /** Exact ROC AUC of `scoreCol` against binary `labelCol` (0/1), by the
    * Mann–Whitney rank-sum identity with midrank tie handling — doubled
    * throughout to stay integral: returns one row
    * (n_pos, n_neg, u2, den) where u2 = 2·U and den = 2·n_pos·n_neg, so
    * AUC = u2/den exactly (ties contribute half weight, the standard
    * definition).
    *
    * Shape: one groupBy(score) over the corpus (the only corpus-sized
    * shuffle), then a running sum over the DISTINCT-score table ordered
    * by score. That window is partitionless but runs over distinct
    * scores, not rows — scores are integer features (or pre-binned
    * model outputs), so the windowed table is bounded regardless of
    * corpus size; bin continuous scores first to keep it that way.
    */
  def aucExact(df: DataFrame, scoreCol: String, labelCol: String): DataFrame = {
    // NULL scores are excluded (unrankable): Spark sorts NULLS FIRST and
    // most SQL engines NULLS LAST, so keeping them would make the running
    // sum engine-dependent — replayers must filter the same way
    val byScore = df.filter(col(scoreCol).isNotNull)
      .groupBy(col(scoreCol).as("s"))
      .agg(count(lit(1)).as("n"), sum(col(labelCol)).as("pos"))
    val w = Window.orderBy("s").rowsBetween(Window.unboundedPreceding, -1)
    // midranks doubled: every row tied at s has 2·rank = 2·below + n + 1
    val ranked = byScore
      .withColumn("below", coalesce(sum(col("n")).over(w), lit(0L)))
      .select((col("pos") * (lit(2L) * col("below") + col("n") + lit(1L)))
          .as("r2pos"),
        col("n"), col("pos"))
    ranked.agg(
        sum(col("pos")).as("n_pos"),
        sum(col("n") - col("pos")).as("n_neg"),
        sum(col("r2pos")).as("r2"))
      .select(col("n_pos"), col("n_neg"),
        (col("r2") - col("n_pos") * (col("n_pos") + lit(1L))).as("u2"),
        (lit(2L) * col("n_pos") * col("n_neg")).as("den"))
  }

  /** The full precision/recall operating curve as exact integers: one row
    * per distinct score s with the confusion counts of the classifier
    * "predict positive iff score >= s" — (threshold, tp, fp, fn, tn).
    * Precision/recall/F1 at any threshold derive exactly from the row;
    * no float division is baked in.
    *
    * Same shape as [[aucExact]]: one corpus-sized groupBy(score), then a
    * descending running sum over the bounded distinct-score table. NULL
    * scores are excluded for the same cross-engine ordering reason.
    */
  def prCurve(df: DataFrame, scoreCol: String, labelCol: String): DataFrame = {
    val byScore = df.filter(col(scoreCol).isNotNull)
      .groupBy(col(scoreCol).as("threshold"))
      .agg(count(lit(1)).as("n"), sum(col(labelCol)).as("pos"))
      .localCheckpoint(true) // read twice: totals + the cumulative pass
    val totals = byScore.agg(sum(col("pos")).as("npos"),
      sum(col("n") - col("pos")).as("nneg"))
    val w = Window.orderBy(col("threshold").desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    byScore
      .withColumn("tp", sum(col("pos")).over(w))
      .withColumn("pp", sum(col("n")).over(w))
      .crossJoin(broadcast(totals)) // 1 scalar row
      .select(col("threshold"), col("tp"),
        (col("pp") - col("tp")).as("fp"),
        (col("npos") - col("tp")).as("fn"),
        (col("nneg") - (col("pp") - col("tp"))).as("tn"))
  }

  /** Cohen's kappa between two categorical prediction columns, exact:
    * one row (total, agree, pe_num, kappa_num, kappa_den) where
    * pe_num = Σ_c rowmarginal_c · colmarginal_c and
    * kappa = kappa_num / kappa_den = (agree·total − pe_num) /
    * (total² − pe_num). All BIGINT; degenerate total agreement by
    * chance (kappa_den = 0) is left to the caller.
    *
    * Shape: one groupBy(a, b) confusion matrix (key space = label
    * pairs, tiny), marginals and the Σ product derived from it — the
    * corpus is scanned once.
    */
  def cohensKappa(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val cm = df.groupBy(col(aCol).as("a"), col(bCol).as("b"))
      .agg(count(lit(1)).as("n"))
      .localCheckpoint(true) // read thrice below; the frame is label²-sized
    val totals = cm.agg(sum(col("n")).as("total"),
      sum(when(col("a") === col("b"), col("n")).otherwise(0L)).as("agree"))
    val ra = cm.groupBy("a").agg(sum(col("n")).as("na"))
    val rb = cm.groupBy("b").agg(sum(col("n")).as("nb"))
    val pe = ra.join(rb, col("a") === col("b"))
      .agg(coalesce(sum(col("na") * col("nb")), lit(0L)).as("pe_num"))
    totals.crossJoin(pe) // 1 row × 1 row
      .select(col("total"), col("agree"), col("pe_num"),
        (col("agree") * col("total") - col("pe_num")).as("kappa_num"),
        (col("total") * col("total") - col("pe_num")).as("kappa_den"))
  }
}
