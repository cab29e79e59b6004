package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Exact model-evaluation statistics as integer aggregates — the
  * eval half of a training pipeline (the trainers are Cart/Lloyd/Bpe/
  * NaiveBayes/Graph). Every statistic here is carried as exact BIGINT
  * numerator/denominator pairs instead of floats, so results are
  * reduction-order-independent, bit-reproducible across engines and
  * reruns, and SQL-replayable under the oracle gate — the same
  * determinism contract as [[Graph.pageRank]]'s integer mass units.
  */
object Eval {

  /** Distributed running sums of `sumCols` over `df` ordered by
    * `orderCol` — the two-phase prefix sum (per-partition totals, a
    * #partitions-row offset map on the driver, partition-local
    * accumulation), NOT a global window: no row ever funnels through one
    * partition, so the shape survives any input size even though the
    * callers here feed it distinct-score tables. `orderCol` must be a
    * total order (the callers' groupBy guarantees distinctness); the
    * recompute-determinism caveat on Curation.takeTokenBudget applies the
    * same way. Appends one LongType column per entry of `outCols`,
    * exclusive (sum of strictly-preceding rows) or inclusive.
    */
  private def runningSums(df: DataFrame, orderCol: String, descending: Boolean,
      sumCols: Seq[String], outCols: Seq[String],
      inclusive: Boolean): DataFrame = {
    val spark = df.sparkSession
    val key = if (descending) col(orderCol).desc else col(orderCol).asc
    val ordered = df.repartitionByRange(key).sortWithinPartitions(key)
    val idxs = sumCols.map(ordered.schema.fieldIndex).toArray
    val rdd = ordered.rdd
    def cell(r: Row, i: Int): Long = if (r.isNullAt(i)) 0L else r.getLong(i)
    val partSums = rdd.mapPartitionsWithIndex { (pid, it) =>
      val s = new Array[Long](idxs.length)
      it.foreach(r => idxs.indices.foreach(i => s(i) += cell(r, idxs(i))))
      Iterator((pid, s))
    }.collect().toMap
    val offsets = (0 until rdd.getNumPartitions)
      .scanLeft(new Array[Long](idxs.length)) { (acc, p) =>
        val s = partSums.getOrElse(p, new Array[Long](idxs.length))
        acc.indices.map(i => acc(i) + s(i)).toArray
      }.init.toArray
    val bOff = spark.sparkContext.broadcast(offsets)
    val outSchema = outCols.foldLeft(ordered.schema)(
      (sc, c) => sc.add(c, LongType, nullable = false))
    val out = rdd.mapPartitionsWithIndex { (pid, it) =>
      val acc = bOff.value(pid).clone()
      it.map { r =>
        val pre = acc.clone()
        idxs.indices.foreach(i => acc(i) += cell(r, idxs(i)))
        Row.fromSeq(r.toSeq ++ (if (inclusive) acc.toSeq else pre.toSeq))
      }
    }
    spark.createDataFrame(out, outSchema)
  }

  /** Exact ROC AUC of `scoreCol` against binary `labelCol` (0/1), by the
    * Mann–Whitney rank-sum identity with midrank tie handling — doubled
    * throughout to stay integral: returns one row
    * (n_pos, n_neg, u2, den) where u2 = 2·U and den = 2·n_pos·n_neg, so
    * AUC = u2/den exactly (ties contribute half weight, the standard
    * definition).
    *
    * Shape: one groupBy(score) over the corpus (the only corpus-sized
    * shuffle), then a two-phase prefix sum over the DISTINCT-score
    * table — range-partitioned, never a global window, so even an
    * unexpectedly huge score domain (skip binning at your peril) cannot
    * funnel through one partition.
    */
  def aucExact(df: DataFrame, scoreCol: String, labelCol: String): DataFrame = {
    // NULL scores are excluded (unrankable): Spark sorts NULLS FIRST and
    // most SQL engines NULLS LAST, so keeping them would make the running
    // sum engine-dependent — replayers must filter the same way
    val byScore = df.filter(col(scoreCol).isNotNull)
      .groupBy(col(scoreCol).as("s"))
      .agg(count(lit(1)).as("n"), sum(col(labelCol)).cast("long").as("pos"))
      .localCheckpoint(true) // pin: runningSums reads it across jobs
    // midranks doubled: every row tied at s has 2·rank = 2·below + n + 1
    val ranked = runningSums(byScore, "s", descending = false,
        Seq("n"), Seq("below"), inclusive = false)
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

  /** Deterministic leave-one-group-out JACKKNIFE standard error for the
    * exact AUC — the SQL-replayable variance estimate bootstrap CIs can't
    * give (resampling is rand-gated). Rows are assigned to `nGroups`
    * deterministic groups by `groupCol % nGroups`; for each group g the
    * full Mann–Whitney AUC_{−g} over ALL OTHER rows is computed EXACTLY
    * by inclusion–exclusion on doubled pair counts — never by re-scanning
    * the corpus per group:
    *
    *   u2_{−g} = u2_total − A_g − B_g + C_g, where A_g counts pairs whose
    *   POSITIVE is in g (Σ_s pos_{g,s}·(2·negbelow_s + neg_s)), B_g pairs
    *   whose NEGATIVE is in g (Σ_s neg_{g,s}·(2·posabove_s + pos_s)), and
    *   C_g the doubly-subtracted within-group pairs
    *   (Σ_s pos_{g,s}·(2·negbelow_{g,s} + neg_{g,s})).
    *
    * Then jack_se = sqrt((G−1)/G · Σ_g (auc_{−g} − mean)²) with the
    * q_jackknife_mean dec6 convention (each auc_{−g} and each squared
    * deviation rounded to 6 places and summed as DECIMAL(18,6)).
    *
    * Shape: ONE corpus-sized groupBy(grp, score); everything after runs
    * on the bounded (nGroups × |distinct scores|) table — a two-phase
    * global prefix sum (never a partitionless window), one grp-PARTITIONED
    * window for the within-group prefix, a broadcast join of the
    * distinct-score stats, and G-row scalar algebra. NULL scores excluded
    * as in [[aucExact]]. One row:
    * (n_pos, n_neg, auc, n_groups, jack_se).
    */
  def aucJackknife(df: DataFrame, scoreCol: String, labelCol: String,
      groupCol: String, nGroups: Int = 16): DataFrame = {
    require(nGroups >= 2, "aucJackknife: need nGroups >= 2")
    aucJackknifeBy(df, scoreCol, labelCol,
      pmod(col(groupCol), lit(nGroups.toLong)))
  }

  /** [[aucJackknife]] STRATIFIED by an arbitrary grouping expression —
    * leave-one-SOURCE-out instead of leave-one-hash-shard-out: the
    * variance estimate that answers "how much does the AUC lean on any
    * single corpus source", the deployment question hash groups
    * deliberately average away. Group count = distinct values of
    * `groupExpr` (must be ≥ 2 and no group may hold every positive or
    * every negative — the loud-guard contract).
    */
  def aucJackknifeBy(df: DataFrame, scoreCol: String, labelCol: String,
      groupExpr: org.apache.spark.sql.Column,
      maxGroups: Long = 10000L): DataFrame = {
    // the (groups × scores) frame below is PINNED (localCheckpoint) and
    // every downstream step is sized by it: a high-cardinality grouping
    // (user_id instead of a source/shard key) would make it corpus-sized
    // — the round-12 corpus-pinning OOM class. Loud guard BEFORE anything
    // materializes; the old pmod form prevented this structurally.
    val nGroups = df.select(groupExpr.as("grp")).distinct().count()
    require(nGroups >= 2 && nGroups <= maxGroups,
      s"aucJackknifeBy: $nGroups distinct groups (need 2..$maxGroups) — " +
        "jackknife groups must be shard/source-grained, not row-grained; " +
        "raise maxGroups deliberately if the group table is truly bounded")
    val byGS = df.filter(col(scoreCol).isNotNull)
      .groupBy(groupExpr.as("grp"),
        col(scoreCol).as("s"))
      .agg(count(lit(1)).as("n_gs"), sum(col(labelCol)).cast("long").as("pos_gs"))
      .withColumn("neg_gs", col("n_gs") - col("pos_gs"))
      .localCheckpoint(true) // bounded by the guard: groups × |scores|
    val byS = byGS.groupBy("s")
      .agg(sum(col("n_gs")).as("n"), sum(col("pos_gs")).as("pos"))
      .withColumn("neg", col("n") - col("pos"))
      .localCheckpoint(true) // bounded distinct-score table
    val totals = byS.agg(sum(col("pos")).as("n_pos"), sum(col("neg")).as("n_neg"))
    val preT = runningSums(byS, "s", descending = false,
        Seq("neg", "pos"), Seq("negbelow", "posbelow"), inclusive = false)
      .crossJoin(broadcast(totals)) // 1 scalar row
      .select(col("s"), col("pos"), col("neg"), col("negbelow"),
        (col("n_pos") - col("posbelow") - col("pos")).as("posabove"))
      .localCheckpoint(true) // bounded, read by u2 + the group join
    val u2 = preT.agg(sum(col("pos") * (lit(2L) * col("negbelow") + col("neg")))
      .as("u2"))
    val wg = org.apache.spark.sql.expressions.Window
      .partitionBy("grp").orderBy("s")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val perG = byGS
      .withColumn("negbelow_gs", coalesce(sum(col("neg_gs")).over(wg), lit(0L)))
      .join(broadcast(preT.withColumnRenamed("pos", "pos_s")
        .withColumnRenamed("neg", "neg_s")), Seq("s"))
      .groupBy("grp")
      .agg(sum(col("pos_gs")).as("pos_g"), sum(col("neg_gs")).as("neg_g"),
        sum(col("pos_gs") * (lit(2L) * col("negbelow") + col("neg_s"))).as("a_g"),
        sum(col("neg_gs") * (lit(2L) * col("posabove") + col("pos_s"))).as("b_g"),
        sum(col("pos_gs") * (lit(2L) * col("negbelow_gs") + col("neg_gs"))).as("c_g"))
    val dec6 = org.apache.spark.sql.types.DecimalType(18, 6)
    // a group holding ALL positives (or ALL negatives) makes its
    // leave-one-out AUC undefined (0 pairs remain): without this guard
    // the double division yields Infinity, the DECIMAL cast silently
    // NULLs it, and jack_se comes out biased with no error — fail loud
    // instead (pin the bounded G-row frame first: it is read here, by
    // the scoring join, and recomputing it re-runs the corpus groupBy)
    val perGP = perG.localCheckpoint(true)
    val degenerate = perGP.crossJoin(broadcast(totals))
      .filter(col("pos_g") === col("n_pos") || col("neg_g") === col("n_neg"))
      .limit(1).collect()
    require(degenerate.isEmpty,
      "aucJackknife: a group holds every positive (or every negative) " +
        "row — leave-one-group-out AUC is undefined there; use more or " +
        "finer-grained groups")
    val aj = perGP.crossJoin(broadcast(totals)).crossJoin(broadcast(u2))
      .select(round((col("u2") - col("a_g") - col("b_g") + col("c_g"))
          .cast("double") /
        (lit(2L) * (col("n_pos") - col("pos_g")) *
          (col("n_neg") - col("neg_g"))).cast("double"), 6)
        .cast(dec6).as("aucg"))
    jackknifeTail(aj, "aucg")
      .crossJoin(broadcast(totals)).crossJoin(broadcast(u2))
      .select(col("n_pos"), col("n_neg"),
        round(col("u2").cast("double") /
          (lit(2L) * col("n_pos") * col("n_neg")).cast("double"), 6).as("auc"),
        col("n_groups"), col("jack_se"))
  }

  /** The full precision/recall operating curve as exact integers: one row
    * per distinct score s with the confusion counts of the classifier
    * "predict positive iff score >= s" — (threshold, tp, fp, fn, tn).
    * Precision/recall/F1 at any threshold derive exactly from the row;
    * no float division is baked in.
    *
    * Same shape as [[aucExact]]: one corpus-sized groupBy(score), then a
    * descending two-phase prefix sum over the distinct-score table. NULL
    * scores are excluded for the same cross-engine ordering reason.
    */
  /** Shared jackknife tail: given a G-row frame of DECIMAL(18,6)
    * leave-one-group-out statistics, return one row
    * (n_groups, jack_se) with the q_jackknife_mean dec6 convention
    * (dec6 mean, dec6-rounded squared deviations summed as decimal,
    * sqrt((G−1)/G·ssq) rounded dec6). Pins the bounded input (read for
    * the mean and again for the squares).
    */
  private[ops] def jackknifeTail(aj0: DataFrame, statCol: String): DataFrame = {
    val dec6 = org.apache.spark.sql.types.DecimalType(18, 6)
    val aj = aj0.localCheckpoint(true)
    val md = aj.agg(count(lit(1)).as("ng"),
      round(sum(col(statCol)).cast("double") /
        count(lit(1)).cast("double"), 6).as("adot"))
    aj.crossJoin(broadcast(md))
      .agg(first(col("ng")).as("n_groups"),
        sum(round((col(statCol).cast("double") - col("adot")) *
            (col(statCol).cast("double") - col("adot")), 6).cast(dec6))
          .as("ssq"))
      .select(col("n_groups"),
        round(sqrt((col("n_groups") - 1L).cast("double") /
          col("n_groups").cast("double") * col("ssq").cast("double")), 6)
          .as("jack_se"))
  }

  /** Deterministic leave-one-group-out JACKKNIFE standard error for the
    * exact GINI coefficient — [[aucJackknife]]'s inclusion–exclusion
    * pattern applied to the other canonical pair-count statistic:
    * G = S / (n·T) where S = Σ_{i<j} |x_i − x_j| (the mean-absolute-
    * difference form; identical to the rank formula [[giniExact]] uses).
    * Doubled throughout to stay integral (2S carried in DECIMAL(38,0) —
    * pair sums overflow BIGINT on a large corpus):
    *
    *   for a row at value v, f(v) = v·cntBelow − sumBelow + sumAbove −
    *   v·cntAbove is its summed |diff| against ALL rows, so
    *   2S = Σ_v cnt_v·f(v). With A_g = Σ_{i∈g} f(x_i) (every pair with a
    *   g-side, within-g pairs counted twice) and B_g the same sum against
    *   group-local prefixes (= 2·within-g pairs):
    *   2S_{−g} = 2S − 2·A_g + B_g, and
    *   G_{−g} = 2S_{−g} / (2·(n − n_g)·(T − T_g)).
    *
    * Shape: one corpus groupBy(grp, value); then a two-phase global
    * prefix sum over the distinct-value table, one grp-PARTITIONED
    * window for the group-local prefixes, a broadcast join of the global
    * prefix stats, and G-row scalar algebra — never a partitionless
    * window, never a per-group corpus re-scan. Values must be
    * non-negative longs (revenue cents). One row:
    * (n_rows, sum_val, gini, n_groups, jack_se).
    */
  def giniJackknife(df: DataFrame, valCol: String, groupCol: String,
      nGroups: Int = 12): DataFrame = {
    require(nGroups >= 2, "giniJackknife: need nGroups >= 2")
    val dec38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val dec6 = org.apache.spark.sql.types.DecimalType(18, 6)
    val byGV = df.filter(col(valCol).isNotNull)
      .groupBy(pmod(col(groupCol), lit(nGroups.toLong)).as("grp"),
        col(valCol).cast("long").as("v"))
      .agg(count(lit(1)).as("c_gv"))
      .withColumn("s_gv", col("v") * col("c_gv"))
      .localCheckpoint(true) // bounded: nGroups × |distinct values|
    val byV = byGV.groupBy("v")
      .agg(sum(col("c_gv")).as("c"), sum(col("s_gv")).as("s"))
      .localCheckpoint(true) // bounded distinct-value table
    val totals = byV.agg(sum(col("c")).as("n_all"), sum(col("s")).as("t_all"))
    val preT = runningSums(byV, "v", descending = false,
        Seq("c", "s"), Seq("cb", "sb"), inclusive = false)
      .crossJoin(broadcast(totals)) // 1 scalar row
      .select(col("v"), col("c"), col("cb"), col("sb"),
        (col("n_all") - col("cb") - col("c")).as("ca"),
        (col("t_all") - col("sb") - col("s")).as("sa"))
      .localCheckpoint(true) // bounded, read by 2S + the group join
    // products in DECIMAL(38,0) BEFORE the subtraction — v·cb alone can
    // wrap a long on a large corpus, not just the Σ
    def fGlobal = col("v").cast(dec38) * col("cb") - col("sb") +
      col("sa") - col("v").cast(dec38) * col("ca")
    val s2 = preT.agg(sum(fGlobal * col("c")).as("s2"))
    val wg = org.apache.spark.sql.expressions.Window
      .partitionBy("grp").orderBy("v")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val gtot = org.apache.spark.sql.expressions.Window.partitionBy("grp")
    val withPre = byGV
      .withColumn("cbg", coalesce(sum(col("c_gv")).over(wg), lit(0L)))
      .withColumn("sbg", coalesce(sum(col("s_gv")).over(wg), lit(0L)))
      .withColumn("n_g", sum(col("c_gv")).over(gtot))
      .withColumn("t_g", sum(col("s_gv")).over(gtot))
      .join(broadcast(preT.select(col("v"), col("cb"), col("sb"),
        col("ca"), col("sa"))), Seq("v"))
    val fg = col("v").cast(dec38) * col("cbg") - col("sbg") +
      (col("t_g") - col("sbg") - col("s_gv")) -
      col("v").cast(dec38) * (col("n_g") - col("cbg") - col("c_gv"))
    val perG = withPre.groupBy("grp")
      .agg(first(col("n_g")).as("n_g"), first(col("t_g")).as("t_g"),
        sum(fGlobal * col("c_gv")).as("a_g"),
        sum(fg * col("c_gv")).as("b_g"))
      .localCheckpoint(true) // G rows, read by the guard + the scoring
    val degenerate = perG.crossJoin(broadcast(totals))
      .filter(col("n_g") === col("n_all") || col("t_g") === col("t_all"))
      .limit(1).collect()
    require(degenerate.isEmpty,
      "giniJackknife: a group holds every row (or all the mass) — " +
        "leave-one-group-out Gini is undefined there; use more groups")
    val aj = perG.crossJoin(broadcast(totals)).crossJoin(broadcast(s2))
      .select(round((col("s2") - lit(2) * col("a_g") + col("b_g"))
          .cast("double") /
        (lit(2.0) * (col("n_all") - col("n_g")).cast("double") *
          (col("t_all") - col("t_g")).cast("double")), 6)
        .cast(dec6).as("ginig"))
    jackknifeTail(aj, "ginig")
      .crossJoin(broadcast(totals)).crossJoin(broadcast(s2))
      .select(col("n_all").as("n_rows"), col("t_all").as("sum_val"),
        round(col("s2").cast("double") /
          (lit(2.0) * col("n_all").cast("double") *
            col("t_all").cast("double")), 6).as("gini"),
        col("n_groups"), col("jack_se"))
  }

  def prCurve(df: DataFrame, scoreCol: String, labelCol: String): DataFrame = {
    val byScore = df.filter(col(scoreCol).isNotNull)
      .groupBy(col(scoreCol).as("threshold"))
      .agg(count(lit(1)).as("n"), sum(col(labelCol)).cast("long").as("pos"))
      .localCheckpoint(true) // read twice: totals + the cumulative pass
    val totals = byScore.agg(sum(col("pos")).as("npos"),
      sum(col("n") - col("pos")).as("nneg"))
    runningSums(byScore, "threshold", descending = true,
        Seq("pos", "n"), Seq("tp", "pp"), inclusive = true)
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

  /** Binned calibration table (reliability diagram) with the exact ECE
    * numerator, over a model probability quantized to parts-per-million
    * (`probPpmCol`, integer in [0, 1e6]). Equal-width bins:
    * bin = min(ppm·bins div 1e6, bins−1). Per bin the table carries
    * (n, pos, conf_ppm = Σppm) and ece_num = |1e6·pos − conf_ppm|, so the
    * scalar ECE = Σ ece_num / (1e6·N) — exactly, because
    * |acc_b − conf_b|·(n_b/N) = |1e6·pos_b − Σppm_b| / (1e6·N).
    *
    * Quantization to ppm is what keeps the statistic integer-exact and
    * cross-engine replayable (the model's rational probabilities pass
    * through one truncating div); the induced error is < 1e-6 per row,
    * i.e. below any calibration signal. One hash aggregation over the
    * scored rows — bins-sized output, no sort, no window.
    */
  def eceBinned(df: DataFrame, probPpmCol: String, labelCol: String,
      bins: Int = 10): DataFrame = {
    require(bins >= 1, "eceBinned: bins must be >= 1")
    df.groupBy(least(expr(s"(cast($probPpmCol AS BIGINT) * ${bins}L) div 1000000L"),
        lit(bins - 1L)).as("bin"))
      .agg(count(lit(1)).as("n"),
        sum(col(labelCol)).cast(LongType).as("pos"),
        sum(col(probPpmCol)).cast(LongType).as("conf_ppm"))
      .select(col("bin"), col("n"), col("pos"), col("conf_ppm"),
        abs(lit(1000000L) * col("pos") - col("conf_ppm")).as("ece_num"))
  }

  /** Calibration SLOPE/INTERCEPT beyond [[eceBinned]]'s table: weighted
    * OLS of observed log-odds on predicted log-odds over the same
    * equal-width ppm bins — the binned analogue of Cox's calibration
    * regression (slope 1, intercept 0 = perfectly calibrated; slope < 1 =
    * overconfident). Per usable bin b: x_b = logit(mean predicted) =
    * ln(conf_ppm / (1e6·n − conf_ppm)), y_b = logit(observed rate) =
    * ln(pos / (n − pos)) — both logs of EXACT integer ratios, so the
    * doubles are cross-engine deterministic; each per-bin term is dec6-
    * rounded before the weighted (w = n) sums, the zipfFit/q_jackknife
    * discipline that makes accumulation order irrelevant. Bins where
    * either logit is undefined (pos ∈ {0, n} or conf_ppm ∈ {0, 1e6·n})
    * are dropped — the standard binned-fit treatment; they are visible in
    * the [[eceBinned]] table this derives from. Zero x-variance (< 2
    * usable bins, or all bins at one predicted level) → NULL fit, not
    * NaN (the 0/0 engine-split convention).
    *
    * Returns ONE row: (n_bins, n_rows, slope, intercept), n_rows = rows
    * in usable bins. Shape: one hash aggregation to the bins table, then
    * a bins-sized reduction — nothing corpus-sized past the first agg.
    */
  def calibrationFit(df: DataFrame, probPpmCol: String, labelCol: String,
      bins: Int = 10): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val dec = DecimalType(18, 6)
    val usable = eceBinned(df, probPpmCol, labelCol, bins)
      .filter(col("pos") > 0L && col("pos") < col("n") &&
        col("conf_ppm") > 0L && col("conf_ppm") < lit(1000000L) * col("n"))
    val xb = log(col("conf_ppm").cast("double") /
      (lit(1000000L) * col("n") - col("conf_ppm")).cast("double"))
    val yb = log(col("pos").cast("double") /
      (col("n") - col("pos")).cast("double"))
    val terms = usable.select(col("n"),
      round(xb, 6).cast(dec).as("x"),
      round(yb, 6).cast(dec).as("y"),
      round(xb * xb, 6).cast(dec).as("xx"),
      round(xb * yb, 6).cast(dec).as("xy"))
    val a = terms.agg(
      count(lit(1)).as("n_bins"),
      sum(col("n")).as("n_rows"),
      sum(col("n") * col("x")).as("sx"),
      sum(col("n") * col("y")).as("sy"),
      sum(col("n") * col("xx")).as("sxx"),
      sum(col("n") * col("xy")).as("sxy"))
    val wv = col("n_rows").cast("double")
    val sx = col("sx").cast("double"); val sy = col("sy").cast("double")
    val sxx = col("sxx").cast("double"); val sxy = col("sxy").cast("double")
    val slope = (wv * sxy - sx * sy) / (wv * sxx - sx * sx)
    val defined = wv * sxx - sx * sx > 0.0
    a.select(col("n_bins"), coalesce(col("n_rows"), lit(0L)).as("n_rows"),
      when(defined, round(slope, 6)).as("slope"),
      when(defined, round((sy - slope * sx) / wv, 6)).as("intercept"))
  }

  /** [[calibrationFit]] STRATIFIED by a group column — per-source
    * calibration drift: "is the model calibrated on every crawl source,
    * or does the pooled slope hide an overconfident shard?" (the
    * q_auc_jackknife_src deployment question asked of the calibration
    * line). Identical binning + dec6-weighted-OLS algebra, every
    * aggregation keyed by `groupCol`; degenerate groups (zero x-variance,
    * < 2 usable bins) report NULL fits rather than NaN. Returns one row
    * per group: (groupCol, n_bins, n_rows, slope, intercept). Shape: ONE
    * hash aggregation over the scored rows to groups × bins rows, then
    * group-keyed reductions — nothing data-sized past the first agg.
    */
  def calibrationFitBy(df: DataFrame, groupCol: String, probPpmCol: String,
      labelCol: String, bins: Int = 10): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    require(bins >= 1, "calibrationFitBy: bins must be >= 1")
    val dec = DecimalType(18, 6)
    val binned = df.groupBy(col(groupCol),
        least(expr(s"(cast($probPpmCol AS BIGINT) * ${bins}L) div 1000000L"),
          lit(bins - 1L)).as("bin"))
      .agg(count(lit(1)).as("n"),
        sum(col(labelCol)).cast(LongType).as("pos"),
        sum(col(probPpmCol)).cast(LongType).as("conf_ppm"))
    val usable = binned
      .filter(col("pos") > 0L && col("pos") < col("n") &&
        col("conf_ppm") > 0L && col("conf_ppm") < lit(1000000L) * col("n"))
    val xb = log(col("conf_ppm").cast("double") /
      (lit(1000000L) * col("n") - col("conf_ppm")).cast("double"))
    val yb = log(col("pos").cast("double") /
      (col("n") - col("pos")).cast("double"))
    val terms = usable.select(col(groupCol), col("n"),
      round(xb, 6).cast(dec).as("x"),
      round(yb, 6).cast(dec).as("y"),
      round(xb * xb, 6).cast(dec).as("xx"),
      round(xb * yb, 6).cast(dec).as("xy"))
    val a = terms.groupBy(col(groupCol)).agg(
      count(lit(1)).as("n_bins"),
      sum(col("n")).as("n_rows"),
      sum(col("n") * col("x")).as("sx"),
      sum(col("n") * col("y")).as("sy"),
      sum(col("n") * col("xx")).as("sxx"),
      sum(col("n") * col("xy")).as("sxy"))
    val wv = col("n_rows").cast("double")
    val sx = col("sx").cast("double"); val sy = col("sy").cast("double")
    val sxx = col("sxx").cast("double"); val sxy = col("sxy").cast("double")
    val slope = (wv * sxy - sx * sy) / (wv * sxx - sx * sx)
    val defined = wv * sxx - sx * sx > 0.0
    a.select(col(groupCol), col("n_bins"),
      coalesce(col("n_rows"), lit(0L)).as("n_rows"),
      when(defined, round(slope, 6)).as("slope"),
      when(defined, round((sy - slope * sx) / wv, 6)).as("intercept"))
  }

  /** LEAVE-ONE-BIN-OUT jackknife SE for [[calibrationFit]]'s slope and
    * intercept — the sampling-uncertainty companion the point estimates
    * need before anyone compares two models' calibration: how much does
    * the fitted line lean on any single probability bin?
    *
    * Replicate algebra on the BOUNDED bins table (never the corpus): the
    * fit's weighted sums (W, SX, SY, SXX, SXY) are decimal-exact; each
    * replicate subtracts one bin's contribution by inclusion–exclusion
    * (exact decimal differences, cast to double only at the final ratio —
    * the q_auc_jackknife discipline), slope/intercept replicates dec6,
    * SE = sqrt((g−1)/g · Σ dec6((rep − mean)²)). Replicates whose
    * leave-out x-variance degenerates (≤ 0) drop, mirroring the full
    * fit's NULL convention; g counts the survivors. SE is NULL below
    * g = 2.
    *
    * Returns ONE row: (n_bins, slope, intercept [the full fit, same
    * numbers as calibrationFit], n_reps, slope_se, intercept_se). Shape:
    * one corpus hash-agg to <= `bins` rows, then bins-sized algebra —
    * the replicate count never touches the data again, so the 100 TB
    * cost is the one scan [[eceBinned]] already pays.
    */
  def calibrationJackknife(df: DataFrame, probPpmCol: String,
      labelCol: String, bins: Int = 10): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val dec = DecimalType(18, 6)
    val usable = eceBinned(df, probPpmCol, labelCol, bins)
      .filter(col("pos") > 0L && col("pos") < col("n") &&
        col("conf_ppm") > 0L && col("conf_ppm") < lit(1000000L) * col("n"))
    val xb = log(col("conf_ppm").cast("double") /
      (lit(1000000L) * col("n") - col("conf_ppm")).cast("double"))
    val yb = log(col("pos").cast("double") /
      (col("n") - col("pos")).cast("double"))
    val terms = usable.select(col("n"),
      round(xb, 6).cast(dec).as("x"),
      round(yb, 6).cast(dec).as("y"),
      round(xb * xb, 6).cast(dec).as("xx"),
      round(xb * yb, 6).cast(dec).as("xy"))
    val tot = terms.agg(
      sum(col("n")).as("w"),
      sum(col("n") * col("x")).as("sx"),
      sum(col("n") * col("y")).as("sy"),
      sum(col("n") * col("xx")).as("sxx"),
      sum(col("n") * col("xy")).as("sxy"))
    // leave-one-bin-out sums: decimal-exact differences, double at the ratio
    val wd = (col("w") - col("n")).cast("double")
    val sxd = (col("sx") - col("n") * col("x")).cast("double")
    val syd = (col("sy") - col("n") * col("y")).cast("double")
    val sxxd = (col("sxx") - col("n") * col("xx")).cast("double")
    val sxyd = (col("sxy") - col("n") * col("xy")).cast("double")
    val den = wd * sxxd - sxd * sxd
    val slopeR = (wd * sxyd - sxd * syd) / den
    val reps = terms.crossJoin(broadcast(tot))
      .filter(den > 0.0)
      .select(round(slopeR, 6).cast(dec).as("sl"),
        round((syd - slopeR * sxd) / wd, 6).cast(dec).as("ic"))
    val means = reps.agg(count(lit(1)).as("g"),
      sum(col("sl")).as("ssl"), sum(col("ic")).as("sic"))
      .select(col("g"),
        round(col("ssl").cast("double") / col("g").cast("double"), 6).as("msl"),
        round(col("sic").cast("double") / col("g").cast("double"), 6).as("mic"))
    val dsl = col("sl").cast("double") - col("msl")
    val dic = col("ic").cast("double") - col("mic")
    // global agg (one row even with zero replicates), g joined back from
    // `means` — a groupBy(g) would return NO row on an empty replicate set
    // and drop the fit row with it
    val sq = reps.crossJoin(broadcast(means))
      .select(round(dsl * dsl, 6).cast(dec).as("qsl"),
        round(dic * dic, 6).cast(dec).as("qic"))
      .agg(sum(col("qsl")).as("vsl"), sum(col("qic")).as("vic"))
    val gd = col("g").cast("double")
    val scale = (gd - 1.0) / gd
    val se = means.crossJoin(broadcast(sq))
      .select(col("g").as("n_reps"),
        when(col("g") >= 2L,
          round(sqrt(scale * col("vsl").cast("double")), 6)).as("slope_se"),
        when(col("g") >= 2L,
          round(sqrt(scale * col("vic").cast("double")), 6)).as("intercept_se"))
    calibrationFit(df, probPpmCol, labelCol, bins)
      .select("n_bins", "slope", "intercept")
      .crossJoin(broadcast(se))
  }

  /** Lift / cumulative-gains table of `scoreCol` against binary
    * `labelCol`: rows ranked best-score-first are cut into `buckets`
    * equal-count buckets, and each bucket row carries exact integers
    * (decile, n, pos, cum_n, cum_pos, lift_num, lift_den) where
    * lift@decile = lift_num/lift_den =
    * (cum_pos·N)/(cum_n·P) and gain = cum_pos/P — the campaign-targeting
    * companion to [[prCurve]]'s threshold table. Ties are broken by
    * `idCol` (must be unique non-null) so the ranking is a total order
    * and cross-engine replayable: rank(row) = (#rows with strictly
    * higher score) + (rank of id within its tie group), identical to
    * `row_number() OVER (ORDER BY score DESC, id)`.
    *
    * Shape: one corpus-sized groupBy(score) + a two-phase prefix sum
    * over the DISTINCT-score table for the "strictly above" counts
    * (never a global window), one join back + a per-score-partition
    * row_number for tie ranks (partitioned by score — bounded per
    * group by the tie multiplicity, never the corpus unless the score
    * is constant), then a buckets-sized self-join cumsum. NULL scores
    * are excluded (the [[aucExact]] NULLS-ordering rationale).
    */
  def liftDeciles(df: DataFrame, scoreCol: String, labelCol: String,
      idCol: String, buckets: Int = 10): DataFrame = {
    require(buckets >= 1, "liftDeciles: buckets must be >= 1")
    val rows = df.filter(col(scoreCol).isNotNull)
      .select(col(scoreCol).as("s"), col(idCol).as("id"),
        col(labelCol).cast(LongType).as("y"))
    val byScore = rows.groupBy("s").agg(count(lit(1)).as("n"))
    val above = runningSums(byScore, "s", descending = true,
      Seq("n"), Seq("below"), inclusive = false)
      .select(col("s"), col("below"))
    val totals = rows.agg(count(lit(1)).as("n_total"),
      sum(col("y")).cast(LongType).as("pos_total"))
    val tieW = org.apache.spark.sql.expressions.Window
      .partitionBy("s").orderBy("id")
    val dec = rows.join(above, Seq("s"))
      .withColumn("rk", col("below") + row_number().over(tieW))
      .crossJoin(broadcast(totals)) // 1 scalar row
      .groupBy(expr(s"((rk - 1L) * ${buckets}L) div n_total").as("decile"),
        col("n_total"), col("pos_total"))
      .agg(count(lit(1)).as("n"), sum(col("y")).cast(LongType).as("pos"))
      .localCheckpoint(true) // buckets-sized; read twice by the self-join
    dec.as("a")
      .join(dec.select(col("decile").as("bd"), col("n").as("bn"),
        col("pos").as("bpos")), col("bd") <= col("decile"))
      .groupBy(col("decile"), col("n_total"), col("pos_total"),
        col("n"), col("pos"))
      .agg(sum(col("bn")).as("cum_n"), sum(col("bpos")).as("cum_pos"))
      .select(col("decile"), col("n"), col("pos"), col("cum_n"),
        col("cum_pos"),
        (col("cum_pos") * col("n_total")).as("lift_num"),
        (col("cum_n") * col("pos_total")).as("lift_den"))
  }

  /** Exact Spearman rank correlation of two integer-valued columns:
    * Pearson over doubled midranks (2·rank keeps tied average ranks
    * integral — the q_auc_exact convention), with all moments carried
    * in DECIMAL(38,0) so the final closed-form double combination is
    * reduction-order-independent and bit-identical across engines.
    * Returns one row (n_rows, spearman_rho dec6-rounded).
    *
    * Shape: one groupBy per column to its distinct-value table, the
    * two-phase prefix sum over each (never a global window), one
    * shuffle join per column to carry ranks back onto the rows, then a
    * single scalar aggregate. Doubled ranks are ≤ 2n+1, so the decimal
    * products stay exact far beyond 2^63 row counts; the factors cast
    * to decimal BEFORE multiplying (a long×long product would wrap past
    * ~1.5e9 rows).
    */
  def spearmanExact(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    // base is CORPUS-sized: recomputing it per read (two rank
    // derivations + the final join) is one extra scan each — pinning it
    // with localCheckpoint measured an 8g OOM at 100x (deserialized
    // row blocks), and at 100 TB pinning the corpus is never an option
    val base = df.filter(col(xCol).isNotNull && col(yCol).isNotNull)
      .select(col(xCol).cast(LongType).as("xv"),
        col(yCol).cast(LongType).as("yv"))
    def ranks(vc: String): DataFrame = {
      val byV = base.groupBy(col(vc).as("v")).agg(count(lit(1)).as("n"))
        .localCheckpoint(true) // runningSums reads it across jobs
      // distinct-value-sized and stat-less (RDD-backed): hint broadcast
      // under the shared small-frame policy so the corpus side of the
      // rank join never shuffles on a bounded value domain
      PlanHints.maybeBroadcastSmall(
        runningSums(byV, "v", descending = false, Seq("n"), Seq("below"),
            inclusive = false)
          .select(col("v"), (lit(2L) * col("below") + col("n") + lit(1L))
            .as("r2")),
        byV.count())
    }
    val dec = DecimalType(38, 0)
    val joined = base
      .join(ranks("xv").select(col("v").as("xv"), col("r2").as("rx")), Seq("xv"))
      .join(ranks("yv").select(col("v").as("yv"), col("r2").as("ry")), Seq("yv"))
    val a = joined.agg(
      count(lit(1)).cast(dec).as("n"),
      sum(col("rx").cast(dec)).as("sx"),
      sum(col("ry").cast(dec)).as("sy"),
      sum(col("rx").cast(dec) * col("rx").cast(dec)).as("sxx"),
      sum(col("ry").cast(dec) * col("ry").cast(dec)).as("syy"),
      sum(col("rx").cast(dec) * col("ry").cast(dec)).as("sxy"))
    // exact decimal moments; the combination mirrors the oracle SQL's
    // expression tree op for op (same IEEE doubles → same bits)
    val nd = col("n").cast("double"); val sxd = col("sx").cast("double")
    val syd = col("sy").cast("double"); val sxxd = col("sxx").cast("double")
    val syyd = col("syy").cast("double"); val sxyd = col("sxy").cast("double")
    a.select(
      col("n").cast(LongType).as("n_rows"),
      round((nd * sxyd - sxd * syd) /
        sqrt((nd * sxxd - sxd * sxd) * (nd * syyd - syd * syd)), 6)
        .as("spearman_rho"))
  }

  /** Global equal-population rank buckets of `valueCol` (the liftDeciles
    * rank machinery, generalized): returns (id, bucket) with
    * bucket = ((rank − 1)·buckets) div n, rank 1-based over
    * (value, id) — floor allocation, NOT SQL ntile's
    * remainder-to-the-front rule, because the div form replays exactly
    * from a row_number in any engine. Ranks come from the two-phase
    * prefix sum over the distinct-value table plus a per-tie row_number
    * partitioned BY VALUE — never a global window.
    */
  def rankBuckets(df: DataFrame, valueCol: String, idCol: String,
      buckets: Int = 5): DataFrame = {
    require(buckets >= 1, "rankBuckets: buckets must be >= 1")
    // rows recomputes per read (value table, total, join) — never pinned:
    // the bounded frame is the distinct-value table
    val rows = df.filter(col(valueCol).isNotNull)
      .select(col(valueCol).cast(LongType).as("v"), col(idCol).as("id"))
    val byV = rows.groupBy("v").agg(count(lit(1)).as("n"))
      .localCheckpoint(true) // runningSums reads it across jobs
    // small-frame broadcast policy — see [[PlanHints]]
    val below = PlanHints.maybeBroadcastSmall(
      runningSums(byV, "v", descending = false,
        Seq("n"), Seq("below"), inclusive = false)
        .select(col("v"), col("below")),
      byV.count())
    val tot = rows.agg(count(lit(1)).as("nn"))
    val tieW = org.apache.spark.sql.expressions.Window
      .partitionBy("v").orderBy("id")
    rows.join(below, Seq("v"))
      .withColumn("rank", col("below") + row_number().over(tieW))
      .crossJoin(broadcast(tot)) // 1 scalar row
      .select(col("id"),
        expr(s"((rank - 1L) * ${buckets}L) div nn").as("bucket"))
  }

  /** Retention / survival curve over entity lifetimes: each id's max
    * `lifeCol` is its churn time; per lifetime value t the table carries
    * (t, churned, at_risk, retention_ppm, ln_surv_e6) where
    * at_risk = ids still alive at or after t (a DESCENDING
    * inclusive prefix sum), retention_ppm = at_risk·1e6 div total ids
    * (exact), and ln_surv_e6 is the Kaplan–Meier product in log space:
    * the ASCENDING cumulative sum of the per-day integer micro-nats
    * round(ln((at_risk − churned)/at_risk)·1e6) — summing these
    * integers instead of multiplying floats keeps the curve
    * reduction-order-independent and SQL-replayable (exp(ln_surv_e6/1e6)
    * recovers S(t) to <1e-6 per step). The final day, where survival
    * reaches exactly zero (at_risk = churned), emits NULL — ln 0 has no
    * finite log-space value.
    *
    * Shape: one corpus-sized groupBy(id), one lifetime-domain-sized
    * groupBy, then two two-phase prefix sums over the LIFETIME table
    * (never a global window) and one broadcast scalar. The lifetime
    * domain bounds everything downstream of the first aggregation.
    */
  def retentionCurve(df: DataFrame, idCol: String, lifeCol: String): DataFrame = {
    val u = df.filter(col(lifeCol).isNotNull)
      .groupBy(col(idCol).as("id"))
      .agg(max(col(lifeCol).cast(LongType)).as("last_t"))
    val d = u.groupBy(col("last_t").as("t"))
      .agg(count(lit(1)).as("churned"))
      .localCheckpoint(true) // runningSums reads it across jobs
    val withRisk = runningSums(d, "t", descending = true,
      Seq("churned"), Seq("at_risk"), inclusive = true)
    val tot = withRisk.agg(sum(col("churned")).as("nu"))
    val terms = withRisk.crossJoin(broadcast(tot)) // 1 scalar row
      .withColumn("retention_ppm", expr("(at_risk * 1000000L) div nu"))
      .withColumn("term",
        when(col("at_risk") > col("churned"),
          round(log((col("at_risk") - col("churned")).cast("double") /
            col("at_risk").cast("double")) * 1e6).cast(LongType)))
      .localCheckpoint(true) // second prefix sum reads it across jobs
    runningSums(terms, "t", descending = false,
        Seq("term"), Seq("cum"), inclusive = true)
      .select(col("t"), col("churned"), col("at_risk"),
        col("retention_ppm"),
        when(col("at_risk") === col("churned"), lit(null).cast(LongType))
          .otherwise(col("cum")).as("ln_surv_e6"))
  }

  /** Exact Gini coefficient of a non-negative integer `valueCol` (one
    * row per holder, e.g. revenue cents per customer):
    * G = (2·Σ rank·x − (n+1)·Σx) / (n·Σx) with 1-based ranks over
    * (value, id) — tie order is irrelevant to the statistic (equal
    * values commute inside Σ rank·x), the id tiebreak just makes the
    * rank column itself deterministic. Returns one row
    * (n_rows, sum_val, gini dec6-rounded).
    *
    * Shape: one groupBy(value) to the distinct-value table, the
    * two-phase prefix sum over it (never a global window), one shuffle
    * join back, a per-tie row_number partitioned BY VALUE (bounded
    * groups), then a single scalar aggregate with DECIMAL(38,0)
    * moments — rank·x products would wrap a long once n·max(x)
    * approaches 2^63.
    */
  def giniExact(df: DataFrame, valueCol: String, idCol: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    // rows is input-sized (often per-holder aggregates, still unbounded):
    // recompute per read rather than pin — the distinct-value table below
    // is the bounded frame worth materializing
    val rows = df.filter(col(valueCol).isNotNull)
      .select(col(valueCol).cast(LongType).as("x"), col(idCol).as("id"))
    val byV = rows.groupBy("x").agg(count(lit(1)).as("n"))
      .localCheckpoint(true) // runningSums reads it across jobs
    // small-frame broadcast policy — see [[PlanHints]]
    val below = PlanHints.maybeBroadcastSmall(
      runningSums(byV, "x", descending = false,
        Seq("n"), Seq("below"), inclusive = false)
        .select(col("x"), col("below")),
      byV.count())
    val tieW = org.apache.spark.sql.expressions.Window
      .partitionBy("x").orderBy("id")
    val dec = DecimalType(38, 0)
    val ranked = rows.join(below, Seq("x"))
      .withColumn("rank", col("below") + row_number().over(tieW))
    val a = ranked.agg(
      count(lit(1)).cast(dec).as("n"),
      sum(col("x").cast(dec)).as("sx"),
      sum(col("rank").cast(dec) * col("x").cast(dec)).as("srx"))
    val nd = col("n").cast("double"); val sxd = col("sx").cast("double")
    val srxd = col("srx").cast("double")
    a.select(col("n").cast(LongType).as("n_rows"),
      col("sx").cast(LongType).as("sum_val"),
      round((lit(2.0) * srxd - (nd + lit(1.0)) * sxd) / (nd * sxd), 6).as("gini"))
  }

  /** Full r×c chi-square test of independence between two categorical
    * columns, including the zero cells the observed contingency omits
    * (an unobserved (x,y) combination still contributes its expected
    * mass). Returns one row
    * (n_rows, dof, chi2, cramers_v) with chi2 = Σ (O·N − R·C)²/(R·C·N)
    * summed as dec6-rounded DECIMAL(18,6) terms (the q_lm_xent
    * convention: each per-cell double is the identical expression tree
    * in both engines, the decimal sum is order-independent).
    *
    * Shape: ONE corpus-sized groupBy(x, y); everything downstream is
    * category-product-sized (marginals broadcast, the full grid is a
    * broadcast cross join of the two marginal tables).
    */
  def chiSquare(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val cells = df.filter(col(xCol).isNotNull && col(yCol).isNotNull)
      .groupBy(col(xCol).as("x"), col(yCol).as("y"))
      .agg(count(lit(1)).as("n"))
      .localCheckpoint(true) // category²-sized; read for marginals + grid
    val rx = cells.groupBy("x").agg(sum(col("n")).as("nx"))
    val ry = cells.groupBy("y").agg(sum(col("n")).as("ny"))
    val tot = cells.agg(sum(col("n")).as("nn"))
    val dims = rx.agg(count(lit(1)).as("r"))
      .crossJoin(broadcast(ry.agg(count(lit(1)).as("c"))))
    val grid = rx.crossJoin(broadcast(ry))
      .join(broadcast(cells), Seq("x", "y"), "left")
      .na.fill(0L, Seq("n"))
      .crossJoin(broadcast(tot)) // 1 scalar row
    // cross-multiplies in DECIMAL(38,0): long*long wraps once the corpus
    // passes ~3e9 rows (the spearman convention; the oracle carries the
    // same products in HUGEINT) — the exact integer then casts to the
    // same double either way
    val dec = DecimalType(38, 0)
    val numd = (col("n").cast(dec) * col("nn").cast(dec) -
      col("nx").cast(dec) * col("ny").cast(dec)).cast("double")
    val dend = col("nx").cast("double") * col("ny").cast("double") *
      col("nn").cast("double")
    val agg = grid.select(col("nn"),
        round(numd * numd / dend, 6).cast(DecimalType(18, 6)).as("term"))
      .groupBy("nn").agg(sum(col("term")).as("chi2s"))
    agg.crossJoin(broadcast(dims))
      .select(col("nn").as("n_rows"),
        ((col("r") - 1L) * (col("c") - 1L)).as("dof"),
        col("chi2s").cast("double").as("chi2"),
        round(sqrt(col("chi2s").cast("double") /
          (col("nn") * least(col("r") - 1L, col("c") - 1L)).cast("double")), 6)
          .as("cramers_v"))
  }

  /** Pointwise mutual information table of two categorical columns: one
    * row per OBSERVED cell (x, y, n_cell, pmi) with
    * pmi = ln(n·N / (R·C)) dec6-rounded — zero cells carry no mass, so
    * the scalar MI = Σ n_cell·pmi / N derives exactly from the table.
    * Same shape as [[chiSquare]]: one corpus-sized groupBy, then
    * marginal-sized broadcast joins.
    */
  def pmiTable(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val cells = df.filter(col(xCol).isNotNull && col(yCol).isNotNull)
      .groupBy(col(xCol).as("x"), col(yCol).as("y"))
      .agg(count(lit(1)).as("n_cell"))
      .localCheckpoint(true)
    val rx = cells.groupBy("x").agg(sum(col("n_cell")).as("nx"))
    val ry = cells.groupBy("y").agg(sum(col("n_cell")).as("ny"))
    val tot = cells.agg(sum(col("n_cell")).as("nn"))
    cells.join(broadcast(rx), Seq("x"))
      .join(broadcast(ry), Seq("y"))
      .crossJoin(broadcast(tot)) // 1 scalar row
      .select(col("x"), col("y"), col("n_cell"),
        round(log((col("n_cell").cast("double") * col("nn").cast("double")) /
          (col("nx").cast("double") * col("ny").cast("double"))), 6)
          .as("pmi"))
  }

  /** Zipf rank-frequency fit: weighted OLS of ln(frequency) on
    * ln(midrank) over the DISTINCT-FREQUENCY classes of a token stream —
    * the exponent every tokenizer-design discussion starts from. The
    * vocabulary-sized rank problem collapses to the frequency-CLASS
    * table (ties share a midrank, carried with weight = class size), so
    * ranks come from the [[runningSums]] prefix machinery — no global
    * window — and all ln/ln² terms are dec6-rounded before the exact
    * decimal weighted sums ([[spearmanExact]] contract). Returns one row
    * (n_types, n_tokens, slope ≈ −zipf exponent, intercept).
    */
  def zipfFit(tokens: DataFrame, tokenCol: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val dec = DecimalType(18, 6)
    val wc = tokens.groupBy(col(tokenCol).as("w")).agg(count(lit(1)).as("n"))
    val byN = wc.groupBy(col("n").as("nv")).agg(count(lit(1)).as("cw"))
      .localCheckpoint(true) // class-table-sized; runningSums + agg
    val ranked = runningSums(byN, "nv", descending = true,
        Seq("cw"), Seq("before"), inclusive = false)
      .withColumn("midrank",
        (lit(2L) * col("before") + col("cw") + lit(1L)).cast("double") / 2.0)
    val lnm = log(col("midrank"))
    val lnf = log(col("nv").cast("double"))
    val terms = ranked.select(col("cw"), col("nv"),
      round(lnm, 6).cast(dec).as("x"),
      round(lnf, 6).cast(dec).as("y"),
      round(lnm * lnm, 6).cast(dec).as("xx"),
      round(lnm * lnf, 6).cast(dec).as("xy"))
    val a = terms.agg(
      sum(col("cw")).as("n_types"),
      sum(col("nv") * col("cw")).as("n_tokens"),
      sum(col("cw") * col("x")).as("sx"),
      sum(col("cw") * col("y")).as("sy"),
      sum(col("cw") * col("xx")).as("sxx"),
      sum(col("cw") * col("xy")).as("sxy"))
    val wv = col("n_types").cast("double")
    val sx = col("sx").cast("double"); val sy = col("sy").cast("double")
    val sxx = col("sxx").cast("double"); val sxy = col("sxy").cast("double")
    val slope = (wv * sxy - sx * sy) / (wv * sxx - sx * sx)
    // a single frequency class (e.g. all tokens unique) has zero x
    // variance: the fit is undefined — NULL, not the NaN a raw 0/0 gives
    // (DuckDB's 0.0/0.0 is NULL, so the raw form also splits the engines)
    val defined = wv * sxx - sx * sx > 0.0
    a.select(col("n_types"), col("n_tokens"),
      when(defined, round(slope, 6)).as("slope"),
      when(defined, round((sy - slope * sx) / wv, 6)).as("intercept"))
  }

  /** Vocabulary coverage curve: for each budget k, the EXACT number of
    * corpus tokens a top-k-by-frequency vocabulary covers (the "how big
    * must the tokenizer vocab be" table). Works entirely on the
    * frequency-class table with exclusive prefix sums: a budget's
    * boundary class contributes (k − types_before)·freq partially; ties
    * beyond the budget are cut deterministically. Budgets larger than
    * the vocabulary cover everything. Returns (k, n_types, covered,
    * total, coverage_ppm) per budget, all BIGINT.
    */
  def vocabCoverage(tokens: DataFrame, tokenCol: String,
      budgets: Seq[Long]): DataFrame = {
    // a budget k <= 0 matches NO frequency class (types_before < k is
    // never true), and the coalesce(..., total) no-match branch would
    // then claim FULL coverage for an empty vocabulary — refuse instead,
    // so that branch only ever means "budget beyond the vocabulary"
    require(budgets.forall(_ >= 1L),
      s"vocabCoverage: budgets must be >= 1, got ${budgets.filter(_ < 1L)}")
    val spark = tokens.sparkSession
    import spark.implicits._
    val wc = tokens.groupBy(col(tokenCol).as("w")).agg(count(lit(1)).as("n"))
    val byN = wc.groupBy(col("n").as("nv")).agg(count(lit(1)).as("cw"))
      .withColumn("tok", col("nv") * col("cw"))
      .localCheckpoint(true) // class-table-sized
    val pre = runningSums(byN, "nv", descending = true,
      Seq("cw", "tok"), Seq("types_before", "tokens_before"),
      inclusive = false)
    val tot = byN.agg(sum(col("cw")).as("n_types"),
      sum(col("tok")).as("total"))
    val ks = budgets.toDF("k")
    ks.join(pre,
        col("types_before") < col("k") &&
          col("k") <= col("types_before") + col("cw"), "left")
      .crossJoin(broadcast(tot))
      .select(col("k"), col("n_types"),
        coalesce(col("tokens_before") +
          (col("k") - col("types_before")) * col("nv"), col("total"))
          .as("covered"),
        col("total"))
      .withColumn("coverage_ppm",
        // DECIMAL(38,0) cross-multiply: covered·1e6 wraps a BIGINT past
        // ~9e12 tokens (a few 100 TB of text) — the house convention
        expr("cast(cast(covered AS DECIMAL(38,0)) * 1000000 div total AS BIGINT)"))
  }
}
