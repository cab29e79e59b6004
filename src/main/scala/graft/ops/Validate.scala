package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality validation — constraint checks over a corpus,
  * all computed in ONE aggregation pass (Deequ-style, arXiv:1809.04446's
  * "unit tests for data" model re-expressed on plain Spark aggregates).
  *
  * Every [[Check]] contributes one aggregate metric column; [[run]] folds
  * the whole suite into a single `df.agg(...)` — one column-pruned scan,
  * map-side partial aggregation, a one-row exchange — then explodes the
  * row into a (check_name, observed, passed) result table without ever
  * collecting to the driver. At 100 TB the validation suite costs exactly
  * one pass over the columns it mentions, independent of how many checks
  * it contains.
  *
  * Scale note on DISTINCT metrics: each exact [[Checks.uniqueness]] adds
  * an Expand duplicate of the scan rows to the aggregate (Spark's
  * multi-distinct rewrite). For routine 100 TB health checks prefer
  * [[Checks.approxUniqueness]] (HLL, no Expand, ~2% error) and reserve
  * the exact form for release gates.
  *
  * Reference scope: pandas-db exposes per-column profiling (describe,
  * null_count, value_counts — table.py/column.py); this is the
  * pipeline-facing composition of those metrics into pass/fail gates.
  */
object Validate {

  /** One constraint: a named aggregate metric and a predicate over it.
    * The metric must be an AGGREGATE expression (it runs inside one
    * `agg(...)` with every other check's metric); the predicate is a
    * plain column function applied to the metric's value.
    */
  final case class Check(name: String, metric: Column, pass: Column => Column)

  /** Run the suite in one pass. Returns (check_name, observed, passed),
    * one row per check, ordered by check_name — observed cast to double
    * for a uniform schema (counts stay exact: longs below 2^53).
    */
  def run(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "empty check suite")
    require(checks.map(_.name).distinct.size == checks.size,
      "check names must be unique — they key the result table")
    val metrics = checks.zipWithIndex.map { case (c, i) => c.metric.as(s"__m$i") }
    val one = df.agg(metrics.head, metrics.tail: _*)
    val rows = checks.zipWithIndex.map { case (c, i) =>
      struct(lit(c.name).as("check_name"),
        col(s"__m$i").cast("double").as("observed"),
        // a null metric (0/0 ratio on an EMPTY input, null min/max) is a
        // FAILED check, not a null verdict: the accidentally-empty drop
        // is precisely what a gate must catch, and a null `passed` would
        // NPE the caller's getBoolean instead of failing the gate
        coalesce(c.pass(col(s"__m$i")), lit(false)).as("passed"))
    }
    one.select(explode(array(rows: _*)).as("r")).select("r.*")
      .orderBy("check_name")
  }

  /** True iff every check in the suite passed — the single-boolean gate a
    * pipeline branches on. One extra tiny aggregation over [[run]]'s
    * already-one-row plan.
    */
  def passes(df: DataFrame, checks: Seq[Check]): Boolean =
    run(df, checks).agg(min(col("passed"))).head().getBoolean(0)

  /** Per-group validation: the same one-pass fold, keyed by `groupCols` —
    * "is every SOURCE healthy", not just the corpus in aggregate (a
    * poisoned crawl seed hides inside a global average). One hash
    * aggregate (partial map-side), result size = groups × checks; at
    * 100 TB the scan still happens once no matter how many checks run.
    * Returns (groupCols…, check_name, observed, passed).
    */
  def runGrouped(df: DataFrame, groupCols: Seq[String],
      checks: Seq[Check]): DataFrame = {
    require(groupCols.nonEmpty, "use run() for ungrouped validation")
    require(checks.nonEmpty, "empty check suite")
    require(checks.map(_.name).distinct.size == checks.size,
      "check names must be unique — they key the result table")
    val metrics = checks.zipWithIndex.map { case (c, i) => c.metric.as(s"__m$i") }
    val agg = df.groupBy(groupCols.map(col): _*)
      .agg(metrics.head, metrics.tail: _*)
    val rows = checks.zipWithIndex.map { case (c, i) =>
      struct(lit(c.name).as("check_name"),
        col(s"__m$i").cast("double").as("observed"),
        coalesce(c.pass(col(s"__m$i")), lit(false)).as("passed"))
    }
    agg.select(groupCols.map(col) :+ explode(array(rows: _*)).as("r"): _*)
      .select(groupCols.map(col) :+ col("r.check_name") :+
        col("r.observed") :+ col("r.passed"): _*)
      .orderBy(groupCols.map(col) :+ col("check_name"): _*)
  }

  /** The standard constraint library. Ratios divide with try_divide:
    * under ANSI mode (Spark 4 default) a plain 0/0 on an EMPTY input
    * would THROW instead of yielding the null that run() converts to a
    * clean failed verdict. Count-based ratios are left at
    * FULL precision: they are one IEEE division of exact longs (already
    * reproducible across aggregation orders), and rounding BEFORE the
    * threshold would let a strict `atLeast = 1.0` gate pass with up to
    * ~0.005% violations — 5 000 bad rows per 100 M. Only the decimal
    * mean rounds (Q.davg convention), and its bounds are range checks,
    * not strict-equality gates.
    */
  object Checks {
    /** Fraction of rows with `c` non-null ≥ `atLeast`. */
    def completeness(c: String, atLeast: Double = 1.0): Check =
      Check(s"completeness:$c",
        try_divide(count(col(c)).cast("double"), count(lit(1))),
        _ >= atLeast)

    /** Distinct values / non-null values ≥ `atLeast` (1.0 = unique key). */
    def uniqueness(c: String, atLeast: Double = 1.0): Check =
      Check(s"uniqueness:$c",
        try_divide(countDistinct(col(c)).cast("double"), count(col(c))),
        _ >= atLeast)

    /** HLL-approximate [[uniqueness]] — no Expand, bounded error. For
      * health monitoring; `atLeast` should leave ~2% slack.
      */
    def approxUniqueness(c: String, atLeast: Double): Check =
      Check(s"approx_uniqueness:$c",
        try_divide(approx_count_distinct(col(c)).cast("double"), count(col(c))),
        _ >= atLeast)

    /** min(c) ≥ lo — nulls ignored (SQL min semantics). */
    def minBound(c: String, lo: Double): Check =
      Check(s"min:$c", min(col(c)).cast("double"), _ >= lo)

    /** max(c) ≤ hi. */
    def maxBound(c: String, hi: Double): Check =
      Check(s"max:$c", max(col(c)).cast("double"), _ <= hi)

    /** Exact decimal mean of a double column within [lo, hi] (order-
      * independent — Q.davg mechanics).
      */
    def meanBetween(c: String, lo: Double, hi: Double): Check =
      Check(s"mean:$c",
        round(try_divide(
          sum(col(c).cast(org.apache.spark.sql.types.DecimalType(18, 6)))
            .cast("double"), count(col(c))), 4),
        m => m >= lo && m <= hi)

    /** Fraction of NON-NULL values inside `allowed` ≥ `atLeast`. */
    def containedIn(c: String, allowed: Seq[String], atLeast: Double = 1.0): Check =
      Check(s"contained_in:$c",
        try_divide(count(when(col(c).isin(allowed: _*), lit(1)))
          .cast("double"), count(col(c))),
        _ >= atLeast)

    /** Fraction of NON-NULL values where `regex` FINDS a match ≥
      * `atLeast` (RLIKE search semantics, not a full-string match —
      * anchor with ^…$ when full-match is meant, as q_validate does).
      */
    def matches(c: String, regex: String, atLeast: Double = 1.0): Check =
      Check(s"matches:$c",
        try_divide(count(when(regexp_like(col(c), lit(regex)), lit(1)))
          .cast("double"), count(col(c))),
        _ >= atLeast)

    /** Row count within [lo, hi] (hi = Long.MaxValue for "at least"). */
    def sizeBetween(lo: Long, hi: Long = Long.MaxValue): Check =
      Check("size", count(lit(1)),
        m => m >= lo && m <= hi)

    /** Fraction of rows satisfying an arbitrary row predicate ≥ `atLeast`
      * — the compliance escape hatch for cross-column constraints
      * (e.g. `col("ship") <= col("receipt")`). NULL predicate counts as
      * non-compliant (the conservative reading).
      */
    def compliance(name: String, predicate: Column, atLeast: Double = 1.0): Check =
      Check(s"compliance:$name",
        try_divide(count(when(predicate, lit(1))).cast("double"),
          count(lit(1))),
        _ >= atLeast)
  }

  /** Exact distribution-drift report between a REFERENCE and a CURRENT
    * frame over one numeric column — "did this week's crawl shift the
    * length/score distribution", the monitoring complement of the
    * constraint suite above (checks catch absolute violations; drift
    * catches a distribution that is individually valid but no longer
    * looks like last week's).
    *
    * Buckets are fixed equi-width (`floor((x - lo) / width)` clamped to
    * [-1, buckets] — -1 = underflow, `buckets` = overflow; NULLs are
    * excluded, the completeness check owns those). One aggregation per
    * side, a full-outer join on the bucket id (result size = buckets,
    * never data-sized), missing buckets count 0. Everything is exact
    * integer arithmetic — identical across engines and partitionings.
    */
  def driftHistogram(ref: DataFrame, cur: DataFrame, column: String,
      lo: Double, width: Double, buckets: Int): DataFrame = {
    require(width > 0 && buckets >= 1, "driftHistogram: bad bucket spec")
    def side(df: DataFrame, as: String): DataFrame =
      df.filter(col(column).isNotNull)
        .select(least(greatest(
          floor((col(column).cast("double") - lo) / width), lit(-1L)),
          lit(buckets.toLong)).as("bucket"))
        .groupBy("bucket").agg(count(lit(1)).as(as))
    side(ref, "n_ref").join(side(cur, "n_cur"), Seq("bucket"), "full_outer")
      .select(col("bucket"),
        coalesce(col("n_ref"), lit(0L)).as("n_ref"),
        coalesce(col("n_cur"), lit(0L)).as("n_cur"))
  }

  /** Total-variation distance of a [[driftHistogram]] result, exact until
    * the one final division: TV = Σ|p_ref - p_cur| / 2 computed as the
    * cross-multiplied integer L1 — Σ|n_ref·N_cur - n_cur·N_ref| carried
    * in DECIMAL(38,0) (long×long overflows past ~3 G rows) over
    * 2·N_ref·N_cur — rounded to 6 places. One row:
    * (n_ref, n_cur, tv). TV is 0 for identical distributions, 1 for
    * disjoint ones; alert thresholds are domain policy.
    */
  /** [[driftHistogram]] keyed by `groupCol` — per-source drift, the shape
    * that catches one poisoned crawl seed hiding inside a healthy global
    * histogram (the same argument as [[runGrouped]]). Result size =
    * groups × buckets.
    */
  def driftHistogramBy(ref: DataFrame, cur: DataFrame, groupCol: String,
      column: String, lo: Double, width: Double, buckets: Int): DataFrame = {
    require(width > 0 && buckets >= 1, "driftHistogramBy: bad bucket spec")
    def side(df: DataFrame, as: String): DataFrame =
      df.filter(col(column).isNotNull)
        .select(col(groupCol), least(greatest(
          floor((col(column).cast("double") - lo) / width), lit(-1L)),
          lit(buckets.toLong)).as("bucket"))
        .groupBy(groupCol, "bucket").agg(count(lit(1)).as(as))
    side(ref, "n_ref")
      .join(side(cur, "n_cur"), Seq(groupCol, "bucket"), "full_outer")
      .select(col(groupCol),
        col("bucket"),
        coalesce(col("n_ref"), lit(0L)).as("n_ref"),
        coalesce(col("n_cur"), lit(0L)).as("n_cur"))
  }

  /** Per-group [[totalVariation]] over a [[driftHistogramBy]] result: one
    * row per group — (groupCol, n_ref, n_cur, tv), same poles (a group
    * empty on one side is maximal drift).
    */
  def totalVariationBy(drift: DataFrame, groupCol: String): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(19, 0)
    val totals = drift.groupBy(groupCol)
      .agg(sum(col("n_ref")).as("t_ref"), sum(col("n_cur")).as("t_cur"))
    drift.join(broadcast(totals), groupCol)
      .groupBy(groupCol)
      .agg(first(col("t_ref")).as("n_ref"), first(col("t_cur")).as("n_cur"),
        sum(abs(col("n_ref").cast(dec) * col("t_cur").cast(dec) -
          col("n_cur").cast(dec) * col("t_ref").cast(dec))).as("l1"))
      .select(col(groupCol), col("n_ref"), col("n_cur"),
        when(col("n_ref") === 0L && col("n_cur") === 0L, lit(0.0))
          .when(col("n_ref") === 0L || col("n_cur") === 0L, lit(1.0))
          .otherwise(round(col("l1").cast("double") /
            (lit(2.0) * col("n_ref").cast("double") * col("n_cur").cast("double")),
            6)).as("tv"))
  }

  /** Population Stability Index over a [[driftHistogram]] result — the
    * monitoring pair's log-sensitive half: where TV weighs every count
    * move linearly, PSI's `(p_cur − p_ref)·ln(p_cur/p_ref)` terms blow up
    * on buckets whose SHARE collapses or explodes, the "a tail appeared /
    * vanished" alarm (conventional read: <0.1 stable, 0.1–0.25 drifting,
    * >0.25 shifted). Add-one smoothing on every bucket count (zero
    * buckets are expected — underflow/overflow rows — and raw PSI is
    * undefined there); the ln of each share ratio is rounded to 6 places
    * (the LmOps convention for cross-engine transcendentals), each term
    * rounded to 6 and summed as DECIMAL — order-independent, so the
    * result is partitioning-stable. One row: (n_ref, n_cur, psi).
    * Degenerate poles mirror [[totalVariation]]: both sides empty → 0;
    * one side empty → the smoothed formula still applies (finite, large).
    */
  def psi(drift: DataFrame): DataFrame = {
    val totals = drift.agg(sum(col("n_ref")).as("t_ref"),
      sum(col("n_cur")).as("t_cur"), count(lit(1)).as("nb"))
    val pr = (col("n_ref") + 1).cast("double") /
      (col("t_ref") + col("nb")).cast("double")
    val pc = (col("n_cur") + 1).cast("double") /
      (col("t_cur") + col("nb")).cast("double")
    val term = round((pc - pr) * round(log(pc / pr), 6), 6)
      .cast(org.apache.spark.sql.types.DecimalType(18, 6))
    drift.crossJoin(broadcast(totals))
      .agg(coalesce(first(col("t_ref")), lit(0L)).as("n_ref"),
        coalesce(first(col("t_cur")), lit(0L)).as("n_cur"),
        round(sum(term).cast("double"), 6).as("psi"))
      .select(col("n_ref"), col("n_cur"),
        when(col("n_ref") === 0L && col("n_cur") === 0L, lit(0.0))
          .otherwise(col("psi")).as("psi"))
  }

  /** Change-point scan over a (t, bucket, n) count matrix (time period ×
    * value bucket, e.g. day × equi-width histogram): for every period
    * boundary t the exact two-sample KS statistic between the
    * distribution BEFORE t and AT-OR-AFTER t — the retrospective "when
    * did the data change" sibling of the prospective ref-vs-cur drift
    * pair. Returns one row per boundary with a non-empty split:
    * (t, n_left, n_right, ks), ks = max CDF gap as exact
    * cross-multiplied integers over one final dec6 division (the
    * [[ksStatistic]] arithmetic).
    *
    * Shape: the caller's corpus-sized groupBy produces the matrix;
    * everything here is (periods × buckets)-sized — two triangular
    * self-joins (periods² × buckets and periods × buckets² rows on a
    * bounded frame), no windows, no corpus re-reads. Callers should hand
    * in a materialized matrix (localCheckpoint) since it is read by
    * several subplans.
    */
  def changePoints(hist: DataFrame): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(19, 0)
    val h = hist.select(col("t"), col("bucket"), col("n"))
    val days = h.select(col("t").as("bt")).distinct()
    // left counts per (boundary, bucket): Σ n over periods strictly before
    val lb = days.crossJoin(h)
      .groupBy(col("bt"), col("bucket"))
      .agg(sum(when(col("t") < col("bt"), col("n")).otherwise(0L)).as("ln"))
    // global per-bucket totals and their bucket-order cumulative
    val tb = h.groupBy("bucket").agg(sum(col("n")).as("tbn"))
    val tbc = tb
      .join(tb.select(col("bucket").as("b2"), col("tbn").as("tb2")),
        col("b2") <= col("bucket"))
      .groupBy("bucket").agg(sum(col("tb2")).as("ctb"))
    // bucket-order cumulative of the left side, per boundary
    val cl = lb
      .join(lb.select(col("bt").as("bt2"), col("bucket").as("b2"),
          col("ln").as("ln2")),
        col("bt2") === col("bt") && col("b2") <= col("bucket"))
      .groupBy("bt", "bucket").agg(sum(col("ln2")).as("cln"))
    val lsum = lb.groupBy("bt").agg(sum(col("ln")).as("n_left"))
    val tt = h.agg(sum(col("n")).as("tcount"))
    cl.join(tbc, Seq("bucket"))
      .join(lsum, Seq("bt"))
      .crossJoin(broadcast(tt)) // 1 scalar row
      .withColumn("n_right", col("tcount") - col("n_left"))
      .withColumn("g", abs(col("cln").cast(dec) * col("n_right").cast(dec) -
        (col("ctb") - col("cln")).cast(dec) * col("n_left").cast(dec)))
      .groupBy(col("bt").as("t"), col("n_left"), col("n_right"))
      .agg(max(col("g")).as("gap"))
      .filter(col("n_left") > 0L && col("n_right") > 0L)
      .select(col("t"), col("n_left"), col("n_right"),
        round(col("gap").cast("double") /
          (col("n_left").cast("double") * col("n_right").cast("double")), 6)
          .as("ks"))
  }

  /** Deterministic leave-one-group-out JACKKNIFE standard error for the
    * two-sample KS drift statistic — "how stable is this drift score
    * against any one shard of the data": rows of BOTH sides are assigned
    * to `nGroups` groups by `groupCol % nGroups`, and for each group g
    * the full KS between (ref − g) and (cur − g) is recomputed EXACTLY
    * from per-group bucket histograms (bounded algebra — never a corpus
    * re-scan): cumulative counts subtract per group, the CDF gap stays a
    * cross-multiplied integer in DECIMAL(38,0) ([[ksStatistic]]'s
    * convention), and the G held-out scores feed the shared dec6
    * jackknife tail. Bucketing matches [[driftHistogram]] exactly.
    *
    * Shape: one groupBy(grp, bucket) per side; everything after runs on
    * the (nGroups × buckets) table — triangular bucket joins (the
    * ksStatistic argument: O(buckets²) on a bounded frame beats any
    * window), one broadcast grid completion, G-row scalar algebra. One
    * row: (n_ref, n_cur, ks, n_groups, jack_se).
    */
  def ksJackknife(ref: DataFrame, cur: DataFrame, column: String,
      groupCol: String, lo: Double, width: Double, buckets: Int,
      nGroups: Int = 12): DataFrame = {
    require(nGroups >= 2, "ksJackknife: need nGroups >= 2")
    val dec38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val dec6 = org.apache.spark.sql.types.DecimalType(18, 6)
    def grp(df: DataFrame) =
      df.withColumn("__grp", pmod(col(groupCol), lit(nGroups.toLong)))
    val hg = driftHistogramBy(grp(ref), grp(cur), "__grp", column,
        lo, width, buckets)
      .withColumnRenamed("__grp", "grp")
      .localCheckpoint(true) // bounded: nGroups × buckets, read 4× below
    // empty-input pole (the ksStatistic convention): both sides empty →
    // (0, 0, ks 0.0, 0 groups, NULL se), never a one-row null frame
    if (hg.limit(1).collect().isEmpty) {
      import ref.sparkSession.implicits._
      return Seq((0L, 0L, 0.0, 0L))
        .toDF("n_ref", "n_cur", "ks", "n_groups")
        .withColumn("jack_se", lit(null).cast("double"))
    }
    val hb = hg.groupBy("bucket")
      .agg(sum(col("n_ref")).as("n_ref"), sum(col("n_cur")).as("n_cur"))
      .localCheckpoint(true) // buckets-sized
    val totals = hb.agg(sum(col("n_ref")).as("t_ref"),
      sum(col("n_cur")).as("t_cur"))
    // cumulative global counts at every bucket boundary (triangular join)
    val cumB = hb.select(col("bucket").as("b"))
      .join(hb, col("bucket") <= col("b"))
      .groupBy("b").agg(sum(col("n_ref")).as("cr"), sum(col("n_cur")).as("cc"))
      .localCheckpoint(true)
    // per-group cumulative counts at every GLOBAL bucket boundary: the
    // (bucket × grp) grid completed with zeros so a group with no mass
    // at-or-below a boundary still contributes a row
    val grid = hb.select(col("bucket").as("b"))
      .crossJoin(broadcast(hg.select(col("grp").as("gg")).distinct()))
    val cumG = grid
      .join(hg, hg("bucket") <= grid("b") && hg("grp") === grid("gg"), "left")
      .groupBy(col("b"), col("gg").as("grp"))
      .agg(coalesce(sum(col("n_ref")), lit(0L)).as("gr"),
        coalesce(sum(col("n_cur")), lit(0L)).as("gc"))
    val gt = hg.groupBy("grp")
      .agg(sum(col("n_ref")).as("g_ref"), sum(col("n_cur")).as("g_cur"))
      .localCheckpoint(true) // G rows
    val degenerate = gt.crossJoin(broadcast(totals))
      .filter(col("g_ref") === col("t_ref") || col("g_cur") === col("t_cur"))
      .limit(1).collect()
    require(degenerate.isEmpty,
      "ksJackknife: a group holds one side's every row — leave-one-" +
        "group-out KS is undefined there; use more groups")
    val aj = cumG
      .join(broadcast(cumB), Seq("b"))
      .join(broadcast(gt), Seq("grp"))
      .crossJoin(broadcast(totals))
      .select(col("grp"),
        abs((col("cr") - col("gr")).cast(dec38) *
            (col("t_cur") - col("g_cur")) -
          (col("cc") - col("gc")).cast(dec38) *
            (col("t_ref") - col("g_ref"))).as("gap"),
        // double product, not long*long: the raw product wraps silently
        // past ~3e9 rows/side where the dec38 gap above survives
        ((col("t_ref") - col("g_ref")).cast("double") *
          (col("t_cur") - col("g_cur")).cast("double")).as("den"))
      .groupBy("grp")
      .agg(round(max(col("gap")).cast("double") /
        first(col("den")), 6).cast(dec6).as("ksg"))
    val overall = cumB.crossJoin(broadcast(totals))
      .agg(coalesce(first(col("t_ref")), lit(0L)).as("n_ref"),
        coalesce(first(col("t_cur")), lit(0L)).as("n_cur"),
        round(max(abs(col("cr").cast(dec38) * col("t_cur") -
            col("cc").cast(dec38) * col("t_ref"))).cast("double") /
          (first(col("t_ref")).cast("double") *
            first(col("t_cur")).cast("double")), 6).as("ks"))
    Eval.jackknifeTail(aj, "ksg")
      .crossJoin(broadcast(overall))
      .select(col("n_ref"), col("n_cur"), col("ks"),
        col("n_groups"), col("jack_se"))
  }

  /** Jensen–Shannon divergence over a [[driftHistogram]] result — the
    * bounded symmetric member of the drift family: TV weighs count moves
    * linearly, PSI is log-sensitive but unbounded and needs add-one
    * smoothing, JS ∈ [0, ln 2] with NO smoothing — a bucket empty on one
    * side contributes its finite ½·p·ln 2 term, never infinity. Per
    * bucket ½(p·ln(p/m) + q·ln(q/m)) with m = (p+q)/2, each ln
    * dec6-rounded and each term dec6-rounded into a DECIMAL(18,6) sum
    * (the LmOps transcendental convention — cross-engine replayable).
    * One row (n_ref, n_cur, js); poles: both sides empty → 0, one side
    * empty → ln 2 (maximal).
    */
  def jsDivergence(drift: DataFrame): DataFrame = {
    val totals = drift.agg(sum(col("n_ref")).as("t_ref"),
      sum(col("n_cur")).as("t_cur"))
    // denominators floored at 1 when a side is empty: the pole branches
    // below decide those cases, but ANSI mode evaluates the aggregate
    // arguments regardless, and n/0 would abort the job before the CASE
    val p = col("n_ref").cast("double") /
      when(col("t_ref") > 0L, col("t_ref")).otherwise(lit(1L)).cast("double")
    val q = col("n_cur").cast("double") /
      when(col("t_cur") > 0L, col("t_cur")).otherwise(lit(1L)).cast("double")
    val m = (p + q) / lit(2.0)
    val termP = when(col("n_ref") > 0L, p * round(log(p / m), 6))
      .otherwise(lit(0.0))
    val termQ = when(col("n_cur") > 0L, q * round(log(q / m), 6))
      .otherwise(lit(0.0))
    val term = round((termP + termQ) / lit(2.0), 6)
      .cast(org.apache.spark.sql.types.DecimalType(18, 6))
    drift.crossJoin(broadcast(totals))
      .agg(coalesce(first(col("t_ref")), lit(0L)).as("n_ref"),
        coalesce(first(col("t_cur")), lit(0L)).as("n_cur"),
        round(sum(term).cast("double"), 6).as("js0"))
      .select(col("n_ref"), col("n_cur"),
        when(col("n_ref") === 0L && col("n_cur") === 0L, lit(0.0))
          .when(col("n_ref") === 0L || col("n_cur") === 0L, lit(0.693147))
          .otherwise(col("js0")).as("js"))
  }

  /** Kolmogorov–Smirnov statistic over a [[driftHistogram]] result: the
    * maximum CDF gap across bucket boundaries, D = max_b |F_ref(b) −
    * F_cur(b)| — TV's order-aware sibling (a distribution SHIFT moves
    * all mass one way and maximizes one cumulative gap; symmetric noise
    * that TV counts twice partially cancels in the CDF). Exact
    * cross-multiplied integers until one final rounded division, like
    * [[totalVariation]]. The cumulative sums come from a triangular
    * self-join of the buckets-sized histogram (bucket' <= bucket), not a
    * partitionless window — O(buckets²) rows on a <= buckets+2 frame is
    * nothing, and it keeps the repo's zero-tolerance plan invariant (no
    * unpartitioned Window anywhere, PlanSpec's sweep) intact. Callers
    * should hand in a materialized histogram (localCheckpoint, as the
    * gate query does) since both join sides read it. One row:
    * (n_ref, n_cur, ks); poles as in totalVariation.
    */
  def ksStatistic(drift: DataFrame): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(19, 0)
    val totals = drift.agg(sum(col("n_ref")).as("t_ref"),
      sum(col("n_cur")).as("t_cur"))
    drift.select(col("bucket"))
      .join(drift.select(col("bucket").as("b2"), col("n_ref"), col("n_cur")),
        col("b2") <= col("bucket"))
      .groupBy(col("bucket"))
      .agg(sum(col("n_ref")).as("c_ref"), sum(col("n_cur")).as("c_cur"))
      .crossJoin(broadcast(totals))
      .agg(coalesce(first(col("t_ref")), lit(0L)).as("n_ref"),
        coalesce(first(col("t_cur")), lit(0L)).as("n_cur"),
        max(abs(col("c_ref").cast(dec) * col("t_cur").cast(dec) -
          col("c_cur").cast(dec) * col("t_ref").cast(dec))).as("gap"))
      .select(col("n_ref"), col("n_cur"),
        when(col("n_ref") === 0L && col("n_cur") === 0L, lit(0.0))
          .when(col("n_ref") === 0L || col("n_cur") === 0L, lit(1.0))
          .otherwise(round(col("gap").cast("double") /
            (col("n_ref").cast("double") * col("n_cur").cast("double")),
            6)).as("ks"))
  }

  def totalVariation(drift: DataFrame): DataFrame = {
    // DECIMAL(19,0) inputs -> exact DECIMAL(38,0) products (counts are
    // < 1e12 even at 100 TB; 19+19 digits never truncates)
    val dec = org.apache.spark.sql.types.DecimalType(19, 0)
    val totals = drift.agg(sum(col("n_ref")).as("t_ref"),
      sum(col("n_cur")).as("t_cur"))
    drift.crossJoin(broadcast(totals))
      .agg(coalesce(first(col("t_ref")), lit(0L)).as("n_ref"),
        coalesce(first(col("t_cur")), lit(0L)).as("n_cur"),
        sum(abs(col("n_ref").cast(dec) * col("t_cur").cast(dec) -
          col("n_cur").cast(dec) * col("t_ref").cast(dec))).as("l1"))
      .select(col("n_ref"), col("n_cur"),
        // poles, not NaN: one empty side is MAXIMAL drift (tv = 1) — an
        // empty current crawl must trip, not NaN past, a tv threshold;
        // two empty sides have nothing to compare (tv = 0). The general
        // case divides the exact L1 once.
        when(col("n_ref") === 0L && col("n_cur") === 0L, lit(0.0))
          .when(col("n_ref") === 0L || col("n_cur") === 0L, lit(1.0))
          .otherwise(round(col("l1").cast("double") /
            (lit(2.0) * col("n_ref").cast("double") * col("n_cur").cast("double")),
            6)).as("tv"))
  }
}
