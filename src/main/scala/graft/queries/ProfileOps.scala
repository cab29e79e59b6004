package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import Q._

/** Corpus profiling + data-quality gating under the DuckDB hash gate:
  * the one-pass validation suite (ops/Validate), equi-width histograms,
  * and exact decimal correlation — the health-check pass a pipeline runs
  * over an incoming 100 TB drop before spending cluster time on it.
  */
object ProfileOps {

  type Fn = (SparkSession, String) => DataFrame

  /** Per-customer revenue in exact cents — ONE derivation shared by
    * q_gini (the scalar) and q_lorenz (the curve) so the two views of
    * the same distribution cannot drift (the funnelStages rationale).
    */
  private def custRevenue(s: SparkSession, d: String): DataFrame =
    t(s, d, "orders")
      .groupBy(col("o_custkey"))
      .agg(sum(cents(col("o_totalprice"))).as("x"))

  val entries: Seq[(String, Fn, String)] = Seq(

    // -- one-pass validation suite: nine constraints over lineitem in a
    //    single agg (one scan; the plan shape is asserted in ValidateSpec).
    //    The suite deliberately includes a FAILING check (uniqueness of
    //    l_orderkey at 1.0 — lineitem has ~4 rows per order) so the gate
    //    pins both verdict polarities. Booleans emitted as 0/1 longs -----
    ("q_validate",
      (s: SparkSession, d: String) => {
        import graft.ops.Validate
        import graft.ops.Validate.Checks._
        val li = t(s, d, "lineitem")
        Validate.run(li, Seq(
            completeness("l_returnflag"),
            uniqueness("l_orderkey"), // FAILS: ~4 lines per order
            minBound("l_quantity", 1.0),
            maxBound("l_discount", 0.11),
            meanBetween("l_tax", 0.0, 0.08),
            containedIn("l_linestatus", Seq("O", "F")),
            matches("l_returnflag", "^[ANR]$"),
            sizeBetween(1L),
            compliance("price_positive",
              col("l_extendedprice") > 0 && col("l_quantity") <= 60)))
          .withColumn("passed", col("passed").cast("long"))
          .orderBy("check_name")
      },
      """WITH m AS (SELECT
        |  count(l_returnflag) * 1.0 / count(*) AS completeness_rf,
        |  count(DISTINCT l_orderkey) * 1.0 / count(l_orderkey) AS uniq_ok,
        |  cast(min(l_quantity) AS DOUBLE) AS min_qty,
        |  cast(max(l_discount) AS DOUBLE) AS max_disc,
        |  round(cast(sum(cast(l_tax AS DECIMAL(18,6))) AS DOUBLE) / count(l_tax), 4) AS mean_tax,
        |  count(CASE WHEN l_linestatus IN ('O','F') THEN 1 END) * 1.0 / count(l_linestatus) AS contained_ls,
        |  count(CASE WHEN regexp_matches(l_returnflag, '^[ANR]$') THEN 1 END) * 1.0 / count(l_returnflag) AS matches_rf,
        |  cast(count(*) AS DOUBLE) AS sz,
        |  count(CASE WHEN l_extendedprice > 0 AND l_quantity <= 60 THEN 1 END) * 1.0 / count(*) AS compl_price
        |FROM lineitem)
        |SELECT * FROM (
        |  SELECT 'completeness:l_returnflag' AS check_name, completeness_rf AS observed,
        |    CAST(CASE WHEN completeness_rf >= 1.0 THEN 1 ELSE 0 END AS BIGINT) AS passed FROM m
        |  UNION ALL SELECT 'uniqueness:l_orderkey', uniq_ok,
        |    CAST(CASE WHEN uniq_ok >= 1.0 THEN 1 ELSE 0 END AS BIGINT) FROM m
        |  UNION ALL SELECT 'min:l_quantity', min_qty,
        |    CAST(CASE WHEN min_qty >= 1.0 THEN 1 ELSE 0 END AS BIGINT) FROM m
        |  UNION ALL SELECT 'max:l_discount', max_disc,
        |    CASE WHEN max_disc <= 0.11 THEN 1 ELSE 0 END FROM m
        |  UNION ALL SELECT 'mean:l_tax', mean_tax,
        |    CASE WHEN mean_tax >= 0.0 AND mean_tax <= 0.08 THEN 1 ELSE 0 END FROM m
        |  UNION ALL SELECT 'contained_in:l_linestatus', contained_ls,
        |    CASE WHEN contained_ls >= 1.0 THEN 1 ELSE 0 END FROM m
        |  UNION ALL SELECT 'matches:l_returnflag', matches_rf,
        |    CASE WHEN matches_rf >= 1.0 THEN 1 ELSE 0 END FROM m
        |  UNION ALL SELECT 'size', sz,
        |    CASE WHEN sz >= 1 THEN 1 ELSE 0 END FROM m
        |  UNION ALL SELECT 'compliance:price_positive', compl_price,
        |    CASE WHEN compl_price >= 1.0 THEN 1 ELSE 0 END FROM m
        |) ORDER BY check_name""".stripMargin),

    // -- equi-width histogram with FIXED bucket arithmetic (floor of the
    //    same IEEE double division in both engines — no two-pass min/max,
    //    so the layout is one scan + one hash agg). Overflow bucket
    //    clamped with least(): at 100 TB the bucket count, not the data,
    //    bounds the result size ------------------------------------------
    ("q_histogram",
      (s: SparkSession, d: String) => {
        val li = t(s, d, "lineitem")
        li.select(least(floor(col("l_extendedprice") / 10000.0), lit(10L))
            .cast("long").as("bucket"),
            col("l_extendedprice"))
          .groupBy("bucket")
          .agg(count(lit(1)).as("n"),
            sum(cents(col("l_extendedprice"))).as("sum_cents"))
          .orderBy("bucket")
      },
      """SELECT least(cast(floor(l_extendedprice / 10000.0) AS BIGINT), 10) AS bucket,
        |  count(*) AS n,
        |  cast(sum(cast(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_cents
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin),

    // -- exact Pearson correlation from integer-exact moments: quantity
    //    (small ints stored as double) vs extendedprice in exact cents.
    //    Naive double corr() differs between engines in the last ulps
    //    (different partial-sum orders); sums of LONG products carried in
    //    DECIMAL(38,0) are order-independent and identical, so the final
    //    double formula rounds identically. One scan, one-row exchange --
    ("q_corr",
      (s: SparkSession, d: String) => {
        val li = t(s, d, "lineitem")
          .select(col("l_quantity").cast("long").as("q"),
            cents(col("l_extendedprice")).as("p"))
        val dec = DecimalType(38, 0)
        val agg = li.agg(
          count(lit(1)).cast(dec).as("n"),
          sum(col("q").cast(dec)).as("sq"),
          sum(col("p").cast(dec)).as("sp"),
          sum((col("q") * col("q")).cast(dec)).as("sqq"),
          sum((col("p") * col("p")).cast(dec)).as("spp"),
          sum((col("q") * col("p")).cast(dec)).as("sqp"))
        // the moments are EXACT (decimal); the closed-form combination
        // runs in doubles with the IDENTICAL expression tree as the
        // oracle SQL below — same IEEE ops in the same order → the same
        // bits, before the defensive round(…, 6)
        val nd = col("n").cast("double"); val sqd = col("sq").cast("double")
        val spd = col("sp").cast("double"); val sqqd = col("sqq").cast("double")
        val sppd = col("spp").cast("double"); val sqpd = col("sqp").cast("double")
        agg.select(
          round((nd * sqpd - sqd * spd) /
            sqrt((nd * sqqd - sqd * sqd) * (nd * sppd - spd * spd)), 6)
            .as("corr_qty_price"),
          col("n").cast("long").as("n_rows"))
      },
      """WITH b AS (SELECT cast(l_quantity AS BIGINT) AS q,
        |             cast(round(l_extendedprice * 100) AS BIGINT) AS p
        |           FROM lineitem),
        |a AS (SELECT cast(count(*) AS DOUBLE) AS n,
        |  cast(sum(cast(q AS DECIMAL(38,0))) AS DOUBLE) AS sq,
        |  cast(sum(cast(p AS DECIMAL(38,0))) AS DOUBLE) AS sp,
        |  cast(sum(cast(q * q AS DECIMAL(38,0))) AS DOUBLE) AS sqq,
        |  cast(sum(cast(p * p AS DECIMAL(38,0))) AS DOUBLE) AS spp,
        |  cast(sum(cast(q * p AS DECIMAL(38,0))) AS DOUBLE) AS sqp,
        |  count(*) AS nn
        |FROM b)
        |SELECT round((n * sqp - sq * sp) /
        |  sqrt((n * sqq - sq * sq) * (n * spp - sp * sp)), 6)
        |  AS corr_qty_price,
        |  cast(nn AS BIGINT) AS n_rows
        |FROM a""".stripMargin),

    // -- keyed pseudonymization (Privacy.tokenize): customer and order
    //    keys tokenized INDEPENDENTLY under one secret, then joined ON
    //    THE TOKENS — equality with the raw-key join proves deterministic
    //    consistency, and min(token) pins the exact sha256 bytes
    //    cross-engine. Map-side expression; the join shape is unchanged --
    ("q_tokenize",
      (s: SparkSession, d: String) => {
        val secret = "s3cret"
        val cust = t(s, d, "customer").select(
          graft.ops.Privacy.tokenizeExpr(col("c_custkey"), secret).as("tok"),
          col("c_mktsegment"))
        val ord = t(s, d, "orders").select(
          graft.ops.Privacy.tokenizeExpr(col("o_custkey"), secret).as("tok"),
          col("o_totalprice"))
        cust.join(ord, "tok")
          .groupBy("c_mktsegment")
          .agg(count(lit(1)).as("n_orders"),
            sum(cents(col("o_totalprice"))).as("total_cents"),
            min(col("tok")).as("min_token"))
          .orderBy("c_mktsegment")
      },
      """WITH c AS (SELECT sha256('6|s3cret' ||
        |    length(cast(c_custkey AS VARCHAR)) || '|' ||
        |    cast(c_custkey AS VARCHAR)) AS tok, c_mktsegment
        |  FROM customer),
        |o AS (SELECT sha256('6|s3cret' ||
        |    length(cast(o_custkey AS VARCHAR)) || '|' ||
        |    cast(o_custkey AS VARCHAR)) AS tok, o_totalprice
        |  FROM orders)
        |SELECT c_mktsegment, count(*) AS n_orders,
        |  cast(sum(cast(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_cents,
        |  min(tok) AS min_token
        |FROM c JOIN o USING (tok)
        |GROUP BY 1 ORDER BY 1""".stripMargin),

    // -- per-GROUP validation: the same one-pass suite keyed by source —
    //    a poisoned crawl seed hides inside a global average, so the gate
    //    runs per origin. Three checks × sources, one hash aggregate ----
    ("q_validate_by_source",
      (s: SparkSession, d: String) => {
        import graft.ops.Validate
        import graft.ops.Validate.Checks._
        Validate.runGrouped(t(s, d, "documents"), Seq("source"), Seq(
            completeness("text"),
            meanBetween("n_chars", 100.0, 2000.0),
            uniqueness("doc_id")))
          .withColumn("passed", col("passed").cast("long"))
      },
      """WITH m AS (SELECT source,
        |  count(text) * 1.0 / count(*) AS compl,
        |  round(cast(sum(cast(n_chars AS DECIMAL(18,6))) AS DOUBLE) / count(n_chars), 4) AS mean_nc,
        |  count(DISTINCT doc_id) * 1.0 / count(doc_id) AS uniq
        |FROM documents GROUP BY 1)
        |SELECT * FROM (
        |  SELECT source, 'completeness:text' AS check_name, compl AS observed,
        |    CAST(CASE WHEN compl >= 1.0 THEN 1 ELSE 0 END AS BIGINT) AS passed FROM m
        |  UNION ALL SELECT source, 'mean:n_chars', mean_nc,
        |    CAST(CASE WHEN mean_nc >= 100.0 AND mean_nc <= 2000.0 THEN 1 ELSE 0 END AS BIGINT) FROM m
        |  UNION ALL SELECT source, 'uniqueness:doc_id', uniq,
        |    CAST(CASE WHEN uniq >= 1.0 THEN 1 ELSE 0 END AS BIGINT) FROM m
        |) ORDER BY source, check_name""".stripMargin),

    // -- z-score outlier screen from the same exact-moment machinery as
    //    q_corr: global mean/std of extendedprice from DECIMAL(38,0) cent
    //    sums (one scan, one-row broadcast back onto the rows), flag
    //    |x - mean| > 1.5σ (the synthetic prices are ~uniform, whose
    //    max deviation is ~1.7σ — 2.5σ would select nothing anywhere). The one-row side joins with a broadcast, so
    //    nothing corpus-sized shuffles; boundary comparisons are safe
    //    cross-engine because both sides evaluate the IDENTICAL double
    //    expression tree over identical exact sums ----------------------
    ("q_outliers",
      (s: SparkSession, d: String) => {
        val dec = DecimalType(38, 0)
        val li = t(s, d, "lineitem")
          .select(col("l_returnflag"), cents(col("l_extendedprice")).as("p"))
        val m = li.agg(
          count(lit(1)).cast(dec).as("n"),
          sum(col("p").cast(dec)).as("sp"),
          sum((col("p") * col("p")).cast(dec)).as("spp"))
        val nd = col("n").cast("double"); val spd = col("sp").cast("double")
        val sppd = col("spp").cast("double")
        val stats = m.select(
          (spd / nd).as("mean"),
          sqrt((sppd - spd * spd / nd) / (nd - 1.0)).as("sd"))
        li.crossJoin(broadcast(stats))
          .filter(abs(col("p").cast("double") - col("mean")) >
            col("sd") * 1.5)
          .groupBy("l_returnflag")
          .agg(count(lit(1)).as("n_outliers"),
            min(col("p")).as("min_cents"),
            max(col("p")).as("max_cents"))
          .orderBy("l_returnflag")
      },
      """WITH b AS (SELECT l_returnflag,
        |             cast(round(l_extendedprice * 100) AS BIGINT) AS p
        |           FROM lineitem),
        |a AS (SELECT cast(count(*) AS DOUBLE) AS n,
        |        cast(sum(cast(p AS DECIMAL(38,0))) AS DOUBLE) AS sp,
        |        cast(sum(cast(p * p AS DECIMAL(38,0))) AS DOUBLE) AS spp
        |      FROM b),
        |st AS (SELECT sp / n AS mean,
        |         sqrt((spp - sp * sp / n) / (n - 1.0)) AS sd FROM a)
        |SELECT l_returnflag, count(*) AS n_outliers,
        |  min(p) AS min_cents, max(p) AS max_cents
        |FROM b CROSS JOIN st
        |WHERE abs(cast(p AS DOUBLE) - mean) > sd * 1.5
        |GROUP BY 1 ORDER BY 1""".stripMargin),

    // -- distribution drift between corpus versions (Validate.
    //    driftHistogram + totalVariation): the current side simulates a
    //    shifted re-crawl (long docs truncated away, short docs doubled);
    //    the report is the per-bucket histogram pair plus the exact
    //    total-variation distance (cross-multiplied integer L1 over
    //    2·N_ref·N_cur, one final rounded division). Two aggregations +
    //    a buckets-sized join — never data-sized ------------------------
    ("q_drift",
      (s: SparkSession, d: String) => {
        val docs = t(s, d, "documents")
        val cur = docs.filter(col("n_chars") <= 450)
          .unionByName(docs.filter(col("n_chars") < 150))
        // the drift result is buckets-sized — materialize it ONCE so the
        // fan-out (output rows + the two aggregations inside
        // totalVariation) does not re-scan documents per consumer
        val drift = graft.ops.Validate.driftHistogram(
            docs, cur, "n_chars", lo = 0.0, width = 50.0, buckets = 10)
          .localCheckpoint(true)
        drift.crossJoin(broadcast(
            graft.ops.Validate.totalVariation(drift).select(col("tv"))))
          .orderBy("bucket")
      },
      """WITH ref AS (
        |  SELECT cast(least(greatest(floor((cast(n_chars AS DOUBLE) - 0.0) / 50.0), -1), 10) AS BIGINT) AS bucket,
        |         count(*) AS n_ref
        |  FROM documents WHERE n_chars IS NOT NULL GROUP BY 1),
        |cur0 AS (
        |  SELECT n_chars FROM documents WHERE n_chars <= 450
        |  UNION ALL SELECT n_chars FROM documents WHERE n_chars < 150),
        |cur AS (
        |  SELECT cast(least(greatest(floor((cast(n_chars AS DOUBLE) - 0.0) / 50.0), -1), 10) AS BIGINT) AS bucket,
        |         count(*) AS n_cur
        |  FROM cur0 WHERE n_chars IS NOT NULL GROUP BY 1),
        |j AS (
        |  SELECT coalesce(r.bucket, c.bucket) AS bucket,
        |         coalesce(n_ref, 0) AS n_ref, coalesce(n_cur, 0) AS n_cur
        |  FROM ref r FULL OUTER JOIN cur c ON r.bucket = c.bucket),
        |t AS (SELECT cast(sum(n_ref) AS BIGINT) AS tr,
        |             cast(sum(n_cur) AS BIGINT) AS tc FROM j),
        |l AS (SELECT sum(abs(cast(n_ref AS HUGEINT) * tc - cast(n_cur AS HUGEINT) * tr)) AS l1
        |      FROM j, t)
        |SELECT bucket, n_ref, n_cur,
        |  round(cast(l1 AS DOUBLE) / (2.0 * tr * tc), 6) AS tv
        |FROM j, t, l ORDER BY bucket""".stripMargin),

    // -- drift TREND: exact total variation of the event_type distribution
    //    between every pair of CONSECUTIVE days — the time-series form of
    //    q_drift (one pinned reference there, a rolling day-over-day
    //    compare here, the alert-on-sudden-shift monitor a daily ingest
    //    wants). Same exact-integer TV: per-(day, type) counts, the
    //    next day's histogram shifted onto the previous day by a day-1
    //    self-join, |n_a·t_b − n_b·t_a| cross-multiplied in integers and
    //    divided once at the end. Everything after the first groupBy is
    //    days×types-sized — the corpus is scanned exactly once ------------
    ("q_drift_trend",
      (s: SparkSession, d: String) => {
        val h = t(s, d, "events")
          .select(expr("ts div 86400000000000L").as("day"), col("event_type"))
          .groupBy("day", "event_type").agg(count(lit(1)).as("n"))
          .localCheckpoint(true) // several consumers below; scan events once
        // days with a successor — only consecutive PAIRS get a tv row
        val paired = h.select(col("day")).distinct()
          .join(h.select((col("day") - 1).as("day")).distinct(), "day")
        // (day, per-type ref=day cur=day+1 counts) → the shared per-group
        // exact-TV machinery (decimal cross-multiply — raw longs would
        // overflow at warehouse counts; one implementation, not two)
        val j = h.select(col("day"), col("event_type"), col("n").as("n_ref"))
          .join(h.select((col("day") - 1).as("day"), col("event_type"),
            col("n").as("n_cur")), Seq("day", "event_type"), "full_outer")
          .select(col("day"), coalesce(col("n_ref"), lit(0L)).as("n_ref"),
            coalesce(col("n_cur"), lit(0L)).as("n_cur"))
          .join(paired, "day")
        graft.ops.Validate.totalVariationBy(j, "day")
          .select(col("day"), (col("day") + 1).as("next_day"),
            col("n_ref").as("n_day"), col("n_cur").as("n_next"), col("tv"))
          .orderBy("day")
      },
      """WITH h AS (
        |  SELECT epoch_ms(ts) // 86400000 AS day, event_type,
        |         CAST(count(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1, 2),
        |tot AS (SELECT day, CAST(sum(n) AS BIGINT) AS t FROM h GROUP BY 1),
        |pairs AS (SELECT a.day AS day, a.t AS ta, b.t AS tb
        |          FROM tot a JOIN tot b ON b.day = a.day + 1),
        |j AS (
        |  SELECT coalesce(x.day, y.day) AS day,
        |         coalesce(x.n, 0) AS n_a, coalesce(y.n, 0) AS n_b
        |  FROM h x FULL OUTER JOIN
        |       (SELECT day - 1 AS day, event_type, n FROM h) y
        |    ON x.day = y.day AND x.event_type = y.event_type),
        |l AS (
        |  SELECT day, ta, tb,
        |         sum(abs(CAST(n_a AS HUGEINT) * tb - CAST(n_b AS HUGEINT) * ta)) AS l1
        |  FROM j JOIN pairs USING (day) GROUP BY 1, 2, 3)
        |SELECT day, day + 1 AS next_day, ta AS n_day, tb AS n_next,
        |  round(CAST(l1 AS DOUBLE) / (2.0 * ta * tb), 6) AS tv
        |FROM l ORDER BY day""".stripMargin),

    // -- the standard drift-monitoring TRIPLE on one histogram: exact TV
    //    (linear mass moves), PSI (log-sensitive share collapse/explosion,
    //    add-one smoothed, every ln rounded to 6 per the LmOps
    //    transcendental convention, terms decimal-summed order-free) and
    //    the KS statistic (max CDF gap — exact cross-multiplied integers
    //    like TV; its cumulative window runs over the buckets-sized
    //    aggregate, never data). One buckets-sized frame feeds all three -
    ("q_drift_psi",
      (s: SparkSession, d: String) => {
        val docs = t(s, d, "documents")
        val cur = docs.filter(col("n_chars") <= 450)
          .unionByName(docs.filter(col("n_chars") < 150))
        val drift = graft.ops.Validate.driftHistogram(
            docs, cur, "n_chars", lo = 0.0, width = 50.0, buckets = 10)
          .localCheckpoint(true)
        graft.ops.Validate.totalVariation(drift)
          .crossJoin(broadcast(
            graft.ops.Validate.psi(drift).select(col("psi"))))
          .crossJoin(broadcast(
            graft.ops.Validate.ksStatistic(drift).select(col("ks"))))
      },
      """WITH ref AS (
        |  SELECT cast(least(greatest(floor((cast(n_chars AS DOUBLE) - 0.0) / 50.0), -1), 10) AS BIGINT) AS bucket,
        |         count(*) AS n_ref
        |  FROM documents WHERE n_chars IS NOT NULL GROUP BY 1),
        |cur0 AS (
        |  SELECT n_chars FROM documents WHERE n_chars <= 450
        |  UNION ALL SELECT n_chars FROM documents WHERE n_chars < 150),
        |cur AS (
        |  SELECT cast(least(greatest(floor((cast(n_chars AS DOUBLE) - 0.0) / 50.0), -1), 10) AS BIGINT) AS bucket,
        |         count(*) AS n_cur
        |  FROM cur0 WHERE n_chars IS NOT NULL GROUP BY 1),
        |j AS (
        |  SELECT coalesce(r.bucket, c.bucket) AS bucket,
        |         coalesce(n_ref, 0) AS n_ref, coalesce(n_cur, 0) AS n_cur
        |  FROM ref r FULL OUTER JOIN cur c ON r.bucket = c.bucket),
        |t AS (SELECT cast(sum(n_ref) AS BIGINT) AS tr,
        |             cast(sum(n_cur) AS BIGINT) AS tc, count(*) AS nb FROM j),
        |l AS (SELECT sum(abs(cast(n_ref AS HUGEINT) * tc - cast(n_cur AS HUGEINT) * tr)) AS l1
        |      FROM j, t),
        |p AS (SELECT round(cast(sum(cast(round(
        |        ((cast(n_cur + 1 AS DOUBLE) / (tc + nb)) - (cast(n_ref + 1 AS DOUBLE) / (tr + nb))) *
        |        round(ln((cast(n_cur + 1 AS DOUBLE) / (tc + nb)) / (cast(n_ref + 1 AS DOUBLE) / (tr + nb))), 6)
        |      , 6) AS DECIMAL(18,6))) AS DOUBLE), 6) AS psi FROM j, t),
        |cum AS (SELECT bucket, sum(n_ref) OVER (ORDER BY bucket) AS cr,
        |               sum(n_cur) OVER (ORDER BY bucket) AS cc FROM j),
        |k AS (SELECT max(abs(cast(cr AS HUGEINT) * tc - cast(cc AS HUGEINT) * tr)) AS gap
        |      FROM cum, t)
        |SELECT tr AS n_ref, tc AS n_cur,
        |  round(cast(l1 AS DOUBLE) / (2.0 * tr * tc), 6) AS tv,
        |  psi,
        |  round(cast(gap AS DOUBLE) / (cast(tr AS DOUBLE) * tc), 6) AS ks
        |FROM t, l, p, k""".stripMargin),

    // -- per-group EXACT percentiles (discrete: the value at rank
    //    ceil(p·n)) — the per-source SLA/length report. One shuffle on the
    //    group key; the rank and count windows share that partitioning.
    //    Ties in the sort are harmless: the VALUE at rank k is unique even
    //    when row order among equals is not. For groups too large to sort
    //    within a partition, the global selection machinery
    //    (StatsOps.exactPercentiles) applies per group instead ------------
    ("q_group_quantiles",
      (s: SparkSession, d: String) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("lang").orderBy("n_chars")
        // the count window is NOT redundant with max(rn): the rank test
        // rn = ceil(p*n) needs n PER ROW, before aggregation; both windows
        // share the one group-keyed exchange
        val wAll = org.apache.spark.sql.expressions.Window.partitionBy("lang")
        t(s, d, "documents").select(col("lang"), col("n_chars"))
          .withColumn("rn", row_number().over(w))
          .withColumn("n", count(lit(1)).over(wAll))
          .groupBy("lang")
          .agg(first(col("n")).as("n"),
            max(when(col("rn") === ceil(col("n") * 0.5).cast("long"),
              col("n_chars"))).as("p50"),
            max(when(col("rn") === ceil(col("n") * 0.9).cast("long"),
              col("n_chars"))).as("p90"))
          .orderBy("lang")
      },
      """WITH r AS (
        |  SELECT lang, n_chars,
        |    row_number() OVER (PARTITION BY lang ORDER BY n_chars) AS rn,
        |    count(*) OVER (PARTITION BY lang) AS n
        |  FROM documents)
        |SELECT lang, cast(max(n) AS BIGINT) AS n,
        |  max(CASE WHEN rn = cast(ceil(n * 0.5) AS BIGINT) THEN n_chars END) AS p50,
        |  max(CASE WHEN rn = cast(ceil(n * 0.9) AS BIGINT) THEN n_chars END) AS p90
        |FROM r GROUP BY 1 ORDER BY 1""".stripMargin),

    // -- PER-SOURCE drift: the same shifted re-crawl, keyed by source —
    //    a poisoned seed's distribution shift is visible per group where
    //    the global histogram averages it away. One aggregation per side,
    //    groups×buckets join, per-group exact TV ------------------------
    ("q_drift_by_source",
      (s: SparkSession, d: String) => {
        val docs = t(s, d, "documents")
        val cur = docs.filter(col("n_chars") <= 450)
          .unionByName(docs.filter(col("n_chars") < 150))
        val drift = graft.ops.Validate.driftHistogramBy(
          docs, cur, "source", "n_chars", lo = 0.0, width = 50.0, buckets = 10)
        graft.ops.Validate.totalVariationBy(drift, "source")
          .orderBy("source")
      },
      """WITH ref AS (
        |  SELECT source,
        |    cast(least(greatest(floor((cast(n_chars AS DOUBLE) - 0.0) / 50.0), -1), 10) AS BIGINT) AS bucket,
        |    count(*) AS n_ref
        |  FROM documents WHERE n_chars IS NOT NULL GROUP BY 1, 2),
        |cur0 AS (
        |  SELECT source, n_chars FROM documents WHERE n_chars <= 450
        |  UNION ALL SELECT source, n_chars FROM documents WHERE n_chars < 150),
        |cur AS (
        |  SELECT source,
        |    cast(least(greatest(floor((cast(n_chars AS DOUBLE) - 0.0) / 50.0), -1), 10) AS BIGINT) AS bucket,
        |    count(*) AS n_cur
        |  FROM cur0 WHERE n_chars IS NOT NULL GROUP BY 1, 2),
        |j AS (
        |  SELECT coalesce(r.source, c.source) AS source,
        |         coalesce(r.bucket, c.bucket) AS bucket,
        |         coalesce(n_ref, 0) AS n_ref, coalesce(n_cur, 0) AS n_cur
        |  FROM ref r FULL OUTER JOIN cur c ON r.source = c.source AND r.bucket = c.bucket),
        |t AS (SELECT source, cast(sum(n_ref) AS BIGINT) AS tr,
        |             cast(sum(n_cur) AS BIGINT) AS tc FROM j GROUP BY 1),
        |l AS (SELECT j.source,
        |        sum(abs(cast(n_ref AS HUGEINT) * tc - cast(n_cur AS HUGEINT) * tr)) AS l1
        |      FROM j JOIN t ON j.source = t.source GROUP BY 1)
        |SELECT t.source, tr AS n_ref, tc AS n_cur,
        |  CASE WHEN tr = 0 AND tc = 0 THEN 0.0
        |       WHEN tr = 0 OR tc = 0 THEN 1.0
        |       ELSE round(cast(l1 AS DOUBLE) / (2.0 * tr * tc), 6) END AS tv
        |FROM t JOIN l ON t.source = l.source ORDER BY t.source""".stripMargin),

    // -- whole-table column profile in ONE scan: per column (as rows) the
    //    null count, exact distinct count, and min/max rendered as text —
    //    the catalog-statistics snapshot a planner or a data contract
    //    wants. The exact countDistinct per column rides one Expand (rows
    //    × columns — the documented price of exactness; the HLL form is
    //    the monitoring variant, q_validate's approxUniqueness) ----------
    ("q_column_profile",
      (s: SparkSession, d: String) => {
        val docs = t(s, d, "documents")
        val cols = Seq("doc_id", "lang", "source", "n_chars")
        val aggs = cols.flatMap(c => Seq(
          sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"nulls_$c"),
          countDistinct(col(c)).as(s"ndv_$c"),
          min(col(c)).cast("string").as(s"min_$c"),
          max(col(c)).cast("string").as(s"max_$c")))
        val one = docs.agg(aggs.head, aggs.tail: _*)
        val rows = cols.map(c => struct(lit(c).as("col_name"),
          col(s"nulls_$c").as("nulls"), col(s"ndv_$c").as("ndv"),
          col(s"min_$c").as("min_s"), col(s"max_$c").as("max_s")))
        one.select(explode(array(rows: _*)).as("r")).select("r.*")
          .orderBy("col_name")
      },
      """WITH m AS (SELECT
        |  cast(sum(CASE WHEN doc_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nulls_doc_id,
        |  count(DISTINCT doc_id) AS ndv_doc_id,
        |  cast(min(doc_id) AS VARCHAR) AS min_doc_id, cast(max(doc_id) AS VARCHAR) AS max_doc_id,
        |  cast(sum(CASE WHEN lang IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nulls_lang,
        |  count(DISTINCT lang) AS ndv_lang,
        |  min(lang) AS min_lang, max(lang) AS max_lang,
        |  cast(sum(CASE WHEN source IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nulls_source,
        |  count(DISTINCT source) AS ndv_source,
        |  min(source) AS min_source, max(source) AS max_source,
        |  cast(sum(CASE WHEN n_chars IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nulls_n_chars,
        |  count(DISTINCT n_chars) AS ndv_n_chars,
        |  cast(min(n_chars) AS VARCHAR) AS min_n_chars, cast(max(n_chars) AS VARCHAR) AS max_n_chars
        |FROM documents)
        |SELECT 'doc_id' AS col_name, nulls_doc_id AS nulls, ndv_doc_id AS ndv,
        |       min_doc_id AS min_s, max_doc_id AS max_s FROM m
        |UNION ALL SELECT 'lang', nulls_lang, ndv_lang, min_lang, max_lang FROM m
        |UNION ALL SELECT 'n_chars', nulls_n_chars, ndv_n_chars, min_n_chars, max_n_chars FROM m
        |UNION ALL SELECT 'source', nulls_source, ndv_source, min_source, max_source FROM m
        |ORDER BY col_name""".stripMargin),

    // -- chi-square test of independence lang × source over documents,
    //    INCLUDING the zero cells the observed contingency omits (an
    //    unobserved pair still contributes its expected mass). One
    //    corpus-sized groupBy(lang, source); everything after is
    //    category-product-sized broadcast algebra. Per-cell terms
    //    (O·N − R·C)²/(R·C·N) are dec6-rounded doubles summed as
    //    DECIMAL(18,6) — the q_lm_xent convention; Cramér's V derives
    //    from the same exact sum -----------------------------------------
    ("q_chisq",
      (s: SparkSession, d: String) =>
        graft.ops.Eval.chiSquare(t(s, d, "documents"), "lang", "source"),
      """WITH cells AS MATERIALIZED (SELECT lang AS x, source AS y,
        |         CAST(count(*) AS BIGINT) AS n
        |       FROM documents WHERE lang IS NOT NULL AND source IS NOT NULL
        |       GROUP BY 1, 2),
        |rx AS (SELECT x, CAST(sum(n) AS BIGINT) AS nx FROM cells GROUP BY 1),
        |ry AS (SELECT y, CAST(sum(n) AS BIGINT) AS ny FROM cells GROUP BY 1),
        |tt AS (SELECT CAST(sum(n) AS BIGINT) AS nn FROM cells),
        |dims AS (SELECT (SELECT count(*) FROM rx) AS r,
        |                (SELECT count(*) FROM ry) AS c),
        |grid AS (SELECT nx, ny, coalesce(cl.n, 0) AS n
        |         FROM rx CROSS JOIN ry
        |         LEFT JOIN cells cl ON cl.x = rx.x AND cl.y = ry.y),
        |terms AS (SELECT nn,
        |    cast(round(cast(cast(n AS HUGEINT) * nn - cast(nx AS HUGEINT) * ny AS DOUBLE)
        |               * cast(cast(n AS HUGEINT) * nn - cast(nx AS HUGEINT) * ny AS DOUBLE)
        |               / (cast(nx AS DOUBLE) * cast(ny AS DOUBLE)
        |                  * cast(nn AS DOUBLE)), 6) AS DECIMAL(18,6)) AS term
        |  FROM grid CROSS JOIN tt),
        |agg AS (SELECT nn, sum(term) AS chi2s FROM terms GROUP BY nn)
        |SELECT nn AS n_rows,
        |  (r - 1) * (c - 1) AS dof,
        |  cast(chi2s AS DOUBLE) AS chi2,
        |  round(sqrt(cast(chi2s AS DOUBLE)
        |    / cast(nn * least(r - 1, c - 1) AS DOUBLE)), 6) AS cramers_v
        |FROM agg CROSS JOIN dims""".stripMargin),

    // -- pointwise mutual information table over the same contingency:
    //    one row per observed (lang, source) cell with its dec6 PMI —
    //    scalar MI = Σ n_cell·pmi / N derives exactly. Same one-shuffle
    //    shape as q_chisq --------------------------------------------------
    ("q_mutual_info",
      (s: SparkSession, d: String) =>
        graft.ops.Eval.pmiTable(t(s, d, "documents"), "lang", "source")
          .select(col("x").as("lang"), col("y").as("source"),
            col("n_cell"), col("pmi"))
          .orderBy("lang", "source"),
      """WITH cells AS MATERIALIZED (SELECT lang AS x, source AS y,
        |         CAST(count(*) AS BIGINT) AS n_cell
        |       FROM documents WHERE lang IS NOT NULL AND source IS NOT NULL
        |       GROUP BY 1, 2),
        |rx AS (SELECT x, CAST(sum(n_cell) AS BIGINT) AS nx FROM cells GROUP BY 1),
        |ry AS (SELECT y, CAST(sum(n_cell) AS BIGINT) AS ny FROM cells GROUP BY 1),
        |tt AS (SELECT CAST(sum(n_cell) AS BIGINT) AS nn FROM cells)
        |SELECT c.x AS lang, c.y AS source, n_cell,
        |  round(ln((cast(n_cell AS DOUBLE) * cast(nn AS DOUBLE))
        |           / (cast(nx AS DOUBLE) * cast(ny AS DOUBLE))), 6) AS pmi
        |FROM cells c JOIN rx ON c.x = rx.x JOIN ry ON c.y = ry.y
        |CROSS JOIN tt ORDER BY lang, source""".stripMargin),

    // -- exact Spearman rank correlation quantity × price (the monotone
    //    companion to q_corr's Pearson on the same pair): Pearson over
    //    doubled midranks, ranks from the two-phase prefix sum over each
    //    column's distinct-value table (never a global window — the
    //    oracle's window runs over DuckDB's single node, PlanSpec guards
    //    only the Spark side), moments exact in DECIMAL(38,0) -------------
    ("q_spearman",
      (s: SparkSession, d: String) => {
        val li = t(s, d, "lineitem")
          .select(col("l_quantity").cast("long").as("q"),
            cents(col("l_extendedprice")).as("p"))
        graft.ops.Eval.spearmanExact(li, "q", "p")
      },
      """WITH b AS (SELECT cast(l_quantity AS BIGINT) AS xv,
        |             cast(round(l_extendedprice * 100) AS BIGINT) AS yv
        |           FROM lineitem),
        |bx AS (SELECT xv AS v, CAST(count(*) AS BIGINT) AS n FROM b GROUP BY 1),
        |rxm AS (SELECT v, 2 * (sum(n) OVER (ORDER BY v) - n) + n + 1 AS r2 FROM bx),
        |byv AS (SELECT yv AS v, CAST(count(*) AS BIGINT) AS n FROM b GROUP BY 1),
        |rym AS (SELECT v, 2 * (sum(n) OVER (ORDER BY v) - n) + n + 1 AS r2 FROM byv),
        |j AS (SELECT rx.r2 AS x, ry.r2 AS y
        |      FROM b JOIN rxm rx ON b.xv = rx.v JOIN rym ry ON b.yv = ry.v),
        |a AS (SELECT count(*) AS nn,
        |  cast(count(*) AS DOUBLE) AS n,
        |  cast(sum(cast(x AS HUGEINT)) AS DOUBLE) AS sx,
        |  cast(sum(cast(y AS HUGEINT)) AS DOUBLE) AS sy,
        |  cast(sum(cast(x AS HUGEINT) * cast(x AS HUGEINT)) AS DOUBLE) AS sxx,
        |  cast(sum(cast(y AS HUGEINT) * cast(y AS HUGEINT)) AS DOUBLE) AS syy,
        |  cast(sum(cast(x AS HUGEINT) * cast(y AS HUGEINT)) AS DOUBLE) AS sxy
        |  FROM j)
        |SELECT CAST(nn AS BIGINT) AS n_rows,
        |  round((n * sxy - sx * sy)
        |    / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS spearman_rho
        |FROM a""".stripMargin),

    // -- corpus source-concentration summary: Herfindahl index
    //    (Σ share², the concentration number), Shannon diversity
    //    (−Σ p·ln p via dec6 micro-nats), and the effective source count
    //    e^H / 1/HHI-style diversity equivalents — the "is this corpus
    //    secretly one crawl seed" gate. One groupBy(source) then
    //    sources-sized algebra; HHI numerator in DECIMAL (n² wraps long
    //    past ~3e9 docs in one source) --------------------------------------
    // -- ZIPF rank-frequency fit (Eval.zipfFit): weighted OLS of ln f on
    //    ln midrank over the DISTINCT-FREQUENCY classes — the exponent a
    //    tokenizer-vocab discussion starts from. Ranks from the prefix-
    //    sum machinery (no global window); ln/ln² terms dec6 before the
    //    exact weighted sums -----------------------------------------------
    ("q_zipf_fit",
      (s: SparkSession, d: String) =>
        graft.ops.Eval.zipfFit(
          t(s, d, "documents")
            .select(explode(expr("regexp_extract_all(text, '\\\\S+', 0)"))
              .as("w")), "w"),
      """WITH tok AS (SELECT unnest(regexp_extract_all(text, '\S+')) AS w
        |             FROM documents),
        |wc AS (SELECT w, CAST(count(*) AS BIGINT) AS n FROM tok GROUP BY 1),
        |bn AS (SELECT n AS nv, CAST(count(*) AS BIGINT) AS cw FROM wc GROUP BY 1),
        |rk AS (SELECT nv, cw,
        |    CAST(2 * coalesce(sum(cw) OVER (ORDER BY nv DESC
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      + cw + 1 AS DOUBLE) / 2.0 AS midrank
        |  FROM bn),
        |tm AS (SELECT cw, nv,
        |    CAST(round(ln(midrank), 6) AS DECIMAL(18,6)) AS x,
        |    CAST(round(ln(CAST(nv AS DOUBLE)), 6) AS DECIMAL(18,6)) AS y,
        |    CAST(round(ln(midrank) * ln(midrank), 6) AS DECIMAL(18,6)) AS xx,
        |    CAST(round(ln(midrank) * ln(CAST(nv AS DOUBLE)), 6)
        |      AS DECIMAL(18,6)) AS xy
        |  FROM rk),
        |a AS (SELECT CAST(sum(cw) AS BIGINT) AS n_types,
        |    CAST(sum(nv * cw) AS BIGINT) AS n_tokens,
        |    CAST(sum(cw) AS DOUBLE) AS wv,
        |    CAST(sum(cw * x) AS DOUBLE) AS sx,
        |    CAST(sum(cw * y) AS DOUBLE) AS sy,
        |    CAST(sum(cw * xx) AS DOUBLE) AS sxx,
        |    CAST(sum(cw * xy) AS DOUBLE) AS sxy
        |  FROM tm)
        |SELECT n_types, n_tokens,
        |  CASE WHEN wv * sxx - sx * sx > 0.0 THEN
        |    round((wv * sxy - sx * sy) / (wv * sxx - sx * sx), 6)
        |  END AS slope,
        |  CASE WHEN wv * sxx - sx * sx > 0.0 THEN
        |    round((sy - (wv * sxy - sx * sy) / (wv * sxx - sx * sx) * sx)
        |      / wv, 6)
        |  END AS intercept
        |FROM a""".stripMargin),

    // -- VOCABULARY COVERAGE curve (Eval.vocabCoverage): exact tokens
    //    covered by a top-k vocab for k ∈ {100, 1k, 10k} — boundary
    //    frequency classes contribute partially, ties cut
    //    deterministically; all algebra on the frequency-class table,
    //    ppm via the DECIMAL(38,0) cross-multiply ------------------------
    ("q_vocab_coverage",
      (s: SparkSession, d: String) =>
        graft.ops.Eval.vocabCoverage(
          t(s, d, "documents")
            .select(explode(expr("regexp_extract_all(text, '\\\\S+', 0)"))
              .as("w")), "w", Seq(100L, 1000L, 10000L))
          .orderBy("k"),
      """WITH tok AS (SELECT unnest(regexp_extract_all(text, '\S+')) AS w
        |             FROM documents),
        |wc AS (SELECT w, CAST(count(*) AS BIGINT) AS n FROM tok GROUP BY 1),
        |bn AS (SELECT n AS nv, CAST(count(*) AS BIGINT) AS cw FROM wc GROUP BY 1),
        |pre AS (SELECT nv, cw,
        |    CAST(coalesce(sum(cw) OVER (ORDER BY nv DESC
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS BIGINT) AS types_before,
        |    CAST(coalesce(sum(nv * cw) OVER (ORDER BY nv DESC
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS BIGINT) AS tokens_before
        |  FROM bn),
        |tot AS (SELECT CAST(sum(cw) AS BIGINT) AS n_types,
        |    CAST(sum(nv * cw) AS BIGINT) AS total FROM bn),
        |ks AS (SELECT CAST(unnest([100, 1000, 10000]) AS BIGINT) AS k),
        |j AS (SELECT k, n_types,
        |    coalesce(tokens_before + (k - types_before) * nv, total) AS covered,
        |    total
        |  FROM ks LEFT JOIN pre
        |    ON types_before < k AND k <= types_before + cw
        |  CROSS JOIN tot)
        |SELECT k, n_types, covered, total,
        |  CAST(cast(covered AS HUGEINT) * 1000000 // total AS BIGINT)
        |    AS coverage_ppm
        |FROM j ORDER BY k""".stripMargin),

    // -- WELCH's unequal-variance t-test: are English and German docs the
    //    same mean length? Moments are EXACT integer sums (squares in
    //    DECIMAL(38,0) — n_chars² · corpus wraps a BIGINT past ~2e8 rows),
    //    the t statistic and Welch–Satterthwaite df derive in identical
    //    double expressions. One conditional-aggregate corpus scan --------
    ("q_welch_t",
      (s: SparkSession, d: String) => {
        val dec = DecimalType(38, 0)
        val x = col("n_chars")
        val isA = col("lang") === "en"
        val isB = col("lang") === "de"
        val m = t(s, d, "documents").filter(isA || isB).agg(
          sum(when(isA, 1L).otherwise(0L)).as("na"),
          sum(when(isA, x).otherwise(0L)).as("sa"),
          sum(when(isA, x.cast(dec) * x.cast(dec)).otherwise(lit(0).cast(dec)))
            .as("qa"),
          sum(when(isB, 1L).otherwise(0L)).as("nb"),
          sum(when(isB, x).otherwise(0L)).as("sb"),
          sum(when(isB, x.cast(dec) * x.cast(dec)).otherwise(lit(0).cast(dec)))
            .as("qb"))
        val ma = col("sa").cast("double") / col("na")
        val mb = col("sb").cast("double") / col("nb")
        val va = (col("qa").cast("double") -
          col("sa").cast("double") * col("sa").cast("double") / col("na")) /
          (col("na") - 1)
        val vb = (col("qb").cast("double") -
          col("sb").cast("double") * col("sb").cast("double") / col("nb")) /
          (col("nb") - 1)
        val se2a = va / col("na")
        val se2b = vb / col("nb")
        // undefined below 2 samples per side or with zero pooled
        // variance: NULL, not the Inf/NaN a raw division gives (DuckDB's
        // x/0 is NULL — the q_mcc/q_kendall guard convention)
        val defined = col("na") > 1L && col("nb") > 1L
        m.select(col("na"), col("nb"),
          when(col("na") > 0L, round(ma, 6)).as("mean_a"),
          when(col("nb") > 0L, round(mb, 6)).as("mean_b"),
          when(defined && se2a + se2b > 0.0,
            round((ma - mb) / sqrt(se2a + se2b), 6)).as("t_stat"),
          when(defined && se2a * se2a + se2b * se2b > 0.0,
            round((se2a + se2b) * (se2a + se2b) /
              (se2a * se2a / (col("na") - 1) + se2b * se2b / (col("nb") - 1)),
              6)).as("df"))
      },
      """WITH m AS (SELECT
        |    CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS na,
        |    CAST(sum(CASE WHEN lang = 'en' THEN n_chars ELSE 0 END) AS BIGINT) AS sa,
        |    sum(CASE WHEN lang = 'en'
        |        THEN CAST(n_chars AS DECIMAL(38,0)) * n_chars
        |        ELSE CAST(0 AS DECIMAL(38,0)) END) AS qa,
        |    CAST(sum(CASE WHEN lang = 'de' THEN 1 ELSE 0 END) AS BIGINT) AS nb,
        |    CAST(sum(CASE WHEN lang = 'de' THEN n_chars ELSE 0 END) AS BIGINT) AS sb,
        |    sum(CASE WHEN lang = 'de'
        |        THEN CAST(n_chars AS DECIMAL(38,0)) * n_chars
        |        ELSE CAST(0 AS DECIMAL(38,0)) END) AS qb
        |  FROM documents WHERE lang IN ('en', 'de')),
        |e AS (SELECT na, nb,
        |    CAST(sa AS DOUBLE) / na AS ma, CAST(sb AS DOUBLE) / nb AS mb,
        |    (CAST(qa AS DOUBLE) - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE) / na)
        |      / (na - 1) / na AS s2a,
        |    (CAST(qb AS DOUBLE) - CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE) / nb)
        |      / (nb - 1) / nb AS s2b
        |  FROM m)
        |SELECT na, nb,
        |  CASE WHEN na > 0 THEN round(ma, 6) END AS mean_a,
        |  CASE WHEN nb > 0 THEN round(mb, 6) END AS mean_b,
        |  CASE WHEN na > 1 AND nb > 1 AND s2a + s2b > 0.0 THEN
        |    round((ma - mb) / sqrt(s2a + s2b), 6) END AS t_stat,
        |  CASE WHEN na > 1 AND nb > 1 AND s2a * s2a + s2b * s2b > 0.0 THEN
        |    round((s2a + s2b) * (s2a + s2b) /
        |      (s2a * s2a / (na - 1) + s2b * s2b / (nb - 1)), 6) END AS df
        |FROM e""".stripMargin),

    // -- deterministic POISSON BOOTSTRAP standard error of the mean doc
    //    length: 32 hash-seeded resamples (per-(doc, b) weight ~Poisson(1)
    //    via the md5 ‰-table 3679/7358/9197/9810 — the cumulative pmf at
    //    0..3), per-resample means dec6-rounded so the across-resample
    //    moments are EXACT decimal sums, SE from the closed form. This is
    //    how a pipeline attaches uncertainty to corpus stats without
    //    sampling nondeterminism: one explode ×32 (map-side, linear), one
    //    32-group agg, algebra on 32 rows ---------------------------------
    ("q_bootstrap_se",
      (s: SparkSession, d: String) => {
        val docs = t(s, d, "documents").select(col("doc_id"), col("n_chars"))
        val rs = docs
          .select(col("doc_id"), col("n_chars"),
            explode(expr("sequence(0, 31)")).as("b"))
          .withColumn("h", expr("cast(conv(substr(md5(concat(" +
            "cast(doc_id AS STRING), '|', cast(b AS STRING))), 1, 15), " +
            "16, 10) AS BIGINT) % 10000"))
          .withColumn("w", when(col("h") < 3679, 0L)
            .when(col("h") < 7358, 1L).when(col("h") < 9197, 2L)
            .when(col("h") < 9810, 3L).otherwise(4L))
        val means = rs.groupBy("b").agg(
            sum(col("w")).as("n_eff"),
            sum(col("w") * col("n_chars")).as("xsum"))
          .select(round(col("xsum").cast("double") / col("n_eff"), 6)
            .cast(DecimalType(18, 6)).as("m"))
        val bm = means.agg(sum(col("m")).as("sm"),
          sum(col("m") * col("m")).as("sm2"))
        val full = docs.agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("xs"))
        full.crossJoin(broadcast(bm)) // two 1-row frames
          .select(col("n_docs"),
            round(col("xs").cast("double") / col("n_docs"), 6).as("mean_full"),
            round(col("sm").cast("double") / 32.0, 6).as("boot_mean"),
            round(sqrt((col("sm2").cast("double") -
              col("sm").cast("double") * col("sm").cast("double") / 32.0)
              / 31.0), 6).as("boot_se"))
      },
      """WITH rs AS (SELECT doc_id, n_chars, b,
        |    ('0x' || substr(md5(doc_id || '|' || b), 1, 15))::BIGINT % 10000 AS h
        |  FROM documents, range(0, 32) r(b)),
        |ws AS (SELECT b, n_chars,
        |    CASE WHEN h < 3679 THEN 0 WHEN h < 7358 THEN 1
        |         WHEN h < 9197 THEN 2 WHEN h < 9810 THEN 3 ELSE 4 END AS w
        |  FROM rs),
        |means AS (SELECT CAST(round(CAST(sum(w * n_chars) AS DOUBLE)
        |    / sum(w), 6) AS DECIMAL(18,6)) AS m
        |  FROM ws GROUP BY b),
        |bm AS (SELECT sum(m) AS sm, sum(m * m) AS sm2 FROM means),
        |f AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(sum(n_chars) AS BIGINT) AS xs FROM documents)
        |SELECT n_docs,
        |  round(CAST(xs AS DOUBLE) / n_docs, 6) AS mean_full,
        |  round(CAST(sm AS DOUBLE) / 32.0, 6) AS boot_mean,
        |  round(sqrt((CAST(sm2 AS DOUBLE)
        |    - CAST(sm AS DOUBLE) * CAST(sm AS DOUBLE) / 32.0) / 31.0), 6)
        |    AS boot_se
        |FROM f CROSS JOIN bm""".stripMargin),

    ("q_source_diversity",
      (s: SparkSession, d: String) => {
        val dec = DecimalType(38, 0)
        val bySrc = t(s, d, "documents")
          .groupBy("source").agg(count(lit(1)).as("n"))
          .localCheckpoint(true) // sources-sized; read by totals + terms
        val tot = bySrc.agg(sum(col("n")).as("nn"),
          count(lit(1)).as("n_sources"))
        bySrc.crossJoin(broadcast(tot)) // 1 scalar row
          .select(col("n"), col("nn"), col("n_sources"),
            (col("n").cast(dec) * col("n").cast(dec)).as("n2"),
            // per-source micro-nat entropy term, pre-rounded (order-free)
            round((col("n").cast("double") / col("nn").cast("double")) *
              log(col("n").cast("double") / col("nn").cast("double")) * -1e6)
              .cast("long").as("h_term"))
          .groupBy("nn", "n_sources")
          .agg(sum(col("n2")).as("sn2"), sum(col("h_term")).as("h_e6"))
          .select(col("nn").as("n_docs"), col("n_sources"),
            round(col("sn2").cast("double") /
              (col("nn").cast("double") * col("nn").cast("double")), 6)
              .as("hhi"),
            col("h_e6"),
            round(exp(col("h_e6").cast("double") / 1e6), 6)
              .as("effective_sources"))
      },
      """WITH b AS (SELECT source, CAST(count(*) AS BIGINT) AS n
        |           FROM documents GROUP BY 1),
        |t AS (SELECT CAST(sum(n) AS BIGINT) AS nn,
        |             CAST(count(*) AS BIGINT) AS n_sources FROM b),
        |terms AS (SELECT nn, n_sources,
        |    cast(n AS HUGEINT) * n AS n2,
        |    CAST(round((cast(n AS DOUBLE) / cast(nn AS DOUBLE))
        |      * ln(cast(n AS DOUBLE) / cast(nn AS DOUBLE)) * -1e6) AS BIGINT) AS h_term
        |  FROM b CROSS JOIN t)
        |SELECT nn AS n_docs, n_sources,
        |  round(cast(sum(n2) AS DOUBLE)
        |    / (cast(nn AS DOUBLE) * cast(nn AS DOUBLE)), 6) AS hhi,
        |  CAST(sum(h_term) AS BIGINT) AS h_e6,
        |  round(exp(cast(sum(h_term) AS DOUBLE) / 1e6), 6) AS effective_sources
        |FROM terms GROUP BY nn, n_sources""".stripMargin),

    // -- Lorenz curve of per-customer revenue: cumulative revenue share
    //    per population decile (exact cents, ranks from the two-phase
    //    prefix-sum bucket machinery, cumulative via a 10-row triangular
    //    self-join) — the curve q_gini summarizes to one number --------------
    ("q_lorenz",
      (s: SparkSession, d: String) => {
        val rev = custRevenue(s, d)
          .localCheckpoint(true) // holder-sized; bucketing + the join
        val b = graft.ops.Eval.rankBuckets(rev, "x", "o_custkey", 10)
          .select(col("id").as("o_custkey"), col("bucket").as("decile"))
        val per = rev.join(b, Seq("o_custkey"))
          .groupBy("decile")
          .agg(count(lit(1)).as("n"), sum(col("x")).as("sum_cents"))
          .localCheckpoint(true) // 10 rows, both sides of the cumsum
        val tot = per.agg(sum(col("sum_cents")).as("tc"))
        per.join(per.select(col("decile").as("d2"),
            col("sum_cents").as("s2")), col("d2") <= col("decile"))
          .groupBy("decile", "n", "sum_cents")
          .agg(sum(col("s2")).as("cum_cents"))
          .crossJoin(broadcast(tot)) // 1 scalar row
          .select(col("decile"), col("n"), col("sum_cents"),
            col("cum_cents"),
            // DECIMAL carry: cum_cents·1e6 wraps a long once total
            // revenue passes ~9e12 cents (measured at the 10x fixture)
            expr("(CAST(cum_cents AS DECIMAL(38,0)) * 1000000L) div tc")
              .as("cum_share_ppm"))
          .orderBy("decile")
      },
      """WITH rev AS (SELECT o_custkey,
        |    CAST(sum(cast(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS x
        |  FROM orders GROUP BY 1),
        |nn AS (SELECT CAST(count(*) AS BIGINT) AS n_c FROM rev),
        |rk AS (SELECT x,
        |    ((row_number() OVER (ORDER BY x, o_custkey) - 1) * 10) // n_c AS decile
        |  FROM rev CROSS JOIN nn),
        |per AS (SELECT decile, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(x) AS BIGINT) AS sum_cents
        |  FROM rk GROUP BY 1),
        |t AS (SELECT CAST(sum(sum_cents) AS BIGINT) AS tc FROM per)
        |SELECT a.decile, a.n, a.sum_cents,
        |  CAST(sum(b.sum_cents) AS BIGINT) AS cum_cents,
        |  CAST((cast(sum(b.sum_cents) AS HUGEINT) * 1000000) // tc AS BIGINT) AS cum_share_ppm
        |FROM per a JOIN per b ON b.decile <= a.decile CROSS JOIN t
        |GROUP BY a.decile, a.n, a.sum_cents, tc ORDER BY a.decile""".stripMargin),

    // -- 5% two-sided trimmed mean of price cents: cutoffs from the
    //    distributed exact selection (interpolated like DuckDB's
    //    quantile_cont — the q_median contract), then one filtered exact
    //    aggregate. The robust location estimate between the mean
    //    (outlier-dragged) and the median (throws away 98% of the data) -
    ("q_trimmed_mean",
      (s: SparkSession, d: String) => {
        val li = t(s, d, "lineitem")
          .select(cents(col("l_extendedprice")).as("p"))
        val cuts = graft.ops.StatsOps.exactPercentiles(li, "p",
          Seq(0.05, 0.95))
        li.filter(col("p").cast("double") >= cuts.head &&
            col("p").cast("double") <= cuts(1))
          .agg(count(lit(1)).as("n_kept"),
            sum(col("p")).as("s"))
          .select(col("n_kept"),
            round(col("s").cast("double") / col("n_kept").cast("double"), 6)
              .as("trimmed_mean_cents"))
      },
      """WITH b AS (SELECT cast(round(l_extendedprice * 100) AS BIGINT) AS p
        |           FROM lineitem),
        |q AS (SELECT quantile_cont(p, 0.05) AS lo,
        |             quantile_cont(p, 0.95) AS hi FROM b)
        |SELECT CAST(count(*) AS BIGINT) AS n_kept,
        |  round(cast(sum(p) AS DOUBLE) / cast(count(*) AS DOUBLE), 6)
        |    AS trimmed_mean_cents
        |FROM b CROSS JOIN q
        |WHERE cast(p AS DOUBLE) >= lo AND cast(p AS DOUBLE) <= hi""".stripMargin),

    // -- Theil–Sen robust slope of price on quantity over deterministic
    //    within-order consecutive line pairs (a user-partitioned window
    //    — never all-pairs, which is O(n²)): slope = median of pairwise
    //    slopes via the distributed exact selection. The outlier-immune
    //    companion to q_linreg's OLS on the same columns ------------------
    ("q_theilsen",
      (s: SparkSession, d: String) => {
        // (l_orderkey, l_linenumber) is NOT unique in the synthetic
        // lineitem — order by (linenumber, q, p) so tied rows are
        // interchangeable FOR THE PAIRING (only q and p feed the slope)
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("l_orderkey").orderBy("l_linenumber", "q", "p")
        val li = t(s, d, "lineitem")
          .select(col("l_orderkey"), col("l_linenumber"),
            col("l_quantity").cast("long").as("q"),
            cents(col("l_extendedprice")).as("p"))
          .withColumn("q2", lead("q", 1).over(w))
          .withColumn("p2", lead("p", 1).over(w))
          .filter(col("q2").isNotNull && col("q2") =!= col("q"))
          .select(((col("p2") - col("p")).cast("double") /
            (col("q2") - col("q")).cast("double")).as("slope"))
        // the selection already counts the slopes — a separate count()
        // would recompute the corpus-sized pair window a third time
        val (meds, n) = graft.ops.StatsOps.exactPercentilesWithCount(
          li, "slope", Seq(0.5))
        li.sparkSession.range(1).select(
          lit(n).as("n_pairs"),
          round(lit(meds.head), 6).as("theil_slope"))
      },
      """WITH e AS (SELECT l_orderkey, l_linenumber,
        |    cast(l_quantity AS BIGINT) AS q,
        |    cast(round(l_extendedprice * 100) AS BIGINT) AS p,
        |    lead(cast(l_quantity AS BIGINT))
        |      OVER (PARTITION BY l_orderkey
        |            ORDER BY l_linenumber, cast(l_quantity AS BIGINT),
        |                     cast(round(l_extendedprice * 100) AS BIGINT)) AS q2,
        |    lead(cast(round(l_extendedprice * 100) AS BIGINT))
        |      OVER (PARTITION BY l_orderkey
        |            ORDER BY l_linenumber, cast(l_quantity AS BIGINT),
        |                     cast(round(l_extendedprice * 100) AS BIGINT)) AS p2
        |  FROM lineitem),
        |sl AS (SELECT cast(p2 - p AS DOUBLE) / cast(q2 - q AS DOUBLE) AS slope
        |       FROM e WHERE q2 IS NOT NULL AND q2 <> q)
        |SELECT CAST(count(*) AS BIGINT) AS n_pairs,
        |  round(median(slope), 6) AS theil_slope
        |FROM sl""".stripMargin),

    // -- delete-a-group jackknife standard error of the mean: 32
    //    deterministic hash groups (o_orderkey % 32), leave-one-out
    //    means from per-group EXACT cent sums, SE from the dec6-rounded
    //    deviation squares summed as DECIMAL (order-independent — a raw
    //    double Σ over groups would differ between engines). The
    //    uncertainty companion every point estimate in the suite lacks;
    //    deterministic and SQL-replayable where bootstrap is rand-gated.
    //    One scan → 32-row algebra ----------------------------------------
    ("q_jackknife_mean",
      (s: SparkSession, d: String) => {
        val g = t(s, d, "orders")
          .groupBy((col("o_orderkey") % 32).as("grp"))
          .agg(count(lit(1)).as("n_g"),
            sum(cents(col("o_totalprice"))).as("s_g"))
          .localCheckpoint(true) // 32 rows, read by totals + both passes
        val tot = g.agg(sum(col("n_g")).as("nn"), sum(col("s_g")).as("ss"),
          count(lit(1)).as("ng"))
        val m = g.crossJoin(broadcast(tot)) // 1 scalar row
          .withColumn("mi",
            round((col("ss") - col("s_g")).cast("double") /
              (col("nn") - col("n_g")).cast("double"), 6)
              .cast(DecimalType(18, 6)))
          .localCheckpoint(true) // 32 rows, read for mdot + the squares
        val md = m.agg(
          round(sum(col("mi")).cast("double") /
            first(col("ng")).cast("double"), 6).as("mdot"))
        m.crossJoin(broadcast(md)) // 1 scalar row
          .agg(first(col("nn")).as("n_rows"),
            first(col("ng")).as("n_groups"),
            round(first(col("ss")).cast("double") /
              first(col("nn")).cast("double"), 6).as("mean_cents"),
            sum(round((col("mi").cast("double") - col("mdot")) *
                (col("mi").cast("double") - col("mdot")), 6)
              .cast(DecimalType(18, 6))).as("ssq"),
            first(col("ng")).as("__g"))
          .select(col("n_rows"), col("n_groups"), col("mean_cents"),
            round(sqrt((col("__g") - 1L).cast("double") /
              col("__g").cast("double") * col("ssq").cast("double")), 6)
              .as("jack_se"))
      },
      """WITH g AS (SELECT o_orderkey % 32 AS grp,
        |    CAST(count(*) AS BIGINT) AS n_g,
        |    CAST(sum(cast(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS s_g
        |  FROM orders GROUP BY 1),
        |t AS (SELECT CAST(sum(n_g) AS BIGINT) AS nn,
        |             CAST(sum(s_g) AS BIGINT) AS ss,
        |             CAST(count(*) AS BIGINT) AS ng FROM g),
        |m AS (SELECT cast(round(cast(ss - s_g AS DOUBLE)
        |        / cast(nn - n_g AS DOUBLE), 6) AS DECIMAL(18,6)) AS mi
        |      FROM g CROSS JOIN t),
        |md AS (SELECT round(cast(sum(mi) AS DOUBLE)
        |         / cast((SELECT ng FROM t) AS DOUBLE), 6) AS mdot FROM m)
        |SELECT nn AS n_rows, ng AS n_groups,
        |  round(cast(ss AS DOUBLE) / cast(nn AS DOUBLE), 6) AS mean_cents,
        |  round(sqrt(cast(ng - 1 AS DOUBLE) / cast(ng AS DOUBLE)
        |    * cast((SELECT sum(cast(round(
        |        (cast(mi AS DOUBLE) - mdot) * (cast(mi AS DOUBLE) - mdot), 6)
        |        AS DECIMAL(18,6))) FROM m CROSS JOIN md) AS DOUBLE)), 6) AS jack_se
        |FROM t""".stripMargin),

    // -- Jensen–Shannon drift over the SAME histogram as q_drift_psi:
    //    the bounded symmetric member of the family (TV linear, PSI
    //    unbounded+smoothed, KS order-aware, JS ∈ [0, ln 2] smoothing-
    //    free — zero buckets contribute finite ½·p·ln 2). dec6 lns and
    //    terms summed as DECIMAL(18,6) -----------------------------------
    ("q_drift_js",
      (s: SparkSession, d: String) => {
        val docs = t(s, d, "documents")
        val cur = docs.filter(col("n_chars") <= 450)
          .unionByName(docs.filter(col("n_chars") < 150))
        graft.ops.Validate.jsDivergence(
          graft.ops.Validate.driftHistogram(
            docs, cur, "n_chars", lo = 0.0, width = 50.0, buckets = 10))
      },
      """WITH ref AS (
        |  SELECT cast(least(greatest(floor((cast(n_chars AS DOUBLE) - 0.0) / 50.0), -1), 10) AS BIGINT) AS bucket,
        |         count(*) AS n_ref
        |  FROM documents WHERE n_chars IS NOT NULL GROUP BY 1),
        |cur0 AS (
        |  SELECT n_chars FROM documents WHERE n_chars <= 450
        |  UNION ALL SELECT n_chars FROM documents WHERE n_chars < 150),
        |cur AS (
        |  SELECT cast(least(greatest(floor((cast(n_chars AS DOUBLE) - 0.0) / 50.0), -1), 10) AS BIGINT) AS bucket,
        |         count(*) AS n_cur
        |  FROM cur0 WHERE n_chars IS NOT NULL GROUP BY 1),
        |j AS (
        |  SELECT coalesce(r.bucket, c.bucket) AS bucket,
        |         coalesce(n_ref, 0) AS n_ref, coalesce(n_cur, 0) AS n_cur
        |  FROM ref r FULL OUTER JOIN cur c ON r.bucket = c.bucket),
        |t AS (SELECT cast(sum(n_ref) AS BIGINT) AS tr,
        |             cast(sum(n_cur) AS BIGINT) AS tc FROM j)
        |SELECT tr AS n_ref, tc AS n_cur,
        |  CASE WHEN tr = 0 AND tc = 0 THEN 0.0
        |       WHEN tr = 0 OR tc = 0 THEN 0.693147
        |       ELSE round(cast(sum(cast(round((
        |           CASE WHEN n_ref > 0 THEN (cast(n_ref AS DOUBLE) / tr)
        |             * round(ln((cast(n_ref AS DOUBLE) / tr)
        |               / ((cast(n_ref AS DOUBLE) / tr + cast(n_cur AS DOUBLE) / tc) / 2.0)), 6)
        |             ELSE 0.0 END
        |         + CASE WHEN n_cur > 0 THEN (cast(n_cur AS DOUBLE) / tc)
        |             * round(ln((cast(n_cur AS DOUBLE) / tc)
        |               / ((cast(n_ref AS DOUBLE) / tr + cast(n_cur AS DOUBLE) / tc) / 2.0)), 6)
        |             ELSE 0.0 END) / 2.0, 6) AS DECIMAL(18,6))) AS DOUBLE), 6)
        |  END AS js
        |FROM j CROSS JOIN t GROUP BY tr, tc""".stripMargin),

    // -- MAD robust outlier screen: |x − median| > 1.5·MAD on exact
    //    cents — the heavy-tail-safe companion to q_outliers' z-score
    //    (one corrupted batch can't inflate a median the way it inflates
    //    a standard deviation). Both medians run the distributed exact
    //    selection (StatsOps.exactPercentiles — linear where the
    //    single-reducer built-in OOMs, SCALE.md:478); thresholds compare
    //    identical doubles derived from exact integers on both sides ----
    // -- leave-one-group-out JACKKNIFE SE for the KS drift statistic
    //    (doc_id % 12 groups, same histogram spec as q_drift_psi/js):
    //    "is this drift score an artifact of one shard?" — each group's
    //    held-out KS recomputed exactly from per-group bucket histograms
    //    (cumulatives subtract per group; cross-multiplied integer gaps
    //    in DECIMAL(38,0)/HUGEINT). Bounded (12 × buckets) algebra after
    //    one groupBy(grp, bucket) per side ---------------------------------
    ("q_ks_jackknife",
      (s: SparkSession, d: String) => {
        val docs = t(s, d, "documents")
        val cur = docs.filter(col("n_chars") <= 450)
          .unionByName(docs.filter(col("n_chars") < 150))
        graft.ops.Validate.ksJackknife(docs, cur, "n_chars", "doc_id",
          lo = 0.0, width = 50.0, buckets = 10, nGroups = 12)
      },
      """WITH refs AS (SELECT doc_id % 12 AS grp,
        |    cast(least(greatest(floor((cast(n_chars AS DOUBLE) - 0.0) / 50.0), -1), 10) AS BIGINT) AS bucket
        |  FROM documents WHERE n_chars IS NOT NULL),
        |curs0 AS (SELECT doc_id, n_chars FROM documents WHERE n_chars <= 450
        |  UNION ALL SELECT doc_id, n_chars FROM documents WHERE n_chars < 150),
        |curs AS (SELECT doc_id % 12 AS grp,
        |    cast(least(greatest(floor((cast(n_chars AS DOUBLE) - 0.0) / 50.0), -1), 10) AS BIGINT) AS bucket
        |  FROM curs0 WHERE n_chars IS NOT NULL),
        |hr AS (SELECT grp, bucket, CAST(count(*) AS BIGINT) AS n_ref
        |       FROM refs GROUP BY 1, 2),
        |hc AS (SELECT grp, bucket, CAST(count(*) AS BIGINT) AS n_cur
        |       FROM curs GROUP BY 1, 2),
        |hg AS MATERIALIZED (SELECT coalesce(hr.grp, hc.grp) AS grp,
        |  coalesce(hr.bucket, hc.bucket) AS bucket,
        |  coalesce(n_ref, 0) AS n_ref, coalesce(n_cur, 0) AS n_cur
        |  FROM hr FULL OUTER JOIN hc
        |  ON hr.grp = hc.grp AND hr.bucket = hc.bucket),
        |hb AS MATERIALIZED (SELECT bucket, CAST(sum(n_ref) AS BIGINT) AS n_ref,
        |  CAST(sum(n_cur) AS BIGINT) AS n_cur FROM hg GROUP BY 1),
        |tot AS (SELECT CAST(sum(n_ref) AS BIGINT) AS t_ref,
        |        CAST(sum(n_cur) AS BIGINT) AS t_cur FROM hb),
        |cumB AS MATERIALIZED (SELECT a.bucket AS b,
        |  CAST(sum(x.n_ref) AS BIGINT) AS cr, CAST(sum(x.n_cur) AS BIGINT) AS cc
        |  FROM hb a JOIN hb x ON x.bucket <= a.bucket GROUP BY 1),
        |grid AS (SELECT b, grp FROM (SELECT DISTINCT b FROM cumB) gb
        |         CROSS JOIN (SELECT DISTINCT grp FROM hg) gg),
        |cumG AS MATERIALIZED (SELECT grid.b, grid.grp,
        |  CAST(coalesce(sum(hg.n_ref), 0) AS BIGINT) AS gr,
        |  CAST(coalesce(sum(hg.n_cur), 0) AS BIGINT) AS gc
        |  FROM grid LEFT JOIN hg
        |  ON hg.grp = grid.grp AND hg.bucket <= grid.b
        |  GROUP BY 1, 2),
        |gt AS (SELECT grp, CAST(sum(n_ref) AS BIGINT) AS g_ref,
        |       CAST(sum(n_cur) AS BIGINT) AS g_cur FROM hg GROUP BY 1),
        |aj AS MATERIALIZED (SELECT cumG.grp,
        |  cast(round(cast(max(abs(cast(cr - gr AS HUGEINT) * (t_cur - g_cur)
        |      - cast(cc - gc AS HUGEINT) * (t_ref - g_ref))) AS DOUBLE)
        |    / (cast(t_ref - g_ref AS DOUBLE) * cast(t_cur - g_cur AS DOUBLE)), 6)
        |    AS DECIMAL(18,6)) AS ksg
        |  FROM cumG JOIN cumB USING (b) JOIN gt ON gt.grp = cumG.grp
        |  CROSS JOIN tot
        |  GROUP BY cumG.grp, t_ref, t_cur, g_ref, g_cur),
        |st AS (SELECT CAST(count(*) AS BIGINT) AS ng FROM aj),
        |md AS (SELECT round(cast(sum(ksg) AS DOUBLE)
        |         / cast((SELECT ng FROM st) AS DOUBLE), 6) AS adot FROM aj),
        |ov AS (SELECT t_ref AS n_ref, t_cur AS n_cur,
        |  round(cast(max(abs(cast(cr AS HUGEINT) * t_cur
        |      - cast(cc AS HUGEINT) * t_ref)) AS DOUBLE)
        |    / (cast(t_ref AS DOUBLE) * cast(t_cur AS DOUBLE)), 6) AS ks
        |  FROM cumB CROSS JOIN tot GROUP BY t_ref, t_cur)
        |SELECT n_ref, n_cur, ks, (SELECT ng FROM st) AS n_groups,
        |  round(sqrt(cast((SELECT ng FROM st) - 1 AS DOUBLE)
        |    / cast((SELECT ng FROM st) AS DOUBLE)
        |    * cast((SELECT sum(cast(round(
        |        (cast(ksg AS DOUBLE) - adot) * (cast(ksg AS DOUBLE) - adot),
        |        6) AS DECIMAL(18,6))) FROM aj CROSS JOIN md) AS DOUBLE)), 6)
        |    AS jack_se
        |FROM ov""".stripMargin),

    ("q_mad_outliers",
      (s: SparkSession, d: String) => {
        val li = t(s, d, "lineitem")
          .select(col("l_returnflag"), cents(col("l_extendedprice")).as("p"))
        val med = graft.ops.StatsOps.exactPercentiles(li, "p", Seq(0.5)).head
        val dev = li.withColumn("ad", abs(col("p").cast("double") - med))
        val mad = graft.ops.StatsOps.exactPercentiles(dev, "ad", Seq(0.5)).head
        dev.filter(col("ad") > lit(1.5) * lit(mad))
          .groupBy("l_returnflag")
          .agg(count(lit(1)).as("n_outliers"),
            min(col("p")).as("min_cents"),
            max(col("p")).as("max_cents"))
          .orderBy("l_returnflag")
      },
      """WITH b AS (SELECT l_returnflag,
        |             cast(round(l_extendedprice * 100) AS BIGINT) AS p
        |           FROM lineitem),
        |m AS (SELECT median(p) AS med FROM b),
        |dv AS (SELECT l_returnflag, p, abs(cast(p AS DOUBLE) - med) AS ad
        |       FROM b CROSS JOIN m),
        |m2 AS (SELECT median(ad) AS mad FROM dv)
        |SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n_outliers,
        |  min(p) AS min_cents, max(p) AS max_cents
        |FROM dv CROSS JOIN m2 WHERE ad > 1.5 * mad
        |GROUP BY 1 ORDER BY 1""".stripMargin),

    // -- RFM segmentation: per customer recency (last order epoch),
    //    frequency (order count), monetary (exact cents), each bucketed
    //    into global quintiles by the rank-bucket machinery (two-phase
    //    prefix-sum ranks — no global window, floor allocation so a
    //    row_number replays it in any engine), then the 125-cell segment
    //    matrix with exact revenue. The classic curation/marketing
    //    customer cube ---------------------------------------------------
    ("q_rfm",
      (s: SparkSession, d: String) => {
        val cust = t(s, d, "orders")
          .groupBy(col("o_custkey").as("cust"))
          .agg(max(unix_timestamp(col("o_orderdate"))).as("rec"),
            count(lit(1)).as("freq"),
            sum(cents(col("o_totalprice"))).as("mon"))
          .localCheckpoint(true) // read by three rank passes + the join
        def q(vc: String, out: String) =
          graft.ops.Eval.rankBuckets(cust, vc, "cust", 5)
            .select(col("id").as("cust"), col("bucket").as(out))
        cust.join(q("rec", "r_q"), Seq("cust"))
          .join(q("freq", "f_q"), Seq("cust"))
          .join(q("mon", "m_q"), Seq("cust"))
          .groupBy("r_q", "f_q", "m_q")
          .agg(count(lit(1)).as("n_customers"),
            sum(col("mon")).as("mon_cents"))
          .orderBy("r_q", "f_q", "m_q")
      },
      """WITH c AS (SELECT o_custkey AS cust,
        |    CAST(max(epoch(o_orderdate)) AS BIGINT) AS rec,
        |    CAST(count(*) AS BIGINT) AS freq,
        |    CAST(sum(cast(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS mon
        |  FROM orders GROUP BY 1),
        |n AS (SELECT CAST(count(*) AS BIGINT) AS nn FROM c),
        |rr AS (SELECT cust,
        |  ((row_number() OVER (ORDER BY rec, cust) - 1) * 5) // nn AS r_q
        |  FROM c CROSS JOIN n),
        |ff AS (SELECT cust,
        |  ((row_number() OVER (ORDER BY freq, cust) - 1) * 5) // nn AS f_q
        |  FROM c CROSS JOIN n),
        |mm AS (SELECT cust,
        |  ((row_number() OVER (ORDER BY mon, cust) - 1) * 5) // nn AS m_q
        |  FROM c CROSS JOIN n)
        |SELECT r_q, f_q, m_q, CAST(count(*) AS BIGINT) AS n_customers,
        |  CAST(sum(mon) AS BIGINT) AS mon_cents
        |FROM c JOIN rr USING (cust) JOIN ff USING (cust) JOIN mm USING (cust)
        |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin),

    // -- Benford first-digit audit of the price column: observed ppm per
    //    leading digit vs the Benford expectation log10(1+1/d) — the
    //    classic fabricated-data screen. Leading digit extracted from
    //    the exact cents integer's decimal rendering (identical in both
    //    engines; cents > 0 for every lineitem). One scan + one
    //    9-row hash agg ---------------------------------------------------
    ("q_benford",
      (s: SparkSession, d: String) => {
        val li = t(s, d, "lineitem")
          .select(substring(cents(col("l_extendedprice")).cast("string"), 1, 1)
            .cast("long").as("digit"))
        val counts = li.groupBy("digit").agg(count(lit(1)).as("n"))
        val tot = counts.agg(sum(col("n")).as("nn"))
        counts.crossJoin(broadcast(tot)) // 1 scalar row
          .select(col("digit"), col("n"),
            expr("(n * 1000000L) div nn").as("ppm"),
            round(log(10.0, lit(1.0) + lit(1.0) / col("digit").cast("double")) * 1e6)
              .cast("long").as("exp_ppm"))
          .withColumn("dev_ppm", abs(col("ppm") - col("exp_ppm")))
          .orderBy("digit")
      },
      """WITH c AS (SELECT CAST(substr(CAST(cast(round(l_extendedprice * 100) AS BIGINT) AS VARCHAR), 1, 1) AS BIGINT) AS digit
        |           FROM lineitem),
        |k AS (SELECT digit, CAST(count(*) AS BIGINT) AS n FROM c GROUP BY 1),
        |t AS (SELECT CAST(sum(n) AS BIGINT) AS nn FROM k)
        |SELECT digit, n, (n * 1000000) // nn AS ppm,
        |  CAST(round(log10(1.0 + 1.0 / CAST(digit AS DOUBLE)) * 1e6) AS BIGINT) AS exp_ppm,
        |  abs((n * 1000000) // nn
        |      - CAST(round(log10(1.0 + 1.0 / CAST(digit AS DOUBLE)) * 1e6) AS BIGINT)) AS dev_ppm
        |FROM k CROSS JOIN t ORDER BY digit""".stripMargin),

    // -- exact Gini coefficient of per-customer revenue: the inequality
    //    /skew summary for curation budgeting (how concentrated is the
    //    corpus on few heavy keys). Ranks via the two-phase prefix sum
    //    over the distinct-revenue table + per-tie row_number (bounded
    //    groups), DECIMAL(38,0) moments, dec6 final ratio — tie order
    //    provably irrelevant to the statistic -----------------------------
    ("q_gini",
      (s: SparkSession, d: String) => {
        graft.ops.Eval.giniExact(custRevenue(s, d), "x", "o_custkey")
      },
      """WITH rev AS (SELECT o_custkey,
        |    CAST(sum(cast(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS x
        |  FROM orders GROUP BY 1),
        |r AS (SELECT x, row_number() OVER (ORDER BY x, o_custkey) AS rank FROM rev),
        |a AS (SELECT count(*) AS nn,
        |  cast(count(*) AS DOUBLE) AS n,
        |  CAST(sum(cast(x AS HUGEINT)) AS BIGINT) AS sxl,
        |  cast(sum(cast(x AS HUGEINT)) AS DOUBLE) AS sx,
        |  cast(sum(cast(rank AS HUGEINT) * cast(x AS HUGEINT)) AS DOUBLE) AS srx
        |  FROM r)
        |SELECT CAST(nn AS BIGINT) AS n_rows, sxl AS sum_val,
        |  round((2.0 * srx - (n + 1.0) * sx) / (n * sx), 6) AS gini
        |FROM a""".stripMargin),

    // -- leave-one-group-out JACKKNIFE SE for that same Gini (custkey %
    //    12 groups) — the aucJackknife inclusion–exclusion pattern on the
    //    other canonical pair-count statistic: G = S/(n·T) with S the sum
    //    of |x_i − x_j| over pairs; each group's held-out Gini from
    //    2S − 2·A_g + B_g (pair sums in DECIMAL(38,0)/HUGEINT — they
    //    overflow BIGINT on a large corpus). One corpus groupBy(grp, v);
    //    bounded-table algebra after ---------------------------------------
    ("q_gini_jackknife",
      (s: SparkSession, d: String) =>
        graft.ops.Eval.giniJackknife(custRevenue(s, d), "x", "o_custkey",
          nGroups = 12),
      """WITH rev AS (SELECT o_custkey,
        |    CAST(sum(cast(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS x
        |  FROM orders GROUP BY 1),
        |b AS (SELECT o_custkey % 12 AS grp, x AS v FROM rev),
        |gv AS MATERIALIZED (SELECT grp, v, CAST(count(*) AS BIGINT) AS c_gv,
        |      CAST(v * count(*) AS BIGINT) AS s_gv FROM b GROUP BY 1, 2),
        |bv AS MATERIALIZED (SELECT v, CAST(sum(c_gv) AS BIGINT) AS c,
        |      CAST(sum(s_gv) AS BIGINT) AS s FROM gv GROUP BY 1),
        |tot AS (SELECT CAST(sum(c) AS BIGINT) AS n_all,
        |        CAST(sum(s) AS BIGINT) AS t_all FROM bv),
        |pre AS (SELECT v, c, s,
        |  CAST(coalesce(sum(c) OVER (ORDER BY v
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cb,
        |  CAST(coalesce(sum(s) OVER (ORDER BY v
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS sb
        |  FROM bv),
        |preT AS MATERIALIZED (SELECT v, c, cb, sb,
        |  n_all - cb - c AS ca, t_all - sb - s AS sa
        |  FROM pre CROSS JOIN tot),
        |s2 AS (SELECT sum((cast(v AS HUGEINT)*cb - sb + sa
        |         - cast(v AS HUGEINT)*ca) * c) AS s2
        |       FROM preT),
        |g1 AS (SELECT g.grp, g.v, g.c_gv, g.s_gv,
        |  CAST(coalesce(sum(g.c_gv) OVER (PARTITION BY g.grp ORDER BY g.v
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cbg,
        |  CAST(coalesce(sum(g.s_gv) OVER (PARTITION BY g.grp ORDER BY g.v
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS sbg,
        |  CAST(sum(g.c_gv) OVER (PARTITION BY g.grp) AS BIGINT) AS n_g,
        |  CAST(sum(g.s_gv) OVER (PARTITION BY g.grp) AS BIGINT) AS t_g,
        |  p.cb, p.sb, p.ca, p.sa
        |  FROM gv g JOIN preT p USING (v)),
        |per AS (SELECT grp, CAST(max(n_g) AS BIGINT) AS n_g,
        |  CAST(max(t_g) AS BIGINT) AS t_g,
        |  sum((cast(v AS HUGEINT)*cb - sb + sa
        |     - cast(v AS HUGEINT)*ca) * c_gv) AS a_g,
        |  sum((cast(v AS HUGEINT)*cbg - sbg + (t_g - sbg - s_gv)
        |     - cast(v AS HUGEINT)*(n_g - cbg - c_gv)) * c_gv) AS b_g
        |  FROM g1 GROUP BY 1),
        |aj AS MATERIALIZED (SELECT grp,
        |  cast(round(cast(s2 - 2*a_g + b_g AS DOUBLE)
        |    / (2.0 * cast(n_all - n_g AS DOUBLE)
        |       * cast(t_all - t_g AS DOUBLE)), 6) AS DECIMAL(18,6)) AS ginig
        |  FROM per CROSS JOIN tot CROSS JOIN s2),
        |st AS (SELECT CAST(count(*) AS BIGINT) AS ng FROM aj),
        |md AS (SELECT round(cast(sum(ginig) AS DOUBLE)
        |         / cast((SELECT ng FROM st) AS DOUBLE), 6) AS adot FROM aj)
        |SELECT n_all AS n_rows, t_all AS sum_val,
        |  round(cast(s2 AS DOUBLE)
        |    / (2.0 * cast(n_all AS DOUBLE) * cast(t_all AS DOUBLE)), 6) AS gini,
        |  (SELECT ng FROM st) AS n_groups,
        |  round(sqrt(cast((SELECT ng FROM st) - 1 AS DOUBLE)
        |    / cast((SELECT ng FROM st) AS DOUBLE)
        |    * cast((SELECT sum(cast(round(
        |        (cast(ginig AS DOUBLE) - adot) * (cast(ginig AS DOUBLE) - adot),
        |        6) AS DECIMAL(18,6))) FROM aj CROSS JOIN md) AS DOUBLE)), 6)
        |    AS jack_se
        |FROM tot CROSS JOIN s2""".stripMargin),

    // -- exact OLS of price-cents on quantity (slope, intercept, R²):
    //    the q_corr moment machinery closed-form — DECIMAL(38,0) sums,
    //    identical double expression trees on both sides, dec6. One
    //    scan, one-row exchange -------------------------------------------
    ("q_linreg",
      (s: SparkSession, d: String) => {
        val li = t(s, d, "lineitem")
          .select(col("l_quantity").cast("long").as("q"),
            cents(col("l_extendedprice")).as("p"))
        val dec = DecimalType(38, 0)
        val agg = li.agg(
          count(lit(1)).cast(dec).as("n"),
          sum(col("q").cast(dec)).as("sq"),
          sum(col("p").cast(dec)).as("sp"),
          sum((col("q") * col("q")).cast(dec)).as("sqq"),
          sum((col("p") * col("p")).cast(dec)).as("spp"),
          sum((col("q") * col("p")).cast(dec)).as("sqp"))
        val nd = col("n").cast("double"); val sqd = col("sq").cast("double")
        val spd = col("sp").cast("double"); val sqqd = col("sqq").cast("double")
        val sppd = col("spp").cast("double"); val sqpd = col("sqp").cast("double")
        val slope = (nd * sqpd - sqd * spd) / (nd * sqqd - sqd * sqd)
        agg.select(
          col("n").cast("long").as("n_rows"),
          round(slope, 6).as("slope"),
          round((spd - slope * sqd) / nd, 6).as("intercept"),
          round((nd * sqpd - sqd * spd) * (nd * sqpd - sqd * spd) /
            ((nd * sqqd - sqd * sqd) * (nd * sppd - spd * spd)), 6).as("r2"))
      },
      """WITH b AS (SELECT cast(l_quantity AS BIGINT) AS q,
        |             cast(round(l_extendedprice * 100) AS BIGINT) AS p
        |           FROM lineitem),
        |a AS (SELECT count(*) AS nn,
        |  cast(count(*) AS DOUBLE) AS n,
        |  cast(sum(cast(q AS DECIMAL(38,0))) AS DOUBLE) AS sq,
        |  cast(sum(cast(p AS DECIMAL(38,0))) AS DOUBLE) AS sp,
        |  cast(sum(cast(q * q AS DECIMAL(38,0))) AS DOUBLE) AS sqq,
        |  cast(sum(cast(p * p AS DECIMAL(38,0))) AS DOUBLE) AS spp,
        |  cast(sum(cast(q * p AS DECIMAL(38,0))) AS DOUBLE) AS sqp
        |  FROM b)
        |SELECT CAST(nn AS BIGINT) AS n_rows,
        |  round((n * sqp - sq * sp) / (n * sqq - sq * sq), 6) AS slope,
        |  round((sp - ((n * sqp - sq * sp) / (n * sqq - sq * sq)) * sq) / n, 6) AS intercept,
        |  round((n * sqp - sq * sp) * (n * sqp - sq * sp)
        |    / ((n * sqq - sq * sq) * (n * spp - sp * sp)), 6) AS r2
        |FROM a""".stripMargin)
  )
}
