package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import Q._

/** Round-3 coverage batch: BPE-style tokenization, explicit GROUPING SETS,
  * and the end-to-end verified MinHash pipeline (LSH candidates + exact
  * Jaccard confirmation) as a driver-graded query.
  *
  * All entries follow the determinism conventions in [[Q]].
  */
object MoreOps3 {

  type Fn = (SparkSession, String) => DataFrame

  /** BPE-ish pre-tokenizer: letter runs, digit runs, single non-space
    * symbols — the classic pre-merge segmentation (same regex both engines).
    */
  private val bpeRe = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"

  /** (a, b, jac) verified near-dup pairs: md5-MinHash LSH band candidates
    * confirmed by the exact Jaccard (>= 0.8), candidate-driven — the
    * inverted index is semi-joined to the docs appearing in a >= 2-member
    * band bucket BEFORE co-occurrence counting, so the verify stage scales
    * with candidates rather than the corpus. Shared by q_dedup_verified
    * (graded directly) and q_dedup_e2e (closed into clusters and applied).
    */
  private[queries] def verifiedPairs(s: SparkSession, d: String): DataFrame = {
    val base = TextOps.shingleDf(s, d)
    val bands = TextOps.md5BandsDf(s, d, nBands = 4, rows = 4)
    val cand = bands.alias("x").join(bands.alias("y"),
        col("x.j") === col("y.j") && col("x.bh") === col("y.bh") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
      .distinct()
    val sizes = base.select(col("doc_id"), size(col("sh")).as("n"))
    // candidate-driven verify: restrict the inverted index to docs that
    // appear in some candidate pair BEFORE co-occurrence counting —
    // counting over the full corpus would cost the same as exact n-gram
    // dedup and defeat the LSH stage. The id set = docs in any band
    // bucket with >= 2 members (identical to the docs of `cand`, but one
    // cheap agg + semi-join instead of re-running the band self-join)
    val hot = bands.groupBy("j", "bh").agg(count(lit(1)).as("bc"))
      .filter(col("bc") >= 2)
    val ids = bands.join(hot, Seq("j", "bh"), "left_semi")
      .select("doc_id").distinct()
    // hint-free semi-join (same rationale as Dedup.minhashVerifiedPairs):
    // AQE broadcasts the candidate-id set when small — as here — without
    // pinning the scale path to a forced broadcast
    val inv = base.select(col("doc_id"), explode(col("sh")).as("g"))
      .join(ids, Seq("doc_id"), "left_semi")
    val common = inv.alias("x").join(inv.alias("y"),
        col("x.g") === col("y.g") && col("x.doc_id") < col("y.doc_id"))
      .groupBy(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
      .agg(count(lit(1)).as("common"))
    cand.join(common, Seq("a", "b"))
      .join(sizes.select(col("doc_id").as("a"), col("n").as("na")), "a")
      .join(sizes.select(col("doc_id").as("b"), col("n").as("nb")), "b")
      .withColumn("jac", round(col("common").cast("double") /
        (col("na") + col("nb") - col("common")), 4))
      .filter(col("jac") >= 0.8)
      .select("a", "b", "jac")
  }

  val entries: Seq[(String, Fn, String)] = moreEntries :+ tjq

  private lazy val moreEntries: Seq[(String, Fn, String)] = Seq(

    // -- TPC-H Q1 analogue: the pricing summary — one scan, map-side partial
    //    agg over a 6-value grouping key, every aggregate in a single pass --
    ("q_tpch_q1",
      (s: SparkSession, d: String) => {
        import org.apache.spark.sql.types.DecimalType
        // all money terms as exact integer cents (Q.cents): no per-row
        // double→decimal casts in the hottest scan of the suite — q1 ran
        // 1.8 s under the DECIMAL(18,6) convention, the cents form halves
        // it with bit-identical output (both engines mirror the tree)
        def dec28(c: org.apache.spark.sql.Column) = c.cast(DecimalType(28, 0))
        val ep = cents(col("l_extendedprice"))
        val dm = cents(lit(1.0) - col("l_discount"))
        val tp = cents(lit(1.0) + col("l_tax"))
        t(s, d, "lineitem")
          .filter(col("l_shipdate") <= lit("2001-09-01").cast("timestamp"))
          .groupBy("l_returnflag", "l_linestatus")
          .agg(
            round(sum(col("l_quantity")).cast("double"), 4).as("sum_qty"),
            round(sum(dec28(ep)).cast("double") / 100.0, 4).as("sum_base_price"),
            round(sum(dec28(ep * dm)).cast("double") / 10000.0, 4)
              .as("sum_disc_price"),
            round(sum(dec28(ep * dm * tp)).cast("double") / 1000000.0, 4)
              .as("sum_charge"),
            round(sum(col("l_quantity")).cast("double") / count(lit(1)), 4)
              .as("avg_qty"),
            round(sum(dec28(cents(col("l_discount")))).cast("double") / 100.0
              / count(lit(1)), 4).as("avg_disc"),
            count(lit(1)).as("count_order"))
          .orderBy("l_returnflag", "l_linestatus")
      },
      s"""SELECT l_returnflag, l_linestatus,
         |  round(cast(sum(l_quantity) AS DOUBLE), 4) AS sum_qty,
         |  round(cast(sum(cast(round(l_extendedprice * 100) AS BIGINT)) AS DOUBLE) / 100.0, 4) AS sum_base_price,
         |  round(cast(sum(cast(round(l_extendedprice * 100) AS BIGINT) *
         |                 cast(round((1.0 - l_discount) * 100) AS BIGINT)) AS DOUBLE) / 10000.0, 4) AS sum_disc_price,
         |  round(cast(sum(cast(round(l_extendedprice * 100) AS BIGINT) *
         |                 cast(round((1.0 - l_discount) * 100) AS BIGINT) *
         |                 cast(round((1.0 + l_tax) * 100) AS BIGINT)) AS DOUBLE) / 1000000.0, 4) AS sum_charge,
         |  round(cast(sum(l_quantity) AS DOUBLE) / count(*), 4) AS avg_qty,
         |  round(cast(sum(cast(round(l_discount * 100) AS BIGINT)) AS DOUBLE) / 100.0
         |    / count(*), 4) AS avg_disc,
         |  count(*) AS count_order
         |FROM lineitem WHERE l_shipdate <= TIMESTAMP '2001-09-01'
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),

    // -- TPC-H Q6 analogue: forecast revenue — pure scan + pushed filters,
    //    no join, no shuffle beyond the final 1-row agg ---------------------
    ("q_tpch_q6",
      (s: SparkSession, d: String) => {
        import org.apache.spark.sql.types.DecimalType
        t(s, d, "lineitem")
          .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
            col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
            col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
          .agg(round(sum((cents(col("l_extendedprice")) * cents(col("l_discount")))
            .cast(DecimalType(28, 0))).cast("double") / 10000.0, 4).as("revenue"))
      },
      """SELECT round(cast(sum(cast(round(l_extendedprice * 100) AS BIGINT) *
        |  cast(round(l_discount * 100) AS BIGINT)) AS DOUBLE) / 10000.0, 4) AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin),

    // -- TPC-H Q12 analogue (schema has no shipmode): late-shipment counts
    //    by order priority — join + conditional aggregation -----------------
    ("q_tpch_q12",
      (s: SparkSession, d: String) => {
        val late = datediff(col("l_shipdate").cast("date"),
          col("o_orderdate").cast("date")) > 90
        t(s, d, "orders")
          .join(t(s, d, "lineitem"), col("o_orderkey") === col("l_orderkey"))
          .groupBy("o_orderpriority")
          .agg(sum(when(late, 1L).otherwise(0L)).as("late_count"),
            sum(when(late, 0L).otherwise(1L)).as("ontime_count"))
          .orderBy("o_orderpriority")
      },
      """SELECT o_orderpriority,
        |  cast(sum(CASE WHEN date_diff('day', cast(o_orderdate AS DATE),
        |                 cast(l_shipdate AS DATE)) > 90 THEN 1 ELSE 0 END) AS BIGINT) AS late_count,
        |  cast(sum(CASE WHEN date_diff('day', cast(o_orderdate AS DATE),
        |                 cast(l_shipdate AS DATE)) > 90 THEN 0 ELSE 1 END) AS BIGINT) AS ontime_count
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |GROUP BY 1 ORDER BY 1""".stripMargin),

    // -- TPC-H Q14 analogue: promo revenue share — part dim broadcasts,
    //    conditional numerator over one joined scan -------------------------
    ("q_tpch_q14",
      (s: SparkSession, d: String) => {
        import org.apache.spark.sql.types.DecimalType
        // exact integer-cents revenue terms (see Q.cents / TpchOps) — the
        // 1e4 scale cancels in the ratio, so no /10000.0 here
        def disc = (cents(col("l_extendedprice")) *
          cents(lit(1.0) - col("l_discount"))).cast(DecimalType(28, 0))
        t(s, d, "lineitem")
          .filter(col("l_shipdate") >= lit("1996-03-01").cast("timestamp") &&
            col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
          .join(broadcast(t(s, d, "part")), col("l_partkey") === col("p_partkey"))
          .agg(round(lit(100.0) *
            sum(when(col("p_type") === "PROMO", disc)
              .otherwise(lit(0L).cast(DecimalType(28, 0))))
              .cast("double") /
            sum(disc).cast("double"), 4).as("promo_revenue_pct"))
      },
      """SELECT round(100.0 *
        |  cast(sum(CASE WHEN p_type = 'PROMO'
        |       THEN cast(round(l_extendedprice * 100) AS BIGINT) *
        |            cast(round((1.0 - l_discount) * 100) AS BIGINT)
        |       ELSE 0 END) AS DOUBLE) /
        |  cast(sum(cast(round(l_extendedprice * 100) AS BIGINT) *
        |           cast(round((1.0 - l_discount) * 100) AS BIGINT)) AS DOUBLE), 4)
        |  AS promo_revenue_pct
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_shipdate >= TIMESTAMP '1996-03-01'
        |  AND l_shipdate < TIMESTAMP '1996-04-01'""".stripMargin),

    // -- token counting with a BPE-style pre-tokenizer (letters / digits /
    //    punctuation split, the segmentation a BPE vocab trains over) -------
    ("q_token_bpe",
      (s: SparkSession, d: String) => {
        val toks = regexp_extract_all(col("text"), lit(bpeRe), lit(0))
        t(s, d, "documents")
          .withColumn("tk", toks)
          .select(col("doc_id"),
            size(col("tk")).cast("long").as("n_bpe"),
            size(array_distinct(col("tk"))).cast("long").as("n_uniq"),
            size(filter(col("tk"), x => x.rlike("^[0-9]+$"))).cast("long").as("n_num"))
          .filter(col("doc_id") < 150)
          .orderBy("doc_id")
      },
      s"""WITH q AS (SELECT doc_id, regexp_extract_all(text, '$bpeRe') AS tk
         |           FROM documents WHERE doc_id < 150)
         |SELECT doc_id,
         |  cast(len(tk) AS BIGINT) AS n_bpe,
         |  cast(len(list_distinct(tk)) AS BIGINT) AS n_uniq,
         |  cast(len(list_filter(tk, x -> regexp_full_match(x, '[0-9]+'))) AS BIGINT) AS n_num
         |FROM q ORDER BY doc_id""".stripMargin),

    // -- explicit GROUPING SETS (beyond cube/rollup): hand-picked levels in
    //    one pass — still a single shuffle with map-side partial agg --------
    ("q_grouping_sets",
      (s: SparkSession, d: String) =>
        s.sql(s"""
          |SELECT l_returnflag, l_linestatus,
          |  cast(grouping(l_returnflag) * 2 + grouping(l_linestatus) AS BIGINT) AS gid,
          |  count(*) AS cnt, ${sqlDsum("l_quantity")} AS qty
          |FROM parquet.`$d/lineitem.parquet`
          |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
          |ORDER BY gid, l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST
          |""".stripMargin),
      s"""SELECT l_returnflag, l_linestatus,
         |  cast(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS BIGINT) AS gid,
         |  count(*) AS cnt, ${sqlDsum("l_quantity")} AS qty
         |FROM lineitem
         |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
         |ORDER BY gid, l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin),

    // -- verified MinHash pipeline: LSH band candidates (q_dedup_minhash's
    //    index) confirmed with the exact Jaccard — the production near-dup
    //    path (cheap generation, no false positives) in ONE graded query.
    //    Intersection counts ride the co-occurrence groupBy (no arrays
    //    shuffled); candidate pairs equi-join on (a, b) ----------------------
    ("q_dedup_verified",
      (s: SparkSession, d: String) =>
        verifiedPairs(s, d).orderBy("a", "b"),
      s"""${TextOps.shingleCte},
         |${TextOps.sigCte},
         |${TextOps.bandsCte(4, 4)},
         |cand AS (
         |  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
         |  FROM bands x JOIN bands y ON x.j = y.j AND x.bh = y.bh AND x.doc_id < y.doc_id),
         |p AS (
         |  SELECT c.a, c.b,
         |    round(len(list_intersect(sa.sh, sb.sh)) * 1.0 /
         |          (len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh))), 4) AS jac
         |  FROM cand c JOIN s sa ON sa.doc_id = c.a JOIN s sb ON sb.doc_id = c.b)
         |SELECT a, b, jac FROM p WHERE jac >= 0.8 ORDER BY a, b""".stripMargin),

    // -- THE production dedup chain end-to-end under one hash gate:
    //    MinHash-LSH candidates → exact-Jaccard verify → connected-component
    //    closure (star contraction) → keep one doc per cluster → filtered
    //    corpus. Every stage is the scale path (no all-pairs anywhere);
    //    the oracle replays candidates + verify in SQL and closes them with
    //    a recursive CTE --------------------------------------------------
    ("q_dedup_e2e",
      (s: SparkSession, d: String) =>
        graft.ops.Curation.applyDedup(t(s, d, "documents"),
            verifiedPairs(s, d).select("a", "b"), "doc_id")
          .groupBy("lang").agg(count(lit(1)).as("kept"))
          .orderBy("lang"),
      s"""WITH RECURSIVE ${TextOps.shingleCte.stripPrefix("WITH ")},
         |${TextOps.sigCte},
         |${TextOps.bandsCte(4, 4)},
         |cand AS (
         |  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
         |  FROM bands x JOIN bands y ON x.j = y.j AND x.bh = y.bh AND x.doc_id < y.doc_id),
         |p AS (
         |  SELECT c.a, c.b,
         |    round(len(list_intersect(sa.sh, sb.sh)) * 1.0 /
         |          (len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh))), 4) AS jac
         |  FROM cand c JOIN s sa ON sa.doc_id = c.a JOIN s sb ON sb.doc_id = c.b),
         |vp AS (SELECT a, b FROM p WHERE jac >= 0.8),
         |e AS (SELECT a AS u, b AS v FROM vp UNION SELECT b, a FROM vp),
         |walk(u, v) AS (
         |  SELECT u, u FROM (SELECT DISTINCT u FROM e)
         |  UNION
         |  SELECT w.u, e.v FROM walk w JOIN e ON w.v = e.u),
         |dropped AS (SELECT u FROM walk GROUP BY u HAVING min(v) <> u)
         |SELECT lang, count(*) AS kept FROM documents
         |WHERE doc_id NOT IN (SELECT u FROM dropped)
         |GROUP BY 1 ORDER BY 1""".stripMargin),

    // -- market-basket association rules over order line items: directed
    //    part pairs co-bought in one order, with exact integer support,
    //    ppm confidence (n_ab·1e6 div n_a) and lift numerator carried in
    //    DECIMAL/HUGEINT (n_ab·N·1e6 wraps a long on ~1e9-order data).
    //    The pair self-join is keyed on the ORDER and fans out only
    //    order-size² (TPC-H-ish orders hold ≤ 7 distinct parts) — the
    //    same boundedness argument as q_covisit's power-user guard, here
    //    structural. Support ≥ 5 keeps the rule table decision-sized ------
    ("q_basket_rules",
      (s: SparkSession, d: String) => {
        // items is CORPUS-sized (one row per distinct order-part): never
        // pinned — each consumer recomputes the distinct (linear scans);
        // a localCheckpoint here OOMed the 8g harness at 100x
        val items = t(s, d, "lineitem")
          .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
          .distinct()
        val nOrders = items.select(col("ok")).distinct().count()
        val cnt = items.groupBy("pk").agg(count(lit(1)).as("n_item"))
        val pairs = items
          .join(items.select(col("ok"), col("pk").as("pb")), Seq("ok"))
          .filter(col("pk") =!= col("pb"))
          .groupBy(col("pk").as("a"), col("pb").as("b"))
          .agg(count(lit(1)).as("n_ab"))
          .filter(col("n_ab") >= 5L)
        pairs
          .join(broadcast(cnt.select(col("pk").as("a"), col("n_item").as("n_a"))), Seq("a"))
          .join(broadcast(cnt.select(col("pk").as("b"), col("n_item").as("n_b"))), Seq("b"))
          .select(col("a"), col("b"), col("n_ab"), col("n_a"), col("n_b"),
            expr("(n_ab * 1000000L) div n_a").as("conf_ppm"),
            // truncating integral div on DECIMAL operands — a decimal
            // DIVISION would round at its result scale before any cast,
            // disagreeing with the oracle's floor `//` near integers
            expr(s"(CAST(n_ab AS DECIMAL(38,0)) * ${nOrders}L * 1000000L) " +
              "div (CAST(n_a AS DECIMAL(38,0)) * n_b)").as("lift_e6"))
          .orderBy("a", "b")
      },
      """WITH it AS MATERIALIZED (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
        |  FROM lineitem),
        |no AS (SELECT CAST(count(DISTINCT ok) AS BIGINT) AS n_orders FROM it),
        |cnt AS (SELECT pk, CAST(count(*) AS BIGINT) AS n_item FROM it GROUP BY 1),
        |pr AS (SELECT x.pk AS a, y.pk AS b, CAST(count(*) AS BIGINT) AS n_ab
        |       FROM it x JOIN it y ON x.ok = y.ok AND x.pk <> y.pk
        |       GROUP BY 1, 2 HAVING count(*) >= 5)
        |SELECT a, b, n_ab, ca.n_item AS n_a, cb.n_item AS n_b,
        |  (n_ab * 1000000) // ca.n_item AS conf_ppm,
        |  CAST((cast(n_ab AS HUGEINT) * n_orders * 1000000)
        |    // (cast(ca.n_item AS HUGEINT) * cb.n_item) AS BIGINT) AS lift_e6
        |FROM pr JOIN cnt ca ON pr.a = ca.pk JOIN cnt cb ON pr.b = cb.pk
        |CROSS JOIN no ORDER BY a, b""".stripMargin),

    // -- exact Kendall tau-b between daily purchase revenue and daily
    //    event volume: the rank statistic that q_spearman's midranks
    //    approximate, computed from EXACT concordant/discordant/tie pair
    //    counts. Scale shape: the corpus reduces to the DAYS table first
    //    (one groupBy with map-side combine), and the O(days²) pair join
    //    runs on that BOUNDED table — day count grows with the time
    //    horizon, not the corpus, so 100× data is the same pair count.
    //    Concordance decided by sign comparison (no diff products — cents
    //    × count diffs would be fine today but the comparison form never
    //    overflows); tau-b denominator per-factor sqrt'd ------------------
    ("q_kendall",
      (s: SparkSession, d: String) => {
        val byDay = t(s, d, "events")
          .select(expr("ts div 86400000000000").as("day"), col("event_type"),
            cents(col("value")).as("c"))
          .groupBy("day")
          .agg(sum(when(col("event_type") === "purchase", col("c"))
            .otherwise(0L)).as("x"),
            count(lit(1)).as("y"))
          .localCheckpoint(true) // days-sized, read by pairs + the count
        val a = byDay.select(col("day").as("di"), col("x").as("xi"),
          col("y").as("yi"))
        val b = byDay.select(col("day").as("dj"), col("x").as("xj"),
          col("y").as("yj"))
        val cnt = pairsAgg(a.join(b, col("di") < col("dj")))
        cnt.crossJoin(broadcast(byDay.agg(count(lit(1)).as("n_days"))))
          .select(col("n_days"), col("nc"), col("nd"),
            col("tx"), col("ty"), col("txy"),
            round(tauB(col("nc"), col("nd"), col("tx"), col("ty")), 6)
              .as("tau_b"))
      },
      """WITH bd AS (SELECT epoch_ms(ts) // 86400000 AS day,
        |    CAST(sum(CASE WHEN event_type = 'purchase'
        |                  THEN CAST(round(value * 100) AS BIGINT)
        |                  ELSE 0 END) AS BIGINT) AS x,
        |    CAST(count(*) AS BIGINT) AS y
        |  FROM events GROUP BY 1),
        |pr AS (SELECT
        |    CAST(sum(CASE WHEN (a.x < b.x AND a.y < b.y)
        |                    OR (a.x > b.x AND a.y > b.y)
        |                  THEN 1 ELSE 0 END) AS BIGINT) AS nc,
        |    CAST(sum(CASE WHEN (a.x < b.x AND a.y > b.y)
        |                    OR (a.x > b.x AND a.y < b.y)
        |                  THEN 1 ELSE 0 END) AS BIGINT) AS nd,
        |    CAST(sum(CASE WHEN a.x = b.x AND a.y <> b.y
        |                  THEN 1 ELSE 0 END) AS BIGINT) AS tx,
        |    CAST(sum(CASE WHEN a.y = b.y AND a.x <> b.x
        |                  THEN 1 ELSE 0 END) AS BIGINT) AS ty,
        |    CAST(sum(CASE WHEN a.x = b.x AND a.y = b.y
        |                  THEN 1 ELSE 0 END) AS BIGINT) AS txy
        |  FROM bd a JOIN bd b ON a.day < b.day),
        |nn AS (SELECT CAST(count(*) AS BIGINT) AS n_days FROM bd)
        |SELECT n_days, nc, nd, tx, ty, txy,
        |  CASE WHEN nc + nd + ty > 0 AND nc + nd + tx > 0
        |       THEN round(CAST(nc - nd AS DOUBLE) /
        |         (sqrt(CAST(nc + nd + ty AS DOUBLE)) *
        |          sqrt(CAST(nc + nd + tx AS DOUBLE))), 6)
        |  END AS tau_b
        |FROM pr CROSS JOIN nn""".stripMargin)
  )

  // LEAVE-ONE-GROUP-OUT Kendall tau-b jackknife: the q_auc_jackknife
  // inclusion-exclusion pattern applied to the tau pair counts — pair
  // classes are counted once per (gi, gj) group-pair CELL (<= 36 rows),
  // so every replicate is pure algebra on that bounded table; replicate
  // taus dec6 -> exact deviation moments -> the standard jackknife SE.
  // Lazy so the entries val (declared earlier) can append it safely.
  private lazy val tjq: (String, Fn, String) = (
    "q_tau_jackknife",
    (s: SparkSession, d: String) => {
      val dec = org.apache.spark.sql.types.DecimalType(18, 6)
      val byDay = t(s, d, "events")
        .select(expr("ts div 86400000000000").as("day"), col("event_type"),
          cents(col("value")).as("c"))
        .groupBy("day")
        .agg(sum(when(col("event_type") === "purchase", col("c"))
          .otherwise(0L)).as("x"),
          count(lit(1)).as("y"))
        .withColumn("g", pmod(col("day"), lit(6L)))
        .localCheckpoint(true) // days-sized; pairs + groups + count
      val a = byDay.select(col("day").as("di"), col("g").as("gi"),
        col("x").as("xi"), col("y").as("yi"))
      val b = byDay.select(col("day").as("dj"), col("g").as("gj"),
        col("x").as("xj"), col("y").as("yj"))
      // pair classes per (gi, gj) CELL — ≤36 rows; every leave-one-out
      // replicate is then pure algebra on this bounded table
      val cls = a.join(b, col("di") < col("dj"))
        .groupBy("gi", "gj").agg(kendallCounts.head, kendallCounts.tail: _*)
        .localCheckpoint(true)
      val tot = cls.agg(sum(col("nc")).as("nc"), sum(col("nd")).as("nd"),
        sum(col("tx")).as("tx"), sum(col("ty")).as("ty"),
        sum(col("txy")).as("txy"))
      val groups = byDay.select(col("g")).distinct()
      val loo = groups.join(cls, col("gi") =!= col("g") && col("gj") =!= col("g"))
        .groupBy("g")
        .agg(sum(col("nc")).as("nc"), sum(col("nd")).as("nd"),
          sum(col("tx")).as("tx"), sum(col("ty")).as("ty"))
      val aj = loo
        .select(round(tauB(col("nc"), col("nd"), col("tx"), col("ty")), 6)
          .cast(dec).as("taug"))
        .filter(col("taug").isNotNull)
        .localCheckpoint(true) // ≤6 rows, read by st + md + the dev sum
      val st = aj.agg(count(lit(1)).as("ng"),
        round(sum(col("taug")).cast("double") / count(lit(1)), 6).as("adot"))
      val dev = aj.crossJoin(broadcast(st))
        .select(round((col("taug").cast("double") - col("adot")) *
          (col("taug").cast("double") - col("adot")), 6).cast(dec).as("d2"),
          col("ng"))
        .groupBy("ng").agg(sum(col("d2")).as("ssq"))
      tot.crossJoin(broadcast(byDay.agg(count(lit(1)).as("n_days"))))
        .crossJoin(broadcast(dev))
        .select(col("n_days"), col("nc"), col("nd"),
          round(tauB(col("nc"), col("nd"), col("tx"), col("ty")), 6)
            .as("tau_b"),
          col("ng").as("n_groups"),
          round(sqrt((col("ng") - 1).cast("double") / col("ng") *
            col("ssq").cast("double")), 6).as("jack_se"))
    },
    """WITH bd AS (SELECT day, x, y, day % 6 AS g FROM (
      |    SELECT epoch_ms(ts) // 86400000 AS day,
      |      CAST(sum(CASE WHEN event_type = 'purchase'
      |                    THEN CAST(round(value * 100) AS BIGINT)
      |                    ELSE 0 END) AS BIGINT) AS x,
      |      CAST(count(*) AS BIGINT) AS y
      |    FROM events GROUP BY 1)),
      |cls AS MATERIALIZED (SELECT a.g AS gi, b.g AS gj,
      |    CAST(sum(CASE WHEN (a.x < b.x AND a.y < b.y)
      |                    OR (a.x > b.x AND a.y > b.y)
      |                  THEN 1 ELSE 0 END) AS BIGINT) AS nc,
      |    CAST(sum(CASE WHEN (a.x < b.x AND a.y > b.y)
      |                    OR (a.x > b.x AND a.y < b.y)
      |                  THEN 1 ELSE 0 END) AS BIGINT) AS nd,
      |    CAST(sum(CASE WHEN a.x = b.x AND a.y <> b.y
      |                  THEN 1 ELSE 0 END) AS BIGINT) AS tx,
      |    CAST(sum(CASE WHEN a.y = b.y AND a.x <> b.x
      |                  THEN 1 ELSE 0 END) AS BIGINT) AS ty,
      |    CAST(sum(CASE WHEN a.x = b.x AND a.y = b.y
      |                  THEN 1 ELSE 0 END) AS BIGINT) AS txy
      |  FROM bd a JOIN bd b ON a.day < b.day GROUP BY 1, 2),
      |tot AS (SELECT CAST(sum(nc) AS BIGINT) AS nc,
      |    CAST(sum(nd) AS BIGINT) AS nd, CAST(sum(tx) AS BIGINT) AS tx,
      |    CAST(sum(ty) AS BIGINT) AS ty FROM cls),
      |gs AS (SELECT DISTINCT g FROM bd),
      |loo AS (SELECT gs.g, CAST(sum(nc) AS BIGINT) AS nc,
      |    CAST(sum(nd) AS BIGINT) AS nd, CAST(sum(tx) AS BIGINT) AS tx,
      |    CAST(sum(ty) AS BIGINT) AS ty
      |  FROM gs JOIN cls ON cls.gi <> gs.g AND cls.gj <> gs.g
      |  GROUP BY 1),
      |aj AS MATERIALIZED (SELECT taug FROM (
      |    SELECT CAST(round(
      |      CASE WHEN nc + nd + ty > 0 AND nc + nd + tx > 0 THEN
      |        CAST(nc - nd AS DOUBLE) / (sqrt(CAST(nc + nd + ty AS DOUBLE))
      |          * sqrt(CAST(nc + nd + tx AS DOUBLE))) END, 6)
      |      AS DECIMAL(18,6)) AS taug
      |    FROM loo) q
      |  WHERE taug IS NOT NULL),
      |st AS (SELECT CAST(count(*) AS BIGINT) AS ng,
      |    round(CAST(sum(taug) AS DOUBLE) / count(*), 6) AS adot FROM aj),
      |dev AS (SELECT ng, sum(CAST(round((CAST(taug AS DOUBLE) - adot)
      |      * (CAST(taug AS DOUBLE) - adot), 6) AS DECIMAL(18,6))) AS ssq
      |  FROM aj CROSS JOIN st GROUP BY 1),
      |nn AS (SELECT CAST(count(*) AS BIGINT) AS n_days FROM bd)
      |SELECT n_days, nc, nd,
      |  round(CASE WHEN nc + nd + ty > 0 AND nc + nd + tx > 0 THEN
      |    CAST(nc - nd AS DOUBLE) / (sqrt(CAST(nc + nd + ty AS DOUBLE))
      |      * sqrt(CAST(nc + nd + tx AS DOUBLE))) END, 6) AS tau_b,
      |  ng AS n_groups,
      |  round(sqrt(CAST(ng - 1 AS DOUBLE) / ng * CAST(ssq AS DOUBLE)), 6)
      |    AS jack_se
      |FROM tot CROSS JOIN nn CROSS JOIN dev""".stripMargin)

  /** The five exact Kendall pair-class count columns over a
    * (xi, yi) × (xj, yj) pair frame: concordant, discordant, x-only
    * ties, y-only ties, both-tied — shared by the global aggregate
    * (q_kendall) and the per-group-pair table (q_tau_jackknife).
    */
  private def kendallCounts: Seq[Column] = Seq(
    sum(when((col("xi") < col("xj") && col("yi") < col("yj")) ||
      (col("xi") > col("xj") && col("yi") > col("yj")), 1L)
      .otherwise(0L)).as("nc"),
    sum(when((col("xi") < col("xj") && col("yi") > col("yj")) ||
      (col("xi") > col("xj") && col("yi") < col("yj")), 1L)
      .otherwise(0L)).as("nd"),
    sum(when(col("xi") === col("xj") && col("yi") =!= col("yj"), 1L)
      .otherwise(0L)).as("tx"),
    sum(when(col("yi") === col("yj") && col("xi") =!= col("xj"), 1L)
      .otherwise(0L)).as("ty"),
    sum(when(col("xi") === col("xj") && col("yi") === col("yj"), 1L)
      .otherwise(0L)).as("txy"))

  /** Exact Kendall pair-count aggregate (global form). */
  private def pairsAgg(pairs: DataFrame): DataFrame =
    pairs.agg(kendallCounts.head, kendallCounts.tail: _*)

  /** The tau-b double from the five counts — ONE expression tree shared
    * by the full statistic and every jackknife replicate, NULL-guarded
    * on empty denominators.
    */
  private def tauB(nc: Column, nd: Column, tx: Column, ty: Column): Column =
    when((nc + nd + ty) > 0L && (nc + nd + tx) > 0L,
      (nc - nd).cast("double") /
        (sqrt((nc + nd + ty).cast("double")) *
          sqrt((nc + nd + tx).cast("double"))))
}
