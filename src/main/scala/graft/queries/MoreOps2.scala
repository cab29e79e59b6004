package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import Q._

/** Third coverage batch (round 2): cube/grouping-id, unpivot/melt, the full
  * ranking-window surface (ntile/percent_rank/cume_dist/lead/lag/first_value
  * + a bounded running frame), exact quantiles, anti/full-outer joins, the
  * binned range join (graft.ops.RangeJoin), time-series gap fill, regex
  * extraction, and a shuffle-light high-cardinality mode variant.
  *
  * All entries follow the determinism conventions in [[Q]] (total ORDER BY,
  * decimal sums, epoch integers, matching aliases both engines).
  */
object MoreOps2 {

  type Fn = (SparkSession, String) => DataFrame

  private val MS_PER_DAY = 86400000L
  private val NS_PER_HOUR = 3600L * 1000 * 1000 * 1000

  val entries: Seq[(String, Fn, String)] = Seq(

    // -- CUBE with grouping_id: all four aggregation levels in one pass
    //    (map-side partial agg handles every grouping set; one shuffle) ------
    ("q_cube",
      (s: SparkSession, d: String) =>
        t(s, d, "lineitem")
          .cube(col("l_returnflag"), col("l_linestatus"))
          .agg(grouping_id().cast("long").as("gid"),
            count(lit(1)).as("cnt"), dsum(col("l_quantity")).as("qty"))
          .orderBy(asc("gid"), asc_nulls_first("l_returnflag"),
            asc_nulls_first("l_linestatus")),
      s"""SELECT l_returnflag, l_linestatus,
         |  cast(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
         |  count(*) AS cnt, ${sqlDsum("l_quantity")} AS qty
         |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
         |ORDER BY gid, l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin),

    // -- unpivot / melt: wide measure columns -> (metric, val) rows ---------
    ("q_unpivot",
      (s: SparkSession, d: String) =>
        t(s, d, "lineitem").filter(col("l_orderkey") < 100)
          .unpivot(
            Array(col("l_orderkey"), col("l_linenumber")),
            Array(col("l_quantity"), col("l_discount"), col("l_tax")),
            "metric", "val")
          .orderBy("l_orderkey", "l_linenumber", "metric"),
      """SELECT l_orderkey, l_linenumber, metric, val FROM (
        |  SELECT l_orderkey, l_linenumber, 'l_quantity' AS metric, l_quantity AS val
        |    FROM lineitem WHERE l_orderkey < 100
        |  UNION ALL
        |  SELECT l_orderkey, l_linenumber, 'l_discount', l_discount
        |    FROM lineitem WHERE l_orderkey < 100
        |  UNION ALL
        |  SELECT l_orderkey, l_linenumber, 'l_tax', l_tax
        |    FROM lineitem WHERE l_orderkey < 100)
        |ORDER BY l_orderkey, l_linenumber, metric""".stripMargin),

    // -- ranking/analytic window surface: ntile, percent_rank, cume_dist,
    //    lag/lead, first_value, and a bounded running frame — one shuffle on
    //    the partition key, every function reuses the same sort ---------------
    ("q_window_frames",
      (s: SparkSession, d: String) => {
        val w = Window.partitionBy("o_orderpriority")
          .orderBy(col("o_totalprice"), col("o_orderkey"))
        val wf = w.rowsBetween(-3, Window.currentRow)
        t(s, d, "orders").filter(col("o_orderkey") < 2000)
          .select(col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"),
            ntile(4).over(w).cast("long").as("quartile"),
            round(percent_rank().over(w), 4).as("pr"),
            round(cume_dist().over(w), 4).as("cd"),
            lag(col("o_totalprice"), 1).over(w).as("prev_price"),
            lead(col("o_totalprice"), 1).over(w).as("next_price"),
            first(col("o_totalprice")).over(w).as("min_price"),
            round(sum(col("o_totalprice").cast(DecimalType(18, 6))).over(wf)
              .cast("double"), 4).as("run4_sum"))
          .orderBy("o_orderpriority", "o_totalprice", "o_orderkey")
      },
      """SELECT o_orderkey, o_orderpriority, o_totalprice,
        |  cast(ntile(4) OVER w AS BIGINT) AS quartile,
        |  round(percent_rank() OVER w, 4) AS pr,
        |  round(cume_dist() OVER w, 4) AS cd,
        |  lag(o_totalprice, 1) OVER w AS prev_price,
        |  lead(o_totalprice, 1) OVER w AS next_price,
        |  first_value(o_totalprice) OVER w AS min_price,
        |  round(cast(sum(cast(o_totalprice AS DECIMAL(18,6)))
        |    OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey
        |          ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS DOUBLE), 4) AS run4_sum
        |FROM orders WHERE o_orderkey < 2000
        |WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
        |ORDER BY o_orderpriority, o_totalprice, o_orderkey""".stripMargin),

    // -- exact quantiles (continuous interpolation — matches quantile_cont)
    //    via StatsOps.exactPercentiles: range-sort + index selection, no
    //    single-reducer value-count map (the built-in percentile's merge) --
    ("q_quantiles",
      (s: SparkSession, d: String) => {
        val li = t(s, d, "lineitem")
        val qs = graft.ops.StatsOps
          .exactPercentiles(li, "l_quantity", Seq(0.25, 0.5, 0.75))
        val p90 = graft.ops.StatsOps
          .exactPercentiles(li, "l_extendedprice", Seq(0.9)).head
        li.sparkSession.range(1).select(
          round(lit(qs(0)), 4).as("qty_p25"),
          round(lit(qs(1)), 4).as("qty_p50"),
          round(lit(qs(2)), 4).as("qty_p75"),
          round(lit(p90), 4).as("price_p90"))
      },
      """SELECT round(quantile_cont(l_quantity, 0.25), 4) AS qty_p25,
        |  round(quantile_cont(l_quantity, 0.5), 4) AS qty_p50,
        |  round(quantile_cont(l_quantity, 0.75), 4) AS qty_p75,
        |  round(quantile_cont(l_extendedprice, 0.9), 4) AS price_p90
        |FROM lineitem""".stripMargin),

    // -- anti join: customers with no URGENT order (restricting the orders
    //    side keeps the result genuinely non-empty at every tested SF —
    //    unfiltered, TPC-H custkeys all have orders and the check is vacuous) -
    ("q_anti_join",
      (s: SparkSession, d: String) => {
        val o = t(s, d, "orders")
          .filter(col("o_orderpriority") === "1-URGENT")
          .select(col("o_custkey"))
        t(s, d, "customer")
          .join(o, col("c_custkey") === col("o_custkey"), "left_anti")
          .select("c_custkey", "c_nationkey", "c_mktsegment")
          .orderBy("c_custkey")
      },
      """SELECT c_custkey, c_nationkey, c_mktsegment FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o
        |                  WHERE o.o_custkey = c.c_custkey
        |                    AND o.o_orderpriority = '1-URGENT')
        |ORDER BY c_custkey""".stripMargin),

    // -- full outer join of two aggregates (asymmetric sides so both outer
    //    directions are exercised) ------------------------------------------
    ("q_full_outer",
      (s: SparkSession, d: String) => {
        val c = t(s, d, "customer").filter(col("c_mktsegment") === "BUILDING")
          .groupBy(col("c_nationkey").as("ck")).agg(count(lit(1)).as("n_cust"))
        val su = t(s, d, "supplier").filter(col("s_acctbal") > 5000.0)
          .groupBy(col("s_nationkey").as("sk")).agg(count(lit(1)).as("n_supp"))
        c.join(su, col("ck") === col("sk"), "full_outer")
          .select(coalesce(col("ck"), col("sk")).as("nationkey"),
            coalesce(col("n_cust"), lit(0L)).as("n_cust"),
            coalesce(col("n_supp"), lit(0L)).as("n_supp"))
          .orderBy("nationkey")
      },
      """SELECT coalesce(ck, sk) AS nationkey,
        |  coalesce(n_cust, 0) AS n_cust, coalesce(n_supp, 0) AS n_supp
        |FROM (SELECT c_nationkey AS ck, count(*) AS n_cust FROM customer
        |      WHERE c_mktsegment = 'BUILDING' GROUP BY 1) c
        |FULL OUTER JOIN (SELECT s_nationkey AS sk, count(*) AS n_supp FROM supplier
        |      WHERE s_acctbal > 5000.0 GROUP BY 1) s ON ck = sk
        |ORDER BY nationkey""".stripMargin),

    // -- range (interval) join via the binned rewrite in ops.RangeJoin:
    //    line items shipped within 7 days of a big order's date. The oracle
    //    is the naive inequality join — the binned equi-join must agree
    //    exactly (day bins, binWidth = interval length) ----------------------
    ("q_range_join",
      (s: SparkSession, d: String) => {
        // day-number via datediff on DATE: tz-independent and valid on the
        // TIMESTAMP_NTZ parquet columns (unix_millis rejects NTZ input)
        val dayNum = (c: String) =>
          expr(s"cast(datediff(cast($c as date), DATE'1970-01-01') as bigint)")
        // pre-aggregate points per day BEFORE the bin join: the downstream
        // is a per-interval count, so point multiplicity collapses to a
        // weight — the join sees ~2.4k distinct days instead of 600k rows
        // (the generic weightless form is ops.RangeJoin on raw points)
        val points = t(s, d, "lineitem")
          .groupBy(dayNum("l_shipdate").as("p_day"))
          .agg(count(lit(1)).as("day_cnt"))
        val intervals = t(s, d, "orders").filter(col("o_totalprice") > 450000.0)
          .select(col("o_orderkey"),
            dayNum("o_orderdate").as("start_day"),
            (dayNum("o_orderdate") + 7L).as("end_day"))
        graft.ops.RangeJoin.pointInInterval(points, intervals,
            "p_day", "start_day", "end_day", binWidth = 7L)
          .groupBy("o_orderkey").agg(sum(col("day_cnt")).as("n_shipped"))
          .orderBy("o_orderkey")
      },
      s"""SELECT o_orderkey, count(*) AS n_shipped
         |FROM orders JOIN lineitem
         |  ON epoch_ms(l_shipdate) // $MS_PER_DAY
         |     BETWEEN epoch_ms(o_orderdate) // $MS_PER_DAY
         |         AND epoch_ms(o_orderdate) // $MS_PER_DAY + 7
         |WHERE o_totalprice > 450000.0
         |GROUP BY 1 ORDER BY 1""".stripMargin),

    // -- time-series gap fill: hourly click counts with missing hours
    //    zero-filled across the table's full span (sequence + left join —
    //    the generated axis is O(span/width), never a per-row explode) -------
    ("q_gap_fill",
      (s: SparkSession, d: String) => {
        val ev = t(s, d, "events")
        val counts = ev.filter(col("event_type") === "click")
          .groupBy(expr(s"ts div ${NS_PER_HOUR}L").as("h"))
          .agg(count(lit(1)).as("cnt"))
        val bounds = ev.agg(
          expr(s"min(ts div ${NS_PER_HOUR}L)").as("mn"),
          expr(s"max(ts div ${NS_PER_HOUR}L)").as("mx"))
        bounds.select(explode(sequence(col("mn"), col("mx"))).as("h"))
          .join(counts, Seq("h"), "left")
          .select((col("h") * 3600L).as("hour_epoch"),
            coalesce(col("cnt"), lit(0L)).as("cnt"))
          .orderBy("hour_epoch")
      },
      """WITH c AS (
        |  SELECT epoch_ms(ts) // 3600000 AS h, count(*) AS cnt
        |  FROM events WHERE event_type = 'click' GROUP BY 1),
        |b AS (SELECT min(epoch_ms(ts) // 3600000) AS mn,
        |             max(epoch_ms(ts) // 3600000) AS mx FROM events),
        |hrs AS (SELECT unnest(generate_series(mn, mx)) AS h FROM b)
        |SELECT h * 3600 AS hour_epoch, coalesce(cnt, 0) AS cnt
        |FROM hrs LEFT JOIN c USING (h) ORDER BY hour_epoch""".stripMargin),

    // -- regex extraction (capture groups; Java regex ∩ RE2 syntax) ---------
    ("q_regex_extract",
      (s: SparkSession, d: String) =>
        t(s, d, "documents")
          .select(col("doc_id"),
            regexp_extract(col("source"), "src(\\d+)", 1).cast("long").as("src_num"),
            regexp_extract(col("text"), "\\b(sp\\w+)\\b", 1).as("first_sp"))
          .filter(col("doc_id") < 200)
          .orderBy("doc_id"),
      """SELECT doc_id,
        |  cast(regexp_extract(source, 'src(\d+)', 1) AS BIGINT) AS src_num,
        |  regexp_extract(text, '\b(sp\w+)\b', 1) AS first_sp
        |FROM documents WHERE doc_id < 200 ORDER BY doc_id""".stripMargin),

    // -- high-cardinality mode: agg-max + equality join instead of a global
    //    window (no single-partition sort; the 1-row max broadcasts) ---------
    ("q_mode_hc",
      (s: SparkSession, d: String) => {
        val counts = t(s, d, "orders").groupBy(col("o_custkey"))
          .agg(count(lit(1)).as("cnt"))
        val mx = counts.agg(max(col("cnt")).as("mx"))
        counts.join(broadcast(mx), col("cnt") === col("mx"))
          .select(col("o_custkey").as("value"), col("cnt"))
          .orderBy("value")
      },
      """SELECT o_custkey AS value, count(*) AS cnt FROM orders GROUP BY 1
        |HAVING count(*) = (SELECT count(*) AS c FROM orders GROUP BY o_custkey
        |                   ORDER BY c DESC LIMIT 1)
        |ORDER BY value""".stripMargin)
  )
}
