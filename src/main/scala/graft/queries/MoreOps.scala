package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import Q._

/** Second coverage batch: set operations, semi-joins, HAVING, CASE
  * bucketing, and the scalar string/date/null function surface — all
  * oracle-paired.
  */
object MoreOps {

  type Fn = (SparkSession, String) => DataFrame

  val entries: Seq[(String, Fn, String)] = Seq(

    // -- multi-column DISTINCT --------------------------------------------
    ("q_distinct_multi",
      (s: SparkSession, d: String) =>
        t(s, d, "orders").select("o_orderstatus", "o_orderpriority")
          .distinct().orderBy("o_orderstatus", "o_orderpriority"),
      "SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders ORDER BY 1, 2"),

    // -- group-by + HAVING -------------------------------------------------
    ("q_having",
      (s: SparkSession, d: String) =>
        t(s, d, "orders").groupBy("o_custkey")
          .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("spend"))
          .filter(col("n_orders") >= 15)
          .orderBy("o_custkey"),
      s"SELECT o_custkey, count(*) AS n_orders, ${sqlDsum("o_totalprice")} AS spend " +
        "FROM orders GROUP BY 1 HAVING count(*) >= 15 ORDER BY 1"),

    // -- CASE WHEN bucketing ----------------------------------------------
    ("q_case_bands",
      (s: SparkSession, d: String) =>
        t(s, d, "orders")
          .select(when(col("o_totalprice") < 50000.0, "low")
            .when(col("o_totalprice") < 200000.0, "mid")
            .otherwise("high").as("band"), col("o_totalprice"))
          .groupBy("band")
          .agg(count(lit(1)).as("cnt"), dsum(col("o_totalprice")).as("sm"))
          .orderBy("band"),
      "SELECT CASE WHEN o_totalprice < 50000.0 THEN 'low' " +
        "WHEN o_totalprice < 200000.0 THEN 'mid' ELSE 'high' END AS band, " +
        s"count(*) AS cnt, ${sqlDsum("o_totalprice")} AS sm FROM orders GROUP BY 1 ORDER BY 1"),

    // -- set operations: union / intersect / except (distinct semantics
    //    both engines) -----------------------------------------------------
    ("q_set_ops",
      (s: SparkSession, d: String) => {
        val c = t(s, d, "customer")
        val building = c.filter(col("c_mktsegment") === "BUILDING").select("c_nationkey")
        val auto = c.filter(col("c_mktsegment") === "AUTOMOBILE").select("c_nationkey")
        // one lazy plan: three 1-row aggregates cross-joined (broadcast),
        // not three eager .count() actions on the driver
        building.union(auto).distinct().agg(count(lit(1)).as("n_union"))
          .crossJoin(building.intersect(auto).agg(count(lit(1)).as("n_intersect")))
          .crossJoin(building.except(auto).agg(count(lit(1)).as("n_except")))
      },
      """SELECT
        |  (SELECT count(*) FROM (SELECT c_nationkey FROM customer WHERE c_mktsegment = 'BUILDING'
        |    UNION SELECT c_nationkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE')) AS n_union,
        |  (SELECT count(*) FROM (SELECT c_nationkey FROM customer WHERE c_mktsegment = 'BUILDING'
        |    INTERSECT SELECT c_nationkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE')) AS n_intersect,
        |  (SELECT count(*) FROM (SELECT c_nationkey FROM customer WHERE c_mktsegment = 'BUILDING'
        |    EXCEPT SELECT c_nationkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE')) AS n_except""".stripMargin),

    // -- EXISTS / semi-join: orders with >= 5 line items --------------------
    ("q_exists_semi",
      (s: SparkSession, d: String) => {
        val big = t(s, d, "lineitem").groupBy("l_orderkey")
          .agg(count(lit(1)).as("n")).filter(col("n") >= 5)
          .select(col("l_orderkey"))
        t(s, d, "orders")
          .join(big, col("o_orderkey") === col("l_orderkey"), "left_semi")
          .agg(count(lit(1)).as("cnt"), dsum(col("o_totalprice")).as("sm"))
      },
      s"SELECT count(*) AS cnt, ${sqlDsum("o_totalprice")} AS sm FROM orders " +
        "WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem GROUP BY 1 HAVING count(*) >= 5)"),

    // -- scalar string functions ------------------------------------------
    ("q_string_funcs",
      (s: SparkSession, d: String) =>
        t(s, d, "customer").filter(col("c_custkey") < 50)
          .select(
            col("c_custkey"),
            upper(col("c_mktsegment")).as("seg_up"),
            lower(col("c_name")).as("name_lo"),
            substring(col("c_name"), 10, 6).as("name_mid"),
            regexp_replace(col("c_name"), "Customer", "C").as("name_short"),
            lpad(col("c_custkey").cast("string"), 8, "0").as("key_pad"),
            length(col("c_name")).cast("long").as("name_len"),
            trim(concat(lit("  "), col("c_mktsegment"), lit(" "))).as("seg_trim"))
          .orderBy("c_custkey"),
      """SELECT c_custkey, upper(c_mktsegment) AS seg_up, lower(c_name) AS name_lo,
        |substr(c_name, 10, 6) AS name_mid,
        |regexp_replace(c_name, 'Customer', 'C', 'g') AS name_short,
        |lpad(cast(c_custkey AS VARCHAR), 8, '0') AS key_pad,
        |cast(length(c_name) AS BIGINT) AS name_len,
        |trim('  ' || c_mktsegment || ' ') AS seg_trim
        |FROM customer WHERE c_custkey < 50 ORDER BY c_custkey""".stripMargin),

    // -- date part extraction (dayofweek: Spark is 1=Sunday, DuckDB
    //    0=Sunday — oracle shifts by one) -----------------------------------
    ("q_date_funcs",
      (s: SparkSession, d: String) =>
        t(s, d, "orders").filter(col("o_orderkey") < 100)
          .select(
            col("o_orderkey"),
            year(col("o_orderdate")).cast("long").as("y"),
            month(col("o_orderdate")).cast("long").as("m"),
            dayofmonth(col("o_orderdate")).cast("long").as("dom"),
            quarter(col("o_orderdate")).cast("long").as("q"),
            dayofweek(col("o_orderdate")).cast("long").as("dow_sun1"))
          .orderBy("o_orderkey"),
      """SELECT o_orderkey, cast(year(o_orderdate) AS BIGINT) AS y,
        |cast(month(o_orderdate) AS BIGINT) AS m,
        |cast(day(o_orderdate) AS BIGINT) AS dom,
        |cast(quarter(o_orderdate) AS BIGINT) AS q,
        |cast(dayofweek(o_orderdate) + 1 AS BIGINT) AS dow_sun1
        |FROM orders WHERE o_orderkey < 100 ORDER BY o_orderkey""".stripMargin),

    // -- null-handling functions: nullif / coalesce / null flags ----------
    ("q_null_funcs",
      (s: SparkSession, d: String) =>
        t(s, d, "lineitem").filter(col("l_orderkey") < 50)
          .select(
            col("l_orderkey"), col("l_linenumber"),
            nullif(col("l_discount"), lit(0.0)).as("disc_or_null"),
            coalesce(nullif(col("l_discount"), lit(0.0)), lit(-1.0)).as("disc_or_neg1"),
            nullif(col("l_discount"), lit(0.0)).isNull.as("zero_disc"))
          .orderBy("l_orderkey", "l_linenumber"),
      """SELECT l_orderkey, l_linenumber,
        |nullif(l_discount, 0.0) AS disc_or_null,
        |coalesce(nullif(l_discount, 0.0), -1.0) AS disc_or_neg1,
        |nullif(l_discount, 0.0) IS NULL AS zero_disc
        |FROM lineitem WHERE l_orderkey < 50 ORDER BY l_orderkey, l_linenumber""".stripMargin),

    // -- pivot: event counts per type as columns (CASE-sum oracle) --------
    ("q_pivot",
      (s: SparkSession, d: String) =>
        t(s, d, "events")
          .select(expr("ts div 86400000000000").as("day"), col("event_type"))
          .groupBy("day")
          .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
          .agg(count(lit(1)))
          .na.fill(0L)
          .orderBy("day"),
      """SELECT cast(epoch(date_trunc('day', ts)) / 86400 AS BIGINT) AS day,
        |cast(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
        |cast(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error,
        |cast(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
        |cast(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup,
        |cast(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin),

    // -- rollup: subtotal rows over (returnflag, linestatus); Spark sorts
    //    nulls first on ASC, DuckDB last -> explicit NULLS FIRST ------------
    ("q_rollup",
      (s: SparkSession, d: String) =>
        t(s, d, "lineitem")
          .rollup(col("l_returnflag"), col("l_linestatus"))
          .agg(count(lit(1)).as("cnt"), dsum(col("l_quantity")).as("qty"))
          .orderBy(asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus")),
      s"""SELECT l_returnflag, l_linestatus, count(*) AS cnt, ${sqlDsum("l_quantity")} AS qty
         |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
         |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin),

    // -- array explode with ordinality ------------------------------------
    ("q_explode",
      (s: SparkSession, d: String) =>
        t(s, d, "embeddings").filter(col("vec_id") < 3)
          .select(col("vec_id"), posexplode(col("embedding")))
          .select(col("vec_id"), (col("pos") + 1).as("pos"), col("col").as("val"))
          .orderBy("vec_id", "pos"),
      """SELECT vec_id, cast(i AS INT) AS pos, embedding[i] AS val
        |FROM embeddings, range(1, 65) r(i) WHERE vec_id < 3
        |ORDER BY vec_id, pos""".stripMargin),

    // -- array aggregation (deterministic via sorted distinct). The array is
    //    serialized to a CSV string in BOTH engines: the driver's comparator
    //    (pandas sort_values + hash) cannot order ndarray cells, so an
    //    array-typed output column would fail the compare infrastructure
    //    even when values agree (observed in CORRECTNESS_r01) ----------------
    ("q_array_agg",
      (s: SparkSession, d: String) =>
        t(s, d, "lineitem").groupBy(col("l_returnflag"))
          .agg(array_join(sort_array(collect_set(col("l_linestatus"))), ",").as("statuses"),
            count(lit(1)).as("cnt"))
          .orderBy("l_returnflag"),
      """SELECT l_returnflag,
        |  array_to_string(list_sort(list(DISTINCT l_linestatus)), ',') AS statuses,
        |  count(*) AS cnt
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin)
  )
}
