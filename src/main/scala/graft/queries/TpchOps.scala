package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import Q._

/** TPC-H-style multi-join analytics adapted to the driver's star schema —
  * the "headline" bench queries exercising Catalyst's join planning:
  * dimension broadcasts, filter pushdown below joins, partial aggregation,
  * top-k. Dates are compared as timestamps (identical parquet values in both
  * engines) and emitted as epoch seconds.
  */
object TpchOps {

  type Fn = (SparkSession, String) => DataFrame

  /** Revenue line = extendedprice·(1−discount), computed EXACTLY as an
    * integer product of cents (Q.cents) and summed in DECIMAL(28,0) — the
    * long-backed decimal path, no per-row double→decimal conversion
    * (~3× faster on scan-bound aggregates; see Q.cents). The /10000.0
    * restores the 2+2-decimal scale; DuckDB mirrors the identical
    * expression tree (its BIGINT sum widens to HUGEINT — same exact
    * integer, same nearest-double cast), so results stay bit-identical.
    * DECIMAL(28,0) keeps per-group totals exact past 1e11 rows — a plain
    * long sum would overflow a 100 TB lineitem's groups.
    */
  private def centsProd2 =
    (cents(col("l_extendedprice")) * cents(lit(1.0) - col("l_discount")))
      .cast(DecimalType(28, 0))
  private def revenueSum = sum(centsProd2).cast("double") / 10000.0

  private val sqlCentsProd2 =
    "(cast(round(l_extendedprice * 100) AS BIGINT) * " +
      "cast(round((1.0 - l_discount) * 100) AS BIGINT))"
  private val sqlRevenueSum =
    s"(cast(sum($sqlCentsProd2) AS DOUBLE) / 10000.0)"

  val entries: Seq[(String, Fn, String)] = Seq(

    // -- Q3 analogue: shipping-priority revenue — filters push below a
    //    3-way join; customer dim broadcasts; top-10 via TakeOrdered --------
    ("q_tpch_q3",
      (s: SparkSession, d: String) =>
        t(s, d, "lineitem")
          .filter(col("l_shipdate") > lit("1997-06-30").cast("timestamp"))
          .join(t(s, d, "orders")
            .filter(col("o_orderdate") < lit("1997-06-30").cast("timestamp")),
            col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(t(s, d, "customer")
            .filter(col("c_mktsegment") === "BUILDING")),
            col("o_custkey") === col("c_custkey"))
          .groupBy(col("l_orderkey"),
            unix_timestamp(col("o_orderdate")).as("orderdate_epoch"))
          .agg(round(revenueSum, 4).as("revenue"))
          .orderBy(desc("revenue"), asc("l_orderkey"))
          .limit(10),
      s"""SELECT l_orderkey, cast(epoch(o_orderdate) AS BIGINT) AS orderdate_epoch,
         |  round($sqlRevenueSum, 4) AS revenue
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |WHERE l_shipdate > TIMESTAMP '1997-06-30'
         |  AND o_orderdate < TIMESTAMP '1997-06-30'
         |  AND c_mktsegment = 'BUILDING'
         |GROUP BY 1, 2 ORDER BY revenue DESC, l_orderkey ASC LIMIT 10""".stripMargin),

    // -- Q5 analogue: revenue by nation where customer and supplier share
    //    the nation — 6-table join, all dims broadcast ----------------------
    ("q_tpch_q5",
      (s: SparkSession, d: String) =>
        t(s, d, "lineitem")
          .join(t(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
          // customer is a dimension relative to lineitem×orders: broadcast
          // keeps the fact table's partitioning intact (one fewer shuffle);
          // at cluster scale AQE would make the same call from stats, the
          // hint pins it in this stats-free parquet-scan session
          .join(broadcast(t(s, d, "customer")), col("o_custkey") === col("c_custkey"))
          .join(broadcast(t(s, d, "supplier")), col("l_suppkey") === col("s_suppkey") &&
            col("c_nationkey") === col("s_nationkey"))
          .join(broadcast(t(s, d, "nation")), col("s_nationkey") === col("n_nationkey"))
          .join(broadcast(t(s, d, "region")), col("n_regionkey") === col("r_regionkey"))
          .groupBy(col("r_name"), col("n_name"))
          .agg(round(revenueSum, 4).as("revenue"), count(lit(1)).as("n_items"))
          .orderBy("r_name", "n_name"),
      s"""SELECT r_name, n_name, round($sqlRevenueSum, 4) AS revenue, count(*) AS n_items
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
         |JOIN nation ON s_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),

    // -- Q10 analogue: top returning customers by lost revenue --------------
    ("q_tpch_q10",
      (s: SparkSession, d: String) =>
        t(s, d, "lineitem")
          .filter(col("l_returnflag") === "R")
          .join(t(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
          // customer is a dimension vs lineitem×orders — broadcast, same
          // rationale as q_tpch_q5
          .join(broadcast(t(s, d, "customer")), col("o_custkey") === col("c_custkey"))
          .join(broadcast(t(s, d, "nation")), col("c_nationkey") === col("n_nationkey"))
          .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
          .agg(round(revenueSum, 4).as("revenue"))
          .orderBy(desc("revenue"), asc("c_custkey"))
          .limit(20),
      s"""SELECT c_custkey, c_name, n_name, round($sqlRevenueSum, 4) AS revenue
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation ON c_nationkey = n_nationkey
         |WHERE l_returnflag = 'R'
         |GROUP BY 1, 2, 3 ORDER BY revenue DESC, c_custkey ASC LIMIT 20""".stripMargin),

    // -- Q18 analogue (large-volume orders): aggregate-then-semi-join — the
    //    hot-order set comes from a HAVING aggregate and is SMALL, so it
    //    broadcasts against orders; decimal sums keep the > threshold
    //    decision identical across engines (a double sum could flip rows at
    //    the boundary) ------------------------------------------------------
    ("q_tpch_q18",
      (s: SparkSession, d: String) => {
        // quantity is integral: exact long sums replace the per-row decimal
        // cast (same > 250 decision, same double rendering of the sum)
        val hot = t(s, d, "lineitem")
          .groupBy(col("l_orderkey"))
          .agg(sum(col("l_quantity").cast("long")).as("qty"))
          .filter(col("qty") > 250)
          .select(col("l_orderkey").as("hot_key"), col("qty"))
        t(s, d, "orders")
          .join(broadcast(hot), col("o_orderkey") === col("hot_key"))
          .join(broadcast(t(s, d, "customer")), col("o_custkey") === col("c_custkey"))
          .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
            unix_timestamp(col("o_orderdate")).as("orderdate_epoch"),
            col("o_totalprice"),
            round(col("qty").cast("double"), 4).as("qty_sum"))
          .orderBy(desc("o_totalprice"), asc("o_orderkey"))
          .limit(10)
      },
      """WITH hot AS (
        |  SELECT l_orderkey, sum(cast(l_quantity AS DECIMAL(18,6))) AS qty
        |  FROM lineitem GROUP BY 1
        |  HAVING sum(cast(l_quantity AS DECIMAL(18,6))) > 250)
        |SELECT c_custkey, c_name, o_orderkey,
        |  cast(epoch(o_orderdate) AS BIGINT) AS orderdate_epoch, o_totalprice,
        |  round(cast(qty AS DOUBLE), 4) AS qty_sum
        |FROM orders
        |JOIN hot ON o_orderkey = l_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10""".stripMargin),

    // -- Q17 analogue (small-quantity-order revenue): the correlated scalar
    //    subquery "0.2 * avg quantity for this part" DECORRELATES into a
    //    per-part aggregate + equi-join. The filter is algebraically
    //    rearranged to 5·qty·cnt < qty_sum — pure exact-decimal products,
    //    no division, so the row set is identical across engines (a double
    //    avg could flip boundary rows) ---------------------------------------
    ("q_tpch_q17",
      (s: SparkSession, d: String) => {
        import org.apache.spark.sql.types.DecimalType
        // integral quantities → exact long sums and a pure-integer
        // 5·qty·cnt < qty_sum decision; revenue in integer cents summed in
        // DECIMAL(28,0), /100 after the exact sum (oracle mirrors the tree)
        val li = t(s, d, "lineitem")
          .select(col("l_partkey"), col("l_quantity"), col("l_extendedprice"))
        val pa = li.groupBy(col("l_partkey"))
          .agg(sum(col("l_quantity").cast("long")).as("qty_sum"),
            count(lit(1)).as("cnt"))
        li.join(pa, "l_partkey")
          .filter(col("l_quantity").cast("long") * lit(5) * col("cnt")
            < col("qty_sum"))
          .agg(
            round(sum(cents(col("l_extendedprice")).cast(DecimalType(28, 0)))
              .cast("double") / 100.0 / 7.0, 4).as("avg_yearly"),
            count(lit(1)).as("n_items"))
      },
      """WITH pa AS (
        |  SELECT l_partkey, cast(sum(l_quantity) AS BIGINT) AS qty_sum,
        |         count(*) AS cnt
        |  FROM lineitem GROUP BY 1)
        |SELECT round(cast(sum(cast(round(l_extendedprice * 100) AS BIGINT)) AS DOUBLE) / 100.0 / 7.0, 4) AS avg_yearly,
        |  cast(count(*) AS BIGINT) AS n_items
        |FROM lineitem JOIN pa USING (l_partkey)
        |WHERE cast(l_quantity AS BIGINT) * 5 * cnt < qty_sum""".stripMargin),

    // -- argmin join: per part, the supplier rows achieving the minimum
    //    extended price — agg-min + equality join back (all ties kept), the
    //    scale-safe alternative to a per-group sort/rank; the 1-row-per-part
    //    mins table broadcasts --------------------------------------------
    ("q_argmin_join",
      (s: SparkSession, d: String) => {
        val li = t(s, d, "lineitem").filter(col("l_partkey") < 200)
          .select(col("l_partkey"), col("l_suppkey"), col("l_extendedprice"))
        val mins = li.groupBy(col("l_partkey"))
          .agg(min(col("l_extendedprice")).as("min_price"))
          .withColumnRenamed("l_partkey", "mp")
        li.join(broadcast(mins),
            col("l_partkey") === col("mp") && col("l_extendedprice") === col("min_price"))
          .select(col("l_partkey"), col("l_suppkey"), col("min_price"))
          .orderBy("l_partkey", "l_suppkey")
      },
      """WITH li AS (SELECT l_partkey, l_suppkey, l_extendedprice
        |            FROM lineitem WHERE l_partkey < 200),
        |m AS (SELECT l_partkey AS mp, min(l_extendedprice) AS min_price
        |      FROM li GROUP BY 1)
        |SELECT l_partkey, l_suppkey, min_price
        |FROM li JOIN m ON l_partkey = mp AND l_extendedprice = min_price
        |ORDER BY 1, 2""".stripMargin),

    // -- Q4 analogue (order priority checking): orders in a quarter having
    //    at least one LATE lineitem (shipped > 60 days after order) — the
    //    correlated-EXISTS shape, planned as a left-semi join so the fact
    //    table is probed once, never row-subqueried --------------------------
    ("q_tpch_q4",
      (s: SparkSession, d: String) => {
        val o = t(s, d, "orders")
          .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
            col("o_orderdate") < lit("1997-04-01").cast("timestamp"))
        val li = t(s, d, "lineitem").select(col("l_orderkey"), col("l_shipdate"))
        o.join(li,
            col("l_orderkey") === col("o_orderkey") &&
              col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"),
            "left_semi")
          .groupBy("o_orderpriority")
          .agg(count(lit(1)).as("order_count"))
          .orderBy("o_orderpriority")
      },
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1997-01-01'
        |  AND o_orderdate < TIMESTAMP '1997-04-01'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey
        |                AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
        |GROUP BY 1 ORDER BY 1""".stripMargin),

    // -- Q7 analogue (volume shipping): revenue between a chosen nation
    //    pair, both directions, by ship year — two broadcast copies of the
    //    nation dim under different aliases, disjunctive pair predicate -----
    ("q_tpch_q7",
      (s: SparkSession, d: String) => {
        val n1 = broadcast(t(s, d, "nation")
          .select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation")))
        val n2 = broadcast(t(s, d, "nation")
          .select(col("n_nationkey").as("cn_key"), col("n_name").as("cust_nation")))
        t(s, d, "lineitem")
          .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
            col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
          .join(t(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(t(s, d, "customer")), col("o_custkey") === col("c_custkey"))
          .join(broadcast(t(s, d, "supplier")), col("l_suppkey") === col("s_suppkey"))
          .join(n1, col("s_nationkey") === col("sn_key"))
          .join(n2, col("c_nationkey") === col("cn_key"))
          .filter((col("supp_nation") === "NATION_3" && col("cust_nation") === "NATION_7") ||
            (col("supp_nation") === "NATION_7" && col("cust_nation") === "NATION_3"))
          .groupBy(col("supp_nation"), col("cust_nation"),
            year(col("l_shipdate")).cast("long").as("l_year"))
          .agg(round(revenueSum, 4).as("revenue"))
          .orderBy("supp_nation", "cust_nation", "l_year")
      },
      s"""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         |  year(l_shipdate) AS l_year, round($sqlRevenueSum, 4) AS revenue
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN nation n1 ON s_nationkey = n1.n_nationkey
         |JOIN nation n2 ON c_nationkey = n2.n_nationkey
         |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
         |  AND l_shipdate < TIMESTAMP '1998-01-01'
         |  AND ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
         |    OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
         |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin),

    // -- Q8 analogue (national market share): NATION_3 suppliers' share of
    //    EUROPE-customer revenue per order year — ONE conditional
    //    aggregation computes nation and total revenue together (no second
    //    join pass); the share divides two doubles derived from identical
    //    exact decimal sums, so both engines agree bit-for-bit ------------
    ("q_tpch_q8",
      (s: SparkSession, d: String) => {
        val natRev = sum(when(col("supp_nation") === "NATION_3", centsProd2)
          .otherwise(lit(0L).cast(DecimalType(28, 0))))
          .cast("double") / 10000.0
        t(s, d, "lineitem")
          .join(t(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(t(s, d, "customer")), col("o_custkey") === col("c_custkey"))
          .join(broadcast(t(s, d, "nation")
            .select(col("n_nationkey").as("cn_key"), col("n_regionkey"))),
            col("c_nationkey") === col("cn_key"))
          .join(broadcast(t(s, d, "region")), col("n_regionkey") === col("r_regionkey"))
          .filter(col("r_name") === "EUROPE")
          .join(broadcast(t(s, d, "supplier")), col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(t(s, d, "nation")
            .select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))),
            col("s_nationkey") === col("sn_key"))
          .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
          .agg(round(natRev / revenueSum, 4).as("mkt_share"),
            round(revenueSum, 4).as("total_rev"))
          .orderBy("o_year")
      },
      s"""SELECT year(o_orderdate) AS o_year,
         |  round((cast(sum(CASE WHEN n2.n_name = 'NATION_3'
         |          THEN $sqlCentsProd2
         |          ELSE 0 END) AS DOUBLE) / 10000.0)
         |    / $sqlRevenueSum, 4) AS mkt_share,
         |  round($sqlRevenueSum, 4) AS total_rev
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation n1 ON c_nationkey = n1.n_nationkey
         |JOIN region ON n1.n_regionkey = r_regionkey
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN nation n2 ON s_nationkey = n2.n_nationkey
         |WHERE r_name = 'EUROPE'
         |GROUP BY 1 ORDER BY 1""".stripMargin),

    // -- Q9 analogue (product-line profit by nation and year): derived
    //    amount = revenue − retailprice·quantity, every product cast to
    //    exact decimal BEFORE the subtraction; LIKE filter on p_name pushes
    //    into the broadcast part dim ---------------------------------------
    ("q_tpch_q9",
      (s: SparkSession, d: String) => {
        // both terms on the same 1e4 integer scale: revenue = cents×cents,
        // cost = retail-cents × qty × 100 (quantity is integral)
        val amount = sum(centsProd2 -
          (cents(col("p_retailprice")) * col("l_quantity") * lit(100L))
            .cast(DecimalType(28, 0)))
          .cast("double") / 10000.0
        t(s, d, "lineitem")
          .join(broadcast(t(s, d, "part").filter(col("p_name").like("%red%"))),
            col("l_partkey") === col("p_partkey"))
          .join(t(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(t(s, d, "supplier")), col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(t(s, d, "nation")), col("s_nationkey") === col("n_nationkey"))
          .groupBy(col("n_name").as("nation"),
            year(col("o_orderdate")).cast("long").as("o_year"))
          .agg(round(amount, 4).as("profit"))
          .orderBy(asc("nation"), desc("o_year"))
      },
      s"""SELECT n_name AS nation, year(o_orderdate) AS o_year,
        |  round(cast(sum($sqlCentsProd2
        |               - cast(round(p_retailprice * 100) AS BIGINT) * l_quantity * 100)
        |          AS DOUBLE) / 10000.0, 4) AS profit
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE p_name LIKE '%red%'
        |GROUP BY 1, 2 ORDER BY nation ASC, o_year DESC""".stripMargin),

    // -- Q15 analogue (top supplier): quarterly revenue per supplier, then
    //    the suppliers achieving the global maximum — the scalar-argmax
    //    shape (1-row max broadcast + equality join, ALL ties kept). The
    //    comparison happens on exact decimal sums, never doubles, so the
    //    winning set cannot differ between engines -------------------------
    ("q_tpch_q15",
      (s: SparkSession, d: String) => {
        // exact integer-cents revenue (scale 1e4); the argmax equality
        // compares the exact integers, so the winning set cannot differ
        val revD = sum(centsProd2)
        val rev = t(s, d, "lineitem")
          .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
            col("l_shipdate") < lit("1997-04-01").cast("timestamp"))
          .groupBy(col("l_suppkey")).agg(revD.as("tr"))
        val mx = rev.agg(max(col("tr")).as("mx"))
        rev.crossJoin(broadcast(mx)).filter(col("tr") === col("mx"))
          .join(broadcast(t(s, d, "supplier")), col("l_suppkey") === col("s_suppkey"))
          .select(col("s_suppkey"), col("s_name"),
            round(col("tr").cast("double") / 10000.0, 4).as("total_rev"))
          .orderBy("s_suppkey")
      },
      s"""WITH r AS (
        |  SELECT l_suppkey, sum($sqlCentsProd2) AS tr
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |    AND l_shipdate < TIMESTAMP '1997-04-01'
        |  GROUP BY 1)
        |SELECT s_suppkey, s_name, round(cast(tr AS DOUBLE) / 10000.0, 4) AS total_rev
        |FROM r JOIN supplier ON l_suppkey = s_suppkey
        |WHERE tr = (SELECT max(tr) FROM r)
        |ORDER BY 1""".stripMargin),

    // -- Q13 analogue (customer order-count distribution): LEFT join with a
    //    join-side filter (non-urgent orders only), then a histogram of the
    //    per-customer counts — null-preserving outer join + double agg ------
    ("q_tpch_q13",
      (s: SparkSession, d: String) => {
        val o = t(s, d, "orders")
          .filter(col("o_orderpriority") =!= "1-URGENT")
          .select(col("o_custkey"), col("o_orderkey"))
        val per = t(s, d, "customer")
          .join(o, col("c_custkey") === col("o_custkey"), "left")
          .groupBy("c_custkey")
          .agg(count(col("o_orderkey")).as("c_count"))
        per.groupBy("c_count").agg(count(lit(1)).as("custdist"))
          .orderBy(desc("custdist"), desc("c_count"))
      },
      """SELECT c_count, count(*) AS custdist FROM (
        |  SELECT c_custkey, count(o_orderkey) AS c_count
        |  FROM customer LEFT JOIN orders
        |    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        |  GROUP BY 1)
        |GROUP BY 1 ORDER BY custdist DESC, c_count DESC""".stripMargin),

    // -- Q19 analogue (discounted revenue, OR-of-ANDs): three disjoint
    //    brand/size/quantity bands — the disjunctive-predicate pushdown
    //    test; part is a broadcast dim, the common l_quantity <= 30 bound
    //    is factorable and should reach the lineitem scan ------------------
    ("q_tpch_q19",
      (s: SparkSession, d: String) => {
        val li = t(s, d, "lineitem")
          .join(broadcast(t(s, d, "part")), col("l_partkey") === col("p_partkey"))
          .filter(
            (col("p_brand") === "Brand#12" && col("p_size").between(1, 5) &&
              col("l_quantity").between(1, 11)) ||
            (col("p_brand") === "Brand#23" && col("p_size").between(1, 10) &&
              col("l_quantity").between(10, 20)) ||
            (col("p_brand") === "Brand#34" && col("p_size").between(1, 15) &&
              col("l_quantity").between(20, 30)))
        li.agg(round(revenueSum, 4).as("revenue"),
          count(lit(1)).as("n_items"))
      },
      s"""SELECT round($sqlRevenueSum, 4) AS revenue, count(*) AS n_items
         |FROM lineitem JOIN part ON l_partkey = p_partkey
         |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
         |        AND l_quantity BETWEEN 1 AND 11)
         |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
         |        AND l_quantity BETWEEN 10 AND 20)
         |   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
         |        AND l_quantity BETWEEN 20 AND 30)""".stripMargin),

    // -- Q22 analogue (global sales opportunity): customers with
    //    above-average balance and no URGENT orders, by nation (every
    //    synthetic customer has SOME order, so the classic no-orders form
    //    returns empty — the urgent-filtered NOT IN keeps the same
    //    anti-join shape with a non-trivial result). The average is a
    //    1-row broadcast; the comparison is done in exact decimals as
    //    c_acctbal * n > sum (multiply-through instead of divide) so both
    //    engines agree bit-for-bit at the boundary; anti join for NOT IN ----
    ("q_tpch_q22",
      (s: SparkSession, d: String) => {
        val cust = t(s, d, "customer")
        val tot = cust.filter(col("c_acctbal") > 0.0)
          .agg(sum(col("c_acctbal").cast(DecimalType(18, 6))).as("s"),
            count(col("c_acctbal")).as("n"))
        cust.crossJoin(broadcast(tot))
          // multiply-through in bounded decimals: (18,6) × (12,0) stays
          // inside precision 38 in BOTH engines, so no rounding can differ
          .filter(col("c_acctbal").cast(DecimalType(18, 6)) *
            col("n").cast(DecimalType(12, 0)) > col("s"))
          .join(t(s, d, "orders").filter(col("o_orderpriority") === "1-URGENT")
            .select(col("o_custkey")),
            col("c_custkey") === col("o_custkey"), "left_anti")
          .join(broadcast(t(s, d, "nation")), col("c_nationkey") === col("n_nationkey"))
          .groupBy("n_name")
          .agg(count(lit(1)).as("numcust"), dsum(col("c_acctbal")).as("totacctbal"))
          .orderBy("n_name")
      },
      s"""WITH tot AS (SELECT sum(cast(c_acctbal AS DECIMAL(18,6))) AS s,
         |                    count(c_acctbal) AS n
         |             FROM customer WHERE c_acctbal > 0.0)
         |SELECT n_name, count(*) AS numcust, ${sqlDsum("c_acctbal")} AS totacctbal
         |FROM customer
         |JOIN nation ON c_nationkey = n_nationkey
         |CROSS JOIN tot
         |WHERE cast(c_acctbal AS DECIMAL(18,6)) * cast(n AS DECIMAL(12,0)) > s
         |  AND c_custkey NOT IN (SELECT o_custkey FROM orders
         |                        WHERE o_orderpriority = '1-URGENT')
         |GROUP BY 1 ORDER BY 1""".stripMargin),

    // -- Q2 analogue (minimum-cost supplier): the schema has no partsupp
    //    table, so the part-supplier catalog derives from lineitem —
    //    supplycost := min unit price ever charged by that supplier for
    //    that part (an exact double min over identical values in both
    //    engines, so the correlated-min equality join below is bit-safe).
    //    Shape: region-restricted argmin per part + equality join back,
    //    the scale-safe form of Q2's correlated scalar subquery. The
    //    per-part mins frame is part-bounded; the join stays hint-free so
    //    AQE sizes it from runtime stats -----------------------------------
    ("q_tpch_q2",
      (s: SparkSession, d: String) => {
        // unit price as an exact integer in 1e-4 units: (200·cents + qty)
        // div (2·qty) is half-up rounding of cents·100/qty in pure integer
        // arithmetic — a double ep/qty hit an IEEE 4-dp rounding tie at
        // sf0.001 (26.24125 rendered 26.2412 vs 26.2413 across engines).
        // min, the equality join, and the output all stay integer-exact.
        val ps = t(s, d, "lineitem")
          .withColumn("__epc", cents(col("l_extendedprice")))
          .withColumn("__q", col("l_quantity").cast("long"))
          .groupBy(col("l_partkey"), col("l_suppkey"))
          .agg(min(expr("(__epc * 200 + __q) div (2 * __q)")).as("supplycost"))
        val eurSupp = t(s, d, "supplier")
          .join(broadcast(t(s, d, "nation")), col("s_nationkey") === col("n_nationkey"))
          .join(broadcast(t(s, d, "region").filter(col("r_name") === "EUROPE")),
            col("n_regionkey") === col("r_regionkey"))
          .select(col("s_suppkey"), col("s_name"), col("n_name"))
        val psEur = ps.join(broadcast(eurSupp), col("l_suppkey") === col("s_suppkey"))
        val minCost = psEur.groupBy(col("l_partkey").as("mk"))
          .agg(min(col("supplycost")).as("min_cost"))
        psEur
          .join(broadcast(t(s, d, "part").filter(col("p_size") === 15)),
            col("l_partkey") === col("p_partkey"))
          .join(minCost,
            col("l_partkey") === col("mk") && col("supplycost") === col("min_cost"))
          .select(col("p_partkey"), col("p_brand"), col("s_name"), col("n_name"),
            (col("supplycost").cast("double") / 10000.0).as("cost"))
          .orderBy("p_partkey", "s_name")
      },
      """WITH ps AS (
        |  SELECT l_partkey, l_suppkey,
        |         min((cast(round(l_extendedprice * 100) AS BIGINT) * 200 +
        |              cast(l_quantity AS BIGINT))
        |             // (2 * cast(l_quantity AS BIGINT))) AS supplycost
        |  FROM lineitem GROUP BY 1, 2),
        |pse AS (
        |  SELECT l_partkey, l_suppkey, supplycost, s_name, n_name
        |  FROM ps JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |  WHERE r_name = 'EUROPE'),
        |mc AS (SELECT l_partkey AS mk, min(supplycost) AS min_cost
        |       FROM pse GROUP BY 1)
        |SELECT p_partkey, p_brand, s_name, n_name,
        |  cast(supplycost AS DOUBLE) / 10000.0 AS cost
        |FROM pse JOIN part ON l_partkey = p_partkey
        |JOIN mc ON l_partkey = mk AND supplycost = min_cost
        |WHERE p_size = 15
        |ORDER BY p_partkey, s_name""".stripMargin),

    // -- Q11 analogue (important stock): per-part value restricted to one
    //    region's suppliers, kept where value exceeds 1/1000 of the total —
    //    Q22's global-scalar-threshold shape applied per group. Decimal
    //    sums keep both the per-part values and the 1-row total exact;
    //    multiply-through (v * 1000 > s) instead of dividing the total so
    //    the boundary decision is integer-exact in both engines ------------
    ("q_tpch_q11",
      (s: SparkSession, d: String) => {
        val values = t(s, d, "lineitem")
          .join(broadcast(t(s, d, "supplier")), col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(t(s, d, "nation")), col("s_nationkey") === col("n_nationkey"))
          .join(broadcast(t(s, d, "region").filter(col("r_name") === "ASIA")),
            col("n_regionkey") === col("r_regionkey"))
          .groupBy(col("l_partkey"))
          .agg(sum(col("l_extendedprice").cast(DecimalType(18, 6))).as("v"))
        val tot = values.agg(sum(col("v")).as("s"))
        values.crossJoin(broadcast(tot))
          .filter(col("v") * lit(1000) > col("s"))
          .select(col("l_partkey"),
            round(col("v").cast("double"), 4).as("value"))
          .orderBy(desc("value"), asc("l_partkey"))
      },
      """WITH val AS (
        |  SELECT l_partkey, sum(cast(l_extendedprice AS DECIMAL(18,6))) AS v
        |  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |  WHERE r_name = 'ASIA' GROUP BY 1),
        |tot AS (SELECT sum(v) AS s FROM val)
        |SELECT l_partkey, round(cast(v AS DOUBLE), 4) AS value
        |FROM val CROSS JOIN tot
        |WHERE v * 1000 > s
        |ORDER BY value DESC, l_partkey ASC""".stripMargin),

    // -- Q16 analogue (parts/supplier relationship): distinct supplier
    //    count per part attribute triple, excluding one brand, one type
    //    family, and "complaint" suppliers (negative balance stands in for
    //    the comment scan) — distinct pairs from lineitem stand in for
    //    partsupp; the exclusion list is an anti join; part is a broadcast
    //    dim --------------------------------------------------------------
    ("q_tpch_q16",
      (s: SparkSession, d: String) => {
        val ps = t(s, d, "lineitem").select(col("l_partkey"), col("l_suppkey")).distinct()
        val bad = t(s, d, "supplier").filter(col("s_acctbal") < 0.0)
          .select(col("s_suppkey"))
        ps.join(broadcast(bad), col("l_suppkey") === col("s_suppkey"), "left_anti")
          .join(broadcast(t(s, d, "part")
            .filter(col("p_brand") =!= "Brand#45" && col("p_type") =!= "PROMO" &&
              col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45))),
            col("l_partkey") === col("p_partkey"))
          .groupBy(col("p_brand"), col("p_type"), col("p_size"))
          .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
          .orderBy(desc("supplier_cnt"), asc("p_brand"), asc("p_type"), asc("p_size"))
      },
      """WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
        |SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
        |FROM ps JOIN part ON l_partkey = p_partkey
        |WHERE p_brand <> 'Brand#45' AND p_type <> 'PROMO'
        |  AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
        |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |GROUP BY 1, 2, 3
        |ORDER BY supplier_cnt DESC, 1, 2, 3""".stripMargin),

    // -- Q20 analogue (potential part promotion): suppliers in one nation
    //    who shipped more than half their all-time quantity of some red
    //    part during 1997 — availqty derives from lineitem totals (no
    //    partsupp), the threshold is decimal multiply-through
    //    (2 * qty97 > availqty), and the qualifying-supplier set feeds a
    //    hint-free semi join so AQE sizes it at runtime --------------------
    ("q_tpch_q20",
      (s: SparkSession, d: String) => {
        val li = t(s, d, "lineitem")
        // ONE aggregation computes both the all-time and the 1997 sums as a
        // conditional pair — the ps ⋈ sh two-shuffle + join form scanned
        // lineitem twice for the same grouping (round-9 rewrite: 2.3 → ~1 s
        // local). qty97 > 0 reproduces the inner join's "shipped in 1997"
        // membership (quantities are ≥ 1, so the conditional sum is positive
        // iff any 1997 row exists). Quantity is integral → exact long sums,
        // no per-row decimal casts; the threshold compare is scale-free.
        val y97 = col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1998-01-01").cast("timestamp")
        val both = li.groupBy(col("l_partkey"), col("l_suppkey"))
          .agg(sum(col("l_quantity").cast("long")).as("availqty"),
            sum(when(y97, col("l_quantity")).otherwise(lit(0)).cast("long"))
              .as("qty97"))
          .filter(col("qty97") > 0)
        val qual = both
          .join(broadcast(t(s, d, "part").filter(col("p_name").like("red%"))
            .select(col("p_partkey"))),
            col("l_partkey") === col("p_partkey"))
          .filter(col("qty97") * lit(2) > col("availqty"))
          .select(col("l_suppkey"))
        t(s, d, "supplier")
          .join(broadcast(t(s, d, "nation").filter(col("n_name") === "NATION_5")),
            col("s_nationkey") === col("n_nationkey"))
          .join(qual, col("s_suppkey") === col("l_suppkey"), "left_semi")
          .select(col("s_name"), col("s_acctbal"))
          .orderBy("s_name")
      },
      """WITH ps AS (
        |  SELECT l_partkey, l_suppkey, sum(cast(l_quantity AS DECIMAL(18,6))) AS availqty
        |  FROM lineitem GROUP BY 1, 2),
        |sh AS (
        |  SELECT l_partkey, l_suppkey, sum(cast(l_quantity AS DECIMAL(18,6))) AS qty97
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |    AND l_shipdate < TIMESTAMP '1998-01-01'
        |  GROUP BY 1, 2)
        |SELECT s_name, s_acctbal
        |FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |WHERE n_name = 'NATION_5' AND s_suppkey IN (
        |  SELECT ps.l_suppkey FROM ps JOIN sh USING (l_partkey, l_suppkey)
        |  JOIN part ON ps.l_partkey = p_partkey
        |  WHERE p_name LIKE 'red%' AND qty97 * 2 > availqty)
        |ORDER BY s_name""".stripMargin),

    // -- Q21 analogue (suppliers who kept orders waiting): on finished
    //    multi-supplier orders, the supplier whose lineitem was the ONLY
    //    late one (late := shipped > 120 days after order, the schema's
    //    stand-in for receipt > commit) — the EXISTS/NOT-EXISTS pair plans
    //    as a semi join + anti join over aliased lineitem scans, never a
    //    per-row subquery; supplier is a broadcast dim; no nation filter
    //    (100 synthetic suppliers — top-25 keeps the result sized like the
    //    classic per-nation form) ------------------------------------------
    ("q_tpch_q21",
      (s: SparkSession, d: String) => {
        val late = expr("INTERVAL 120 DAYS")
        // one late-lineitems subplan feeds BOTH the probe side (status-F
        // filter on top) and the NOT-EXISTS side — identical scans/joins so
        // the exchange is computed once and reused
        val lateAll = t(s, d, "lineitem")
          .join(t(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
          .filter(col("l_shipdate") > col("o_orderdate") + late)
          .select(col("l_orderkey"), col("l_suppkey"), col("o_orderstatus"))
        val l1 = lateAll.filter(col("o_orderstatus") === "F")
          .select(col("l_orderkey").as("o1"), col("l_suppkey").as("s1"))
        val l2 = t(s, d, "lineitem")
          .select(col("l_orderkey").as("o2"), col("l_suppkey").as("s2"))
        val l3 = lateAll
          .select(col("l_orderkey").as("o3"), col("l_suppkey").as("s3"))
        l1.join(l2, col("o1") === col("o2") && col("s1") =!= col("s2"), "left_semi")
          .join(l3, col("o1") === col("o3") && col("s1") =!= col("s3"), "left_anti")
          .join(broadcast(t(s, d, "supplier")), col("s1") === col("s_suppkey"))
          .groupBy(col("s_name"))
          .agg(count(lit(1)).as("numwait"))
          .orderBy(desc("numwait"), asc("s_name"))
          .limit(25)
      },
      """WITH l1 AS (
        |  SELECT l_orderkey, l_suppkey
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  WHERE o_orderstatus = 'F'
        |    AND l_shipdate > o_orderdate + INTERVAL 120 DAY)
        |SELECT s_name, count(*) AS numwait
        |FROM l1 JOIN supplier ON l1.l_suppkey = s_suppkey
        |WHERE EXISTS (SELECT 1 FROM lineitem l2
        |              WHERE l2.l_orderkey = l1.l_orderkey
        |                AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |                  JOIN orders o3 ON l3.l_orderkey = o3.o_orderkey
        |                  WHERE l3.l_orderkey = l1.l_orderkey
        |                    AND l3.l_suppkey <> l1.l_suppkey
        |                    AND l3.l_shipdate > o3.o_orderdate + INTERVAL 120 DAY)
        |GROUP BY 1
        |ORDER BY numwait DESC, s_name ASC
        |LIMIT 25""".stripMargin)
  )
}
