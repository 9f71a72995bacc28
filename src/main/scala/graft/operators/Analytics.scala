package graft.operators

import graft.Q
import graft.functions.Nums._
import graft.functions.Text.{sqlToks, toks}
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** OLAP analytics suite — the Superset-dashboard surface of the reference
  * (trend charts, top-N rankings, distributions; see
  * /root/reference/superset/, README.md:64-71) re-expressed as Spark
  * DataFrame plans over the star-ish testdata schema.
  *
  * All queries: single shuffle per aggregation (map-side partial agg is
  * automatic), dims broadcast, total ORDER BY for oracle hash parity.
  */
object Analytics {

  /** TPC-H Q1-shaped pricing summary: wide-row scan -> grouped decimal
    * aggregation. The scan only reads the 7 referenced columns.
    */
  def q1(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      // compare the raw NTZ column to a foldable literal (values are
      // midnight-dated) so the predicate pushes down to the parquet scan;
      // a cast-to-date on the column would block pushdown.
      .filter(col("l_shipdate") <= lit("1998-09-02 00:00:00").cast("timestamp_ntz"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(decp(col("l_quantity"))).as("sum_qty"),
        dsum(decp(col("l_extendedprice"))).as("sum_base_price"),
        dsum(decp(col("l_extendedprice")) * decf(lit(1.0) - col("l_discount")))
          .as("sum_disc_price"),
        dsum(decp(col("l_extendedprice")) * decf(lit(1.0) - col("l_discount"))
          * decf(lit(1.0) + col("l_tax"))).as("sum_charge"),
        davg(decp(col("l_quantity"))).as("avg_qty"),
        davg(decp(col("l_extendedprice"))).as("avg_price"),
        davg(decf(col("l_discount"))).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  val q1Sql: String = {
    val disc = s"${sqlDecp("l_extendedprice")} * ${sqlDecf("1.0 - l_discount")}"
    // DuckDB 1.0 multiplies (22,10)x(8,6) in int64 and overflows; the
    // widen-cast to DECIMAL(30,10) is lossless (same scale) and forces
    // int128 — the mathematical value is unchanged, so the final
    // CAST(...AS DOUBLE) still matches Spark's exact DECIMAL(32,16) sum.
    val discWide = s"CAST($disc AS DECIMAL(30,10))"
    s"""SELECT l_returnflag, l_linestatus,
       ${sqlDsum(sqlDecp("l_quantity"))} AS sum_qty,
       ${sqlDsum(sqlDecp("l_extendedprice"))} AS sum_base_price,
       ${sqlDsum(disc)} AS sum_disc_price,
       ${sqlDsum(s"$discWide * ${sqlDecf("1.0 + l_tax")}")} AS sum_charge,
       ${sqlDavg(sqlDecp("l_quantity"))} AS avg_qty,
       ${sqlDavg(sqlDecp("l_extendedprice"))} AS avg_price,
       ${sqlDavg(sqlDecf("l_discount"))} AS avg_disc,
       COUNT(*) AS count_order
       FROM lineitem
       WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
       GROUP BY l_returnflag, l_linestatus
       ORDER BY l_returnflag, l_linestatus"""
  }

  /** TPC-H Q3-shaped: segment filter -> 3-way join -> agg -> top-10.
    * customer is the small side (broadcast); orders/lineitem equi-join
    * shuffles once on the order key.
    */
  def q3(s: SparkSession, dir: String): DataFrame = {
    val cut = lit("1998-01-01 00:00:00").cast("timestamp_ntz")
    val c = Tables.customer(s, dir)
      .filter(col("c_mktsegment") === "BUILDING")
      .select("c_custkey")
    val o = Tables.orders(s, dir)
      .filter(col("o_orderdate") < cut)
      .select(col("o_orderkey"), col("o_custkey"),
        col("o_orderdate").cast("date").as("o_orderdate"))
    val l = Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= cut)
      .select(col("l_orderkey"),
        (decp(col("l_extendedprice")) * decf(lit(1.0) - col("l_discount")))
          .as("part_rev"))
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"))
      .agg(dsum(col("part_rev")).as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  val q3Sql: String =
    s"""SELECT l_orderkey, CAST(o_orderdate AS DATE) AS o_orderdate,
       ${sqlDsum(s"${sqlDecp("l_extendedprice")} * ${sqlDecf("1.0 - l_discount")}")} AS revenue
       FROM customer, orders, lineitem
       WHERE c_mktsegment = 'BUILDING'
         AND c_custkey = o_custkey AND l_orderkey = o_orderkey
         AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
         AND l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
       GROUP BY l_orderkey, CAST(o_orderdate AS DATE)
       ORDER BY revenue DESC, l_orderkey
       LIMIT 10"""

  /** TPC-H Q5-shaped snowflake: lineitem x orders shuffle join; customer,
    * supplier, nation, region all broadcast. The c_nationkey =
    * s_nationkey correlation rides on the broadcast side.
    */
  def q5(s: SparkSession, dir: String): DataFrame = {
    val r = Tables.region(s, dir).filter(col("r_name") === "ASIA")
    val n = Tables.nation(s, dir)
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .select("n_nationkey", "n_name")
    val sup = Tables.supplier(s, dir).select("s_suppkey", "s_nationkey")
    val c = Tables.customer(s, dir).select("c_custkey", "c_nationkey")
    val o = Tables.orders(s, dir)
      .filter(col("o_orderdate").between(
        lit("1996-01-01 00:00:00").cast("timestamp_ntz"),
        lit("1997-12-31 00:00:00").cast("timestamp_ntz")))
      .select("o_orderkey", "o_custkey")
    val l = Tables.lineitem(s, dir)
      .select(col("l_orderkey"), col("l_suppkey"),
        (decp(col("l_extendedprice")) * decf(lit(1.0) - col("l_discount")))
          .as("part_rev"))
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .join(broadcast(sup),
        l("l_suppkey") === sup("s_suppkey") &&
          c("c_nationkey") === sup("s_nationkey"))
      .join(broadcast(n), sup("s_nationkey") === n("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(dsum(col("part_rev")).as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  val q5Sql: String =
    s"""SELECT n_name,
       ${sqlDsum(s"${sqlDecp("l_extendedprice")} * ${sqlDecf("1.0 - l_discount")}")} AS revenue
       FROM customer, orders, lineitem, supplier, nation, region
       WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
         AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
         AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
         AND r_name = 'ASIA'
         AND o_orderdate BETWEEN TIMESTAMP '1996-01-01 00:00:00' AND TIMESTAMP '1997-12-31 00:00:00'
       GROUP BY n_name
       ORDER BY revenue DESC, n_name"""

  /** TPC-H Q7-shaped volume shipping: bilateral trade between two
    * nations by ship year. Supplier/customer sides resolve through TWO
    * broadcast copies of the nation dim; the pair filter rides the
    * broadcast joins, so the only shuffle is lineitem x orders on the
    * order key. The ship-year column is integer both sides (DuckDB
    * year() widens to BIGINT — cast pinned in the oracle). (round 4)
    */
  def q7(s: SparkSession, dir: String): DataFrame = {
    val (na, nb) = ("NATION_1", "NATION_2")
    val lo = lit("1996-01-01 00:00:00").cast("timestamp_ntz")
    val hi = lit("1997-12-31 00:00:00").cast("timestamp_ntz")
    val n1 = Tables.nation(s, dir)
      .select(col("n_nationkey").as("n1_key"), col("n_name").as("supp_nation"))
      .filter(col("supp_nation").isin(na, nb))
    val n2 = Tables.nation(s, dir)
      .select(col("n_nationkey").as("n2_key"), col("n_name").as("cust_nation"))
      .filter(col("cust_nation").isin(na, nb))
    val sup = Tables.supplier(s, dir).select("s_suppkey", "s_nationkey")
    val c = Tables.customer(s, dir).select("c_custkey", "c_nationkey")
    val o = Tables.orders(s, dir).select("o_orderkey", "o_custkey")
    val l = Tables.lineitem(s, dir)
      .filter(col("l_shipdate").between(lo, hi))
      .select(col("l_orderkey"), col("l_suppkey"),
        year(col("l_shipdate")).as("l_year"),
        (decp(col("l_extendedprice")) * decf(lit(1.0) - col("l_discount")))
          .as("vol"))
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(broadcast(sup), l("l_suppkey") === sup("s_suppkey"))
      .join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .join(broadcast(n1), col("s_nationkey") === col("n1_key"))
      .join(broadcast(n2), col("c_nationkey") === col("n2_key"))
      .filter(col("supp_nation") =!= col("cust_nation"))
      .groupBy(col("supp_nation"), col("cust_nation"), col("l_year"))
      .agg(dsum(col("vol")).as("revenue"))
      .orderBy("supp_nation", "cust_nation", "l_year")
  }

  val q7Sql: String =
    s"""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
              CAST(year(l_shipdate) AS INT) AS l_year,
              ${sqlDsum(s"${sqlDecp("l_extendedprice")} * ${sqlDecf("1.0 - l_discount")}")} AS revenue
       FROM supplier, lineitem, orders, customer, nation n1, nation n2
       WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
         AND c_custkey = o_custkey
         AND s_nationkey = n1.n_nationkey AND c_nationkey = n2.n_nationkey
         AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
           OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
         AND l_shipdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
                            AND TIMESTAMP '1997-12-31 00:00:00'
       GROUP BY 1, 2, 3 ORDER BY 1, 2, 3"""

  /** TPC-H Q10-shaped returned-item reporting: top-20 customers by
    * revenue lost to returns in a quarter. The returnflag + date
    * filters push to the scans; customer/nation broadcast; revenue
    * ordering is portable because the decimal sum casts
    * correctly-rounded (ties broken by key). (round 4)
    */
  def q10(s: SparkSession, dir: String): DataFrame = {
    val lo = lit("1996-01-01 00:00:00").cast("timestamp_ntz")
    val hi = lit("1996-04-01 00:00:00").cast("timestamp_ntz")
    val o = Tables.orders(s, dir)
      .filter(col("o_orderdate") >= lo && col("o_orderdate") < hi)
      .select("o_orderkey", "o_custkey")
    val l = Tables.lineitem(s, dir)
      .filter(col("l_returnflag") === "R")
      .select(col("l_orderkey"),
        (decp(col("l_extendedprice")) * decf(lit(1.0) - col("l_discount")))
          .as("part_rev"))
    val c = Tables.customer(s, dir)
      .join(broadcast(Tables.nation(s, dir)),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"),
        col("n_name"))
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .groupBy(col("c_custkey"), col("c_name"),
        decp(col("c_acctbal")).cast("double").as("c_acctbal"),
        col("n_name"))
      .agg(dsum(col("part_rev")).as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)
  }

  val q10Sql: String =
    s"""SELECT c_custkey, c_name,
              CAST(CAST(${sqlDecp("c_acctbal")} AS VARCHAR) AS DOUBLE)
                AS c_acctbal,
              n_name,
              ${sqlDsum(s"${sqlDecp("l_extendedprice")} * ${sqlDecf("1.0 - l_discount")}")} AS revenue
       FROM customer, orders, lineitem, nation
       WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
         AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
         AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
         AND l_returnflag = 'R' AND c_nationkey = n_nationkey
       GROUP BY 1, 2, 3, 4
       ORDER BY revenue DESC, c_custkey
       LIMIT 20"""

  /** TPC-H Q14-shaped promo-revenue trend: per ship month, the share
    * of revenue from PROMO-type parts. Part dim broadcasts on the
    * part-key join; both sums stay exact DECIMAL (the conditional one
    * null-skips identically in both engines), and the share is one
    * double division — bit-portable end to end. (round 4)
    */
  def q14(s: SparkSession, dir: String): DataFrame = {
    val p = Tables.part(s, dir).select(col("p_partkey"), col("p_type"))
    val l = Tables.lineitem(s, dir)
      .select(col("l_partkey"),
        date_trunc("month", col("l_shipdate")).cast("date").as("month"),
        (decp(col("l_extendedprice")) * decf(lit(1.0) - col("l_discount")))
          .as("vol"))
    l.join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .groupBy(col("month"))
      .agg(
        coalesce(sum(when(col("p_type") === "PROMO", col("vol"))),
          lit(0)).cast("double").as("promo_rev"),
        dsum(col("vol")).as("total_rev"))
      .withColumn("promo_share",
        col("promo_rev") / col("total_rev"))
      .orderBy("month")
  }

  val q14Sql: String =
    s"""WITH j AS (SELECT date_trunc('month', l_shipdate)::DATE AS month,
               p_type,
               ${sqlDecp("l_extendedprice")} * ${sqlDecf("1.0 - l_discount")}
                 AS vol
             FROM lineitem JOIN part ON l_partkey = p_partkey)
       SELECT month,
              CAST(CAST(COALESCE(SUM(CASE WHEN p_type = 'PROMO' THEN vol END),
                0) AS VARCHAR) AS DOUBLE) AS promo_rev,
              ${sqlDsum("vol")} AS total_rev,
              CAST(CAST(COALESCE(SUM(CASE WHEN p_type = 'PROMO' THEN vol END),
                  0) AS VARCHAR) AS DOUBLE)
                / ${sqlDsum("vol")} AS promo_share
       FROM j GROUP BY month ORDER BY month"""

  /** TPC-H Q19-shaped bracketed discount revenue: an OR-of-ANDs
    * predicate spanning both join sides (brand x size x quantity
    * brackets). The part dim broadcasts; the composite predicate
    * evaluates inside the join's codegen stage — the shape that
    * exercises complex-predicate planning rather than a new shuffle.
    * (round 4)
    */
  def q19(s: SparkSession, dir: String): DataFrame = {
    val p = Tables.part(s, dir)
      .select(col("p_partkey"), col("p_brand"), col("p_size"))
    val l = Tables.lineitem(s, dir)
      .select(col("l_partkey"), col("l_quantity"),
        (decp(col("l_extendedprice")) * decf(lit(1.0) - col("l_discount")))
          .as("vol"))
    val brackets =
      (col("p_brand") === "Brand#11" && col("p_size").between(1, 10) &&
        col("l_quantity").between(1, 15)) ||
        (col("p_brand") === "Brand#22" && col("p_size").between(1, 20) &&
          col("l_quantity").between(10, 30)) ||
        (col("p_brand") === "Brand#15" && col("p_size").between(1, 30) &&
          col("l_quantity").between(20, 50))
    l.join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .filter(brackets)
      .agg(dsum(col("vol")).as("revenue"),
        count(lit(1)).as("n_items"))
  }

  val q19Sql: String =
    s"""SELECT
       ${sqlDsum(s"${sqlDecp("l_extendedprice")} * ${sqlDecf("1.0 - l_discount")}")} AS revenue,
              CAST(COUNT(*) AS BIGINT) AS n_items
       FROM lineitem JOIN part ON l_partkey = p_partkey
       WHERE (p_brand = 'Brand#11' AND p_size BETWEEN 1 AND 10
               AND l_quantity BETWEEN 1 AND 15)
          OR (p_brand = 'Brand#22' AND p_size BETWEEN 1 AND 20
               AND l_quantity BETWEEN 10 AND 30)
          OR (p_brand = 'Brand#15' AND p_size BETWEEN 1 AND 30
               AND l_quantity BETWEEN 20 AND 50)"""

  /** TPC-H Q17 shape — the correlated-SCALAR-SUBQUERY class (§2E's one
    * missing classic): revenue from lineitems whose quantity is below
    * 20% of their part's average quantity, per brand. Written as
    * literal subquery SQL so CATALYST'S DECORRELATION does the
    * planning: RewriteCorrelatedScalarSubquery turns the per-row
    * subplan into ONE per-part aggregate joined back to the probe —
    * the plan a hand-written groupBy+join would give, but derived from
    * the declarative form (PlanQualitySpec pins that no subquery
    * survives into the physical plan and that lineitem is aggregated
    * for the threshold exactly once). At 100 TB that is the only
    * viable shape: a surviving per-row subplan would rescan lineitem
    * per probe row.
    *
    * Parity: the subquery returns the per-part mean as
    * exact-BIGINT-sum cast to double over a double count — two
    * correctly-rounded casts and ONE IEEE division, so the scalar is
    * bit-identical across engines (engine AVG() would accumulate
    * doubles order-dependently). The 20% threshold multiplies the
    * OUTER side by 5.0 — exact for the integral quantities — instead
    * of comparing against the inexact literal 0.2. (round 5)
    */
  def q17Correlated(s: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(s, dir).createOrReplaceTempView("graft_q17_lineitem")
    Tables.part(s, dir).createOrReplaceTempView("graft_q17_part")
    s.sql("""
      SELECT p.p_brand,
             CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(14,4))) AS DOUBLE)
               / 7.0 AS avg_yearly,
             CAST(COUNT(*) AS BIGINT) AS n_items
      FROM graft_q17_lineitem l
      JOIN graft_q17_part p ON p.p_partkey = l.l_partkey
      WHERE CAST(l.l_quantity AS DOUBLE) * 5.0 <
            (SELECT CAST(SUM(CAST(l2.l_quantity AS BIGINT)) AS DOUBLE)
                    / CAST(COUNT(*) AS DOUBLE)
             FROM graft_q17_lineitem l2
             WHERE l2.l_partkey = l.l_partkey)
      GROUP BY p.p_brand
      ORDER BY p.p_brand""")
  }

  val q17CorrelatedSql: String =
    s"""SELECT p.p_brand,
              CAST(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(14,4))) AS VARCHAR) AS DOUBLE)
                / 7.0 AS avg_yearly,
              CAST(COUNT(*) AS BIGINT) AS n_items
       FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
       WHERE CAST(l.l_quantity AS DOUBLE) * 5.0 <
             (SELECT CAST(CAST(SUM(CAST(l2.l_quantity AS BIGINT)) AS BIGINT) AS DOUBLE)
                     / CAST(COUNT(*) AS DOUBLE)
              FROM lineitem l2
              WHERE l2.l_partkey = l.l_partkey)
       GROUP BY p.p_brand
       ORDER BY p.p_brand"""

  /** TPC-H Q21 shape — the correlated-EXISTS class, the other classic
    * subquery family next to [[q17Correlated]]'s scalar: suppliers
    * whose returned item sits in a multi-supplier order where no OTHER
    * supplier returned anything (the at-fault-supplier analytic,
    * re-keyed to this schema's returnflag). Written as literal
    * EXISTS / NOT EXISTS SQL so Catalyst's RewritePredicateSubquery
    * plans the semi/anti joins — at 100 TB a surviving per-row
    * existence probe would rescan lineitem per row; the decorrelated
    * form is two equi-joins on l_orderkey that AQE can split.
    * All-integer output (counts + keys), so parity is arithmetic-free.
    * (round 5)
    */
  def q21WaitingSupplier(s: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(s, dir).createOrReplaceTempView("graft_q21_lineitem")
    s.sql("""
      SELECT l1.l_suppkey, CAST(COUNT(*) AS BIGINT) AS numwait
      FROM graft_q21_lineitem l1
      WHERE l1.l_returnflag = 'R'
        AND EXISTS (SELECT 1 FROM graft_q21_lineitem l2
                    WHERE l2.l_orderkey = l1.l_orderkey
                      AND l2.l_suppkey <> l1.l_suppkey)
        AND NOT EXISTS (SELECT 1 FROM graft_q21_lineitem l3
                        WHERE l3.l_orderkey = l1.l_orderkey
                          AND l3.l_suppkey <> l1.l_suppkey
                          AND l3.l_returnflag = 'R')
      GROUP BY l1.l_suppkey
      ORDER BY numwait DESC, l1.l_suppkey
      LIMIT 20""")
  }

  val q21WaitingSupplierSql: String =
    s"""SELECT l1.l_suppkey, CAST(COUNT(*) AS BIGINT) AS numwait
       FROM lineitem l1
       WHERE l1.l_returnflag = 'R'
         AND EXISTS (SELECT 1 FROM lineitem l2
                     WHERE l2.l_orderkey = l1.l_orderkey
                       AND l2.l_suppkey <> l1.l_suppkey)
         AND NOT EXISTS (SELECT 1 FROM lineitem l3
                         WHERE l3.l_orderkey = l1.l_orderkey
                           AND l3.l_suppkey <> l1.l_suppkey
                           AND l3.l_returnflag = 'R')
       GROUP BY l1.l_suppkey
       ORDER BY numwait DESC, l1.l_suppkey
       LIMIT 20"""

  /** TPC-H Q4 shape — the uncorrelated-output EXISTS class in its
    * simplest form: order counts per priority, restricted to orders
    * with at least one returned lineitem in a one-year window (the
    * reference's returnflag standing in for Q4's commit/receipt lag,
    * which this schema lacks). RewritePredicateSubquery turns the
    * probe into ONE LeftSemi equi-join on l_orderkey — the lineitem
    * side pre-filters to 'R' rows before the join, so at 100 TB the
    * semi join ships only the (orderkey) keys of returned items, never
    * bodies, and the date filter pushes to the orders scan.
    * All-integer output. (round 5)
    */
  def q4PriorityReturns(s: SparkSession, dir: String): DataFrame = {
    Tables.orders(s, dir).createOrReplaceTempView("graft_q4_orders")
    Tables.lineitem(s, dir).createOrReplaceTempView("graft_q4_lineitem")
    s.sql("""
      SELECT o.o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
      FROM graft_q4_orders o
      WHERE o.o_orderdate >= TIMESTAMP_NTZ '1996-01-01 00:00:00'
        AND o.o_orderdate < TIMESTAMP_NTZ '1997-01-01 00:00:00'
        AND EXISTS (SELECT 1 FROM graft_q4_lineitem l
                    WHERE l.l_orderkey = o.o_orderkey
                      AND l.l_returnflag = 'R')
      GROUP BY o.o_orderpriority
      ORDER BY o.o_orderpriority""")
  }

  val q4PriorityReturnsSql: String =
    s"""SELECT o.o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
       FROM orders o
       WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
         AND o.o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
         AND EXISTS (SELECT 1 FROM lineitem l
                     WHERE l.l_orderkey = o.o_orderkey
                       AND l.l_returnflag = 'R')
       GROUP BY o.o_orderpriority
       ORDER BY o.o_orderpriority"""

  /** TPC-H Q13 shape — the FILTERED-OUTER-JOIN + distribution class:
    * how many customers placed exactly k open orders (join predicate
    * `o_orderstatus <> 'F'` lives IN the outer join's ON clause, not a
    * WHERE — pushing it to WHERE would silently turn the outer join
    * inner and drop the zero-order customers the histogram exists to
    * count). Two-level aggregation: per-customer COUNT(o_orderkey)
    * (null-skipping, so unmatched customers count 0), then the
    * count-of-counts. At 100 TB the first agg shuffles on c_custkey
    * (orders co-partition with it after the join shuffle) and the
    * second runs over a |distinct-k|-sized frame — trivially small.
    * All-integer output. (round 5)
    */
  def q13OrderDistribution(s: SparkSession, dir: String): DataFrame = {
    Tables.customer(s, dir).createOrReplaceTempView("graft_q13_customer")
    Tables.orders(s, dir).createOrReplaceTempView("graft_q13_orders")
    s.sql("""
      SELECT order_cnt, CAST(COUNT(*) AS BIGINT) AS custdist
      FROM (SELECT c.c_custkey,
                   CAST(COUNT(o.o_orderkey) AS BIGINT) AS order_cnt
            FROM graft_q13_customer c
            LEFT OUTER JOIN graft_q13_orders o
              ON c.c_custkey = o.o_custkey AND o.o_orderstatus <> 'F'
            GROUP BY c.c_custkey) t
      GROUP BY order_cnt
      ORDER BY custdist DESC, order_cnt DESC""")
  }

  val q13OrderDistributionSql: String =
    s"""SELECT order_cnt, CAST(COUNT(*) AS BIGINT) AS custdist
       FROM (SELECT c.c_custkey,
                    CAST(COUNT(o.o_orderkey) AS BIGINT) AS order_cnt
             FROM customer c
             LEFT OUTER JOIN orders o
               ON c.c_custkey = o.o_custkey AND o.o_orderstatus <> 'F'
             GROUP BY c.c_custkey) t
       GROUP BY order_cnt
       ORDER BY custdist DESC, order_cnt DESC"""

  /** TPC-H Q18 shape — the IN-over-grouped-HAVING class: large-volume
    * orders (total quantity > 250) with their customer. The IN
    * subquery aggregates lineitem per order FIRST, keeps the few keys
    * over threshold, and RewritePredicateSubquery joins that key set
    * back LeftSemi — at 100 TB the semi probe side is the
    * HAVING-filtered key list (tiny, broadcastable by AQE), so the
    * big three-way join only ever sees qualifying orders. Quantities
    * are integral doubles (TESTDATA.md), so the sums are exact BIGINTs
    * and parity is arithmetic-free. (round 5)
    */
  def q18LargeOrders(s: SparkSession, dir: String): DataFrame = {
    Tables.customer(s, dir).createOrReplaceTempView("graft_q18_customer")
    Tables.orders(s, dir).createOrReplaceTempView("graft_q18_orders")
    Tables.lineitem(s, dir).createOrReplaceTempView("graft_q18_lineitem")
    s.sql("""
      SELECT c.c_name, o.o_orderkey,
             CAST(SUM(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS total_qty
      FROM graft_q18_customer c
      JOIN graft_q18_orders o ON c.c_custkey = o.o_custkey
      JOIN graft_q18_lineitem l ON o.o_orderkey = l.l_orderkey
      WHERE o.o_orderkey IN (SELECT l_orderkey FROM graft_q18_lineitem
                             GROUP BY l_orderkey
                             HAVING SUM(CAST(l_quantity AS BIGINT)) > 250)
      GROUP BY c.c_name, o.o_orderkey
      ORDER BY total_qty DESC, o.o_orderkey
      LIMIT 100""")
  }

  val q18LargeOrdersSql: String =
    s"""SELECT c.c_name, o.o_orderkey,
              CAST(SUM(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS total_qty
       FROM customer c
       JOIN orders o ON c.c_custkey = o.o_custkey
       JOIN lineitem l ON o.o_orderkey = l.l_orderkey
       WHERE o.o_orderkey IN (SELECT l_orderkey FROM lineitem
                              GROUP BY l_orderkey
                              HAVING SUM(CAST(l_quantity AS BIGINT)) > 250)
       GROUP BY c.c_name, o.o_orderkey
       ORDER BY total_qty DESC, o.o_orderkey
       LIMIT 100"""

  /** TPC-H Q22 shape — uncorrelated SCALAR subquery + correlated
    * NOT EXISTS in one query: dormant high-balance customers (balance
    * above the positive-balance average, no order since 2000) per
    * market segment. The classic form's "customers with no orders at
    * all" is empty in this data (every customer ordered — checked at
    * both sf), so the anti-join carries a date predicate instead; the
    * plan classes are identical. Catalyst evaluates the average ONCE
    * as a scalar subquery (never per row) and turns the NOT EXISTS
    * into a LeftAnti equi-join on custkey whose right side pre-filters
    * to recent orders. Scalar parity per §5: exact DECIMAL(14,4) sum
    * -> correctly-rounded double, one IEEE division by the double
    * count — bit-identical across engines; totacctbal the same dsum
    * discipline. (round 5)
    */
  def q22DormantBalance(s: SparkSession, dir: String): DataFrame = {
    Tables.customer(s, dir).createOrReplaceTempView("graft_q22_customer")
    Tables.orders(s, dir).createOrReplaceTempView("graft_q22_orders")
    s.sql("""
      SELECT c.c_mktsegment, CAST(COUNT(*) AS BIGINT) AS numcust,
             CAST(SUM(CAST(c.c_acctbal AS DECIMAL(14,4))) AS DOUBLE)
               AS totacctbal
      FROM graft_q22_customer c
      WHERE c.c_acctbal >
            (SELECT CAST(SUM(CAST(c2.c_acctbal AS DECIMAL(14,4))) AS DOUBLE)
                    / CAST(COUNT(*) AS DOUBLE)
             FROM graft_q22_customer c2 WHERE c2.c_acctbal > 0.0)
        AND NOT EXISTS (SELECT 1 FROM graft_q22_orders o
                        WHERE o.o_custkey = c.c_custkey
                          AND o.o_orderdate >= TIMESTAMP_NTZ '2000-01-01 00:00:00')
      GROUP BY c.c_mktsegment
      ORDER BY c.c_mktsegment""")
  }

  val q22DormantBalanceSql: String =
    s"""SELECT c.c_mktsegment, CAST(COUNT(*) AS BIGINT) AS numcust,
              ${sqlDsum(sqlDecp("c.c_acctbal"))} AS totacctbal
       FROM customer c
       WHERE c.c_acctbal >
             (SELECT CAST(CAST(SUM(CAST(c2.c_acctbal AS DECIMAL(14,4))) AS VARCHAR) AS DOUBLE)
                     / CAST(COUNT(*) AS DOUBLE)
              FROM customer c2 WHERE c2.c_acctbal > 0.0)
         AND NOT EXISTS (SELECT 1 FROM orders o
                         WHERE o.o_custkey = c.c_custkey
                           AND o.o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
       GROUP BY c.c_mktsegment
       ORDER BY c.c_mktsegment"""

  /** TPC-H Q6 shape — the forecasting-revenue-change scan: ONE filtered
    * aggregation with zero joins, the canonical pushdown/codegen
    * showcase (a year of shipments, a discount band, a quantity cap;
    * revenue that WOULD have been earned had the discounts been
    * dropped). All three predicates push to the parquet scan
    * (PushedFilters carries the date + quantity bounds), the agg reads
    * 4 columns of the wide row, and the whole plan is one
    * WholeStageCodegen span over the scan. Discount literals compare
    * double-to-double (both engines read identical parquet bits);
    * revenue is the exact DECIMAL product-sum cast once (§5). (round 5)
    */
  def q6(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01 00:00:00").cast("timestamp_ntz") &&
        col("l_shipdate") < lit("1997-01-01 00:00:00").cast("timestamp_ntz") &&
        col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
      .agg(dsum(decp(col("l_extendedprice")) * decf(col("l_discount")))
        .as("revenue"),
        count(lit(1)).as("n_items"))

  val q6Sql: String =
    s"""SELECT ${sqlDsum(s"${sqlDecp("l_extendedprice")} * ${sqlDecf("l_discount")}")} AS revenue,
              CAST(COUNT(*) AS BIGINT) AS n_items
       FROM lineitem
       WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
         AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
         AND l_discount BETWEEN 0.05 AND 0.07
         AND l_quantity < 24"""

  /** TPC-H Q8 shape — national market share: of the revenue a region's
    * customers spent on one part type over two years, the fraction
    * supplied by one nation, per order year. The all-sides snowflake:
    * customer resolves through nation x region (the market filter),
    * supplier through its own nation copy (the share numerator), part
    * by type — every dim broadcasts, so the only shuffle is
    * lineitem x orders; numerator and denominator are ONE pass over
    * the joined frame (conditional decimal sum, q14's discipline), and
    * the share is a single IEEE division of two correctly-rounded
    * decimal casts — bit-portable. (round 5)
    */
  def q8(s: SparkSession, dir: String): DataFrame = {
    val r = Tables.region(s, dir).filter(col("r_name") === "EUROPE")
    val cn = Tables.nation(s, dir)
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey").as("cn_key"))
    val c = Tables.customer(s, dir).select("c_custkey", "c_nationkey")
      .join(broadcast(cn), col("c_nationkey") === col("cn_key"))
      .select("c_custkey")
    val sn = Tables.nation(s, dir)
      .select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))
    val sup = Tables.supplier(s, dir).select("s_suppkey", "s_nationkey")
      .join(broadcast(sn), col("s_nationkey") === col("sn_key"))
      .select("s_suppkey", "supp_nation")
    val p = Tables.part(s, dir).filter(col("p_type") === "ECONOMY")
      .select("p_partkey")
    val o = Tables.orders(s, dir)
      .filter(col("o_orderdate").between(
        lit("1996-01-01 00:00:00").cast("timestamp_ntz"),
        lit("1997-12-31 00:00:00").cast("timestamp_ntz")))
      .select(col("o_orderkey"), col("o_custkey"),
        year(col("o_orderdate")).as("o_year"))
    val l = Tables.lineitem(s, dir)
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
        (decp(col("l_extendedprice")) * decf(lit(1.0) - col("l_discount")))
          .as("vol"))
    l.join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("o_year"))
      .agg(
        coalesce(sum(when(col("supp_nation") === "NATION_7", col("vol"))),
          lit(0)).cast("double").as("nation_rev"),
        dsum(col("vol")).as("total_rev"))
      .withColumn("mkt_share", col("nation_rev") / col("total_rev"))
      .orderBy("o_year")
  }

  val q8Sql: String =
    s"""WITH j AS (
         SELECT CAST(year(o_orderdate) AS INT) AS o_year, n2.n_name AS supp_nation,
                ${sqlDecp("l_extendedprice")} * ${sqlDecf("1.0 - l_discount")} AS vol
         FROM part, lineitem, orders, customer, supplier,
              nation n1, region, nation n2
         WHERE p_partkey = l_partkey AND l_orderkey = o_orderkey
           AND o_custkey = c_custkey AND l_suppkey = s_suppkey
           AND c_nationkey = n1.n_nationkey AND n1.n_regionkey = r_regionkey
           AND s_nationkey = n2.n_nationkey
           AND r_name = 'EUROPE' AND p_type = 'ECONOMY'
           AND o_orderdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
                               AND TIMESTAMP '1997-12-31 00:00:00')
       SELECT o_year,
              CAST(CAST(COALESCE(SUM(CASE WHEN supp_nation = 'NATION_7' THEN vol END),
                0) AS VARCHAR) AS DOUBLE) AS nation_rev,
              ${sqlDsum("vol")} AS total_rev,
              CAST(CAST(COALESCE(SUM(CASE WHEN supp_nation = 'NATION_7' THEN vol END),
                  0) AS VARCHAR) AS DOUBLE)
                / ${sqlDsum("vol")} AS mkt_share
       FROM j GROUP BY o_year ORDER BY o_year"""

  /** TPC-H Q9 shape — product-type profit by nation and year. The
    * classic uses partsupp's supply cost; this schema has no partsupp,
    * so cost is re-keyed to the part dim (10% of retail per unit) —
    * the PLAN is identical: lineitem x orders shuffle, part/supplier/
    * nation broadcast, profit = revenue minus cost per item summed per
    * (nation, year). Cost arithmetic stays exact: the double product
    * retail x quantity is IEEE-identical in both engines, cast once to
    * DECIMAL(14,4), scaled by an exact DECIMAL(8,6) 0.1 — every
    * operand exact, so the profit sum is one correctly-rounded cast.
    * (round 5)
    */
  def q9(s: SparkSession, dir: String): DataFrame = {
    val n = Tables.nation(s, dir).select("n_nationkey", "n_name")
    val sup = Tables.supplier(s, dir).select("s_suppkey", "s_nationkey")
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .select("s_suppkey", "n_name")
    val p = Tables.part(s, dir).filter(col("p_type").isin("PROMO", "ECONOMY"))
      .select("p_partkey", "p_retailprice")
    val o = Tables.orders(s, dir)
      .select(col("o_orderkey"), year(col("o_orderdate")).as("o_year"))
    val l = Tables.lineitem(s, dir)
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
        col("l_quantity"), col("l_extendedprice"), col("l_discount"))
    l.join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .select(col("n_name"), col("o_year"),
        (decp(col("l_extendedprice")) * decf(lit(1.0) - col("l_discount")) -
          decp(col("p_retailprice") * col("l_quantity")) * decf(lit(0.1)))
          .as("amount"))
      .groupBy(col("n_name"), col("o_year"))
      .agg(dsum(col("amount")).as("profit"))
      .orderBy(col("n_name"), col("o_year").desc)
  }

  val q9Sql: String =
    s"""SELECT n_name, CAST(year(o_orderdate) AS INT) AS o_year,
              ${sqlDsum(s"${sqlDecp("l_extendedprice")} * ${sqlDecf("1.0 - l_discount")}" +
      s" - ${sqlDecp("p_retailprice * l_quantity")} * ${sqlDecf("0.1")}")} AS profit
       FROM lineitem, part, orders, supplier, nation
       WHERE p_partkey = l_partkey AND o_orderkey = l_orderkey
         AND s_suppkey = l_suppkey AND s_nationkey = n_nationkey
         AND p_type IN ('PROMO', 'ECONOMY')
       GROUP BY 1, 2
       ORDER BY n_name, o_year DESC"""

  /** TPC-H Q15 shape — top supplier by a REVENUE VIEW: a quarter's
    * per-supplier revenue aggregated once (the CTE is the view), then
    * the suppliers hitting its maximum, found by an UNCORRELATED scalar
    * subquery over the same view. Catalyst plans the max as a one-row
    * subquery result reused in the filter (never per-row; Spark's CTE
    * dedup means the view aggregates once for both uses at this size —
    * at 100 TB the view would be a stored frame, q15's actual point).
    * The max-equality compares DECIMALS — exact, so the argmax row set
    * is identical in both engines; the revenue casts to double only in
    * the final projection. (round 5)
    */
  def q15TopSupplier(s: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(s, dir).createOrReplaceTempView("graft_q15_lineitem")
    Tables.supplier(s, dir).createOrReplaceTempView("graft_q15_supplier")
    s.sql("""
      WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
               SUM(CAST(l_extendedprice AS DECIMAL(14,4))
                   * CAST(1.0 - l_discount AS DECIMAL(8,6))) AS total_rev
        FROM graft_q15_lineitem
        WHERE l_shipdate >= TIMESTAMP_NTZ '1996-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP_NTZ '1996-04-01 00:00:00'
        GROUP BY l_suppkey)
      SELECT s.s_suppkey, s.s_name,
             CAST(r.total_rev AS DOUBLE) AS total_revenue
      FROM graft_q15_supplier s
      JOIN revenue r ON s.s_suppkey = r.supplier_no
      WHERE r.total_rev = (SELECT MAX(total_rev) FROM revenue)
      ORDER BY s.s_suppkey""")
  }

  val q15TopSupplierSql: String =
    s"""WITH revenue AS (
         SELECT l_suppkey AS supplier_no,
                SUM(${sqlDecp("l_extendedprice")} * ${sqlDecf("1.0 - l_discount")})
                  AS total_rev
         FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
           AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
         GROUP BY l_suppkey)
       SELECT s.s_suppkey, s.s_name,
              CAST(CAST(r.total_rev AS VARCHAR) AS DOUBLE) AS total_revenue
       FROM supplier s
       JOIN revenue r ON s.s_suppkey = r.supplier_no
       WHERE r.total_rev = (SELECT MAX(total_rev) FROM revenue)
       ORDER BY s.s_suppkey"""

  /** TPC-H Q2 shape — minimum-cost supplier: for each small part, the
    * EUROPE-region supplier with the lowest account balance among those
    * who actually shipped it (acctbal standing in for partsupp's
    * supply cost, the part-supplier relation derived as the DISTINCT
    * (partkey, suppkey) pairs of lineitem). The defining feature is a
    * correlated scalar subquery CONTAINING ITS OWN JOINS — Catalyst
    * decorrelates the 4-way min-subplan into one per-part aggregate
    * joined back on p_partkey (PlanQualitySpec pins no surviving
    * subquery), where a naive plan would re-run the join chain per
    * probe row. MIN over doubles is comparison-only — no arithmetic
    * anywhere, so parity is exact by construction. (round 5)
    */
  def q2MinCostSupplier(s: SparkSession, dir: String): DataFrame = {
    Tables.part(s, dir).createOrReplaceTempView("graft_q2_part")
    Tables.supplier(s, dir).createOrReplaceTempView("graft_q2_supplier")
    Tables.nation(s, dir).createOrReplaceTempView("graft_q2_nation")
    Tables.region(s, dir).createOrReplaceTempView("graft_q2_region")
    Tables.lineitem(s, dir).createOrReplaceTempView("graft_q2_lineitem")
    s.sql("""
      WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM graft_q2_lineitem)
      SELECT p.p_partkey, p.p_type, s.s_suppkey, s.s_acctbal, n.n_name
      FROM graft_q2_part p, graft_q2_supplier s, graft_q2_nation n,
           graft_q2_region r, ps
      WHERE p.p_partkey = ps.l_partkey AND s.s_suppkey = ps.l_suppkey
        AND s.s_nationkey = n.n_nationkey AND n.n_regionkey = r.r_regionkey
        AND r.r_name = 'EUROPE' AND p.p_size BETWEEN 1 AND 15
        AND s.s_acctbal = (SELECT MIN(s2.s_acctbal)
                           FROM ps ps2, graft_q2_supplier s2,
                                graft_q2_nation n2, graft_q2_region r2
                           WHERE ps2.l_partkey = p.p_partkey
                             AND s2.s_suppkey = ps2.l_suppkey
                             AND s2.s_nationkey = n2.n_nationkey
                             AND n2.n_regionkey = r2.r_regionkey
                             AND r2.r_name = 'EUROPE')
      ORDER BY s.s_acctbal DESC, p.p_partkey, s.s_suppkey
      LIMIT 100""")
  }

  val q2MinCostSupplierSql: String =
    s"""WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
       SELECT p.p_partkey, p.p_type, s.s_suppkey, s.s_acctbal, n.n_name
       FROM part p, supplier s, nation n, region r, ps
       WHERE p.p_partkey = ps.l_partkey AND s.s_suppkey = ps.l_suppkey
         AND s.s_nationkey = n.n_nationkey AND n.n_regionkey = r.r_regionkey
         AND r.r_name = 'EUROPE' AND p.p_size BETWEEN 1 AND 15
         AND s.s_acctbal = (SELECT MIN(s2.s_acctbal)
                            FROM ps ps2, supplier s2, nation n2, region r2
                            WHERE ps2.l_partkey = p.p_partkey
                              AND s2.s_suppkey = ps2.l_suppkey
                              AND s2.s_nationkey = n2.n_nationkey
                              AND n2.n_regionkey = r2.r_regionkey
                              AND r2.r_name = 'EUROPE')
       ORDER BY s.s_acctbal DESC, p.p_partkey, s.s_suppkey
       LIMIT 100"""

  /** TPC-H Q12 shape — shipping-class priority distribution: one
    * lineitem x orders equi-join with BOTH priority counts folded into
    * a single conditional aggregation pass (no second scan, no pivot
    * shuffle). l_linestatus stands in for the schema's missing
    * l_shipmode and the returnflag filter for the commit/receipt-lag
    * predicate — the PLAN is Q12's exactly: heavy filter on the fact
    * side BEFORE the join (ships only qualifying (orderkey, status)
    * pairs), orders projected to (key, priority), one shuffle, a
    * tiny grouped output. All-integer counts: parity is
    * arithmetic-free. (round 5)
    */
  def q12ShipPriority(s: SparkSession, dir: String): DataFrame = {
    val hi = Seq("1-URGENT", "2-HIGH")
    val l = Tables.lineitem(s, dir)
      .filter(col("l_returnflag") === "R" &&
        col("l_shipdate") >= lit("1996-01-01 00:00:00").cast("timestamp_ntz") &&
        col("l_shipdate") < lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
      .select("l_orderkey", "l_linestatus")
    val o = Tables.orders(s, dir).select("o_orderkey", "o_orderpriority")
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_linestatus").as("ship_class"))
      .agg(
        sum(when(col("o_orderpriority").isin(hi: _*), 1L).otherwise(0L))
          .as("high_line_count"),
        sum(when(col("o_orderpriority").isin(hi: _*), 0L).otherwise(1L))
          .as("low_line_count"))
      .orderBy("ship_class")
  }

  val q12ShipPrioritySql: String =
    s"""SELECT l_linestatus AS ship_class,
              CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                       THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
              CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                       THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
       FROM orders, lineitem
       WHERE o_orderkey = l_orderkey
         AND l_returnflag = 'R'
         AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
         AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
       GROUP BY l_linestatus
       ORDER BY ship_class"""

  /** TPC-H Q11 shape — important-stock identification: per-part value
    * from one nation's suppliers, kept when it exceeds a fraction of
    * the TOTAL — the classic uncorrelated-scalar-in-HAVING family. The
    * value frame is a WITH view aggregated ONCE; both the group rows
    * and the threshold read it (at 100 TB the view is the stored
    * frame, and the scalar is a 1-row broadcast into the filter —
    * never a per-row rescan; PlanQualitySpec pins that no correlated
    * subquery survives). The classic's fixed fraction is
    * scale-dependent (ties the threshold to the part count), so the
    * re-keyed threshold is the MEAN share — v * N > total — which is
    * scale-free; the comparison multiplies exact DECIMALs by an
    * integer count, so the kept-row set is bit-identical in both
    * engines; value casts to double only in the projection. (round 5)
    */
  def q11ImportantValue(s: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(s, dir).createOrReplaceTempView("graft_q11_lineitem")
    Tables.supplier(s, dir).createOrReplaceTempView("graft_q11_supplier")
    Tables.nation(s, dir).createOrReplaceTempView("graft_q11_nation")
    s.sql("""
      WITH val AS (
        SELECT l.l_partkey,
               SUM(CAST(l.l_extendedprice AS DECIMAL(14,4))) AS v
        FROM graft_q11_lineitem l
        JOIN graft_q11_supplier s ON l.l_suppkey = s.s_suppkey
        JOIN graft_q11_nation n ON s.s_nationkey = n.n_nationkey
        WHERE n.n_name = 'NATION_3'
        GROUP BY l.l_partkey)
      SELECT l_partkey, CAST(v AS DOUBLE) AS part_value
      FROM val
      WHERE v * CAST((SELECT COUNT(*) FROM val) AS DECIMAL(10,0)) >
            (SELECT SUM(v) FROM val)
      ORDER BY part_value DESC, l_partkey""")
  }

  val q11ImportantValueSql: String =
    s"""WITH val AS (
         SELECT l.l_partkey,
                SUM(CAST(l.l_extendedprice AS DECIMAL(14,4))) AS v
         FROM lineitem l
         JOIN supplier s ON l.l_suppkey = s.s_suppkey
         JOIN nation n ON s.s_nationkey = n.n_nationkey
         WHERE n.n_name = 'NATION_3'
         GROUP BY l.l_partkey)
       SELECT l_partkey, CAST(CAST(v AS VARCHAR) AS DOUBLE) AS part_value
       FROM val
       WHERE v * CAST((SELECT COUNT(*) FROM val) AS DECIMAL(10,0)) >
             (SELECT SUM(v) FROM val)
       ORDER BY part_value DESC, l_partkey"""

  /** TPC-H Q16 shape — supplier-part relationship count with a NOT IN
    * exclusion: distinct suppliers per (brand, type, size) bucket for
    * selected sizes, excluding "complaint" suppliers (negative account
    * balance standing in for the classic's complaint-comment scan; the
    * part-supplier relation is the DISTINCT lineitem pair frame, as in
    * q2). RewritePredicateSubquery turns the NOT IN into a LeftAnti
    * join against the tiny complaint list (PlanQualitySpec pins it);
    * COUNT(DISTINCT suppkey) partial-aggregates per bucket after the
    * part join — the only shuffles are the pair-distinct and the
    * bucket agg, both on narrow integer keys. All-integer counts:
    * arithmetic-free parity. (round 5)
    */
  def q16SupplierPartCount(s: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(s, dir).createOrReplaceTempView("graft_q16_lineitem")
    Tables.part(s, dir).createOrReplaceTempView("graft_q16_part")
    Tables.supplier(s, dir).createOrReplaceTempView("graft_q16_supplier")
    s.sql("""
      WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM graft_q16_lineitem)
      SELECT p.p_brand, p.p_type, p.p_size,
             CAST(COUNT(DISTINCT ps.l_suppkey) AS BIGINT) AS supplier_cnt
      FROM ps
      JOIN graft_q16_part p ON p.p_partkey = ps.l_partkey
      WHERE p.p_brand <> 'Brand#17'
        AND p.p_size IN (1, 5, 9, 13, 17, 21, 25, 29)
        AND ps.l_suppkey NOT IN (SELECT s_suppkey FROM graft_q16_supplier
                                 WHERE s_acctbal < 0)
      GROUP BY p.p_brand, p.p_type, p.p_size
      ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, p.p_size""")
  }

  val q16SupplierPartCountSql: String =
    s"""WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
       SELECT p.p_brand, p.p_type, p.p_size,
              CAST(COUNT(DISTINCT ps.l_suppkey) AS BIGINT) AS supplier_cnt
       FROM ps
       JOIN part p ON p.p_partkey = ps.l_partkey
       WHERE p.p_brand <> 'Brand#17'
         AND p.p_size IN (1, 5, 9, 13, 17, 21, 25, 29)
         AND ps.l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                                  WHERE s_acctbal < 0)
       GROUP BY p.p_brand, p.p_type, p.p_size
       ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, p.p_size"""

  /** TPC-H Q20 shape — the NESTED subquery tower: an IN-subquery whose
    * body is a grouped frame filtered by a CORRELATED scalar subquery
    * (the deepest classic decorrelation: Catalyst must rewrite the
    * inner scalar into a per-part aggregate join, then the IN into a
    * LeftSemi — two rewrites stacked; PlanQualitySpec pins both). The
    * classic asks for suppliers whose available stock of a promoted
    * part exceeds half a period's demand; without partsupp the
    * re-keying is dominance — suppliers who shipped MORE THAN 20% of a
    * 'small%' part's total shipped quantity (share x5 as an integer
    * multiply, never a fraction compare). The semi join probes
    * supplier with a key list whose size is bounded by the dominant
    * pair count — tiny, AQE-broadcastable; integral quantity sums make
    * parity arithmetic-free. (round 5)
    */
  def q20DominantSupplier(s: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(s, dir).createOrReplaceTempView("graft_q20_lineitem")
    Tables.part(s, dir).createOrReplaceTempView("graft_q20_part")
    Tables.supplier(s, dir).createOrReplaceTempView("graft_q20_supplier")
    Tables.nation(s, dir).createOrReplaceTempView("graft_q20_nation")
    s.sql("""
      SELECT s.s_suppkey, s.s_name, n.n_name
      FROM graft_q20_supplier s
      JOIN graft_q20_nation n ON s.s_nationkey = n.n_nationkey
      WHERE s.s_suppkey IN (
        SELECT g.l_suppkey FROM (
          SELECT l.l_suppkey, l.l_partkey,
                 SUM(CAST(l.l_quantity AS BIGINT)) AS qty
          FROM graft_q20_lineitem l
          JOIN graft_q20_part p ON l.l_partkey = p.p_partkey
          WHERE p.p_name LIKE 'small%'
          GROUP BY l.l_suppkey, l.l_partkey) g
        WHERE g.qty * 5 > (SELECT SUM(CAST(l2.l_quantity AS BIGINT))
                           FROM graft_q20_lineitem l2
                           WHERE l2.l_partkey = g.l_partkey))
      ORDER BY s.s_suppkey""")
  }

  val q20DominantSupplierSql: String =
    s"""SELECT s.s_suppkey, s.s_name, n.n_name
       FROM supplier s
       JOIN nation n ON s.s_nationkey = n.n_nationkey
       WHERE s.s_suppkey IN (
         SELECT g.l_suppkey FROM (
           SELECT l.l_suppkey, l.l_partkey,
                  SUM(CAST(l.l_quantity AS BIGINT)) AS qty
           FROM lineitem l
           JOIN part p ON l.l_partkey = p.p_partkey
           WHERE p.p_name LIKE 'small%'
           GROUP BY l.l_suppkey, l.l_partkey) g
         WHERE g.qty * 5 > (SELECT SUM(CAST(l2.l_quantity AS BIGINT))
                            FROM lineitem l2
                            WHERE l2.l_partkey = g.l_partkey))
       ORDER BY s.s_suppkey"""

  /** RFM segmentation — the classic customer-value cube: quartile-bucket
    * every customer by Recency (days since last order, bucket 1 = most
    * recent), Frequency (order count) and Monetary (exact DECIMAL
    * revenue), then report the 4x4x4 segment cells. Buckets are
    * RANK-based (`1 + 4*(rank-1) div n`), not interpolated quantiles —
    * all-integer, so parity needs no float discipline anywhere except
    * the final monetary sum (dsum). The global per-metric rank is
    * [[graft.functions.Keys.denseIds]]' two-phase bucket-rank +
    * broadcast-offset form — `row_number() OVER (ORDER BY metric)`
    * semantics without the single-partition global window that dies on
    * a 10^9-customer dimension (the oracle uses the naive window: it is
    * the SPEC, not the plan). Customer metrics are one orders
    * aggregation; everything after runs on the dimension-sized frame,
    * localCheckpointed once for the three rank passes. (round 5)
    */
  def rfmSegments(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.Keys
    val per = Tables.orders(s, dir)
      .groupBy(col("o_custkey"))
      .agg(max(col("o_orderdate")).as("last_order"),
        count(lit(1)).as("freq"),
        sum(decp(col("o_totalprice"))).as("monetary"))
    val ref = Tables.orders(s, dir)
      .agg(max(col("o_orderdate")).as("ref_date"))
    val m = per.crossJoin(broadcast(ref))
      .select(col("o_custkey"),
        datediff(col("ref_date").cast("date"), col("last_order").cast("date"))
          .cast("long").as("recency_days"),
        col("freq"), col("monetary"))
      .localCheckpoint()
    val nDf = m.agg(count(lit(1)).as("n"))
    def rankBy(metric: String, idCol: String) =
      Keys.denseIds(m.select(col("o_custkey"), col(metric)), Nil,
        Seq(metric, "o_custkey"), idCol)
        .select(col("o_custkey"), col(idCol))
    def bucket(rank: String): org.apache.spark.sql.Column =
      expr(s"CAST(1 + (4 * (CAST($rank AS BIGINT) - 1)) div n AS BIGINT)")
    m.join(rankBy("recency_days", "r_rank"), "o_custkey")
      .join(rankBy("freq", "f_rank"), "o_custkey")
      .join(rankBy("monetary", "m_rank"), "o_custkey")
      .crossJoin(broadcast(nDf))
      .select(bucket("r_rank").as("r_bucket"), bucket("f_rank").as("f_bucket"),
        bucket("m_rank").as("m_bucket"), col("monetary"))
      .groupBy("r_bucket", "f_bucket", "m_bucket")
      .agg(count(lit(1)).as("n_customers"),
        sum(col("monetary")).cast("double").as("total_monetary"))
      .orderBy("r_bucket", "f_bucket", "m_bucket")
  }

  val rfmSegmentsSql: String =
    s"""WITH per AS (SELECT o_custkey, MAX(o_orderdate) AS last_order,
                CAST(COUNT(*) AS BIGINT) AS freq,
                SUM(${sqlDecp("o_totalprice")}) AS monetary
              FROM orders GROUP BY 1),
       ref AS (SELECT MAX(o_orderdate) AS ref_date FROM orders),
       m AS (SELECT o_custkey,
               CAST(datediff('day', CAST(last_order AS DATE),
                 CAST(ref_date AS DATE)) AS BIGINT) AS recency_days,
               freq, monetary
             FROM per CROSS JOIN ref),
       rk AS (SELECT o_custkey, monetary,
                ROW_NUMBER() OVER (ORDER BY recency_days, o_custkey) AS rr,
                ROW_NUMBER() OVER (ORDER BY freq, o_custkey) AS fr,
                ROW_NUMBER() OVER (ORDER BY monetary, o_custkey) AS mr,
                (SELECT COUNT(*) FROM m) AS n
              FROM m)
       SELECT CAST(1 + (4 * (rr - 1)) // n AS BIGINT) AS r_bucket,
              CAST(1 + (4 * (fr - 1)) // n AS BIGINT) AS f_bucket,
              CAST(1 + (4 * (mr - 1)) // n AS BIGINT) AS m_bucket,
              CAST(COUNT(*) AS BIGINT) AS n_customers,
              CAST(CAST(SUM(monetary) AS VARCHAR) AS DOUBLE)
                AS total_monetary
       FROM rk GROUP BY 1, 2, 3 ORDER BY 1, 2, 3"""

  /** Percent-of-total (ratio_to_report): each nation's share of its
    * region's order revenue. Sums stay exact DECIMAL through BOTH
    * levels (the per-nation agg and the region total, the latter a
    * region-partitioned window over the nation-cardinality frame —
    * 25 rows, never raw facts); the share is one double division of
    * two correctly-rounded casts, so it is bit-portable (SURVEY §5 —
    * the same reason the EWMA avoids a recursive form). Dims
    * broadcast; the one real shuffle is the orders agg. (round 4)
    */
  def revenueShare(s: SparkSession, dir: String): DataFrame = {
    val n = Tables.nation(s, dir)
      .join(broadcast(Tables.region(s, dir)),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"), col("n_name"), col("r_name"))
    val byNation = Tables.orders(s, dir)
      .join(broadcast(Tables.customer(s, dir)
        .select("c_custkey", "c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(sum(decp(col("o_totalprice"))).as("rev_dec"))
    val w = Window.partitionBy(col("r_name"))
    byNation
      .withColumn("region_dec", sum(col("rev_dec")).over(w))
      .select(col("r_name"), col("n_name"),
        col("rev_dec").cast("double").as("revenue"),
        (col("rev_dec").cast("double") / col("region_dec").cast("double"))
          .as("share"))
      .orderBy("r_name", "n_name")
  }

  val revenueShareSql: String =
    s"""WITH bn AS (SELECT r_name, n_name,
               SUM(${sqlDecp("o_totalprice")}) AS rev_dec
             FROM orders JOIN customer ON o_custkey = c_custkey
                  JOIN nation ON c_nationkey = n_nationkey
                  JOIN region ON n_regionkey = r_regionkey
             GROUP BY 1, 2)
       SELECT r_name, n_name,
              CAST(CAST(rev_dec AS VARCHAR) AS DOUBLE) AS revenue,
              CAST(CAST(rev_dec AS VARCHAR) AS DOUBLE)
                / CAST(CAST(SUM(rev_dec) OVER (PARTITION BY r_name)
                       AS VARCHAR) AS DOUBLE) AS share
       FROM bn ORDER BY r_name, n_name"""

  /** Reference dashboard: offres par source par mois (trend line). Events
    * play the offer stream; one shuffle on (type, month).
    */
  def perSourceMonth(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(col("event_type"),
        date_trunc("month", col("ts")).cast("date").as("month"))
      .agg(count(lit(1)).as("n_events"), dsum(decp(col("value"))).as("sum_value"))
      .orderBy("event_type", "month")

  val perSourceMonthSql: String =
    s"""SELECT event_type, CAST(date_trunc('month', ts) AS DATE) AS month,
       COUNT(*) AS n_events, ${sqlDsum(sqlDecp("value"))} AS sum_value
       FROM events GROUP BY 1, 2 ORDER BY 1, 2"""

  /** Demand MOMENTUM per part brand — the reference's "skill trend"
    * dashboard shape (which skills are rising month over month,
    * pipline.py's enriched feed charted in Superset) re-expressed on
    * the dated star: per brand, the exact least-squares slope of
    * monthly ordered quantity over a ZERO-FILLED month spine (a brand
    * absent from a month genuinely sold nothing that month — skipping
    * the zeros biases every slope upward). Month index is exact
    * integer year·12+month; moments follow the
    * [[graft.operators.Stats.regressionSlope]] discipline — decimal/
    * integer sums surfaced as doubles, one identical tree both
    * engines, NULL slope when the spine has one month (ConstantCorpus'
    * single-date orders). Scale: one lineitem×orders shuffle with the
    * part dim broadcast; the spine is months×brands-bounded; output
    * brand-cardinality. (round 7)
    */
  def brandDemandMomentum(s: SparkSession, dir: String): DataFrame = {
    val ords = Tables.orders(s, dir).select(col("o_orderkey"),
      (year(to_date(col("o_orderdate"))) * 12
        + month(to_date(col("o_orderdate"))) - 1).cast("long").as("ym"))
    val parts = Tables.part(s, dir)
      .select(col("p_partkey"), col("p_brand"))
    val monthly = Tables.lineitem(s, dir)
      .select(col("l_orderkey"), col("l_partkey"), col("l_quantity"))
      .join(ords, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(parts), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand").as("brand"), col("ym"))
      .agg(sum(decp(col("l_quantity"))).cast("decimal(14,4)").as("qty"))
    // Spine from the CALENDAR range sequence(min, max), not distinct
    // observed months: a month with no orders at all must still appear
    // (as zeros) or indices compress across the gap and every slope
    // regains the upward bias zero-filling exists to prevent — the
    // sloBurnRate/dailySeries zero-fill discipline.
    val bounds = ords.agg(min(col("ym")).as("m0"), max(col("ym")).as("m1"))
    val months = bounds
      .select(explode(sequence(col("m0"), col("m1"))).as("ym"))
    val brands = parts.select(col("p_brand").as("brand")).distinct()
    val m0 = bounds.select("m0")
    months.crossJoin(broadcast(brands)).crossJoin(broadcast(m0))
      .join(monthly, Seq("brand", "ym"), "left")
      .select(col("brand"), (col("ym") - col("m0")).as("x"),
        coalesce(col("qty"), lit(0).cast("decimal(14,4)")).as("y"))
      .groupBy("brand")
      .agg(count(lit(1)).as("n_months"),
        sum(col("x")).cast("double").as("sx"),
        sum(col("x") * col("x")).cast("double").as("sxx"),
        dsum(col("y")).as("sy"),
        dsum(decp(col("x")) * col("y")).as("sxy"))
      .withColumn("nd", col("n_months").cast("double"))
      .withColumn("den", col("nd") * col("sxx") - col("sx") * col("sx"))
      .select(col("brand"), col("n_months"), col("sy").as("total_qty"),
        when(col("den") =!= 0.0,
          (col("nd") * col("sxy") - col("sx") * col("sy")) / col("den"))
          .as("slope"))
      .orderBy("brand")
  }

  val brandDemandMomentumSql: String =
    s"""WITH ords AS (SELECT o_orderkey,
                CAST(year(o_orderdate) * 12 + month(o_orderdate) - 1
                     AS BIGINT) AS ym
              FROM orders),
       monthly AS (SELECT p.p_brand AS brand, o.ym,
                CAST(SUM(${sqlDecp("l.l_quantity")}) AS DECIMAL(14,4)) AS qty
              FROM lineitem l
                JOIN ords o ON l.l_orderkey = o.o_orderkey
                JOIN part p ON l.l_partkey = p.p_partkey
              GROUP BY 1, 2),
       bounds AS (SELECT MIN(ym) AS m0, MAX(ym) AS m1 FROM ords),
       months AS (SELECT UNNEST(generate_series(m0, m1)) AS ym FROM bounds),
       brands AS (SELECT DISTINCT p_brand AS brand FROM part),
       m0 AS (SELECT m0 FROM bounds),
       z AS (SELECT b.brand, mo.ym - m.m0 AS x,
                COALESCE(q.qty, CAST(0 AS DECIMAL(14,4))) AS y
             FROM months mo CROSS JOIN brands b CROSS JOIN m0 m
               LEFT JOIN monthly q ON b.brand = q.brand AND mo.ym = q.ym),
       agg AS (SELECT brand, CAST(COUNT(*) AS BIGINT) AS n_months,
                CAST(SUM(x) AS DOUBLE) AS sx,
                CAST(SUM(x * x) AS DOUBLE) AS sxx,
                ${sqlDsum("y")} AS sy,
                ${sqlDsum(s"${sqlDecp("x")} * y")} AS sxy
             FROM z GROUP BY 1)
       SELECT brand, n_months, sy AS total_qty,
              CASE WHEN CAST(n_months AS DOUBLE) * sxx - sx * sx <> 0.0
                THEN (CAST(n_months AS DOUBLE) * sxy - sx * sy)
                  / (CAST(n_months AS DOUBLE) * sxx - sx * sx)
              END AS slope
       FROM agg ORDER BY brand"""

  /** Reference dashboard: top companies by offer volume/value -> customer
    * ranking with a window over the aggregate (rank is deterministic:
    * exact-decimal total + key tiebreak).
    */
  def companyRanking(s: SparkSession, dir: String): DataFrame = {
    val per = Tables.orders(s, dir)
      .groupBy(col("o_custkey"))
      .agg(dsum(decp(col("o_totalprice"))).as("total_value"),
        count(lit(1)).as("n_orders"))
    val n = Tables.nation(s, dir)
    val c = Tables.customer(s, dir)
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("c_name"), col("n_name").as("nation"))
    val w = Window.partitionBy(col("nation"))
      .orderBy(col("total_value").desc, col("c_custkey"))
    per.join(c, per("o_custkey") === c("c_custkey"))
      .select(col("nation"), col("c_custkey"), col("c_name"),
        col("total_value"), col("n_orders"),
        row_number().over(w).as("rank_in_nation"))
      .filter(col("rank_in_nation") <= 5)
      .orderBy(col("nation"), col("rank_in_nation"))
  }

  val companyRankingSql: String =
    s"""SELECT nation, c_custkey, c_name, total_value, n_orders, rank_in_nation
       FROM (
         SELECT n_name AS nation, c_custkey, c_name, total_value, n_orders,
           ROW_NUMBER() OVER (PARTITION BY n_name ORDER BY total_value DESC, c_custkey)
             AS rank_in_nation
         FROM (SELECT o_custkey, ${sqlDsum(sqlDecp("o_totalprice"))} AS total_value,
                 COUNT(*) AS n_orders FROM orders GROUP BY o_custkey) t
         JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey) r
       WHERE rank_in_nation <= 5
       ORDER BY nation, rank_in_nation"""

  /** Window-function suite: lag/lead/running sum per customer order
    * history (evolution temporelle per entity).
    */
  def windowRunning(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    Tables.orders(s, dir)
      .select(col("o_custkey"), col("o_orderkey"),
        col("o_orderdate").cast("date").as("o_orderdate"),
        decp(col("o_totalprice")).as("price"))
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
        col("price").cast("double").as("price"),
        lag(col("price"), 1).over(w).cast("double").as("prev_price"),
        lead(col("price"), 1).over(w).cast("double").as("next_price"),
        sum(col("price")).over(w.rowsBetween(Window.unboundedPreceding, 0))
          .cast("double").as("running_total"),
        row_number().over(w).as("order_seq"))
      .orderBy(col("o_custkey"), col("order_seq"))
  }

  val windowRunningSql: String =
    s"""SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS o_orderdate,
       CAST(price AS DOUBLE) AS price,
       CAST(LAG(price, 1) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS DOUBLE) AS prev_price,
       CAST(LEAD(price, 1) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS DOUBLE) AS next_price,
       CAST(SUM(price) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total,
       ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS order_seq
       FROM (SELECT *, ${sqlDecp("o_totalprice")} AS price FROM orders) o
       ORDER BY o_custkey, order_seq"""

  /** ROLLUP aggregate with grouping id (multi-level dashboard totals). */
  def rollupAgg(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(dsum(decp(col("l_quantity"))).as("sum_qty"),
        count(lit(1)).as("n"), grouping_id().as("gid"))
      .orderBy(col("gid"),
        col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)

  val rollupAggSql: String =
    s"""SELECT l_returnflag, l_linestatus,
       ${sqlDsum(sqlDecp("l_quantity"))} AS sum_qty, COUNT(*) AS n,
       GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS gid
       FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
       ORDER BY gid, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST"""

  /** Wide-to-long melt (UNPIVOT) — the inverse of [[pivotEventTypes]]:
    * per-doc metric columns unpivoted into (doc_id, metric, value)
    * rows, the shape metric stores and long-format charting libraries
    * ingest. Pure per-row restructuring (each input row expands to a
    * fixed 3 rows map-side, no shuffle before the final sort).
    */
  def unpivotMetrics(s: SparkSession, dir: String): DataFrame = {
    val t = Tables.documents(s, dir)
      .filter(col("doc_id") < 100)
      .select(col("doc_id"), col("n_chars").cast("long").as("n_chars"),
        size(toks(col("text"))).cast("long").as("n_tokens"),
        size(array_distinct(toks(col("text")))).cast("long").as("n_uniq"))
    t.unpivot(Array(col("doc_id")),
        Array(col("n_chars"), col("n_tokens"), col("n_uniq")),
        "metric", "value")
      .orderBy("doc_id", "metric")
  }

  val unpivotMetricsSql: String =
    s"""WITH t AS (SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars,
             CAST(len(${sqlToks("text")}) AS BIGINT) AS n_tokens,
             CAST(len(list_distinct(${sqlToks("text")})) AS BIGINT) AS n_uniq
           FROM documents WHERE doc_id < 100)
       SELECT doc_id, metric, value
       FROM t UNPIVOT (value FOR metric IN (n_chars, n_tokens, n_uniq))
       ORDER BY doc_id, metric"""

  /** Multiset (ALL) set operations — [[setOps]]'s bag-semantics twin:
    * INTERSECT ALL / EXCEPT ALL preserve duplicate multiplicity
    * (min/count-difference semantics), which is what reconciliation
    * between two event feeds actually needs (a feed that dropped one
    * of three identical rows IS a discrepancy the DISTINCT forms
    * can't see). Bag inputs: per-customer order-priority rows.
    */
  def setOpsAll(s: SparkSession, dir: String): DataFrame = {
    val a = Tables.orders(s, dir)
      .filter(col("o_orderkey") % 2 === 0)
      .select(col("o_custkey").as("k"))
    val b = Tables.orders(s, dir)
      .filter(col("o_orderkey") % 3 === 0)
      .select(col("o_custkey").as("k"))
    val u = a.unionAll(b).withColumn("op", lit("union_all"))
    val i = a.intersectAll(b).withColumn("op", lit("intersect_all"))
    val e = a.exceptAll(b).withColumn("op", lit("except_all"))
    u.unionByName(i).unionByName(e)
      .groupBy("op").agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"))
      .orderBy("op")
  }

  val setOpsAllSql: String =
    """WITH a AS (SELECT o_custkey AS k FROM orders WHERE o_orderkey % 2 = 0),
       b AS (SELECT o_custkey AS k FROM orders WHERE o_orderkey % 3 = 0),
       m AS (
         SELECT 'union_all' AS op, k FROM (SELECT k FROM a UNION ALL
                                           SELECT k FROM b)
         UNION ALL
         SELECT 'intersect_all', k FROM (SELECT k FROM a INTERSECT ALL
                                         SELECT k FROM b)
         UNION ALL
         SELECT 'except_all', k FROM (SELECT k FROM a EXCEPT ALL
                                      SELECT k FROM b))
       SELECT op, COUNT(*) AS n, CAST(SUM(k) AS BIGINT) AS sum_k
       FROM m GROUP BY op ORDER BY op"""

  /** Arbitrary GROUPING SETS — the lattice shapes ROLLUP/CUBE can't
    * express (here: leaf (seg, prio), the prio margin WITHOUT the seg
    * margin, and the grand total). One aggregation pass expands to the
    * requested sets only — cheaper than CUBE + filter, which
    * materializes every margin first.
    */
  def groupingSetsAgg(s: SparkSession, dir: String): DataFrame = {
    val j = Tables.orders(s, dir).join(Tables.customer(s, dir),
      col("o_custkey") === col("c_custkey"))
      .select(lower(trim(col("c_mktsegment"))).as("seg"),
        lower(trim(col("o_orderpriority"))).as("prio"),
        decp(col("o_totalprice")).as("price"))
    j.groupingSets(
        Seq(Seq(col("seg"), col("prio")), Seq(col("prio")), Seq()),
        col("seg"), col("prio"))
      .agg(dsum(col("price")).as("sum_price"), count(lit(1)).as("n"),
        grouping_id().as("gid"))
      .orderBy(col("gid"), col("seg").asc_nulls_first,
        col("prio").asc_nulls_first)
  }

  val groupingSetsAggSql: String =
    s"""WITH j AS (SELECT lower(trim(c.c_mktsegment)) AS seg,
                     lower(trim(o.o_orderpriority)) AS prio,
                     ${sqlDecp("o.o_totalprice")} AS price
                   FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey)
       SELECT seg, prio, ${sqlDsum("price")} AS sum_price, COUNT(*) AS n,
              GROUPING(seg) * 2 + GROUPING(prio) AS gid
       FROM j GROUP BY GROUPING SETS ((seg, prio), (prio), ())
       ORDER BY gid, seg NULLS FIRST, prio NULLS FIRST"""

  /** CUBE aggregate with grouping id — all cross-tab margins at once,
    * the full-lattice sibling of [[rollupAgg]].
    */
  def cubeAgg(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(dsum(decp(col("l_quantity"))).as("sum_qty"),
        count(lit(1)).as("n"), grouping_id().as("gid"))
      .orderBy(col("gid"),
        col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)

  val cubeAggSql: String =
    s"""SELECT l_returnflag, l_linestatus,
       ${sqlDsum(sqlDecp("l_quantity"))} AS sum_qty, COUNT(*) AS n,
       GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS gid
       FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
       ORDER BY gid, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST"""

  /** Exact per-group median WITHOUT an engine median() (engines disagree
    * on interpolation): the middle one/two rows are selected by
    * row_number against a windowed count and averaged in IEEE doubles —
    * bit-portable, and every window is partitioned (parallel per
    * group; no global funnel).
    */
  def groupMedian(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("prio"))
      .orderBy(col("price"), col("o_orderkey"))
    val wn = Window.partitionBy(col("prio"))
    Tables.orders(s, dir)
      .select(lower(trim(col("o_orderpriority"))).as("prio"),
        decp(col("o_totalprice")).cast("double").as("price"),
        col("o_orderkey"))
      .withColumn("rn", row_number().over(w))
      .withColumn("cnt", count(lit(1)).over(wn))
      .filter(col("rn") === expr("(cnt + 1) div 2") ||
        col("rn") === expr("(cnt + 2) div 2"))
      .groupBy("prio")
      .agg((sum(col("price")) / count(lit(1))).as("median_price"),
        max(col("cnt")).as("n"))
      .orderBy("prio")
  }

  val groupMedianSql: String =
    s"""WITH t AS (SELECT lower(trim(o_orderpriority)) AS prio,
                     CAST(${sqlDecp("o_totalprice")} AS DOUBLE) AS price,
                     o_orderkey
                   FROM orders),
       r AS (SELECT prio, price,
               ROW_NUMBER() OVER (PARTITION BY prio ORDER BY price, o_orderkey) AS rn,
               COUNT(*) OVER (PARTITION BY prio) AS cnt
             FROM t)
       SELECT prio, SUM(price) / COUNT(*) AS median_price,
              CAST(MAX(cnt) AS BIGINT) AS n
       FROM r
       WHERE rn = (cnt + 1) // 2 OR rn = (cnt + 2) // 2
       GROUP BY prio ORDER BY prio"""

  /** Skew-safe per-user event counts via explicit two-phase salting
    * ([[graft.functions.Skew.saltedCount]]): partials on (key, salt)
    * fan a hot key over 8 reducers, the final agg sums partials.
    * Registered so the skew pattern itself is oracle-verified — the
    * result must equal the plain GROUP BY exactly.
    */
  def skewSaltedCounts(s: SparkSession, dir: String): DataFrame =
    graft.functions.Skew
      .saltedCount(Tables.events(s, dir), col("user_id"), col("event_id"), 8)
      .select(col("k").as("user_id"), col("n"))
      .orderBy("user_id")

  val skewSaltedCountsSql: String =
    """SELECT user_id, COUNT(*) AS n FROM events
       GROUP BY user_id ORDER BY user_id"""

  /** Skew-safe equi-join via [[graft.functions.Skew.saltedJoin]]: the
    * fact side salts on a row-identity hash, the dim side replicates
    * once per salt, so one hot user fans over 8 reducers. The result
    * must equal the plain join exactly — oracle-gated here through a
    * cohort rollup.
    */
  def skewSaltedJoin(s: SparkSession, dir: String): DataFrame = {
    val users = Tables.events(s, dir).select(col("user_id")).distinct()
      .withColumn("cohort", (col("user_id") % 3).cast("int"))
    graft.functions.Skew
      .saltedJoin(Tables.events(s, dir), users, "user_id", "event_id", 8)
      .groupBy("cohort").agg(count(lit(1)).as("n"))
      .orderBy("cohort")
  }

  val skewSaltedJoinSql: String =
    """SELECT CAST(user_id % 3 AS INT) AS cohort, COUNT(*) AS n
       FROM events GROUP BY 1 ORDER BY 1"""

  /** Pivot: event types to columns (manual conditional agg — parity-safe
    * and identical to what Spark's pivot plans anyway).
    */
  def pivotEventTypes(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
    def cnt(t: String) =
      count(when(col("event_type") === t, 1)).as(s"n_$t")
    e.groupBy(col("user_id"))
      .agg(cnt("click"), cnt("view"), cnt("purchase"), cnt("signup"),
        cnt("error"))
      .orderBy("user_id")
  }

  val pivotEventTypesSql: String =
    """SELECT user_id,
       COUNT(*) FILTER (WHERE event_type = 'click') AS n_click,
       COUNT(*) FILTER (WHERE event_type = 'view') AS n_view,
       COUNT(*) FILTER (WHERE event_type = 'purchase') AS n_purchase,
       COUNT(*) FILTER (WHERE event_type = 'signup') AS n_signup,
       COUNT(*) FILTER (WHERE event_type = 'error') AS n_error
       FROM events GROUP BY user_id ORDER BY user_id"""

  /** left_semi / left_anti (EXISTS / NOT EXISTS) — customers with vs
    * without recent orders.
    */
  def semiAntiJoin(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir).select("c_custkey", "c_mktsegment")
    val recent = Tables.orders(s, dir)
      .filter(col("o_orderdate") >= lit("2000-01-01 00:00:00").cast("timestamp_ntz"))
      .select("o_custkey")
    val withO = c.join(recent, c("c_custkey") === recent("o_custkey"), "left_semi")
      .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n"))
      .withColumn("cohort", lit("active"))
    val withoutO = c.join(recent, c("c_custkey") === recent("o_custkey"), "left_anti")
      .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n"))
      .withColumn("cohort", lit("inactive"))
    withO.unionByName(withoutO)
      .select("cohort", "c_mktsegment", "n")
      .orderBy("cohort", "c_mktsegment")
  }

  val semiAntiJoinSql: String =
    """SELECT 'active' AS cohort, c_mktsegment, COUNT(*) AS n FROM customer
       WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                     AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
       GROUP BY c_mktsegment
       UNION ALL
       SELECT 'inactive' AS cohort, c_mktsegment, COUNT(*) AS n FROM customer
       WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                         AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
       GROUP BY c_mktsegment
       ORDER BY cohort, c_mktsegment"""

  /** UNION / INTERSECT / EXCEPT over key sets. */
  def setOps(s: SparkSession, dir: String): DataFrame = {
    val buyers = Tables.orders(s, dir).select(col("o_custkey").as("k")).distinct()
    val eventers = Tables.events(s, dir).select(col("user_id").as("k")).distinct()
    val u = buyers.union(eventers).distinct().withColumn("op", lit("union"))
    val i = buyers.intersect(eventers).withColumn("op", lit("intersect"))
    val e = buyers.except(eventers).withColumn("op", lit("except"))
    u.unionByName(i).unionByName(e)
      .groupBy("op").agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"))
      .orderBy("op")
  }

  // CAST(SUM AS BIGINT): DuckDB widens SUM(BIGINT) to INT128, Spark keeps LONG.
  val setOpsSql: String =
    """WITH buyers AS (SELECT DISTINCT o_custkey AS k FROM orders),
         eventers AS (SELECT DISTINCT user_id AS k FROM events),
         tagged AS (
           SELECT 'union' AS op, k FROM (SELECT k FROM buyers UNION SELECT k FROM eventers)
           UNION ALL
           SELECT 'intersect' AS op, k FROM (SELECT k FROM buyers INTERSECT SELECT k FROM eventers)
           UNION ALL
           SELECT 'except' AS op, k FROM (SELECT k FROM buyers EXCEPT SELECT k FROM eventers))
       SELECT op, COUNT(*) AS n, CAST(SUM(k) AS BIGINT) AS sum_k FROM tagged
       GROUP BY op ORDER BY op"""

  /** HLL approximate distinct (rows-only check: HLL implementations
    * differ across engines by design). Exact twin included for scale
    * comparison in specs.
    */
  def approxDistinct(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .agg(approx_count_distinct(col("l_partkey")).as("approx_parts"),
        count(lit(1)).as("n"))
      .orderBy("l_returnflag")

  /** Sketch-rollup distinct counting — the mergeable-summaries form of
    * [[approxDistinct]] over the custom [[graft.plans.HllSketch]] tier:
    * per-DAY user sketches built once, then WEEKLY counts answered by
    * merging the 4 KiB daily blobs (register max) — never rescanning
    * events. This is how a 100 TB store answers "distinct over any
    * window" (persist the finest-grain sketches; every coarser rollup
    * is a blob merge). Rows-only gate (approximate by design);
    * HllSketchSpec pins the merge = direct-sketch identity bit-for-bit
    * and the estimate error vs exact.
    */
  def approxDistinctSketchRollup(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(s, dir)
      .groupBy(to_date(col("ts")).as("day"))
      .agg(expr("graft_hll_sketch(CAST(user_id AS STRING), 12)").as("sk"))
    daily
      .groupBy(expr("datediff(day, DATE '1970-01-01') div 7").as("week"))
      .agg(expr("graft_hll_merge(sk)").as("wsk"),
        count(lit(1)).as("n_days"))
      .select(col("week"), col("n_days"),
        expr("graft_hll_est(wsk)").as("approx_users"))
      .orderBy("week")
  }

  /** Large-orders report (TPC-H Q18 shape): orders whose line quantity
    * total crosses a threshold, with customer attribution — aggregate +
    * HAVING + join back for detail. The HAVING is a post-aggregation
    * filter over order-cardinality rows (map-side partial agg compacts
    * the corpus first); the qualifying-key set then drives ordinary
    * broadcast-ish joins for attribution.
    */
  def bigOrders(s: SparkSession, dir: String): DataFrame = {
    val qty = Tables.lineitem(s, dir)
      .groupBy(col("l_orderkey"))
      .agg(sum(decp(col("l_quantity"))).as("total_qty_d"))
      .filter(col("total_qty_d") > 150)
    qty.join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
      .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
        to_date(col("o_orderdate")).as("o_date"),
        decp(col("o_totalprice")).cast("double").as("o_totalprice"),
        col("total_qty_d").cast("double").as("total_qty"))
      .orderBy(col("total_qty").desc, col("o_orderkey"))
  }

  val bigOrdersSql: String =
    s"""WITH qty AS (SELECT l_orderkey, SUM(${sqlDecp("l_quantity")}) AS total_qty_d
                     FROM lineitem GROUP BY l_orderkey
                     HAVING SUM(${sqlDecp("l_quantity")}) > 150)
       SELECT c.c_name, c.c_custkey, o.o_orderkey,
              CAST(o.o_orderdate AS DATE) AS o_date,
              CAST(${sqlDecp("o.o_totalprice")} AS DOUBLE) AS o_totalprice,
              CAST(total_qty_d AS DOUBLE) AS total_qty
       FROM qty JOIN orders o ON qty.l_orderkey = o.o_orderkey
                JOIN customer c ON o.o_custkey = c.c_custkey
       ORDER BY total_qty DESC, o.o_orderkey"""

  /** Funnel conversion (view -> click -> purchase, strictly ordered in
    * time per user): stage k counts users whose first stage-k event
    * happens AFTER their first stage-(k-1) event — the product-analytics
    * classic. Three conditional min-aggregations over (user, type, t)
    * rows; each stage's per-user frame is tiny (<= |users|) and
    * broadcasts back, so the corpus is scanned once per stage with no
    * wide shuffle. Fractions are exact-integer divisions vs the stage-1
    * population.
    */
  def funnelConversion(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("t"))
    val v = ev.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min(col("t")).as("tv"))
    val c = ev.filter(col("event_type") === "click")
      .join(broadcast(v), "user_id")
      .filter(col("t") > col("tv"))
      .groupBy("user_id").agg(min(col("t")).as("tc"))
    val p = ev.filter(col("event_type") === "purchase")
      .join(broadcast(c), "user_id")
      .filter(col("t") > col("tc"))
      .groupBy("user_id").agg(min(col("t")).as("tp"))
    val counts = v.agg(count(lit(1)).as("n")).withColumn("stage_ord", lit(1))
      .withColumn("stage", lit("view"))
      .unionByName(c.agg(count(lit(1)).as("n"))
        .withColumn("stage_ord", lit(2)).withColumn("stage", lit("click")))
      .unionByName(p.agg(count(lit(1)).as("n"))
        .withColumn("stage_ord", lit(3)).withColumn("stage", lit("purchase")))
    val first = v.agg(count(lit(1)).as("n1"))
    counts.crossJoin(broadcast(first))
      .select(col("stage_ord"), col("stage"), col("n").as("n_users"),
        // COUNT over an empty relation still emits a row, so an empty
        // corpus reaches this division with n1 = 0: NULL, not 0/0
        when(col("n1") === 0, lit(null).cast("double"))
          .otherwise(col("n").cast("double") / col("n1").cast("double"))
          .as("conv_frac"))
      .orderBy("stage_ord")
  }

  val funnelConversionSql: String =
    """WITH ev AS (SELECT user_id, event_type, epoch_us(ts) AS t FROM events),
       v AS (SELECT user_id, MIN(t) AS tv FROM ev
             WHERE event_type = 'view' GROUP BY user_id),
       c AS (SELECT ev.user_id, MIN(t) AS tc FROM ev JOIN v USING (user_id)
             WHERE event_type = 'click' AND t > tv GROUP BY ev.user_id),
       p AS (SELECT ev.user_id, MIN(t) AS tp FROM ev JOIN c USING (user_id)
             WHERE event_type = 'purchase' AND t > tc GROUP BY ev.user_id),
       counts AS (
         SELECT 1 AS stage_ord, 'view' AS stage, COUNT(*) AS n FROM v
         UNION ALL SELECT 2, 'click', COUNT(*) FROM c
         UNION ALL SELECT 3, 'purchase', COUNT(*) FROM p),
       first AS (SELECT COUNT(*) AS n1 FROM v)
       SELECT stage_ord, stage, n AS n_users,
              CASE WHEN n1 = 0 THEN NULL
                   ELSE CAST(n AS DOUBLE) / CAST(n1 AS DOUBLE)
              END AS conv_frac
       FROM counts CROSS JOIN first ORDER BY stage_ord"""

  /** Weekly cohort retention: users are cohorted by first-activity
    * week; cell (cohort, offset) counts how many are active `offset`
    * weeks later, as a fraction of the cohort. Two narrow aggregations
    * ((user, week) distinct activity and per-user first week — both
    * user-cardinality) and one joined count; the cohort dimension
    * broadcasts. The dashboard layout every retention chart reads.
    */
  def cohortRetention(s: SparkSession, dir: String): DataFrame = {
    val wk = Tables.events(s, dir)
      .select(col("user_id"),
        (datediff(to_date(col("ts")), lit("1970-01-01")) / 7)
          .cast("int").as("week"))
      .distinct()
    val cohort = wk.groupBy("user_id").agg(min(col("week")).as("cohort_week"))
    val sizes = cohort.groupBy("cohort_week").agg(count(lit(1)).as("cohort_n"))
    wk.join(broadcast(cohort), "user_id")
      .groupBy(col("cohort_week"), (col("week") - col("cohort_week")).as("offset"))
      .agg(count(lit(1)).as("n_active"))
      .join(broadcast(sizes), "cohort_week")
      .select(col("cohort_week"), col("offset"), col("n_active"),
        (col("n_active").cast("double") / col("cohort_n").cast("double"))
          .as("retention"))
      .orderBy("cohort_week", "offset")
  }

  val cohortRetentionSql: String =
    """WITH wk AS (SELECT DISTINCT user_id,
             CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) // 7
               AS INT) AS week
           FROM events),
       cohort AS (SELECT user_id, MIN(week) AS cohort_week
                  FROM wk GROUP BY user_id),
       sizes AS (SELECT cohort_week, COUNT(*) AS cohort_n
                 FROM cohort GROUP BY cohort_week),
       act AS (SELECT c.cohort_week, wk.week - c.cohort_week AS wk_off,
                      COUNT(*) AS n_active
               FROM wk JOIN cohort c USING (user_id)
               GROUP BY c.cohort_week, wk.week - c.cohort_week)
       SELECT act.cohort_week, CAST(wk_off AS INT) AS "offset", n_active,
              CAST(n_active AS DOUBLE) / CAST(cohort_n AS DOUBLE) AS retention
       FROM act JOIN sizes ON act.cohort_week = sizes.cohort_week
       ORDER BY act.cohort_week, wk_off"""

  /** Cohort lifetime value — [[cohortRetention]]'s revenue twin ("how
    * much value has each signup cohort produced by week N", the curve
    * LTV payback models read off): users cohort by first-event week,
    * per-(cohort, offset) event value accumulates in exact DECIMAL
    * (the q1_agg money discipline), and the cumulative curve is a
    * cohort-PARTITIONED window over the cohort×offset frame (weeks²-
    * bounded, never event-sized). Doubles only at the surface.
    * (round 6)
    */
  def cohortLtv(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .select(col("user_id"), decp(col("value")).as("v"),
        (datediff(to_date(col("ts")), lit("1970-01-01")) / 7)
          .cast("int").as("week"))
    val cohort = ev.groupBy("user_id").agg(min(col("week")).as("cohort_week"))
    val cell = ev.join(broadcast(cohort), "user_id")
      .groupBy(col("cohort_week"),
        (col("week") - col("cohort_week")).as("offset"))
      .agg(countDistinct(col("user_id")).as("n_users"),
        sum(col("v")).as("rev"))
    val w = Window.partitionBy(col("cohort_week")).orderBy(col("offset"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cell.withColumn("cum", sum(col("rev")).over(w))
      .select(col("cohort_week"), col("offset"), col("n_users"),
        col("rev").cast("double").as("revenue"),
        col("cum").cast("double").as("cum_revenue"))
      .orderBy("cohort_week", "offset")
  }

  val cohortLtvSql: String =
    s"""WITH ev AS (SELECT user_id, ${sqlDecp("value")} AS v,
             CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) // 7
               AS INT) AS week
           FROM events),
       cohort AS (SELECT user_id, MIN(week) AS cohort_week
                  FROM ev GROUP BY user_id),
       cell AS (SELECT c.cohort_week, ev.week - c.cohort_week AS wk_off,
                       CAST(COUNT(DISTINCT ev.user_id) AS BIGINT) AS n_users,
                       SUM(ev.v) AS rev
                FROM ev JOIN cohort c USING (user_id)
                GROUP BY 1, 2)
       SELECT cohort_week, CAST(wk_off AS INT) AS "offset", n_users,
              CAST(CAST(rev AS VARCHAR) AS DOUBLE) AS revenue,
              CAST(CAST(SUM(CAST(rev AS DECIMAL(26,4))) OVER (
                     PARTITION BY cohort_week ORDER BY wk_off
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS VARCHAR) AS DOUBLE) AS cum_revenue
       FROM cell ORDER BY cohort_week, wk_off"""

  /** Brand basket-affinity lift — market-basket association rules at
    * the BRAND level ("which brands sell together", the reference's
    * skill_association shape pointed at the order basket): for every
    * unordered brand pair, support, confidence and lift from exact
    * order-set counts. The (order, brand) frame is DISTINCT-compacted
    * before the pair self-join (baskets never blow up on quantity),
    * pairs bound by brands² regardless of order volume, and the
    * single-brand counts broadcast. One double division per measure.
    * Scale: the order-key equi-join is the only corpus-shaped shuffle;
    * AQE splits hot orders. (round 6)
    */
  def brandAffinityLift(s: SparkSession, dir: String): DataFrame = {
    // Basket form (round 15, guide §2.3/§2.4 — was DISTINCT (order,
    // brand) + an order-keyed SMJ self-join + two independent singles
    // aggregates + a two-phase countDistinct, each a separate shuffle
    // over the compacted frame): ONE groupBy(ok) collects each order's
    // distinct brand set (collect_set dedups exactly like the old
    // distinct; the set is brand-cardinality-bounded — baskets never
    // blow up on quantity OR on brand universe), and everything
    // derives from that basket frame: nord = basket count, singles =
    // exploded set counts, pairs = MAP-SIDE i<j expansion of the
    // string-sorted array (identical to the old a.brand < b.brand join
    // predicate). The corpus-shaped shuffle count drops from 6 to 1
    // (the ok-keyed agg, whose map-side partials already carry whole
    // per-order sets), the SMJ and both its sorts disappear, and the
    // pair stream compacts map-side before its brands²-bounded
    // exchange (plans/r15/brand_affinity_lift_*.txt). All counts are
    // exact integers over identical sets — bit-identical results.
    // (round 15 A/B: fanning the narrow (ok, partkey) projection out
    // before the broadcast join re-measured the standing fact-table
    // rule — 1.65-2.06 s -> 2.19-2.43 s at sf0.1; the extra exchange
    // of 600k rows costs more than the single-split scan+partial-agg
    // it parallelizes, exactly as Tables.scala documents.)
    val ob = Tables.lineitem(s, dir)
      .select(col("l_orderkey").as("ok"), col("l_partkey"))
      .join(broadcast(Tables.part(s, dir)
        .select(col("p_partkey"), col("p_brand").as("brand"))),
        col("l_partkey") === col("p_partkey"))
      .select(col("ok"), col("brand"))
    val baskets = ob.groupBy("ok")
      .agg(sort_array(collect_set(col("brand"))).as("bs"))
      .localCheckpoint() // feeds totals, singles AND the pair expansion
    val nord = baskets.agg(count(lit(1)).as("n"))
    val singles = baskets
      .select(explode(col("bs")).as("brand"))
      .groupBy("brand").agg(count(lit(1)).as("nb"))
    val pairs = baskets
      .select(explode(flatten(transform(col("bs"), (x, i) =>
        transform(slice(col("bs"), i + lit(2), size(col("bs"))),
          y => struct(x.as("brand_a"), y.as("brand_b")))))).as("p"))
      .groupBy(col("p.brand_a").as("brand_a"), col("p.brand_b").as("brand_b"))
      .agg(count(lit(1)).as("n_both"))
    pairs
      .join(broadcast(singles.select(col("brand").as("brand_a"),
        col("nb").as("n_a"))), Seq("brand_a"))
      .join(broadcast(singles.select(col("brand").as("brand_b"),
        col("nb").as("n_b"))), Seq("brand_b"))
      .crossJoin(broadcast(nord))
      .select(col("brand_a"), col("brand_b"), col("n_both"), col("n_a"),
        col("n_b"),
        (col("n_both").cast("double") / col("n").cast("double"))
          .as("support"),
        (col("n_both").cast("double") / col("n_a").cast("double"))
          .as("confidence"),
        ((col("n_both").cast("double") * col("n").cast("double"))
          / (col("n_a").cast("double") * col("n_b").cast("double")))
          .as("lift"))
      .orderBy(col("lift").desc, col("brand_a"), col("brand_b"))
  }

  val brandAffinityLiftSql: String =
    """WITH ob AS MATERIALIZED (
         SELECT DISTINCT l.l_orderkey AS ok, p.p_brand AS brand
         FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey),
       nord AS (SELECT CAST(COUNT(DISTINCT ok) AS BIGINT) AS n FROM ob),
       singles AS (SELECT brand, CAST(COUNT(*) AS BIGINT) AS nb
                   FROM ob GROUP BY 1),
       pairs AS (SELECT a.brand AS brand_a, b.brand AS brand_b,
                        CAST(COUNT(*) AS BIGINT) AS n_both
                 FROM ob a JOIN ob b
                   ON a.ok = b.ok AND a.brand < b.brand
                 GROUP BY 1, 2)
       SELECT p.brand_a, p.brand_b, p.n_both,
              sa.nb AS n_a, sb.nb AS n_b,
              CAST(p.n_both AS DOUBLE) / CAST(t.n AS DOUBLE) AS support,
              CAST(p.n_both AS DOUBLE) / CAST(sa.nb AS DOUBLE) AS confidence,
              (CAST(p.n_both AS DOUBLE) * CAST(t.n AS DOUBLE))
                / (CAST(sa.nb AS DOUBLE) * CAST(sb.nb AS DOUBLE)) AS lift
       FROM pairs p
         JOIN singles sa ON p.brand_a = sa.brand
         JOIN singles sb ON p.brand_b = sb.brand
         CROSS JOIN nord t
       ORDER BY lift DESC, brand_a, brand_b"""

  /** Customer value-segment MIGRATION matrix — "are my best customers
    * staying my best customers" (the churn-risk transition table next
    * to [[rfmSegments]]' static cube): orders split at the midpoint
    * date into two halves; each half ranks its customers into exact
    * revenue quartiles via [[graft.functions.Keys.denseIds]] (grouped
    * by half — the parallel rank, no global window) and the matrix
    * counts (segment_h1 → segment_h2) transitions, with 0 = absent
    * (acquired/churned rows live on the matrix edges). All revenue in
    * exact DECIMAL; bucket arithmetic exact BIGINT. Scale: one
    * (half, customer) aggregate, the two-phase rank, a ≤5×5 output.
    * (round 6)
    */
  def customerValueMigration(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.Keys
    val o = Tables.orders(s, dir)
      .select(col("o_custkey"), col("o_orderdate").cast("date").as("d"),
        decp(col("o_totalprice")).as("v"))
    val b = o.agg(min(col("d")).as("lo"), max(col("d")).as("hi"))
      .select(expr("date_add(lo, CAST(datediff(hi, lo) div 2 AS INT))")
        .as("mid"))
    val per = o.crossJoin(broadcast(b))
      .select(col("o_custkey"),
        when(col("d") <= col("mid"), 1L).otherwise(2L).as("h"), col("v"))
      .groupBy("h", "o_custkey").agg(sum(col("v")).as("mon"))
      .localCheckpoint() // feeds the rank AND the per-half sizes
    val ranked = Keys.denseIds(per.select(col("h"), col("o_custkey"),
      col("mon")), Seq("h"), Seq("mon", "o_custkey"), "rk")
    val sizes = per.groupBy("h").agg(count(lit(1)).as("nh"))
    val seg = ranked.join(broadcast(sizes), Seq("h"))
      .select(col("h"), col("o_custkey"),
        expr("1 + (4 * (CAST(rk AS BIGINT) - 1)) div nh").as("seg"))
    seg.filter(col("h") === 1L)
      .select(col("o_custkey"), col("seg").as("seg_h1"))
      .join(seg.filter(col("h") === 2L)
        .select(col("o_custkey"), col("seg").as("seg_h2")),
        Seq("o_custkey"), "full_outer")
      .select(coalesce(col("seg_h1"), lit(0L)).as("seg_h1"),
        coalesce(col("seg_h2"), lit(0L)).as("seg_h2"))
      .groupBy("seg_h1", "seg_h2")
      .agg(count(lit(1)).as("n_customers"))
      .orderBy("seg_h1", "seg_h2")
  }

  val customerValueMigrationSql: String =
    s"""WITH o AS (SELECT o_custkey, CAST(o_orderdate AS DATE) AS d,
                     ${sqlDecp("o_totalprice")} AS v
                   FROM orders),
       b AS (SELECT MIN(d) + (datediff('day', MIN(d), MAX(d)) // 2)
                      * INTERVAL 1 DAY AS mid
             FROM o),
       per AS (SELECT CASE WHEN o.d <= b.mid THEN 1 ELSE 2 END AS h,
                      o.o_custkey, SUM(o.v) AS mon
               FROM o CROSS JOIN b GROUP BY 1, 2),
       rk AS (SELECT h, o_custkey,
                     ROW_NUMBER() OVER (PARTITION BY h
                                        ORDER BY mon, o_custkey) AS rk,
                     COUNT(*) OVER (PARTITION BY h) AS nh
              FROM per),
       seg AS (SELECT h, o_custkey,
                      1 + (4 * (rk - 1)) // nh AS seg
               FROM rk)
       SELECT COALESCE(a.seg, 0) AS seg_h1, COALESCE(c.seg, 0) AS seg_h2,
              CAST(COUNT(*) AS BIGINT) AS n_customers
       FROM (SELECT o_custkey, seg FROM seg WHERE h = 1) a
         FULL OUTER JOIN (SELECT o_custkey, seg FROM seg WHERE h = 2) c
         ON a.o_custkey = c.o_custkey
       GROUP BY 1, 2 ORDER BY seg_h1, seg_h2"""

  /** Sketch-algebra audience overlap: weekly |viewers ∩ purchasers|
    * estimated by HLL inclusion-exclusion — est(A) + est(B) -
    * est(A ∪ B), where the union sketch is a pure register-max of the
    * two persisted blobs ([[graft.plans.HllUnion]]). HLL can't
    * intersect directly; this is the standard route, and it runs
    * entirely on blobs: at 100 TB the weekly audience overlap report
    * reads two 4 KiB sketches per segment, never events. One
    * aggregation pass builds all three sketches via conditional
    * inputs (nulls are ignored by the sketch aggregate). Approx by
    * design: rows-only + spec vs exact intersections. (round 4)
    */
  def hllIntersectUsers(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(expr("datediff(to_date(ts), DATE '1970-01-01') div 7")
        .as("week"))
      .agg(
        expr("""graft_hll_sketch(CASE WHEN event_type = 'view'
                THEN CAST(user_id AS STRING) END, 12)""").as("skv"),
        expr("""graft_hll_sketch(CASE WHEN event_type = 'purchase'
                THEN CAST(user_id AS STRING) END, 12)""").as("skp"))
      .select(col("week"),
        expr("graft_hll_est(skv)").as("viewers"),
        expr("graft_hll_est(skp)").as("purchasers"),
        (expr("graft_hll_est(skv)") + expr("graft_hll_est(skp)") -
          expr("graft_hll_est(graft_hll_union(skv, skp))"))
          .as("overlap_est"))
      .orderBy("week")

  /** Join-size estimation from CMS sketch inner products — the planner
    * primitive behind "should this join broadcast, and can we afford
    * it at all": |orders ⋈ events| on the shared key estimated by
    * dotting two 16 KiB sketches ([[graft.plans.CmsSketch]] AGMS §4.2
    * form) instead of running the join. One aggregation pass per side,
    * one scalar combine; the estimate is a one-sided upper bound
    * (collision cross-terms are non-negative), spec-bounded against
    * the exact join count. At 100 TB the sketches come from the
    * per-partition stats pipeline — the join never runs to be sized.
    * Approx by design: rows-only + spec. (round 4)
    */
  def joinSizeEstimate(s: SparkSession, dir: String): DataFrame = {
    val a = Tables.orders(s, dir)
      .agg(expr("graft_cms_sketch(CAST(o_custkey AS STRING))").as("ska"),
        count(lit(1)).as("n_orders"))
    val b = Tables.events(s, dir)
      .agg(expr("graft_cms_sketch(CAST(user_id AS STRING))").as("skb"),
        count(lit(1)).as("n_events"))
    a.join(b)
      .select(expr("graft_cms_dot(ska, skb)").as("est_join_size"),
        col("n_orders"), col("n_events"))
  }

  /** Bloom-pruned fact-dim join ([[graft.plans.BloomFilter]]) — the
    * explicit form of runtime row-level join filtering, for the 100 TB
    * case where the FILTERED dimension is too big to broadcast (the
    * join must shuffle) but its key set summarizes into a broadcastable
    * blob: build a bloom over the filtered dim keys (one agg pass),
    * broadcast the single-row blob (zero added shuffles — spec-pinned),
    * and filter the fact BEFORE its Exchange so the shuffle carries
    * only possible matches. False positives are discarded by the join
    * itself and false negatives are structurally impossible, so the
    * result is EXACTLY the plain join's — which is what the oracle
    * checks (the SQL has no bloom; equality IS the no-false-negatives
    * proof). The final join is hinted merge to model the real scenario
    * (at sf the dim would auto-broadcast and mask the point). (round 4)
    */
  def bloomJoinPrune(s: SparkSession, dir: String): DataFrame = {
    val dim = Tables.customer(s, dir)
      .filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey"), col("c_name"))
    val bloom = dim.agg(
      expr("graft_bloom_agg(CAST(c_custkey AS STRING), 17)").as("bf"))
    val pruned = Tables.orders(s, dir)
      .select(col("o_custkey"), col("o_orderkey"))
      .join(broadcast(bloom))
      .filter(expr("graft_bloom_contains(bf, CAST(o_custkey AS STRING))"))
      .drop("bf")
    pruned.join(dim.hint("merge"), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_custkey"), col("c_name"))
      .agg(count(lit(1)).as("n_orders"),
        min(col("o_orderkey")).as("first_order"),
        max(col("o_orderkey")).as("last_order"))
      .orderBy("c_custkey")
  }

  val bloomJoinPruneSql: String =
    """SELECT c_custkey, c_name, CAST(COUNT(*) AS BIGINT) AS n_orders,
              MIN(o_orderkey) AS first_order, MAX(o_orderkey) AS last_order
       FROM orders JOIN customer ON o_custkey = c_custkey
       WHERE c_mktsegment = 'BUILDING'
       GROUP BY 1, 2 ORDER BY 1"""

  /** High-value coverage threshold for the reconciliation report
    * (every customer has *some* order in this data; the audit question
    * with teeth is coverage of a selective slice).
    */
  val ReconcileMinPrice = 450000.0

  /** Full-outer reconciliation report — the audit query run after any
    * load: which keys exist on both sides, which dimension rows have no
    * facts (here: no HIGH-VALUE orders), which facts dangle without a
    * dimension. The fact side filters at the scan (pushed predicate)
    * and pre-aggregates per key BEFORE the join (map-side combinable),
    * so the full outer joins two key-cardinality frames — at 100 TB
    * the join never sees raw fact rows. Money stays exact decimal
    * through BOTH aggregation levels; one final cast. (round 4)
    */
  def fullOuterReconcile(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir)
      .select(col("c_custkey").as("key"), col("c_mktsegment").as("segment"))
    val o = Tables.orders(s, dir)
      .filter(col("o_totalprice") >= ReconcileMinPrice)
      .groupBy(col("o_custkey").as("key"))
      .agg(count(lit(1)).as("n_ord"), sum(decp(col("o_totalprice"))).as("sp"))
    c.join(o, Seq("key"), "full_outer")
      .withColumn("status",
        when(col("segment").isNull, "order_no_customer")
          .when(col("n_ord").isNull, "customer_no_orders")
          .otherwise("matched"))
      .groupBy("status")
      .agg(count(lit(1)).as("n_keys"),
        sum(coalesce(col("n_ord"), lit(0L))).as("n_orders"),
        coalesce(sum(col("sp")), lit(0)).cast("double").as("total_price"))
      .orderBy("status")
  }

  val fullOuterReconcileSql: String =
    s"""WITH c AS (SELECT c_custkey AS key, c_mktsegment AS segment
                   FROM customer),
       o AS (SELECT o_custkey AS key, COUNT(*) AS n_ord,
               SUM(${sqlDecp("o_totalprice")}) AS sp
             FROM orders WHERE o_totalprice >= $ReconcileMinPrice
             GROUP BY 1),
       j AS (SELECT COALESCE(c.key, o.key) AS key, c.segment, o.n_ord, o.sp,
               CASE WHEN c.segment IS NULL THEN 'order_no_customer'
                    WHEN o.n_ord IS NULL THEN 'customer_no_orders'
                    ELSE 'matched' END AS status
             FROM c FULL OUTER JOIN o ON c.key = o.key)
       SELECT status, COUNT(*) AS n_keys,
              CAST(SUM(COALESCE(n_ord, 0)) AS BIGINT) AS n_orders,
              CAST(CAST(COALESCE(SUM(sp), 0) AS VARCHAR) AS DOUBLE)
                AS total_price
       FROM j GROUP BY status ORDER BY status"""

  /** Per-key frequency rollup from mergeable Count-Min sketches
    * ([[graft.plans.CmsSketch]]) — the frequency twin of
    * [[approxDistinctSketchRollup]]: daily event-type sketches merge
    * into weekly blobs by counter ADDITION (never rescanning events),
    * then each week is probed for every event type. Estimates are
    * one-sided (est >= true; spec pins equality on this low-cardinality
    * domain and blob-identity of merged-daily vs direct-weekly). The
    * probe frame is the distinct type set — tiny — joined to the weekly
    * sketch frame; both sides are aggregate-compacted. Approximate by
    * design: rows-only gate + spec, like the HLL tier.
    */
  def cmsCountRollup(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val daily = ev.groupBy(to_date(col("ts")).as("day"))
      .agg(expr("graft_cms_sketch(event_type)").as("sk"))
    val weekly = daily
      .groupBy(expr("datediff(day, DATE '1970-01-01') div 7").as("week"))
      .agg(expr("graft_cms_merge(sk)").as("wsk"),
        count(lit(1)).as("n_days"))
    val types = ev.select(col("event_type")).distinct()
    weekly.join(broadcast(types))
      .select(col("week"), col("n_days"), col("event_type"),
        expr("graft_cms_est(wsk, event_type)").as("approx_n"))
      .orderBy("week", "event_type")
  }

  /** ABC inventory classification per brand — the assortment cut every
    * merchandising dashboard runs above [[Inference.paretoCoverage]]'s
    * scalar ("which parts are the A items"): parts rank by revenue
    * within their brand, the running share assigns A (first 80% of
    * brand revenue), B (to 95%), C (rest) — boundaries compared as
    * exact integer-scaled decimals (cum·5 vs tot·4, cum·20 vs tot·19;
    * no float thresholds), revenue sums exact DECIMAL. Output is the
    * brand × class rollup. Scale: one lineitem scan → (brand, part)
    * aggregate; windows partition per brand — never global. (round 9)
    */
  def abcClassification(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.Nums._
    val li = Tables.lineitem(s, dir)
    val rev = li
      .join(broadcast(Tables.part(s, dir)
        .select(col("p_partkey"), col("p_brand"))),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"), col("p_partkey"))
      .agg(sum(decp(col("l_extendedprice"))
        * decf(lit(1.0) - col("l_discount"))).as("rev"))
    val wc = Window.partitionBy(col("p_brand"))
      .orderBy(col("rev").desc, col("p_partkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wt = Window.partitionBy(col("p_brand"))
    rev
      .withColumn("cum", sum(col("rev")).over(wc))
      .withColumn("tot", sum(col("rev")).over(wt))
      .withColumn("abc_class",
        when(col("cum") * 5 <= col("tot") * 4, "A")
          .when(col("cum") * 20 <= col("tot") * 19, "B")
          .otherwise("C"))
      .groupBy(col("p_brand"), col("abc_class"))
      .agg(count(lit(1)).as("n_parts"), sum(col("rev")).as("class_rev"))
      .select(col("p_brand"), col("abc_class"), col("n_parts"),
        col("class_rev").cast("double").as("class_rev"))
      .orderBy("p_brand", "abc_class")
  }

  val abcClassificationSql: String = {
    import graft.functions.Nums._
    s"""WITH rev AS (
         SELECT p.p_brand, l.l_partkey,
                SUM(${sqlDecp("l.l_extendedprice")}
                  * ${sqlDecf("1.0 - l.l_discount")}) AS rev
         FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
         GROUP BY 1, 2),
       r AS (SELECT p_brand, rev,
               SUM(CAST(rev AS DECIMAL(38,8))) OVER (
                 PARTITION BY p_brand
                 ORDER BY rev DESC, l_partkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
               SUM(CAST(rev AS DECIMAL(38,8))) OVER (
                 PARTITION BY p_brand) AS tot
             FROM rev)
       SELECT p_brand,
              CASE WHEN cum * 5 <= tot * 4 THEN 'A'
                   WHEN cum * 20 <= tot * 19 THEN 'B'
                   ELSE 'C' END AS abc_class,
              CAST(COUNT(*) AS BIGINT) AS n_parts,
              ${graft.functions.Nums.sqlDsum("CAST(rev AS DECIMAL(38,8))")}
                AS class_rev
       FROM r GROUP BY 1, 2 ORDER BY 1, 2"""
  }

  /** Monthly customer churn/retention panel — the subscription-style
    * lifecycle read over order activity ([[Stats]]' DAU machinery at
    * month grain, with the churn complement a weekly dashboard cannot
    * see): per month on the complete month spine, active customers,
    * retained (also active the previous month — one equi-self-join of
    * the distinct (customer, month) frame on customer + month−1),
    * churned (previous month's active minus retained), and the two
    * rates as guarded double divisions against the previous month's
    * base. Months as (y, m) from an exact integer month index. Scale:
    * one orders scan → distinct (customer, month) → month-keyed
    * aggregates; the spine is calendar-bounded. (round 9)
    */
  def monthlyChurn(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    val cm = o.select(col("o_custkey").as("c"),
        (year(col("o_orderdate")) * 12 + month(col("o_orderdate")) - 1)
          .cast("long").as("mi"))
      .distinct()
      .localCheckpoint() // cust×months; feeds active, both join sides
    val spine = cm.agg(min(col("mi")).as("lo"), max(col("mi")).as("hi"))
      .select(explode(sequence(col("lo"), col("hi"))).as("mi"))
    val active = cm.groupBy("mi").agg(count(lit(1)).as("active"))
    val retained = cm.as("a")
      .join(cm.as("b"),
        col("b.c") === col("a.c") && col("b.mi") === col("a.mi") - 1)
      .groupBy(col("a.mi").as("mi"))
      .agg(count(lit(1)).as("retained"))
    broadcast(spine)
      .join(active, Seq("mi"), "left")
      .join(retained, Seq("mi"), "left")
      .join(active.select(col("mi").as("pmi"), col("active").as("prev_active")),
        col("pmi") === col("mi") - 1, "left")
      .select((col("mi") / 12).cast("long").as("y"),
        (col("mi") % 12 + 1).cast("long").as("m"),
        coalesce(col("active"), lit(0L)).as("active"),
        coalesce(col("retained"), lit(0L)).as("retained"),
        coalesce(col("prev_active"), lit(0L)).as("prev_active"))
      .select(col("y"), col("m"), col("active"), col("retained"),
        (col("prev_active") - col("retained")).as("churned"),
        when(col("prev_active") > 0,
          col("retained").cast("double") / col("prev_active").cast("double"))
          .as("retention_rate"),
        when(col("prev_active") > 0,
          (col("prev_active") - col("retained")).cast("double")
            / col("prev_active").cast("double")).as("churn_rate"))
      .orderBy("y", "m")
  }

  val monthlyChurnSql: String =
    """WITH cm AS MATERIALIZED (
         SELECT DISTINCT o_custkey AS c,
                CAST(year(o_orderdate) * 12 + month(o_orderdate) - 1
                  AS BIGINT) AS mi
         FROM orders),
       bounds AS (SELECT MIN(mi) AS lo, MAX(mi) AS hi FROM cm),
       spine AS (SELECT UNNEST(generate_series(lo, hi)) AS mi FROM bounds),
       act AS (SELECT mi, CAST(COUNT(*) AS BIGINT) AS active
               FROM cm GROUP BY 1),
       ret AS (SELECT a.mi, CAST(COUNT(*) AS BIGINT) AS retained
               FROM cm a JOIN cm b ON b.c = a.c AND b.mi = a.mi - 1
               GROUP BY 1),
       z AS (SELECT s.mi,
                    COALESCE(act.active, 0) AS active,
                    COALESCE(ret.retained, 0) AS retained,
                    COALESCE(p.active, 0) AS prev_active
             FROM spine s
               LEFT JOIN act ON act.mi = s.mi
               LEFT JOIN ret ON ret.mi = s.mi
               LEFT JOIN act p ON p.mi = s.mi - 1)
       SELECT CAST(mi // 12 AS BIGINT) AS y,
              CAST(mi % 12 + 1 AS BIGINT) AS m,
              active, retained,
              prev_active - retained AS churned,
              CASE WHEN prev_active > 0 THEN
                CAST(retained AS DOUBLE) / CAST(prev_active AS DOUBLE)
              END AS retention_rate,
              CASE WHEN prev_active > 0 THEN
                CAST(prev_active - retained AS DOUBLE)
                  / CAST(prev_active AS DOUBLE)
              END AS churn_rate
       FROM z ORDER BY y, m"""

  /** Order basket-size distribution — "how many items does an order
    * carry" as a histogram with shares ([[q13]] counts ORDERS per
    * customer; this counts ITEMS per order, the fulfillment-cost
    * shape): lineitems per order, then counts-of-counts with the share
    * as one double division against the order total. Scale: one
    * lineitem scan → per-order counts (map-side partial) → a
    * basket-size-bounded rollup. (round 9)
    */
  def basketProfile(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    val per = li.groupBy(col("l_orderkey")).agg(count(lit(1)).as("n_items"))
    val hist = per.groupBy("n_items").agg(count(lit(1)).as("n_orders"))
    val tot = hist.agg(sum(col("n_orders")).as("t"))
    hist.crossJoin(broadcast(tot))
      .select(col("n_items"), col("n_orders"),
        (col("n_orders").cast("double") / col("t").cast("double"))
          .as("share"))
      .orderBy("n_items")
  }

  val basketProfileSql: String =
    """WITH per AS (SELECT l_orderkey, CAST(COUNT(*) AS BIGINT) AS n_items
                    FROM lineitem GROUP BY 1),
       hist AS (SELECT n_items, CAST(COUNT(*) AS BIGINT) AS n_orders
                FROM per GROUP BY 1),
       tot AS (SELECT CAST(SUM(n_orders) AS BIGINT) AS t FROM hist)
       SELECT n_items, n_orders,
              CAST(n_orders AS DOUBLE) / CAST(t AS DOUBLE) AS share
       FROM hist CROSS JOIN tot ORDER BY n_items"""

  /** Month-over-month brand revenue-rank movers — the "what changed
    * this month" leaderboard delta next to [[brandDemandMomentum]]'s
    * fitted slope (a slope smooths over the whole spine; a rank jump
    * names the month it happened): per month, brands rank by exact
    * decimal revenue (rank windows partition per month, revenue
    * tie-broken by brand), then each month joins its predecessor on
    * the brand KEY — delta = prev_rank − rank (positive = climbed).
    * First-month rows carry NULL prev/delta (no fake zeros). Exact
    * integer month index; one lineitem×orders shuffle with the part
    * dim broadcast. Scale: months × brands everywhere after the fact
    * aggregate. (round 9)
    */
  def brandRankMovers(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.Nums._
    val li = Tables.lineitem(s, dir)
      .join(Tables.orders(s, dir)
        .select(col("o_orderkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.part(s, dir)
        .select(col("p_partkey"), col("p_brand"))),
        col("l_partkey") === col("p_partkey"))
      .groupBy((year(col("o_orderdate")) * 12 + month(col("o_orderdate")) - 1)
          .cast("long").as("mi"),
        col("p_brand"))
      .agg(sum(decp(col("l_extendedprice"))
        * decf(lit(1.0) - col("l_discount"))).as("rev"))
    val w = Window.partitionBy(col("mi"))
      .orderBy(col("rev").desc, col("p_brand"))
    val ranked = li.withColumn("rnk", rank().over(w).cast("long"))
      .select(col("mi"), col("p_brand"), col("rnk"),
        col("rev").cast("double").as("rev"))
      .localCheckpoint() // months×brands; joins itself shifted a month
    val prev = ranked.select((col("mi") + 1).as("mi"),
      col("p_brand"), col("rnk").as("prev_rnk"))
    ranked.join(prev, Seq("mi", "p_brand"), "left")
      .select((col("mi") / 12).cast("long").as("y"),
        (col("mi") % 12 + 1).cast("long").as("m"),
        col("p_brand"), col("rnk"), col("rev"), col("prev_rnk"),
        (col("prev_rnk") - col("rnk")).as("rank_delta"))
      .orderBy("y", "m", "rnk", "p_brand")
  }

  val brandRankMoversSql: String = {
    import graft.functions.Nums._
    s"""WITH rev AS (
         SELECT CAST(year(o.o_orderdate) * 12 + month(o.o_orderdate) - 1
                  AS BIGINT) AS mi,
                p.p_brand,
                SUM(${sqlDecp("l.l_extendedprice")}
                  * ${sqlDecf("1.0 - l.l_discount")}) AS rev
         FROM lineitem l
           JOIN orders o ON l.l_orderkey = o.o_orderkey
           JOIN part p ON l.l_partkey = p.p_partkey
         GROUP BY 1, 2),
       ranked AS (
         SELECT mi, p_brand,
                RANK() OVER (PARTITION BY mi
                             ORDER BY rev DESC, p_brand) AS rnk,
                CAST(CAST(rev AS VARCHAR) AS DOUBLE) AS rev
         FROM rev)
       SELECT CAST(a.mi // 12 AS BIGINT) AS y,
              CAST(a.mi % 12 + 1 AS BIGINT) AS m,
              a.p_brand, a.rnk, a.rev,
              b.rnk AS prev_rnk, b.rnk - a.rnk AS rank_delta
       FROM ranked a
         LEFT JOIN ranked b
           ON b.mi = a.mi - 1 AND b.p_brand = a.p_brand
       ORDER BY y, m, a.rnk, a.p_brand"""
  }

  /** Discount-demand slope per brand — "does a deeper discount move
    * more units" as an exact least-squares fit of quantity on discount
    * ([[graft.operators.Stats]]' regression_slope machinery pointed at
    * the price-response question; the slope is the linear
    * demand-response coefficient, the dashboard proxy for elasticity):
    * moments in exact DECIMAL (discount at scale 6, quantity at scale
    * 4 — the widened-operand rule keeps both engines' products in
    * int128), the identical cov/den/vy double tree, NULL fit on a
    * constant-discount brand (the ANSI rule). Scale: one
    * lineitem scan with the part dim broadcast, brand-cardinality
    * moments. (round 9)
    */
  def discountElasticity(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.Nums._
    val t = Tables.lineitem(s, dir)
      .join(broadcast(Tables.part(s, dir)
        .select(col("p_partkey"), col("p_brand"))),
        col("l_partkey") === col("p_partkey"))
      .select(col("p_brand"), decf(col("l_discount")).as("x"),
        decp(col("l_quantity")).as("y"))
    t.groupBy("p_brand")
      .agg(count(lit(1)).as("n"),
        dsum(col("x")).as("sx"), dsum(col("x") * col("x")).as("sxx"),
        dsum(col("y")).as("sy"), dsum(col("x") * col("y")).as("sxy"),
        dsum(col("y") * col("y")).as("syy"))
      .withColumn("nd", col("n").cast("double"))
      .withColumn("cov", col("nd") * col("sxy") - col("sx") * col("sy"))
      .withColumn("den", col("nd") * col("sxx") - col("sx") * col("sx"))
      .withColumn("vy", col("nd") * col("syy") - col("sy") * col("sy"))
      .select(col("p_brand"), col("n"),
        when(col("den") =!= 0.0, col("cov") / col("den")).as("slope"),
        when(col("den") =!= 0.0,
          (col("sy") - (col("cov") / col("den")) * col("sx")) / col("nd"))
          .as("intercept"),
        when(col("den") * col("vy") =!= 0.0,
          (col("cov") * col("cov")) / (col("den") * col("vy"))).as("r2"))
      .orderBy("p_brand")
  }

  val discountElasticitySql: String = {
    import graft.functions.Nums._
    // widened DECIMAL(19,6)/(19,4) operands: the regressionSlopeSql
    // int128 lesson — same numeric values, products stay exact
    s"""WITH t AS (SELECT p.p_brand,
                     ${sqlDecf("l.l_discount")} AS x,
                     ${sqlDecp("l.l_quantity")} AS y,
                     CAST(l.l_discount AS DECIMAL(19,6)) AS xw,
                     CAST(l.l_quantity AS DECIMAL(19,4)) AS yw
                   FROM lineitem l JOIN part p
                     ON l.l_partkey = p.p_partkey),
       m AS (SELECT p_brand, COUNT(*) AS n,
               ${sqlDsum("x")} AS sx,
               ${sqlDsum("xw * xw")} AS sxx,
               ${sqlDsum("y")} AS sy,
               ${sqlDsum("xw * yw")} AS sxy,
               ${sqlDsum("yw * yw")} AS syy
             FROM t GROUP BY p_brand),
       g AS (SELECT p_brand, n, CAST(n AS DOUBLE) AS nd, sx, sy,
               CAST(n AS DOUBLE) * sxy - sx * sy AS cov,
               CAST(n AS DOUBLE) * sxx - sx * sx AS den,
               CAST(n AS DOUBLE) * syy - sy * sy AS vy
             FROM m)
       SELECT p_brand, n,
              CASE WHEN den <> 0 THEN cov / den END AS slope,
              CASE WHEN den <> 0 THEN (sy - (cov / den) * sx) / nd END
                AS intercept,
              CASE WHEN den * vy <> 0 THEN (cov * cov) / (den * vy) END
                AS r2
       FROM g ORDER BY p_brand"""
  }

  /** Kendall's W concordance of the monthly brand rankings (+ the
    * Friedman chi-square it implies) — "do the months AGREE on the
    * brand leaderboard" as one number over [[brandRankMovers]]' rank
    * panel (W near 1: a stable market whose movers are noise; W near
    * 0: leadership genuinely churns — the context every movers
    * dashboard needs): over the brands present in EVERY month (ranks
    * must permute one shared item set), per-month ranks re-ranked
    * within that common set, rank sums R_i exact BIGINT, and
    * 4S = Σ(2R_i − k(n+1))² exact, so W = 3·S4 / (k²(n³−n)) is a
    * single double division; Friedman's chi2 = k(n−1)·W rides along.
    * Rank ties resolve deterministically by brand (the house total-
    * order convention — documented, it perturbs W by at most the tie
    * mass). NULL on n < 2. Scale: months×brands frames throughout.
    * (round 9)
    */
  def kendallWBrands(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.Nums._
    val rev = Tables.lineitem(s, dir)
      .join(Tables.orders(s, dir)
        .select(col("o_orderkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.part(s, dir)
        .select(col("p_partkey"), col("p_brand"))),
        col("l_partkey") === col("p_partkey"))
      .groupBy((year(col("o_orderdate")) * 12 + month(col("o_orderdate")) - 1)
          .cast("long").as("mi"),
        col("p_brand"))
      .agg(sum(decp(col("l_extendedprice"))
        * decf(lit(1.0) - col("l_discount"))).as("rev"))
      .localCheckpoint() // months×brands; feeds month count + ranks
    val mTot = rev.select("mi").distinct().agg(count(lit(1)).as("k"))
    val common = rev.groupBy("p_brand").agg(count(lit(1)).as("nm"))
      .crossJoin(broadcast(mTot))
      .filter(col("nm") === col("k"))
      .select("p_brand")
    val w = Window.partitionBy(col("mi"))
      .orderBy(col("rev").desc, col("p_brand"))
    val ranks = rev.join(broadcast(common), Seq("p_brand"))
      .withColumn("rnk", row_number().over(w).cast("long"))
    kendallWCore(ranks.select("mi", "p_brand", "rnk"))
  }

  /** Core over any (mi, p_brand, rnk) rank-panel frame where each mi
    * ranks the same item set 1..n (spec hand-checks the textbook
    * perfect-agreement and reversal cases). */
  private[operators] def kendallWCore(ranks: DataFrame): DataFrame = {
    val mTot = ranks.select("mi").distinct().agg(count(lit(1)).as("k"))
    val rsums = ranks.groupBy("p_brand")
      .agg(sum(col("rnk")).as("ri"))
    val nTot = rsums.agg(count(lit(1)).as("n"))
    rsums.crossJoin(broadcast(nTot)).crossJoin(broadcast(mTot))
      .agg(max(col("n")).as("n_brands"), max(col("k")).as("k_months"),
        sum((col("ri") * 2 - col("k") * (col("n") + 1))
          .cast("decimal(38,0)")
          * (col("ri") * 2 - col("k") * (col("n") + 1))).as("s4"))
      .select(col("n_brands"), col("k_months"),
        col("s4").cast("long").as("s4"),
        when(col("n_brands") >= 2,
          lit(3.0e0) * col("s4").cast("double")
            / (col("k_months") * col("k_months")).cast("double")
            / (col("n_brands") * col("n_brands") * col("n_brands")
              - col("n_brands")).cast("double")).as("w"))
      .select(col("n_brands"), col("k_months"), col("s4"), col("w"),
        (col("k_months").cast("double") * (col("n_brands") - 1)
          .cast("double") * col("w")).as("friedman_chi2"))
  }

  val kendallWBrandsSql: String = {
    import graft.functions.Nums._
    s"""WITH rev AS MATERIALIZED (
         SELECT CAST(year(o.o_orderdate) * 12 + month(o.o_orderdate) - 1
                  AS BIGINT) AS mi,
                p.p_brand,
                SUM(${sqlDecp("l.l_extendedprice")}
                  * ${sqlDecf("1.0 - l.l_discount")}) AS rev
         FROM lineitem l
           JOIN orders o ON l.l_orderkey = o.o_orderkey
           JOIN part p ON l.l_partkey = p.p_partkey
         GROUP BY 1, 2),
       mt AS (SELECT CAST(COUNT(DISTINCT mi) AS BIGINT) AS k FROM rev),
       common AS (SELECT p_brand FROM rev CROSS JOIN mt
                  GROUP BY p_brand, mt.k
                  HAVING CAST(COUNT(*) AS BIGINT) = MAX(mt.k)),
       ranks AS (SELECT r.mi, r.p_brand,
                   CAST(ROW_NUMBER() OVER (PARTITION BY r.mi
                     ORDER BY r.rev DESC, r.p_brand) AS BIGINT) AS rnk
                 FROM rev r JOIN common c ON r.p_brand = c.p_brand),
       rsums AS (SELECT p_brand, CAST(SUM(rnk) AS BIGINT) AS ri
                 FROM ranks GROUP BY 1),
       nt AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM rsums),
       agg AS (SELECT MAX(nt.n) AS n_brands, MAX(mt.k) AS k_months,
                      CAST(SUM(CAST(ri * 2 - mt.k * (nt.n + 1)
                            AS HUGEINT)
                          * (ri * 2 - mt.k * (nt.n + 1))) AS BIGINT)
                        AS s4
               FROM rsums CROSS JOIN nt CROSS JOIN mt)
       SELECT n_brands, k_months, s4,
              CASE WHEN n_brands >= 2 THEN
                3.0 * CAST(s4 AS DOUBLE)
                  / CAST(k_months * k_months AS DOUBLE)
                  / CAST(n_brands * n_brands * n_brands - n_brands
                      AS DOUBLE)
              END AS w,
              CAST(k_months AS DOUBLE) * CAST(n_brands - 1 AS DOUBLE)
                * (CASE WHEN n_brands >= 2 THEN
                     3.0 * CAST(s4 AS DOUBLE)
                       / CAST(k_months * k_months AS DOUBLE)
                       / CAST(n_brands * n_brands * n_brands - n_brands
                           AS DOUBLE)
                   END) AS friedman_chi2
       FROM agg"""
  }

  def queries: Seq[Q] = Seq(
    Q("q1_agg", Some(q1Sql), bench = true)(q1),
    Q("brand_rank_movers", Some(brandRankMoversSql))(brandRankMovers),
    Q("kendall_w_brands", Some(kendallWBrandsSql))(kendallWBrands),
    Q("discount_elasticity", Some(discountElasticitySql))(discountElasticity),
    Q("big_orders_having", Some(bigOrdersSql))(bigOrders),
    Q("funnel_conversion", Some(funnelConversionSql))(funnelConversion),
    Q("cohort_retention", Some(cohortRetentionSql))(cohortRetention),
    Q("cohort_ltv", Some(cohortLtvSql))(cohortLtv),
    Q("customer_value_migration",
      Some(customerValueMigrationSql))(customerValueMigration),
    Q("brand_affinity_lift", Some(brandAffinityLiftSql), bench = true)(brandAffinityLift),
    Q("q3_top_revenue", Some(q3Sql), bench = true)(q3),
    Q("q5_region_revenue", Some(q5Sql), bench = true)(q5),
    Q("revenue_share", Some(revenueShareSql))(revenueShare),
    Q("q7_volume_shipping", Some(q7Sql))(q7),
    Q("q10_returned_items", Some(q10Sql))(q10),
    Q("q14_promo_share", Some(q14Sql))(q14),
    Q("q19_bracket_revenue", Some(q19Sql))(q19),
    Q("q17_small_quantity_revenue", Some(q17CorrelatedSql))(q17Correlated),
    Q("q21_waiting_supplier", Some(q21WaitingSupplierSql), bench = true)(q21WaitingSupplier),
    Q("q4_priority_returns", Some(q4PriorityReturnsSql))(q4PriorityReturns),
    Q("q13_order_distribution", Some(q13OrderDistributionSql))(q13OrderDistribution),
    Q("q18_large_orders", Some(q18LargeOrdersSql), bench = true)(q18LargeOrders),
    Q("q22_dormant_balance", Some(q22DormantBalanceSql))(q22DormantBalance),
    Q("q6_forecast_revenue", Some(q6Sql))(q6),
    Q("q8_market_share", Some(q8Sql), bench = true)(q8),
    Q("q9_profit_by_nation", Some(q9Sql))(q9),
    Q("q15_top_supplier", Some(q15TopSupplierSql))(q15TopSupplier),
    Q("q2_min_cost_supplier", Some(q2MinCostSupplierSql))(q2MinCostSupplier),
    Q("q12_ship_priority", Some(q12ShipPrioritySql))(q12ShipPriority),
    Q("q11_important_value", Some(q11ImportantValueSql))(q11ImportantValue),
    Q("q16_supplier_part_count", Some(q16SupplierPartCountSql))(q16SupplierPartCount),
    Q("q20_dominant_supplier", Some(q20DominantSupplierSql))(q20DominantSupplier),
    Q("rfm_segments", Some(rfmSegmentsSql))(rfmSegments),
    Q("offers_per_source_month", Some(perSourceMonthSql))(perSourceMonth),
    Q("brand_demand_momentum", Some(brandDemandMomentumSql))(
      brandDemandMomentum),
    Q("company_ranking", Some(companyRankingSql), bench = true)(companyRanking),
    Q("window_running", Some(windowRunningSql), bench = true)(windowRunning),
    Q("rollup_agg", Some(rollupAggSql))(rollupAgg),
    Q("cube_agg", Some(cubeAggSql))(cubeAgg),
    Q("grouping_sets_agg", Some(groupingSetsAggSql))(groupingSetsAgg),
    Q("set_ops_all", Some(setOpsAllSql))(setOpsAll),
    Q("unpivot_metrics", Some(unpivotMetricsSql))(unpivotMetrics),
    Q("group_median", Some(groupMedianSql))(groupMedian),
    Q("skew_salted_counts", Some(skewSaltedCountsSql))(skewSaltedCounts),
    Q("skew_salted_join", Some(skewSaltedJoinSql))(skewSaltedJoin),
    Q("pivot_event_types", Some(pivotEventTypesSql))(pivotEventTypes),
    Q("semi_anti_join", Some(semiAntiJoinSql))(semiAntiJoin),
    Q("set_ops", Some(setOpsSql))(setOps),
    Q("approx_distinct", None)(approxDistinct),
    Q("approx_distinct_sketch_rollup", None)(approxDistinctSketchRollup),
    Q("cms_count_rollup", None)(cmsCountRollup),
    Q("bloom_join_prune", Some(bloomJoinPruneSql))(bloomJoinPrune),
    Q("full_outer_reconcile", Some(fullOuterReconcileSql))(fullOuterReconcile),
    Q("join_size_estimate", None)(joinSizeEstimate),
    Q("hll_intersect_users", None)(hllIntersectUsers),
    Q("abc_classification", Some(abcClassificationSql))(abcClassification),
    Q("monthly_churn", Some(monthlyChurnSql))(monthlyChurn),
    Q("basket_profile", Some(basketProfileSql))(basketProfile))
}
