package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.core.Tables._

/** Relational operator suite Q1-Q10 (SURVEY.md §2b): scans, filters, hash
  * aggregation, every join shape (inner/semi/anti/outer/theta/star/
  * broadcast), rollup/grouping sets.
  *
  * Design rules (apply to every query in this package):
  *  - money math in exact DECIMAL so results are independent of
  *    partial-aggregation order (bit-stable on any cluster size, and
  *    bit-equal to the DuckDB oracle);
  *  - every result fully ordered with integer tie-breakers;
  *  - timestamps stringified (parquet tz-metadata differences otherwise
  *    break value comparison across engines);
  *  - Spark column names == oracle column names.
  *
  * Scale notes: all aggregations are partial-agg friendly (no distinct on
  * high-cardinality keys except where declared); small dims (region,
  * nation, part, supplier) are broadcast explicitly; big-big joins
  * (orders x lineitem) shuffle on the join key only.
  */
object Tpch {

  /** TPC-H Q1-style pricing summary: scan + hash agg, exact decimals. */
  def q01(s: SparkSession, d: String): DataFrame = {
    val l = lineitem(s, d)
      .withColumn("qty", dec2(col("l_quantity")))
      .withColumn("price", dec2(col("l_extendedprice")))
      .withColumn("disc", rat2(col("l_discount")))
      .withColumn("tax", rat2(col("l_tax")))
      .withColumn("one", lit(1).cast(DecimalType(4, 2)))
    l.groupBy("l_returnflag", "l_linestatus")
      .agg(
        money(sum(col("qty"))).as("sum_qty"),
        money(sum(col("price"))).as("sum_base_price"),
        money(sum(col("price") * (col("one") - col("disc")))).as("sum_disc_price"),
        money(sum(col("price") * (col("one") - col("disc")) * (col("one") + col("tax")))).as("sum_charge"),
        (sum(col("qty")).cast(DoubleType) / count(lit(1))).as("avg_qty"),
        (sum(col("price")).cast(DoubleType) / count(lit(1))).as("avg_price"),
        (sum(col("disc")).cast(DoubleType) / count(lit(1))).as("avg_disc"),
        big(count(lit(1))).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  val q01Sql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(CAST(SUM(qty) AS VARCHAR) AS DOUBLE) AS sum_qty,
      |  CAST(CAST(SUM(price) AS VARCHAR) AS DOUBLE) AS sum_base_price,
      |  CAST(CAST(SUM(price*(o-disc)) AS VARCHAR) AS DOUBLE) AS sum_disc_price,
      |  CAST(CAST(SUM(price*(o-disc)*(o+tax)) AS VARCHAR) AS DOUBLE) AS sum_charge,
      |  CAST(CAST(SUM(qty) AS VARCHAR) AS DOUBLE)/COUNT(*) AS avg_qty,
      |  CAST(CAST(SUM(price) AS VARCHAR) AS DOUBLE)/COUNT(*) AS avg_price,
      |  CAST(CAST(SUM(disc) AS VARCHAR) AS DOUBLE)/COUNT(*) AS avg_disc,
      |  CAST(COUNT(*) AS BIGINT) AS count_order
      |FROM (SELECT l_returnflag, l_linestatus,
      |        CAST(l_quantity AS DECIMAL(12,2)) qty,
      |        CAST(l_extendedprice AS DECIMAL(12,2)) price,
      |        CAST(l_discount AS DECIMAL(4,2)) disc,
      |        CAST(l_tax AS DECIMAL(4,2)) tax,
      |        CAST(1 AS DECIMAL(4,2)) o
      |      FROM lineitem)
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** TPC-H Q6-style forecast revenue: filter + global agg. */
  def q02(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .where(col("l_shipdate") >= lit("1996-01-01").cast(TimestampType) &&
        col("l_shipdate") < lit("1997-01-01").cast(TimestampType) &&
        col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
      .agg(
        money(sum(dec2(col("l_extendedprice")) * rat2(col("l_discount")))).as("revenue"),
        big(count(lit(1))).as("n_rows"))

  val q02Sql: String =
    """SELECT
      |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(4,2))) AS VARCHAR) AS DOUBLE) AS revenue,
      |  CAST(COUNT(*) AS BIGINT) AS n_rows
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin

  /** TPC-H Q3-style: 3-way equi join + group + top-k (TakeOrderedAndProject). */
  def q03(s: SparkSession, d: String): DataFrame = {
    val c = customer(s, d).where(col("c_mktsegment") === "BUILDING")
    val o = orders(s, d).where(col("o_orderdate") < lit("1998-01-01").cast(TimestampType))
    val l = lineitem(s, d).where(col("l_shipdate") > lit("1998-01-01").cast(TimestampType))
    c.join(o, col("c_custkey") === col("o_custkey"))
      .join(l, col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderkey"), col("o_orderdate"))
      .agg(money(sum(dec2(col("l_extendedprice")) *
        (lit(1).cast(DecimalType(4, 2)) - rat2(col("l_discount"))))).as("revenue"))
      .select(col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"), col("revenue"))
      .orderBy(col("revenue").desc, col("o_orderkey"))
      .limit(10)
  }

  val q03Sql: String =
    """SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
      |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS VARCHAR) AS DOUBLE) AS revenue
      |FROM customer JOIN orders ON c_custkey = o_custkey
      |  JOIN lineitem ON o_orderkey = l_orderkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      |  AND l_shipdate  > TIMESTAMP '1998-01-01 00:00:00'
      |GROUP BY o_orderkey, o_orderdate
      |ORDER BY revenue DESC, o_orderkey LIMIT 10""".stripMargin

  /** TPC-H Q4-style: EXISTS -> left semi join, count per priority. */
  def q04(s: SparkSession, d: String): DataFrame = {
    val o = orders(s, d)
    val l = lineitem(s, d)
    o.join(l, o("o_orderkey") === l("l_orderkey") && l("l_shipdate") > o("o_orderdate"), "left_semi")
      .groupBy("o_orderpriority")
      .agg(big(count(lit(1))).as("order_count"))
      .orderBy("o_orderpriority")
  }

  val q04Sql: String =
    """SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
      |FROM orders
      |WHERE EXISTS (SELECT 1 FROM lineitem
      |              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** Left anti join: customers with no RECENT orders (nothing after
    * 1997-06-01); 20 smallest keys + total. The date filter keeps the
    * result non-empty at sf0.01 (every customer has SOME order in this
    * corpus, which made the unfiltered form pass vacuously in round 1).
    */
  def q05(s: SparkSession, d: String): DataFrame = {
    val c = customer(s, d)
    val o = orders(s, d)
      .where(col("o_orderdate") >= lit("1997-06-01").cast(TimestampType))
    val missing = c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .select(col("c_custkey"))
    // global count attached via broadcast cross join of a 1-row agg —
    // NOT `count() OVER ()`, which moves every surviving row to a
    // single partition at scale
    val total = missing.agg(big(count(lit(1))).as("total_missing"))
    missing.crossJoin(broadcast(total))
      .orderBy("c_custkey")
      .limit(20)
  }

  val q05Sql: String =
    """SELECT c_custkey, CAST(COUNT(*) OVER () AS BIGINT) AS total_missing
      |FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
      |                  AND o_orderdate >= TIMESTAMP '1997-06-01 00:00:00')
      |ORDER BY c_custkey LIMIT 20""".stripMargin

  /** TPC-H Q5-style star join: revenue per nation for one region.
    * region/nation are broadcast; the orders x lineitem join shuffles on
    * the order key only. */
  def q06(s: SparkSession, d: String): DataFrame = {
    val r = region(s, d).where(col("r_name") === "ASIA")
    val n = nation(s, d)
    val c = customer(s, d)
    val o = orders(s, d)
    val l = lineitem(s, d)
    broadcast(r.join(n, col("r_regionkey") === col("n_regionkey")))
      .join(c, col("n_nationkey") === col("c_nationkey"))
      .join(o, col("c_custkey") === col("o_custkey"))
      .join(l, col("o_orderkey") === col("l_orderkey"))
      .groupBy("n_name")
      .agg(money(sum(dec2(col("l_extendedprice")) *
        (lit(1).cast(DecimalType(4, 2)) - rat2(col("l_discount"))))).as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  val q06Sql: String =
    """SELECT n_name,
      |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS VARCHAR) AS DOUBLE) AS revenue
      |FROM region JOIN nation ON r_regionkey = n_regionkey
      |  JOIN customer ON n_nationkey = c_nationkey
      |  JOIN orders ON c_custkey = o_custkey
      |  JOIN lineitem ON o_orderkey = l_orderkey
      |WHERE r_name = 'ASIA'
      |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin

  /** Broadcast join + agg: per-brand quantities (part is tiny -> broadcast). */
  def q07(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .join(broadcast(part(s, d)), col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand")
      .agg(
        money(sum(dec2(col("l_quantity")))).as("sum_qty"),
        money(sum(dec2(col("l_extendedprice")))).as("sum_price"),
        big(count(lit(1))).as("cnt"))
      .orderBy("p_brand")

  val q07Sql: String =
    """SELECT p_brand,
      |  CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS sum_qty,
      |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS sum_price,
      |  CAST(COUNT(*) AS BIGINT) AS cnt
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |GROUP BY p_brand ORDER BY p_brand""".stripMargin

  /** Left outer join: order count per customer including zero. */
  def q08(s: SparkSession, d: String): DataFrame = {
    val c = customer(s, d)
    val o = orders(s, d)
    c.join(o, c("c_custkey") === o("o_custkey"), "left_outer")
      .groupBy("c_custkey")
      .agg(big(count(col("o_orderkey"))).as("order_cnt"))
      .orderBy(col("order_cnt").desc, col("c_custkey"))
      .limit(20)
  }

  val q08Sql: String =
    """SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS order_cnt
      |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      |GROUP BY c_custkey ORDER BY order_cnt DESC, c_custkey LIMIT 20""".stripMargin

  /** Theta join (equi conjunct + non-equi): suppliers richer than
    * same-nation customers. Equi part hashes; non-equi is a post-filter. */
  def q09(s: SparkSession, d: String): DataFrame = {
    val sup = supplier(s, d)
    val c = customer(s, d)
    sup.join(c, sup("s_nationkey") === c("c_nationkey") && sup("s_acctbal") > c("c_acctbal"))
      .agg(big(count(lit(1))).as("cnt"),
        money(sum(dec2(col("s_acctbal")) - dec2(col("c_acctbal")))).as("sum_gap"))
  }

  val q09Sql: String =
    """SELECT CAST(COUNT(*) AS BIGINT) AS cnt,
      |  CAST(CAST(SUM(CAST(s_acctbal AS DECIMAL(12,2)) - CAST(c_acctbal AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS sum_gap
      |FROM supplier JOIN customer
      |  ON s_nationkey = c_nationkey AND s_acctbal > c_acctbal""".stripMargin

  /** Rollup with GROUPING() flags: customers per (region, nation). */
  def q10(s: SparkSession, d: String): DataFrame =
    region(s, d)
      .join(nation(s, d), col("r_regionkey") === col("n_regionkey"))
      .join(customer(s, d), col("n_nationkey") === col("c_nationkey"))
      .rollup(col("r_name"), col("n_name"))
      .agg(big(count(lit(1))).as("cnt"),
        grouping(col("r_name")).cast(IntegerType).as("g_r"),
        grouping(col("n_name")).cast(IntegerType).as("g_n"))
      .orderBy(col("r_name").asc_nulls_first, col("n_name").asc_nulls_first)

  val q10Sql: String =
    """SELECT r_name, n_name, CAST(COUNT(*) AS BIGINT) AS cnt,
      |  CAST(GROUPING(r_name) AS INTEGER) AS g_r,
      |  CAST(GROUPING(n_name) AS INTEGER) AS g_n
      |FROM region JOIN nation ON r_regionkey = n_regionkey
      |  JOIN customer ON n_nationkey = c_nationkey
      |GROUP BY ROLLUP(r_name, n_name)
      |ORDER BY r_name ASC NULLS FIRST, n_name ASC NULLS FIRST""".stripMargin

  /** Q43: FULL OUTER join — the reconciliation shape (round-19 verdict
    * gap 1): BUILDING-segment customers ⟗ open ('O') orders, so BOTH
    * null-extended sides are populated (customers with no open order,
    * open orders of non-BUILDING customers) and the report classifies
    * every row by match class. Spark picks a shuffled sort-merge
    * full-outer on the equi key — the scale shape (a full outer cannot
    * broadcast: both sides must see unmatched partners, so the shuffle
    * on custkey IS the plan). Skew caveat at 100 TB: AQE's
    * OptimizeSkewedJoin does NOT support FullOuter (it can split a
    * skewed partition only on the side whose rows may be replicated —
    * full outer has no such side), so a genuinely skewed key here
    * needs the decomposition `A ⟗ B == (A left-outer B) UNION ALL
    * (B left-anti A, null-extended)` — both halves ARE
    * AQE-skew-optimizable and together produce exactly the full-outer
    * rows. On this key (custkey vs orders) skew is mild and the
    * native operator is the right default. The aggregation is
    * map-side combinable over the join output. */
  def q43(s: SparkSession, d: String): DataFrame = {
    val c = customer(s, d).where(col("c_mktsegment") === "BUILDING")
    val o = orders(s, d).where(col("o_orderstatus") === "O")
    c.join(o, c("c_custkey") === o("o_custkey"), "full_outer")
      .withColumn("match_class",
        when(col("c_custkey").isNull, "order_only")
          .when(col("o_orderkey").isNull, "customer_only")
          .otherwise("both"))
      .groupBy("match_class")
      .agg(big(count(lit(1))).as("n_rows"),
        big(countDistinct(col("c_custkey"))).as("n_cust"),
        big(countDistinct(col("o_custkey"))).as("n_ord_cust"),
        big(count(col("o_orderkey"))).as("n_orders"),
        money(sum(dec2(col("o_totalprice")))).as("sum_price"))
      .orderBy("match_class")
  }

  val q43Sql: String =
    """SELECT
      |  CASE WHEN c_custkey IS NULL THEN 'order_only'
      |       WHEN o_orderkey IS NULL THEN 'customer_only'
      |       ELSE 'both' END AS match_class,
      |  CAST(COUNT(*) AS BIGINT) AS n_rows,
      |  CAST(COUNT(DISTINCT c_custkey) AS BIGINT) AS n_cust,
      |  CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_ord_cust,
      |  CAST(COUNT(o_orderkey) AS BIGINT) AS n_orders,
      |  CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS sum_price
      |FROM (SELECT * FROM customer WHERE c_mktsegment = 'BUILDING') c
      |FULL JOIN (SELECT * FROM orders WHERE o_orderstatus = 'O') o
      |  ON c_custkey = o_custkey
      |GROUP BY match_class ORDER BY match_class""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q43_full_outer_reconcile" -> q43 _,
    "q01_pricing_summary" -> q01 _,
    "q02_revenue_filter" -> q02 _,
    "q03_topk_revenue_join" -> q03 _,
    "q04_semi_join_exists" -> q04 _,
    "q05_anti_join_no_orders" -> q05 _,
    "q06_star_join_region" -> q06 _,
    "q07_broadcast_brand_agg" -> q07 _,
    "q08_left_outer_order_count" -> q08 _,
    "q09_theta_join_acctbal" -> q09 _,
    "q10_rollup_region_nation" -> q10 _)

  val oracle: Map[String, String] = Map(
    "q43_full_outer_reconcile" -> q43Sql,
    "q01_pricing_summary" -> q01Sql,
    "q02_revenue_filter" -> q02Sql,
    "q03_topk_revenue_join" -> q03Sql,
    "q04_semi_join_exists" -> q04Sql,
    "q05_anti_join_no_orders" -> q05Sql,
    "q06_star_join_region" -> q06Sql,
    "q07_broadcast_brand_agg" -> q07Sql,
    "q08_left_outer_order_count" -> q08Sql,
    "q09_theta_join_acctbal" -> q09Sql,
    "q10_rollup_region_nation" -> q10Sql)
}
