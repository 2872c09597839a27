package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.core.Tables._

/** q28: salted two-phase aggregation — the skew pattern for hot keys.
  *
  * `event_type` has 5 values over the whole corpus; a naive groupBy
  * sends every row for a hot key to ONE reducer. Salting splits each
  * key into 16 sub-keys for the first (heavy) aggregation, then a
  * second (tiny) aggregation folds the salts. Because the sums are
  * exact decimals, the result is bit-identical to the direct
  * aggregation — which is exactly what the DuckDB oracle runs, so the
  * oracle also proves the salting is semantics-preserving.
  */
object Skew {

  val Salts = 16

  def q28(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .withColumn("salt", pmod(col("event_id"), lit(Salts)))
      .groupBy("event_type", "salt")
      .agg(
        count(lit(1)).as("pc"),
        sum(dec2(col("value"))).as("pv"),
        max(col("value")).as("pm"))
      .groupBy("event_type")
      .agg(
        big(sum(col("pc"))).as("cnt"),
        money(sum(col("pv"))).as("sum_value"),
        max(col("pm")).as("max_value"))
      .orderBy("event_type")

  val q28Sql: String =
    """SELECT event_type,
      |  CAST(COUNT(*) AS BIGINT) AS cnt,
      |  CAST(CAST(SUM(CAST(value AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS sum_value,
      |  MAX(value) AS max_value
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** q29: GROUPING SETS through the SQL text entry path (spark.sql over
    * registered views) — mixed grouping combos beyond ROLLUP, exercising
    * the parser/analyzer surface a SQL user of the library hits. */
  def q29(s: SparkSession, d: String): DataFrame = {
    region(s, d).createOrReplaceTempView("region")
    nation(s, d).createOrReplaceTempView("nation")
    customer(s, d).createOrReplaceTempView("customer")
    s.sql(
      """SELECT r_name, c_mktsegment, CAST(COUNT(*) AS BIGINT) AS cnt,
        |  CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS STRING) AS DOUBLE) AS sum_bal,
        |  CAST(GROUPING(r_name) AS INT) AS g_r,
        |  CAST(GROUPING(c_mktsegment) AS INT) AS g_s
        |FROM region JOIN nation ON r_regionkey = n_regionkey
        |  JOIN customer ON n_nationkey = c_nationkey
        |GROUP BY GROUPING SETS ((r_name, c_mktsegment), (r_name), (c_mktsegment), ())
        |ORDER BY r_name ASC NULLS FIRST, c_mktsegment ASC NULLS FIRST""".stripMargin)
  }

  val q29Sql: String =
    """SELECT r_name, c_mktsegment, CAST(COUNT(*) AS BIGINT) AS cnt,
      |  CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS sum_bal,
      |  CAST(GROUPING(r_name) AS INT) AS g_r,
      |  CAST(GROUPING(c_mktsegment) AS INT) AS g_s
      |FROM region JOIN nation ON r_regionkey = n_regionkey
      |  JOIN customer ON n_nationkey = c_nationkey
      |GROUP BY GROUPING SETS ((r_name, c_mktsegment), (r_name), (c_mktsegment), ())
      |ORDER BY r_name ASC NULLS FIRST, c_mktsegment ASC NULLS FIRST""".stripMargin

  /** q30: correlated scalar subqueries — Catalyst decorrelates both
    * into left outer joins + aggregates (one shuffle each), which is
    * the plan a hand-written join would produce; the SQL-text surface
    * stays declarative. */
  def q30(s: SparkSession, d: String): DataFrame = {
    customer(s, d).createOrReplaceTempView("customer")
    orders(s, d).createOrReplaceTempView("orders")
    s.sql(
      """SELECT c_custkey,
        |  CAST((SELECT MAX(CAST(o_totalprice AS DECIMAL(12,2))) FROM orders
        |        WHERE o_custkey = c_custkey) AS DOUBLE) AS max_order,
        |  CAST((SELECT COUNT(*) FROM orders
        |        WHERE o_custkey = c_custkey) AS BIGINT) AS n_orders
        |FROM customer ORDER BY c_custkey LIMIT 100""".stripMargin)
  }

  val q30Sql: String =
    """SELECT c_custkey,
      |  CAST((SELECT MAX(CAST(o_totalprice AS DECIMAL(12,2))) FROM orders
      |        WHERE o_custkey = c_custkey) AS DOUBLE) AS max_order,
      |  CAST((SELECT COUNT(*) FROM orders
      |        WHERE o_custkey = c_custkey) AS BIGINT) AS n_orders
      |FROM customer ORDER BY c_custkey LIMIT 100""".stripMargin

  /** q34: CUBE — completes the grouping family (ROLLUP q10, GROUPING
    * SETS q29): all 2^2 subtotal combinations over (event_type, lang of
    * the user's region? no — keep single-table) (event_type, weekday).
    * Spark expands CUBE the same way as grouping sets: one Expand + one
    * hash agg, one shuffle. */
  def q34(s: SparkSession, d: String): DataFrame =
    events(s, d)
      // ISO weekday as an integer (1=Mon..7=Sun): locale-proof, unlike
      // day NAMES (date_format "E" depends on the JVM locale)
      .withColumn("weekday", (weekday(col("ts")) + lit(1)).cast(LongType))
      .cube(col("event_type"), col("weekday"))
      .agg(
        big(count(lit(1))).as("cnt"),
        grouping(col("event_type")).cast(IntegerType).as("g_t"),
        grouping(col("weekday")).cast(IntegerType).as("g_w"))
      .orderBy(col("event_type").asc_nulls_first, col("weekday").asc_nulls_first)

  val q34Sql: String =
    """SELECT event_type, weekday, CAST(COUNT(*) AS BIGINT) AS cnt,
      |  CAST(GROUPING(event_type) AS INTEGER) AS g_t,
      |  CAST(GROUPING(weekday) AS INTEGER) AS g_w
      |FROM (SELECT event_type, CAST(isodow(ts) AS BIGINT) AS weekday FROM events)
      |GROUP BY CUBE(event_type, weekday)
      |ORDER BY event_type ASC NULLS FIRST, weekday ASC NULLS FIRST""".stripMargin

  /** q42: arbitrary grouping sets through the DATAFRAME API —
    * `Dataset.groupingSets` (new in Spark 4), the typed-pipeline
    * counterpart of q29's SQL-text GROUPING SETS: two INDEPENDENT
    * single-column breakdowns plus the grand total in one pass, a
    * combination rollup (q10) and cube (q34) cannot express without
    * adding cross combinations. Spark plans all three sets as one
    * Expand + hash aggregate (one scan of orders, no self-union);
    * GROUPING() flags disambiguate the NULL-keyed rows exactly as in
    * q34. Decimal-exact sum, cast to double only at the output edge. */
  def q42(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .withColumn("price", dec2(col("o_totalprice")))
      .groupingSets(
        Seq(Seq(col("o_orderpriority")), Seq(col("o_orderstatus")), Seq.empty),
        col("o_orderpriority"), col("o_orderstatus"))
      .agg(
        big(count(lit(1))).as("n_orders"),
        money(sum(col("price"))).as("total_price"),
        grouping(col("o_orderpriority")).cast(IntegerType).as("g_p"),
        grouping(col("o_orderstatus")).cast(IntegerType).as("g_s"))
      .orderBy(col("o_orderpriority").asc_nulls_first,
        col("o_orderstatus").asc_nulls_first)

  val q42Sql: String =
    """SELECT o_orderpriority, o_orderstatus,
      |  CAST(COUNT(*) AS BIGINT) AS n_orders,
      |  CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS total_price,
      |  CAST(GROUPING(o_orderpriority) AS INTEGER) AS g_p,
      |  CAST(GROUPING(o_orderstatus) AS INTEGER) AS g_s
      |FROM orders
      |GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())
      |ORDER BY o_orderpriority ASC NULLS FIRST, o_orderstatus ASC NULLS FIRST""".stripMargin

  /** q35: discrete percentiles (PERCENTILE_DISC) — median and p90
    * account balance per market segment. Discrete percentiles return an
    * ACTUAL data value (no interpolation arithmetic), so the oracle is
    * exact as long as both engines pick by the same rank rule. */
  def q35(s: SparkSession, d: String): DataFrame = {
    customer(s, d).createOrReplaceTempView("customer")
    s.sql(
      """SELECT c_mktsegment,
        |  PERCENTILE_DISC(0.5) WITHIN GROUP (ORDER BY c_acctbal) AS p50_bal,
        |  PERCENTILE_DISC(0.9) WITHIN GROUP (ORDER BY c_acctbal) AS p90_bal,
        |  CAST(COUNT(*) AS BIGINT) AS cnt
        |FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin)
  }

  val q35Sql: String =
    """SELECT c_mktsegment,
      |  quantile_disc(c_acctbal, 0.5) AS p50_bal,
      |  quantile_disc(c_acctbal, 0.9) AS p90_bal,
      |  CAST(COUNT(*) AS BIGINT) AS cnt
      |FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  /** q40: RECURSIVE CTE — the hierarchy/graph-walk surface (Spark 4
    * supports `WITH RECURSIVE` with UNION ALL). Customers form an
    * implicit binary-heap org tree (parent(k) = k DIV 2, root = 1); the
    * recursion walks every customer's ancestor chain to the root —
    * per-row depth is DATA-DRIVEN (the chain terminates when it reaches
    * key 1), not precomputed. Report: per depth, population and exact
    * decimal balance sum. The walk is acyclic by construction (keys
    * strictly halve), so UNION ALL recursion terminates — Spark does
    * not yet support UNION-dedup recursion, which rules out cyclic
    * graph walks (those go through the d07 connectedComponents
    * operator instead; its DuckDB oracle is exactly such a recursive
    * closure). Work is Σ depth(k) ≈ n·log₂(n) rows of (key, cur)
    * pairs — each recursion step is one self-join the optimizer plans
    * as a hash join, the same shape at any scale. */
  def q40(s: SparkSession, d: String): DataFrame = {
    customer(s, d).createOrReplaceTempView("customer")
    s.sql(
      """WITH RECURSIVE anc(k, cur, d) AS (
        |  SELECT c_custkey, c_custkey, 0 FROM customer
        |  UNION ALL
        |  SELECT a.k, a.cur DIV 2, a.d + 1 FROM anc a WHERE a.cur > 1)
        |SELECT depth, CAST(COUNT(*) AS BIGINT) AS n_customers,
        |  CAST(CAST(SUM(bal) AS STRING) AS DOUBLE) AS sum_bal
        |FROM (
        |  SELECT a.k, MAX(a.d) AS depth,
        |    MAX(CAST(c.c_acctbal AS DECIMAL(12,2))) AS bal
        |  FROM anc a JOIN customer c ON c.c_custkey = a.k
        |  GROUP BY a.k)
        |GROUP BY depth ORDER BY depth""".stripMargin)
  }

  val q40Sql: String =
    """WITH RECURSIVE anc(k, cur, d) AS (
      |  SELECT c_custkey, c_custkey, 0 FROM customer
      |  UNION ALL
      |  SELECT a.k, a.cur // 2, a.d + 1 FROM anc a WHERE a.cur > 1)
      |SELECT depth, CAST(COUNT(*) AS BIGINT) AS n_customers,
      |  CAST(CAST(SUM(bal) AS VARCHAR) AS DOUBLE) AS sum_bal
      |FROM (
      |  SELECT a.k, MAX(a.d) AS depth,
      |    MAX(CAST(c.c_acctbal AS DECIMAL(12,2))) AS bal
      |  FROM anc a JOIN customer c ON c.c_custkey = a.k
      |  GROUP BY a.k)
      |GROUP BY depth ORDER BY depth""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q28_skew_salted_agg" -> q28 _,
    "q29_grouping_sets" -> q29 _,
    "q30_correlated_subquery" -> q30 _,
    "q34_cube_weekday" -> q34 _,
    "q42_grouping_sets" -> q42 _,
    "q35_percentile_disc" -> q35 _,
    "q40_recursive_hierarchy" -> q40 _)
  val oracle: Map[String, String] = Map(
    "q28_skew_salted_agg" -> q28Sql,
    "q29_grouping_sets" -> q29Sql,
    "q30_correlated_subquery" -> q30Sql,
    "q34_cube_weekday" -> q34Sql,
    "q42_grouping_sets" -> q42Sql,
    "q35_percentile_disc" -> q35Sql,
    "q40_recursive_hierarchy" -> q40Sql)
}
