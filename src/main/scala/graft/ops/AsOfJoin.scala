package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.core.Tables._

/** As-of join — an operator Spark lacks natively: for each left row,
  * attach the right row with the greatest right.ts <= left.ts within the
  * same key. Composed from built-ins (preference (a) of the extension
  * ladder): tag both sides, union, and carry right columns forward with
  * `last(..., ignoreNulls)` over a (key, ts) sorted frame.
  *
  * Scale shape: ONE shuffle on the join key + a per-partition sort —
  * exactly the distributed sort-merge an as-of join wants; no range
  * cross-product, no per-row subqueries. Right side must be unique per
  * (key, ts) — dedup upstream (q27 keeps the max order key per day).
  */
object AsOfJoin {

  /** Generic composition. `rightCols` are carried onto each left row.
    *
    * The right columns travel as ONE struct filled by a single
    * `last(ignoreNulls)` window, then get expanded — so every carried
    * value comes from the SAME matched right row. (Filling each column
    * with an independent window would pull a legitimately-NULL right
    * value from an OLDER row, silently mixing rows.) */
  def asof(left: DataFrame, right: DataFrame,
           key: String, leftTs: String, rightTs: String,
           rightCols: Seq[String]): DataFrame = {
    val lCols = left.columns.toSeq
    val rStruct = StructType(rightCols.map(c => right.schema(c)))
    val l = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__tie", lit(1))
      .select(Seq(col(key).as("__key"), col("__ts"), col("__tie")) ++
        lCols.map(col) :+ lit(null).cast(rStruct).as("__r"): _*)
    val r = right
      .withColumn("__ts", col(rightTs))
      .withColumn("__tie", lit(0))
      .select(Seq(col(key).as("__key"), col("__ts"), col("__tie")) ++
        lCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        struct(rightCols.map(col): _*).as("__r"): _*)
    val w = Window.partitionBy("__key")
      .orderBy(col("__ts"), col("__tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = l.unionByName(r)
      .withColumn("__r", last(col("__r"), ignoreNulls = true).over(w))
    val expanded = rightCols.foldLeft(filled) { (df, c) =>
      df.withColumn(c, col("__r").getField(c))
    }
    expanded.where(col("__tie") === 1).drop("__key", "__ts", "__tie", "__r")
  }

  /** q27: every event joined as-of to the user's most recent order
    * (greatest o_orderdate <= ts; ties on a day broken by max order
    * key), aggregated per user. */
  def q27(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d).select(col("user_id"), col("ts"), col("event_id"))
    val ow = Window.partitionBy("o_custkey", "o_orderdate").orderBy(col("o_orderkey").desc)
    val o = orders(s, d)
      .withColumn("rn", row_number().over(ow)).where(col("rn") === 1)
      .select(col("o_custkey"), col("o_orderdate"), col("o_orderkey"), col("o_totalprice"))
    val ev2 = ev.withColumnRenamed("user_id", "k")
    val o2 = o.withColumnRenamed("o_custkey", "k")
    asof(ev2, o2, "k", "ts", "o_orderdate", Seq("o_orderkey", "o_totalprice"))
      .groupBy(col("k").as("user_id"))
      .agg(
        big(count(lit(1))).as("n_events"),
        big(count(col("o_orderkey"))).as("n_matched"),
        money(sum(dec2(col("o_totalprice")))).as("sum_matched_price"),
        big(max(col("o_orderkey"))).as("max_matched_order"))
      .orderBy("user_id")
  }

  val q27Sql: String =
    """WITH r AS (
      |  SELECT o_custkey, o_orderdate, o_orderkey, o_totalprice,
      |    ROW_NUMBER() OVER (PARTITION BY o_custkey, o_orderdate
      |                       ORDER BY o_orderkey DESC) AS rn
      |  FROM orders QUALIFY rn = 1)
      |SELECT user_id,
      |  CAST(COUNT(*) AS BIGINT) AS n_events,
      |  CAST(COUNT(o_orderkey) AS BIGINT) AS n_matched,
      |  CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS sum_matched_price,
      |  CAST(MAX(o_orderkey) AS BIGINT) AS max_matched_order
      |FROM events ASOF LEFT JOIN r
      |  ON events.user_id = r.o_custkey AND events.ts >= r.o_orderdate
      |GROUP BY user_id ORDER BY user_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q27_asof_join" -> q27 _)
  val oracle: Map[String, String] = Map(
    "q27_asof_join" -> q27Sql)
}
