package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.core.Tables._

/** q38/q39: batch sessionization (gaps-and-islands) and lateral top-n —
  * the two classic "beyond plain groupBy" relational shapes the
  * reference's users would expect from an analytics engine.
  *
  * q38 is the BATCH counterpart of the streaming sessionizer
  * (graft.streaming.Sessionize): same 30-minute-gap semantics, expressed
  * as two windows (lag to mark session starts, running sum to number
  * them) — one shuffle on user_id, everything else window-local. At
  * 100 TB this is the canonical sessionize plan: a single hash exchange
  * on the session key followed by in-partition sorts; no self-join, no
  * iteration.
  *
  * q39 exercises the LATERAL correlated-subquery surface (Spark
  * decorrelates it into a ranked window join — the same plan a
  * hand-written row_number() would give, but the user-facing SQL stays
  * the natural "top 3 per row" formulation).
  */
object Sessions {

  /** session gap: a new session starts after 30 minutes of inactivity. */
  val SessionGapUs: Long = 30L * 60 * 1000 * 1000

  def q38(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events(s, d)
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(w))
      // >= boundary: an event exactly GAP after its predecessor opens a
      // NEW session — the same convention as Spark's session_window
      // ([start, last+gap)) and graft.streaming.Sessionize, so the three
      // session paths are equivalence-testable against each other
      .withColumn("new_sess",
        when(col("prev_us").isNull ||
          unix_micros(col("ts")) - col("prev_us") >= SessionGapUs, 1L).otherwise(0L))
      .withColumn("session_idx", sum(col("new_sess")).over(run))
      .groupBy(col("user_id"), col("session_idx"))
      .agg(
        big(count(lit(1))).as("n_events"),
        date_format(min(col("ts")), "yyyy-MM-dd HH:mm:ss").as("start_ts"),
        (unix_micros(max(col("ts"))) - unix_micros(min(col("ts")))).as("dur_us"))
      .orderBy("user_id", "session_idx")
  }

  val q38Sql: String =
    s"""WITH g AS (
      |  SELECT user_id, event_id, ts,
      |    CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
      |      OR epoch_us(ts) - lag(epoch_us(ts)) OVER w >= ${SessionGapUs}
      |    THEN 1 ELSE 0 END AS new_sess
      |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |se AS (
      |  SELECT user_id, ts,
      |    SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_idx
      |  FROM g)
      |SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
      |  CAST(COUNT(*) AS BIGINT) AS n_events,
      |  strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS start_ts,
      |  CAST(epoch_us(MAX(ts)) - epoch_us(MIN(ts)) AS BIGINT) AS dur_us
      |FROM se GROUP BY user_id, session_idx
      |ORDER BY user_id, session_idx""".stripMargin

  /** q39: top-3 suppliers per nation through a correlated LATERAL
    * subquery — SQL-text surface; no arithmetic, so raw doubles pass
    * through both engines untouched. */
  def q39(s: SparkSession, d: String): DataFrame = {
    nation(s, d).createOrReplaceTempView("nation")
    supplier(s, d).createOrReplaceTempView("supplier")
    s.sql(
      """SELECT n_name, t.s_name, t.s_acctbal
        |FROM nation JOIN LATERAL (
        |  SELECT s_name, s_acctbal FROM supplier
        |  WHERE s_nationkey = n_nationkey
        |  ORDER BY s_acctbal DESC, s_suppkey LIMIT 3) t
        |ORDER BY n_name, s_acctbal DESC, s_name""".stripMargin)
  }

  val q39Sql: String =
    """SELECT n_name, t.s_name, t.s_acctbal
      |FROM nation, LATERAL (
      |  SELECT s_name, s_acctbal FROM supplier
      |  WHERE s_nationkey = n_nationkey
      |  ORDER BY s_acctbal DESC, s_suppkey LIMIT 3) t
      |ORDER BY n_name, s_acctbal DESC, s_name""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q38_sessionize_batch" -> q38 _,
    "q39_lateral_topn" -> q39 _)

  val oracle: Map[String, String] = Map(
    "q38_sessionize_batch" -> q38Sql,
    "q39_lateral_topn" -> q39Sql)
}
