package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.core.Tables

/** Structured Streaming jobs S1-S4 (SURVEY.md §2b streaming behaviors).
  *
  * Each transform is expressed over an input DataFrame so the SAME code
  * runs in batch (oracle equivalence: replaying `events` as a bounded
  * frame must equal the batch answer) and in streaming (MemoryStream /
  * kinesis-emu source with watermarks). This "one definition, two
  * runners" shape is the Spark-native analog of the reference's single
  * writer stack reused by CLI and library callers.
  */
object Windows {

  /** S1: tumbling 1-hour counts with a 10-minute watermark. */
  def tumblingHourly(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("cnt"),
        sum(col("value").cast(DecimalType(12, 2))).cast(DecimalType(38, 6)).as("sum_value"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
        col("event_type"), col("cnt"), col("sum_value"))

  /** S2: sliding 1-hour window every 15 minutes. */
  def slidingWindow(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour", "15 minutes"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
        col("event_type"), col("cnt"))

  /** S3: per-user session windows with a 30-minute gap. */
  def sessionWindows(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(12, 2))).cast(DecimalType(38, 6)).as("sum_value"))
      .select(
        date_format(col("session_window.start"), "yyyy-MM-dd HH:mm:ss").as("session_start"),
        date_format(col("session_window.end"), "yyyy-MM-dd HH:mm:ss").as("session_end"),
        col("user_id"), col("n_events"), col("sum_value"))

  /** S7: stream-stream inner join — each purchase joined to the same
    * user's clicks in the preceding hour. Both sides carry watermarks
    * and the join has an explicit event-time range, so Spark bounds the
    * join state on both sides (the required shape for an unbounded
    * stream-stream join; without the range constraint state grows
    * forever). Takes the two sides as arguments so batch equivalence
    * (same code over bounded frames) is testable. */
  def clickToPurchase(clicks: DataFrame, purchases: DataFrame): DataFrame = {
    val c = clicks
      .where(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"),
        col("event_id").as("click_id"))
      .withWatermark("c_ts", "10 minutes")
    val p = purchases
      .where(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
        col("event_id").as("purchase_id"), col("value"))
      .withWatermark("p_ts", "10 minutes")
    p.join(c,
      col("p_user") === col("c_user") &&
        col("c_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR") &&
        col("c_ts") <= col("p_ts"))
      .select(col("p_user").as("user_id"),
        date_format(col("p_ts"), "yyyy-MM-dd HH:mm:ss").as("purchase_ts"),
        col("purchase_id"), col("click_id"))
  }

  /** S10: stream-stream LEFT OUTER interval join — clickToPurchase's
    * shape but keeping UNATTRIBUTED purchases: a purchase with no
    * same-user click in the preceding hour emits with a NULL click_id
    * once the watermark proves no match can still arrive. This is the
    * operator class the inner join can't express — null emission is
    * WATERMARK-GATED (matched rows emit immediately; unmatched ones
    * only when state is provably complete), which is why s10 runs the
    * flush protocol while s03 does not.
    *
    * Sentinel discipline (the s02 lesson, join edition): sentinel rows
    * (user_id = −1) must PASS the per-side filters so they reach both
    * withWatermark nodes — a side that filters them out never advances
    * its watermark and the unmatched rows never emit. The two sentinel
    * rows match each other (same user, equal ts ⇒ inside the interval),
    * so they exit as one matched pair excluded downstream by user_id. */
  def clickToPurchaseOuter(clicks: DataFrame, purchases: DataFrame): DataFrame = {
    val c = clicks
      .where(col("event_type") === "click" || col("user_id") === -1L)
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"),
        col("event_id").as("click_id"))
      .withWatermark("c_ts", "10 minutes")
    val p = purchases
      .where(col("event_type") === "purchase" || col("user_id") === -1L)
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
        col("event_id").as("purchase_id"))
      .withWatermark("p_ts", "10 minutes")
    p.join(c,
        col("p_user") === col("c_user") &&
          col("c_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR") &&
          col("c_ts") <= col("p_ts"),
        "left_outer")
      .select(col("p_user").as("user_id"),
        date_format(col("p_ts"), "yyyy-MM-dd HH:mm:ss").as("purchase_ts"),
        col("purchase_id"), col("click_id"))
  }

  /** S17: stream-stream FULL OUTER interval join — s10's construction
    * extended one notch (the round-19 verdict's missing tier): null
    * emission on BOTH sides, so the state-eviction path s10 never
    * touches (the CLICK side's unmatched rows aging out of state once
    * the watermark proves no purchase can still pair with them) is
    * exercised too. A purchase with no same-user click in the
    * preceding hour emits (purchase, NULL click); a click that no
    * purchase consumed within the hour AFTER it emits (NULL purchase,
    * click) — both watermark-gated, so the replay runs the same
    * two-sentinel flush protocol as s10 (the sentinels match each
    * other into one pair excluded downstream by user_id).
    *
    * Scale shape: state on both sides is bounded by the interval
    * condition + watermark exactly as in the inner/left forms — full
    * outer adds no state, only the eviction-time null emission. */
  def clickToPurchaseFullOuter(clicks: DataFrame, purchases: DataFrame): DataFrame = {
    val c = clicks
      .where(col("event_type") === "click" || col("user_id") === -1L)
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"),
        col("event_id").as("click_id"))
      .withWatermark("c_ts", "10 minutes")
    val p = purchases
      .where(col("event_type") === "purchase" || col("user_id") === -1L)
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
        col("event_id").as("purchase_id"))
      .withWatermark("p_ts", "10 minutes")
    p.join(c,
        col("p_user") === col("c_user") &&
          col("c_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR") &&
          col("c_ts") <= col("p_ts"),
        "full_outer")
      .select(
        coalesce(col("p_user"), col("c_user")).as("user_id"),
        date_format(col("p_ts"), "yyyy-MM-dd HH:mm:ss").as("purchase_ts"),
        col("purchase_id"), col("click_id"))
  }

  /** Batch reference answers for the streaming jobs, over the events
    * table (used by tests and the S1/S3 oracle equivalence check). */
  def batchTumbling(s: SparkSession, dir: String): DataFrame =
    tumblingHourly(Tables.events(s, dir))
      .orderBy("window_start", "event_type")

  def batchSessions(s: SparkSession, dir: String): DataFrame =
    sessionWindows(Tables.events(s, dir))
      .orderBy("user_id", "session_start")
}
