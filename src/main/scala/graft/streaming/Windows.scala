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

  /** Batch reference answers for the streaming jobs, over the events
    * table (used by tests and the S1/S3 oracle equivalence check). */
  def batchTumbling(s: SparkSession, dir: String): DataFrame =
    tumblingHourly(Tables.events(s, dir))
      .orderBy("window_start", "event_type")

  def batchSessions(s: SparkSession, dir: String): DataFrame =
    sessionWindows(Tables.events(s, dir))
      .orderBy("user_id", "session_start")
}
