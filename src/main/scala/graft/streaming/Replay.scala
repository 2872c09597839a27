package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

/** s01: the streaming GOLDEN-REPLAY driver entry — the one correctness
  * row that exercises the real Structured Streaming engine end-to-end
  * (file stream source -> watermark -> flatMapGroupsWithState session
  * state -> event-time timeout -> file sink) and lands in the SAME
  * DuckDB-checked gate as every batch query. Until round 6 the
  * streaming surface was only spec-certified (stream == batch
  * equivalence in ScalaTest); this entry makes the driver's hard signal
  * cover it: events.parquet is replayed through
  * [[graft.streaming.Sessionize]] and the emitted sessions are shaped
  * into q38's exact output schema, so q38's oracle SQL checks the
  * streaming path row-for-row.
  *
  * Replay mechanics (deterministic, fully distributed — no driver-side
  * data):
  *  1. a one-row SENTINEL event (user_id = -1, ts = max corpus ts +
  *     100 days, written by a Spark job) is published to a side
  *     directory; the events stream is unioned with a stream over it;
  *  2. run 1 (Trigger.AvailableNow) ingests all event files + the
  *     sentinel; every session CLOSED by a gap inside the data is
  *     emitted by the state function; the sentinel pushes the
  *     watermark far past every real event;
  *  3. run 2 (same checkpoint) publishes a second, later sentinel:
  *     its batch starts with the advanced watermark, so every still-
  *     open session times out and is emitted. Two runs bound the
  *     replay regardless of whether the engine schedules a no-data
  *     micro-batch after run 1 — relying on that would be a race.
  *  4. the sink parquet is then read back, sentinel sessions filtered,
  *     and sessions numbered per user in start order — q38's schema.
  *
  * Semantics equivalence: Sessionize's `t - last >= gap` NEW-session
  * boundary is the same >=-gap convention as q38 and session_window
  * (Round6OpsSpec proves the three-way batch equivalence); replay adds
  * the streaming engine itself to the chain. The single AvailableNow
  * data batch sees each user's events as one sorted group, so
  * cross-batch out-of-order hazards (a real concern for an unbounded
  * deployment, handled there by the watermark contract) cannot split
  * the replay's sessions.
  */
object Replay {

  /** raw schema of events.parquet: ts is parquet TIMESTAMP(NANOS),
    * which Spark 4 reads only as BIGINT epoch-nanos (see Tables.events
    * — same nanosAsLong contract, needed explicitly here because a
    * stream source cannot infer schema). */
  private val rawEventsSchema = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  private def sweepOldRuns(root: java.io.File): Unit = {
    val cutoff = System.currentTimeMillis() - 6L * 60 * 60 * 1000
    Option(root.listFiles()).getOrElse(Array.empty).foreach { f =>
      if (f.isDirectory && f.lastModified() < cutoff) {
        def rm(x: java.io.File): Unit = {
          Option(x.listFiles()).getOrElse(Array.empty).foreach(rm)
          x.delete()
        }
        rm(f)
      }
    }
  }

  def s01(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val rootDir = new java.io.File("/tmp/graft_s01")
    rootDir.mkdirs()
    sweepOldRuns(rootDir)
    val run = s"${java.lang.ProcessHandle.current.pid}-${System.nanoTime}"
    val base = s"/tmp/graft_s01/$run"
    val sentinelDir = s"$base/sentinel"
    val outDir = s"$base/out"
    val ckDir = s"$base/ck"

    // sentinel publisher: a Spark job (no driver-side rows) deriving
    // "far past every event" from the corpus itself
    def publishSentinel(offsetUs: Long): Unit =
      graft.core.Tables.events(s, d)
        .agg(max(unix_micros(col("ts"))).as("m"))
        .select(
          lit(-1L).as("event_id"),
          // empty corpus: max(ts) is NULL -> anchor the sentinel at the
          // epoch so the replay still runs (and emits nothing)
          expr(s"timestamp_micros(coalesce(m, 0) + $offsetUs)").as("ts"),
          lit(-1L).as("user_id"),
          lit("sentinel").as("event_type"),
          lit(0.0).as("value"),
          lit("").as("props"))
        .write.mode("append").parquet(sentinelDir)

    publishSentinel(100L * 24 * 3600 * 1000000)

    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // events.parquet is a single FILE; a bare file path fails the file
    // stream source's "basePath must be a directory" check, so match it
    // with a one-file glob — basePath then resolves to the parent dir
    val evStream = s.readStream.schema(rawEventsSchema)
      .parquet(s"$d/[e]vents.parquet")
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    val sentSchema = StructType(rawEventsSchema.map(f =>
      if (f.name == "ts") StructField("ts", TimestampType) else f))
    val sentStream = s.readStream.schema(sentSchema).parquet(sentinelDir)
    val unioned = evStream.select(col("user_id"), col("ts"), col("value"))
      .unionByName(sentStream.select(col("user_id"), col("ts"), col("value")))
      .as[Sessionize.SessEvent]

    val sessions = Sessionize.sessions(unioned).filter(_.user_id >= 0)

    def runOnce(): Unit = {
      val q = sessions.toDF().writeStream
        .format("parquet")
        .option("path", outDir)
        .option("checkpointLocation", ckDir)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    runOnce()                                      // data + sentinel 1
    publishSentinel(200L * 24 * 3600 * 1000000)
    runOnce()                                      // flush: time out open state

    val w = Window.partitionBy("user_id").orderBy("session_start")
    s.read.parquet(outDir)
      .withColumn("session_idx", row_number().over(w).cast(LongType))
      .select(col("user_id"), col("session_idx"),
        col("n_events").cast(LongType).as("n_events"),
        date_format(col("session_start"), "yyyy-MM-dd HH:mm:ss").as("start_ts"),
        (unix_micros(col("session_end")) - Sessionize.GapUs -
          unix_micros(col("session_start"))).as("dur_us"))
      .orderBy("user_id", "session_idx")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s01_stream_sessionize" -> s01 _)

  /** the streaming replay must equal the BATCH sessionization exactly —
    * q38's oracle IS s01's oracle. */
  val oracle: Map[String, String] = Map(
    "s01_stream_sessionize" -> graft.queries.Sessions.q38Sql)
}
