package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom sessionization via flatMapGroupsWithState — the stateful
  * API path for session semantics Spark's built-in session_window can't
  * express (per-session custom payloads, early emission, side state).
  * Here it reproduces exactly the 30-minute-gap session_window
  * semantics so the two paths can be equivalence-tested against each
  * other (StreamingSpec).
  *
  * State per user: the open session (start, lastTs, count, sum). An
  * event within `gap` of lastTs extends the session; otherwise the
  * closed session is emitted and a new one opens. In streaming mode,
  * event-time timeout closes idle sessions at the watermark.
  */
object Sessionize {

  val GapUs: Long = 30L * 60 * 1000 * 1000

  private def toMicros(t: Timestamp): Long =
    (t.getTime / 1000) * 1000000L + t.getNanos / 1000
  private def fromMicros(us: Long): Timestamp = {
    val t = new Timestamp(us / 1000)
    t.setNanos(((us % 1000000L) * 1000).toInt)
    t
  }

  final case class SessEvent(user_id: Long, ts: Timestamp, value: Double)
  final case class SessState(start: Long, last: Long, n: Long, sum: Double)
  final case class Session(user_id: Long, session_start: Timestamp,
                           session_end: Timestamp, n_events: Long, sum_value: Double)

  private def emit(userId: Long, st: SessState): Session =
    Session(userId, fromMicros(st.start), fromMicros(st.last + GapUs), st.n, st.sum)

  def fn(userId: Long, events: Iterator[SessEvent],
         state: GroupState[SessState]): Iterator[Session] = {
    if (state.hasTimedOut) {
      val out = state.getOption.map(emit(userId, _)).iterator
      state.remove()
      return out
    }
    val sorted = events.toSeq.sortBy(e => (toMicros(e.ts), e.value))
    var closed = List.empty[Session]
    var cur = state.getOption
    sorted.foreach { e =>
      val t = toMicros(e.ts)
      cur match {
        case Some(st) if t < st.last + GapUs =>
          cur = Some(SessState(st.start, math.max(st.last, t), st.n + 1, st.sum + e.value))
        case Some(st) =>
          closed ::= emit(userId, st)
          cur = Some(SessState(t, t, 1, e.value))
        case None =>
          cur = Some(SessState(t, t, 1, e.value))
      }
    }
    cur match {
      case Some(st) =>
        state.update(st)
        state.setTimeoutTimestamp(st.last / 1000 + GapUs / 1000)
      case None => ()
    }
    closed.reverse.iterator
  }

  /** streaming form: append-mode sessions closed by event-time timeout. */
  def sessions(events: Dataset[SessEvent]): Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "10 minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessState, Session](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(fn)
  }

  /** batch reference: same semantics via session_window, for the
    * equivalence test (value sums kept in double; the test compares
    * rounded). */
  def batchSessions(s: SparkSession, dir: String): DataFrame =
    graft.core.Tables.events(s, dir)
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
      .select(col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("user_id"), col("n_events"), col("sum_value"))
}
