package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import EventsStream.Event

/** Event-time sessionization on a live stream — the streaming twin of
  * the batch operator graft.operators.Events.sessionize (30-minute
  * inactivity gap), built on flatMapGroupsWithState with event-time
  * timeouts so sessions close when the WATERMARK passes the gap, not
  * when a processing-time timer fires.
  *
  * State per user is one open session (bounded); closed sessions are
  * emitted downstream and dropped from state — the shape that runs
  * indefinitely on a cluster without state growth.
  */
object SessionStream {

  case class OpenSession(start_epoch: Long, end_epoch: Long, n_events: Long,
                         total_value: Double)

  case class SessionOut(user_id: Long, session_start_epoch: Long,
                        session_end_epoch: Long, n_events: Long,
                        total_value: Double, duration_sec: Long)

  val GapSeconds: Long = 1800L

  /** Sessionize a watermarked event stream. Emits a session when a new
    * event arrives more than [[GapSeconds]] after the open session's end
    * (same rule as the batch operator), or when the event-time timeout
    * fires after the watermark passes the gap.
    */
  def sessionize(events: Dataset[Event]): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "1 hour")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSession, SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, batch: Iterator[Event], state: GroupState[OpenSession]) =>
          if (batch.isEmpty && state.hasTimedOut) {
            // watermark passed: close and emit the open session
            val s = state.get
            state.remove()
            Iterator(SessionOut(userId, s.start_epoch, s.end_epoch, s.n_events,
              s.total_value, s.end_epoch - s.start_epoch))
          } else {
            val sorted = batch.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
            var open = state.getOption
            val closed = Seq.newBuilder[SessionOut]
            sorted.foreach { e =>
              val epoch = e.ts.getTime / 1000
              open match {
                case Some(s) if epoch - s.end_epoch <= GapSeconds =>
                  open = Some(OpenSession(s.start_epoch, epoch,
                    s.n_events + 1, s.total_value + e.value))
                case Some(s) =>
                  closed += SessionOut(userId, s.start_epoch, s.end_epoch,
                    s.n_events, s.total_value, s.end_epoch - s.start_epoch)
                  open = Some(OpenSession(epoch, epoch, 1L, e.value))
                case None =>
                  open = Some(OpenSession(epoch, epoch, 1L, e.value))
              }
            }
            open.foreach { s =>
              state.update(s)
              // close the session once the watermark passes end + gap
              state.setTimeoutTimestamp((s.end_epoch + GapSeconds) * 1000)
            }
            closed.result().iterator
          }
      }
  }

  case class OpenPath(start_epoch: Long, end_epoch: Long, n_events: Long,
                      t1: String, t2: String, t3: String)

  case class PathOut(user_id: Long, session_start_epoch: Long, path: String,
                     n_events: Long)

  /** Streaming twin of the batch entry-path census's per-session stage
    * (graft.operators.Events.sessionPaths): emits one (user, start,
    * "a>b>c" leading path, session length) row per CLOSED session,
    * under the same 30-minute gap rule and watermark-closure mechanics
    * as [[sessionize]]. State per user stays one open session — the
    * first ≤3 event types ride in three fixed fields, so state is
    * bounded regardless of session length. The census itself
    * (groupBy(path)) is a plain downstream aggregation of this stream.
    */
  def sessionPaths(events: Dataset[Event]): Dataset[PathOut] = {
    import events.sparkSession.implicits._
    def close(userId: Long, s: OpenPath): PathOut =
      PathOut(userId, s.start_epoch,
        Seq(s.t1, s.t2, s.t3).filter(_.nonEmpty).mkString(">"), s.n_events)
    events
      .withWatermark("ts", "1 hour")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenPath, PathOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, batch: Iterator[Event], state: GroupState[OpenPath]) =>
          if (batch.isEmpty && state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(close(userId, s))
          } else {
            val sorted = batch.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
            var open = state.getOption
            val closed = Seq.newBuilder[PathOut]
            sorted.foreach { e =>
              val epoch = e.ts.getTime / 1000
              open match {
                case Some(s) if epoch - s.end_epoch <= GapSeconds =>
                  val n = s.n_events + 1
                  open = Some(s.copy(end_epoch = epoch, n_events = n,
                    t2 = if (n == 2) e.event_type else s.t2,
                    t3 = if (n == 3) e.event_type else s.t3))
                case Some(s) =>
                  closed += close(userId, s)
                  open = Some(OpenPath(epoch, epoch, 1L, e.event_type, "", ""))
                case None =>
                  open = Some(OpenPath(epoch, epoch, 1L, e.event_type, "", ""))
              }
            }
            open.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp((s.end_epoch + GapSeconds) * 1000)
            }
            closed.result().iterator
          }
      }
  }

  /** Continuous e09 census: a streaming aggregation stacked on the
    * closed-session path stream — each trigger folds newly closed
    * sessions into the standing per-path counts, so the census is
    * always current without ever re-reading history (update mode emits
    * only the paths a trigger touched; complete mode serves the full
    * snapshot for a dashboard read). The batch operator's
    * `pct_sessions` is intentionally absent — a second global
    * aggregate is not expressible in the same incremental query, and
    * the share is one division the READER does over the snapshot
    * (spec-pinned equal to batch e09 that way).
    *
    * Scale: state is one row per distinct path (≤ |event types|³) plus
    * one open session per user inside [[sessionPaths]] — both bounded
    * regardless of stream length.
    */
  def pathCensus(paths: Dataset[PathOut]): DataFrame = {
    import org.apache.spark.sql.functions._
    // Spark's global-watermark check rejects ANY stateful op downstream
    // of flatMapGroupsWithState because timeout-emitted rows carry event
    // times behind the watermark. That risk is real only when the
    // downstream operator EVICTS by event time (windowed agg, dedup,
    // interval join). This census groups on `path` alone — no event-time
    // predicate anywhere downstream, so a late-emitted session folds
    // into its path's standing count instead of being dropped; the
    // documented escape hatch is the correct call for this topology
    // (and the stream==batch spec pins the equality).
    //
    // SESSION-GLOBAL, deliberately: the checker is consulted when each
    // query STARTS, so the flag must still be off when the caller calls
    // .start() on this frame — it cannot be scoped-and-restored here.
    // Disabling the checker changes NO runtime behavior (topologies it
    // would accept run identically); the cost is that a LATER query in
    // the same session with a genuinely unsafe chained-stateful topology
    // loses the static rejection and must justify its own correctness,
    // as this one and attributionCensusStart's foreachBatch form do.
    paths.sparkSession.conf
      .set("spark.sql.streaming.statefulOperator.checkCorrectness.enabled", "false")
    paths.toDF()
      .groupBy(col("path"))
      .agg(count(lit(1)).as("n_sessions"), sum(col("n_events")).as("sum_events"))
      .select(col("path"), col("n_sessions"),
        (col("sum_events").cast("double") / col("n_sessions")).as("avg_events"))
  }
}
