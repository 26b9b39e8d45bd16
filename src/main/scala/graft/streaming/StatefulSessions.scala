package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful streaming sessionization via flatMapGroupsWithState — the
  * custom-state Structured Streaming path (SURVEY §2.10). Semantics match
  * the batch window form ([[Streams.sessionize]]): a session closes after
  * `gapSeconds` of inactivity; we emit one row per CLOSED session.
  *
  * State per user is O(1) (current session bounds only) — the shape that
  * holds at 10^9 keys with RocksDB state store on a real cluster.
  */
object StatefulSessions {

  case class Event(user_id: Long, ts_s: Long, event_id: Long)
  case class SessionState(start: Long, last: Long, n: Long)
  case class ClosedSession(user_id: Long, start_s: Long, dur_s: Long,
                           n_events: Long)

  val GapSeconds = 1800L

  def updateState(userId: Long, events: Iterator[Event],
                  state: GroupState[SessionState]): Iterator[ClosedSession] = {
    val sorted = events.toSeq.sortBy(e => (e.ts_s, e.event_id))
    val out = scala.collection.mutable.ArrayBuffer.empty[ClosedSession]
    var cur = state.getOption
    sorted.foreach { e =>
      cur match {
        case Some(s) if e.ts_s - s.last <= GapSeconds =>
          // max(): events sort only WITHIN one micro-batch, so a late event
          // from a later batch may predate s.last — it joins the current
          // session (the trivially-true gap test above is the documented
          // late-data semantic) but must never move the clock backward,
          // else the next gap test misfires and dur_s can go negative
          cur = Some(s.copy(last = math.max(s.last, e.ts_s), n = s.n + 1))
        case Some(s) =>
          out += ClosedSession(userId, s.start, s.last - s.start, s.n)
          cur = Some(SessionState(e.ts_s, e.ts_s, 1))
        case None =>
          cur = Some(SessionState(e.ts_s, e.ts_s, 1))
      }
    }
    cur.foreach(state.update)
    out.iterator
  }

  /** Streaming form: one ClosedSession row per completed session. */
  def run(events: Dataset[Event]): Dataset[ClosedSession] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(updateState)
  }

  /** Batch driver for the same state machine (used by the equivalence
    * spec: closed sessions here must match the batch-window sessionize
    * modulo the still-open trailing session per user). */
  def runBatch(events: Dataset[Event]): Seq[ClosedSession] = {
    val byUser = events.collect().groupBy(_.user_id)
    byUser.toSeq.sortBy(_._1).flatMap { case (uid, evs) =>
      val state = new TestGroupState[SessionState]
      updateState(uid, evs.iterator, state).toSeq
    }
  }

  /** Minimal GroupState for driver-side reuse of the state function (also
    * used by the spec to drive updateState across simulated micro-batches). */
  private[graft] class TestGroupState[S] extends GroupState[S] {
    private var v: Option[S] = None
    override def exists: Boolean = v.isDefined
    override def get: S = v.get
    override def getOption: Option[S] = v
    override def update(newState: S): Unit = v = Some(newState)
    override def remove(): Unit = v = None
    override def hasTimedOut: Boolean = false
    override def setTimeoutDuration(durationMs: Long): Unit = ()
    override def setTimeoutDuration(duration: String): Unit = ()
    override def setTimeoutTimestamp(timestampMs: Long): Unit = ()
    override def setTimeoutTimestamp(timestampMs: Long, additionalDuration: String): Unit = ()
    override def setTimeoutTimestamp(timestamp: java.sql.Date): Unit = ()
    override def setTimeoutTimestamp(timestamp: java.sql.Date, additionalDuration: String): Unit = ()
    override def getCurrentWatermarkMs(): Long = 0L
    override def getCurrentProcessingTimeMs(): Long = 0L
  }
}
