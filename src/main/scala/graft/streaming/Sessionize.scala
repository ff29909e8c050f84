package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Gap-based sessionization with custom keyed state
  * (`flatMapGroupsWithState`) — the Structured Streaming stateful
  * primitive for semantics windows can't express.
  *
  * A session closes when a user is silent for `gap` — EITHER because a
  * later event of the same user arrives past the gap, OR because the
  * event-time watermark passes `last + gap` (EventTimeTimeout): the
  * final session of a user who goes silent forever IS emitted, and its
  * state is removed, so state size is bounded by live-within-horizon
  * users, not all users ever seen. State per key is O(1) (running
  * interval, not buffered events).
  *
  * Out-of-order arrivals (streaming-only concern; the engine drops
  * events below the watermark before they reach the state function):
  * an event landing inside — or gap-adjacent BELOW — the open session's
  * interval merges into it, extending `start` downward exactly as the
  * batch oracle's global sort would. An in-horizon event more than
  * `gap` older than the open session is a disconnected PAST session,
  * emitted as a singleton (approximation: two such stragglers within
  * `gap` of each other emit as two singletons where the global sort
  * would merge them — bounded by the watermark horizon).
  */
object Sessionize {

  final case class Event(user_id: Long, ts: Timestamp, event_type: String)
  final case class SessionState(start: Long, last: Long, n: Long)
  final case class Session(user_id: Long, start: Timestamp, end: Timestamp,
                           n_events: Long)

  def sessions(spark: SparkSession, events: Dataset[Event], gapMs: Long,
               watermark: String = "30 minutes"): Dataset[Session] = {
    import spark.implicits._
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (userId: Long, batch: Iterator[Event], state: GroupState[SessionState]) => {
          if (state.hasTimedOut) {
            // watermark passed last + gap: the user went silent — emit
            // the final session and evict the key
            val s = state.get
            state.remove()
            Iterator.single(
              Session(userId, new Timestamp(s.start), new Timestamp(s.last), s.n))
          } else {
            val sorted = batch.toSeq.sortBy(_.ts.getTime)
            var cur = state.getOption
            val closed = Seq.newBuilder[Session]
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t >= s.start - gapMs && t <= s.last + gapMs =>
                  cur = Some(SessionState(math.min(s.start, t), math.max(s.last, t), s.n + 1))
                case Some(s) if t > s.last + gapMs =>
                  closed += Session(userId, new Timestamp(s.start), new Timestamp(s.last), s.n)
                  cur = Some(SessionState(t, t, 1))
                case Some(_) =>
                  // > gap OLDER than the open session: disconnected past
                  // session (see scaladoc)
                  closed += Session(userId, new Timestamp(t), new Timestamp(t), 1L)
                case None =>
                  cur = Some(SessionState(t, t, 1))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.last + gapMs)
            }
            closed.result().iterator
          }
        })
  }

  /** Batch oracle for the same semantics: gap-split via a lag window —
    * used by tests to cross-check the stateful implementation.
    */
  def sessionsBatch(spark: SparkSession, events: Dataset[Event],
                    gapMs: Long): Dataset[Session] = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"))
    events.toDF()
      .withColumn("prev", lag(col("ts"), 1).over(w))
      .withColumn("new_session",
        // unix_millis, not cast("long")*1000: the stateful path compares
        // millisecond getTime values, and a seconds-truncating oracle
        // sessionizes sub-second gaps differently
        when(col("prev").isNull ||
          unix_millis(col("ts")) - unix_millis(col("prev")) > gapMs, 1)
          .otherwise(0))
      .withColumn("session_id", sum(col("new_session")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(min(col("ts")).as("start"), max(col("ts")).as("end"),
        count(lit(1)).as("n_events"))
      .select(col("user_id"), col("start"), col("end"), col("n_events"))
      .as[Session]
  }
}
