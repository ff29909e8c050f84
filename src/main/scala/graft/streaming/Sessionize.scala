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
  * batch oracle's global sort would. In-horizon events more than `gap`
  * older than the open session form a disconnected PAST chain: within a
  * batch they merge with each other exactly as the oracle's global sort
  * would (consecutive-straggler merge), and at batch end the chain
  * merges into the open session iff pairwise-adjacent to its (possibly
  * downward-extended) start — sound because sorted processing puts all
  * stragglers before any open-session event, so the final start/last
  * values are the ones the oracle compares. The residual approximation
  * is cross-BATCH only: a straggler chain is emitted at batch end, so a
  * straggler in a LATER batch within `gap` of it emits separately where
  * the global sort would merge — bounded by the watermark horizon.
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
            // disconnected-PAST chain accumulator (see scaladoc): sorted
            // processing guarantees every straggler precedes every
            // open-session event, so chain-internal merges here and ONE
            // adjacency check against the final open interval reproduce
            // the batch oracle exactly within a batch
            var past: Option[SessionState] = None
            val closed = Seq.newBuilder[Session]
            def emitPast(): Unit = { past.foreach { p =>
              closed += Session(userId, new Timestamp(p.start), new Timestamp(p.last), p.n)
            }; past = None }
            // merge the past chain into interval `s` iff pairwise-adjacent
            // (oracle compares the chain's max against the interval's min)
            def absorbPast(s: SessionState): SessionState = past match {
              case Some(p) if s.start - p.last <= gapMs =>
                past = None; SessionState(p.start, s.last, s.n + p.n)
              case _ => emitPast(); s
            }
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t >= s.start - gapMs && t <= s.last + gapMs =>
                  cur = Some(SessionState(math.min(s.start, t), math.max(s.last, t), s.n + 1))
                case Some(s) if t > s.last + gapMs =>
                  val full = absorbPast(s)
                  closed += Session(userId, new Timestamp(full.start), new Timestamp(full.last), full.n)
                  cur = Some(SessionState(t, t, 1))
                case Some(_) =>
                  past match {
                    case Some(p) if t <= p.last + gapMs =>
                      past = Some(SessionState(p.start, t, p.n + 1))
                    case _ =>
                      emitPast()
                      past = Some(SessionState(t, t, 1))
                  }
                case None =>
                  cur = Some(SessionState(t, t, 1))
              }
            }
            cur = cur.map(absorbPast)
            emitPast() // chain not adjacent to the open session (or no open session)
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
