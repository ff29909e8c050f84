package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Gap-based sessionization with custom keyed state
  * (`flatMapGroupsWithState`) — the Structured Streaming stateful
  * primitive for semantics windows can't express.
  *
  * A session closes when a user is silent for `gap`; the emitted row
  * carries the session bounds and event count. State per key is O(1)
  * (running aggregate, not buffered events), so state size is bounded by
  * the number of live users — the property that keeps this viable on an
  * unbounded stream.
  */
object Sessionize {

  final case class Event(user_id: Long, ts: Timestamp, event_type: String)
  final case class SessionState(start: Long, last: Long, n: Long)
  final case class Session(user_id: Long, start: Timestamp, end: Timestamp,
                           n_events: Long)

  def sessions(spark: SparkSession, events: Dataset[Event],
               gapMs: Long): Dataset[Session] = {
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (userId: Long, batch: Iterator[Event], state: GroupState[SessionState]) => {
          val sorted = batch.toSeq.sortBy(_.ts.getTime)
          var cur = state.getOption
          val closed = Seq.newBuilder[Session]
          sorted.foreach { e =>
            val t = e.ts.getTime
            cur match {
              case Some(s) if t - s.last <= gapMs =>
                cur = Some(s.copy(last = math.max(s.last, t), n = s.n + 1))
              case Some(s) =>
                closed += Session(userId, new Timestamp(s.start), new Timestamp(s.last), s.n)
                cur = Some(SessionState(t, t, 1))
              case None =>
                cur = Some(SessionState(t, t, 1))
            }
          }
          cur.foreach(state.update)
          closed.result().iterator
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
