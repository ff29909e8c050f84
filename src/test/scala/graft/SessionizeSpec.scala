package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import graft.streaming.Sessionize
import graft.streaming.Sessionize.{Event, Session}

class SessionizeSpec extends SparkSpecBase {
  import spark.implicits._

  def ts(m: Int): Timestamp = new Timestamp(1767225600000L + m * 60000L)

  val events = Seq(
    Event(1L, ts(0), "click"), Event(1L, ts(1), "view"),   // session A (user 1)
    Event(1L, ts(30), "click"),                            // session B after 29m gap
    Event(2L, ts(5), "view"))                              // session (user 2, stays open)

  test("flatMapGroupsWithState closes sessions on gap; silence closes the rest via timeout") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = Sessionize.sessions(spark, mem.toDS(), gapMs = 10 * 60000L)
      .writeStream.format("memory").queryName("sessions")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    mem.addData(events: _*)
    q.processAllAvailable()
    val closed = spark.table("sessions").as[Session].collect()
    // only user 1's first session closed (gap exceeded); the rest are live state
    assert(closed.toSeq == Seq(Session(1L, ts(0), ts(1), 2)))
    // a far-future event advances the watermark past every open
    // session's last + gap: the EventTimeTimeout emits them and evicts
    // their state — the "final session of a silent user" guarantee
    mem.addData(Event(3L, ts(24 * 60), "tick"))
    q.processAllAvailable()
    val all = spark.table("sessions").as[Session].collect().toSet
    q.stop()
    assert(all == Set(
      Session(1L, ts(0), ts(1), 2),
      Session(1L, ts(30), ts(30), 1),
      Session(2L, ts(5), ts(5), 1)))
  }

  test("in-horizon out-of-order event merges downward into the open session") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = Sessionize.sessions(spark, mem.toDS(), gapMs = 10 * 60000L,
        watermark = "2 hours")
      .writeStream.format("memory").queryName("sessions_ooo")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    mem.addData(Event(7L, ts(60), "a"))
    q.processAllAvailable()
    // ts(55) arrives in a LATER batch but is gap-adjacent below the open
    // [60, 60] session: it must extend start to 55, as the batch
    // oracle's global sort would
    mem.addData(Event(7L, ts(55), "b"))
    q.processAllAvailable()
    // close it via watermark and read the merged bounds
    mem.addData(Event(8L, ts(5 * 60), "tick"))
    q.processAllAvailable()
    val got = spark.table("sessions_ooo").as[Session].collect().toSet
    q.stop()
    assert(got.contains(Session(7L, ts(55), ts(60), 2)),
      s"late in-horizon event must merge downward, got $got")
  }

  test("disconnected-past stragglers merge: with each other, and into an adjacent open session") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = Sessionize.sessions(spark, mem.toDS(), gapMs = 10 * 60000L,
        watermark = "6 hours")
      .writeStream.format("memory").queryName("sessions_stragglers")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    // open session for user 11 at [120, 120]
    mem.addData(Event(11L, ts(120), "a"))
    q.processAllAvailable()
    // ONE later batch carrying two disconnected-past stragglers within
    // gap of each other (80, 85) — the r3 behavior emitted two
    // singletons; the oracle's global sort merges them into [80, 85]
    mem.addData(Event(11L, ts(80), "b"), Event(11L, ts(85), "c"))
    q.processAllAvailable()
    val afterChain = spark.table("sessions_stragglers").as[Session].collect().toSet
    assert(afterChain == Set(Session(11L, ts(80), ts(85), 2)),
      s"straggler chain must merge before emitting, got $afterChain")
    // a batch whose stragglers END adjacent to the open session: 105 and
    // 112 chain together, and 112 is within gap of the open start 120 —
    // the whole chain must absorb INTO the open session (oracle: one
    // session [105, 120]), not emit separately
    mem.addData(Event(11L, ts(105), "d"), Event(11L, ts(112), "e"))
    q.processAllAvailable()
    // close everything via watermark
    mem.addData(Event(12L, ts(20 * 60), "tick"))
    q.processAllAvailable()
    val all = spark.table("sessions_stragglers").as[Session].collect().toSet
    q.stop()
    assert(all == Set(
      Session(11L, ts(80), ts(85), 2),
      Session(11L, ts(105), ts(120), 3)),
      s"adjacent straggler chain must extend the open session, got $all")
  }

  test("stateful sessions match the batch window oracle on closed sessions") {
    val batch = Sessionize.sessionsBatch(spark, spark.createDataset(events), 10 * 60000L)
      .collect().toSet
    // batch computes ALL sessions (incl. the ones streaming keeps open)
    assert(batch == Set(
      Session(1L, ts(0), ts(1), 2),
      Session(1L, ts(30), ts(30), 1),
      Session(2L, ts(5), ts(5), 1)))
  }

  test("batch oracle sessionizes sub-second gaps at millisecond precision") {
    // events 400ms apart with a 300ms gap threshold: seconds-truncating
    // arithmetic would see gap=0 and merge them; unix_millis must split
    def tms(ms: Long): Timestamp = new Timestamp(1767225600000L + ms)
    val evs = Seq(
      Event(9L, tms(0), "a"), Event(9L, tms(400), "b"), Event(9L, tms(800), "c"))
    val got = Sessionize.sessionsBatch(spark, spark.createDataset(evs), gapMs = 300L)
      .collect().toSet
    assert(got == Set(
      Session(9L, tms(0), tms(0), 1),
      Session(9L, tms(400), tms(400), 1),
      Session(9L, tms(800), tms(800), 1)))
    // and agrees with a run where the gap is just wide enough to merge
    val merged = Sessionize.sessionsBatch(spark, spark.createDataset(evs), gapMs = 400L)
      .collect().toSet
    assert(merged == Set(Session(9L, tms(0), tms(800), 3)))
  }
}
