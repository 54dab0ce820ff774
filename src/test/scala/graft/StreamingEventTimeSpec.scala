package graft

import org.apache.spark.api.java.Optional

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.Streams
import graft.streaming.Streams.{FragState, SessEventTs, SessFrag, SessionRow}

/** Event-time sessionization: out-of-order events across micro-batches must
  * converge to the batch q09 session set. This spec drives the EXACT
  * transition function the engine calls —
  * [[Streams.sessionizeEventTimeFunc]] — through Spark's own
  * [[TestGroupState]] harness, batch by batch, with the engine's watermark
  * rule (max event time seen in prior batches − delay): fast, deterministic
  * unit coverage of every merge/bridge/flush path. The REAL micro-batch
  * engine (MemoryStream → flatMapGroupsWithState → memory sink) is
  * certified separately by [[StreamingEngineSpec]] (round-5) — the
  * state-store hang earlier rounds documented on this host no longer
  * reproduces under either provider. */
class StreamingEventTimeSpec extends AnyFunSuite {
  import SparkTestSession.spark

  private val Gap = 1800000L // 30 min
  private val Delay = 7200000L // 2 h watermark delay

  test("mergeEvents: extend, prepend, and BRIDGE fragments") {
    val a = SessFrag(0L, 600000L, 2) // 0-10 min
    val b = SessFrag(2460000L, 3000000L, 3) // 41-50 min (31 min after a: disjoint)
    // a late event at 25 min is within 30 min of BOTH → fuses them
    val bridged = Streams.mergeEvents(List(a, b), Seq(1500000L), Gap)
    assert(bridged === List(SessFrag(0L, 3000000L, 6)))
    // extend right
    assert(Streams.mergeEvents(List(a), Seq(1200000L), Gap) ===
      List(SessFrag(0L, 1200000L, 3)))
    // prepend before the first fragment
    assert(Streams.mergeEvents(List(b), Seq(1800000L), Gap) ===
      List(SessFrag(1800000L, 3000000L, 4)))
    // far-away event opens its own fragment
    assert(Streams.mergeEvents(List(a), Seq(9000000L), Gap) ===
      List(a, SessFrag(9000000L, 9000000L, 1)))
    // inside an existing span still counts the row
    assert(Streams.mergeEvents(List(a), Seq(300000L), Gap) ===
      List(SessFrag(0L, 600000L, 3)))
  }

  test("flushFrags closes exactly the fragments the watermark has passed") {
    val fs = List(SessFrag(0L, 100L, 1), SessFrag(10000000L, 10000100L, 2))
    assert(Streams.flushFrags(fs, 0L, Gap) === ((Nil, fs)))
    assert(Streams.flushFrags(fs, 100L + Gap + 1, Gap) === ((fs.take(1), fs.drop(1))))
    assert(Streams.flushFrags(fs, Long.MaxValue, Gap) === ((fs, Nil)))
  }

  test("shuffled micro-batch replay equals the batch q09 sessions") {
    // 4 users × 64 events; a >30-min jump every 8 events → 8 sessions/user
    val events = for {
      u <- 0L until 4L
      j <- 0 until 64
    } yield SessEventTs(u,
      new java.sql.Timestamp(j * 600000L + (j / 8) * 3600000L + u * 137L),
      u * 1000 + j)

    // deterministic disorder: arrival key jitters each event by up to ±15
    // min, freely crossing batch boundaries; watermark delay 2 h ≫ jitter
    // so no event is ever late beyond the watermark
    val arrival = events.sortBy(e =>
      (e.ts.getTime + ((e.event_id * 2654435761L % 3) - 1) * 900000L, e.event_id))
    val batches = arrival.grouped(40).toList

    val state = scala.collection.mutable.Map[Long, FragState]()
    val timeouts = scala.collection.mutable.Map[Long, Long]()
    val emitted = scala.collection.mutable.ArrayBuffer[SessionRow]()
    var maxSeen = Long.MinValue

    def run(user: Long, evs: Seq[SessEventTs], wm: Long, timedOut: Boolean): Unit = {
      val ts = TestGroupState.create[FragState](
        state.get(user).map(Optional.of[FragState]).getOrElse(Optional.empty()),
        GroupStateTimeout.EventTimeTimeout, 0L,
        Optional.of(java.lang.Long.valueOf(math.max(0L, wm))), timedOut)
      emitted ++= Streams.sessionizeEventTimeFunc(Gap)(user, evs.iterator, ts)
      if (ts.isRemoved || (!ts.exists && state.contains(user))) {
        state.remove(user); timeouts.remove(user)
      } else if (ts.exists) {
        state(user) = ts.get
        if (ts.getTimeoutTimestampMs.isPresent)
          timeouts(user) = ts.getTimeoutTimestampMs.get()
        else timeouts.remove(user)
      }
    }

    for (batch <- batches) {
      val wm = if (maxSeen == Long.MinValue) 0L else maxSeen - Delay
      // engine order: fire timeouts for keys whose timeout ts ≤ watermark
      // and that receive no data this batch, process data for the rest
      val byUser = batch.groupBy(_.user_id)
      for ((u, t) <- timeouts.toList if t <= wm && !byUser.contains(u))
        run(u, Nil, wm, timedOut = true)
      for ((u, evs) <- byUser.toList.sortBy(_._1)) run(u, evs, wm, timedOut = false)
      maxSeen = math.max(maxSeen, batch.map(_.ts.getTime).max)
    }
    // end of stream: watermark advances past everything
    for (u <- state.keys.toList.sorted) run(u, Nil, Long.MaxValue, timedOut = true)

    // batch truth: q09's window logic over the same rows
    import spark.implicits._
    val df = events.map(e => (e.user_id, e.ts.getTime, e.event_id))
      .toDF("user_id", "tsMs", "event_id")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("tsMs"), col("event_id"))
    val batchTruth = df
      .withColumn("prev", lag(col("tsMs"), 1).over(w))
      .withColumn("new_s", when(col("prev").isNull ||
        col("tsMs") - col("prev") > Gap, 1).otherwise(0))
      .withColumn("session_seq", sum("new_s").over(
        w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .groupBy("user_id", "session_seq")
      .agg(min("tsMs").as("session_start_ms"), count(lit(1)).as("n_events"))
      .collect()
      .map(r => SessionRow(r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet

    assert(emitted.size === emitted.toSet.size, "duplicate session emissions")
    assert(emitted.toSet === batchTruth)
    // per-user records persist (they carry the emitted counter across idle
    // periods) but no fragment may remain open after the final flush
    assert(state.values.forall(_.frags.isEmpty), "fragment left open")
  }

  test("session_seq survives an idle gap (state persists between sessions)") {
    var st: Option[FragState] = None
    val emitted = scala.collection.mutable.ArrayBuffer[SessionRow]()
    def step(times: Seq[Long], wm: Long): Unit = {
      val ts = TestGroupState.create[FragState](
        st.map(Optional.of[FragState]).getOrElse(Optional.empty()),
        GroupStateTimeout.EventTimeTimeout, 0L,
        Optional.of(java.lang.Long.valueOf(wm)), false)
      emitted ++= Streams.sessionizeEventTimeFunc(Gap)(1L,
        times.map(t => SessEventTs(1L, new java.sql.Timestamp(t), t)).iterator, ts)
      st = if (ts.exists) Some(ts.get) else None
    }
    step(Seq(0L, 60000L), 0L) // session A opens
    step(Nil, 10000000L) // watermark far past A: A closes (seq 1)
    assert(emitted.map(_.session_seq).toList === List(1L))
    assert(st.exists(_.frags.isEmpty), "emitted counter must survive idleness")
    step(Seq(20000000L), 10000000L) // user returns after the idle gap
    step(Nil, 40000000L) // session B closes — seq continues at 2
    assert(emitted.map(_.session_seq).toList === List(1L, 2L))
  }

  test("in-order replay emits each session exactly once, incrementally") {
    val events = (0 until 48).map(j => SessEventTs(7L,
      new java.sql.Timestamp(j * 600000L + (j / 6) * 2400000L), j.toLong))
    val state = scala.collection.mutable.Map[Long, FragState]()
    val emitted = scala.collection.mutable.ArrayBuffer[SessionRow]()
    var maxSeen = 0L
    for (batch <- events.grouped(12)) {
      val wm = math.max(0L, maxSeen - Delay)
      val ts = TestGroupState.create[FragState](
        state.get(7L).map(Optional.of[FragState]).getOrElse(Optional.empty()),
        GroupStateTimeout.EventTimeTimeout, 0L,
        Optional.of(java.lang.Long.valueOf(wm)), false)
      emitted ++= Streams.sessionizeEventTimeFunc(Gap)(7L, batch.iterator, ts)
      if (ts.exists) state(7L) = ts.get else state.remove(7L)
      maxSeen = math.max(maxSeen, batch.map(_.ts.getTime).max)
    }
    // incremental emission happened before the final flush
    val mid = emitted.size
    assert(mid > 0, "no session closed while the stream was live")
    val ts = TestGroupState.create[FragState](
      state.get(7L).map(Optional.of[FragState]).getOrElse(Optional.empty()),
      GroupStateTimeout.EventTimeTimeout, 0L,
      Optional.of(java.lang.Long.valueOf(Long.MaxValue)), true)
    emitted ++= Streams.sessionizeEventTimeFunc(Gap)(7L, Iterator.empty, ts)
    assert(emitted.map(_.session_seq).toList === (1 to emitted.size).map(_.toLong).toList)
    assert(emitted.map(_.n_events).sum === 48)
  }
}
