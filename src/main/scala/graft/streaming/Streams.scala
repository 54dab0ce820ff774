package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types.StructType

/** Structured-Streaming forms of the engine's stateless/windowed operators.
  *
  * The reference has no streaming (SURVEY.md §2.8); tile assignment is a
  * stateless per-row projection so it ports to readStream unchanged, and the
  * hourly analytics become a watermarked windowed aggregate. These exist to
  * prove the operators compose with `readStream` — the batch path remains
  * the primary engine.
  */
object Streams {

  def eventsSchema: StructType = new StructType()
    .add("event_id", "long").add("ts", "timestamp")
    .add("user_id", "long").add("event_type", "string")
    .add("value", "double").add("props", "string")

  /** File-stream over an events directory. */
  def readEvents(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(eventsSchema).parquet(dir)

  /** Watermarked tumbling-window counts per event type (streaming form of
    * q08_events_hourly). */
  def hourlyCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum("value").as("total_value"))
      .select(col("window.start").as("hour"), col("event_type"),
        col("n"), col("total_value"))

  /** Streaming tile assignment: stateless projection of user geotags derived
    * from user_id (same modular scheme as the batch DerivedGeo), counted per
    * slippy tile per window. */
  def tileCounts(events: DataFrame, zoom: Int): DataFrame = {
    val lng = (col("user_id") % 3600) / 10.0 - 180.0 + 0.05
    val lat = ((col("user_id") * 7) % 1200) / 10.0 - 60.0 + 0.05
    events
      .withColumn("tile_id", concat_ws("_",
        graft.sources.DerivedGeo.tileX(lng, zoom).cast("string"),
        graft.sources.DerivedGeo.tileY(lat, zoom).cast("string"),
        lit(zoom.toString)))
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("tile_id"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("hour"), col("tile_id"), col("n"))
  }

  /** Exactly-once streaming ingest into the lineage sink (north rule:
    * resumable ingest with per-partition lineage): every micro-batch
    * commits through [[graft.sources.LineageSink.commitBatch]] with
    * `jobId = batch-<batchId>`, so a replayed batch — restart from the
    * checkpoint, mid-commit crash — lands exactly once (idempotent manifest
    * check + staged two-phase commit). Concurrent writers on one sink dir
    * are commit-safe (round-4 leases + the exclusive pending marker — even
    * two attempts of one batch id land once), but still run ONE logical
    * stream per sink dir: distinct streams each start their batch ids at 0,
    * so one stream's committed ids would silently swallow the other's
    * batches. The checkpoint must be durable: batchId→offsets lives there,
    * and a LOST checkpoint re-plans batch ids over possibly-different data,
    * which no batchId-keyed idempotent sink can dedupe correctly (this is
    * the standard Spark foreachBatch contract). */
  def lineageSink(df: DataFrame, dir: String, bucketCol: String,
                  checkpoint: String): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    df.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graft.sources.LineageSink.commitBatch(batch, dir, bucketCol, s"batch-$batchId")
      }

  case class SessEvent(user_id: Long, tsMs: Long, event_id: Long)
  case class SessEventTs(user_id: Long, ts: java.sql.Timestamp, event_id: Long)
  case class SessState(sessionSeq: Long, lastTsMs: Long, nEvents: Long,
                       startTsMs: Long)
  case class SessionRow(user_id: Long, session_seq: Long,
                        session_start_ms: Long, n_events: Long)

  /** Stateful streaming sessionization via flatMapGroupsWithState — the
    * streaming form of q09_sessionize (same 30-minute gap rule). Each user
    * key holds one small state record; a processing-time timeout flushes the
    * open session. Per-batch events are sorted within the group (bounded:
    * one user's per-batch slice), so results match the batch window exactly
    * when events arrive in order — for out-of-order arrival use
    * [[sessionizeEventTime]], which converges to the batch answer under any
    * within-watermark reordering. */
  def sessionize(events: Dataset[SessEvent],
                 gapMs: Long = 1800000L): Dataset[SessionRow] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessState, SessionRow](
        OutputMode.Append, GroupStateTimeout.ProcessingTimeTimeout) {
        (user: Long, it: Iterator[SessEvent], state: GroupState[SessState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(SessionRow(user, s.sessionSeq, s.startTsMs, s.nEvents))
          } else {
            val sorted = it.toSeq.sortBy(e => (e.tsMs, e.event_id))
            var closed = List.empty[SessionRow]
            var cur = state.getOption
            sorted.foreach { e =>
              cur match {
                case Some(s) if e.tsMs - s.lastTsMs <= gapMs =>
                  cur = Some(s.copy(lastTsMs = e.tsMs, nEvents = s.nEvents + 1))
                case Some(s) =>
                  closed ::= SessionRow(user, s.sessionSeq, s.startTsMs, s.nEvents)
                  cur = Some(SessState(s.sessionSeq + 1, e.tsMs, 1, e.tsMs))
                case None =>
                  cur = Some(SessState(1, e.tsMs, 1, e.tsMs))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutDuration(gapMs)
            }
            closed.reverseIterator
          }
      }
  }

  /** One contiguous run of events: no internal gap > gapMs. Fragments of a
    * user are kept DISJOINT (any two are > gapMs apart), sorted by start. */
  case class SessFrag(startMs: Long, endMs: Long, nEvents: Long)
  case class FragState(frags: List[SessFrag], emitted: Long)

  /** Merge new event times into a disjoint fragment list: each event either
    * lands inside/extends a fragment or starts a new one, and a late event
    * BRIDGING two fragments fuses them — the operation that makes
    * out-of-order arrival converge to the batch answer. O(|frags|+|events|)
    * via a sorted sweep; fragment count per key is bounded by the
    * watermark delay / gap ratio (older fragments flush). */
  private[graft] def mergeEvents(frags: List[SessFrag], times: Seq[Long],
                                     gapMs: Long): List[SessFrag] = {
    val pts = (frags.map(f => (f.startMs, f)) ++ times.map(t => (t, SessFrag(t, t, 1))))
      .sortBy { case (s, f) => (s, f.endMs) }.map(_._2)
    pts.foldLeft(List.empty[SessFrag]) { (acc, f) =>
      acc match {
        case h :: t if f.startMs - h.endMs <= gapMs =>
          SessFrag(h.startMs, math.max(h.endMs, f.endMs), h.nEvents + f.nEvents) :: t
        case _ => f :: acc
      }
    }.reverse
  }

  /** Split fragments into (closed, still open) under `watermarkMs`: a
    * fragment is CLOSED once no admissible event (ts ≥ watermark) could
    * extend or bridge it, i.e. its end is more than the gap below the
    * watermark. */
  private[graft] def flushFrags(frags: List[SessFrag], watermarkMs: Long,
      gapMs: Long): (List[SessFrag], List[SessFrag]) =
    frags.partition(f => f.endMs + gapMs < watermarkMs)

  /** The flatMapGroupsWithState transition for [[sessionizeEventTime]],
    * exposed for direct spec-driving with
    * `org.apache.spark.sql.streaming.TestGroupState` (unit-level coverage
    * with a controlled watermark; the REAL micro-batch engine path is
    * certified end-to-end by StreamingEngineSpec against both the RocksDB
    * and the default HDFS state-store providers — round-5; earlier rounds'
    * state-store hang on this host no longer reproduces). */
  def sessionizeEventTimeFunc(gapMs: Long)(
      user: Long, it: Iterator[SessEventTs],
      state: GroupState[FragState]): Iterator[SessionRow] = {
    val st = state.getOption.getOrElse(FragState(Nil, 0L))
    val wm = state.getCurrentWatermarkMs()
    val merged =
      if (state.hasTimedOut) st.frags
      else mergeEvents(st.frags, it.map(_.ts.getTime).toSeq, gapMs)
    val (closed, open) = flushFrags(merged, wm, gapMs)
    // disjoint fragments close in start order, so the emitted sequence
    // number matches the batch q09 session_seq
    val out = closed.zipWithIndex.map { case (f, i) =>
      SessionRow(user, st.emitted + i + 1, f.startMs, f.nEvents)
    }
    // the emitted count must SURVIVE idle periods — dropping state when no
    // fragment is open would restart session_seq at 1 when the user
    // returns, diverging from the batch numbering. One tiny record per
    // ever-seen user stays resident (the same state any per-user running
    // aggregate needs); no timeout is armed while nothing can close.
    state.update(FragState(open, st.emitted + closed.length))
    if (open.nonEmpty)
      // earliest moment the oldest open fragment could close
      state.setTimeoutTimestamp(math.max(open.head.endMs + gapMs + 1, wm + 1))
    out.iterator
  }

  /** Event-time sessionization: same 30-minute-gap session semantics as
    * [[sessionize]], but correct under OUT-OF-ORDER arrival across
    * micro-batches. Per-user state holds disjoint session FRAGMENTS; a late
    * event (within the watermark delay) extends, prepends or BRIDGES
    * fragments, and a fragment is emitted only once the event-time
    * watermark passes its end by the gap — from then on no admissible event
    * can change it, so the emitted session set equals the batch q09 answer
    * for any arrival order the watermark admits. Events later than the
    * watermark delay are dropped by the engine (the standard watermark
    * contract; widen `delayThreshold` to tolerate more disorder at the cost
    * of emission latency and per-key state). */
  def sessionizeEventTime(events: Dataset[SessEventTs],
                          gapMs: Long = 1800000L,
                          delayThreshold: String = "2 hours"): Dataset[SessionRow] = {
    import events.sparkSession.implicits._
    events.withWatermark("ts", delayThreshold)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FragState, SessionRow](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        sessionizeEventTimeFunc(gapMs))
  }

  /** Distinguishes concurrent replays' memory-sink names (deterministic —
    * no wall clock in query identity). */
  private val replaySeq = new java.util.concurrent.atomic.AtomicInteger(0)

  /** Replay a BOUNDED events table through the REAL micro-batch engine:
    * MemoryStream → [[sessionizeEventTime]] (flatMapGroupsWithState,
    * EventTimeTimeout, real state store) → memory sink, fed in `batches`
    * micro-batches under deterministic ±15-minute arrival disorder that
    * crosses batch boundaries (the watermark delay, 2 h, admits all of it,
    * so convergence — not luck — produces the batch answer). Returns the
    * emitted sessions as a batch DataFrame `(user_id, session_seq,
    * session_start_ms, n_events)` for the driver's q09-equivalent SQL
    * oracle: this is the end-to-end ENGINE certificate for §2.8 streaming
    * (the transition function alone is covered by StreamingEventTimeSpec).
    *
    * The event stream is collected to the driver by design: a MemoryStream
    * replay is a test harness for engine semantics, not a production path —
    * production streams arrive via readStream (see [[readEvents]]).
    * Two far-future sentinel batches flush the tail: watermarks only
    * advance with data, and EventTimeTimeout needs a following batch to
    * fire in; the sentinel user is dropped from the result. */
  def replayEventTimeSessions(spark: SparkSession, events: DataFrame,
                              gapMs: Long = 1800000L,
                              batches: Int = 8): DataFrame = {
    import spark.implicits._
    val evs: Array[SessEventTs] = events
      .select(col("user_id").cast("long").as("user_id"),
        col("ts").cast("timestamp").as("ts"),
        col("event_id").cast("long").as("event_id"))
      .as[SessEventTs].collect()
    require(evs.nonEmpty, "replayEventTimeSessions: no events")
    // ±15-min jitter keyed off the event id (floorMod: the multiply may
    // wrap negative); strictly inside the 2 h watermark delay, so no real
    // event is ever dropped as late — proof: consecutive arrival batches
    // overlap in true time by at most 2×15 min ≪ 2 h
    val arrival = evs.sortBy { e =>
      val jitter =
        (java.lang.Math.floorMod(e.event_id * 2654435761L, 3L) - 1L) * 900000L
      (e.ts.getTime + jitter, e.event_id)
    }
    val sentinelUser = evs.iterator.map(_.user_id).max + 1000000L
    val flushTs = evs.iterator.map(_.ts.getTime).max + gapMs + 10800000L
    val name = s"graft_sess_replay_${replaySeq.incrementAndGet()}"
    val checkpoint = java.nio.file.Files.createTempDirectory(name).toString
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val source =
      org.apache.spark.sql.execution.streaming.runtime.MemoryStream[SessEventTs]
    val query = sessionizeEventTime(source.toDS(), gapMs)
      .writeStream.queryName(name).outputMode("append")
      .format("memory").option("checkpointLocation", checkpoint).start()
    val rows = try {
      val per = math.max(1, math.ceil(arrival.length.toDouble / batches).toInt)
      arrival.grouped(per).foreach { b =>
        source.addData(b.toSeq: _*); query.processAllAvailable()
      }
      source.addData(SessEventTs(sentinelUser,
        new java.sql.Timestamp(flushTs), Long.MaxValue - 1))
      query.processAllAvailable()
      source.addData(SessEventTs(sentinelUser,
        new java.sql.Timestamp(flushTs + 600000L), Long.MaxValue))
      query.processAllAvailable()
      spark.table(name).as[SessionRow].collect()
        .filter(_.user_id != sentinelUser)
    } finally {
      query.stop()
      spark.catalog.dropTempView(name)
      // the per-invocation checkpoint is harness-scoped state — delete it
      // (repeated Verify/test runs were accumulating orphan dirs under
      // /tmp, ADVICE round 5)
      try org.apache.commons.io.FileUtils.deleteDirectory(
        new java.io.File(checkpoint))
      catch { case _: java.io.IOException => () }
    }
    spark.createDataset(rows.toIndexedSeq).toDF()
  }
}
