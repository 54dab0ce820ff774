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
  case class SessState(sessionSeq: Long, lastTsMs: Long, nEvents: Long,
                       startTsMs: Long)
  case class SessionRow(user_id: Long, session_seq: Long,
                        session_start_ms: Long, n_events: Long)

  /** Stateful streaming sessionization via flatMapGroupsWithState — the
    * streaming form of q09_sessionize (same 30-minute gap rule). Each user
    * key holds one small state record; a processing-time timeout flushes the
    * open session. Per-batch events are sorted within the group (bounded:
    * one user's per-batch slice), so results match the batch window exactly
    * when events arrive in order. */
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
}
