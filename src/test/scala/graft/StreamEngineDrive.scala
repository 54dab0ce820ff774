package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.Streams
import graft.streaming.Streams.{SessEventTs, SessionRow}

/** Round-5 engine-side evidence for the stateful streaming path: run
  * [[Streams.sessionizeEventTime]] through a REAL micro-batch
  * flatMapGroupsWithState query (MemoryStream → processAllAvailable →
  * memory sink) and compare against the batch q09 answer under shuffled
  * arrival. Prior rounds could only drive the transition function through
  * TestGroupState because the default (HDFS-backed) state store's
  * maintenance never drained on this host — this drive makes the engine
  * attempt reproducible per provider and, on a hang, captures a full
  * thread dump so the diagnosis is evidence, not assertion.
  *
  * Usage: `sbt "Test/runMain graft.StreamEngineDrive rocksdb"` (or `hdfs`,
  * `hdfs-slowmaint`). Exit 0 = engine drained and matched batch truth;
  * exit 3 = hang (threads dumped to stderr).
  */
object StreamEngineDrive {

  private val Gap = 1800000L
  private val SentinelUser = 99999L

  def main(args: Array[String]): Unit = {
    val mode: String = args.headOption.getOrElse("rocksdb")
    val timeoutMs: Long = args.drop(1).headOption.map(_.toLong).getOrElse(180000L)

    val watchdog = new Thread(() => {
      try {
        Thread.sleep(timeoutMs)
        System.err.println(s"==== WATCHDOG: engine did not drain within ${timeoutMs} ms (mode=$mode); thread dump follows ====")
        import scala.jdk.CollectionConverters._
        for ((t, stack) <- Thread.getAllStackTraces.asScala.toSeq.sortBy(_._1.getName)) {
          System.err.println(s"--- ${t.getName} state=${t.getState} daemon=${t.isDaemon}")
          stack.foreach(f => System.err.println(s"    at $f"))
        }
        System.err.flush()
        Runtime.getRuntime.halt(3)
      } catch { case _: InterruptedException => () }
    }, "stream-engine-watchdog")
    watchdog.setDaemon(true)
    watchdog.start()

    val extra: Map[String, String] = mode match {
      case "rocksdb" => Map("spark.sql.streaming.stateStore.providerClass" ->
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      case "hdfs" => Map.empty // default provider
      case "hdfs-slowmaint" =>
        // if the hang is the maintenance pool, starving it should unblock
        Map("spark.sql.streaming.stateStore.maintenanceInterval" -> "3600s")
      case other => sys.error(s"unknown mode $other")
    }
    val b = SparkSession.builder()
      .master("local[4]")
      .appName(s"graft-stream-engine-$mode")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config(extra)
    val spark: SparkSession = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // same corpus shape as StreamingEventTimeSpec: 4 users × 64 events,
    // a >gap jump every 8 events → 8 sessions per user; deterministic
    // ±15-min arrival jitter crossing batch boundaries (watermark delay
    // 2 h ≫ jitter, so nothing is dropped as too-late)
    // Base keeps every event strictly above the engine's initial watermark
    // (epoch 0): a row whose ts EQUALS the watermark is dropped as late by
    // FlatMapGroupsWithStateExec's filter, so a corpus starting at ts=0
    // loses its first event — an epoch-boundary artifact, not a session
    // bug (real event time is never 1970-01-01T00:00:00.000).
    val Base = 1600000000000L
    val events = for {
      u <- 0L until 4L
      j <- 0 until 64
    } yield SessEventTs(u,
      new java.sql.Timestamp(Base + j * 600000L + (j / 8) * 3600000L + u * 137L),
      u * 1000 + j)
    val arrival = events.sortBy(e =>
      (e.ts.getTime + ((e.event_id * 2654435761L % 3) - 1) * 900000L, e.event_id))
    val batches = arrival.grouped(40).toList

    val checkpoint = java.nio.file.Files
      .createTempDirectory(s"stream-engine-$mode").toString

    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val source = MemoryStream[SessEventTs]
    val query = Streams.sessionizeEventTime(source.toDS())
      .writeStream
      .queryName("sess_engine")
      .outputMode("append")
      .format("memory")
      .option("checkpointLocation", checkpoint)
      .start()

    val t0 = System.nanoTime()
    for (batch <- batches) {
      source.addData(batch: _*)
      query.processAllAvailable()
    }
    // close every open session: a far-future sentinel event pushes the
    // watermark past end+gap for all real users (watermarks only advance
    // with data)
    val flushTs = events.map(_.ts.getTime).max + Gap + 7200000L + 3600000L
    source.addData(SessEventTs(SentinelUser, new java.sql.Timestamp(flushTs), 999999L))
    query.processAllAvailable()
    // one more empty-ish cycle so EventTimeTimeout fires for keys with no data
    source.addData(SessEventTs(SentinelUser,
      new java.sql.Timestamp(flushTs + 600000L), 999998L))
    query.processAllAvailable()
    val drainedMs = (System.nanoTime() - t0) / 1000000
    // the engine has drained — disarm the watchdog BEFORE comparison and
    // teardown, so a slow stop() near the deadline can't be halt(3)-ed
    // into a false "hang" verdict
    watchdog.interrupt()

    val got = spark.table("sess_engine").as[SessionRow].collect()
      .filter(_.user_id != SentinelUser).toSet

    // batch truth: q09's lag/window logic over the same rows
    val df = events.map(e => (e.user_id, e.ts.getTime, e.event_id))
      .toDF("user_id", "tsMs", "event_id")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("tsMs"), col("event_id"))
    val want = df
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

    query.stop()
    val ok = got == want
    println(s"""{"drive":"stream-engine","mode":"$mode","drained_ms":$drainedMs,""" +
      s""""sessions_got":${got.size},"sessions_want":${want.size},"match":$ok}""")
    if (!ok) {
      (want -- got).take(5).foreach(r => println(s"MISSING: $r"))
      (got -- want).take(5).foreach(r => println(s"EXTRA:   $r"))
      spark.stop()
      sys.exit(1)
    }
    spark.stop()
  }
}
