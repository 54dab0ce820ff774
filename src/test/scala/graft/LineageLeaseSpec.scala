package graft

import org.apache.hadoop.fs.Path
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.LineageSink

/** Round-5 lease lifecycle: a live commit heartbeats its lease so no single
  * long step can make it look dead to a concurrent recover(), and ownership
  * is re-verified at the phase boundaries so a genuinely reaped attempt
  * aborts loudly instead of registering manifest rows for deleted files. */
class LineageLeaseSpec extends AnyFunSuite {
  import SparkTestSession.spark

  private def fs(dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  test("heartbeat keeps a lease live across many horizons; stopping lets it expire") {
    val dir = java.nio.file.Files.createTempDirectory("lease-hb").toString
    val f = fs(dir)
    val attempt = "job--hb-attempt"
    // 8 s horizon / 2 s beat: ~6 s of slack for this host's documented
    // multi-second CPU-steal stalls (a 3 s horizon flaked on paper)
    val horizon = 8000L
    LineageSink.acquireLease(f, dir, attempt)
    val hb = LineageSink.startHeartbeat(f, dir, attempt, horizon)
    try {
      Thread.sleep(horizon + 1500)
      assert(LineageSink.leaseLive(f, dir, attempt, horizon),
        "heartbeat failed to keep the lease fresh past the horizon")
    } finally LineageSink.stopHeartbeat(hb)
    Thread.sleep(horizon + 500)
    assert(!LineageSink.leaseLive(f, dir, attempt, horizon),
      "lease stayed live after the heartbeat stopped")
  }

  test("verifyOwned aborts when the lease or the pending marker was reaped") {
    val dir = java.nio.file.Files.createTempDirectory("lease-own").toString
    val f = fs(dir)
    val attempt = "job--own-attempt"
    val marker = new Path(s"$dir/pending/job")
    f.mkdirs(marker.getParent)
    f.create(marker, false).close()
    LineageSink.acquireLease(f, dir, attempt)
    // both present: no abort
    LineageSink.verifyOwned(f, dir, attempt, marker)
    // lease reaped
    f.delete(new Path(s"$dir/leases/$attempt"), false)
    val e1 = intercept[IllegalStateException] {
      LineageSink.verifyOwned(f, dir, attempt, marker)
    }
    assert(e1.getMessage.contains("ownership lost"))
    // marker reaped (lease back)
    LineageSink.acquireLease(f, dir, attempt)
    f.delete(marker, false)
    intercept[IllegalStateException] {
      LineageSink.verifyOwned(f, dir, attempt, marker)
    }
  }

  test("a completed commit leaves no heartbeat thread behind") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("lease-clean").toString
    val df = (0 until 40).map(i => (i.toLong, s"b${i % 3}")).toDF("id", "bucket")
    LineageSink.write(df, dir, "bucket")
    val live = Thread.getAllStackTraces.keySet.toArray(Array.empty[Thread])
      .filter(t => t.isAlive && t.getName.startsWith("graft-lease-heartbeat-"))
    assert(live.isEmpty, s"leaked heartbeat threads: ${live.map(_.getName).toSeq}")
    // and the committed table reads back whole
    assert(LineageSink.snapshot(spark, dir).count() === 40)
  }
}
