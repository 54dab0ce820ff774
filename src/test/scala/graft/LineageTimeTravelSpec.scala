package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.LineageSink

/** Round-5 time-travel reads: `snapshotAsOf` reconstructs the committed
  * table as of any past commit boundary from the manifest's `written_at`
  * alone — appends are the only mutation and compaction carries manifest
  * rows verbatim, so no snapshot lineage log is needed; the as-of read is
  * just manifest-side pruning on the commit timestamp. */
class LineageTimeTravelSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  private def slice(k: Int) =
    (k * 50 until (k + 1) * 50).map(i => (i.toLong, s"b${i / 10}"))
      .toDF("id", "bucket")

  private def maxWrittenAt(dir: String): java.sql.Timestamp =
    LineageSink.manifest(spark, dir)
      .agg(max(col("written_at"))).collect()(0).getTimestamp(0)

  test("as-of reads return exactly the commits at or before the boundary, across compaction") {
    spark.conf.set("graft.lineage.staleMs", "0")
    try {
      val dir = java.nio.file.Files.createTempDirectory("lineage-asof").toString
      val boundaries = (0 until 3).map { k =>
        LineageSink.write(slice(k), dir, "bucket")
        Thread.sleep(10) // commit stamps are millisecond clocks
        maxWrittenAt(dir)
      }

      def idsAsOf(ts: java.sql.Timestamp): Set[Long] = {
        val df = LineageSink.snapshotAsOf(spark, dir, ts)
        if (df.columns.isEmpty) Set.empty
        else df.select("id").collect().map(_.getLong(0)).toSet
      }

      // each boundary sees exactly its prefix of commits
      for (k <- 0 until 3)
        assert(idsAsOf(boundaries(k)) === (0L until (k + 1) * 50L).toSet,
          s"as-of boundary $k")
      // before history began: empty
      assert(idsAsOf(new java.sql.Timestamp(0L)) === Set.empty)
      // the latest boundary equals the live snapshot
      assert(idsAsOf(boundaries(2)) ===
        LineageSink.snapshot(spark, dir).select("id")
          .collect().map(_.getLong(0)).toSet)

      // compaction (including retirement of covered flats on the second
      // pass at horizon 0) must not disturb any historical boundary
      LineageSink.compactManifest(spark, dir)
      LineageSink.compactManifest(spark, dir)
      for (k <- 0 until 3)
        assert(idsAsOf(boundaries(k)) === (0L until (k + 1) * 50L).toSet,
          s"as-of boundary $k after compaction")

      // a resume replay (same job content re-submitted) adds no rows and
      // shifts no historical boundary
      LineageSink.resumeWrite(slice(1), dir, "bucket")
      assert(idsAsOf(boundaries(0)) === (0L until 50L).toSet)
      assert(LineageSink.snapshot(spark, dir).count() === 150L)
    } finally spark.conf.unset("graft.lineage.staleMs")
  }
}
