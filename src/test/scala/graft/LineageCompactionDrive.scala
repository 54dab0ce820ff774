package graft

import org.apache.spark.sql.functions._

import graft.sources.LineageSink

/** Round-6 rehearsal for VERDICT next-round #1's measured failure shape:
  * snapshot() over THOUSANDS of small files is listing/planning-bound
  * (round-5 LineageScaleDrive: 15.9 s for 8k rows across 4.7k files).
  * Build that state directly — one commit of a deliberately over-
  * partitioned frame lands ~`tasks` files per bucket — then measure
  * snapshot plan+read before and after [[LineageSink.compactData]].
  *
  * The IVF-append rehearsal (IvfAppendDrive) measures the same maintenance
  * against a data-heavy index; THIS drive isolates the listing term the
  * compaction exists to kill (tiny rows, so file count is the only
  * variable that moves).
  *
  * Usage: `sbt "Test/runMain graft.LineageCompactionDrive [tasks] [buckets]"`
  * (defaults 1100, 4 → ~4,400 files). Prints one JSON line for BASELINE.md.
  */
object LineageCompactionDrive {
  private def ms(t0: Long): Long = (System.nanoTime() - t0) / 1000000

  def main(args: Array[String]): Unit = {
    val tasks = args.headOption.map(_.toInt).getOrElse(1100)
    val buckets = args.drop(1).headOption.map(_.toInt).getOrElse(4)

    val spark = GraftSession.local(8, "graft-lineage-compaction")
    spark.sparkContext.setLogLevel("ERROR")

    val dir = java.nio.file.Files.createTempDirectory("compact-drive").toString
    val rows = tasks.toLong * buckets * 2
    val df = spark.range(0, rows)
      .select(col("id"), pmod(col("id"), lit(buckets)).cast("string").as("bucket"))
      .repartition(tasks) // every task holds every bucket → tasks × buckets files
    LineageSink.write(df, dir, "bucket")

    def probe(): (Int, Long, Long, Long) = {
      // fresh plans each call: plan (driver file-listing term) vs read
      val tP = System.nanoTime()
      val files = LineageSink.snapshot(spark, dir).inputFiles.length
      val planMs = ms(tP)
      val tR = System.nanoTime()
      val n = LineageSink.snapshot(spark, dir).count()
      (files, planMs, ms(tR), n)
    }

    val (files0, plan0, read0, n0) = probe()
    require(n0 == rows, s"row count $n0 != $rows before compaction")

    val tC = System.nanoTime()
    val compacted = LineageSink.compactData(spark, dir)
    val compactMs = ms(tC)
    val (files1, plan1, read1, n1) = probe()
    require(n1 == rows, s"row count $n1 != $rows after compaction")
    require(compacted == buckets, s"compacted $compacted != $buckets buckets")

    spark.conf.set("graft.lineage.staleMs", "0")
    val deleted = LineageSink.expireSuperseded(spark, dir, olderThanMs = 0L)
    spark.conf.unset("graft.lineage.staleMs")
    val (files2, plan2, read2, n2) = probe()
    require(n2 == rows, s"row count $n2 != $rows after expiry")

    println(s"""{"drive":"lineage-compaction","tasks":$tasks,""" +
      s""""buckets":$buckets,"rows":$rows,""" +
      s""""files_before":$files0,"plan_before_ms":$plan0,"read_before_ms":$read0,""" +
      s""""compacted_buckets":$compacted,"compact_ms":$compactMs,""" +
      s""""files_after":$files1,"plan_after_ms":$plan1,"read_after_ms":$read1,""" +
      s""""expired_files":$deleted,""" +
      s""""files_post_expiry":$files2,"plan_post_expiry_ms":$plan2,""" +
      s""""read_post_expiry_ms":$read2}""")
    spark.stop()
  }
}
