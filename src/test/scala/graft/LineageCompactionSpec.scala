package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.LineageSink

/** Manifest log compaction: the commit log collapses to one file behind a
  * version pointer, every read/commit path follows the pointer, and a crash
  * between version write and pointer swap falls back to the highest
  * complete version. */
class LineageCompactionSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  private def parquetFiles(d: String): Seq[java.io.File] = {
    val f = new java.io.File(d)
    if (!f.exists()) Nil
    else f.listFiles().toSeq.filter(_.getName.endsWith(".parquet"))
  }

  test("compaction: one file + pointer; commits and resume keep composing") {
    val dir = java.nio.file.Files.createTempDirectory("lineage-compact").toString
    def slice(k: Int) =
      (k * 50 until (k + 1) * 50).map(i => (i.toLong, s"b${i / 10}"))
        .toDF("id", "bucket")
    for (k <- 0 until 5) LineageSink.write(slice(k), dir, "bucket")
    assert(parquetFiles(s"$dir/manifest").size >= 5) // flat log grew

    val before = LineageSink.manifest(spark, dir)
      .agg(sum("rows"), count(lit(1))).collect()(0)
    LineageSink.compactManifest(spark, dir)
    assert(new java.io.File(s"$dir/manifest/CURRENT").exists())
    assert(parquetFiles(s"$dir/manifest/v1").size === 1)
    assert(parquetFiles(s"$dir/manifest").isEmpty) // flat files retired
    val after = LineageSink.manifest(spark, dir)
      .agg(sum("rows"), count(lit(1))).collect()(0)
    assert(after === before)

    // commits append into the versioned dir; resume still skips committed
    LineageSink.write(slice(5), dir, "bucket")
    LineageSink.resumeWrite(slice(5), dir, "bucket") // no-op
    assert(spark.read.parquet(s"$dir/data").count() === 300)
    assert(LineageSink.manifest(spark, dir)
      .agg(sum("rows")).collect()(0).getLong(0) === 300)

    // second compaction rolls the version and retires v1
    LineageSink.compactManifest(spark, dir)
    assert(new java.io.File(s"$dir/manifest/v2").exists())
    assert(!new java.io.File(s"$dir/manifest/v1").exists())
    assert(LineageSink.manifest(spark, dir)
      .agg(sum("rows")).collect()(0).getLong(0) === 300)
  }

  test("crash between version write and pointer swap: highest complete version wins") {
    val dir = java.nio.file.Files.createTempDirectory("lineage-compact2").toString
    val df = (0 until 100).map(i => (i.toLong, s"b${i % 4}")).toDF("id", "bucket")
    LineageSink.write(df, dir, "bucket")
    LineageSink.compactManifest(spark, dir) // → v1 + CURRENT

    // fabricate the crash: a COMPLETE v2 exists but the pointer never swapped
    val v1 = new java.io.File(s"$dir/manifest/v1")
    val v2 = new java.io.File(s"$dir/manifest/v2")
    v2.mkdirs()
    v1.listFiles().foreach { f =>
      java.nio.file.Files.copy(f.toPath, v2.toPath.resolve(f.getName))
    }
    new java.io.File(s"$dir/manifest/CURRENT").delete()

    assert(LineageSink.manifest(spark, dir)
      .agg(sum("rows")).collect()(0).getLong(0) === 100)
    // resume over the fallback view stays a no-op
    LineageSink.resumeWrite(df, dir, "bucket")
    assert(spark.read.parquet(s"$dir/data").count() === 100)
    // the next compaction restores the pointer
    LineageSink.compactManifest(spark, dir)
    assert(new java.io.File(s"$dir/manifest/CURRENT").exists())
    assert(LineageSink.manifest(spark, dir)
      .agg(sum("rows")).collect()(0).getLong(0) === 100)
  }
}
