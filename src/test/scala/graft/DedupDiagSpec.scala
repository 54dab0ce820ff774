package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{DiagLog, WarnLargeBucket}
import graft.operators.Dedup

/** Round-5 ADVICE: the uncapped simhash path's n² blowup on a degenerate
  * bucket must be diagnosable (a loud, rate-limited executor warning), while
  * staying a pure pass-through — same rows out, recall untouched. */
class DedupDiagSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  test("warn_large_bucket passes values through and fires once per tag") {
    DiagLog.reset()
    val w = org.apache.spark.sql.expressions.Window.partitionBy("k")
    val df = (0 until 10).map(i => (i.toLong, 1L)).toDF("id", "k")
      .withColumn("__bsz", count(lit(1)).over(w))
    val loud = df.withColumn("id", call_function("warn_large_bucket",
      col("id"), col("__bsz"), lit(5L), lit("diag-spec-over"))).drop("__bsz")
    assert(loud.select("id").orderBy("id").collect().map(_.getLong(0)).toSeq
      === (0L until 10L))
    assert(DiagLog.firedTags.contains("diag-spec-over"))
    // below the threshold: silent
    val quiet = df.withColumn("id", call_function("warn_large_bucket",
      col("id"), col("__bsz"), lit(50L), lit("diag-spec-under"))).drop("__bsz")
    quiet.collect()
    assert(!DiagLog.firedTags.contains("diag-spec-under"))
  }

  test("uncapped simhashPairs carries the diagnostic and output is unchanged") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text")).limit(400)
    val loud = Dedup.simhashPairs(docs, "doc_id", "text")
    // the analyzed plan carries the pass-through warn on the id column
    val hasWarn = loud.queryExecution.analyzed.collect {
      case p if p.expressions.exists(_.collectFirst {
        case _: WarnLargeBucket => () }.nonEmpty) => p
    }.nonEmpty
    assert(hasWarn, "uncapped simhashPairs plan lost the WarnLargeBucket diagnostic")
    // pure pass-through: same pairs as a capped run whose cap nothing hits
    val capped = Dedup.simhashPairs(docs, "doc_id", "text",
      maxBucketSize = 1000000)
    assert(loud.exceptAll(capped).count() === 0)
    assert(capped.exceptAll(loud).count() === 0)
  }

  test("suggestSimhashBands widens chunks as the corpus grows; identical-copy recall is width-independent") {
    // the budget walk: finest chunking whose random collision load stays flat
    assert(Dedup.suggestSimhashBands(50) === 8)
    assert(Dedup.suggestSimhashBands(1000) === 4)
    assert(Dedup.suggestSimhashBands(32768) === 4)
    assert(Dedup.suggestSimhashBands(320000) === 2)
    assert(Dedup.suggestSimhashBands(4L * 1000 * 1000 * 1000) === 2)
    assert(Dedup.suggestSimhashBands(1L << 40) === 1)
    // planted identical copies are found at EVERY width the auto mode can
    // pick — equal hashes share every chunk — including bands = 1
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text")).limit(200)
    val aug = docs.unionAll(docs.where(col("doc_id") % 7 === 0)
      .select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
    val planted = aug.where(col("doc_id") % 7 === 0 && col("doc_id") < 1000000L).count()
    for (b <- Seq(1, 2, 4, 0)) {
      val found = Dedup.simhashJaccardPairs(aug, "doc_id", "text",
          threshold = 0.9, bands = b)
        .where(col("id_b") === col("id_a") + 1000000L).count()
      assert(found === planted, s"bands=$b missed planted copies: $found/$planted")
    }
  }
}
