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
}
