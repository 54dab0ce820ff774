package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Images

/** Round-7 optimization guard: the Images table became a per-column
  * Catalyst projection (img_synth / img_synth_phash) so column pruning can
  * drop the PNG/JPEG encode for key-only consumers. Two contracts:
  *
  *  1. EQUIVALENCE — every column of the projected table is identical to
  *     the historical driver-side Images.row derivation (bytes compared
  *     byte-for-byte; jpeg + all three widths + caption digit carries all
  *     exercised, plus a key above the img_%09d 9-digit range).
  *  2. PRUNING — a consumer that only reads image_id plans WITHOUT the
  *     img_synth / img_synth_phash kernels (the whole point of the change).
  */
class ImageSynthProjectionSpec extends AnyFunSuite {
  import SparkTestSession.spark

  test("projected synthesis is identical to Images.row on every column") {
    val keys = ((0L until 40L) ++ Seq(97L, 511L, 512L, 513L, 999L, 1000L,
      123456L, 1234567890123L)).toArray
    import spark.implicits._
    val got = Images.synthesizeKeys(keys.toSeq.toDF("k")).toDF()
      .collect().map(r => (r.getString(0), r)).toMap
    assert(got.size === keys.length)
    keys.foreach { k =>
      val exp = Images.row(k, Images.DefaultPatterns)
      val r = got(exp.image_id)
      assert(java.util.Arrays.equals(r.getAs[Array[Byte]]("bytes"), exp.bytes),
        s"bytes differ for k=$k")
      assert(r.getAs[Int]("w") === exp.w, s"w differs for k=$k")
      assert(r.getAs[Int]("h") === exp.h, s"h differs for k=$k")
      assert(r.getAs[String]("fmt") === exp.fmt, s"fmt differs for k=$k")
      assert(r.getAs[String]("caption") === exp.caption, s"caption differs for k=$k")
      assert(r.getAs[Long]("phash") === exp.phash, s"phash differs for k=$k")
    }
  }

  test("key-only consumers prune the encode kernels out of the plan") {
    val df = Images.synthesize(spark, 100L).toDF().select(col("image_id"))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("img_synth"), s"encode kernel not pruned:\n$plan")
    // and the full table still carries them
    val full = Images.synthesize(spark, 100L).toDF()
    val fullPlan = full.queryExecution.executedPlan.toString
    assert(fullPlan.contains("img_synth"))
  }
}
