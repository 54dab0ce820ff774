package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{Gf, ImageOps}
import graft.operators.Dedup
import graft.sources.Images

/** Round-6 image NEAR-dup (phash hamming banding) — the re-encoded-copy
  * detector the md5 exact pass cannot express. Ground truth comes from the
  * deterministic synthetic corpus: images sharing a pattern are
  * byte-identical (phash hamming 0), a jpeg re-encode moves the phash by at
  * most 1 bit on every one of the 512 patterns (PhashProbe), and distinct
  * patterns differ visually. */
class ImagePhashSpec extends AnyFunSuite {
  import SparkTestSession.spark

  private def images(n: Int, patterns: Int = 64) =
    Images.synthesize(spark, n.toLong, patterns).toDF()

  test("phashPairsFromBytes finds every planted re-encoded copy at hamming <= 3") {
    Gf.register(spark)
    val base = images(120).select(col("image_id"), col("bytes"))
    val aug = base.unionAll(
      base.where(Images.key(col("image_id")) % 3 === 0)
        .select(concat(lit("re_"), col("image_id")).as("image_id"),
          Gf.imgReencode(col("bytes"), lit("jpeg")).as("bytes")))
    val out = Dedup.phashPairsFromBytes(aug, "image_id", "bytes", maxHamming = 3)
      .where(col("id_b") === concat(lit("re_"), col("id_a")))
      .collect()
    val expected = (0 until 120).filter(_ % 3 == 0)
    assert(out.length === expected.size)
    assert(out.map(_.getString(0)).sorted.toSeq ===
      expected.map(k => f"img_$k%09d"))
    // every planted pair is within 1 bit (the PhashProbe ground truth)
    assert(out.forall(_.getInt(2) <= 1))
  }

  test("phashPairs on the precomputed column matches the bytes path exactly") {
    Gf.register(spark)
    val withHash = images(90)
      .select(col("image_id"), col("bytes"), col("phash"))
    val fromBytes = Dedup.phashPairsFromBytes(withHash, "image_id", "bytes",
        maxHamming = 2).collect().map(r => (r.getString(0), r.getString(1), r.getInt(2)))
    val fromCol = Dedup.phashPairs(withHash, "image_id", "phash",
        maxHamming = 2).collect().map(r => (r.getString(0), r.getString(1), r.getInt(2)))
    assert(fromBytes.sorted.toSeq === fromCol.sorted.toSeq)
    assert(fromCol.nonEmpty, "pattern-sharing images must pair at hamming 0")
  }

  test("far pairs are rejected and pigeonhole recall is exhaustive vs brute force") {
    Gf.register(spark)
    val n = 80
    val df = images(n, patterns = 40).select(col("image_id"), col("phash"))
    val rows = df.collect().map(r => (r.getString(0), r.getLong(1)))
    // brute-force truth at the threshold
    val truth = (for {
      i <- rows.indices; j <- (i + 1) until rows.length
      if java.lang.Long.bitCount(rows(i)._2 ^ rows(j)._2) <= 3
    } yield {
      val (a, b) = if (rows(i)._1 < rows(j)._1) (rows(i), rows(j)) else (rows(j), rows(i))
      (a._1, b._1)
    }).toSet
    val got = Dedup.phashPairs(df, "image_id", "phash", maxHamming = 3)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got === truth, "banded pairs must equal brute-force hamming<=3 truth")
    // and the emitted hamming is the true distance
    val hs = Dedup.phashPairs(df, "image_id", "phash", maxHamming = 3).collect()
    val byId = rows.toMap
    hs.foreach { r =>
      assert(r.getInt(2) ===
        java.lang.Long.bitCount(byId(r.getString(0)) ^ byId(r.getString(1))))
    }
  }

  test("bands=0 volume-aware width still finds identical-hash pairs") {
    Gf.register(spark)
    val df = images(60, patterns = 30).select(col("image_id"), col("phash"))
    // identical-copy recall is width-independent: pattern twins share the
    // hash, hence every chunk at every width
    val got = Dedup.phashPairs(df, "image_id", "phash", maxHamming = 0,
      bands = 0, nHint = 60L).collect()
    val twins = (0 until 30).count(p => true) // 60 rows, 30 patterns → 30 twin pairs
    assert(got.length >= twins)
    assert(got.forall(_.getInt(2) === 0))
  }

  test("jpeg re-encode changes bytes (md5-invisible) while phash stays near") {
    val r = Images.row(7L, 64)
    val re = ImageOps.reencode(r.bytes, "jpeg")
    assert(!java.util.Arrays.equals(r.bytes, re))
    assert(java.lang.Long.bitCount(r.phash ^ ImageOps.phash(re)) <= 1)
  }
}
