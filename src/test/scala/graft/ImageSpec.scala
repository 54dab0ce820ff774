package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{Gf, ImageOps}
import graft.operators.Tiling
import graft.sources.Images

class ImageOpsSpec extends AnyFunSuite {
  test("png round-trip is lossless (PSNR capped at 99)") {
    for (pat <- 0 until 16) {
      val px = ImageOps.synthPixels(pat, 48, 32)
      val bytes = ImageOps.encode(px, 48, 32, "png")
      assert(ImageOps.decodeRgb(bytes) === px)
      assert(ImageOps.psnr(bytes, bytes) === 99.0)
    }
  }

  test("jpeg round-trip meets the PSNR >= 40 dB invariant (BASELINE input_hint)") {
    for (pat <- 0 until 32) {
      // jpeg patterns are %4==0 and stored grayscale (see ImageOps.toGray)
      val px = ImageOps.toGray(ImageOps.synthPixels(pat * 4, 48, 32))
      val png = ImageOps.encode(px, 48, 32, "png")
      val jpg = ImageOps.encode(px, 48, 32, "jpeg")
      val p = ImageOps.psnr(png, jpg)
      assert(p >= 40.0, s"pattern ${pat * 4}: PSNR $p < 40")
    }
  }

  test("synthesis is deterministic and byte-identical per pattern") {
    val a = Images.row(7, 512); val b = Images.row(7 + 512, 512)
    assert(a.bytes === b.bytes)     // same pattern → identical bytes
    assert(a.phash === b.phash)
    assert(a.caption !== b.caption) // captions differ per row
    val a2 = Images.row(7, 512)
    assert(a.bytes === a2.bytes && a.caption === a2.caption)
  }

  test("phash: identical images distance 0, different patterns far apart on average") {
    val h = (0 until 64).map(p => ImageOps.phashOfPixels(ImageOps.synthPixels(p, 48, 32), 48, 32))
    val dists = for (i <- h.indices; j <- 0 until i) yield ImageOps.hamming(h(i), h(j))
    assert(dists.sum.toDouble / dists.size > 8.0)
  }
}

class ImagePipelineSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  lazy val images = Images.synthesize(spark, 2000).toDF.cache()

  test("input table has exactly the input_hint schema") {
    assert(images.columns.toSeq ===
      Seq("image_id", "bytes", "w", "h", "fmt", "caption", "phash"))
    assert(images.count() === 2000)
  }

  test("per-row invariant: phash recomputed from stored bytes; caption regenerates byte-equal") {
    // phash recomputed from stored bytes equals the stored phash for lossless
    // rows; lossy rows stay within hamming 10
    val bad = images
      .withColumn("d", Gf.hamming64(col("phash"), Gf.imgPhash(col("bytes"))))
      .where((col("fmt") === "png" && col("d") =!= 0) ||
        (col("fmt") === "jpeg" && col("d") > 10))
    assert(bad.count() === 0)
    // caption byte-equality: regenerating from the key reproduces the column
    val caps = images.select("image_id", "caption").collect()
    caps.foreach { r =>
      val k = r.getString(0).substring(4).toLong
      assert(r.getString(1) === Images.caption(k))
    }
  }

  test("jpeg rows: stored bytes decode within PSNR >= 40 of the pristine png") {
    val jpegs = images.where(col("fmt") === "jpeg").limit(64).collect()
    jpegs.foreach { r =>
      val k = r.getAs[String]("image_id").substring(4).toLong
      val pat = k % 512
      val px = ImageOps.toGray(
        ImageOps.synthPixels(pat, r.getAs[Int]("w"), r.getAs[Int]("h")))
      val pristine = ImageOps.encode(px, r.getAs[Int]("w"), r.getAs[Int]("h"), "png")
      assert(ImageOps.psnr(pristine, r.getAs[Array[Byte]]("bytes")) >= 40.0)
    }
  }

  test("phash dedup groups equal the planted pattern groups") {
    // 2000 rows, 512 patterns → every pattern occurs 3 or 4 times and equal
    // patterns are byte-identical, so md5(bytes) groups == pattern groups.
    val got = images.groupBy(md5(col("bytes"))).agg(count(lit(1)).as("n"))
      .select("n").as[Long].collect().map(_.toInt).sorted
    val planted = (0L until 2000L).groupBy(_ % 512).values.map(_.size).toSeq.sorted
    assert(got.sum === 2000)
    assert(got.toSeq === planted)
    // phash-based grouping can only merge pattern groups, never split them
    val phashGroups = images.groupBy("w", "h", "phash").agg(count(lit(1)).as("n"))
      .select("n").as[Long].collect()
    assert(phashGroups.map(_.toInt).sum === 2000)
    assert(phashGroups.forall(_ >= 3))
  }

  test("patch grid: 16 patches per image at level+2, row-major positions") {
    val tagged = Images.withFootprint(images.limit(50))
    val patches = Tiling.patchGrid(tagged, 10, 12)
    val counts = patches.groupBy("image_id").agg(count(lit(1)).as("n"),
      countDistinct("patch_id").as("d"),
      min("pos").as("mn"), max("pos").as("mx"))
    assert(counts.where(col("n") =!= 16 || col("d") =!= 16 ||
      col("mn") =!= 0 || col("mx") =!= 15).count() === 0)
    // every patch's parent is the image cell
    val badParent = patches.where(
      Gf.s2Token(Gf.s2Parent(Gf.s2FromToken(col("patch_id")), 10)) =!= col("img_region_id"))
    assert(badParent.count() === 0)
    // regroup: ordered array of 16 per image
    val re = Tiling.regroup(patches, "patch_id")
    assert(re.where(size(col("patch_values")) =!= 16).count() === 0)
  }

  test("footprint cell assignment matches brute-force JTS join on a sample") {
    val sample = Images.withFootprint(images.limit(100), halfExtent = 0.05)
    val got = Tiling.assignCells(sample, 9)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    // brute force: every level-9 cell whose quad intersects the footprint
    val rows = sample.select("image_id", graft.operators.Tables.Geometry).collect()
    val brute = rows.flatMap { r =>
      val g = graft.core.Geo.fromWkb(r.getAs[Array[Byte]](1))
      graft.core.S2.cover(g, 9).map(c => (r.getString(0), graft.core.S2.toToken(c)))
    }.toSet
    assert(got === brute)
  }
}
