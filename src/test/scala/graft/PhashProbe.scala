package graft

import graft.functions.ImageOps
import graft.sources.Images

/** One-shot probe (not a spec): per-pattern phash hamming between an
  * original synthetic image and its jpeg re-encode, to establish the
  * planted-pair ground truth a q65 oracle can rely on. Run with
  * `sbt "Test/runMain graft.PhashProbe"`. */
object PhashProbe {
  def main(args: Array[String]): Unit = {
    var maxAll = 0; var maxJpegSrc = 0
    val histo = new Array[Int](65)
    for (pat <- 0 until 512) {
      val r = Images.row(pat.toLong, 512)
      val re = ImageOps.reencode(r.bytes, "jpeg")
      val d = java.lang.Long.bitCount(r.phash ^ ImageOps.phash(re))
      histo(d) += 1
      if (d > maxAll) maxAll = d
      if (r.fmt == "jpeg" && d > maxJpegSrc) maxJpegSrc = d
    }
    println(s"max hamming over all 512 patterns: $maxAll")
    println(s"max hamming over jpeg-source patterns: $maxJpegSrc")
    println("histogram: " + histo.zipWithIndex.filter(_._1 > 0)
      .map { case (c, d) => s"d=$d:$c" }.mkString(" "))
    // also: cross-pattern minimum (must stay ABOVE the threshold so no
    // organic pair sneaks into a planted-pair-filtered oracle... the query
    // filters to planted ids anyway, but good to know)
    val hashes = (0 until 512).map(p => Images.row(p.toLong, 512).phash)
    var minCross = 64
    for (i <- 0 until 512; j <- (i + 1) until 512) {
      val d = java.lang.Long.bitCount(hashes(i) ^ hashes(j))
      if (d < minCross) minCross = d
    }
    println(s"min cross-pattern hamming (originals): $minCross")
  }
}
