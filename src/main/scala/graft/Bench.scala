package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): runs headline queries on
  * SPARK_GRAFT_SF_DIR at local[SPARK_GRAFT_CPUS] and prints ONE JSON line.
  *
  * North-star metric (BASELINE.json): spatial-join + tile-assignment
  * throughput in images/sec — measured over the image pipeline
  * (synthesize+encode → tile-assign → footprint spatial join → exact dedup).
  * Scaling evidence: run this main at two parallelism levels (e.g.
  * SPARK_GRAFT_CPUS=8 and 32) on the same input; efficiency =
  * (T_N / T_4N) / 4. Results are recorded in BASELINE.md.
  */
object Bench {

  // Heavy/representative subset of SparkEntry.queries.
  val headline: Seq[String] = Seq(
    "q01_pricing_summary",   // scan-heavy hash agg
    "q05_tile_assign",       // pure-math tile assignment over points
    "q06_spatial_join",      // broadcast cell join + JTS refine (points)
    "q09_sessionize",        // window-function shuffle
    "q10_image_tile_counts", // image synth+encode + tile assignment
    "q11_image_footprint_join", // polygon cover join
    "q13_image_exact_dedup", // image bytes hash dedup
    "q17_exact_dedup",       // text dedup
    "q18_minhash_neardup",   // MinHash LSH + verify
    "q19_embed_neardup",     // hyperplane LSH + cosine verify
    "q20_ann_topk",          // brute-force ANN
    "q26_h3_assign",         // scalar H3 assignment over points
    "q28_skew_spatial_join") // hotspot-skewed salted spatial join

  // Queries whose wall-time together defines images/sec (each synthesizes
  // and consumes the full derived image table once).
  val imageQueries: Set[String] = Set(
    "q10_image_tile_counts", "q11_image_footprint_join", "q13_image_exact_dedup")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.local(cpus, "graft-bench")

    // Warm up JIT/codegen for every measured path outside the timed section
    // (image codecs and JTS dominate cold-start otherwise): small-scale
    // passes through the same operators.
    SparkEntry.queries("q01_pricing_summary")(spark, sfDir).count()
    graft.sources.Images.synthesize(spark, 4000).toDF
      .select(org.apache.spark.sql.functions.md5(
        org.apache.spark.sql.functions.col("bytes"))).distinct().count()
    SparkEntry.queries("q06_spatial_join")(spark, sfDir).count()
    SparkEntry.queries("q18_minhash_neardup")(spark, sfDir).count()

    val results = headline.map { name =>
      val fn = SparkEntry.queries(name)
      val t0 = System.nanoTime()
      val n = try fn(spark, sfDir).count() catch { case _: Throwable => -1L }
      val sec = (System.nanoTime() - t0) / 1e9
      (name, sec, n)
    }

    val nImages = spark.read.parquet(s"$sfDir/part.parquet").count() * 4
    val imageSec = results.filter(r => imageQueries(r._1)).map(_._2).sum
    val imagesPerSec = if (imageSec > 0) nImages * imageQueries.size / imageSec else 0.0

    val qs = results.map { case (k, v, _) => s""""$k":${f"$v%.3f"}""" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":${f"$total%.3f"},"unit":"sec","queries":$qs,"sf":"$sfDir","cpus":$cpus,"n_images":$nImages,"images_per_sec":${f"$imagesPerSec%.1f"}}""")
    spark.stop()
  }
}
