package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Optimization-round probe harness (guide §1.4): times ISOLATED pieces of
  * the heavy bench queries through the noop sink so per-stage cost is
  * attributable. NOT part of the driver contract — graft.Bench is the only
  * measured harness; numbers from here are cited in OPTIMIZATION_r*.md
  * only.
  *
  *   SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_CPUS=32 sbt "runMain graft.BenchExtra"
  */
object BenchExtra {

  private def noop(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val spark = GraftSession.local(cpus, "graft-benchextra")
    import graft.functions.Gf
    import graft.sources.{DerivedGeo, Images}

    // warm the same kernels Bench warms
    SparkEntry.queries("q01_pricing_summary")(spark, sfDir).count()
    Images.synthesize(spark, 4000).toDF
      .select(md5(col("bytes"))).distinct().count()
    SparkEntry.queries("q06_spatial_join")(spark, sfDir).count()
    SparkEntry.queries("q18_minhash_neardup")(spark, sfDir).count()

    val probes: Seq[(String, () => Unit)] = Seq(
      // ---- job-floor reference: count over a tiny scan ----
      "floor_nation_count" -> (() =>
        noop(spark.read.parquet(s"$sfDir/nation.parquet"))),
      // ---- q06 decomposition ----
      "q06_full" -> (() =>
        noop(SparkEntry.queries("q06_spatial_join")(spark, sfDir))),
      "q06_pointside_cells" -> (() =>
        noop(DerivedGeo.pointFeatures(spark, sfDir)
          .select(Gf.s2Cell(
            call_function("st_centroid_x", col(operators.Tables.Geometry)),
            call_function("st_centroid_y", col(operators.Tables.Geometry)), 6)
            .as("cell")))),
      "q06_pointside_wkb_only" -> (() =>
        noop(DerivedGeo.pointFeatures(spark, sfDir))),
      "q06_points_scan" -> (() =>
        noop(DerivedGeo.points(spark, sfDir))),
      // ---- q13 decomposition ----
      "q13_full" -> (() =>
        noop(SparkEntry.queries("q13_image_exact_dedup")(spark, sfDir))),
      "q13_synth_bytes" -> (() =>
        noop(Images.forTestdata(spark, sfDir).toDF.select(col("bytes")))),
      "q13_synth_md5" -> (() =>
        noop(Images.forTestdata(spark, sfDir).toDF
          .select(md5(col("bytes")).as("h")))),
      // ---- q10 decomposition ----
      "q10_full" -> (() =>
        noop(SparkEntry.queries("q10_image_tile_counts")(spark, sfDir))),
      "q10_ids_only" -> (() =>
        noop(Images.forTestdata(spark, sfDir).toDF.select(col("image_id")))),
      // ---- q18 decomposition ----
      "q18_full" -> (() =>
        noop(SparkEntry.queries("q18_minhash_neardup")(spark, sfDir))),
      "q18_shingle_sig" -> (() => {
        val docs = spark.read.parquet(s"$sfDir/documents.parquet")
        noop(docs.select(col("doc_id"),
          Gf.minhashSig(Gf.wordShingles(col("text"), 3), 64).as("sig")))
      }),
      "q18_shingles_only" -> (() => {
        val docs = spark.read.parquet(s"$sfDir/documents.parquet")
        noop(docs.select(col("doc_id"),
          size(Gf.wordShingles(col("text"), 3)).as("n")))
      }),
      // ---- q09 decomposition ----
      "q09_full" -> (() =>
        noop(SparkEntry.queries("q09_sessionize")(spark, sfDir))),
      "q09_events_scan" -> (() =>
        noop(spark.read.parquet(s"$sfDir/events.parquet"))),
      // ---- q19 / q28 ----
      "q19_full" -> (() =>
        noop(SparkEntry.queries("q19_embed_neardup")(spark, sfDir))),
      "q28_full" -> (() =>
        noop(SparkEntry.queries("q28_skew_spatial_join")(spark, sfDir))))

    val out = probes.map { case (name, fn) =>
      spark.sparkContext.setJobDescription(name)
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        fn()
        (System.nanoTime() - t0) / 1e9
      }
      spark.sparkContext.setJobDescription(null)
      f""""$name":{"med":${ts.sorted.apply(ts.length / 2)}%.3f,"min":${ts.min}%.3f}"""
    }
    println(out.mkString("{", ",", "}"))
    spark.stop()
  }
}
