package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Benchmark main (driver contract): runs headline queries on
  * SPARK_GRAFT_SF_DIR at local[SPARK_GRAFT_CPUS] and prints ONE JSON line.
  *
  * North-star metric (BASELINE.json): spatial-join + tile-assignment
  * throughput in images/sec — measured over the image pipeline
  * (synthesize+encode → tile-assign → footprint spatial join → exact dedup).
  * Scaling evidence: run this main at two parallelism levels (e.g.
  * SPARK_GRAFT_CPUS=8 and 32) on the same input; efficiency =
  * (T_N / T_4N) / 4. Results are recorded in BASELINE.md.
  *
  * Noise robustness (the host is heavily CPU-oversubscribed — round-1's
  * single-shot run read 3× the repo baseline purely from steal): every
  * query runs `SPARK_GRAFT_REPS` times (default 3) inside ONE invocation;
  * the headline total is the per-query MEDIAN sum, with the MIN sum
  * reported alongside. A query failure is never swallowed: it is excluded
  * from all totals, reported in an `errors` field, and the process exits
  * non-zero.
  */
object Bench {

  // Heavy/representative probes. Most reuse SparkEntry.queries verbatim;
  // `h3_assign_points` keeps the round-1 q26 shape (scalar H3 assignment
  // over the full point table) now that q26 itself is a golden-fixture
  // certification query.
  private def h3AssignPoints(s: SparkSession, dir: String): DataFrame = {
    graft.functions.Gf.register(s)
    graft.sources.DerivedGeo.points(s, dir)
      .select(graft.functions.Gf.h3Str(graft.functions.Gf.h3Cell(
        col("lng"), col("lat"), 4)).as("region_id"))
      .groupBy("region_id").agg(count(lit(1)).as("n"))
  }

  /** The round-1 flagship shape at data scale: H3 regionalize a fixed area,
    * cell-join the full synthetic point field, CountEmbedder the result —
    * one lazy plan exercising regionalizer + joiner + embedder together
    * (the golden-certified q29 runs the same pipeline on the small
    * reference snapshot; this probe measures it on sf-scale data). */
  private def flagshipSynth(s: SparkSession, dir: String): DataFrame = {
    import graft.core.Geo
    import graft.functions.Gf
    import graft.operators._
    graft.functions.Gf.register(s)
    val area = s.createDataFrame(Seq(
      Tuple1(Geo.toWkb(Geo.box(-170.0, -10.0, -140.0, 15.0)))))
      .toDF(Tables.Geometry)
    val regions = new H3Regionalizer(3).transform(area)
    val features = graft.sources.DerivedGeo.points(s, dir)
      .select(col("point_id").cast("string").as(Tables.FeaturesIndex),
        Gf.stPoint(col("lng"), col("lat")).as(Tables.Geometry),
        when(col("point_id") % 3 === 0, lit("shop"))
          .when(col("point_id") % 3 === 1, lit("park"))
          .otherwise(lit(null)).as("amenity"))
      .where(col("lng").between(-175, -135) && col("lat").between(-15, 20))
    val joint = new IntersectionJoiner(cellLevel = 4, pointFeatures = true,
      broadcastRegions = Some(true)).transform(regions, features)
    new CountEmbedder(Seq("amenity_shop", "amenity_park"), countSubcategories = true)
      .transform(regions, features, joint)
  }

  val headline: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
    "q01_pricing_summary" -> SparkEntry.queries("q01_pricing_summary"), // scan-heavy hash agg
    "q05_tile_assign" -> SparkEntry.queries("q05_tile_assign"),         // pure-math tile assignment
    "q06_spatial_join" -> SparkEntry.queries("q06_spatial_join"),       // broadcast cell join + JTS refine
    "q09_sessionize" -> SparkEntry.queries("q09_sessionize"),           // window-function shuffle
    "q10_image_tile_counts" -> SparkEntry.queries("q10_image_tile_counts"), // image synth+encode + tiles
    "q11_image_footprint_join" -> SparkEntry.queries("q11_image_footprint_join"), // polygon cover join
    "q13_image_exact_dedup" -> SparkEntry.queries("q13_image_exact_dedup"), // image bytes hash dedup
    "q17_exact_dedup" -> SparkEntry.queries("q17_exact_dedup"),         // text dedup
    "q18_minhash_neardup" -> SparkEntry.queries("q18_minhash_neardup"), // MinHash LSH + verify
    "q19_embed_neardup" -> SparkEntry.queries("q19_embed_neardup"),     // hyperplane LSH + cosine verify
    "q20_ann_topk" -> SparkEntry.queries("q20_ann_topk"),               // brute-force ANN (bounded top-k)
    "h3_assign_points" -> (h3AssignPoints _),                           // scalar H3 assignment over points
    "flagship_synth" -> (flagshipSynth _),                               // regionalize→join→embed, one plan
    "q28_skew_spatial_join" -> SparkEntry.queries("q28_skew_spatial_join")) // hotspot-skewed salted join

  // Queries whose wall-time together defines images/sec (each synthesizes
  // and consumes the full derived image table once).
  val imageQueries: Set[String] = Set(
    "q10_image_tile_counts", "q11_image_footprint_join", "q13_image_exact_dedup")

  private def median(xs: Seq[Double]): Double = {
    val s = xs.sorted
    if (s.length % 2 == 1) s(s.length / 2)
    else (s(s.length / 2 - 1) + s(s.length / 2)) / 2.0
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val spark = GraftSession.local(cpus, "graft-bench")

    // Warm up JIT/codegen for every measured path outside the timed section
    // (image codecs and JTS dominate cold-start otherwise): small-scale
    // passes through the same operators.
    SparkEntry.queries("q01_pricing_summary")(spark, sfDir).count()
    graft.sources.Images.synthesize(spark, 4000).toDF
      .select(md5(col("bytes"))).distinct().count()
    SparkEntry.queries("q06_spatial_join")(spark, sfDir).count()
    SparkEntry.queries("q18_minhash_neardup")(spark, sfDir).count()

    case class R(name: String, med: Double, min: Double, n: Long, err: Option[String])

    val results: Seq[R] = headline.map { case (name, fn) =>
      val runs = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        try {
          val n = fn(spark, sfDir).count()
          Right(((System.nanoTime() - t0) / 1e9, n))
        } catch { case e: Throwable => Left(s"${e.getClass.getSimpleName}: ${e.getMessage}") }
      }
      val ok = runs.collect { case Right(v) => v }
      if (ok.isEmpty) R(name, -1, -1, -1, runs.collectFirst { case Left(m) => m })
      else R(name, median(ok.map(_._1)), ok.map(_._1).min, ok.head._2,
        runs.collectFirst { case Left(m) => m })
    }

    val failed = results.filter(r => r.err.isDefined)
    val good = results.filter(_.med >= 0)
    val nImages = spark.read.parquet(s"$sfDir/part.parquet").count() * 4
    val imageOk = imageQueries.forall(q => good.exists(_.name == q))
    val imageSec = good.filter(r => imageQueries(r.name)).map(_.med).sum
    val imagesPerSec =
      if (imageOk && imageSec > 0) nImages * imageQueries.size / imageSec else -1.0

    def fmt(v: Double) = f"$v%.3f"
    val qs = good.map(r => s""""${r.name}":${fmt(r.med)}""").mkString("{", ",", "}")
    val qmin = good.map(r => s""""${r.name}":${fmt(r.min)}""").mkString("{", ",", "}")
    val errs = failed.map(r => s""""${r.name}":"${r.err.get.replace("\"", "'")}"""")
      .mkString("{", ",", "}")
    val total = good.map(_.med).sum
    val totalMin = good.map(_.min).sum
    println(s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$qs,"queries_min":$qmin,"total_min":${fmt(totalMin)},"reps":$reps,"errors":$errs,"n_failed":${failed.size},"sf":"$sfDir","cpus":$cpus,"n_images":$nImages,"images_per_sec":${f"$imagesPerSec%.1f"}}""")
    spark.stop()
    if (failed.nonEmpty) sys.exit(1)
  }
}
