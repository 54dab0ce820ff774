package graft

import org.apache.spark.sql.functions._
import graft.sources.{DerivedGeo, Images}

/** Ad-hoc profiling main: `sbt "Test/runMain graft.ProfileDrive [sfDir]"`. */
object ProfileDrive {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = GraftSession.local(8, "profile")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"PROFILE $name: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }
    // warm
    Images.synthesize(spark, 2000).toDF.select(md5(col("bytes"))).distinct().count()
    val fp = Images.withFootprint(Images.forTestdata(spark, dir).toDF,
      halfExtent = 0.02, skewHotPermille = 800)
      .select(col("image_id").as("feature_id"), col(operators.Tables.Geometry))
    time("a_synth_footprints")(fp.count())
    time("b_plus_cover")(fp.select(col("feature_id"),
      explode(functions.Gf.s2Cover(col(operators.Tables.Geometry), 6))).count())
    time("c_full_q28")(SparkEntry.queries("q28_skew_spatial_join")(spark, dir).count())
    time("c2_full_q28_again")(SparkEntry.queries("q28_skew_spatial_join")(spark, dir).count())
    time("d_full_q11")(SparkEntry.queries("q11_image_footprint_join")(spark, dir).count())
    spark.stop()
  }
}
