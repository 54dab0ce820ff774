package graft

import org.apache.spark.sql.functions._
import graft.sources.{DerivedGeo, Images}

/** Ad-hoc profiling main: `sbt "Test/runMain graft.ProfileDrive [sfDir]"`. */
object ProfileDrive {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = GraftSession.local(32, "profile")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"PROFILE $name: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }
    time("synth_count")(Images.forTestdata(spark, dir).count())
    time("synth_count2")(Images.forTestdata(spark, dir).count())
    time("synth_md5")(Images.forTestdata(spark, dir).toDF
      .select(md5(col("bytes")).as("h")).groupBy("h").count().count())
    val k = Images.key(col("image_id"))
    time("synth_tile")(Images.forTestdata(spark, dir).toDF
      .select(concat_ws("_",
        DerivedGeo.tileX(Images.lng(k), 8).cast("string"),
        DerivedGeo.tileY(Images.lat(k), 8).cast("string"),
        lit("8")).as("tile_id"))
      .groupBy("tile_id").count().count())
    time("q10_full")(SparkEntry.queries("q10_image_tile_counts")(spark, dir).count())
    time("q11_full")(SparkEntry.queries("q11_image_footprint_join")(spark, dir).count())
    spark.stop()
  }
}
