package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bucketing for co-located cell joins (SURVEY.md §4 partitioning strategy):
  * pre-bucketing both sides of a recurring join key (the cell id) removes
  * the shuffle exchanges entirely — the physical plan joins bucket-to-bucket.
  * This is the storage layout the engine's writer targets at 100-TB scale
  * (LineageSink buckets by coarse cell; Spark bucketBy gives the in-warehouse
  * equivalent). */
class BucketedJoinSpec extends AnyFunSuite {
  import SparkTestSession.spark

  test("cell-bucketed tables join without a shuffle exchange") {
    // warehouse.dir is static — tables land in ./spark-warehouse (gitignored)
    // and are dropped below
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val points = graft.sources.DerivedGeo.points(spark, "/root/testdata/sf0.001")
        .withColumn("cell", graft.functions.Gf.s2Cell(col("lng"), col("lat"), 8))
      val regions = points.groupBy("cell").agg(count(lit(1)).as("n_in_cell"))

      points.write.mode("overwrite").bucketBy(8, "cell")
        .sortBy("cell").saveAsTable("pts_bucketed")
      regions.write.mode("overwrite").bucketBy(8, "cell")
        .sortBy("cell").saveAsTable("cells_bucketed")

      val joined = spark.table("pts_bucketed")
        .join(spark.table("cells_bucketed"), Seq("cell"))
      val n = joined.count()
      assert(n === points.count())

      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n${plan.take(1500)}")
    } finally {
      spark.sql("DROP TABLE IF EXISTS pts_bucketed")
      spark.sql("DROP TABLE IF EXISTS cells_bucketed")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }
}
