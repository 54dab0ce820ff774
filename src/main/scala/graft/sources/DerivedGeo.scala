package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic synthetic geography derived from the driver's TPC-H-ish
  * parquet (TESTDATA.md) — no external data. Every formula uses only
  * integer modulo + exact decimal steps of 0.05/0.025 so the DuckDB oracle
  * reproduces the coordinates bit-exactly (the SQL mirror of each Column
  * lives next to it).
  *
  * Points sit on a 0.1° grid offset by +0.05; rect regions sit on 0.025
  * offsets — therefore no point ever lies on a rect or tile boundary and
  * closed-vs-half-open edge semantics cannot disagree between the JTS join
  * and the arithmetic oracle.
  */
object DerivedGeo {

  /** (point_id, lng, lat) from orders — one synthetic geotag per order. */
  def points(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/orders.parquet").select(
      col("o_orderkey").as("point_id"),
      (col("o_orderkey") % 3600) / 10.0 - 180.0 + 0.05 as "lng",
      ((col("o_orderkey") * 7) % 1200) / 10.0 - 60.0 + 0.05 as "lat")

  val pointsSql: String =
    """SELECT o_orderkey AS point_id,
      |       (o_orderkey % 3600) / 10.0 - 180.0 + 0.05 AS lng,
      |       ((o_orderkey * 7) % 1200) / 10.0 - 60.0 + 0.05 AS lat
      |FROM orders""".stripMargin

  /** 5×5 overlapping rect regions from nation (25 rows): region_id =
    * nationkey as string, bounds on 0.025 offsets, neighbours overlap by
    * ~5° so points can match multiple regions. */
  def rects(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/nation.parquet").select(
      col("n_nationkey").cast("string").as("region_id"),
      ((col("n_nationkey") % 5) * 20 - 50 + 0.025).as("xmin"),
      ((col("n_nationkey") % 5) * 20 - 50 + 0.025 + 24.95).as("xmax"),
      (((col("n_nationkey") - col("n_nationkey") % 5) / 5).cast("int") * 12 - 30 + 0.025).as("ymin"),
      (((col("n_nationkey") - col("n_nationkey") % 5) / 5).cast("int") * 12 - 30 + 0.025 + 14.95).as("ymax"))

  val rectsSql: String =
    """SELECT CAST(n_nationkey AS VARCHAR) AS region_id,
      |       (n_nationkey % 5) * 20 - 50 + 0.025 AS xmin,
      |       (n_nationkey % 5) * 20 - 50 + 0.025 + 24.95 AS xmax,
      |       CAST((n_nationkey - n_nationkey % 5) / 5 AS INT) * 12 - 30 + 0.025 AS ymin,
      |       CAST((n_nationkey - n_nationkey % 5) / 5 AS INT) * 12 - 30 + 0.025 + 14.95 AS ymax
      |FROM nation""".stripMargin

  /** Rects as a regions table (region_id, geom WKB) for the spatial joiner. */
  def rectRegions(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.functions.Gf
    rects(spark, sfDir).select(
      col("region_id"),
      Gf.stBox(col("xmin"), col("ymin"), col("xmax"), col("ymax"))
        .as(graft.operators.Tables.Geometry))
  }

  /** Points as a features table (feature_id, geom WKB). */
  def pointFeatures(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.functions.Gf
    points(spark, sfDir).select(
      col("point_id").cast("string").as(graft.operators.Tables.FeaturesIndex),
      Gf.stPoint(col("lng"), col("lat")).as(graft.operators.Tables.Geometry))
  }

  /** Slippy x/y with the oracle-parity formula: `round(_, 6)` before floor
    * kills libm ULP differences between JVM and DuckDB (math identical to
    * graft.core.Slippy, asserted in tests). */
  def tileX(lng: Column, zoom: Int): Column =
    floor(round((lng + 180.0) / 360.0 * (1 << zoom), 6)).cast("int")
  def tileY(lat: Column, zoom: Int): Column =
    floor(round((lit(1.0) - log(tan(radians(lat)) + lit(1.0) / cos(radians(lat))) / lit(math.Pi))
      / 2.0 * (1 << zoom), 6)).cast("int")

  def tileXSql(lng: String, zoom: Int): String =
    s"CAST(floor(round(($lng + 180.0) / 360.0 * ${1 << zoom}, 6)) AS INT)"
  def tileYSql(lat: String, zoom: Int): String =
    s"CAST(floor(round((1.0 - ln(tan(radians($lat)) + 1.0 / cos(radians($lat))) / pi()) / 2.0 * ${1 << zoom}, 6)) AS INT)"
}
