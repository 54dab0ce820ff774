package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.Gf

/** Core table contract (reference: srai/constants.py:8-13). */
object Tables {
  val RegionsIndex = "region_id"
  val FeaturesIndex = "feature_id"
  val Geometry = "geom"
}

/** Regionalizer contract (reference: srai/regionalizers/_base.py:8-36):
  * transform(areas(geom)) → regions(region_id, geom), with multipolygon
  * explode preprocessing and duplicate-cell dropping. Input validation
  * mirrors the reference's errors (empty input / missing geometry column →
  * error). */
trait Regionalizer {
  def transform(areas: DataFrame): DataFrame

  /** Opt-in eager emptiness check (the reference's ValueError): costs an
    * extra Spark job planning the full upstream query, so the default keeps
    * validation metadata-only — an empty input regionalizes to an empty
    * table, which is correct anyway. */
  protected def strictValidation: Boolean = false

  protected def validate(areas: DataFrame): Unit = {
    require(areas.columns.contains(Tables.Geometry),
      s"areas must have a '${Tables.Geometry}' column (WKB)")
    if (strictValidation)
      require(!areas.isEmpty, "Cannot regionalize an empty table")
  }

  /** explode multipolygons (reference: _base.py:26-36). */
  protected def parts(areas: DataFrame): DataFrame =
    areas.select(explode(Gf.stDump(col(Tables.Geometry))).as("part"))
}

/** S2 fixed-level covering (reference: srai/regionalizers/s2_regionalizer.py:54-102).
  * buffer=true → any-overlap cells (polyfill + intersects refine);
  * buffer=false → only cells fully within the area (within refine).
  * region_id = S2 token; geometry = planar 4-vertex cell polygon.
  *
  * Scale shape: one generator (`explode(s2_cover)`) per input part — no
  * join, no driver loop; `dropDuplicates` is the only shuffle, keyed by cell
  * id, so it partitions evenly by space. */
class S2Regionalizer(level: Int, buffer: Boolean = true) extends Regionalizer {
  require(level >= 0 && level <= 30, s"S2 level must be in [0, 30], got $level")

  override def transform(areas: DataFrame): DataFrame = {
    validate(areas)
    val covered = parts(areas)
      .select(col("part"), explode(Gf.s2Cover(col("part"), level)).as("cell"))
    val refined =
      if (buffer) covered
      else covered.where(Gf.stWithin(Gf.s2Boundary(col("cell")), col("part")))
    refined
      .select(col("cell")).dropDuplicates("cell")
      .select(
        Gf.s2Token(col("cell")).as(Tables.RegionsIndex),
        Gf.s2Boundary(col("cell")).as(Tables.Geometry))
  }
}

/** H3 hex covering (reference: srai/regionalizers/h3_regionalizer.py:52-87;
  * core conversion srai/h3.py:41-109). buffer=true → ContainmentMode.Covers
  * (any overlap); buffer=false → ContainsCentroid (srai/h3.py:78).
  * region_id = lowercase h3 string; geometry = hex boundary polygon. */
class H3Regionalizer(resolution: Int, buffer: Boolean = true) extends Regionalizer {
  require(resolution >= 0 && resolution <= 15,
    s"H3 resolution must be in [0, 15], got $resolution")

  override def transform(areas: DataFrame): DataFrame = {
    validate(areas)
    parts(areas)
      .select(explode(Gf.h3Cover(col("part"), resolution,
        containsCentroid = !buffer)).as("cell"))
      .dropDuplicates("cell")
      .select(
        Gf.h3Str(col("cell")).as(Tables.RegionsIndex),
        Gf.h3Boundary(col("cell")).as(Tables.Geometry))
  }
}

/** Spherical Voronoi regions from seed points (reference:
  * srai/regionalizers/voronoi_regionalizer.py:99-139). Seed tables are
  * small by construction (driver-side computation is the reference topology,
  * SURVEY §2.2 R4); the result broadcasts into joins like any regions
  * table. region_id = seed ordinal as string. */
class VoronoiRegionalizer(maxRadiusDeg: Double = 25.0) extends Regionalizer {
  override def transform(seedPoints: DataFrame): DataFrame = {
    validate(seedPoints)
    val spark = seedPoints.sparkSession
    // Region ids mirror the reference's GeoDataFrame INDEX: pass an explicit
    // `region_id` column for shuffled/multi-partition seed lineage —
    // DataFrames carry no row order, so the ordinal fallback is only
    // deterministic for ordered (local/single-partition) inputs.
    val hasId = seedPoints.columns.contains(Tables.RegionsIndex)
    val rows = (if (hasId)
      seedPoints.select(col(Tables.RegionsIndex).cast("string"), col(Tables.Geometry))
    else seedPoints.select(col(Tables.Geometry))).collect()
    val idsAndSeeds = rows.zipWithIndex.map { case (r, i) =>
      val g = graft.core.Geo.fromWkb(r.getAs[Array[Byte]](Tables.Geometry))
      require(g.getGeometryType == "Point", "Voronoi seeds must be points")
      val id = if (hasId) r.getString(0) else i.toString
      (id, (g.getCoordinate.x, g.getCoordinate.y))
    }.toSeq
    val cells = graft.core.Voronoi.cells(idsAndSeeds.map(_._2),
      maxRadiusDeg = maxRadiusDeg)
    import spark.implicits._
    idsAndSeeds.map(_._1).zip(cells).map { case (id, g) =>
      (id, graft.core.Geo.toWkb(g))
    }.toDF(Tables.RegionsIndex, Tables.Geometry)
  }
}

/** Slippy-map tiling (reference: srai/regionalizers/slippy_map_regionalizer.py:40-127).
  * region_id = "{x}_{y}_{z}"; extra x, y, z columns kept like the reference. */
class SlippyMapRegionalizer(zoom: Int) extends Regionalizer {
  graft.core.Slippy.checkZoom(zoom)

  override def transform(areas: DataFrame): DataFrame = {
    validate(areas)
    parts(areas)
      .select(explode(Gf.slippyCover(col("part"), zoom)).as("t"))
      .select(col("t.x").as("x"), col("t.y").as("y"))
      .dropDuplicates("x", "y")
      .select(
        concat_ws("_", col("x"), col("y"), lit(zoom)).as(Tables.RegionsIndex),
        col("x"), col("y"), lit(zoom).as("z"),
        Gf.slippyBoundary(col("x"), col("y"), zoom).as(Tables.Geometry))
  }
}
