package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Gf

/** Spatial equi-pair join — the engine's flagship operator.
  *
  * Reference semantics (srai/joiners/intersection_joiner.py:89-112): all
  * (region_id, feature_id) pairs whose geometries intersect; with
  * `returnGeom` also the intersection geometry (:62-87). The reference uses
  * an in-memory STRtree; the distributed plan here is the cell-indexed hash
  * join of SURVEY.md J1:
  *
  *   regions --explode(s2_cover(geom, L))--> (cell, region)
  *   features --s2_cell / s2_cover--> (cell, feature)
  *   join on cell (hash/broadcast)  →  exact JTS `st_intersects` refinement
  *   → dropDuplicates(pair)
  *
  * Scale properties: the only shuffles are the cell-keyed join and the pair
  * dedup; the cell join key distributes by space, AQE skew-join splits hot
  * (urban) cells, and `salt > 0` adds explicit replicate-and-salt for the
  * region side when a known-hot workload needs it. Small region tables
  * broadcast (explicitly via `broadcastRegions` or by Spark's threshold).
  *
  * @param cellLevel   S2 level of the index grid. Pick so a typical region
  *                    geometry covers a handful of cells (default 12 ≈ 3 km).
  * @param pointFeatures fast path: features are points → scalar single-cell
  *                    assignment (no cover, no dedup needed for the feature
  *                    side; SURVEY.md J4). Correct for any point input.
  * @param boxFeatures fast path for axis-aligned box footprints (image
  *                    footprints): Some(h) asserts every feature geometry is
  *                    a box of half-extent ≤ h around its centroid. The
  *                    feature side then emits ONE center cell per row (no
  *                    cover explode, no pair-dedup exchange — a box
  *                    intersecting k cells otherwise multiplies the probe
  *                    side ×k) while the region side covers its envelope
  *                    dilated by h, which is lossless for such boxes; the
  *                    exact st_intersects refinement stays unchanged. At
  *                    planetary image volumes this removes the ×~4 cover
  *                    explosion of the BIG side in exchange for a perimeter
  *                    ring on the SMALL side.
  * @param broadcastRegions force (true) / forbid (false) broadcast of the
  *                    exploded region side; None → Spark decides.
  * @param salt        explicit skew salting factor for the feature side
  *                    (0 = rely on AQE).
  * @param strict      also assert both inputs are non-empty before planning,
  *                    mirroring the reference's eager ValueError
  *                    (intersection_joiner.py:43-51). Off by default: the
  *                    check costs two extra Spark jobs per transform — real
  *                    overhead in a pipeline that joins thousands of times —
  *                    and an empty input yields an empty (correct) join
  *                    anyway. Schema validation is always eager (free).
  */
object IntersectionJoiner {

  /** Auto-level joiner: the S2 index level is derived from the REGION set
    * at transform time via [[suggestLevel]] (cellLevel = None mode). Use
    * when region extents are not known up front — city blocks want level
    * ~13-14, country-scale polygons ~5, continents ~2, and a fixed default
    * mis-sizes two of the three. */
  def auto(pointFeatures: Boolean = false,
           broadcastRegions: Option[Boolean] = None,
           salt: Int = 0, strict: Boolean = false,
           boxFeatures: Option[Double] = None,
           targetCells: Int = 4): IntersectionJoiner =
    new IntersectionJoiner(12, pointFeatures, broadcastRegions, salt, strict,
      boxFeatures) {
      override protected def resolveLevel(regions: org.apache.spark.sql.DataFrame): Int =
        suggestLevel(regions, targetCells = targetCells)
    }

  /** Suggest an S2 index level so a typical region covers ≈ `targetCells`
    * cells: sample region envelopes and size the cell edge to
    * extent / sqrt(targetCells). The right level balances cover-explosion
    * (too fine → huge exploded build side) against refine cost (too coarse
    * → every feature meets every region in the cell) — the dominant knob at
    * 100-TB scale. Measured on the 5×5 grid-region fixture (AutoLevelSpec):
    * the suggested level keeps the per-region cover at ~`targetCells` cells
    * while finer levels inflate the exploded build side geometrically and
    * coarser ones funnel every region into a shared cell (all-pairs
    * refine). */
  def suggestLevel(regions: org.apache.spark.sql.DataFrame,
                   sampleSize: Int = 256, targetCells: Int = 4): Int = {
    // a RANDOM sample, not the first `sampleSize` rows: region tables are
    // often sorted by size (an aggregation output shape), and the head
    // slice would then mis-size the level for the whole join. Seeded
    // rand + limit plans as TakeOrderedAndProject — a per-partition top-K,
    // never a global sort — so the sample stays O(sampleSize) per task at
    // any region count, and the seed keeps resolveLevel deterministic
    // across retries of one job.
    val rows = regions.select(Tables.Geometry)
      .orderBy(rand(20260817L)).limit(sampleSize).collect()
    require(rows.nonEmpty, "empty regions")
    val extents = rows.map { r =>
      val e = graft.core.Geo.fromWkb(r.getAs[Array[Byte]](0)).getEnvelopeInternal
      math.max(e.getWidth, e.getHeight)
    }.sorted
    val median = math.max(1e-9, extents(extents.length / 2))
    val edge = median / math.sqrt(targetCells.toDouble)
    val level = math.round(math.log(90.0 / edge) / math.log(2.0)).toInt
    math.max(0, math.min(30, level))
  }
}

class IntersectionJoiner(
    cellLevel: Int = 12,
    pointFeatures: Boolean = false,
    broadcastRegions: Option[Boolean] = None,
    salt: Int = 0,
    strict: Boolean = false,
    boxFeatures: Option[Double] = None) {

  /** Both fast paths key each feature by its single center cell. */
  private val centerKeyed = pointFeatures || boxFeatures.isDefined

  /** The index level for this transform — the fixed `cellLevel` here;
    * [[IntersectionJoiner.auto]] overrides it to sample the region set. */
  protected def resolveLevel(regions: DataFrame): Int = cellLevel

  import Tables._

  def transform(regions: DataFrame, features: DataFrame,
                returnGeom: Boolean = false): DataFrame = {
    validate(regions, "regions")
    validate(features, "features")

    val level = resolveLevel(regions)
    val rGeom = col("r_geom"); val fGeom = col("f_geom")

    val regionCover = boxFeatures match {
      case Some(h) => Gf.s2CoverExpanded(rGeom, level, h)
      case None => Gf.s2Cover(rGeom, level)
    }
    var regionCells = regions
      .select(col(RegionsIndex), col(Geometry).as("r_geom"))
      .withColumn("cell", explode(regionCover))
    val featureCell: Column =
      if (centerKeyed)
        Gf.s2Cell(call_function("st_centroid_x", fGeom),
          call_function("st_centroid_y", fGeom), level)
      else explode(Gf.s2Cover(fGeom, level))
    var featureCells = features
      .select(col(FeaturesIndex), col(Geometry).as("f_geom"))
      .withColumn("cell", featureCell)

    if (salt > 0) {
      regionCells = regionCells.withColumn("s",
        explode(lit((0 until salt).toArray)))
      featureCells = featureCells.withColumn("s",
        pmod(xxhash64(col(FeaturesIndex)), lit(salt)).cast("int"))
    }
    val joinKeys = if (salt > 0) Seq("cell", "s") else Seq("cell")

    val left = broadcastRegions match {
      case Some(true) => broadcast(regionCells)
      case _ => regionCells
    }
    val matched = featureCells
      .join(left, joinKeys, "inner")
      .where(Gf.stIntersects(rGeom, fGeom))

    // Pair dedup is only needed when the same (region, feature) pair can
    // meet in MORE THAN ONE cell — i.e. when the feature side is an exploded
    // cover. A point maps to exactly one cell (and, when salted, to exactly
    // one salt), so the fast path emits each pair once by construction and
    // skips the dedup exchange entirely.
    if (returnGeom) {
      // the intersection geometry needs both geoms: compute it BEFORE the
      // dedup so the exchange carries one result geometry, not two inputs
      val withGeom = matched.select(col(RegionsIndex), col(FeaturesIndex),
        Gf.stIntersection(rGeom, fGeom).as(Geometry))
      if (centerKeyed) withGeom
      else withGeom.dropDuplicates(RegionsIndex, FeaturesIndex)
    } else {
      // ids only — never shuffle WKB payload through the pair dedup
      val pairs = matched.select(col(RegionsIndex), col(FeaturesIndex))
      if (centerKeyed) pairs
      else pairs.dropDuplicates(RegionsIndex, FeaturesIndex)
    }
  }

  private def validate(df: DataFrame, side: String): Unit = {
    require(df.columns.contains(Geometry),
      s"$side must have a '$Geometry' column (reference raises ValueError)")
    if (strict)
      require(!df.isEmpty, s"$side table is empty (reference raises ValueError)")
  }
}
