package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Gf

/** Raster↔vector tiling: assign images to covering cells and expand images
  * into patch grids (the S2Vec pipeline core, reference:
  * srai/embedders/s2vec/s2_utils.py:75-106 + embedder.py:211-241).
  *
  * All operators are generator-expression shaped (explode of a per-row cell
  * array) — embarrassingly parallel, no shuffle until the caller aggregates.
  */
object Tiling {

  /** (image_id, region_id) for every S2 cell of `level` covering the image
    * footprint (polygon path; for pure geotags use s2_cell directly). */
  def assignCells(imagesWithGeom: DataFrame, level: Int): DataFrame =
    imagesWithGeom.select(
      col("image_id"),
      explode(Gf.s2Cover(col(Tables.Geometry), level)).as("cell"))
      .select(col("image_id"), Gf.s2Token(col("cell")).as(Tables.RegionsIndex))

  /** Patch grid: each image's anchor cell at `imgLevel` expands to its
    * children at `patchLevel`; `pos` is the reference's top-left →
    * bottom-right lexsort (desc ymax, asc xmin — s2_utils.py:60-72), plus
    * (pos_row, pos_col) in the 2^(patchLevel-imgLevel) square. */
  def patchGrid(imagesWithGeotag: DataFrame, imgLevel: Int, patchLevel: Int): DataFrame = {
    require(patchLevel > imgLevel, "patchLevel must exceed imgLevel")
    val side = 1 << (patchLevel - imgLevel)
    val withCell = imagesWithGeotag.withColumn("img_cell",
      Gf.s2Cell(col("lng"), col("lat"), imgLevel))
    // The reference's top-left → bottom-right lexsort (desc ymax, asc xmin,
    // s2_utils.py:60-72) runs PER ROW inside one kernel
    // (s2_sorted_children) — a pure projection. The round-1 version used a
    // row_number window per image_id (an avoidable global shuffle+sort);
    // the round-2..3 version sorted declaratively with sort_array over a
    // transform lambda, which evaluated INTERPRETED per child and built +
    // re-parsed two WKB boundary geometries per child (kernel-vs-formula
    // equality is spec-pinned in MiscOpsSpec).
    val sorted = withCell.select(
      col("image_id"), col("img_cell"),
      Gf.s2SortedChildren(col("img_cell"), patchLevel).as("patches"))
    sorted.select(col("image_id"), col("img_cell"),
      posexplode(col("patches")))
      .select(
        col("image_id"),
        Gf.s2Token(col("img_cell")).as("img_region_id"),
        Gf.s2Token(col("col")).as("patch_id"),
        col("pos"),
        (col("pos") / side).cast("int").as("pos_row"),
        pmod(col("pos"), lit(side)).cast("int").as("pos_col"))
  }

  /** GeoVex-style hex-raster tensor arrangement (reference:
    * srai/embedders/geovex/dataset.py:137-167): for each anchor cell, its
    * k-ring neighbourhood laid out on a dense (2k+2)×(2k+2) grid, target at
    * [k,k], neighbour at [k+i, k−j] via local IJ; only anchors with a
    * COMPLETE k-ring (3k(k+1) neighbours, :82-113) are emitted.
    *
    * Output: (region_id, rows array<array<double>>) — row-major dense grid
    * of `valueCol`, zeros elsewhere. Spark shape: ring generator → join
    * values → groupBy(anchor) collect → dense-grid projection. */
  def hexTensor(cells: DataFrame, values: DataFrame, k: Int,
                valueCol: String): DataFrame = {
    import graft.functions.Gf
    val ids = cells.select(col(Tables.RegionsIndex))
    val ring = ids.select(
      col(Tables.RegionsIndex).as("anchor"),
      explode(Gf.h3GridDisk(Gf.h3FromStr(col(Tables.RegionsIndex)), k)).as("n"))
      .select(col("anchor"), Gf.h3Str(col("n")).as("neighbour"))
      // try-variant: a pentagon inside some anchor's disk nulls that pair,
      // leaving the anchor's ring incomplete → the completeness filter
      // below drops it (instead of the whole job aborting on the 12
      // pentagon base cells a planetary set always contains)
      .withColumn("ij", Gf.h3LocalIjTry(
        Gf.h3FromStr(col("anchor")), Gf.h3FromStr(col("neighbour"))))
      .where(col("ij").isNotNull)
      .join(values.select(col(Tables.RegionsIndex).as("neighbour"),
        col(valueCol).cast("double").as("v")), Seq("neighbour"))
    val complete = ring.groupBy("anchor")
      .agg(collect_list(struct(col("ij"), col("v"))).as("cells"))
      .where(size(col("cells")) === 3 * k * (k + 1) + 1)
    // dense grid: value at [k+i, k−j], zeros elsewhere — ONE kernel fill
    // (hex_dense_grid). The declarative aggregate-over-transform fold
    // rebuilt the whole side² array per cell through interpreted lambdas:
    // O(cells × (2k+2)²) per anchor vs O(cells) (kernel-vs-formula
    // equality spec-pinned in MiscOpsSpec); output shape (2k+2)×(2k+2).
    complete.select(col("anchor").as(Tables.RegionsIndex),
      call_function("hex_dense_grid", col("cells"), lit(k)).as("rows"))
  }

  /** Regroup patch rows back to one ordered array per image
    * (reference: S2VecDataset regrouping, embedder.py §3.2 step 3). */
  def regroup(patchRows: DataFrame, valueCol: String): DataFrame =
    patchRows
      .groupBy("image_id")
      .agg(sort_array(collect_list(struct(col("pos"), col(valueCol).as("v"))))
        .as("patch_values"))
      .select(col("image_id"), col("patch_values.v").as("patch_values"))
}
