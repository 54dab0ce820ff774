package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.BooleanType

/** Region × feature count matrix (reference:
  * srai/embedders/count_embedder.py:46-154).
  *
  * Semantics mirrored exactly:
  *  - top-level counting: a feature contributes 1 to column `c` when its
  *    value in `c` is non-null (`:125-130`); boolean columns cast directly
  *    (`:117-123`).
  *  - `countSubcategories`: one-hot `"{col}_{value}"` columns (`:108-116`);
  *    boolean payload + subcategories → error (`:104-106`).
  *  - `expectedOutputFeatures`: missing columns added as zeros, unexpected
  *    dropped, column order = expected order (`:225-249`); otherwise columns
  *    sorted (`:204`, `:223`).
  *  - regions with no features kept with all-zero counts (left join +
  *    fill 0, `:138-152`); counts are integers.
  *
  * Spark shape: encode = pure projection; join joint→features on feature_id
  * (left); one hash aggregate keyed by region_id (partial map-side combine
  * for free); left join back to regions. Two shuffles total, both keyed by
  * high-cardinality ids — survives any scale the join survives.
  */
class CountEmbedder(
    expectedOutputFeatures: Seq[String] = Nil,
    countSubcategories: Boolean = false) {

  import Tables._

  def transform(regions: DataFrame, features: DataFrame, joint: DataFrame): DataFrame = {
    val payloadCols = features.columns.toSeq.filterNot(c => c == FeaturesIndex || c == Geometry)
    require(payloadCols.nonEmpty || expectedOutputFeatures.nonEmpty,
      "features have no payload columns and no expected output features given")

    val outputCols: Seq[(String, Column)] =
      if (!countSubcategories) {
        val cols = payloadCols.map { c =>
          val f = features.schema(c).dataType match {
            case BooleanType => coalesce(col(c).cast("int"), lit(0))
            case _ => col(c).isNotNull.cast("int")
          }
          c -> f
        }
        project(cols)
      } else {
        payloadCols.foreach { c =>
          require(features.schema(c).dataType != BooleanType,
            s"Cannot count subcategories of boolean column '$c' (reference ValueError)")
        }
        val pairs: Seq[(String, String)] =
          if (expectedOutputFeatures.nonEmpty) {
            // Derive (column, value) pairs from the expected names — no data
            // scan needed when the schema is declared up front. When one
            // payload column is a '_'-prefix of another (OSM's 'building'
            // vs 'building_part'), both would claim the name and the later
            // one-hot condition would silently overwrite the first in
            // project's map — take the LONGEST matching column
            // (deterministic, matches the most specific key).
            expectedOutputFeatures.flatMap { name =>
              payloadCols.filter(c => name.startsWith(c + "_"))
                .sortBy(-_.length).headOption
                .map(c => c -> name.stripPrefix(c + "_"))
            }
          } else {
            // Data-dependent one-hot schema, like the reference's to_dummies:
            // ONE Spark job collects the distinct (column, value) domain for
            // every payload column at once (explode of a per-row map) — a
            // wide OSM-style table with hundreds of tag columns must not
            // launch hundreds of driver-blocking jobs. Values are sorted
            // within each column for reproducibility (count_embedder.py:204).
            val pairsDf = features
              .select(explode(map(payloadCols.flatMap(c =>
                Seq(lit(c), col(c).cast("string"))): _*)))
              .where(col("value").isNotNull).distinct()
            val byCol = pairsDf.collect()
              .map(r => r.getString(0) -> r.getString(1))
              .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
            payloadCols.flatMap(c => byCol.getOrElse(c, Array.empty[String]).map(c -> _))
          }
        val cols = pairs.map { case (c, v) =>
          s"${c}_$v" -> (col(c) === lit(v)).cast("int")
        }
        project(cols)
      }

    // an empty one-hot domain (no features / all-null payload, no expected
    // schema) has nothing to count: the region frame alone is the answer
    if (outputCols.isEmpty) return regions.select(RegionsIndex)

    val encoded = features.select(
      col(FeaturesIndex) +: outputCols.map { case (n, c) => coalesce(c, lit(0)).as(n) }: _*)

    val summed = joint.select(RegionsIndex, FeaturesIndex)
      .join(encoded, Seq(FeaturesIndex), "left")
      .groupBy(RegionsIndex)
      .agg(outputCols.map { case (n, _) => sum(col(n)).as(n) }.head,
        outputCols.map { case (n, _) => sum(col(n)).as(n) }.tail: _*)

    regions.select(RegionsIndex)
      .join(summed, Seq(RegionsIndex), "left")
      .na.fill(0)
      .select(col(RegionsIndex) +:
        outputCols.map { case (n, _) => col(n).cast("int").as(n) }: _*)
  }

  /** Expected-feature projection (count_embedder.py:225-249): keep expected
    * order, add missing as zero, drop unexpected; else sorted columns. */
  private def project(cols: Seq[(String, Column)]): Seq[(String, Column)] =
    if (expectedOutputFeatures.isEmpty) cols.sortBy(_._1)
    else {
      val have = cols.toMap
      expectedOutputFeatures.map(n => n -> have.getOrElse(n, lit(0)))
    }
}
