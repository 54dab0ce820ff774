package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distance-decayed neighbourhood smoothing of CountEmbedder output
  * (reference: srai/embedders/contextual_count_embedder.py:140-198,
  * 330-363).
  *
  * Exact semantics mirrored: per distance d in 1..k, aggregate the
  * neighbours-at-exactly-d of each region (neighbours intersected with the
  * available embedding rows; empty set contributes zeros; NaN→0);
  *  - squashed: base + Σ_d agg_d / (d+1)²  (same output columns);
  *  - concatenated: blocks "{col}_{d}" for d = 0..k, block 0 = base.
  *
  * Spark shape: k joins of (distance-d edges ⋈ embeddings) each feeding one
  * hash aggregate keyed by region — partial aggregation map-side; the edge
  * table is reused (cache it when driving multiple embedders).
  *
  * @param closure distance table (region_id, neighbour_id, distance 1..k)
  *                from [[Neighbourhoods.distanceClosure]] (or an H3 k-ring
  *                generator once available).
  */
class ContextualCountEmbedder(
    closure: DataFrame,
    k: Int,
    concatenate: Boolean = false,
    aggregation: String = "average") {

  import Tables.RegionsIndex

  private def aggFn(c: Column): Column = aggregation match {
    case "average" => avg(c)
    // exact median (reference is exact np.nanmedian,
    // contextual_count_embedder.py:352 — percentile_approx diverges on
    // even-sized neighbour sets)
    case "median" => median(c)
    case "sum" => sum(c)
    case "min" => min(c)
    case "max" => max(c)
    case other => throw new IllegalArgumentException(s"Unknown aggregation function: $other")
  }

  def transform(embeddings: DataFrame): DataFrame = {
    val featureCols = embeddings.columns.toSeq.filterNot(_ == RegionsIndex)
    require(featureCols.nonEmpty, "embeddings have no feature columns")

    // per-distance aggregated neighbour features, joined left so regions
    // with no distance-d neighbours get zeros (reference :347-348, :363)
    val perDistance: Seq[(Int, DataFrame)] = (1 to k).map { d =>
      val agg = closure.where(col("distance") === d)
        .select(col("region_id"), col("neighbour_id"))
        .join(embeddings.select(
          col(RegionsIndex).as("neighbour_id") +:
            featureCols.map(c => col(c).as(s"__n_$c")): _*),
          Seq("neighbour_id"))
        .groupBy("region_id")
        .agg(aggFn(col(s"__n_${featureCols.head}")).as(s"agg_${featureCols.head}"),
          featureCols.tail.map(c => aggFn(col(s"__n_$c")).as(s"agg_$c")): _*)
      d -> agg
    }

    val joined = perDistance.foldLeft(
      embeddings.withColumnRenamed(RegionsIndex, "region_id")) {
      case (acc, (d, agg)) =>
        acc.join(
          agg.select(col("region_id") +:
            featureCols.map(c => col(s"agg_$c").as(s"agg_${d}_$c")): _*),
          Seq("region_id"), "left")
    }

    def nz(c: Column): Column = coalesce(c, lit(0.0))

    val out =
      if (!concatenate) {
        featureCols.map { c =>
          (1 to k).foldLeft(col(c).cast("double")) { (acc, d) =>
            acc + nz(col(s"agg_${d}_$c")) / math.pow(d + 1.0, 2)
          }.as(c)
        }
      } else {
        featureCols.map(c => col(c).cast("double").as(s"${c}_0")) ++
          (for (d <- 1 to k; c <- featureCols)
            yield nz(col(s"agg_${d}_$c")).as(s"${c}_$d"))
      }

    joined.select(col("region_id").as(RegionsIndex) +: out: _*)
  }
}
