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
  * Spark shape: ONE join of the whole closure against the embeddings and
  * ONE hash aggregate keyed by region with per-distance conditional
  * aggregates (aggFn(when(distance = d, v)) — nulls are ignored by SQL
  * aggregates, so each column sees exactly the distance-d neighbour set).
  * Round-1 ran k separate join+aggregate rounds — k shuffles of the same
  * embedding table instead of one.
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
    require(k >= 0, s"neighbourhood distance must be >= 0, got $k")
    // k = 0: no neighbourhood — the base embeddings ARE the result
    // (reference semantics for neighbourhood_distance 0), shaped like the
    // k >= 1 output: squashed keeps base names, concatenated suffixes the
    // distance-0 block, both as double
    if (k == 0) {
      val base = embeddings.withColumnRenamed(RegionsIndex, "region_id")
      val shaped = featureCols.map { c =>
        val name = if (concatenate) s"${c}_0" else c
        col(c).cast("double").as(name)
      }
      return base.select(col("region_id") +: shaped: _*)
    }

    // ONE closure⋈embeddings join + ONE aggregate with per-distance
    // conditional columns; regions with no distance-d neighbours stay null
    // here and become zeros below (reference :347-348, :363)
    val neighbourVals = closure
      .where(col("distance").between(1, k))
      .select(col("region_id"), col("neighbour_id"), col("distance"))
      .join(embeddings.select(
        col(RegionsIndex).as("neighbour_id") +:
          // NaN feature values → null so avg/median/sum IGNORE them like
          // the reference's np.nan-aware aggregations (a NaN would
          // otherwise poison the whole group)
          featureCols.map(c => when(col(c).cast("double").isNaN, lit(null))
            .otherwise(col(c)).as(s"__n_$c")): _*),
        Seq("neighbour_id"))
    val aggCols = for (d <- 1 to k; c <- featureCols)
      yield aggFn(when(col("distance") === d, col(s"__n_$c"))).as(s"agg_${d}_$c")
    val agg = neighbourVals.groupBy("region_id")
      .agg(aggCols.head, aggCols.tail: _*)

    val joined = embeddings.withColumnRenamed(RegionsIndex, "region_id")
      .join(agg, Seq("region_id"), "left")

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
