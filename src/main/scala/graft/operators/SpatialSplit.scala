package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Gf

/** Spatially-stratified train/val/test split (reference:
  * srai/spatial_split.py:112-401).
  *
  * Reference topology preserved deliberately: per-parent-cell statistics are
  * tiny (cell cardinality ≪ row count), so the greedy assignment runs on the
  * driver over collected stats (spatial_split.py:244-315 is inherently
  * sequential); the result goes back as a broadcast cell→split map joined to
  * the full data. The heavy work (cell assignment, final join) stays
  * distributed.
  *
  * Semantics: points → parent S2 cell (scalar projection, J4 fast path);
  * per-cell counts bucketed into `nBins` quantiles (reference qcut :202-219
  * → ntile window); cells shuffled with a seeded hash order (:224) and
  * greedily assigned to the split whose addition minimizes
  * Σ_buckets |expected_ratio − actual_ratio| (:244-315).
  */
class SpatialSplit(
    parentCellLevel: Int,
    ratios: Seq[(String, Double)] = Seq("train" -> 0.8, "test" -> 0.2),
    nBins: Int = 4,
    seed: Long = 42L) {

  require(math.abs(ratios.map(_._2).sum - 1.0) < 1e-9, "ratios must sum to 1")

  /** Adds (cell, split) columns to a point table with lng/lat. */
  def split(points: DataFrame): DataFrame = {
    val withCell = points.withColumn("cell",
      Gf.s2Cell(col("lng"), col("lat"), parentCellLevel))
    val stats = withCell.groupBy("cell").agg(count(lit(1)).as("n"))
      .withColumn("bucket", ntile(nBins).over(Window.orderBy(col("n"), col("cell"))))

    // driver-side greedy over the (small) per-cell stats
    val rows = stats.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val shuffled = rows.sortBy { case (cell, _, _) =>
      graft.functions.VecTextOps.fnv64(seed + "_" + cell)
    }
    val splits = ratios.map(_._1).toArray
    val want = ratios.map(_._2).toArray
    val perBucketTotal = rows.groupBy(_._3).view.mapValues(_.map(_._2).sum).toMap
    val got = Array.fill(splits.length, nBins + 1)(0L)
    val assignment = scala.collection.mutable.Map[Long, String]()
    for ((cell, n, bucket) <- shuffled) {
      var best = 0; var bestCost = Double.MaxValue
      for (s <- splits.indices) {
        var cost = 0.0
        for (b <- 1 to nBins) {
          val total = perBucketTotal.getOrElse(b, 0L).toDouble.max(1.0)
          val add = if (b == bucket) n else 0L
          for (s2 <- splits.indices) {
            val actual = (got(s2)(b) + (if (s2 == s) add else 0L)) / total
            cost += math.abs(want(s2) - actual)
          }
        }
        if (cost < bestCost) { bestCost = cost; best = s }
      }
      got(best)(bucket) += n
      assignment(cell) = splits(best)
    }

    val mapping = points.sparkSession.createDataFrame(
      assignment.toSeq.map { case (c, s) => (c, s) })
      .toDF("cell", "split")
    withCell.join(broadcast(mapping), Seq("cell"), "left")
  }
}
