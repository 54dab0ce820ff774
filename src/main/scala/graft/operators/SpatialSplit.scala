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
  *
  * Determinism + oracle parity: the seeded shuffle key is plain 64-bit
  * modular arithmetic — ((cell % P)·48271 + seed) % P with P = 2³¹−1, ties
  * broken by cell — and the greedy is a pure left fold over that order with
  * first-split tie preference, so an external SQL engine can replay the
  * exact assignment with a recursive CTE (driver certificate q45).
  */
class SpatialSplit(
    parentCellLevel: Int,
    ratios: Seq[(String, Double)] = Seq("train" -> 0.8, "test" -> 0.2),
    nBins: Int = 4,
    seed: Long = 42L) {

  require(math.abs(ratios.map(_._2).sum - 1.0) < 1e-9, "ratios must sum to 1")

  private val P = 2147483647L // 2^31 - 1

  /** Greedy split assignment over a per-cell stats table (cell: long,
    * n: long). Returns (cell, n, bucket, split) — the driver-side fold the
    * reference runs, exposed so any cell keying (not only S2) can be
    * stratified. */
  def assignStats(stats: DataFrame): DataFrame = {
    val bucketed = stats.select(col("cell"), col("n"))
      .withColumn("bucket", ntile(nBins).over(Window.orderBy(col("n"), col("cell"))))

    // driver-side greedy over the (small) per-cell stats
    val rows = bucketed.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val shuffled = rows.sortBy { case (cell, _, _) =>
      (((cell % P) * 48271L + seed) % P, cell)
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

    val mapping = stats.sparkSession.createDataFrame(
      rows.toSeq.map { case (c, n, b) => (c, n, b, assignment(c)) })
      .toDF("cell", "n", "bucket", "split")
    mapping
  }

  /** Adds (cell, split) columns to a point table with lng/lat. */
  def split(points: DataFrame): DataFrame = {
    val withCell = points.withColumn("cell",
      Gf.s2Cell(col("lng"), col("lat"), parentCellLevel))
    val stats = withCell.groupBy("cell").agg(count(lit(1)).as("n"))
    val mapping = assignStats(stats).select("cell", "split")
    withCell.join(broadcast(mapping), Seq("cell"), "left")
  }
}
