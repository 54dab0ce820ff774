package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** `pd.qcut(values, nBins, labels=False, duplicates="drop")` parity
  * (reference: srai/spatial_split.py:202-219 buckets per-cell statistics
  * this way). Quantile edges are EXACT linear-interpolation percentiles
  * (numpy's default, Spark's `percentile` aggregate); duplicate edges are
  * MERGED, so heavily-skewed stats yield fewer bins; intervals are
  * right-closed with the minimum in bin 0; codes are 0-based. When every
  * value is identical pandas emits null codes — reproduced.
  *
  * `ntile` (SpatialSplit's round-2 stand-in, kept for q25) divides ROWS
  * into equal groups regardless of value ties, so its bucket boundaries
  * differ on skewed data; this operator is the reference-exact variant.
  * Pinned against real `pd.qcut` outputs in QuantilesSpec.
  *
  * Scale shape: one exact-percentile aggregate over the stats table
  * (vocabulary-bounded, like the reference's driver-side qcut) and a pure
  * scalar projection for the codes — no window, no shuffle beyond the
  * aggregate. */
object Quantiles {

  /** Exact quantile edges of `valueCol` at k/nBins for k = 0..nBins. */
  def qcutEdges(df: DataFrame, valueCol: String, nBins: Int): Seq[Double] = {
    val ps = (0 to nBins).map(_.toDouble / nBins)
    val edges = df
      .agg(expr(s"percentile($valueCol, array(${ps.mkString(", ")}))").as("e"))
      .collect()(0).getSeq[Double](0)
    require(edges != null,
      s"qcut: no non-null '$valueCol' values to bucket (pd.qcut raises here too)")
    edges
  }

  /** 0-based right-closed bucket code for pre-computed (sorted) edges:
    * code = #{deduped edges beyond the first that are strictly below v}. */
  def qcutBucket(value: Column, edges: Seq[Double]): Column = {
    val dedup = edges.distinct // edges ascend → duplicates are adjacent
    if (dedup.size < 2) lit(null).cast("int")
    else dedup.drop(1)
      .map(e => when(value > lit(e), 1).otherwise(0))
      .reduce(_ + _).cast("int")
  }

  /** Adds `outCol` with the qcut bucket of `valueCol`. */
  def qcut(df: DataFrame, valueCol: String, nBins: Int,
           outCol: String = "bucket"): DataFrame =
    df.withColumn(outCol, qcutBucket(col(valueCol), qcutEdges(df, valueCol, nBins)))
}
