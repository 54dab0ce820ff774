package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Regression-evaluation metrics over (prediction, label) tables aligned by
  * region id (reference: srai/benchmark/hex_regression_evaluator.py:27-131,
  * srai/benchmark/_custom_metrics.py:14-44). Alignment = inner join (the
  * reference skips prediction ids missing from the labels, :93-101).
  *
  * Sums run in decimal so the result is independent of partial-aggregation
  * order (required for the bit-exact DuckDB oracle).
  */
/** Train-statistics feature scaling (reference: A7 MinMax —
  * srai/datasets/_base.py:345-356; A10 μ/σ with near-constant masking —
  * srai/embedders/s2vec/embedder.py:226-237). Stats aggregate once and
  * broadcast as literals into a pure projection. */
object Scaling {
  import org.apache.spark.sql.DataFrame

  /** z-score by train stats; columns with σ < eps are masked to zero
    * (reference semantics: std<eps → column zeroed, std treated as 1). */
  def standardize(train: DataFrame, apply: DataFrame, cols: Seq[String],
                  eps: Double = 1e-10): DataFrame = {
    val stats = train.agg(
      avg(col(cols.head)).as(s"mu_${cols.head}"),
      (cols.tail.map(c => avg(col(c)).as(s"mu_$c")) ++
        cols.map(c => stddev_pop(col(c)).as(s"sd_$c"))): _*).collect()(0)
    val projected = cols.map { c =>
      val mu = stats.getAs[Double](s"mu_$c")
      val sd = stats.getAs[Double](s"sd_$c")
      if (sd < eps) lit(0.0).as(c)
      else ((col(c) - mu) / sd).as(c)
    }
    val others = apply.columns.filterNot(cols.contains).map(col)
    apply.select(others ++ projected: _*)
  }

  /** MinMax scale to [0,1] by train stats, clipped (reference A7). */
  def minMax(train: DataFrame, apply: DataFrame, c: String): DataFrame = {
    val r = train.agg(min(col(c)).cast("double").as("mn"),
      max(col(c)).cast("double").as("mx")).collect()(0)
    val mn = r.getDouble(0); val mx = r.getDouble(1)
    val range = if (mx > mn) mx - mn else 1.0
    apply.withColumn(c,
      least(greatest((col(c) - mn) / range, lit(0.0)), lit(1.0)))
  }
}

object Evaluator {

  private def dsum(c: Column): Column =
    sum(c.cast("decimal(30,10)")).cast("double")

  /** One-row frame: n, mse, rmse, mae, mape, smape, r2. */
  def regressionMetrics(preds: DataFrame, labels: DataFrame,
                        predCol: String = "pred", labelCol: String = "label"): DataFrame = {
    val joined = preds.join(labels, Seq(Tables.RegionsIndex))
      .select(col(predCol).as("p"), col(labelCol).as("y"))
    val stats = joined.agg(
      count(lit(1)).as("n"),
      dsum((col("p") - col("y")) * (col("p") - col("y"))).as("ss_res"),
      dsum(abs(col("p") - col("y"))).as("sae"),
      dsum(when(col("y") =!= 0, abs((col("p") - col("y")) / col("y"))).otherwise(0.0)).as("sape"),
      dsum(when(abs(col("p")) + abs(col("y")) =!= 0,
        abs(col("p") - col("y")) / ((abs(col("p")) + abs(col("y"))) / 2)).otherwise(0.0)).as("ssmape"),
      dsum(col("y")).as("sy"),
      dsum(col("y") * col("y")).as("syy"))
    stats.select(
      col("n"),
      (col("ss_res") / col("n")).as("mse"),
      sqrt(col("ss_res") / col("n")).as("rmse"),
      (col("sae") / col("n")).as("mae"),
      (col("sape") / col("n")).as("mape"),
      (col("ssmape") / col("n")).as("smape"),
      (lit(1.0) - col("ss_res") / (col("syy") - col("sy") * col("sy") / col("n"))).as("r2"))
  }
}
