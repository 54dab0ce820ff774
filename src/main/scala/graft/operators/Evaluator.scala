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
