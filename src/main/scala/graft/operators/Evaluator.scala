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

  /** MobilityPredictionEvaluator parity (reference:
    * srai/benchmark/mobility_prediction_evaluator.py:30-150): align
    * predictions to test trajectories by trip id (inner join — predictions
    * without a matching test trip are SKIPPED, :73-85), raise when nothing
    * aligns (:84-85), truncate BOTH sequences to the first k elements only
    * when k ≤ len(true_seq) (:130-136), then average SequenceAccuracy /
    * MeanHaversineDistance / MeanDTW over trips. DTW defaults to the
    * reference's fastdtw(radius=1) approximation for parity;
    * `exactDtw = true` switches to the exact DP. Returns one row
    * (n_trips, sequence_accuracy, mean_haversine_m, mean_dtw). */
  def mobilityPrediction(test: DataFrame, predictions: DataFrame,
      k: Option[Int] = None, exactDtw: Boolean = false,
      tripCol: String = "trip_id", trueCol: String = "h3_sequence_y",
      predCol: String = "pred_sequence"): DataFrame = {
    // one row per trip on each side — the reference's dict/iloc[0]
    // semantics; duplicate ids would otherwise double-weight a trip.
    // DataFrames carry no row order, so the reference's first/last-wins
    // choice is replaced by a DETERMINISTIC canonical pick (min sequence);
    // dropDuplicates would keep whichever row the partitioning surfaces.
    val joined = test.select(col(tripCol), col(trueCol).as("t"))
      .groupBy(tripCol).agg(min(col("t")).as("t"))
      .join(predictions.select(col(tripCol), col(predCol).as("p"))
        .groupBy(tripCol).agg(min(col("p")).as("p")), Seq(tripCol))
    val (tc, pc) = k match {
      case Some(kk) => (
        when(lit(kk) <= size(col("t")), slice(col("t"), 1, kk)).otherwise(col("t")),
        when(lit(kk) <= size(col("t")), slice(col("p"), 1, kk)).otherwise(col("p")))
      case None => (col("t"), col("p"))
    }
    val tPath = Trajectory.h3ToPath(tc); val pPath = Trajectory.h3ToPath(pc)
    val dtwCol = if (exactDtw) graft.functions.Gf.dtwLatLng(tPath, pPath)
                 else graft.functions.Gf.fastDtwLatLng(tPath, pPath)
    val row = joined.agg(
      count(lit(1)).as("n_trips"),
      // reference np.mean([]) yields NaN that poisons the overall mean;
      // a null would silently DROP the trip from Spark's avg instead
      avg(coalesce(Trajectory.sequenceAccuracy(tc, pc),
        lit(Double.NaN))).as("acc"),
      // reference haversine_sequence returns +inf for no valid pairs
      avg(coalesce(Trajectory.haversineMean(tPath, pPath),
        lit(Double.PositiveInfinity))).as("hav"),
      avg(dtwCol).as("dtw")).collect()(0)
    require(row.getLong(0) > 0, "No matching trip ids found in test dataset")
    import test.sparkSession.implicits._
    Seq((row.getLong(0), row.getDouble(1), row.getDouble(2), row.getDouble(3)))
      .toDF("n_trips", "sequence_accuracy", "mean_haversine_m", "mean_dtw")
  }

  /** TrajectoryRegressionEvaluator parity (reference:
    * srai/benchmark/trajectory_regression_evaluator.py:27-137 +
    * _custom_metrics.py:14-44): align (trip_id, duration) labels with
    * predictions by inner join (missing ids skipped, :96-105), raise when
    * none match (:120), then the epsilon-guarded percentage metrics —
    * MAPE = mean(|(y−p)/(y+ε)|)·100, sMAPE = mean(2|p−y|/(|p|+|y|+ε))·100
    * — alongside MSE/RMSE/MAE. One row
    * (n, mse, rmse, mae, mape_pct, smape_pct). */
  def trajectoryRegression(test: DataFrame, predictions: DataFrame,
      tripCol: String = "trip_id", labelCol: String = "duration",
      predCol: String = "pred", epsilon: Double = 1e-10): DataFrame = {
    val joined = test.select(col(tripCol), col(labelCol).as("y"))
      .join(predictions.select(col(tripCol), col(predCol).as("p")), Seq(tripCol))
    val row = joined.agg(
      count(lit(1)).as("n"),
      dsum((col("p") - col("y")) * (col("p") - col("y"))).as("ss"),
      dsum(abs(col("p") - col("y"))).as("sae"),
      dsum(abs((col("y") - col("p")) / (col("y") + epsilon))).as("sape"),
      dsum(abs(col("p") - col("y")) * 2.0 /
        (abs(col("p")) + abs(col("y")) + epsilon)).as("ssmape")).collect()(0)
    val n = row.getLong(0)
    require(n > 0, "No matching trip ids found in test dataset")
    val mse = row.getDouble(1) / n
    import test.sparkSession.implicits._
    Seq((n, mse, math.sqrt(mse), row.getDouble(2) / n,
      row.getDouble(3) / n * 100.0, row.getDouble(4) / n * 100.0))
      .toDF("n", "mse", "rmse", "mae", "mape_pct", "smape_pct")
  }

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
