package graft

import org.apache.spark.sql.SparkSessionExtensions

/** SparkSessionExtensions entry point: registers every graft function so
  * they are available in SQL and via `call_function` on any session built
  * with `spark.sql.extensions=graft.GraftExtensions` (the spark-submit path
  * on a real cluster). Local helpers call [[graft.functions.Gf.register]]
  * directly instead. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    graft.functions.Gf.inject(ext)
}

/** Standard session factory used by Verify / Bench / tests: local[`cpus`],
  * shuffle partitions sized to cores (not the 200 default), AQE on with
  * skew-join handling (SURVEY.md §4 — dense urban cells make the cell join
  * skewed), UTC for oracle parity. */
object GraftSession {
  def local(cpus: Int, appName: String = "graft"): org.apache.spark.sql.SparkSession = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(appName)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.Gf.register(spark)
    spark
  }
}
