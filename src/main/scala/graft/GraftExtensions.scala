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
  private def base(appName: String): org.apache.spark.sql.SparkSession.Builder =
    org.apache.spark.sql.SparkSession.builder()
      .appName(appName)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // graft join keys are DERIVED columns (cell ids computed from
      // geometry) that are non-null by construction; constraint propagation
      // would infer isnotnull(<whole derivation chain>) filters that
      // re-evaluate the geometry→cell chain per row below the projection
      // (round-1 "fast-path double-eval"). All graft expressions are
      // null-intolerant, so the inferred filters can never drop a row.
      .config("spark.sql.constraintPropagation.enabled", "false")

  private def finish(b: org.apache.spark.sql.SparkSession.Builder) = {
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.Gf.register(spark)
    spark
  }

  def local(cpus: Int, appName: String = "graft"): org.apache.spark.sql.SparkSession =
    finish(base(appName)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false"))

  /** spark-submit entry: NEVER sets a master — `--master`/cluster config
    * wins (round-1 bug: `.master(local[n])` here silently downgraded a
    * cluster submit to a local-mode driver). Local-mode fallbacks (master,
    * shuffle partitions) apply only when spark-submit provided nothing. */
  def submit(appName: String, fallbackCpus: Int = 8): org.apache.spark.sql.SparkSession = {
    val b = base(appName)
    if (!sys.props.contains("spark.master") && !sys.env.contains("SPARK_MASTER"))
      b.master(s"local[$fallbackCpus]")
        .config("spark.sql.shuffle.partitions", fallbackCpus)
    finish(b)
  }
}
