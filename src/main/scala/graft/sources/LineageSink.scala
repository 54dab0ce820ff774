package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Cell-partitioned sink with per-partition lineage + resumable writes
  * (north rule: "resumable from checkpoint with per-partition lineage +
  * metrics"). Emulates an Iceberg-style commit log with plain parquet
  * (no Iceberg runtime in the sandbox — SURVEY.md §7 risk 2): data files
  * live under `dir/data/<bucket>=.../`, the manifest under `dir/manifest/`
  * is the commit log and doubles as the FILE REGISTRY — every committed
  * data file is listed in exactly one manifest row, so
  *  - commit cost is O(new files), never a rescan of the table (the
  *    round-1 version re-read the whole table per append);
  *  - files present on disk but absent from the manifest are uncommitted
  *    garbage from a crashed job and are deleted before the next write —
  *    re-running after any mid-job failure is idempotent at commit
  *    granularity (Iceberg's orphan-file semantics).
  *
  * All filesystem access goes through Hadoop [[FileSystem]] (works on HDFS /
  * object stores, not only local disk). The layout is kept behind this
  * interface so a real Iceberg catalog can be swapped in on a cluster.
  *
  * Bucket column choice: a coarse cell prefix (e.g. S2 token at level 4-6 or
  * slippy z4 tile). Coarse-cell bucketing gives (a) partition pruning for
  * spatial predicates, (b) locality for k-ring neighbour queries, (c) a
  * natural resume granularity.
  */
object LineageSink {

  private def dataDir(dir: String) = s"$dir/data"
  private def manifestDir(dir: String) = s"$dir/manifest"

  private def fileSystem(spark: SparkSession, dir: String): FileSystem =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Scheme-less normalized path, the manifest's file-identity key. */
  private def key(p: Path): String = p.toUri.getPath

  /** All visible data files currently on disk (recursive, skips Spark's
    * `_temporary`/`_SUCCESS`/hidden entries). Metadata-only. */
  private def listDataFiles(spark: SparkSession, dir: String): Seq[String] = {
    val fs = fileSystem(spark, dir)
    val root = new Path(dataDir(dir))
    if (!fs.exists(root)) return Nil
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val it = fs.listFiles(root, true)
    while (it.hasNext) {
      val f = it.next()
      val n = f.getPath.getName
      if (!n.startsWith("_") && !n.startsWith(".")) out += key(f.getPath)
    }
    out.toSeq
  }

  /** Files recorded by committed manifest rows. */
  private def committedFiles(spark: SparkSession, dir: String): Set[String] = {
    val m = manifest(spark, dir)
    if (m.columns.isEmpty) Set.empty
    else m.select(explode(col("files"))).collect().map(_.getString(0)).toSet
  }

  /** Delete uncommitted files left by a crashed/partial job (Iceberg orphan
    * cleanup). Returns the number of files removed. */
  def cleanOrphans(spark: SparkSession, dir: String): Int = {
    val committed = committedFiles(spark, dir)
    val orphans = listDataFiles(spark, dir).filterNot(committed)
    val fs = fileSystem(spark, dir)
    orphans.foreach(p => fs.delete(new Path(p), false))
    orphans.length
  }

  /** Write `df` partitioned by `bucketCol`, then commit a manifest row per
    * bucket: (bucket, rows, files, job_id, written_at). Counting reads ONLY
    * the files this job added (footer-level scan of new files — never the
    * historical table). Appends compose: the manifest unions previous
    * commits. Returns the manifest. */
  def write(df: DataFrame, dir: String, bucketCol: String): DataFrame = {
    val spark = df.sparkSession
    val jobId = java.util.UUID.randomUUID().toString
    cleanOrphans(spark, dir)
    val before = committedFiles(spark, dir)

    df.write.mode(SaveMode.Append).partitionBy(bucketCol).parquet(dataDir(dir))

    val newFiles = listDataFiles(spark, dir).filterNot(before)
    if (newFiles.nonEmpty) {
      val counts = spark.read
        .option("basePath", dataDir(dir))
        .parquet(newFiles: _*)
        .withColumn("__file", input_file_name())
        .groupBy(col(bucketCol))
        .agg(count(lit(1)).as("rows"), collect_set(col("__file")).as("files"))
        .select(col(bucketCol), col("rows"),
          transform(col("files"), f =>
            regexp_replace(f, "^[a-zA-Z0-9+.-]+:(//[^/]*)?", "")).as("files"))
        .withColumn("job_id", lit(jobId))
        .withColumn("written_at", current_timestamp())
      counts.write.mode(SaveMode.Append).parquet(manifestDir(dir))
    }
    manifest(spark, dir)
  }

  /** All committed manifest rows (empty frame if nothing committed yet). */
  def manifest(spark: SparkSession, dir: String): DataFrame = {
    val p = new Path(manifestDir(dir))
    if (fileSystem(spark, dir).exists(p)) spark.read.parquet(manifestDir(dir))
    else spark.emptyDataFrame
  }

  /** Buckets already committed. */
  def completed(spark: SparkSession, dir: String): DataFrame = {
    val m = manifest(spark, dir)
    if (m.columns.isEmpty) m else m.select(m.columns.head).distinct()
  }

  /** Resume a partially-completed job: clean orphan files from the crashed
    * attempt, anti-join the manifest to drop rows of buckets already
    * committed, write + commit only the remainder. Returns the updated
    * manifest. */
  def resumeWrite(df: DataFrame, dir: String, bucketCol: String): DataFrame = {
    val spark = df.sparkSession
    cleanOrphans(spark, dir)
    val done = completed(spark, dir)
    val remaining =
      if (done.columns.isEmpty) df
      else df.join(done.select(col(done.columns.head).as(bucketCol)),
        Seq(bucketCol), "left_anti")
    if (remaining.isEmpty) manifest(spark, dir)
    else write(remaining, dir, bucketCol)
  }

  /** Mid-job resume granularity: split the write into `groups` sequential
    * commits keyed by a stable hash of the bucket, each with its own
    * manifest row set — a crash loses at most one group, and the rerun
    * skips every committed bucket. When the SOURCE is partitioned by the
    * bucket key (the intended layout), each group's job prunes its scan to
    * the group's slice, so the input is read once overall, not ×groups. */
  def writeGrouped(df: DataFrame, dir: String, bucketCol: String,
                   groups: Int = 8): DataFrame = {
    val spark = df.sparkSession
    cleanOrphans(spark, dir)
    val done = completed(spark, dir)
    val remaining =
      if (done.columns.isEmpty) df
      else df.join(done.select(col(done.columns.head).as(bucketCol)),
        Seq(bucketCol), "left_anti")
    for (g <- 0 until groups) {
      val slice = remaining.where(pmod(xxhash64(col(bucketCol)), lit(groups)) === g)
      if (!slice.isEmpty) write(slice, dir, bucketCol)
    }
    manifest(spark, dir)
  }
}
