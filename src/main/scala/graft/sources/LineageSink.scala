package graft.sources

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.{DataFrame, Row, SaveMode, SparkSession}
import org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Cell-partitioned sink with per-partition lineage + resumable writes
  * (north rule: "resumable from checkpoint with per-partition lineage +
  * metrics"). Emulates an Iceberg-style commit log with plain parquet
  * (no Iceberg runtime in the sandbox — SURVEY.md §7 risk 2).
  *
  * Layout — every job is STAGED outside the readable table, then committed
  * with a two-phase move:
  * {{{
  *   dir/data/<bucket>=<v>/      committed data files — the ONLY thing readers see
  *   dir/staging/<jobId>/        this job's files, partitioned by bucket
  *   dir/pending/<jobId>         commit intent: the final paths about to appear
  *   dir/manifest/               commit log + file registry, one row per (job, bucket)
  * }}}
  *
  * Commit protocol (all steps O(files written by THIS job), never a listing
  * or scan of the historical table — an Iceberg-style metadata commit):
  *   1. write `df` into `staging/<jobId>/` (invisible to readers);
  *   2. list that one directory; read row counts from the new files'
  *      parquet FOOTERS (metadata only, no data scan);
  *   3. write the `pending/<jobId>` marker naming every final path;
  *   4. rename each staged file into `data/`;
  *   5. append the manifest rows; delete the marker + staging dir.
  *
  * Crash recovery ([[recover]], run before every write) is driven purely by
  * the markers: a crash before step 3 leaves only a staging dir (deleted);
  * a crash between 3 and 5 leaves a marker whose job either reached the
  * manifest (roll FORWARD: drop the marker) or did not (roll BACK: delete
  * exactly the marker's listed paths). Readers of `dir/data` therefore see
  * each row exactly once, at commit granularity, no matter where a job died.
  * Recovery touches only `pending/`, `staging/` and the manifest — commit
  * cost never grows with the age or size of the table. (Round-2 committed
  * via the live data directory and re-listed the entire tree per commit.)
  *
  * File identity: manifest `files` entries and recovery paths are BOTH
  * derived from Hadoop listings (`Path.toUri.getPath`) — a single encoding,
  * so bucket values that URI-escape (spaces, `%`, non-ASCII) round-trip.
  * (Round-2 mixed `input_file_name()` percent-encoding with decoded listing
  * paths, which could mis-identify committed files.)
  *
  * All filesystem access goes through Hadoop [[FileSystem]] (works on HDFS /
  * object stores, not only local disk). On object stores without atomic
  * rename the per-file move in step 4 is a copy — still O(new); swap in a
  * real Iceberg catalog for a pure-metadata commit. At cluster scale the
  * driver-side footer loop in step 2 would come from task commit messages;
  * per job it is one footer read per new file.
  *
  * Bucket column choice: a coarse cell prefix (e.g. S2 token at level 4-6 or
  * slippy z4 tile). Coarse-cell bucketing gives (a) partition pruning for
  * spatial predicates, (b) locality for k-ring neighbour queries, (c) a
  * natural resume granularity. The manifest's bucket column holds the
  * partition-directory string value (Hive convention, nulls =
  * `__HIVE_DEFAULT_PARTITION__`).
  */
object LineageSink {

  private def dataDir(dir: String) = s"$dir/data"
  private def manifestDir(dir: String) = s"$dir/manifest"
  private def stagingRoot(dir: String) = s"$dir/staging"
  private def pendingDir(dir: String) = s"$dir/pending"

  private def fileSystem(spark: SparkSession, dir: String): FileSystem =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Scheme-less normalized path, the single file-identity encoding. */
  private def key(p: Path): String = p.toUri.getPath

  /** Visible files under `root` (recursive, skips `_temporary`/`_SUCCESS`/
    * hidden entries). Callers only ever pass job-scoped directories. */
  private def listFilesUnder(fs: FileSystem, root: Path): Seq[Path] = {
    if (!fs.exists(root)) return Nil
    val out = scala.collection.mutable.ArrayBuffer.empty[Path]
    val it = fs.listFiles(root, true)
    while (it.hasNext) {
      val f = it.next()
      val n = f.getPath.getName
      if (!n.startsWith("_") && !n.startsWith(".")) out += f.getPath
    }
    out.toSeq
  }

  /** Roll the sink to a consistent state after any crash. Inspects ONLY the
    * pending markers, the staging root and the manifest — never the data
    * tree. Safe to call when idle (single-writer, as before). */
  def recover(spark: SparkSession, dir: String): Unit = {
    val fs = fileSystem(spark, dir)
    val pending = new Path(pendingDir(dir))
    if (fs.exists(pending)) {
      val markers = fs.listStatus(pending).map(_.getPath)
        .filterNot(p => p.getName.startsWith("_") || p.getName.startsWith("."))
      if (markers.nonEmpty) {
        val m = manifest(spark, dir)
        val committedJobs: Set[String] =
          if (m.columns.contains("job_id"))
            m.select("job_id").distinct().collect().map(_.getString(0)).toSet
          else Set.empty
        for (marker <- markers) {
          val jobId = marker.getName
          if (!committedJobs.contains(jobId)) {
            // roll back: delete exactly the files this job intended to commit
            val in = fs.open(marker)
            val listed =
              try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toList
              finally in.close()
            listed.filter(_.nonEmpty).foreach { p =>
              val fp = new Path(p)
              if (fs.exists(fp)) fs.delete(fp, false)
            }
          }
          fs.delete(marker, false)
        }
      }
    }
    // any staging dir present while no job is in flight belongs to a dead job
    val sroot = new Path(stagingRoot(dir))
    if (fs.exists(sroot))
      fs.listStatus(sroot).foreach(s => fs.delete(s.getPath, true))
    // retire INCOMPLETE manifest version dirs from a crashed compaction
    // (cleanup lives on the write path only — readers never delete)
    versionDirs(fs, dir)
      .filterNot { case (_, p) => fs.exists(new Path(p, "_SUCCESS")) }
      .foreach { case (_, p) => fs.delete(p, true) }
  }

  private val manifestSchema = StructType(Seq(
    StructField("bucket", StringType),
    StructField("rows", LongType),
    StructField("files", ArrayType(StringType)),
    StructField("job_id", StringType),
    StructField("written_at", TimestampType)))

  /** Stage `df` under a fresh job id and run the two-phase commit. */
  private def stageAndCommit(df: DataFrame, dir: String, bucketCol: String,
      jobId: String = java.util.UUID.randomUUID().toString): Unit = {
    val spark = df.sparkSession
    val fs = fileSystem(spark, dir)
    val conf = spark.sparkContext.hadoopConfiguration
    val staging = new Path(s"${stagingRoot(dir)}/$jobId")

    df.write.mode(SaveMode.ErrorIfExists).partitionBy(bucketCol)
      .parquet(staging.toString)

    val staged = listFilesUnder(fs, staging)
    if (staged.isEmpty) { fs.delete(staging, true); return }

    // per-bucket rows from the NEW files' footers only (metadata, no scan)
    val perBucket = staged.groupBy(_.getParent.getName).toSeq.sortBy(_._1)
      .map { case (partDirName, files) =>
        val rows = files.map { p =>
          val r = ParquetFileReader.open(HadoopInputFile.fromPath(p, conf))
          try r.getRecordCount finally r.close()
        }.sum
        val bucketValue = ExternalCatalogUtils.unescapePathName(
          partDirName.stripPrefix(bucketCol + "="))
        val finalKeys = files.map(p =>
          key(new Path(s"${dataDir(dir)}/$partDirName/${p.getName}")))
        (bucketValue, rows, partDirName, files, finalKeys)
      }

    // phase 1: record intent — every final path this commit will create
    val pend = new Path(s"${pendingDir(dir)}/$jobId")
    fs.mkdirs(pend.getParent)
    val out = fs.create(pend, false)
    try out.write(perBucket.flatMap(_._5).mkString("\n").getBytes(StandardCharsets.UTF_8))
    finally out.close()

    // phase 2: move staged files into the table
    for ((_, _, partDirName, files, _) <- perBucket) {
      val target = new Path(s"${dataDir(dir)}/$partDirName")
      fs.mkdirs(target)
      files.foreach { p =>
        // rename returns false instead of throwing on some filesystems —
        // proceeding would register a file the move lost, so fail the
        // commit here and let recover() roll the marker back
        require(fs.rename(p, new Path(target, p.getName)),
          s"commit move failed: $p -> $target (job $jobId rolled back on recovery)")
      }
    }

    // phase 3: append the commit log, then retire marker + staging dir
    val now = new java.sql.Timestamp(System.currentTimeMillis())
    val rows = perBucket.map { case (b, n, _, _, keys) =>
      Row(b, n, keys, jobId, now)
    }
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), manifestSchema)
      .write.mode(SaveMode.Append).parquet(resolvedManifestDir(spark, dir))
    fs.delete(pend, false)
    fs.delete(staging, true)
  }

  /** Write `df` partitioned by `bucketCol` through the staged two-phase
    * commit; one manifest row per bucket: (bucket, rows, files, job_id,
    * written_at). Appends compose: the manifest unions previous commits.
    * Returns the manifest. */
  def write(df: DataFrame, dir: String, bucketCol: String): DataFrame = {
    val spark = df.sparkSession
    recover(spark, dir)
    stageAndCommit(df, dir, bucketCol)
    manifest(spark, dir)
  }

  /** Already-committed job ids seen by THIS driver — short-circuits the
    * per-batch manifest scan for a long-running stream (the manifest is a
    * growing file log; re-reading it every micro-batch would make trigger
    * overhead grow with stream age). Correctness never depends on the
    * cache: a fresh driver falls through to the manifest read once per
    * unseen id, and a cache hit is only honored while the sink's manifest
    * still exists (a wiped/reset sink dir invalidates its entries). Keys
    * are NUL-separated so dirs/ids containing spaces cannot collide. */
  private val seenJobIds = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  private[graft] def resetSeenCache(): Unit = seenJobIds.clear()

  /** Idempotent commit under an EXPLICIT job id — the streaming
    * exactly-once primitive: a commit whose `jobId` is already in the
    * manifest is a no-op, so a REPLAYED micro-batch (restart from the same
    * checkpoint, speculative rerun, a mid-commit crash rolled back by
    * [[recover]]) can never duplicate rows.
    * Contract: the same jobId always carries the same data. Structured
    * Streaming guarantees this for a given checkpoint (batchId → offsets is
    * recorded before processing); after a checkpoint LOSS the batch ids
    * restart and may cover different data — exactly-once then holds only if
    * the re-planned batches carry the same content, otherwise rows routed
    * into an already-committed id are skipped. Keep the checkpoint durable;
    * it is the source of the mapping this sink dedupes on. */
  def writeBatch(df: DataFrame, dir: String, bucketCol: String,
                 jobId: String): DataFrame = {
    commitBatch(df, dir, bucketCol, jobId)
    manifest(df.sparkSession, dir)
  }

  /** [[writeBatch]] without materializing the manifest afterwards — the
    * foreachBatch entry point: a cache-hit replay costs one existence check
    * instead of a manifest directory listing, so trigger overhead stays
    * O(1) in stream age. */
  def commitBatch(df: DataFrame, dir: String, bucketCol: String,
                  jobId: String): Unit = {
    val spark = df.sparkSession
    val cacheKey = s"$dir\u0000$jobId"
    if (seenJobIds.contains(cacheKey)) {
      // honor the hit only while the sink this cache entry describes still
      // exists — a wiped dir must be re-committed, not silently skipped
      if (fileSystem(spark, dir).exists(new Path(manifestDir(dir)))) return
      val prefix = s"$dir\u0000"
      seenJobIds.removeIf(_.startsWith(prefix))
    }
    recover(spark, dir)
    val m = manifest(spark, dir)
    val seen = m.columns.contains("job_id") &&
      !m.where(col("job_id") === jobId).isEmpty
    if (!seen) stageAndCommit(df, dir, bucketCol, jobId)
    seenJobIds.add(cacheKey)
  }

  // --- manifest versioning: the commit log is append-only, so after many
  // commits it is a pile of small parquet files whose LISTING cost grows
  // with table age. compactManifest() rewrites it into one file under a
  // version dir (`manifest/v<N>/`) and swaps the `manifest/CURRENT` pointer
  // (write tmp + rename — Iceberg's version-hint pattern). Readers resolve:
  // CURRENT pointer → its version dir; no pointer but complete version
  // dirs → the highest (covers a crash between writing the new version and
  // the pointer swap; versions are supersets under the single-writer rule);
  // otherwise the legacy flat layout. Commits append into the resolved dir,
  // so the protocol composes with every write/resume/batch path. ---

  private def currentPath(dir: String) = new Path(s"${manifestDir(dir)}/CURRENT")

  private def versionDirs(fs: FileSystem, dir: String): Seq[(Int, Path)] = {
    val root = new Path(manifestDir(dir))
    if (!fs.exists(root)) return Nil
    fs.listStatus(root).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.matches("v\\d+"))
      .map(s => (s.getPath.getName.drop(1).toInt, s.getPath))
  }

  /** The directory manifest rows live in right now (version-aware). */
  private def resolvedManifestDir(spark: SparkSession, dir: String): String = {
    val fs = fileSystem(spark, dir)
    val cur = currentPath(dir)
    if (fs.exists(cur)) {
      val in = fs.open(cur)
      val v = try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
              finally in.close()
      s"${manifestDir(dir)}/$v"
    } else {
      val complete = versionDirs(fs, dir)
        .filter { case (_, p) => fs.exists(new Path(p, "_SUCCESS")) }
      if (complete.nonEmpty) complete.maxBy(_._1)._2.toString
      else manifestDir(dir) // flat legacy; manifest() reads TOP-LEVEL files
        // only, so an incomplete version dir from a crashed compaction
        // cannot pollute the read (recover() retires it on the write path)
    }
  }

  /** Rewrite the manifest into ONE file and retire the old log. Explicit
    * maintenance (like Iceberg's rewrite_manifests) — run it periodically
    * on long-lived sinks; cost is one read+write of the manifest rows,
    * independent of the data tree. Safe against a crash at any step:
    * readers follow the pointer, or the highest complete version when the
    * crash hit between version write and pointer swap. */
  def compactManifest(spark: SparkSession, dir: String): DataFrame = {
    val fs = fileSystem(spark, dir)
    val m = manifest(spark, dir)
    if (m.columns.isEmpty) return m
    val nextV = (versionDirs(fs, dir).map(_._1) :+ 0).max + 1
    val target = s"${manifestDir(dir)}/v$nextV"
    m.coalesce(1).write.mode(SaveMode.ErrorIfExists).parquet(target)
    // pointer swap: tmp + rename (rename onto an existing file is not
    // portable — delete first; the max-complete-version fallback covers
    // the tiny window with no pointer)
    val tmp = new Path(s"${manifestDir(dir)}/_CURRENT.tmp")
    val out = fs.create(tmp, true)
    try out.write(s"v$nextV".getBytes(StandardCharsets.UTF_8))
    finally out.close()
    if (fs.exists(currentPath(dir))) fs.delete(currentPath(dir), false)
    require(fs.rename(tmp, currentPath(dir)), "manifest pointer swap failed")
    // retire everything that is not the new version or the pointer
    fs.listStatus(new Path(manifestDir(dir))).foreach { s =>
      val n = s.getPath.getName
      if (n != s"v$nextV" && n != "CURRENT") fs.delete(s.getPath, true)
    }
    manifest(spark, dir)
  }

  /** All committed manifest rows (empty frame if nothing committed yet).
    * Reads explicit top-level files so a version dir mid-compaction never
    * leaks into a flat read — and the read path never deletes anything. */
  def manifest(spark: SparkSession, dir: String): DataFrame = {
    val mdir = resolvedManifestDir(spark, dir)
    val fs = fileSystem(spark, dir)
    val p = new Path(mdir)
    if (!fs.exists(p)) return spark.emptyDataFrame
    val files = fs.listStatus(p).filter(_.isFile).map(_.getPath)
      .filter(f => f.getName.endsWith(".parquet") &&
        !f.getName.startsWith("_") && !f.getName.startsWith("."))
    if (files.isEmpty) spark.emptyDataFrame
    else spark.read.parquet(files.map(_.toString).toIndexedSeq: _*)
  }

  /** Buckets already committed (partition-directory string values). */
  def completed(spark: SparkSession, dir: String): DataFrame = {
    val m = manifest(spark, dir)
    if (m.columns.isEmpty) m else m.select(m.columns.head).distinct()
  }

  /** Resume a partially-completed job: recover from any crashed attempt,
    * anti-join the manifest to drop rows of buckets already committed,
    * write + commit only the remainder. Returns the updated manifest. */
  def resumeWrite(df: DataFrame, dir: String, bucketCol: String): DataFrame = {
    val spark = df.sparkSession
    recover(spark, dir)
    stageAndCommit(remainingOf(df, dir, bucketCol), dir, bucketCol)
    manifest(spark, dir)
  }

  /** Rows of `df` whose bucket has no committed manifest row yet. NULL
    * buckets commit under Hive's default partition name, so the anti-join
    * key must map null to that name too — a plain === would re-commit
    * null-bucket rows on every resume. */
  private def remainingOf(df: DataFrame, dir: String,
                          bucketCol: String): DataFrame = {
    val done = completed(df.sparkSession, dir)
    if (done.columns.isEmpty) df
    else df.join(
      broadcast(done.select(col(done.columns.head).as("__done_bucket"))),
      coalesce(df(bucketCol).cast(StringType),
        lit(ExternalCatalogUtils.DEFAULT_PARTITION_NAME)) === col("__done_bucket"),
      "left_anti")
  }

  /** Mid-job resume granularity: split the write into `groups` sequential
    * commits keyed by a stable hash of the bucket — a crash loses at most
    * one group, and the rerun skips every committed bucket. When the SOURCE
    * is partitioned by the bucket key (the intended layout), each group's
    * job prunes its scan to the group's slice, so the input is read once
    * overall, not ×groups. */
  def writeGrouped(df: DataFrame, dir: String, bucketCol: String,
                   groups: Int = 8): DataFrame = {
    val spark = df.sparkSession
    recover(spark, dir)
    val remaining = remainingOf(df, dir, bucketCol)
    for (g <- 0 until groups) {
      val slice = remaining.where(
        pmod(xxhash64(col(bucketCol)), lit(groups)) === g)
      stageAndCommit(slice, dir, bucketCol)
    }
    manifest(spark, dir)
  }

  /** Explicit maintenance: delete data files not registered by any manifest
    * row (files planted outside the staged-commit protocol — e.g. a foreign
    * writer). This is the ONLY full-tree listing in the sink and is never
    * called from the write path, mirroring Iceberg's `remove_orphan_files`
    * maintenance procedure. Legacy manifests without a file registry are
    * left untouched. Returns the number of files removed. */
  def cleanOrphans(spark: SparkSession, dir: String): Int = {
    recover(spark, dir)
    val m = manifest(spark, dir)
    if (!m.columns.contains("files")) return 0
    val committed =
      m.select(explode(col("files"))).collect().map(_.getString(0)).toSet
    val fs = fileSystem(spark, dir)
    val orphans = listFilesUnder(fs, new Path(dataDir(dir)))
      .filterNot(p => committed(key(p)))
    orphans.foreach(p => fs.delete(p, false))
    orphans.length
  }

  /** Fault injection for specs + the q44 driver certificate: stage `df`,
    * write the pending marker, move only ~half of the staged files into the
    * table, then "die" — exactly the state a job killed between commit
    * phases 2 and 3 leaves behind. [[recover]] must roll it back. */
  private[graft] def injectCrashMidCommit(df: DataFrame, dir: String,
                                          bucketCol: String): Unit = {
    val spark = df.sparkSession
    val fs = fileSystem(spark, dir)
    val jobId = "crashed-" + java.util.UUID.randomUUID().toString
    val staging = new Path(s"${stagingRoot(dir)}/$jobId")
    df.write.mode(SaveMode.ErrorIfExists).partitionBy(bucketCol)
      .parquet(staging.toString)
    val staged = listFilesUnder(fs, staging)
    val finals = staged.map { p =>
      (p, new Path(s"${dataDir(dir)}/${p.getParent.getName}/${p.getName}"))
    }
    val pend = new Path(s"${pendingDir(dir)}/$jobId")
    fs.mkdirs(pend.getParent)
    val out = fs.create(pend, false)
    try out.write(finals.map(f => key(f._2)).mkString("\n")
      .getBytes(StandardCharsets.UTF_8))
    finally out.close()
    finals.take(math.max(1, finals.length / 2)).foreach { case (src, dst) =>
      fs.mkdirs(dst.getParent)
      fs.rename(src, dst)
    }
  }

  /** Fault injection: a job that died while still writing its staging
    * directory (no marker yet). */
  private[graft] def injectCrashMidStaging(df: DataFrame, dir: String,
                                           bucketCol: String): Unit = {
    val jobId = "staged-" + java.util.UUID.randomUUID().toString
    df.write.mode(SaveMode.ErrorIfExists).partitionBy(bucketCol)
      .parquet(s"${stagingRoot(dir)}/$jobId")
  }
}
