package graft.sources

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.{FileStatus, FileSystem, Path}
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
  *   dir/data/<bucket>=<v>/      committed data files — what readers scan
  *   dir/staging/<jobId>/        this job's files, partitioned by bucket
  *   dir/pending/<jobId>         commit intent: the final paths about to appear
  *   dir/leases/<jobId>          liveness marker for an IN-FLIGHT job
  *   dir/manifest/commit-<jobId>.parquet   one commit's manifest rows
  *   dir/manifest/v-<uuid>/      compacted manifest snapshots (any number)
  *   dir/_sink_id                sink identity stamp (creation UUID)
  * }}}
  *
  * Commit protocol (all steps O(files written by THIS job), never a listing
  * or scan of the historical table — an Iceberg-style metadata commit):
  *   1. acquire the job lease (one empty file);
  *   2. write `df` into `staging/<jobId>/` (invisible to readers);
  *   3. list that one directory; read row counts from the new files'
  *      parquet FOOTERS (metadata only, no data scan);
  *   4. write the `pending/<jobId>` marker naming every final path;
  *   5. rename each staged file into `data/`;
  *   6. land the manifest rows as `commit-<jobId>.parquet` (written to a
  *      job-private temp dir, then ONE rename — concurrent committers never
  *      share a Spark `_temporary` directory);
  *   7. delete the marker, staging dir and lease.
  *
  * MULTI-WRITER SAFETY (round-4): concurrent jobs writing one sink are safe
  * because every shared-state transition is either job-scoped (staging,
  * marker, lease, commit file — all named by jobId) or append-only (the
  * manifest). [[recover]] — run by every writer before it starts — reaps
  * only jobs whose lease is DEAD: missing (clean finish or a failed job
  * that released in `finally`) or older than the stale horizon
  * (`graft.lineage.staleMs`, default 10 min — a process that died holding
  * its lease). A live concurrent job's staging/marker is never swept: the
  * committer HEARTBEATS its lease every quarter horizon for as long as it
  * runs (round-5), so liveness no longer depends on any single commit step
  * finishing within the horizon; ownership is re-verified before the file
  * moves and before the manifest append, turning a reaped-while-running
  * attempt (heartbeat thread dead > horizon) into a loud abort instead of
  * manifest rows pointing at deleted files. Clock-skew caveat: liveness
  * compares the reaper's local clock to store mtimes — size the horizon
  * with skew margin. The
  * cost: a job that DIED holding its lease leaves its partial state (and,
  * after a mid-commit crash, its half-moved data files) visible for up to
  * the horizon before any writer rolls it back — readers that must never
  * see such files should read [[snapshot]] (manifest-registered files
  * only), which is exact at commit granularity at all times.
  *
  * Crash recovery is driven purely by the markers: a crash before step 4
  * leaves only a staging dir (deleted once the lease is dead); a crash
  * between 4 and 7 leaves a marker whose job either reached the manifest
  * (roll FORWARD: drop the marker) or did not (roll BACK: delete exactly
  * the marker's listed paths). Recovery reads only `pending/`, `staging/`,
  * `leases/` and the manifest rows OF THE MARKED JOBS (an `isin` filter —
  * O(markers) driver state, not O(commits); round-3 collected every
  * committed job id).
  *
  * Manifest = the union of flat `commit-*.parquet` files and every COMPLETE
  * (`_SUCCESS`-marked) `v-*` snapshot dir, deduplicated on (job_id, bucket).
  * Duplication between a snapshot and the commits it covers is therefore
  * HARMLESS, which is what makes compaction lock-free: [[compactManifest]]
  * writes a new uniquely-named snapshot of whatever it listed, and retires
  * covered items only once a snapshot covering them has been complete for
  * at least the stale horizon (so any reader that listed the manifest
  * before the deletion saw a snapshot containing those rows — the
  * Iceberg expire-snapshots-with-retention pattern, replacing round-3's
  * non-atomic CURRENT-pointer delete+rename swap). Two concurrent
  * compactions write two snapshots; both are read, dedup converges, and a
  * later compaction folds them into one.
  *
  * File identity: manifest `files` entries and recovery paths are BOTH
  * derived from Hadoop listings (`Path.toUri.getPath`) — a single encoding,
  * so bucket values that URI-escape (spaces, `%`, non-ASCII) round-trip.
  *
  * All filesystem access goes through Hadoop [[FileSystem]] (works on HDFS /
  * object stores, not only local disk). On object stores without atomic
  * rename the per-file move in step 5 is a copy — still O(new); swap in a
  * real Iceberg catalog for a pure-metadata commit. At cluster scale the
  * driver-side footer loop in step 3 would come from task commit messages;
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
  private def leaseRoot(dir: String) = s"$dir/leases"

  /** Liveness horizon: a lease older than this marks a dead job, and a
    * manifest snapshot must be complete this long before the items it
    * covers may be deleted. */
  private def staleMs(spark: SparkSession): Long =
    spark.conf.getOption("graft.lineage.staleMs").map(_.toLong).getOrElse(600000L)

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

  // ------------------------------------------------------------- leases ---

  private def leasePath(dir: String, jobId: String) =
    new Path(s"${leaseRoot(dir)}/$jobId")

  private[graft] def acquireLease(fs: FileSystem, dir: String, jobId: String): Unit = {
    val p = leasePath(dir, jobId)
    fs.mkdirs(p.getParent)
    fs.create(p, true).close()
  }

  /** Background lease heartbeat: touches the lease's mtime every quarter
    * horizon so a LIVE commit whose single step runs longer than
    * `graft.lineage.staleMs` (a big staging write, a many-file phase-2
    * move — routine at target scale) never looks dead to a concurrent
    * [[recover]]. Without it, the multi-writer safety claim silently
    * depended on "every commit step completes within the horizon". A
    * missed beat (transient IO error) is tolerated: ownership is
    * re-verified at the phase boundaries below. Liveness compares the
    * reaper's LOCAL clock against the store's mtime, so cross-node clock
    * skew eats into the margin — keep the horizon ≥ 4× the worst skew plus
    * the heartbeat period. */
  /** One warning per FileSystem class per JVM when beats fail. */
  private val heartbeatWarned =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  private[graft] def startHeartbeat(fs: FileSystem, dir: String,
                             attempt: String, horizonMs: Long): Thread = {
    val period = math.max(1000L, horizonMs / 4)
    val t = new Thread(() => {
      try {
        while (!Thread.currentThread().isInterrupted) {
          Thread.sleep(period)
          // survive ANY per-beat failure, not just IOException: a store
          // whose setTimes throws UnsupportedOperationException (common on
          // object-store connectors) must not silently kill the beat —
          // that would re-create exactly the silent liveness dependence
          // this thread exists to remove
          try fs.setTimes(leasePath(dir, attempt), System.currentTimeMillis(), -1)
          catch {
            case scala.util.control.NonFatal(e) =>
              if (heartbeatWarned.add(fs.getClass.getName))
                org.slf4j.LoggerFactory.getLogger(getClass).warn(
                  s"lease heartbeat beat failed on ${fs.getClass.getName} " +
                  s"(${e.getClass.getSimpleName}: ${e.getMessage}); if setTimes " +
                  "is unsupported here, mtime-based liveness cannot be " +
                  "refreshed — size graft.lineage.staleMs above the longest " +
                  "commit instead")
          }
        }
      } catch { case _: InterruptedException => () }
    }, s"graft-lease-heartbeat-$attempt")
    t.setDaemon(true)
    t.start()
    t
  }

  private[graft] def stopHeartbeat(t: Thread): Unit = { t.interrupt(); t.join(2000) }

  /** Abort if a concurrent [[recover]] reaped this attempt: the lease and
    * the pending marker are both attempt-unique state only the reaper
    * deletes, so either missing means our staging/half-moved files may
    * already be gone — registering manifest rows for them would corrupt
    * the table. Checked before phase 2 (file moves) and before the
    * manifest append. This narrows, not closes, the reap race (the reaper
    * deletes files before the marker): the heartbeat is the actual
    * guarantee, this check turns a silent corruption into a loud abort
    * when the heartbeat itself died for longer than the horizon. */
  private[graft] def verifyOwned(fs: FileSystem, dir: String, attempt: String,
                          marker: Path): Unit = {
    if (!fs.exists(leasePath(dir, attempt)) || !fs.exists(marker))
      throw new IllegalStateException(
        s"commit ownership lost for attempt $attempt (lease or pending marker " +
        "reaped by a concurrent recover — did a single commit step exceed " +
        "graft.lineage.staleMs?); aborting before registering rows. Any " +
        "half-moved files are rolled back by recover() via the marker.")
  }

  private def releaseLease(fs: FileSystem, dir: String, jobId: String): Unit =
    fs.delete(leasePath(dir, jobId), false)

  /** A job is LIVE while its lease file exists and is younger than the
    * stale horizon. Everything belonging to a non-live job is fair game
    * for [[recover]]. */
  private[graft] def leaseLive(fs: FileSystem, dir: String, jobId: String,
                        horizonMs: Long): Boolean =
    try {
      val st = fs.getFileStatus(leasePath(dir, jobId))
      System.currentTimeMillis() - st.getModificationTime < horizonMs
    } catch { case _: java.io.FileNotFoundException => false }

  // ----------------------------------------------------------- recovery ---

  /** Roll the sink to a consistent state after any crash. Inspects ONLY the
    * pending markers, the staging root, the leases and the manifest rows of
    * the marked jobs — never the data tree. Safe to run CONCURRENTLY with
    * live writers: anything under a live lease is skipped. */
  def recover(spark: SparkSession, dir: String): Unit = {
    val fs = fileSystem(spark, dir)
    val horizon = staleMs(spark)
    val pending = new Path(pendingDir(dir))
    if (fs.exists(pending)) {
      // a concurrent recover() may delete a dead marker between our listing
      // and the read — a vanished marker is simply someone else's finished
      // work, never an error
      def markerLines(p: Path): Option[List[String]] =
        try {
          val in = fs.open(p)
          try Some(scala.io.Source.fromInputStream(in, "UTF-8").getLines().toList)
          finally in.close()
        } catch { case _: java.io.IOException => None }
      def attemptOf(lines: List[String]): Option[String] =
        lines.headOption.collect {
          case h if h.startsWith("#attempt=") => h.stripPrefix("#attempt=")
        }
      // a marker's liveness is its owning ATTEMPT's lease (header line). A
      // HEADERLESS marker is either mid-creation (created-but-not-closed by
      // a live committer — exclusive create makes the empty file visible
      // before the content lands) or a dead legacy marker: age decides.
      def markerLive(p: Path, st: FileStatus, lines: List[String]): Boolean =
        attemptOf(lines) match {
          case Some(a) => leaseLive(fs, dir, a, horizon)
          case None =>
            System.currentTimeMillis() - st.getModificationTime < horizon
        }
      val markers = fs.listStatus(pending)
        .filterNot(s => s.getPath.getName.startsWith("_") ||
          s.getPath.getName.startsWith("."))
        .flatMap(s => markerLines(s.getPath).map(ls => (s.getPath, s, ls)))
        .filterNot { case (p, st, ls) => markerLive(p, st, ls) }
      if (markers.nonEmpty) {
        val m = manifest(spark, dir)
        // O(markers) driver state: only the MARKED jobs' manifest rows are
        // pulled, never the full committed set (round-3 collected all job
        // ids). The registered-file sets distinguish roll-forward from a
        // failed DUPLICATE attempt of an already-committed job id (two
        // concurrent committers with one jobId: the loser's marker lists
        // different part-file names than the winner registered — those
        // must be deleted, or the loser's half-moved files would linger as
        // duplicate rows). Legacy manifests without a file registry roll
        // forward whole (no diff possible — never delete a committed
        // job's data on a guess).
        val markerIds = markers.map(_._1.getName).toSeq
        val hasRegistry = m.columns.contains("files")
        val committedJobs: Set[String] =
          if (m.columns.contains("job_id"))
            m.where(col("job_id").isin(markerIds: _*))
              .select("job_id").distinct().collect().map(_.getString(0)).toSet
          else Set.empty
        val committedFiles: Map[String, Set[String]] =
          if (hasRegistry && m.columns.contains("job_id"))
            m.where(col("job_id").isin(markerIds: _*))
              .select(col("job_id"), explode(col("files")).as("f"))
              .collect()
              .groupBy(_.getString(0)).view
              .mapValues(_.map(_.getString(1)).toSet).toMap
          else Map.empty
        for ((marker, _, lines) <- markers) {
          val jobId = marker.getName
          val committed = committedJobs.contains(jobId)
          val registered = committedFiles.getOrElse(jobId, Set.empty)
          // roll back every marker-listed path the manifest did not
          // register (all of them when the job never committed; none when
          // it committed but the manifest predates the file registry)
          if (!committed || hasRegistry) {
            val listed = lines.filterNot(_.startsWith("#"))
            listed.filter(p => p.nonEmpty && !registered(p)).foreach { p =>
              val fp = new Path(p)
              if (fs.exists(fp)) fs.delete(fp, false)
            }
          }
          fs.delete(marker, false)
          // the lease is named by the owning ATTEMPT, not the job id
          attemptOf(lines).foreach(a => releaseLease(fs, dir, a))
        }
      }
    }
    // staging dirs and manifest temp dirs of non-live jobs belong to dead
    // jobs; a live concurrent writer's are left alone
    val sroot = new Path(stagingRoot(dir))
    if (fs.exists(sroot))
      fs.listStatus(sroot)
        .filterNot(s => leaseLive(fs, dir, s.getPath.getName, horizon))
        .foreach(s => { fs.delete(s.getPath, true)
          releaseLease(fs, dir, s.getPath.getName) })
    // orphaned sink-id temp files (a stamper that died between write and
    // rename) — dot-prefixed, invisible to readers; reap once stale. The
    // age floor is NOT the configurable horizon: a spec running with
    // staleMs=0 must not nuke a LIVE stamper's millisecond-wide
    // write-to-rename window (these temps have no lease to check)
    val sinkTmpFloor = math.max(horizon, 60000L)
    val root = new Path(dir)
    if (fs.exists(root))
      fs.listStatus(root).foreach { s =>
        if (s.getPath.getName.startsWith("._sink_id.tmp-") &&
            System.currentTimeMillis() - s.getModificationTime > sinkTmpFloor)
          fs.delete(s.getPath, false)
      }
    val mroot = new Path(manifestDir(dir))
    if (fs.exists(mroot)) {
      fs.listStatus(mroot).foreach { s =>
        val n = s.getPath.getName
        if (n.startsWith(".mtmp-") &&
            !leaseLive(fs, dir, n.stripPrefix(".mtmp-"), horizon))
          fs.delete(s.getPath, true)
        // INCOMPLETE snapshot dirs from a crashed compaction — but only
        // once stale, so an in-flight concurrent compaction isn't swept
        if (isVersionName(n) && s.isDirectory &&
            !fs.exists(new Path(s.getPath, "_SUCCESS")) &&
            System.currentTimeMillis() - s.getModificationTime > horizon)
          fs.delete(s.getPath, true)
      }
    }
  }

  private val manifestSchema = StructType(Seq(
    StructField("bucket", StringType),
    StructField("rows", LongType),
    StructField("files", ArrayType(StringType)),
    StructField("job_id", StringType),
    StructField("written_at", TimestampType)))

  /** Land one job's manifest rows as `commit-<jobId>.parquet`: Spark-write
    * into a job-private temp dir, then a single rename. Concurrent
    * committers touch disjoint paths (no shared `_temporary`). */
  private def appendManifestRows(spark: SparkSession, dir: String,
      jobId: String, attempt: String, rows: Seq[Row]): Unit = {
    val fs = fileSystem(spark, dir)
    val tmp = new Path(s"${manifestDir(dir)}/.mtmp-$attempt")
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), manifestSchema)
      .write.mode(SaveMode.ErrorIfExists).parquet(tmp.toString)
    val parts = listFilesUnder(fs, tmp).filter(_.getName.endsWith(".parquet"))
    require(parts.size == 1, s"expected one manifest part file, got $parts")
    val target = new Path(s"${manifestDir(dir)}/commit-$jobId.parquet")
    // defensive: rename-to-existing OVERWRITES on LocalFileSystem/S3A, so
    // never rely on it failing — the marker re-check in stageAndCommit
    // makes a duplicate commit unreachable, this guards the residual
    // non-atomic-marker window loudly instead of clobbering the winner
    require(!fs.exists(target),
      s"manifest commit already exists: $target (duplicate jobId commit)")
    require(fs.rename(parts.head, target), s"manifest commit rename failed: $target")
    fs.delete(tmp, true)
  }

  /** Stage `df` and run the two-phase commit. The STAGING dir and LEASE are
    * per-ATTEMPT (`<jobId>--<uuid>`): two concurrent attempts of one job id
    * (two streams misconfigured onto one sink, a speculative double-fire)
    * must never share a staging tree or a Spark `_temporary` dir. The
    * pending MARKER stays jobId-named — its exclusive creation is the
    * commit mutex: exactly one attempt proceeds past it, and a late loser
    * that slips through after the winner finished fails at the manifest
    * rename and is rolled back by [[recover]] via the marker-vs-registered
    * file diff. */
  private[graft] def stageAndCommit(df: DataFrame, dir: String, bucketCol: String,
      jobId: String = java.util.UUID.randomUUID().toString): Unit = {
    val spark = df.sparkSession
    val fs = fileSystem(spark, dir)
    val conf = spark.sparkContext.hadoopConfiguration
    val attempt = s"$jobId--${java.util.UUID.randomUUID()}"
    val staging = new Path(s"${stagingRoot(dir)}/$attempt")

    acquireLease(fs, dir, attempt)
    val heartbeat = startHeartbeat(fs, dir, attempt, staleMs(spark))
    try {
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

      // phase 1: record intent — every final path this commit will create.
      // Exclusive create = the per-jobId commit mutex; the first line names
      // the owning attempt so recover() can check ITS lease for liveness.
      val pend = new Path(s"${pendingDir(dir)}/$jobId")
      fs.mkdirs(pend.getParent)
      val out = fs.create(pend, false)
      try out.write((s"#attempt=$attempt\n" + perBucket.flatMap(_._5).mkString("\n"))
        .getBytes(StandardCharsets.UTF_8))
      finally out.close()

      // holding the marker, re-check the manifest: a LATE second attempt of
      // an already-committed job id acquires the marker only after the
      // winner finished (deleted its marker AFTER landing its manifest
      // row), so the row is visible now — abort before touching data/
      // rather than trusting rename-to-existing to fail (it does not on
      // LocalFileSystem or S3A)
      val already = {
        val m = manifest(spark, dir)
        m.columns.contains("job_id") && !m.where(col("job_id") === jobId).isEmpty
      }
      if (already) {
        fs.delete(pend, false)
        fs.delete(staging, true)
        return
      }

      // phase 2: move staged files into the table — but only if no reaper
      // claimed this attempt while staging ran (see verifyOwned)
      verifyOwned(fs, dir, attempt, pend)
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

      // phase 3: land the commit log row file, then retire marker + staging
      val now = new java.sql.Timestamp(System.currentTimeMillis())
      val rows = perBucket.map { case (b, n, _, _, keys) =>
        Row(b, n, keys, jobId, now)
      }
      verifyOwned(fs, dir, attempt, pend)
      appendManifestRows(spark, dir, jobId, attempt, rows)
      fs.delete(pend, false)
      fs.delete(staging, true)
    } finally {
      stopHeartbeat(heartbeat)
      releaseLease(fs, dir, attempt)
    }
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

  // ---------------------------------------------------- sink identity ----

  /** The sink's creation UUID, stamped on first use (exclusive create — a
    * concurrent loser reads the winner's). A wiped-and-recreated sink dir
    * gets a NEW id, which is what keys the seen-cache below: entries of the
    * old incarnation can never satisfy a lookup against the new one.
    * (Partial wipes that preserve `_sink_id` keep the identity — wipe the
    * sink root, not its insides.) */
  private def sinkId(fs: FileSystem, dir: String): String = {
    val p = new Path(s"$dir/_sink_id")
    var attempt = 0
    while (attempt < 100) {
      try {
        val in = fs.open(p)
        val s = try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
                finally in.close()
        if (s.length == 36) return s
      } catch { case _: java.io.IOException => () }
      // missing: stamp it via write-to-temp + RENAME. Never two concurrent
      // create(overwrite=false) on the live path: on ChecksumFileSystem the
      // racers' data and .crc streams can interleave into a PERMANENTLY
      // unreadable file (observed in the concurrency spec). A rename either
      // lands a complete file (local FS: atomic, last-wins) or fails
      // against an existing one (HDFS) — both settle on one readable id;
      // a transiently divergent read is only ever a seen-cache MISS, which
      // falls through to the idempotent manifest check.
      try {
        fs.mkdirs(p.getParent)
        val tmp = new Path(s"$dir/._sink_id.tmp-${java.util.UUID.randomUUID()}")
        val out = fs.create(tmp, true)
        try out.write(java.util.UUID.randomUUID().toString
          .getBytes(StandardCharsets.UTF_8))
        finally out.close()
        if (!fs.rename(tmp, p)) fs.delete(tmp, false)
      } catch { case _: java.io.IOException => () }
      attempt += 1
      if (attempt > 1) Thread.sleep(5)
    }
    throw new IllegalStateException(s"cannot establish sink identity at $p")
  }

  /** Already-committed (sink incarnation, job id) pairs seen by THIS
    * driver — short-circuits the per-batch manifest scan for a long-running
    * stream (re-reading the growing manifest every micro-batch would make
    * trigger overhead grow with stream age). Correctness never depends on
    * the cache: a fresh driver falls through to the manifest read once per
    * unseen id, and keys embed the sink's creation UUID, so a wiped and
    * re-created sink (new UUID) can never produce a stale hit. Keys are
    * NUL-separated so dirs/ids containing spaces cannot collide. */
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
    * foreachBatch entry point: a cache-hit replay costs one small
    * `_sink_id` read instead of a manifest listing, so trigger overhead
    * stays O(1) in stream age. */
  def commitBatch(df: DataFrame, dir: String, bucketCol: String,
                  jobId: String): Unit = {
    val spark = df.sparkSession
    val fs = fileSystem(spark, dir)
    val cacheKey = s"$dir\u0000${sinkId(fs, dir)}\u0000$jobId"
    if (seenJobIds.contains(cacheKey)) return
    recover(spark, dir)
    val m = manifest(spark, dir)
    val seen = m.columns.contains("job_id") &&
      !m.where(col("job_id") === jobId).isEmpty
    if (!seen) stageAndCommit(df, dir, bucketCol, jobId)
    seenJobIds.add(cacheKey)
  }

  // ------------------------------------------------- manifest snapshots ---

  private def isVersionName(n: String): Boolean =
    n.matches("v-[0-9a-f-]+") || n.matches("v\\d+")

  private def manifestParts(fs: FileSystem,
      dir: String): (Seq[FileStatus], Seq[FileStatus]) = {
    val root = new Path(manifestDir(dir))
    if (!fs.exists(root)) return (Nil, Nil)
    val st = fs.listStatus(root).toSeq
    val flats = st.filter(s => s.isFile && s.getPath.getName.endsWith(".parquet") &&
      !s.getPath.getName.startsWith("_") && !s.getPath.getName.startsWith("."))
    val versions = st.filter(s => s.isDirectory && isVersionName(s.getPath.getName) &&
      fs.exists(new Path(s.getPath, "_SUCCESS")))
    (flats, versions)
  }

  /** All committed manifest rows (empty frame if nothing committed yet):
    * the union of flat commit files and complete snapshot dirs, dedup'd on
    * (job_id, bucket) — so overlap between a snapshot and the commits it
    * covers (the lock-free compaction window) never double-counts. A file
    * retired by a concurrent compaction between our listing and the read
    * is covered two ways: `ignoreMissingFiles` skips files that vanish
    * AFTER planning, but a root path already gone at DataSource resolution
    * still throws PATH_NOT_FOUND — that transient is retried with a fresh
    * listing (exact by construction: retirement requires a covering
    * snapshot to have been complete for a full horizon, so the re-listing
    * sees it). */
  def manifest(spark: SparkSession, dir: String): DataFrame = {
    val fs = fileSystem(spark, dir)
    def readOnce(): DataFrame = {
      val (flats, versions) = manifestParts(fs, dir)
      val paths = (flats ++ versions).map(_.getPath.toString)
      if (paths.isEmpty) return spark.emptyDataFrame
      val df = spark.read.option("ignoreMissingFiles", "true")
        .parquet(paths: _*)
      if (df.columns.contains("job_id")) df.dropDuplicates("job_id", "bucket")
      else df
    }
    try readOnce()
    catch { case _: org.apache.spark.sql.AnalysisException => readOnce() }
  }

  /** Rewrite the manifest into ONE snapshot and retire what it covers.
    * Explicit maintenance (like Iceberg's rewrite_manifests) — run it
    * periodically on long-lived sinks; cost is one read+write of the
    * manifest rows, independent of the data tree.
    *
    * Lock-free: the snapshot dir name is unique (`v-<uuid>`), the `_covers`
    * file records exactly what it subsumed, and covered items are deleted
    * only by a LATER compaction, once the covering snapshot has been
    * complete for the stale horizon — any reader that listed the manifest
    * before such a deletion therefore saw the covering snapshot, and
    * `ignoreMissingFiles` + (job_id, bucket) dedup make the read exact.
    * Concurrent compactions both succeed (two snapshots, dedup'd), and a
    * crash at any step leaves only harmless duplicates or a stale
    * incomplete dir that [[recover]] retires. */
  def compactManifest(spark: SparkSession, dir: String): DataFrame = {
    val fs = fileSystem(spark, dir)
    val horizon = staleMs(spark)
    val (flats, versions) = manifestParts(fs, dir)

    // retire pass: items covered by a snapshot complete for >= horizon
    for (v <- versions
         if System.currentTimeMillis() - v.getModificationTime > horizon) {
      val coversPath = new Path(v.getPath, "_covers")
      if (fs.exists(coversPath)) {
        val in = fs.open(coversPath)
        val covered =
          try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toList
          finally in.close()
        covered.filter(_.nonEmpty).foreach { name =>
          val p = new Path(s"${manifestDir(dir)}/$name")
          if (fs.exists(p)) fs.delete(p, true)
        }
      }
    }

    val (flats2, versions2) = manifestParts(fs, dir)
    if (flats2.isEmpty && versions2.size <= 1) return manifest(spark, dir)
    val covered = (flats2 ++ versions2).map(_.getPath)
    val m = spark.read.option("ignoreMissingFiles", "true")
      .parquet(covered.map(_.toString): _*)
    val deduped =
      if (m.columns.contains("job_id")) m.dropDuplicates("job_id", "bucket") else m
    val target = s"${manifestDir(dir)}/v-${java.util.UUID.randomUUID()}"
    deduped.coalesce(1).write.mode(SaveMode.ErrorIfExists).parquet(target)
    val out = fs.create(new Path(s"$target/_covers"), false)
    try out.write(covered.map(_.getName).mkString("\n").getBytes(StandardCharsets.UTF_8))
    finally out.close()
    manifest(spark, dir)
  }

  /** Buckets already committed (partition-directory string values). */
  def completed(spark: SparkSession, dir: String): DataFrame = {
    val m = manifest(spark, dir)
    if (m.columns.isEmpty) m else m.select(m.columns.head).distinct()
  }

  /** The committed table EXACTLY: reads the manifest-registered files, so
    * concurrent readers never see a live job's half-moved files or a dead
    * job's not-yet-recovered leftovers (which a raw `dir/data` scan can,
    * for up to the stale horizon). The file list is driver-materialized —
    * inherent to planning a file scan; at extreme file counts use
    * [[snapshotWhere]], which prunes the manifest BEFORE the driver ever
    * sees a file name.
    *
    * SCHEMA NOTE (round 5): the returned frame now INCLUDES the bucket
    * partition column (recovered via `basePath`; `partitionBy` strips it
    * from the data files). Pre-round-5 callers that pinned the old
    * bucket-less schema (typed `.as[T]`, unions, fixed-schema writes)
    * should `.drop` it explicitly. */
  def snapshot(spark: SparkSession, dir: String): DataFrame =
    snapshotWhere(spark, dir, lit(true))

  /** [[snapshot]] restricted to manifest rows matching `predicate` (over
    * the manifest columns — bucket/rows/files/job_id) — manifest-side
    * pruning as a first-class API instead of a doc-comment escape hatch:
    * the driver materializes only the MATCHING buckets' file lists and the
    * scan plans only those files, so a search that needs `p` of `B`
    * buckets costs O(p/B) of the full-snapshot listing and read. `basePath`
    * re-derives the bucket partition column, so the returned frame is the
    * committed table INCLUDING its bucket key (partitionBy strips it from
    * the data files). */
  def snapshotWhere(spark: SparkSession, dir: String,
                    predicate: org.apache.spark.sql.Column): DataFrame = {
    val m = manifest(spark, dir)
    if (m.columns.isEmpty || !m.columns.contains("files"))
      return spark.emptyDataFrame
    val files = m.where(predicate).select(explode(col("files"))).distinct()
      .collect().map(_.getString(0))
    if (files.isEmpty) spark.emptyDataFrame
    else spark.read.option("basePath", dataDir(dir))
      .parquet(files.toIndexedSeq: _*)
  }

  /** Time-travel: the committed table AS OF `asOf` — exactly the rows whose
    * commit landed (manifest `written_at`, stamped once per job at commit
    * time) at or before that instant. Because appends are the only mutation
    * and compaction carries manifest rows verbatim (job_id/bucket-deduped,
    * never restamped), an as-of read is just [[snapshotWhere]] on the
    * commit timestamp — same manifest-side pruning, no snapshot log to
    * walk. Two caveats inherent to the design: `written_at` is the
    * COMMITTER's clock (skewed writers can interleave timestamps across
    * jobs), and this sink is append-only with retirement limited to the
    * manifest LOG (compaction) — data files are never expired, so as-of
    * reads reach all the way back; a future Iceberg-style
    * expire-with-retention would bound that, exactly as upstream. */
  def snapshotAsOf(spark: SparkSession, dir: String,
                   asOf: java.sql.Timestamp): DataFrame =
    snapshotWhere(spark, dir, col("written_at") <= lit(asOf))

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
    * maintenance procedure. The committed-file registry stays distributed —
    * the listing anti-joins the exploded manifest, and only the ORPHANS come
    * back to the driver (round-3 collected the whole committed set). Legacy
    * manifests without a file registry are left untouched. Returns the
    * number of files removed. */
  def cleanOrphans(spark: SparkSession, dir: String): Int = {
    recover(spark, dir)
    val m = manifest(spark, dir)
    if (!m.columns.contains("files")) return 0
    val fs = fileSystem(spark, dir)
    val horizon = staleMs(spark)
    import spark.implicits._
    // a LIVE writer between its file moves and its manifest landing has
    // moved-but-unregistered files in data/ — never orphans. Two guards,
    // mirroring Iceberg remove_orphan_files' retention: (a) every path
    // named by a pending marker is in flight, (b) only files older than
    // the stale horizon qualify at all (any live commit is younger)
    val pend = new Path(pendingDir(dir))
    val inFlight: Set[String] =
      if (!fs.exists(pend)) Set.empty
      else fs.listStatus(pend).filter(_.isFile).flatMap { s =>
        try {
          val in = fs.open(s.getPath)
          try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
            .filterNot(_.startsWith("#")).toList
          finally in.close()
        } catch { case _: java.io.IOException => Nil }
      }.toSet
    val now = System.currentTimeMillis()
    val listed = {
      val root = new Path(dataDir(dir))
      if (!fs.exists(root)) Nil
      else {
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        val it = fs.listFiles(root, true)
        while (it.hasNext) {
          val f = it.next()
          val n = f.getPath.getName
          if (!n.startsWith("_") && !n.startsWith(".") &&
              now - f.getModificationTime > horizon &&
              !inFlight(key(f.getPath))) out += key(f.getPath)
        }
        out.toSeq
      }
    }
    if (listed.isEmpty) return 0
    val committed = m.select(explode(col("files")).as("path")).distinct()
    val orphans = listed.toDF("path").join(committed, Seq("path"), "left_anti")
      .collect().map(_.getString(0))
    orphans.foreach(p => fs.delete(new Path(p), false))
    orphans.length
  }

  /** Fault injection for specs + the q44 driver certificate: stage `df`,
    * write the pending marker, move only ~half of the staged files into the
    * table, then "die" — exactly the state a job killed between commit
    * phases 5 and 6 leaves behind. No lease is written (the simulated
    * process is gone), so [[recover]] must roll it back immediately. */
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
    // header names a (never-leased) attempt so recovery treats the marker
    // as a dead job immediately — a real crash leaves exactly this shape
    try out.write((s"#attempt=$jobId\n" + finals.map(f => key(f._2)).mkString("\n"))
      .getBytes(StandardCharsets.UTF_8))
    finally out.close()
    finals.take(math.max(1, finals.length / 2)).foreach { case (src, dst) =>
      fs.mkdirs(dst.getParent)
      fs.rename(src, dst)
    }
  }

  /** Fault injection: a job that died while still writing its staging
    * directory (no marker, no lease). */
  private[graft] def injectCrashMidStaging(df: DataFrame, dir: String,
                                           bucketCol: String): Unit = {
    val jobId = "staged-" + java.util.UUID.randomUUID().toString
    df.write.mode(SaveMode.ErrorIfExists).partitionBy(bucketCol)
      .parquet(s"${stagingRoot(dir)}/$jobId")
  }
}
