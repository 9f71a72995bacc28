package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** A minimal NATIVE table format: an append-only snapshot log + per-file
  * min/max manifest over plain parquet — the transactional-metadata layer
  * the [[graft.operators.Lakehouse]] tier's algebra assumes, built with
  * nothing but parquet (this container has no Delta/Iceberg jars; the
  * mechanism is what matters, and it is theirs: Iceberg's
  * manifest_entry(status, snapshot_id, data_file{path, record_count,
  * lower_bounds, upper_bounds}) / Delta's add-action + stats JSON).
  *
  * Layout under a table root:
  * {{{
  *   data/v<version>/part-*.parquet   -- immutable data files per commit
  *   dv/v<version>/part-*.parquet     -- deletion-vector sidecars
  *   _log/v<version>/part-*.parquet   -- that version's action rows:
  *     (version, action add|remove|dv, file, n_rows, min_key, max_key,
  *      bloom, key_hll, stats, batch_id)
  *   _claims/v<version>               -- create-exclusive version claims
  * }}}
  *
  * The log IS the table: readers never list `data/` (object-store
  * listing is both slow and non-transactional at 100 TB — the reason
  * real formats exist); they read the log, resolve a version, and open
  * exactly the files the log names. That buys three things, each
  * spec-pinned in ManifestLogSpec:
  *
  *  - '''time travel''': `VERSION AS OF v` = the files with
  *    version <= v — physical file pruning, not row filtering (the
  *    file-level half of [[graft.operators.Lakehouse.cdcTimeTravel]]'s
  *    row-level algebra);
  *  - '''data skipping''': a key-range probe drops every file whose
  *    [min_key, max_key] cannot intersect it BEFORE the scan starts —
  *    [[graft.operators.Lakehouse.dataSkippingStats]]'s skip decisions
  *    APPLIED (the scan's input-file list shrinks), not just reported;
  *  - '''uncommitted invisibility''': a crash between the data write
  *    and the log append leaves orphan files readers never see (the
  *    write-order twin of [[Warehouse.dedupAppend]]'s bloom-first rule).
  *
  * Bounds are kept at two levels: the declared BIGINT clustering key
  * rides dedicated (min_key, max_key) columns every read path consults,
  * and EVERY stats-eligible column (integrals, DATE, TIMESTAMP — see
  * [[statsEnc]]) rides the per-file `stats` map, so range probes on any
  * such column prune files too ([[scanColRanges]]) — Delta's add.stats
  * minValues/maxValues, Iceberg's lower_bounds/upper_bounds, with a
  * single long-encoded lattice instead of a type-erased stats schema.
  */
object ManifestLog {

  private def logDir(path: String) = s"$path/_log"
  private def dataDir(path: String, v: Long) = s"$path/data/v$v"
  private def dvDir(path: String, v: Long) = s"$path/dv/v$v"

  /** Each version's actions land in their OWN log subdirectory as one
    * coalesced file: concurrent committers never share an output
    * directory (Hadoop's FileOutputCommitter staging dir is per-path —
    * two appenders into one flat `_log/` clobber each other's
    * `_temporary`, observed under the concurrent-commit spec), and the
    * single file appears atomically via the committer's rename, so a
    * reader never sees a torn half-commit.
    */
  private def logVersionDir(path: String, v: Long) = s"${logDir(path)}/v$v"

  private def writeActions(df: DataFrame, path: String, v: Long): Unit =
    df.coalesce(1).write.mode(SaveMode.Overwrite)
      .parquet(logVersionDir(path, v))

  private def checkpointRoot(path: String) = s"$path/_checkpoint"
  private def checkpointDir(path: String, v: Long) =
    s"${checkpointRoot(path)}/v$v"

  /** Latest valid checkpoint version, 0 if none. One FS listing of the
    * checkpoint root; a checkpoint is valid only once its committer
    * `_SUCCESS` marker exists (a torn write — crash between task and
    * job commit — can leave partial files without one, and must stay
    * invisible).
    */
  def latestCheckpoint(s: SparkSession, path: String): Long =
    validCheckpoints(s, path).lastOption.getOrElse(0L)

  /** All validated checkpoint versions, ascending (one FS listing). */
  private def validCheckpoints(s: SparkSession, path: String): Seq[Long] = {
    val conf = s.sparkContext.hadoopConfiguration
    val root = new org.apache.hadoop.fs.Path(checkpointRoot(path))
    val fs = root.getFileSystem(conf)
    if (!fs.exists(root)) return Seq.empty
    fs.listStatus(root).toSeq
      .filter(_.isDirectory)
      .flatMap(st => "^v(\\d+)$".r.findFirstMatchIn(st.getPath.getName)
        .map(_.group(1).toLong))
      .filter(v => fs.exists(
        new org.apache.hadoop.fs.Path(checkpointDir(path, v), "_SUCCESS")))
      .sorted
  }

  /** Whether a table has ever been created at `path` — a plain FS
    * existence probe on its `_log` directory. Deliberately NOT a
    * catch-all `Try` around a log read: a genuine read error (corrupt
    * file, transient IO) must PROPAGATE to the caller rather than be
    * conflated with "not created yet" (ADVICE r14 — reconcileFunnel's
    * old probe silently skipped a version's deletes on any failure
    * while the pump marker still recorded the version as processed).
    */
  def tableExists(s: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(logDir(path))
    p.getFileSystem(s.sparkContext.hadoopConfiguration).exists(p)
  }

  /** The raw action log (file-cardinality — the planning frame).
    *
    * REPLAY COST is where a version-per-directory log dies at scale:
    * the naive glob opens one parquet footer per committed version, so
    * a table with 10^5 commits pays 10^5 opens on EVERY planning step.
    * A [[checkpoint]] collapses that to one checkpoint file plus the
    * tail of versions committed after it (Delta's `_last_checkpoint`
    * design): this reader finds the latest checkpoint with one FS
    * listing, lists the log root once for tail directories, and opens
    * checkpoint + tail only. Checkpoint-free tables keep the plain
    * glob (identical semantics, linear replay).
    */
  def log(s: SparkSession, path: String): DataFrame = {
    val ck = latestCheckpoint(s, path)
    if (ck == 0L) s.read.parquet(s"${logDir(path)}/v*")
    else {
      val conf = s.sparkContext.hadoopConfiguration
      val root = new org.apache.hadoop.fs.Path(logDir(path))
      val fs = root.getFileSystem(conf)
      val tail =
        if (!fs.exists(root)) Seq.empty[String]
        else fs.listStatus(root).toSeq.filter(_.isDirectory)
          .flatMap(st => "^v(\\d+)$".r.findFirstMatchIn(st.getPath.getName)
            .map(_.group(1).toLong))
          .filter(_ > ck)
          .map(v => logVersionDir(path, v))
      s.read.parquet((checkpointDir(path, ck) +: tail): _*)
    }
  }

  /** Compact the log ≤ current version into ONE checkpoint parquet —
    * full-fidelity (every add/remove/dv action row, so time travel,
    * [[vacuumList]] and [[readChanges]] replay from it unchanged), not
    * just the live file set. Returns the checkpointed version. Safe
    * against concurrent COMMITS (they claim versions after the cut and
    * land in the tail); single-flight vs other maintenance via the
    * lock, since two checkpoint writers would race one output
    * directory. After a checkpoint, [[vacuumLog]] may drop the covered
    * per-version directories.
    */
  def checkpoint(s: SparkSession, path: String): Long =
    withMaintenanceLock(s, path) {
      val v0 = currentVersion(s, path)
      if (v0 == 0L) return 0L
      // idempotent: a checkpoint at the current version already holds
      // every action ≤ v0 — and rewriting it would Overwrite the very
      // path log() is reading (Spark refuses; and if the per-version
      // dirs were already vacuumed, a torn overwrite of the SOLE log
      // copy would lose the table)
      if (latestCheckpoint(s, path) == v0) return v0
      log(s, path).filter(col("version") <= v0)
        .coalesce(1).write.mode(SaveMode.Overwrite)
        .parquet(checkpointDir(path, v0))
      v0
    }

  /** Physically delete log version directories the PREVIOUS checkpoint
    * fully covers, plus checkpoint directories superseded twice over
    * (nothing is forfeit, unlike data [[vacuum]]'s retention trade).
    * Returns how many directories went (log + checkpoint).
    *
    * RETENTION is one checkpoint generation (Delta's retention-window
    * discipline, keyed by checkpoint lineage instead of wall-clock): a
    * concurrent reader snapshots its plan as "checkpoint C + tail > C"
    * where C is AT WORST the previous validated checkpoint (or no
    * checkpoint at all on a never-checkpointed table, where it globs
    * every v* dir — which is why a table's FIRST vacuumLog, with no
    * previous generation, deletes nothing). So this keeps (a) every
    * log dir newer than the previous checkpoint and (b) the previous
    * and latest checkpoint dirs; it deletes log dirs ≤ previous and
    * checkpoints < previous — directories no reader admitted since the
    * latest checkpoint validated can still reference. Runs under the
    * maintenance lock so two vacuums (or a vacuum and a checkpoint)
    * never interleave their listings. Bounds BOTH roots: after
    * `checkpoint(); …; checkpoint(); vacuumLog()` the log root holds
    * only the tail and _checkpoint holds two generations.
    */
  def vacuumLog(s: SparkSession, path: String): Int =
    withMaintenanceLock(s, path) {
      val cks = validCheckpoints(s, path)
      if (cks.isEmpty) return 0
      val prev = cks.dropRight(1).lastOption.getOrElse(0L)
      if (prev == 0L) return 0
      val conf = s.sparkContext.hadoopConfiguration
      val root = new org.apache.hadoop.fs.Path(logDir(path))
      val fs = root.getFileSystem(conf)
      val logGone =
        if (!fs.exists(root)) 0
        else fs.listStatus(root).toSeq.filter(_.isDirectory)
          .flatMap(st => "^v(\\d+)$".r.findFirstMatchIn(st.getPath.getName)
            .map(_.group(1).toLong -> st.getPath))
          .filter(_._1 <= prev)
          .count { case (_, p) => fs.delete(p, true) }
      // checkpoint dirs below the previous generation go by RAW listing,
      // not validCheckpoints: a torn checkpoint (crash before _SUCCESS)
      // is invisible to readers by construction, so filtering on the
      // marker here would leak every torn dir forever
      val ckRoot = new org.apache.hadoop.fs.Path(checkpointRoot(path))
      val ckGone =
        if (!fs.exists(ckRoot)) 0
        else fs.listStatus(ckRoot).toSeq.filter(_.isDirectory)
          .flatMap(st => "^v(\\d+)$".r.findFirstMatchIn(st.getPath.getName)
            .map(_.group(1).toLong -> st.getPath))
          .filter(_._1 < prev)
          .count { case (_, p) => fs.delete(p, true) }
      logGone + ckGone
    }

  /** Session conf key bounding how many file names any driver-side
    * planning step may collect (default [[MaxPlannedFilesDefault]]).
    */
  val MaxPlannedFilesConf = "graft.manifest.maxPlannedFiles"

  /** Driver planning is file-cardinality BY CONTRACT (the Delta/
    * Iceberg design: manifests are planned on the driver, data never
    * is) — and that contract is now enforced, not assumed: every
    * planning collect routes through [[collectFiles]], which fetches
    * at most cap+1 names and fails LOUDLY past the cap instead of
    * silently ballooning driver memory. 10^6 files ≈ a few hundred MB
    * of paths — the scale real formats plan comfortably; a table past
    * the cap needs compaction ([[compact]]) or a raised conf, and the
    * error says so.
    */
  val MaxPlannedFilesDefault = 1000000L

  /** Bounded driver-side collect of a planning frame's `file` column. */
  private def collectFiles(s: SparkSession,
      planned: DataFrame): Seq[String] = {
    val cap = s.conf.get(MaxPlannedFilesConf,
      MaxPlannedFilesDefault.toString).toLong
    val capped = math.min(cap + 1L, Int.MaxValue.toLong).toInt
    val files = planned.select("file").limit(capped)
      .collect().map(_.getString(0)).toSeq
    require(files.size <= cap,
      s"manifest planning exceeds $MaxPlannedFilesConf=$cap files; " +
        "compact the table or raise the conf")
    files
  }

  /** The LIVE add actions of an action window: latest action wins per
    * file. The naive `adds ANTI-JOIN removes` liveness breaks the
    * moment a file is ever RE-ADDED — [[restore]] re-publishes old
    * files by identity, giving a file the history add@v1, remove@v3,
    * add@v7, where the file-only anti-join would kill both adds. Here
    * an add row survives iff it is NEWER than the file's latest remove
    * (Delta's log replay reconciles per-path by action order the same
    * way). For never-re-added files this degenerates to exactly the
    * old anti-join. Also the canonical source of `removes` rows for
    * rewrite commits: live rows are unique per file by construction.
    */
  private def liveAdds(actions: DataFrame): DataFrame = {
    val lastRm = actions.filter(col("action") === "remove")
      .groupBy("file").agg(max(col("version")).as("_rm_v"))
    actions.filter(col("action") === "add")
      .join(lastRm, Seq("file"), "left")
      .filter(col("_rm_v").isNull || col("version") > col("_rm_v"))
      .drop("_rm_v")
  }

  /** Open log-named data files with union-by-name schema merging —
    * the reader side of SCHEMA EVOLUTION: a later commit may add
    * columns, and a snapshot spanning old and new files surfaces the
    * added columns as nulls on pre-evolution rows (Delta's
    * mergeSchema / Iceberg's schema-id resolution, here carried by
    * parquet footer merging since the log tracks files, not schemas).
    */
  private def readData(s: SparkSession, files: Seq[String]): DataFrame =
    s.read.option("mergeSchema", "true").parquet(files: _*)

  /** Latest committed version, 0 if the table does not exist yet. */
  def currentVersion(s: SparkSession, path: String): Long =
    scala.util.Try(log(s, path)).toOption
      .flatMap(l => Option(l.agg(max(col("version"))).head.getAs[java.lang.Long](0)))
      .map(_.longValue).getOrElse(0L)

  /** Per-file bloom size: 2^17 bits = 16 KiB per file — the secondary
    * index next to the min/max primary: POINT probes skip files whose
    * bloom says definitely-absent even when every file's key RANGE
    * covers the probe (hash-scattered layouts, where bounds prune
    * nothing). Delta's bloom filter index / Iceberg's bloom_filter
    * column stats, over [[graft.plans.BloomFilter]]'s aggregate.
    */
  val BloomLog2Bits = 17

  /** HLL precision for the per-file key-NDV sketch (2^12 registers =
    * 4 KiB per file, ~1.6%% standard error). */
  val NdvPrecision = 12

  /** SQL type of the per-column stats map carried by add actions. */
  private val StatsType = "map<string,struct<lo:bigint,hi:bigint>>"

  /** A typed-null stats cell for action rows that carry none (removes
    * copy the original add's; dv actions have no column stats). */
  private def nullStats = lit(null).cast(StatsType)

  /** Long encoding for a stats-eligible column — the single-lattice
    * trick that keeps the manifest schema type-free (Delta stores
    * typed JSON per column; one BIGINT lattice demonstrates the same
    * pruning with an honest restriction to order-preserving
    * encodings): integrals cast, DATE becomes days since epoch,
    * TIMESTAMP becomes microseconds. Columns outside the lattice
    * (strings, doubles, nested) simply carry no stats and never prune
    * — absence of stats means "keep the file", so the restriction
    * costs pruning power, never correctness.
    */
  private def statsEnc(dt: org.apache.spark.sql.types.DataType)
      : Option[org.apache.spark.sql.Column => org.apache.spark.sql.Column] = {
    import org.apache.spark.sql.types._
    dt match {
      case LongType | IntegerType | ShortType | ByteType =>
        Some(c => c.cast("long"))
      case DateType => Some(c => unix_date(c))
      case TimestampType => Some(c => unix_micros(c))
      case _ => None
    }
  }

  /** Honest per-file stats for a just-written commit directory: counts,
    * key bounds, the bloom blob, and PER-COLUMN min/max for every
    * stats-eligible column — all from the bytes actually on disk, not
    * from the plan. The per-column map is what lets [[scanColRanges]]
    * prune on ANY stats'd column, not just the clustering key (Delta's
    * add.stats minValues/maxValues; Iceberg's lower_bounds/
    * upper_bounds maps).
    */
  private def addActions(s: SparkSession, path: String, v: Long,
      keyCol: String, batchId: Long = NoBatch): DataFrame = {
    val data = s.read.parquet(dataDir(path, v))
    val statCols = data.schema.fields.toSeq.flatMap(f =>
      statsEnc(f.dataType).map(enc => f.name -> enc(col(f.name))))
    val statAggs = statCols.flatMap { case (n, e) =>
      Seq(min(e).as(s"__lo_$n"), max(e).as(s"__hi_$n")) }
    val statsMap =
      if (statCols.isEmpty) nullStats
      else map(statCols.flatMap { case (n, _) =>
        Seq(lit(n), struct(col(s"__lo_$n").as("lo"),
          col(s"__hi_$n").as("hi"))) }: _*)
    val aggs = Seq(count(lit(1)).as("n_rows"),
      min(col(keyCol)).cast("long").as("min_key"),
      max(col(keyCol)).cast("long").as("max_key"),
      expr(s"graft_bloom_agg(CAST($keyCol AS STRING), $BloomLog2Bits)")
        .as("bloom"),
      expr(s"graft_hll_sketch(CAST($keyCol AS STRING), $NdvPrecision)")
        .as("key_hll")) ++ statAggs
    data.groupBy(input_file_name().as("file"))
      .agg(aggs.head, aggs.tail: _*)
      .select(lit(v).as("version"), lit("add").as("action"), col("file"),
        col("n_rows"), col("min_key"), col("max_key"), col("bloom"),
        col("key_hll"), statsMap.as("stats"), lit(batchId).as("batch_id"))
  }

  /** batch_id marker for non-transactional (plain) commits. */
  val NoBatch: Long = -1L

  private def claimsDir(path: String) = s"$path/_claims"

  /** Atomic create-exclusive marker — the conditional-put primitive
    * every real format's commit protocol rests on. Hadoop's LOCAL
    * ChecksumFileSystem implements create(overwrite = false) as
    * check-then-act (two racing writers can both pass the exists
    * check — observed under a concurrent-commit spec), so local paths
    * go through java.io's O_EXCL createNewFile; HDFS-like schemes use
    * the FS's own exclusive create, which is atomic there.
    */
  private def createExclusive(fs: org.apache.hadoop.fs.FileSystem,
      p: org.apache.hadoop.fs.Path): Boolean =
    if (fs.getScheme == "file")
      scala.util.Try(new java.io.File(p.toUri.getPath).createNewFile())
        .getOrElse(false)
    else scala.util.Try(fs.create(p, false).close()).isSuccess

  /** Atomically claim a UNIQUE version number via create-exclusive
    * marker files (atomic on local FS and HDFS; object stores use a
    * conditional put — the same primitive real formats rest on).
    * Concurrent writers that race currentVersion+1 each walk forward
    * until a create succeeds, so no two commits ever share a version
    * and no data directory is ever double-written. A claim whose
    * writer crashed before the log append is a harmless GAP: the log
    * never names the version, readers never see it, and later
    * claimants walk past it.
    */
  private def claimVersion(s: SparkSession, path: String): Long = {
    val conf = s.sparkContext.hadoopConfiguration
    val dir = new org.apache.hadoop.fs.Path(claimsDir(path))
    val fs = dir.getFileSystem(conf)
    fs.mkdirs(dir)
    var v = currentVersion(s, path) + 1L
    while (!createExclusive(fs,
      new org.apache.hadoop.fs.Path(dir, s"v$v"))) v += 1L
    v
  }

  /** Best-effort maintenance mutex for read-modify-write operations
    * ([[compact]] / [[deleteKeys]] / [[deleteKeysDv]]): two concurrent
    * REWRITES of the same files would each re-emit the rows they read
    * (duplicates), so maintenance is single-flight — the scheduling
    * discipline real deployments run OPTIMIZE under, enforced here
    * with a create-exclusive lock held for the operation. Concurrent
    * blind COMMITS need no lock: a rewrite removes exactly the files
    * it read, so a commit landing mid-rewrite keeps its own files
    * live and loses nothing.
    */
  private def withMaintenanceLock[T](s: SparkSession, path: String)
      (body: => T): T = {
    val conf = s.sparkContext.hadoopConfiguration
    val lock = new org.apache.hadoop.fs.Path(s"$path/_maintenance.lock")
    val fs = lock.getFileSystem(conf)
    fs.mkdirs(lock.getParent)
    if (!createExclusive(fs, lock))
      throw new java.util.ConcurrentModificationException(
        s"maintenance already in flight on $path")
    try body finally fs.delete(lock, false)
  }

  /** Append `df` as a new commit; returns the new version. The data
    * files are written first, then read BACK for honest per-file stats,
    * and only then does the log append publish them — crash before the
    * log append and the commit never happened.
    */
  def commit(df: DataFrame, path: String, keyCol: String): Long =
    commitIdempotent(df, path, keyCol, NoBatch)

  /** IDEMPOTENT commit keyed by a writer batch id — Delta's
    * txn(appId, version) mechanics for a Structured Streaming
    * foreachBatch sink: a checkpointed replay re-offers the SAME
    * batchId, the log already names it, and the commit is a no-op —
    * the table never holds a batch twice. The crash windows compose
    * with the write-order rule: data written but log append lost means
    * the batch was never committed (orphan bytes, invisible), so the
    * retry re-writes the same version dir (Overwrite) and publishes
    * once. `NoBatch` skips the check (plain commits are not
    * transactions).
    */
  def commitIdempotent(df: DataFrame, path: String, keyCol: String,
      batchId: Long): Long = {
    val s = df.sparkSession
    if (batchId != NoBatch) {
      val seen = scala.util.Try(log(s, path)).toOption
        .exists(l => !l.filter(col("batch_id") === batchId).isEmpty)
      if (seen) return currentVersion(s, path)
    }
    val v = claimVersion(s, path)
    df.write.mode(SaveMode.Overwrite).parquet(dataDir(path, v))
    writeActions(addActions(s, path, v, keyCol, batchId), path, v)
    v
  }

  /** Deleted (file, key) pairs visible at `asOf`, resolved THROUGH the
    * log (the sidecar directories are never listed — the log names the
    * versions that carry deletion vectors, like everything else here).
    * None when the table has no DVs at `asOf`, so DV-free reads pay
    * nothing.
    */
  private def dvPairs(s: SparkSession, path: String,
      asOf: Long): Option[DataFrame] = {
    val vs = scala.util.Try(log(s, path)).toOption
      .map(_.filter(col("action") === "dv" && col("version") <= asOf)
        .select("version").distinct()
        .collect().map(_.getLong(0)).toSeq)
      .getOrElse(Nil)
    if (vs.isEmpty) None
    else Some(s.read.parquet(vs.map(v => dvDir(path, v)): _*))
  }

  /** Anti-join `df` (which must come straight off a parquet scan, so
    * `input_file_name` is still row-accurate) against the deletion
    * vectors visible at `asOf`. Per-FILE pairs, not a global key
    * filter: a later commit re-inserting a deleted key is a new row in
    * a new file and stays visible — Delta's DV semantics.
    */
  private def applyDv(s: SparkSession, path: String, df: DataFrame,
      asOf: Long): DataFrame =
    dvPairs(s, path, asOf) match {
      case None => df
      case Some(dv) =>
        val keyCol = dv.select("key_col").head.getString(0)
        df.withColumn("_graft_file", input_file_name())
          .join(broadcast(dv.select(col("file").as("_dv_file"),
            col("key").as("_dv_key"))),
            col("_graft_file") === col("_dv_file") &&
              col(keyCol).cast("long") === col("_dv_key"), "left_anti")
          .drop("_graft_file")
    }

  /** Row-level DELETE by DELETION VECTOR — the modern lakehouse
    * alternative to [[deleteKeys]]' copy-on-write rewrite (Delta's
    * deletion vectors / Iceberg v2 position deletes): no data file is
    * touched; the commit writes a tiny (file, key) sidecar naming the
    * dead rows and a `dv` log action per affected file, and every
    * reader anti-joins the sidecar. Wins when deletes are small and
    * frequent (GDPR erasure at 100 TB: a handful of sidecar KiB and
    * zero data-file churn — file identity, caches and incremental
    * readers all survive); the rewrite path still wins for bulk
    * deletes, which is why both ship, exactly as in Delta. The dead
    * rows are physically reclaimed when [[compact]] next rewrites (it
    * reads through [[snapshot]], so DVs materialize on any rewrite).
    * Candidate files prune through the manifest bounds first; pairs
    * already dead in a prior DV are excluded, so a repeated delete of
    * the same keys commits nothing. Time travel composes: a snapshot
    * BEFORE the DV's version still shows the rows. Returns the new
    * version (or the current one for a no-op). (round 5)
    */
  def deleteKeysDv(s: SparkSession, path: String, keyCol: String,
      keys: Seq[Long]): Long = withMaintenanceLock(s, path) {
    val v0 = currentVersion(s, path)
    if (v0 == 0L || keys.isEmpty) return v0
    val actions = log(s, path).filter(col("version") <= v0)
    val files = collectFiles(s, liveAdds(actions)
      .filter(keys.map(k => col("min_key") <= k && col("max_key") >= k)
        .reduce(_ || _)))
    if (files.isEmpty) return v0
    val raw = readData(s, files)
      .select(input_file_name().as("file"),
        col(keyCol).cast("long").as("key"))
      .filter(col("key").isin(keys: _*))
      .distinct()
    val fresh = dvPairs(s, path, v0).fold(raw)(dv =>
      raw.join(broadcast(dv.select("file", "key")), Seq("file", "key"),
        "left_anti"))
    if (fresh.isEmpty) return v0
    val v = claimVersion(s, path)
    fresh.withColumn("key_col", lit(keyCol))
      .write.mode(SaveMode.Overwrite).parquet(dvDir(path, v))
    // honest per-file stats over the DELETED keys (n_rows = rows dead)
    val acts = s.read.parquet(dvDir(path, v))
      .groupBy(col("file"))
      .agg(count(lit(1)).as("n_rows"), min(col("key")).as("min_key"),
        max(col("key")).as("max_key"),
        expr(s"graft_bloom_agg(CAST(key AS STRING), $BloomLog2Bits)")
          .as("bloom"))
      .select(lit(v).as("version"), lit("dv").as("action"), col("file"),
        col("n_rows"), col("min_key"), col("max_key"), col("bloom"),
        lit(null).cast("binary").as("key_hll"),
        nullStats.as("stats"), lit(NoBatch).as("batch_id"))
    writeActions(acts, path, v)
    v
  }

  /** Compact the LIVE file set into one clustered file as a new
    * version — OPTIMIZE's file-level mechanics: read the current
    * snapshot through the log, rewrite it sorted by the clustering key
    * (bounds tighten back to disjoint ranges, restoring the skipping
    * power interleaved appends erode), and publish ONE log append
    * holding the new file's `add` plus a `remove` for every file it
    * replaces. The removes do not delete bytes — old snapshots still
    * time-travel — they only drop the files from version >= this one,
    * exactly Delta's OPTIMIZE add/remove transaction. Crash before the
    * log append: the rewritten data is an invisible orphan, the table
    * is untouched (the same write-order rule as [[commit]]).
    */
  def compact(s: SparkSession, path: String,
      keyCol: String): Long = withMaintenanceLock(s, path) {
    val v0 = currentVersion(s, path)
    if (v0 == 0L) return 0L // no log yet — nothing to rewrite
    val replaced = fileList(s, path, v0)
    if (replaced.isEmpty) return v0 // nothing live to rewrite
    val v = claimVersion(s, path)
    // read THROUGH the snapshot so deletion vectors materialize into
    // the rewrite (dv'd rows must not resurrect in the compacted file)
    applyDv(s, path, readData(s, replaced), v0)
      .sortWithinPartitions(col(keyCol))
      .coalesce(1)
      .write.mode(SaveMode.Overwrite).parquet(dataDir(path, v))
    val removes = liveAdds(log(s, path).filter(col("version") <= v0))
      .filter(col("file").isin(replaced: _*))
      .select(lit(v).as("version"), lit("remove").as("action"), col("file"),
        col("n_rows"), col("min_key"), col("max_key"), col("bloom"),
        col("key_hll"), col("stats"), lit(NoBatch).as("batch_id"))
    writeActions(addActions(s, path, v, keyCol).unionByName(removes),
      path, v)
    v
  }

  /** SELECTIVE bin-packed OPTIMIZE — [[compact]] for tables where a
    * full rewrite is not a thing (at 100 TB "compact the table" means
    * "coalesce the small-file debris a streaming sink left behind,
    * touch nothing else"): live files bin-pack greedily in file order
    * by the [[graft.operators.Lakehouse.compactionPlan]] rule
    * (bin = (cum − n) div targetRows), and ONLY bins holding ≥ 2 files
    * rewrite — each into one file — so an already-compacted file keeps
    * its bytes AND its identity (caches, incremental readers, and CDF
    * consumers see no change for it; Delta's OPTIMIZE skips
    * full-sized files the same way). Rewrites read THROUGH the
    * snapshot so deletion vectors materialize (dv'd rows physically
    * reclaim, as [[deleteKeysDv]] documents). One commit publishes all
    * bins' adds plus removes for the replaced files; a crash before
    * the log append leaves only invisible orphan data (the write-order
    * rule). Idempotent at a fixpoint: when no bin qualifies the call
    * returns the current version and commits NOTHING — so running it
    * on a schedule is safe. The driver-side packing list is
    * file-cardinality metadata under the [[MaxPlannedFilesConf]] cap
    * (the collectFiles discipline). Returns the new version, or the
    * current one for a no-op.
    */
  def optimizeCompact(s: SparkSession, path: String, keyCol: String,
      targetRows: Long): Long = withMaintenanceLock(s, path) {
    require(targetRows > 0L, s"targetRows must be positive: $targetRows")
    val v0 = currentVersion(s, path)
    if (v0 == 0L) return 0L
    val cap = s.conf.get(MaxPlannedFilesConf,
      MaxPlannedFilesDefault.toString).toLong
    val capped = math.min(cap + 1L, Int.MaxValue.toLong).toInt
    val live = liveAdds(log(s, path).filter(col("version") <= v0))
      .select(col("file"), col("n_rows")).orderBy(col("file"))
      .limit(capped).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    require(live.length <= cap,
      s"manifest planning exceeds $MaxPlannedFilesConf=$cap files; " +
        "raise the conf or compact in partitions")
    var cum = 0L
    val binned = live.map { case (f, n) =>
      val b = cum / targetRows; cum += n; (b, f)
    }
    val qual = binned.groupBy(_._1).filter(_._2.length >= 2)
      .toSeq.sortBy(_._1).map { case (b, fs) => (b, fs.map(_._2).toSeq) }
    if (qual.isEmpty) return v0
    val v = claimVersion(s, path)
    // one deterministic output file per qualifying bin; non-qualifying
    // files are never read, never rewritten, never removed
    qual.foreach { case (_, fs) =>
      applyDv(s, path, readData(s, fs), v0)
        .sortWithinPartitions(col(keyCol))
        .coalesce(1)
        .write.mode(SaveMode.Append).parquet(dataDir(path, v))
    }
    val replaced = qual.flatMap(_._2)
    val removes = liveAdds(log(s, path).filter(col("version") <= v0))
      .filter(col("file").isin(replaced: _*))
      .select(lit(v).as("version"), lit("remove").as("action"), col("file"),
        col("n_rows"), col("min_key"), col("max_key"), col("bloom"),
        col("key_hll"), col("stats"), lit(NoBatch).as("batch_id"))
    writeActions(addActions(s, path, v, keyCol).unionByName(removes),
      path, v)
    v
  }

  /** Coordinate resolution of the z-code: 16+16 interleaved bits. */
  private val ZorderBits = 16

  /** OPTIMIZE ZORDER BY (colA, colB): rewrite the live snapshot
    * clustered by the Morton interleave of two stats-eligible columns
    * ([[graft.functions.Zorder]]), into `nFiles` range-partitioned
    * files. Each output file then occupies a LOCALITY BOX in
    * (colA, colB) space, so the per-column min/max stats every add
    * action carries turn [[scanColRanges]] box probes into genuine
    * file skipping on BOTH dimensions at once — on a scattered layout
    * (every file spanning both full ranges) those same stats prune
    * nothing. This is [[compact]]'s transaction shape (remove all live
    * files, add the rewrite; the CDF nets it to zero change rows) with
    * a clustering layout instead of key order, i.e. Delta's
    * `OPTIMIZE ... ZORDER BY`.
    *
    * Coordinates are scaled into [0, 2^16) from their global bounds —
    * one aggregates-only driver read — in DECIMAL(38,0) so a
    * full-BIGINT-range column cannot overflow the scale arithmetic.
    */
  def optimizeZorder(s: SparkSession, path: String, keyCol: String,
      colA: String, colB: String, nFiles: Int): Long =
    withMaintenanceLock(s, path) {
      val v0 = currentVersion(s, path)
      if (v0 == 0L) return 0L
      val replaced = fileList(s, path, v0)
      if (replaced.isEmpty) return v0
      val data = applyDv(s, path, readData(s, replaced), v0)
      def encOf(c: String) = {
        val f = data.schema.fields.find(_.name == c).getOrElse(
          throw new IllegalArgumentException(
            s"z-order column '$c' not in the table schema"))
        statsEnc(f.dataType).getOrElse(throw new IllegalArgumentException(
          s"z-order column '$c' (${f.dataType}) has no stats encoding"))
      }
      val (encA, encB) = (encOf(colA), encOf(colB))
      val b = data.agg(min(encA(col(colA))).as("loA"),
          max(encA(col(colA))).as("hiA"),
          min(encB(col(colB))).as("loB"),
          max(encB(col(colB))).as("hiB")).head()
      def bound(i: Int): Long = if (b.isNullAt(i)) 0L else b.getLong(i)
      def scaled(enc: org.apache.spark.sql.Column => org.apache.spark.sql.Column,
          c: String, lo: Long, hi: Long) = {
        // Span in BigInt: hi − lo on a full-BIGINT-range column (e.g.
        // hash-valued longs spanning ±2^62) wraps negative in Long
        // arithmetic, which would collapse the span to 1 and overflow
        // the scaled cast. BigInt keeps the whole pipeline exact; the
        // span is then fed to the decimal division as a literal.
        val span = (BigInt(hi) - BigInt(lo) + 1).max(BigInt(1))
        // least(): decimal division rounds HALF_UP at scale 6 before the
        // long cast truncates, so for spans ≥ ~1.3e11 the column max's
        // quotient 2^16·(1 − 1/span) rounds UP to exactly 2^16 — one
        // past the bit budget, which interleave's 16-bit masking would
        // wrap to z-contribution 0 (max-valued rows clustering with the
        // column minimum). Clamp to the top coordinate instead.
        least(((enc(col(c)).cast("decimal(38,0)") - lo)
          * (1L << ZorderBits)
          / lit(span.toString).cast("decimal(38,0)")).cast("long"),
          lit((1L << ZorderBits) - 1L))
      }
      val v = claimVersion(s, path)
      data
        .withColumn("_z", graft.functions.Zorder.interleave(
          scaled(encA, colA, bound(0), bound(1)),
          scaled(encB, colB, bound(2), bound(3)),
          ZorderBits))
        .repartitionByRange(nFiles, col("_z"))
        .sortWithinPartitions(col("_z"))
        .drop("_z")
        .write.mode(SaveMode.Overwrite).parquet(dataDir(path, v))
      val removes = liveAdds(log(s, path).filter(col("version") <= v0))
        .filter(col("file").isin(replaced: _*))
        .select(lit(v).as("version"), lit("remove").as("action"),
          col("file"), col("n_rows"), col("min_key"), col("max_key"),
          col("bloom"), col("key_hll"), col("stats"),
          lit(NoBatch).as("batch_id"))
      writeActions(addActions(s, path, v, keyCol).unionByName(removes),
        path, v)
      v
    }

  /** Manifest-pruned key DELETE — the right-to-be-forgotten path: drop
    * `keys` rows by rewriting ONLY the files whose [min_key, max_key]
    * can contain one (everything else keeps its bytes AND its file
    * identity — at 100 TB a delete of a handful of keys touches a
    * handful of files, never the table). Publishes one commit holding
    * the rewritten files' adds plus removes for the affected ones;
    * pre-delete snapshots still time-travel until a vacuum claims
    * them. Returns the new version, or the current one if no file can
    * hold any key (a no-op delete commits nothing).
    */
  def deleteKeys(s: SparkSession, path: String, keyCol: String,
      keys: Seq[Long]): Long = withMaintenanceLock(s, path) {
    val v0 = currentVersion(s, path)
    if (v0 == 0L || keys.isEmpty) return v0
    val affected = liveAdds(log(s, path).filter(col("version") <= v0))
      .filter(keys.map(k => col("min_key") <= k && col("max_key") >= k)
        .reduce(_ || _))
    val files = collectFiles(s, affected)
    if (files.isEmpty) return v0
    val v = claimVersion(s, path)
    // apply prior deletion vectors first: a rewrite must not resurrect
    // rows an earlier DV already deleted from these files
    applyDv(s, path, readData(s, files), v0)
      .filter(!col(keyCol).isin(keys: _*))
      .write.mode(SaveMode.Overwrite).parquet(dataDir(path, v))
    val removes = affected.select(lit(v).as("version"),
      lit("remove").as("action"), col("file"), col("n_rows"),
      col("min_key"), col("max_key"), col("bloom"),
      col("key_hll"), col("stats"), lit(NoBatch).as("batch_id"))
    writeActions(addActions(s, path, v, keyCol).unionByName(removes),
      path, v)
    v
  }

  /** MERGE INTO (upsert) on the clustering key — Delta's
    * `whenMatchedUpdate / whenNotMatchedInsert` as one copy-on-write
    * commit: files that can hold a source key are rewritten with the
    * matched keys' rows REPLACED by the source's (last-writer-wins per
    * key, [[graft.operators.Lakehouse.cdcMergeApply]]'s collapse
    * discipline applied at the file layer), unmatched source rows
    * append, and one log append publishes adds + removes atomically.
    * Untouched files keep their identity like [[deleteKeys]].
    *
    * This is the write path that makes a single version carry row
    * UPDATES, which [[readChanges]] classifies as
    * update_preimage/update_postimage — and because the CDF nets the
    * two sides as multisets, a value-identical upsert contributes
    * nothing, exactly the `op IS NOT NULL` filter of
    * [[graft.operators.Lakehouse.snapshotDiffCdf]].
    *
    * Scale contract: the source's DISTINCT key list is collected for
    * manifest pruning (batch-cardinality, the [[deleteKeys]]
    * precedent) — merge batches are CDC-delta-sized by design, never
    * corpus-sized; a corpus-sized restatement is a rewrite
    * ([[compact]] / full re-commit), not a merge.
    *
    * SCHEMA EVOLUTION rides through: a source carrying a NEW column
    * widens the rewrite (survivors project it as null via the
    * by-name union), a source MISSING a column lands nulls for it —
    * Delta's automatic mergeSchema on MERGE, with [[readData]]'s
    * footer merging serving the read side. The scraper-drift failure
    * mode (reference: transform_job.py defends at read time) is thus
    * absorbed at the table layer: a column add never forces a rewrite
    * of existing files, and pre-evolution snapshots time-travel with
    * their original schema.
    */
  def merge(df: DataFrame, path: String, keyCol: String): Long = {
    val s = df.sparkSession
    val v0 = currentVersion(s, path)
    if (v0 == 0L) return commit(df, path, keyCol)
    withMaintenanceLock(s, path) {
      // batch-cardinality by contract (see scale note above), bounded
      // by the same planning cap that guards file collects
      val keyCap = s.conf.get(MaxPlannedFilesConf,
        MaxPlannedFilesDefault.toString).toLong
      val keys = df.select(col(keyCol).cast("long")).distinct()
        .limit(math.min(keyCap + 1L, Int.MaxValue.toLong).toInt)
        .collect().map(_.getLong(0)).toSeq
      require(keys.size <= keyCap,
        s"merge source exceeds $MaxPlannedFilesConf=$keyCap distinct " +
          "keys; a corpus-sized restatement is a rewrite, not a merge")
      if (keys.isEmpty) return v0
      val actions = log(s, path).filter(col("version") <= v0)
      val affected = liveAdds(actions)
        .filter(keys.map(k => col("min_key") <= k && col("max_key") >= k)
          .reduce(_ || _))
      val files = collectFiles(s, affected)
      val v = claimVersion(s, path)
      val survivors =
        if (files.isEmpty) df.limit(0)
        else applyDv(s, path, readData(s, files), v0)
          .filter(!col(keyCol).isin(keys: _*))
      survivors.unionByName(df, allowMissingColumns = true)
        .write.mode(SaveMode.Overwrite).parquet(dataDir(path, v))
      val removes = affected.select(lit(v).as("version"),
        lit("remove").as("action"), col("file"), col("n_rows"),
        col("min_key"), col("max_key"), col("bloom"),
        col("key_hll"), col("stats"), lit(NoBatch).as("batch_id"))
      writeActions(addActions(s, path, v, keyCol).unionByName(removes),
        path, v)
      v
    }
  }

  /** Files a vacuum at `horizon` may physically delete: those with a
    * `remove` action at version <= horizon. They are referenced only by
    * snapshots OLDER than their removal, so every `asOf >= horizon`
    * read survives; time travel BEFORE the horizon is forfeit — the
    * retention trade every real format documents (VACUUM vs
    * RETAIN). Planning is file-cardinality log work, driver-side like
    * [[fileList]].
    */
  def vacuumList(s: SparkSession, path: String, horizon: Long): Seq[String] = {
    val l = log(s, path)
    val la = l.filter(col("action") === "add")
      .groupBy("file").agg(max(col("version")).as("_a"))
    val lr = l.filter(col("action") === "remove")
      .groupBy("file").agg(max(col("version")).as("_r"))
    // deletable iff the file's LATEST action is a remove at <= horizon:
    // a [[restore]]'s re-add (add newer than the old remove) revives
    // the file, so the old remove alone must never doom it.
    // OWNERSHIP: only files under this table's own data root ever
    // vacuum — a [[shallowClone]]d table REFERENCES the source's bytes
    // without owning them, so a clone-side rewrite (compact/delete)
    // that removes an external file from the clone's log must never
    // delete the source's data (Delta's shallow-clone contract).
    // The test is an ANCHORED prefix on the fs-QUALIFIED table root,
    // never a substring: a clone at /data/tbl cloned FROM a source at
    // /backup/data/tbl would substring-match "<clone>/data/" inside
    // the source's own file paths ("/backup/data/tbl/data/v1/…") and
    // vacuum the source's bytes; and a caller spelling the path
    // differently from the absolute file: URI the log stores (relative
    // vs qualified) would silently disable vacuum entirely. Qualifying
    // BOTH sides through the same FileSystem normalizes scheme,
    // authority and slash count before the prefix test.
    val conf = s.sparkContext.hadoopConfiguration
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(conf)
    val qRoot = fs.makeQualified(root)
    val dataPrefix = qRoot.toString.stripSuffix("/") + "/data/"
    // two-stage ownership test: a scheme-free SUBSTRING on the
    // qualified root's path part runs DataFrame-side as a SUPERSET
    // prefilter (every owned file contains it regardless of scheme
    // spelling, so it can over-include foreign files but never drop
    // owned ones) — keeping the collectFiles planning cap a function
    // of candidate debris, not of how many foreign files a clone's
    // rewrites have removed; the exact ANCHORED prefix then decides
    // driver-side on fs-qualified strings.
    val pathPart = qRoot.toUri.getPath.stripSuffix("/") + "/data/"
    collectFiles(s, lr.join(la, Seq("file"), "left")
      .filter(col("_r") <= horizon &&
        (col("_a").isNull || col("_a") < col("_r")))
      .filter(col("file").contains(pathPart))
      .select("file"))
      .filter { f =>
        // a cross-FS file (different scheme/authority, possible after a
        // cross-FS shallow clone) can slip past the scheme-free
        // prefilter; makeQualified with the root's FS then THROWS
        // ("Wrong FS") instead of classifying — treat it as foreign
        try fs.makeQualified(new org.apache.hadoop.fs.Path(f))
          .toString.startsWith(dataPrefix)
        catch { case _: IllegalArgumentException => false }
      }
  }

  /** Physically delete the [[vacuumList]] files; returns how many went.
    * Deletion is idempotent (a re-run after a partial crash re-deletes
    * nothing and errors nothing) because the log, not the directory
    * listing, defines the table.
    */
  def vacuum(s: SparkSession, path: String, horizon: Long): Int = {
    val conf = s.sparkContext.hadoopConfiguration
    vacuumList(s, path, horizon).count { f =>
      val p = new org.apache.hadoop.fs.Path(f)
      p.getFileSystem(conf).delete(p, false)
    }
  }

  /** SHALLOW CLONE — Delta's `CREATE TABLE ... SHALLOW CLONE src`: a
    * NEW table whose version 1 REFERENCES the source snapshot's files
    * by identity — zero data bytes move, the clone materializes in
    * metadata time regardless of table size (the dev/test-against-prod
    * and experiment-branch workflow). The clone then evolves fully
    * independently: appends land in its own data root, rewrites
    * (compact / delete / optimize) copy-on-write INTO the clone — the
    * first rewrite of a referenced file is where the clone starts
    * owning bytes. Visible deletion vectors carry over by copying the
    * (tiny) pair sidecars into the clone's own dv root, so the cloned
    * snapshot applies them without reaching back into the source's
    * directories. Ownership is enforced at the only place bytes die:
    * [[vacuumList]] never names a file outside the table's own data
    * root, so vacuuming the clone cannot delete source data (and a
    * clone-side rewrite's removes of external files are metadata
    * only). The standing Delta caveat transfers verbatim: vacuuming
    * the SOURCE can delete bytes a clone still references — clones are
    * branches, not backups. Returns the clone's version (always 1).
    */
  def shallowClone(s: SparkSession, srcPath: String, dstPath: String,
      asOf: Option[Long] = None): Long = {
    val vSrc = asOf.getOrElse(currentVersion(s, srcPath))
    require(vSrc > 0L, s"shallow clone source has no commits: $srcPath")
    require(currentVersion(s, dstPath) == 0L,
      s"shallow clone target is already a table: $dstPath")
    val v = claimVersion(s, dstPath)
    // the claim is the race arbiter: a concurrent clone (or commit)
    // into the same fresh path claims v1 first and this one must not
    // publish a second bootstrap on top of it. Losing the claim has
    // two distinct causes the error must distinguish: a LIVE racer
    // (whose v1 log will appear shortly — this attempt simply lost)
    // versus a STALE ORPHAN claim from a clone that crashed between
    // claimVersion and writeActions (the v1 log will never appear, and
    // without recovery every future clone of the path fails forever).
    // An orphan is recoverable: no log was ever published, so deleting
    // the claim marker restores the pristine destination.
    if (v != 1L) {
      val conf = s.sparkContext.hadoopConfiguration
      val v1Log = new org.apache.hadoop.fs.Path(logVersionDir(dstPath, 1L))
      val published = v1Log.getFileSystem(conf).exists(v1Log)
      throw new IllegalStateException(
        if (published)
          s"shallow clone lost a bootstrap race on $dstPath (claimed " +
            s"v$v; v1 is already committed by another writer)"
        else
          s"$dstPath carries a bootstrap claim with no committed v1 — " +
            "either a clone is in flight right now (retry shortly) or " +
            "one crashed between claim and publish; if no clone is " +
            s"running, delete ${claimsDir(dstPath)} and re-clone")
    }
    val adds = liveAdds(log(s, srcPath).filter(col("version") <= vSrc))
      .select(lit(v).as("version"), lit("add").as("action"), col("file"),
        col("n_rows"), col("min_key"), col("max_key"), col("bloom"),
        col("key_hll"), col("stats"), lit(NoBatch).as("batch_id"))
    val acts = dvPairs(s, srcPath, vSrc) match {
      case None => adds
      case Some(p) =>
        p.write.mode(SaveMode.Overwrite).parquet(dvDir(dstPath, v))
        val dvActs = s.read.parquet(dvDir(dstPath, v))
          .groupBy(col("file"))
          .agg(count(lit(1)).as("n_rows"), min(col("key")).as("min_key"),
            max(col("key")).as("max_key"),
            expr(s"graft_bloom_agg(CAST(key AS STRING), $BloomLog2Bits)")
              .as("bloom"))
          .select(lit(v).as("version"), lit("dv").as("action"),
            col("file"), col("n_rows"), col("min_key"), col("max_key"),
            col("bloom"), lit(null).cast("binary").as("key_hll"),
            nullStats.as("stats"), lit(NoBatch).as("batch_id"))
        adds.unionByName(dvActs)
    }
    writeActions(acts, dstPath, v)
    v
  }

  /** GENERATE symlink_format_manifest — the external-engine interop
    * seam (Delta's `GENERATE symlink_format_manifest FOR TABLE`):
    * engines that cannot replay the log (Presto/Trino/Athena/Hive
    * external tables) read a plain TEXT manifest naming the live data
    * files instead. Writes `_symlink_format_manifest/manifest` with
    * one absolute file path per line (sorted — deterministic bytes for
    * a given snapshot) for the snapshot at `asOf` (default: current),
    * via a temp-file + rename so a concurrent external reader never
    * sees a torn manifest. The manifest is a POINT-IN-TIME EXPORT, not
    * a live view: it goes stale the moment the table commits (exactly
    * Delta's semantics — deployments regenerate after writes or hook
    * it into their commit path), and it does NOT carry deletion
    * vectors (external engines read whole files; a DV'd table should
    * [[compact]] first — the require below enforces it loudly rather
    * than export rows the log says are dead). Returns the number of
    * files listed.
    */
  def writeSymlinkManifest(s: SparkSession, path: String,
      asOf: Option[Long] = None): Int = {
    val v = asOf.getOrElse(currentVersion(s, path))
    require(v > 0L, s"no commits to export: $path")
    val files = fileList(s, path, v).sorted
    // refuse only when a LIVE file carries deletion-vector pairs —
    // a compacted table keeps its historical dv actions, but they
    // reference removed files and the export is then exact
    val dvBitesLive = dvPairs(s, path, v).exists { p =>
      val live = s.createDataset(files)(
        org.apache.spark.sql.Encoders.STRING).toDF("file")
      !p.select("file").distinct().join(live, Seq("file"), "left_semi")
        .isEmpty
    }
    require(!dvBitesLive,
      s"live deletion vectors at v$v — external engines read whole " +
        "files and would resurrect deleted rows; run compact() first")
    val conf = s.sparkContext.hadoopConfiguration
    val dir = new org.apache.hadoop.fs.Path(
      s"$path/_symlink_format_manifest")
    val fs = dir.getFileSystem(conf)
    fs.mkdirs(dir)
    val tmp = new org.apache.hadoop.fs.Path(dir, s".manifest.v$v.tmp")
    val out = fs.create(tmp, true)
    try out.write((files.mkString("\n") + "\n")
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    val fin = new org.apache.hadoop.fs.Path(dir, "manifest")
    // overwrite-capable rename (FileContext honors Rename.OVERWRITE on
    // local FS and HDFS): the refresh is a single atomic replace, so a
    // concurrent external reader always sees either the old manifest or
    // the new one — never the delete+rename gap a two-call swap opens.
    org.apache.hadoop.fs.FileContext.getFileContext(dir.toUri, conf)
      .rename(tmp, fin, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
    files.size
  }

  /** RESTORE TABLE TO VERSION — Delta's RESTORE as one commit, (almost)
    * zero data I/O: files live at `toV` but not now RE-PUBLISH by
    * identity (their original add rows copied into the new version —
    * no bytes move), files live now but not at `toV` get removes, and
    * files in both stay untouched. The one honest exception: a file
    * live at `toV` that a LATER deletion vector touched cannot
    * re-publish by identity (the DV would keep applying at the new
    * version and under-report the old rows), so exactly those files
    * REWRITE through the `toV` view into fresh bytes — bounded by the
    * post-toV DV footprint, never the table. Liveness survives the
    * re-add because [[liveAdds]] resolves per-file action order, and
    * [[vacuumList]] never dooms a revived file by its old remove.
    * The restore version's CDF ([[readChanges]]) is exactly the undo
    * delta between the two snapshots. Returns the new version (no-op
    * when restoring to the current one).
    */
  def restore(s: SparkSession, path: String, keyCol: String,
      toV: Long): Long = withMaintenanceLock(s, path) {
    val v0 = currentVersion(s, path)
    require(toV >= 1L && toV <= v0,
      s"restore target $toV outside the committed range [1, $v0]")
    if (toV == v0) return v0
    val oldLive = fileList(s, path, toV)
    val curLive = fileList(s, path, v0).toSet
    // files whose rows-at-toV a post-toV DV has since bitten: identity
    // re-publish would under-report them, so they materialize instead
    val dvVs = log(s, path)
      .filter(col("action") === "dv" &&
        col("version") > toV && col("version") <= v0)
      .select("version").distinct()
      .collect().map(_.getLong(0)).sorted
    val dirty: Set[String] =
      if (dvVs.isEmpty) Set.empty
      else collectFiles(s,
        s.read.parquet(dvVs.map(v => dvDir(path, v)): _*)
          .select("file").distinct()).toSet.intersect(oldLive.toSet)
    val keepIdentity = oldLive.filterNot(f => dirty(f) || curLive(f))
    val v = claimVersion(s, path)
    val rewrittenAdds: Option[DataFrame] =
      if (dirty.isEmpty) None
      else {
        applyDv(s, path, readData(s, dirty.toSeq), toV)
          .write.mode(SaveMode.Overwrite).parquet(dataDir(path, v))
        Some(addActions(s, path, v, keyCol))
      }
    val actions0 = log(s, path).filter(col("version") <= v0)
    val republished = liveAdds(log(s, path).filter(col("version") <= toV))
      .filter(col("file").isin(keepIdentity: _*))
      .select(lit(v).as("version"), lit("add").as("action"), col("file"),
        col("n_rows"), col("min_key"), col("max_key"), col("bloom"),
        col("key_hll"), col("stats"), lit(NoBatch).as("batch_id"))
    // retire: files live now but not at toV, AND still-live dirty files
    // (their materialized rewrite replaces them — leaving the original
    // live would double-count its rows)
    val doomed = (curLive -- oldLive.toSet) ++ dirty.intersect(curLive)
    val removes = liveAdds(actions0)
      .filter(col("file").isin(doomed.toSeq: _*))
      .select(lit(v).as("version"), lit("remove").as("action"), col("file"),
        col("n_rows"), col("min_key"), col("max_key"), col("bloom"),
        col("key_hll"), col("stats"), lit(NoBatch).as("batch_id"))
    val adds = rewrittenAdds.fold(republished)(republished.unionByName(_))
    writeActions(adds.unionByName(removes), path, v)
    v
  }

  /** DESCRIBE HISTORY straight from the log — per committed version:
    * action counts, manifest-level row deltas, the streaming batch id
    * if the commit was transactional, and an operation classification
    * inferred from the action mix (append / rewrite / delete /
    * delete_dv — a rewrite is any adds+removes commit: compaction,
    * z-order, key delete, merge, restore). Pure log aggregation,
    * version-cardinality output, zero data I/O.
    */
  def describeHistory(s: SparkSession, path: String): DataFrame =
    log(s, path).groupBy("version")
      .agg(
        sum(when(col("action") === "add", 1L).otherwise(0L)).as("n_adds"),
        sum(when(col("action") === "remove", 1L).otherwise(0L))
          .as("n_removes"),
        sum(when(col("action") === "dv", 1L).otherwise(0L)).as("n_dvs"),
        coalesce(sum(when(col("action") === "add", col("n_rows"))), lit(0L))
          .as("rows_added"),
        coalesce(sum(when(col("action") === "remove", col("n_rows"))),
          lit(0L)).as("rows_removed"),
        max(when(col("batch_id") =!= NoBatch, col("batch_id")))
          .as("batch_id"))
      .withColumn("operation",
        when(col("n_dvs") > 0, "delete_dv")
          .when(col("n_adds") > 0 && col("n_removes") > 0, "rewrite")
          .when(col("n_adds") > 0, "append")
          .otherwise("delete"))
      .orderBy("version")

  /** The file list a reader at `asOf` opens, optionally pruned by a
    * key-range probe against the manifest bounds (skip iff
    * max_key < lo OR min_key > hi — the Iceberg/Delta test). Driver-side
    * by design: manifest planning is file-cardinality work in every
    * real format (millions of rows at 100 TB, never the data).
    */
  def fileList(s: SparkSession, path: String, asOf: Long,
      keyRange: Option[(Long, Long)] = None,
      colRanges: Map[String, (Long, Long)] = Map.empty): Seq[String] = {
    val actions = log(s, path).filter(col("version") <= asOf)
    // live at asOf: the file's latest action at or before asOf is an
    // add ([[liveAdds]] — re-adds from a restore resolve correctly)
    val live = liveAdds(actions)
    val keyKept = keyRange match {
      case Some((lo, hi)) =>
        live.filter(!(col("max_key") < lo || col("min_key") > hi))
      case None => live
    }
    // per-column stats pruning: a predicate only drops a file when the
    // file HAS stats for that column and they cannot intersect — a
    // missing stats entry (un-stats'd column, pre-stats action) keeps
    // the file, so pruning is never wrong, only weaker. Predicates on
    // several columns compound: each one independently shrinks the set
    // (Delta/Iceberg manifest evaluation, conjunctive normal form).
    val kept = colRanges.foldLeft(keyKept) { case (acc, (c, (lo, hi))) =>
      val st = col("stats").getItem(c)
      acc.filter(st.isNull ||
        !(st.getField("hi") < lo || st.getField("lo") > hi))
    }
    collectFiles(s, kept)
  }

  /** Read the table `VERSION AS OF asOf` (defaults to latest): opens
    * exactly the log-named files — no directory listing, no rows from
    * later commits, orphaned uncommitted files invisible.
    */
  def snapshot(s: SparkSession, path: String,
      asOf: Option[Long] = None): DataFrame = {
    val v = asOf.getOrElse(currentVersion(s, path))
    val files = fileList(s, path, v)
    if (files.isEmpty) s.emptyDataFrame
    else applyDv(s, path, readData(s, files), v)
  }

  /** Key-range read with MANIFEST pruning applied: files whose bounds
    * cannot intersect [lo, hi] never enter the scan (df.inputFiles
    * shrinks — spec-asserted), and the residual row filter handles the
    * partial-overlap files. Equals the unpruned filter by construction
    * (pruning only drops files that cannot hold matches).
    */
  def scanKeyRange(s: SparkSession, path: String, keyCol: String,
      lo: Long, hi: Long, asOf: Option[Long] = None): DataFrame = {
    val v = asOf.getOrElse(currentVersion(s, path))
    val files = fileList(s, path, v, Some((lo, hi)))
    if (files.isEmpty) s.emptyDataFrame
    else applyDv(s, path, readData(s, files), v)
      .filter(col(keyCol).cast("long").between(lo, hi))
  }

  /** Multi-column range read with PER-COLUMN stats pruning — the
    * general form of [[scanKeyRange]]: every predicate column that has
    * stats in the manifest independently shrinks the file list (a
    * two-predicate probe opens at most the INTERSECTION of what each
    * predicate alone admits — spec-asserted on a grid layout where
    * either predicate alone keeps a full row/column of files), and the
    * residual row filters restore exactness over partial-overlap
    * files. Predicate values are in the column's long encoding
    * ([[statsEnc]]: integrals as-is, DATE as epoch days, TIMESTAMP as
    * epoch micros); a predicate on a column the read schema lacks is
    * rejected loudly rather than silently unprunable.
    */
  def scanColRanges(s: SparkSession, path: String,
      preds: Map[String, (Long, Long)],
      asOf: Option[Long] = None): DataFrame = {
    val v = asOf.getOrElse(currentVersion(s, path))
    val files = fileList(s, path, v, None, preds)
    if (files.isEmpty) return s.emptyDataFrame
    val df = applyDv(s, path, readData(s, files), v)
    preds.foldLeft(df) { case (acc, (c, (lo, hi))) =>
      val f = acc.schema.fields.find(_.name == c).getOrElse(
        throw new IllegalArgumentException(
          s"predicate column '$c' not in the table schema"))
      val enc = statsEnc(f.dataType).getOrElse(
        throw new IllegalArgumentException(
          s"predicate column '$c' (${f.dataType}) has no stats encoding"))
      acc.filter(enc(col(c)).between(lo, hi))
    }
  }

  /** Table-level key statistics WITHOUT any data I/O — the
    * planner-stats question real engines answer straight from the
    * manifest (Iceberg's snapshot summary / the NDV a CBO wants for
    * join sizing): live file count, total rows, key bounds, and the
    * clustering key's NDV estimate from ONE register-max merge of the
    * per-file HLL sketches every add action carries. The
    * mergeable-summaries algebra ([[graft.plans.HllSketch]]) makes the
    * union of per-file sketches exactly the sketch of the union, so
    * the estimate is corpus-accurate however many files the key space
    * is sprayed across. Counts are MANIFEST-level (pre-deletion-
    * vector, like real formats' file stats): a DV hides rows from
    * readers but the files' stats are unchanged until a rewrite
    * materializes them — documented, spec-pinned.
    */
  def tableKeyStats(s: SparkSession, path: String,
      asOf: Option[Long] = None): DataFrame = {
    val v = asOf.getOrElse(currentVersion(s, path))
    val actions = log(s, path).filter(col("version") <= v)
    liveAdds(actions)
      .agg(count(lit(1)).as("n_files"),
        sum(col("n_rows")).as("n_rows"),
        min(col("min_key")).as("min_key"),
        max(col("max_key")).as("max_key"),
        expr("graft_hll_est(graft_hll_merge(key_hll))").as("key_ndv_est"))
  }

  /** CDF column: what happened to the row ("insert" | "delete" |
    * "update_preimage" | "update_postimage" — Delta's readChangeFeed
    * vocabulary). */
  val ChangeTypeCol = "_change_type"

  /** CDF column: the version whose commit produced the change. */
  val CommitVersionCol = "_commit_version"

  /** Row-level CHANGE DATA FEED over the log — the INCREMENTAL read
    * path that closes the loop [[graft.streaming.StreamingPipeline]]'s
    * manifest sink opened (Delta's `readChangeFeed` with
    * startingVersion/endingVersion): every row the window's commits
    * inserted or deleted, tagged [[ChangeTypeCol]] +
    * [[CommitVersionCol]], so a downstream consumer replays versions
    * instead of re-reading snapshots — the reference's own pipeline is
    * incremental load end-to-end (insert_to_postgres.py:60-84
    * get-or-create upserts), and this is that shape on the native
    * table.
    *
    * Per version the delta is computed STRUCTURALLY from the actions as
    * a signed multiset (the [[graft.operators.Lakehouse.ivmMergeDelta]]
    * Z-set algebra applied to the log):
    * {{{ delta(v) = rows(files added at v)
    *              − rows(files removed at v, as visible at v−1)
    *              − rows(dv pairs committed at v) }}}
    * `exceptAll` nets the two sides, so a COMPACTION — whose adds
    * replay exactly its removes — contributes nothing (Delta: OPTIMIZE
    * emits no CDF rows), a plain commit is pure inserts, a
    * [[deleteKeys]] rewrite nets to exactly its doomed rows as
    * deletes, and a [[deleteKeysDv]] emits its sidecar pairs as
    * deletes. A key appearing on BOTH sides of one version's delta is
    * an UPDATE: its rows re-tag as update_preimage/update_postimage
    * (the I/U/D classification of
    * [[graft.operators.Lakehouse.snapshotDiffCdf]], here derived from
    * real log versions rather than two materialized snapshots).
    *
    * Replay closure (spec-pinned): for any window,
    * `snapshot(fromV) ⊎ inserts∪postimages ∖ deletes∪preimages =
    * snapshot(toV)` as multisets. Schema evolution composes: versions
    * read with union-by-name, pre-evolution change rows carry nulls.
    *
    * Scale: planning is file-cardinality driver work like [[fileList]];
    * the per-version diff shuffles only that version's delta files,
    * never the table; `exceptAll` is a hash aggregation on the delta's
    * own cardinality. The window (fromV, toV] is the caller's batch
    * granularity, exactly Delta's starting/endingVersion contract.
    */
  def readChanges(s: SparkSession, path: String, keyCol: String,
      fromV: Long, toV: Long): DataFrame = {
    val versions = log(s, path)
      .filter(col("version") > fromV && col("version") <= toV)
      .select("version").distinct()
      .collect().map(_.getLong(0)).sorted
    val deltas = versions.flatMap(v => versionDelta(s, path, keyCol, v))
    if (deltas.isEmpty) s.emptyDataFrame
    else deltas.reduce(_.unionByName(_, allowMissingColumns = true))
  }

  /** One version's classified change rows. None when the version names
    * no files at all; a version whose sides net to zero (a pure
    * compaction) yields an empty frame, which unions harmlessly. */
  private def versionDelta(s: SparkSession, path: String, keyCol: String,
      v: Long): Option[DataFrame] = {
    val actsV = log(s, path).filter(col("version") === v)
    def filesOf(a: String): Seq[String] =
      collectFiles(s, actsV.filter(col("action") === a))
    val added = filesOf("add")
    val removed = filesOf("remove")
    val dvP =
      if (filesOf("dv").isEmpty) None
      else Some(s.read.parquet(dvDir(path, v)))
    val dvFiles = dvP.map(dv =>
      collectFiles(s, dv.select("file").distinct())).getOrElse(Nil)
    val all = (added ++ removed ++ dvFiles).distinct
    if (all.isEmpty) return None
    val rows = readData(s, all).withColumn("_file", input_file_name())
    val plus = rows.filter(col("_file").isin(added: _*))
    // removed files' rows as a reader at v-1 saw them: rows an earlier
    // DV already killed were not live, so their disappearance from the
    // rewrite is not a NEW delete
    val removedRows = rows.filter(col("_file").isin(removed: _*))
    val minusR = dvPairs(s, path, v - 1).fold(removedRows)(dv =>
      removedRows.join(broadcast(dv.select(col("file").as("_dv_file"),
        col("key").as("_dv_key"))),
        col("_file") === col("_dv_file") &&
          col(keyCol).cast("long") === col("_dv_key"), "left_anti"))
    // this version's DV sidecar names its dead rows (file, key) — fresh
    // w.r.t. v-1 by deleteKeysDv's construction, so no double count
    val minusD = dvP match {
      case None => None
      case Some(dv) => Some(rows.filter(col("_file").isin(dvFiles: _*))
        .join(broadcast(dv.select(col("file").as("_dv_file"),
          col("key").as("_dv_key"))),
          col("_file") === col("_dv_file") &&
            col(keyCol).cast("long") === col("_dv_key"), "left_semi"))
    }
    val minus = minusD.fold(minusR)(minusR.unionByName(_))
    // the Z-set netting: drop the file tag first — logically identical
    // rows in different files (a compaction's rewrite) must cancel
    val ins = plus.drop("_file").exceptAll(minus.drop("_file"))
    val del = minus.drop("_file").exceptAll(plus.drop("_file"))
    // a key on both sides of one version's delta is an update
    val uKeys = ins.select(col(keyCol).cast("long").as("_uk")).distinct()
      .join(del.select(col(keyCol).cast("long").as("_uk")).distinct(),
        Seq("_uk"), "left_semi")
    def split(df: DataFrame, ifUpdate: String, ifPlain: String) = {
      val cond = df(keyCol).cast("long") === col("_uk")
      df.join(broadcast(uKeys), cond, "left_semi")
        .withColumn(ChangeTypeCol, lit(ifUpdate))
        .unionByName(df.join(broadcast(uKeys), cond, "left_anti")
          .withColumn(ChangeTypeCol, lit(ifPlain)))
    }
    Some(split(ins, "update_postimage", "insert")
      .unionByName(split(del, "update_preimage", "delete"))
      .withColumn(CommitVersionCol, lit(v)))
  }

  /** POINT lookup with BLOOM pruning on top of the bounds: a file is
    * opened only if its range covers `key` AND its bloom admits it —
    * on hash-scattered layouts (every file's [min,max] spans the whole
    * key space, range pruning keeps everything) the bloom is what
    * makes a needle lookup open O(1) files instead of all of them.
    * False positives only admit extra files (the residual filter keeps
    * exactness); definitely-absent is exact, so no match is ever
    * missed.
    */
  def scanKeyPoint(s: SparkSession, path: String, keyCol: String,
      key: Long, asOf: Option[Long] = None): DataFrame = {
    val v = asOf.getOrElse(currentVersion(s, path))
    val actions = log(s, path).filter(col("version") <= v)
    val files = collectFiles(s, liveAdds(actions)
      .filter(col("min_key") <= key && col("max_key") >= key &&
        expr(s"graft_bloom_contains(bloom, CAST(${key}L AS STRING))")))
    if (files.isEmpty) s.emptyDataFrame
    else applyDv(s, path, readData(s, files), v)
      .filter(col(keyCol).cast("long") === key)
  }
}
