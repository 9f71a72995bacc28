package graft.sources

import java.nio.file.Files

import graft.SharedSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The native snapshot/manifest log: two commits, time travel by
  * version, and manifest-pruned scans whose input-file lists provably
  * shrink — the file-level mechanism under the Lakehouse tier's
  * row-level algebra.
  */
class ManifestLogSpec extends AnyFunSuite {
  import SharedSpark._

  private def freshTable(): String =
    Files.createTempDirectory("manifest_log").toString + "/t"

  test("two commits: snapshot reads the log, time travel resolves versions") {
    import spark.implicits._
    val path = freshTable()
    // commit 1: keys 0..99 across 4 files; commit 2: keys 100..149
    val v1 = ManifestLog.commit(
      (0L until 100L).map(k => (k, s"p$k")).toDF("key", "payload")
        .repartition(4), path, "key")
    assert(v1 === 1L)
    val v2 = ManifestLog.commit(
      (100L until 150L).map(k => (k, s"p$k")).toDF("key", "payload")
        .repartition(2), path, "key")
    assert(v2 === 2L)

    val latest = ManifestLog.snapshot(spark, path)
    assert(latest.count() === 150)
    val asOf1 = ManifestLog.snapshot(spark, path, Some(1L))
    assert(asOf1.count() === 100)
    assert(asOf1.agg(max(col("key"))).head.getLong(0) === 99L)

    // time travel is FILE pruning, not row filtering: the as-of scan's
    // input files are exactly commit 1's files, a strict subset
    assert(asOf1.inputFiles.length === 4)
    assert(latest.inputFiles.length === 6)
    assert(asOf1.inputFiles.toSet.subsetOf(latest.inputFiles.toSet))

    // the log is append-only and file-cardinality
    val log = ManifestLog.log(spark, path).collect()
    assert(log.map(_.getAs[Long]("version")).toSet === Set(1L, 2L))
    assert(log.length === 6)
    log.foreach(r => assert(r.getAs[Long]("n_rows") > 0))
  }

  test("tableExists: false before any commit, true after, and errors are not swallowed") {
    import spark.implicits._
    val path = freshTable()
    // never-created table: plain false, no exception — the probe the
    // funnel repair consumer keys its delete phase on (ADVICE r14: the
    // old Try-based probe conflated "not created" with read errors)
    assert(!ManifestLog.tableExists(spark, path))
    ManifestLog.commit(Seq((1L, "a")).toDF("key", "payload"), path, "key")
    assert(ManifestLog.tableExists(spark, path))
    // the probe is an FS existence check, not a log READ: a corrupt
    // action file must not flip it back to "absent"
    val logDir = new java.io.File(s"$path/_log")
    assert(logDir.isDirectory)
    Files.writeString(
      new java.io.File(logDir, "v1/zz_corrupt.parquet").toPath, "garbage")
    assert(ManifestLog.tableExists(spark, path))
  }

  test("manifest key-range pruning shrinks the scan and preserves the answer") {
    import spark.implicits._
    val path = freshTable()
    // range-partitioned write: each file holds a disjoint key range, so
    // the manifest bounds are selective (the layout half of the
    // data_skipping_stats argument: layout, not the reader, decides)
    ManifestLog.commit(
      (0L until 400L).map(k => (k, k * 10)).toDF("key", "val")
        .repartitionByRange(8, col("key")), path, "key")

    val pruned = ManifestLog.scanKeyRange(spark, path, "key", 100L, 149L)
    val full = ManifestLog.snapshot(spark, path)
      .filter(col("key").between(100L, 149L))
    // identical answer...
    assert(pruned.orderBy("key").collect().map(_.toSeq).toSeq ===
      full.orderBy("key").collect().map(_.toSeq).toSeq)
    assert(pruned.count() === 50)
    // ...from a provably smaller scan: 50 contiguous keys of 400 across
    // 8 range files live in at most 2 files
    assert(full.inputFiles.length === 8)
    assert(pruned.inputFiles.length <= 2,
      s"manifest pruning kept ${pruned.inputFiles.length} of 8 files")
  }

  test("compaction: one clustered file replaces the live set, history intact") {
    import spark.implicits._
    val path = freshTable()
    ManifestLog.commit(
      (0L until 100L).map(k => (k, s"p$k")).toDF("key", "payload")
        .repartition(4), path, "key")
    ManifestLog.commit(
      (100L until 150L).map(k => (k, s"p$k")).toDF("key", "payload")
        .repartition(2), path, "key")

    val v3 = ManifestLog.compact(spark, path, "key")
    assert(v3 === 3L)

    // same rows, one file — and the rewrite is clustered, so the single
    // file's manifest bounds span exactly the data
    val after = ManifestLog.snapshot(spark, path)
    assert(after.count() === 150)
    assert(after.inputFiles.length === 1)
    val addV3 = ManifestLog.log(spark, path)
      .filter(col("version") === 3L && col("action") === "add").collect()
    assert(addV3.length === 1)
    assert(addV3.head.getAs[Long]("min_key") === 0L)
    assert(addV3.head.getAs[Long]("max_key") === 149L)

    // time travel to both pre-compaction versions still works: removes
    // only affect versions >= the compaction
    assert(ManifestLog.snapshot(spark, path, Some(1L)).count() === 100)
    assert(ManifestLog.snapshot(spark, path, Some(2L)).count() === 150)
    assert(ManifestLog.snapshot(spark, path, Some(2L)).inputFiles.length === 6)

    // empty-table compact is a no-op that claims no version
    val empty = freshTable()
    assert(ManifestLog.compact(spark, empty, "key") === 0L)
  }

  test("vacuum deletes only pre-horizon removed files; later reads survive") {
    import spark.implicits._
    val path = freshTable()
    ManifestLog.commit(
      (0L until 100L).map(k => (k, s"p$k")).toDF("key", "payload")
        .repartition(4), path, "key")
    val vC = ManifestLog.compact(spark, path, "key")

    // nothing is removed AFTER the horizon-1 cut, so vacuum below the
    // compaction version deletes nothing
    assert(ManifestLog.vacuumList(spark, path, vC - 1L).isEmpty)
    // at the compaction horizon: exactly the 4 replaced files go
    val victims = ManifestLog.vacuumList(spark, path, vC)
    assert(victims.length === 4)
    assert(ManifestLog.vacuum(spark, path, vC) === 4)
    // idempotent: a retry re-deletes nothing and errors nothing
    assert(ManifestLog.vacuum(spark, path, vC) === 0)

    // the latest snapshot is untouched (its file was never removed)...
    val after = ManifestLog.snapshot(spark, path)
    assert(after.count() === 100)
    assert(after.inputFiles.length === 1)
    // ...and pre-horizon time travel is forfeit by declared trade:
    // the v1 file list still names the deleted files
    val v1Files = ManifestLog.fileList(spark, path, 1L)
    assert(v1Files.toSet === victims.toSet)
  }

  test("z-ordered layout: one single-key manifest skips files for BOTH dimensions") {
    import graft.functions.Zorder
    import spark.implicits._
    val path = freshTable()
    // a 64x64 grid of (a, b) points z-order-clustered into 16 range
    // files: each file's z-bounds describe a 2-D locality box, which a
    // linear sort by `a` could never give `b`
    val zc = Zorder.interleave(col("a"), col("b"), 6)
    ManifestLog.commit(
      (for { a <- 0L until 64L; b <- 0L until 64L } yield (a, b))
        .toDF("a", "b")
        .withColumn("z", zc)
        .repartitionByRange(16, col("z"))
        .sortWithinPartitions(col("z")),
      path, "z")

    // box probe [8..15] x [8..15]: monotonicity puts every box point in
    // [z(8,8), z(15,15)], so the manifest prunes on z alone; the
    // residual filter restores box exactness over the admitted z-runs
    def z(a: Long, b: Long): Long =
      (0 until 6).map(i => (((a >> i) & 1L) << (2 * i)) |
        (((b >> i) & 1L) << (2 * i + 1))).sum
    val pruned = ManifestLog
      .scanKeyRange(spark, path, "z", z(8, 8), z(15, 15))
      .filter(col("a").between(8, 15) && col("b").between(8, 15))
    val full = ManifestLog.snapshot(spark, path)
      .filter(col("a").between(8, 15) && col("b").between(8, 15))
    assert(pruned.count() === 64)
    assert(pruned.orderBy("a", "b").collect().map(_.toSeq).toSeq ===
      full.orderBy("a", "b").collect().map(_.toSeq).toSeq)
    // an aligned 8x8 box is one 64-z-value run — a single file of 16
    assert(full.inputFiles.length === 16)
    assert(pruned.inputFiles.length <= 2,
      s"z-order skipping kept ${pruned.inputFiles.length} of 16 files")
  }

  test("per-column stats: a two-predicate probe opens fewer files than either alone") {
    import spark.implicits._
    val path = freshTable()
    // 16 files laid out as a 4x4 grid of (key-bucket x date-bucket):
    // a key predicate alone admits a full COLUMN of the grid, a date
    // predicate alone a full ROW — only their conjunction isolates one
    // cell, which single-key bounds could never express
    for (kb <- 0 until 4; db <- 0 until 4) {
      val rows = (0 until 25).map { i =>
        (kb * 100L + i * 4 + (db % 4),
          java.sql.Date.valueOf(f"2024-${db + 1}%02d-${(i % 25) + 1}%02d"),
          s"cell-$kb-$db")
      }
      ManifestLog.commit(rows.toDF("key", "event_date", "payload")
        .coalesce(1), path, "key")
    }
    assert(ManifestLog.snapshot(spark, path).inputFiles.length === 16)

    def day(d: String): Long = java.time.LocalDate.parse(d).toEpochDay
    val keyPred = "key" -> (100L, 199L)
    val datePred = "event_date" -> (day("2024-02-01"), day("2024-02-29"))

    val keyOnly = ManifestLog.scanColRanges(spark, path, Map(keyPred))
    val dateOnly = ManifestLog.scanColRanges(spark, path, Map(datePred))
    val both = ManifestLog.scanColRanges(spark, path, Map(keyPred, datePred))
    assert(keyOnly.inputFiles.length === 4)
    assert(dateOnly.inputFiles.length === 4)
    assert(both.inputFiles.length === 1,
      s"conjunction kept ${both.inputFiles.length} files, expected the one cell")

    // pruning never changes the answer: equal to the full-scan filter
    val full = ManifestLog.snapshot(spark, path)
      .filter(col("key").between(100L, 199L) &&
        col("event_date").between("2024-02-01", "2024-02-29"))
    assert(both.orderBy("key", "event_date").collect().map(_.toSeq).toSeq ===
      full.orderBy("key", "event_date").collect().map(_.toSeq).toSeq)
    assert(both.count() === 25)

    // a predicate on a column with no stats encoding fails loudly
    intercept[IllegalArgumentException] {
      ManifestLog.scanColRanges(spark, path, Map("payload" -> (0L, 1L)))
        .count()
    }
  }

  test("deleteKeys rewrites only the files that can hold a key") {
    import spark.implicits._
    val path = freshTable()
    // 8 disjoint-range files of 50 keys each
    ManifestLog.commit(
      (0L until 400L).map(k => (k, s"p$k")).toDF("key", "payload")
        .repartitionByRange(8, col("key")), path, "key")
    val before = ManifestLog.fileList(spark, path, 1L)
    assert(before.size === 8)

    // two keys landing in (at most) two range files
    val v = ManifestLog.deleteKeys(spark, path, "key", Seq(7L, 205L))
    assert(v === 2L)
    val after = ManifestLog.fileList(spark, path, 2L)
    val untouched = after.toSet.intersect(before.toSet)
    // the unaffected files keep their IDENTITY (same paths, no rewrite),
    // only the key-bearing ones were replaced
    assert(untouched.size >= 6,
      s"delete rewrote ${8 - untouched.size} files for 2 keys")
    val snap = ManifestLog.snapshot(spark, path)
    assert(snap.count() === 398)
    assert(snap.filter(col("key").isin(7L, 205L)).count() === 0)
    // pre-delete time travel still shows the full table
    assert(ManifestLog.snapshot(spark, path, Some(1L)).count() === 400)

    // deleting keys no live file can hold commits nothing
    assert(ManifestLog.deleteKeys(spark, path, "key", Seq(9999L)) === 2L)
    assert(ManifestLog.currentVersion(spark, path) === 2L)
  }

  test("deletion vectors hide rows with ZERO data-file churn; rewrites materialize them") {
    import spark.implicits._
    val path = freshTable()
    ManifestLog.commit(
      (0L until 400L).map(k => (k, s"p$k")).toDF("key", "payload")
        .repartitionByRange(8, col("key")), path, "key")
    val before = ManifestLog.fileList(spark, path, 1L)

    val v = ManifestLog.deleteKeysDv(spark, path, "key", Seq(7L, 205L))
    assert(v === 2L)
    // THE deletion-vector property: the live data-file set is
    // IDENTICAL — no file was rewritten, unlike deleteKeys
    assert(ManifestLog.fileList(spark, path, 2L) === before)
    // ...yet readers no longer see the rows
    val snap = ManifestLog.snapshot(spark, path)
    assert(snap.count() === 398)
    assert(snap.filter(col("key").isin(7L, 205L)).count() === 0)
    // every pruned read path applies the DV
    assert(ManifestLog.scanKeyPoint(spark, path, "key", 7L).count() === 0)
    assert(ManifestLog.scanKeyRange(spark, path, "key", 200L, 210L)
      .count() === 10)
    // time travel BEFORE the DV still shows the rows
    assert(ManifestLog.snapshot(spark, path, Some(1L)).count() === 400)
    // repeating the delete is a no-op commit
    assert(ManifestLog.deleteKeysDv(spark, path, "key", Seq(7L)) === 2L)

    // a later commit RE-INSERTING a deleted key is a new row in a new
    // file: per-file DV semantics keep it visible
    ManifestLog.commit(Seq((7L, "again")).toDF("key", "payload"),
      path, "key")
    val re = ManifestLog.snapshot(spark, path).filter(col("key") === 7L)
    assert(re.count() === 1)
    assert(re.head.getString(1) === "again")

    // compaction reads through the DV: dead rows do not resurrect, and
    // the rewrite materializes the deletes into the new file
    val vc = ManifestLog.compact(spark, path, "key")
    val compacted = ManifestLog.snapshot(spark, path, Some(vc))
    assert(compacted.count() === 399) // 400 - 2 dv'd + 1 re-insert
    assert(compacted.filter(col("key") === 205L).count() === 0)
    assert(compacted.filter(col("key") === 7L).count() === 1)
  }

  test("bloom index: point lookups skip files whose RANGES cannot prune") {
    import spark.implicits._
    val path = freshTable()
    // scattered layout: files are ranges of a SCRAMBLED order, so each
    // holds keys sprayed across the whole space, every file's
    // [min_key, max_key] covers any probe, and range pruning keeps all
    // 8 — the layout bloom indexes exist for
    ManifestLog.commit(
      (0L until 400L).map(k => (k, s"p$k")).toDF("key", "payload")
        .withColumn("scatter", pmod(col("key") * 2654435761L, lit(4096L)))
        .repartitionByRange(8, col("scatter"))
        .drop("scatter"), path, "key")
    val log = ManifestLog.log(spark, path)
    val rangeCover = log.filter(col("min_key") <= 42L && col("max_key") >= 42L)
    assert(rangeCover.count() >= 6,
      s"layout not scattered enough for the test: ${rangeCover.count()}")

    val hit = ManifestLog.scanKeyPoint(spark, path, "key", 42L)
    assert(hit.count() === 1)
    assert(hit.head.getLong(0) === 42L)
    // the bloom opened a fraction of what the ranges admit
    assert(hit.inputFiles.length <= 2,
      s"bloom kept ${hit.inputFiles.length} of ${rangeCover.count()} range-admitted files")

    // absent key: definitely-absent blooms or the residual filter give
    // zero rows either way (false positives only admit extra files)
    assert(ManifestLog.scanKeyPoint(spark, path, "key", 4242L).count() === 0)
  }

  test("schema evolution: a later commit's added column reads as null on old rows") {
    import spark.implicits._
    val path = freshTable()
    ManifestLog.commit(Seq((1L, "a"), (2L, "b")).toDF("key", "payload"),
      path, "key")
    // commit 2 ADDS a column — the log tracks files, parquet footer
    // merging resolves the union schema
    ManifestLog.commit(
      Seq((3L, "c", "fr")).toDF("key", "payload", "lang"), path, "key")

    val snap = ManifestLog.snapshot(spark, path)
    assert(snap.columns.toSet === Set("key", "payload", "lang"))
    assert(snap.count() === 3)
    assert(snap.filter(col("lang").isNull).count() === 2)
    assert(snap.filter(col("key") === 3L).head.getAs[String]("lang") === "fr")
    // time travel to the pre-evolution snapshot sees the OLD schema
    assert(ManifestLog.snapshot(spark, path, Some(1L)).columns.toSet ===
      Set("key", "payload"))
    // pruned reads resolve the union schema the same way
    assert(ManifestLog.scanKeyRange(spark, path, "key", 1L, 3L)
      .columns.toSet === Set("key", "payload", "lang"))
  }

  test("concurrent commits claim distinct versions and lose nothing") {
    import spark.implicits._
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val path = freshTable()
    // 8 writers race the same table; the create-exclusive version claim
    // serializes the version numbers without serializing the writers
    val versions = Await.result(Future.sequence((0 until 8).map(i =>
      Future(ManifestLog.commit(
        Seq((i.toLong, s"w$i")).toDF("key", "payload"), path, "key")))),
      2.minutes)
    assert(versions.toSet.size === 8, s"version collision: $versions")
    assert(versions.toSet === (1L to 8L).toSet)
    val snap = ManifestLog.snapshot(spark, path)
    assert(snap.count() === 8)
    assert(snap.select("key").collect().map(_.getLong(0)).toSet ===
      (0L until 8L).toSet)
  }

  test("maintenance is single-flight; a crashed claim is a harmless gap") {
    import spark.implicits._
    val path = freshTable()
    ManifestLog.commit(
      (0L until 100L).map(k => (k, s"p$k")).toDF("key", "payload"),
      path, "key")
    // simulate a maintenance job already in flight
    val lock = new java.io.File(s"$path/_maintenance.lock")
    lock.getParentFile.mkdirs()
    assert(lock.createNewFile())
    intercept[java.util.ConcurrentModificationException] {
      ManifestLog.compact(spark, path, "key")
    }
    assert(lock.delete())
    // simulate a writer that claimed a version then crashed before its
    // log append: later writers walk past the gap, readers never see it
    val orphanClaim = new java.io.File(s"$path/_claims/v2")
    assert(orphanClaim.createNewFile())
    val v = ManifestLog.commit(Seq((200L, "x")).toDF("key", "payload"),
      path, "key")
    assert(v === 3L, s"claimed-but-unlogged version not skipped: $v")
    assert(ManifestLog.snapshot(spark, path).count() === 101)
    assert(ManifestLog.compact(spark, path, "key") === 4L)
  }

  test("tableKeyStats: NDV from merged per-file sketches, no data I/O") {
    import spark.implicits._
    val path = freshTable()
    // 1000 rows but only 250 DISTINCT keys, sprayed across 8 files by
    // a scrambled layout so every file holds a slice of every key's
    // occurrences — per-file counts can't just add up to the NDV
    ManifestLog.commit(
      (0L until 1000L).map(i => (i % 250L, s"p$i")).toDF("key", "payload")
        .withColumn("scatter", pmod(col("key") * 2654435761L + col("payload")
          .substr(2, 10).cast("long"), lit(4096L)))
        .repartitionByRange(8, col("scatter"))
        .drop("scatter"), path, "key")
    val st = ManifestLog.tableKeyStats(spark, path).head
    assert(st.getAs[Long]("n_files") === 8)
    assert(st.getAs[Long]("n_rows") === 1000)
    assert(st.getAs[Long]("min_key") === 0L)
    assert(st.getAs[Long]("max_key") === 249L)
    val ndv = st.getAs[Long]("key_ndv_est")
    assert(math.abs(ndv - 250.0) / 250.0 < 0.05,
      s"merged-sketch NDV $ndv too far from 250")

    // manifest-level semantics: a DV hides rows from READERS but file
    // stats are untouched until a rewrite materializes the deletes
    ManifestLog.deleteKeysDv(spark, path, "key", Seq(0L, 1L))
    assert(ManifestLog.snapshot(spark, path).count() === 992)
    assert(ManifestLog.tableKeyStats(spark, path).head
      .getAs[Long]("n_rows") === 1000)
    val vc = ManifestLog.compact(spark, path, "key")
    val st2 = ManifestLog.tableKeyStats(spark, path, Some(vc)).head
    assert(st2.getAs[Long]("n_files") === 1)
    assert(st2.getAs[Long]("n_rows") === 992)
    val ndv2 = st2.getAs[Long]("key_ndv_est")
    assert(math.abs(ndv2 - 248.0) / 248.0 < 0.05)
  }

  test("driver planning is capped: past the conf bound it fails loudly") {
    import spark.implicits._
    val path = freshTable()
    // 6 files across two commits
    ManifestLog.commit(
      (0L until 40L).map(k => (k, s"p$k")).toDF("key", "payload")
        .repartition(4), path, "key")
    ManifestLog.commit(
      (40L until 60L).map(k => (k, s"p$k")).toDF("key", "payload")
        .repartition(2), path, "key")
    try {
      spark.conf.set(ManifestLog.MaxPlannedFilesConf, "4")
      // planning must refuse rather than balloon the driver: the error
      // names the conf and the way out
      val e = intercept[IllegalArgumentException] {
        ManifestLog.snapshot(spark, path).count()
      }
      assert(e.getMessage.contains(ManifestLog.MaxPlannedFilesConf))
      // a pruned probe that stays under the cap still plans fine
      assert(ManifestLog.scanKeyRange(spark, path, "key", 45L, 50L)
        .count() === 6)
      // merge's batch-key collect honors the same bound
      val ek = intercept[IllegalArgumentException] {
        ManifestLog.merge(
          (0L until 6L).map(k => (k, "x")).toDF("key", "payload"),
          path, "key")
      }
      assert(ek.getMessage.contains("distinct"))
    } finally spark.conf.unset(ManifestLog.MaxPlannedFilesConf)
    // with the default cap restored, everything reads again
    assert(ManifestLog.snapshot(spark, path).count() === 60)
  }

  test("uncommitted data files are invisible to readers") {
    import spark.implicits._
    val path = freshTable()
    ManifestLog.commit(Seq((1L, "a"), (2L, "b")).toDF("key", "payload"),
      path, "key")
    // simulate a crash AFTER the data write but BEFORE the log append:
    // orphan files under data/ that no log row names
    Seq((99L, "orphan")).toDF("key", "payload")
      .write.parquet(path + "/data/v2")
    val seen = ManifestLog.snapshot(spark, path)
    assert(seen.count() === 2)
    assert(!seen.collect().map(_.getLong(0)).contains(99L))
    // and the next commit claims the next version without seeing them
    assert(ManifestLog.currentVersion(spark, path) === 1L)
  }

  test("checkpoint collapses log replay; vacuumLog bounds the log root") {
    import spark.implicits._
    val path = freshTable()
    // a history with every action kind: three commits, a DV delete,
    // and a key rewrite — versions 1..5
    (0 until 3).foreach { i =>
      ManifestLog.commit(
        (i * 100L until i * 100L + 100L).map(k => (k, s"p$k"))
          .toDF("key", "payload").repartition(2), path, "key")
    }
    ManifestLog.deleteKeysDv(spark, path, "key", Seq(7L))
    ManifestLog.deleteKeys(spark, path, "key", Seq(205L))
    assert(ManifestLog.currentVersion(spark, path) === 5L)

    def logRows() = ManifestLog.log(spark, path)
      .select("version", "action", "file", "n_rows")
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    val preLog = logRows()
    val preSnap = ManifestLog.snapshot(spark, path)
      .orderBy("key").collect().map(_.toSeq).toSeq
    val preAsOf2 = ManifestLog.snapshot(spark, path, Some(2L))
      .orderBy("key").collect().map(_.toSeq).toSeq

    assert(ManifestLog.checkpoint(spark, path) === 5L)
    assert(ManifestLog.latestCheckpoint(spark, path) === 5L)
    // full fidelity: the same action rows, now replayed from ONE file
    assert(logRows() === preLog)
    assert(ManifestLog.log(spark, path).inputFiles.length === 1)

    // tail versions after the checkpoint read alongside it
    ManifestLog.commit(
      (500L until 520L).map(k => (k, s"p$k")).toDF("key", "payload"),
      path, "key")
    assert(ManifestLog.log(spark, path).inputFiles.length === 2)

    // RETENTION: with only one checkpoint generation there is no safe
    // delete set (a reader that resolved "no checkpoint" may be mid-glob
    // over every v* dir), so the first vacuumLog is a no-op
    assert(ManifestLog.vacuumLog(spark, path) === 0)
    assert(new java.io.File(s"$path/_log").listFiles()
      .count(_.isDirectory) === 6)

    // a second checkpoint makes v5 the PREVIOUS generation; vacuumLog
    // now drops the dirs it covers — and forfeits NOTHING: snapshot,
    // time travel, point lookup, and the CDF all replay from checkpoint
    assert(ManifestLog.checkpoint(spark, path) === 6L)
    assert(ManifestLog.vacuumLog(spark, path) === 5)
    val logDirs = new java.io.File(s"$path/_log").listFiles()
      .filter(_.isDirectory).map(_.getName).toSet
    assert(logDirs === Set("v6")) // newer than prev ck 5 → retained
    assert(ManifestLog.log(spark, path).inputFiles.length === 1)
    assert(ManifestLog.snapshot(spark, path).count() === preSnap.length + 20)
    assert(ManifestLog.snapshot(spark, path, Some(2L))
      .orderBy("key").collect().map(_.toSeq).toSeq === preAsOf2)
    assert(ManifestLog.scanKeyPoint(spark, path, "key", 205L).count() === 0)
    assert(ManifestLog.scanKeyPoint(spark, path, "key", 206L).count() === 1)
    val cdf = ManifestLog.readChanges(spark, path, "key", 5L, 6L)
    assert(cdf.filter(col(ManifestLog.ChangeTypeCol) === "insert")
      .count() === 20)

    // a TORN checkpoint (crash before _SUCCESS): invisible to readers,
    // but vacuumLog must still reclaim it once it falls below the
    // previous generation — filtering on the marker would leak it forever
    assert(new java.io.File(s"$path/_checkpoint/v3").mkdirs())

    // a third generation: vacuumLog drops the v6 log dir, the twice-
    // superseded v5 checkpoint dir AND the torn v3 dir, keeping two
    // checkpoint generations
    ManifestLog.commit(
      (600L until 610L).map(k => (k, s"p$k")).toDF("key", "payload"),
      path, "key")
    assert(ManifestLog.checkpoint(spark, path) === 7L)
    assert(ManifestLog.vacuumLog(spark, path) === 3)
    assert(new java.io.File(s"$path/_checkpoint").listFiles()
      .filter(_.isDirectory).map(_.getName).toSet === Set("v6", "v7"))
    assert(ManifestLog.log(spark, path).inputFiles.length === 1)
    assert(ManifestLog.snapshot(spark, path).count() === preSnap.length + 30)
  }

  test("restore: zero-copy rollback, undo CDF, vacuum respects revival") {
    import spark.implicits._
    val path = freshTable()
    ManifestLog.commit(
      (0L until 100L).map(k => (k, s"p$k")).toDF("key", "payload")
        .repartition(4), path, "key")
    ManifestLog.commit(
      (100L until 150L).map(k => (k, s"p$k")).toDF("key", "payload"),
      path, "key")
    val snap2 = ManifestLog.snapshot(spark, path, Some(2L))
      .orderBy("key").collect().map(_.toSeq).toSeq
    ManifestLog.deleteKeys(spark, path, "key", Seq(50L))
    assert(ManifestLog.snapshot(spark, path).count() === 149)

    val v = ManifestLog.restore(spark, path, "key", 2L)
    assert(v === 4L)
    // the old snapshot is current again — from the ORIGINAL bytes
    assert(ManifestLog.snapshot(spark, path)
      .orderBy("key").collect().map(_.toSeq).toSeq === snap2)
    assert(ManifestLog.fileList(spark, path, 4L).toSet ===
      ManifestLog.fileList(spark, path, 2L).toSet)
    // the restore's CDF is the UNDO delta: key 50 comes back
    val cdf = ManifestLog.readChanges(spark, path, "key", 3L, 4L)
    val ins = cdf.filter(col(ManifestLog.ChangeTypeCol) === "insert")
      .collect()
    assert(ins.map(_.getAs[Long]("key")).toSeq === Seq(50L))
    // history classifies the commits from the log alone
    val hist = ManifestLog.describeHistory(spark, path).collect()
      .map(r => r.getAs[Long]("version") -> r.getAs[String]("operation"))
      .toMap
    assert(hist === Map(1L -> "append", 2L -> "append",
      3L -> "rewrite", 4L -> "rewrite"))
    // vacuum must not doom the revived file by its OLD remove: after a
    // full-horizon vacuum the restored snapshot still reads complete
    ManifestLog.vacuum(spark, path, 4L)
    assert(ManifestLog.snapshot(spark, path).count() === 150)
    assert(ManifestLog.snapshot(spark, path)
      .filter(col("key") === 50L).count() === 1)
  }

  test("restore materializes only files a post-target DV has bitten") {
    import spark.implicits._
    val path = freshTable()
    ManifestLog.commit(
      (0L until 50L).map(k => (k, s"p$k")).toDF("key", "payload")
        .repartitionByRange(2, col("key")), path, "key")
    val v1Files = ManifestLog.fileList(spark, path, 1L).toSet
    ManifestLog.deleteKeysDv(spark, path, "key", Seq(7L))
    ManifestLog.commit(
      (100L until 110L).map(k => (k, s"p$k")).toDF("key", "payload"),
      path, "key")
    assert(ManifestLog.snapshot(spark, path).count() === 59)

    val v = ManifestLog.restore(spark, path, "key", 1L)
    // key 7 resurrects; the later commit's rows retire
    val snap = ManifestLog.snapshot(spark, path)
    assert(snap.count() === 50)
    assert(snap.filter(col("key") === 7L).count() === 1)
    assert(snap.filter(col("key") >= 100L).count() === 0)
    assert(ManifestLog.snapshot(spark, path)
      .orderBy("key").collect().map(_.toSeq).toSeq ===
      ManifestLog.snapshot(spark, path, Some(1L))
        .orderBy("key").collect().map(_.toSeq).toSeq)
    // only the DV-bitten file was rewritten: the clean v1 file keeps
    // its identity, the dirty one's replacement lives in the restore
    // version's data directory
    val now = ManifestLog.fileList(spark, path, v).toSet
    val kept = now.intersect(v1Files)
    assert(kept.size === 1)
    assert((now -- kept).forall(_.contains(s"/data/v$v/")))
  }

  test("optimizeZorder: a scattered layout becomes box-prunable on both columns") {
    import spark.implicits._
    val path = freshTable()
    // 20x20 grid of (a, b), committed ROUND-ROBIN: every file spans
    // both full ranges, so per-column stats prune nothing
    ManifestLog.commit(
      (0L until 400L).map(k => (k, (k % 20L).toInt, (k / 20L).toInt))
        .toDF("key", "a", "b").repartition(8), path, "key")
    val preds = Map("a" -> (0L, 4L), "b" -> (0L, 4L))
    val pre = ManifestLog.scanColRanges(spark, path, preds)
    assert(pre.count() === 25)
    assert(pre.inputFiles.length === 8, "scattered layout must not prune")
    val preSnap = ManifestLog.snapshot(spark, path)
      .orderBy("key").collect().map(_.toSeq).toSeq

    val v = ManifestLog.optimizeZorder(spark, path, "key", "a", "b", 8)
    assert(v === 2L)
    // same table...
    assert(ManifestLog.snapshot(spark, path)
      .orderBy("key").collect().map(_.toSeq).toSeq === preSnap)
    // ...and the box probe now opens a fraction of the files: the
    // 5x5 corner box is 1/16 of z-space, so ≤ 2 of 8 range files
    val post = ManifestLog.scanColRanges(spark, path, preds)
    assert(post.count() === 25)
    assert(post.inputFiles.length <= 2,
      s"z-order kept ${post.inputFiles.length} of 8 files")
    // an optimize is data-neutral: its CDF nets to zero change rows
    assert(ManifestLog.readChanges(spark, path, "key", 1L, v).count() === 0)
  }

  test("optimizeZorder survives a full-BIGINT-range column (span > Long.MaxValue)") {
    import spark.implicits._
    val path = freshTable()
    // hash-valued longs spanning more than Long.MaxValue: hi − lo wraps
    // negative in Long arithmetic, which used to collapse the span to 1
    // and null every z-code through decimal overflow (BigInt span fix)
    val aMin = -(3L << 60)
    val aMax = 3L << 61
    assert(BigInt(aMax) - BigInt(aMin) > BigInt(Long.MaxValue))
    val step = (BigInt(aMax) - BigInt(aMin)) / 63
    val rows = (0L until 64L).map { k =>
      (k, (BigInt(aMin) + BigInt(k) * step).toLong, (k * 37L) % 64L)
    }
    ManifestLog.commit(rows.toDF("key", "a", "b").repartition(4),
      path, "key")
    val preSnap = ManifestLog.snapshot(spark, path)
      .orderBy("key").collect().map(_.toSeq).toSeq
    val v = ManifestLog.optimizeZorder(spark, path, "key", "a", "b", 4)
    assert(v === 2L)
    // data-neutral and the clustered layout actually separated the `a`
    // range — each output file covers a fraction of it, so a low-end
    // probe prunes (null z-codes would have collapsed all clustering)
    assert(ManifestLog.snapshot(spark, path)
      .orderBy("key").collect().map(_.toSeq).toSeq === preSnap)
    val aCut = (BigInt(aMin) + (BigInt(aMax) - BigInt(aMin)) / 8).toLong
    val probe = ManifestLog.scanColRanges(spark, path,
      Map("a" -> (aMin, aCut)))
    assert(probe.count() === rows.count(_._2 <= aCut))
    assert(probe.inputFiles.length < 4,
      s"full-range column kept ${probe.inputFiles.length} of 4 files")
  }

  test("optimizeZorder clamps the top coordinate: the column MAX clusters high, not low") {
    import spark.implicits._
    val path = freshTable()
    // two a-values spanning > Long.MaxValue: decimal HALF_UP rounding
    // puts the max's scaled quotient at exactly 2^16, which unclamped
    // wraps through interleave's 16-bit mask to z-contribution 0 — the
    // max rows would then be INSEPARABLE from the min rows and a
    // max-point probe would open every file. b is held constant so the
    // z-order is driven by a alone (b's bits interleave one position
    // higher and would otherwise dominate the split).
    val aMin = -(3L << 60)
    val aMax = 3L << 61
    val rows = (0L until 64L).map(k =>
      (k, if (k % 2 == 0) aMin else aMax, 0L))
    ManifestLog.commit(rows.toDF("key", "a", "b").repartition(4),
      path, "key")
    assert(ManifestLog.optimizeZorder(spark, path, "key", "a", "b", 2) === 2L)
    val probe = ManifestLog.scanColRanges(spark, path,
      Map("a" -> (aMax, aMax)))
    assert(probe.count() === 32)
    assert(probe.inputFiles.length === 1,
      s"max-valued rows mixed into ${probe.inputFiles.length} files")
  }

  test("optimizeCompact: only small-file bins rewrite, DVs reclaim, fixpoint no-op") {
    import spark.implicits._
    val path = freshTable()
    // one target-aligned file (80 = 2 whole bins — must keep identity)
    // + four 10-row streaming-debris files (one bin of four at target
    // 40; aligned sizes so the post-compaction state is a true
    // fixpoint independent of same-directory file-name order)
    ManifestLog.commit((0L until 80L).map(k => (k, s"p$k"))
      .toDF("key", "payload").coalesce(1), path, "key")
    (0 until 4).foreach { i =>
      ManifestLog.commit(
        (80L + i * 10 until 90L + i * 10).map(k => (k, s"p$k"))
          .toDF("key", "payload").coalesce(1), path, "key")
    }
    val bigFile = ManifestLog.snapshot(spark, path, Some(1L)).inputFiles.head
    // a DV'd row in a rewritten bin must physically reclaim
    val vDv = ManifestLog.deleteKeysDv(spark, path, "key", Seq(105L))
    assert(vDv === 6L)
    assert(ManifestLog.snapshot(spark, path).count() === 119)

    val v = ManifestLog.optimizeCompact(spark, path, "key", 40L)
    assert(v === 7L)
    val snap = ManifestLog.snapshot(spark, path)
    assert(snap.count() === 119)
    assert(snap.agg(sum(col("key"))).head.getLong(0) ===
      (0L until 120L).sum - 105L)
    // 5 live DATA files became 2: the aligned file by IDENTITY + the
    // debris bin's rewrite (inputFiles also lists the v6 DV sidecar
    // the snapshot's anti-join reads — not a data file)
    val dataFiles = snap.inputFiles.filter(_.contains("/data/"))
    assert(dataFiles.length === 2,
      s"expected 2 live data files, got ${dataFiles.length}")
    assert(dataFiles.contains(bigFile),
      "full-sized file lost its identity in a selective compaction")
    // physical reclaim: the rewritten bytes no longer hold the DV'd row
    val rewritten = spark.read.parquet(s"$path/data/v7")
    assert(rewritten.count() === 39)
    assert(rewritten.filter(col("key") === 105L).isEmpty)
    // fixpoint: every bin now holds one file; the call commits nothing
    assert(ManifestLog.optimizeCompact(spark, path, "key", 40L) === 7L)
    assert(ManifestLog.currentVersion(spark, path) === 7L)
    // history intact: pre-compaction versions still time-travel
    assert(ManifestLog.snapshot(spark, path, Some(5L)).count() === 120)
    // the CDF nets the pure-compaction version to ZERO change rows —
    // the row deleted by the v6 DV must NOT resurface as a v7 change
    // (its delete was already reported at v6)
    val cdf = ManifestLog.readChanges(spark, path, "key", 6L, 7L)
    assert(cdf.isEmpty,
      s"compaction leaked ${cdf.count()} change rows into the CDF")
  }

  test("shallowClone: zero-copy branch, DVs carry, vacuum never touches source bytes") {
    import spark.implicits._
    val src = freshTable()
    val dst = freshTable()
    ManifestLog.commit((0L until 100L).map(k => (k, s"p$k"))
      .toDF("key", "payload").repartitionByRange(4, col("key")),
      src, "key")
    ManifestLog.commit((100L until 120L).map(k => (k, s"p$k"))
      .toDF("key", "payload").coalesce(1), src, "key")
    ManifestLog.deleteKeysDv(spark, src, "key", Seq(7L))

    assert(ManifestLog.shallowClone(spark, src, dst) === 1L)
    // identical visible rows, including the source DV's effect
    val srcRows = ManifestLog.snapshot(spark, src).orderBy("key")
      .collect().map(_.toSeq).toSeq
    assert(ManifestLog.snapshot(spark, dst).orderBy("key")
      .collect().map(_.toSeq).toSeq === srcRows)
    assert(ManifestLog.snapshot(spark, dst).count() === 119)
    // ZERO data bytes moved: every data file the clone reads lives
    // under the SOURCE path; the clone has no data root at all
    val cloneData = ManifestLog.snapshot(spark, dst).inputFiles
      .filter(_.contains("/data/"))
    assert(cloneData.nonEmpty && cloneData.forall(_.contains(src)))
    assert(!new java.io.File(s"$dst/data").exists())

    // the branch evolves independently: an append lands in the
    // clone's own root and the source never sees it
    ManifestLog.commit((200L until 210L).map(k => (k, s"p$k"))
      .toDF("key", "payload").coalesce(1), dst, "key")
    assert(ManifestLog.snapshot(spark, dst).count() === 129)
    assert(ManifestLog.snapshot(spark, src).count() === 119)
    // clone time travel: v1 is still the cloned snapshot
    assert(ManifestLog.snapshot(spark, dst, Some(1L)).count() === 119)

    // copy-on-write: compacting the clone rewrites into ITS OWN root
    // and vacuuming the clone deletes NO source bytes (ownership rule)
    ManifestLog.compact(spark, dst, "key")
    val postCompact = ManifestLog.snapshot(spark, dst).inputFiles
      .filter(_.contains("/data/"))
    assert(postCompact.forall(_.contains(dst)),
      "compacted clone still reads source bytes")
    val doomed = ManifestLog.vacuumList(spark, dst, Long.MaxValue)
    assert(doomed.forall(_.contains(dst)),
      s"vacuum would delete source-owned bytes: $doomed")
    ManifestLog.vacuum(spark, dst, Long.MaxValue)
    // the source is fully intact after the clone's vacuum
    assert(ManifestLog.snapshot(spark, src).orderBy("key")
      .collect().map(_.toSeq).toSeq === srcRows)

    // as-of clone: branch from v1 sees only the first commit
    val dst2 = freshTable()
    ManifestLog.shallowClone(spark, src, dst2, Some(1L))
    assert(ManifestLog.snapshot(spark, dst2).count() === 100)
  }

  test("schema evolution: column adds absorb without rewrite; merges and time travel span the boundary") {
    import spark.implicits._
    val path = freshTable()
    // v1 writes the narrow schema (key, payload)
    ManifestLog.commit((0L until 10L).map(k => (k, s"p$k"))
      .toDF("key", "payload").coalesce(1), path, "key")
    val v1Files = ManifestLog.snapshot(spark, path).inputFiles.toSet
    // v2 appends with a NEW column — the old bytes must absorb the
    // widening unchanged (no table rewrite), reads surface the added
    // column as NULL on pre-evolution rows (mergeSchema semantics)
    ManifestLog.commit((10L until 15L).map(k => (k, s"p$k", s"n$k"))
      .toDF("key", "payload", "note").coalesce(1), path, "key")
    val snap = ManifestLog.snapshot(spark, path)
    assert(snap.columns.toSet === Set("key", "payload", "note"))
    assert(v1Files.subsetOf(snap.inputFiles.toSet),
      "widening rewrote pre-evolution files")
    assert(snap.filter(col("key") < 10L && col("note").isNull)
      .count() === 10)
    assert(snap.filter(col("note").isNotNull).count() === 5)
    // MERGE against the widened schema: an upsert touching an
    // old-schema file carries the new column into the rewrite
    ManifestLog.merge(Seq((5L, "p5v2", "m5"), (100L, "new", "m100"))
      .toDF("key", "payload", "note"), path, "key")
    val m = ManifestLog.snapshot(spark, path)
    assert(m.count() === 16)
    assert(m.filter(col("key") === 5L).head.getAs[String]("note") === "m5")
    assert(m.filter(col("key") === 0L).head.getAs[String]("note") === null)
    // and a NARROW-schema merge still lands (missing column -> null)
    // without disturbing widened survivors
    ManifestLog.merge(Seq((6L, "p6v2")).toDF("key", "payload"),
      path, "key")
    val m2 = ManifestLog.snapshot(spark, path)
    assert(m2.filter(col("key") === 6L).head.getAs[String]("payload")
      === "p6v2")
    assert(m2.filter(col("key") === 6L).head.getAs[String]("note") === null)
    assert(m2.filter(col("key") === 5L).head.getAs[String]("note") === "m5")
    // time travel ACROSS the evolution boundary: v1 projects the
    // original narrow schema, untouched by three later commits
    val t1 = ManifestLog.snapshot(spark, path, Some(1L))
    assert(t1.columns.toSet === Set("key", "payload"))
    assert(t1.count() === 10)
  }

  test("vacuum ownership is an anchored prefix: a source whose path embeds the clone's data root survives") {
    import spark.implicits._
    // adversarial layout: the SOURCE lives OUTSIDE the clone, but its
    // absolute path EMBEDS the clone's path ("/backup<dst>"), so every
    // source data file's string contains the substring "<dst>/data/" —
    // a substring ownership test would claim the source's bytes for
    // the clone's vacuum; the anchored fs-qualified prefix must not
    val dst = freshTable()
    val src = Files.createTempDirectory("backup").toString + dst
    ManifestLog.commit((0L until 60L).map(k => (k, s"p$k"))
      .toDF("key", "payload").repartitionByRange(3, col("key")),
      src, "key")
    val srcRows = ManifestLog.snapshot(spark, src).orderBy("key")
      .collect().map(_.toSeq).toSeq
    ManifestLog.shallowClone(spark, src, dst)
    // clone-side rewrite: external (source-owned) files get REMOVE
    // actions in the clone's log — exactly the rows vacuum plans from.
    // None of them is clone-owned, so the plan must be EMPTY (the old
    // substring test matched all three source files here)
    ManifestLog.compact(spark, dst, "key")
    val doomed0 = ManifestLog.vacuumList(spark, dst, Long.MaxValue)
    assert(doomed0.isEmpty,
      s"vacuum plan names source-owned bytes: $doomed0")
    // a second clone-side rewrite removes CLONE-owned bytes — those
    // must still plan (ownership anchoring must not disable retention)
    ManifestLog.deleteKeys(spark, dst, "key", Seq(5L))
    val doomed = ManifestLog.vacuumList(spark, dst, Long.MaxValue)
    assert(doomed.nonEmpty, "clone-owned debris no longer plans")
    assert(doomed.forall(f =>
      f.contains(s"$dst/data/v") && !f.contains(src)),
      s"vacuum plan names source-owned bytes: $doomed")
    // spelling-robust: the table reached through an explicit file: URI
    // plans the same debris (an unqualified-vs-qualified mismatch must
    // not silently empty the plan — that is a retention leak)
    assert(ManifestLog.vacuumList(spark, s"file://$dst", Long.MaxValue)
      .toSet === doomed.toSet,
      "URI spelling changed the vacuum plan")
    ManifestLog.vacuum(spark, dst, Long.MaxValue)
    assert(ManifestLog.snapshot(spark, src).orderBy("key")
      .collect().map(_.toSeq).toSeq === srcRows,
      "clone vacuum destroyed the source table")
    assert(ManifestLog.snapshot(spark, dst).count() === 59)
  }

  test("shallowClone: a stale orphan claim fails with a recovery path, a published v1 fails as a race") {
    import spark.implicits._
    val src = freshTable()
    ManifestLog.commit((0L until 10L).map(k => (k, s"p$k"))
      .toDF("key", "payload").coalesce(1), src, "key")
    val dst = freshTable()
    // simulate a clone that crashed between claimVersion and
    // writeActions: the v1 claim marker exists, no v1 log ever will
    val claims = new java.io.File(s"$dst/_claims")
    assert(claims.mkdirs())
    assert(new java.io.File(claims, "v1").createNewFile())
    val ex = intercept[IllegalStateException] {
      ManifestLog.shallowClone(spark, src, dst)
    }
    assert(ex.getMessage.contains("_claims"),
      s"stale-orphan error carries no recovery path: ${ex.getMessage}")
    // the documented recovery: remove the claim directory, re-clone
    claims.listFiles().foreach(_.delete())
    assert(claims.delete())
    assert(ManifestLog.shallowClone(spark, src, dst) === 1L)
    assert(ManifestLog.snapshot(spark, dst).count() === 10)
    // a LIVE loss (v1 already committed) reads as a race, not an orphan
    val dst2 = freshTable()
    ManifestLog.commit((0L until 5L).map(k => (k, s"x$k"))
      .toDF("key", "payload").coalesce(1), dst2, "key")
    val ex2 = intercept[IllegalArgumentException] {
      ManifestLog.shallowClone(spark, src, dst2)
    }
    assert(ex2.getMessage.contains("already a table"))
  }

  test("symlink manifest: exact live list, atomic refresh, DV refusal until compact") {
    import spark.implicits._
    val path = freshTable()
    ManifestLog.commit((0L until 100L).map(k => (k, s"p$k"))
      .toDF("key", "payload").repartitionByRange(4, col("key")),
      path, "key")
    def readManifest(): Seq[String] =
      scala.io.Source.fromFile(s"$path/_symlink_format_manifest/manifest")
        .getLines().toSeq
    assert(ManifestLog.writeSymlinkManifest(spark, path) === 4)
    val live1 = ManifestLog.snapshot(spark, path).inputFiles
      .map(_.stripPrefix("file:")).toSet
    assert(readManifest().map(_.stripPrefix("file:")).toSet === live1)
    // stale-then-regenerate: a new commit changes the live set, the
    // next GENERATE replaces the manifest atomically
    ManifestLog.commit((100L until 120L).map(k => (k, s"p$k"))
      .toDF("key", "payload").coalesce(1), path, "key")
    assert(ManifestLog.writeSymlinkManifest(spark, path) === 5)
    assert(readManifest().size === 5)
    // live deletion vectors refuse loudly (external engines read whole
    // files); after compact materializes them the export works again
    ManifestLog.deleteKeysDv(spark, path, "key", Seq(5L))
    assertThrows[IllegalArgumentException] {
      ManifestLog.writeSymlinkManifest(spark, path)
    }
    ManifestLog.compact(spark, path, "key")
    assert(ManifestLog.writeSymlinkManifest(spark, path) === 1)
    val fin = readManifest()
    assert(fin.size === 1 && fin.head.contains(path))
  }
}
