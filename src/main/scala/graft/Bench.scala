package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: times the headline (bench-flagged) queries at the
  * SPARK_GRAFT_SF_DIR scale factor and prints ONE JSON line. Each query
  * is fully materialized via the noop sink (a bare count() would let
  * Catalyst prune the projection and under-report).
  *
  * Contention robustness (three rounds of phantom >4x outliers on the
  * driver's bench host, each adjudicated away by a quiet-host re-run):
  * best of THREE timed passes per query; any query whose worst pass
  * exceeds 2x its best is automatically RE-RUN once and the rerun
  * replaces the worst pass — a transient contention spike then washes
  * out (the rerun lands near the min and the flag drops), while a real
  * regression reproduces and stays flagged. Per-query `spread` is the
  * median absolute deviation of the kept passes; queries still
  * spread-flagged after the rerun land in `outliers`, so a genuinely
  * noisy host self-documents instead of silently inflating totals.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // Leg-shaping controls for the sf3 gate legs (VERDICT r14 item 3 —
    // dedup_prefix_filter alone was 91% of the sf3 suite wall, ~90 min
    // of a leg's budget spent on a declared output-bound audit tier):
    //  - SPARK_GRAFT_BENCH_EXCLUDE: comma-separated names skipped for
    //    this run (the gate's flat sf3.0 leg drops the audit tiers —
    //    their flat-layout delta is already measured at flat sf1.0);
    //  - SPARK_GRAFT_AUDIT_PASSES: timed passes for auditTier queries
    //    (default 3 like everything else; the gate's sf3.0f32 leg uses
    //    1 — their bytes are deterministic on pass 1 and their walls
    //    are excluded from working-set totals anyway).
    // BytePins.drift iterates CURRENT queries, so an excluded query is
    // simply unchecked, never a false alarm.
    val exclude = sys.env.get("SPARK_GRAFT_BENCH_EXCLUDE")
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSet)
      .getOrElse(Set.empty[String])
    val auditPasses = sys.env.get("SPARK_GRAFT_AUDIT_PASSES")
      .map(_.toInt).getOrElse(3)
    val spark: SparkSession = Graft.session()
    val qs = Registry.all.filter(q => q.bench && !exclude(q.name))
    // one warmup pass on the smallest sf to JIT/codegen before timing
    qs.foreach { q =>
      try q.fn(spark, "/root/testdata/sf0.001").write.format("noop")
        .mode("overwrite").save()
      catch { case _: Throwable => () }
    }
    def flagged(ts: Seq[Double]): Boolean =
      ts.max > 2.0 * ts.min && ts.max - ts.min > 0.25
    val results = qs.map { q =>
      def body(): Unit =
        try q.fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        catch { case e: Throwable =>
          System.err.println(s"[bench] ${q.name} failed: ${e.getMessage}")
        }
      def pass(): Double = {
        val t0 = System.nanoTime()
        body()
        (System.nanoTime() - t0) / 1e9
      }
      // pass 1 runs under the resource audit: shuffle/scan bytes and
      // task spread are DETERMINISTIC per (plan, data) — unlike wall
      // time — so one measured pass suffices and the per-round BENCH
      // record gains the numbers the scale claims are argued from
      // ("one shuffle per agg", "the filter reached the scan"). The
      // clock stops before the listener-bus drain, so the audit adds
      // only the per-task-end accumulator adds to the timed region.
      var res: graft.tools.ResourceMetrics = null
      def measuredPass(): Double = {
        var t: Double = 0.0
        val (_, m) = graft.tools.ResourceAudit.measure(spark) {
          t = pass()
        }
        res = m
        t
      }
      val nPasses = if (q.auditTier) auditPasses else 3
      var times = (measuredPass() +: (2 to nPasses).map(_ => pass())).sorted
      if (nPasses > 1 && flagged(times)) // confirmation pass replaces worst
        times = (times.dropRight(1) :+ pass()).sorted
      // Inter-query hygiene (round 14, OUTSIDE every timed region): the
      // four sort-path rows' sf3 superlinearity measured in round 13
      // did not reproduce in isolation (asof_join_native 11.1 s
      // in-suite vs 2.3 s alone, same data/code/host) — the inflation
      // is state inherited from heavy NEIGHBORS (dead broadcast and
      // localCheckpoint blocks, old-gen residue; the ContextCleaner is
      // weak-reference-driven, so without a GC nudge a 24 g heap
      // carries it query to query). The per-query gc_ms resource metric
      // is the instrument that attributes what remains.
      System.gc()
      val median = times(times.size / 2)
      val mad = times.map(t => math.abs(t - median)).sorted.apply(times.size / 2)
      (q.name, times.min, times.max, mad, flagged(times), res)
    }
    def fmtMap(f: ((String, Double, Double, Double, Boolean,
        graft.tools.ResourceMetrics)) => String): String =
      results.map(f).mkString("{", ",", "}")
    val qJson = fmtMap { case (k, mn, _, _, _, _) => "\"" + k + "\":" + f"$mn%.3f" }
    val spreadJson = fmtMap { case (k, _, _, mad, _, _) => "\"" + k + "\":" + f"$mad%.3f" }
    val mb = 1024.0 * 1024.0
    val resJson = fmtMap { case (k, _, _, _, _, m) =>
      "\"" + k + "\":{" +
        s""""tasks":${m.tasks},""" +
        f""""input_mb":${m.inputBytes / mb}%.2f,""" +
        f""""shuffle_read_mb":${m.shuffleReadBytes / mb}%.2f,""" +
        f""""shuffle_write_mb":${m.shuffleWriteBytes / mb}%.2f,""" +
        s""""shuffle_write_records":${m.shuffleWriteRecords},""" +
        f""""spill_mb":${m.spillBytes / mb}%.2f,""" +
        s""""gc_ms":${m.gcTimeMs},""" +
        f""""task_spread":${m.taskSpread}%.2f}"""
    }
    val outliers = results.collect {
      case (k, _, _, _, true, _) => "\"" + k + "\""
    }.mkString("[", ",", "]")
    // plan-shape drift vs the committed fingerprint pin (when this
    // run's SF is a pinned label): a non-empty list means a headliner's
    // physical plan CHANGED since the pin — bench drift is then a plan
    // event, not host contention, and the adjudication is mechanical
    // exact final-segment match: a custom dir merely ENDING in a pinned
    // label (/data/mysf0.1) must not be drift-checked against the pin —
    // join strategies are data-size-dependent on unpinned data
    val lastSeg = sfDir.split('/').filter(_.nonEmpty).lastOption
    val sfLabel = graft.tools.PlanFingerprint.Sfs
      .collectFirst { case (l, d) if lastSeg.contains(l) || d == sfDir => l }
    // None (unpinned SF, or no pin file loaded) renders as null — an
    // empty LIST must always mean "checked and clean", never "unchecked"
    val drift: Option[Seq[String]] = sfLabel.flatMap { l =>
      val pin = graft.tools.PlanFingerprint.committed()
      if (pin.isEmpty) None
      else Some(qs.flatMap { q =>
        val h = graft.tools.PlanFingerprint.hash(q.fn(spark, sfDir))
        pin.get((l, q.name)) match {
          case Some(p) if p != h => Some(q.name)
          case _ => None
        }
      })
    }
    val driftJson = drift
      .map(_.map("\"" + _ + "\"").mkString("[", ",", "]")).getOrElse("null")
    // shuffle-byte drift vs the committed pin (tools.BytePins): bytes
    // are deterministic per (plan, data), so at a PINNED label a moved
    // byte count is a plan event (e.g. an AQE join-strategy flip) even
    // when the static fingerprint and wall clock are both silent.
    // Same null discipline as plan_drift: an empty LIST means checked
    // and clean; null means this SF has no pins.
    val bytePins = graft.tools.BytePins.committed()
    val curBytes = results
      .map { case (k, _, _, _, _, m) => k -> m.shuffleWriteBytes / mb }.toMap
    val bytesDriftJson = lastSeg
      .filter(l => bytePins.keys.exists(_._1 == l))
      .map(l => graft.tools.BytePins.drift(bytePins, l, curBytes)
        .map("\"" + _ + "\"").mkString("[", ",", "]"))
      .getOrElse("null")
    val total = results.map(_._2).sum
    // working_set excludes the declared output-bound audit tiers
    // (Q.auditTier — dedup_prefix_filter alone was 91% of the r14 sf3
    // suite total, so the full total stops measuring the engine at
    // scale; "value" keeps its full-total meaning because BASELINE's 2×
    // gate is defined over the frozen 30-query set). audit_tiers names
    // the excluded queries so the python tooling derives the split from
    // the log instead of hardcoding it (VERDICT r14 item 3).
    val auditNames = qs.filter(_.auditTier).map(_.name)
    val workingTotal = results
      .collect { case (k, mn, _, _, _, _) if !auditNames.contains(k) => mn }.sum
    val auditJson = auditNames.map("\"" + _ + "\"").mkString("[", ",", "]")
    val jsonLine =
      s"""{"metric":"total","value":${f"$total%.3f"},"working_set":${f"$workingTotal%.3f"},"audit_tiers":$auditJson,"unit":"sec","queries":$qJson,"spread":$spreadJson,"outliers":$outliers,"plan_drift":$driftJson,"bytes_drift":$bytesDriftJson,"resources":$resJson,"sf":"$sfDir"}"""
    println(jsonLine)
    // the full line also lands in committed files: the driver's BENCH
    // record captures only a 2000-char stdout tail, which truncated the
    // round-13 per-query map — the round record must not depend on
    // tail-capture length. bench_last.json is the most recent run;
    // bench_last_<label>.json is keyed by the SF-dir's last segment so
    // a multi-leg gate run preserves EVERY leg instead of the final
    // one overwriting the rest (ADVICE r14).
    val label = lastSeg.getOrElse("unknown")
    Seq("tools/bench_last.json", s"tools/bench_last_$label.json")
      .foreach { rel =>
        try java.nio.file.Files.writeString(
          new java.io.File(graft.tools.BytePins.repoRoot, rel).toPath,
          jsonLine + "\n")
        catch { case e: Throwable =>
          System.err.println(s"[bench] $rel write failed: ${e.getMessage}")
        }
      }
    spark.stop()
  }
}
