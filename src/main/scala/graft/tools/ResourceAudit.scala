package graft.tools

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Aggregated task-level resource metrics for one measured action —
  * the observability tier behind the engine's scale claims. Plans argue
  * "one shuffle per aggregation" and "the filter reaches the scan";
  * these numbers MEASURE it per query per round: a plan regression that
  * doubles shuffle volume or un-pushes a filter moves `shuffleWriteBytes`
  * / `inputBytes` even when wall clock hides inside host-contention
  * noise (the round-9..12 bench-plateau ambiguity this tier exists to
  * end). The reference ships Prometheus node/container monitoring
  * (reference: prometheus.yml:1); a query engine's equivalent is
  * per-query task metrics, which Spark already accumulates — this just
  * scopes them to one action.
  */
final case class ResourceMetrics(
    tasks: Long,
    taskTimeMs: Long,
    peakTaskMs: Long,
    inputBytes: Long,
    inputRecords: Long,
    shuffleReadBytes: Long,
    shuffleReadRecords: Long,
    shuffleWriteBytes: Long,
    shuffleWriteRecords: Long,
    spillBytes: Long) {

  /** Straggler factor: slowest task vs the mean task — the number a
    * 1000-executor cluster's wall clock is hostage to (1.0 = perfectly
    * level; >> 1 = skew or a serialized stage). */
  def taskSpread: Double =
    if (tasks == 0L) 1.0
    else peakTaskMs.toDouble / math.max(taskTimeMs.toDouble / tasks, 1e-9)
}

object ResourceAudit {

  /** Run `action` and return it with the task metrics of every task the
    * session completed while it ran. Scoping is by listener lifetime:
    * exact when jobs run serially (Verify's concurrent pool would
    * co-mingle neighbors — use from serial paths like Bench/audits).
    * The listener bus is drained before the snapshot, so the action's
    * final tasks are never undercounted; the drain happens OUTSIDE any
    * caller timing of `action` itself.
    */
  def measure[T](spark: SparkSession)(action: => T): (T, ResourceMetrics) = {
    val tasks, taskTime, peakTask, inBytes, inRecs, srBytes, srRecs,
      swBytes, swRecs, spill = new AtomicLong(0L)
    val listener = new SparkListener {
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
        val m = te.taskMetrics
        if (m != null) {
          tasks.incrementAndGet()
          taskTime.addAndGet(m.executorRunTime)
          peakTask.getAndUpdate(cur => math.max(cur, m.executorRunTime))
          inBytes.addAndGet(m.inputMetrics.bytesRead)
          inRecs.addAndGet(m.inputMetrics.recordsRead)
          srBytes.addAndGet(m.shuffleReadMetrics.totalBytesRead)
          srRecs.addAndGet(m.shuffleReadMetrics.recordsRead)
          swBytes.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          swRecs.addAndGet(m.shuffleWriteMetrics.recordsWritten)
          spill.addAndGet(m.memoryBytesSpilled + m.diskBytesSpilled)
        }
      }
    }
    val sc = spark.sparkContext
    sc.addSparkListener(listener)
    try {
      val result = action
      org.apache.spark.graftbridge.ListenerBridge.drain(sc)
      (result, ResourceMetrics(tasks.get, taskTime.get, peakTask.get,
        inBytes.get, inRecs.get, srBytes.get, srRecs.get,
        swBytes.get, swRecs.get, spill.get))
    } finally sc.removeSparkListener(listener)
  }

  /** Per-query resource audit as a queryable DataFrame: runs each named
    * registered query against `dir` (fully materialized via the noop
    * sink) and emits one row of wall time + task metrics per query —
    * the round-over-round frame the scale claims are checked against.
    */
  def auditQueries(spark: SparkSession, dir: String,
      names: Seq[String]): DataFrame = {
    import spark.implicits._
    val byName = graft.Registry.all.map(q => q.name -> q).toMap
    names.map { n =>
      val q = byName.getOrElse(n, sys.error(s"unknown query: $n"))
      val t0 = System.nanoTime()
      val (_, m) = measure(spark) {
        q.fn(spark, dir).write.format("noop").mode("overwrite").save()
      }
      val wall = (System.nanoTime() - t0) / 1e9
      (n, wall, m.tasks, m.inputBytes, m.inputRecords,
        m.shuffleReadBytes, m.shuffleWriteBytes, m.shuffleWriteRecords,
        m.spillBytes, m.taskSpread)
    }.toDF("query", "wall_sec", "tasks", "input_bytes", "input_records",
      "shuffle_read_bytes", "shuffle_write_bytes", "shuffle_write_records",
      "spill_bytes", "task_spread")
  }
}
