package graft.streaming

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import graft.SharedSpark
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** Multi-batch streaming: files arrive one per micro-batch, the
  * watermark advances between batches, and append-mode windows emit
  * exactly once with values equal to a batch aggregation.
  */
class IncrementalStreamingSpec extends AnyFunSuite {
  import SharedSpark._

  test("watermark advances across micro-batches; emissions match batch agg") {
    // split the events table into 3 time-ordered files in a flat dir
    val src = graft.sources.Tables.events(spark, sf)
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value"))
      .orderBy("ts", "event_id")
    val rows = src.count()
    val flat = Files.createTempDirectory("graft_inc").toString
    (0 until 3).foreach { i =>
      val part = src.limit(((i + 1) * rows / 3).toInt)
        .except(src.limit((i * rows / 3).toInt))
      val tmp = Files.createTempDirectory(s"graft_inc_b$i").toString
      part.coalesce(1).write.mode("overwrite").parquet(tmp)
      val f = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      val dst: Path = Paths.get(flat, f"b$i%02d.parquet")
      Files.move(f.toPath, dst, StandardCopyOption.REPLACE_EXISTING)
      dst.toFile.setLastModified(1000000L * (i + 1))
    }

    val schema = spark.read.parquet(flat).schema
    val agg = spark.readStream.schema(schema).parquet(flat)
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(unix_micros(col("w.end")).as("end_us"), col("event_type"),
        col("n_events"))
    val q = agg.writeStream.format("memory").queryName("inc_stream")
      .outputMode("append")
      .option("maxFilesPerTrigger", "1")
      .trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable()
    q.stop()

    val emitted = spark.table("inc_stream").collect()
      .map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(emitted.nonEmpty)

    val batchAll = spark.read.parquet(flat)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(unix_micros(col("w.end")).as("end_us"), col("event_type"),
        col("n_events")).collect()
      .map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap

    // every emission equals the batch value (exactly-once, no partials)
    emitted.foreach { case (k, v) =>
      assert(batchAll.get(k).contains(v), s"window $k: stream=$v batch=${batchAll.get(k)}")
    }
    // and every window safely below the final watermark was emitted
    val wmUs = spark.read.parquet(flat).agg(max(unix_micros(col("ts"))))
      .head.getLong(0) - 3600L * 1000000L
    val due = batchAll.keys.filter(_._1 <= wmUs - 60L * 1000000L)
    assert(due.nonEmpty)
    due.foreach(k => assert(emitted.contains(k), s"window $k never emitted"))
  }
}
