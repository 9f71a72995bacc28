package graft.streaming

import graft.operators.Pipeline
import graft.sources.{JsonLake, Warehouse}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.{StringType, StructField}

/** The reference's INCREMENTAL load path as a stream: scraper JSON
  * lands in the lake, each micro-batch cleans + enriches and upserts
  * the warehouse — dimensions via get-or-create ([[Warehouse.upsertDim]]
  * — ids are stable across batches, exactly like the reference's
  * Postgres serials), facts appended. The file source + checkpoint give
  * exactly-once file processing, so re-running after a crash neither
  * drops nor duplicates a scrape (the property the reference's
  * Celery-retry + row-INSERT flow approximates with PK conflicts).
  *
  * Batch `Pipeline.run` stays the rebuild path; this is the tailing
  * path a production lake runs continuously. Cross-batch offer dedup is
  * the streaming dedup operator's job ([[Streaming.dedupStream]] shape)
  * — within a batch, `Pipeline.clean` dedups by job_url.
  */
object StreamingPipeline {

  /** Start the incremental loader over `lakeDir`; AvailableNow drains
    * what exists and stops (rerun with the same checkpoint to pick up
    * only NEW files).
    */
  def start(s: SparkSession, lakeDir: String, outDir: String,
      checkpoint: String): StreamingQuery = {
    val schema = Pipeline.offerSchema
      .add(StructField(JsonLake.CorruptCol, StringType, nullable = true))
    val raw = s.readStream.schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", JsonLake.CorruptCol)
      .json(lakeDir)
    raw.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val (ok, bad) = JsonLake.quarantine(batch)
        val offers = Pipeline.enrich(Pipeline.clean(ok))
        val dSource = Warehouse.upsertDim(
          offers.select(lower(trim(col("via"))).as("value")),
          s"$outDir/dim_source", "id_source")
        val fact = offers
          .join(broadcast(dSource),
            lower(trim(col("via"))) === dSource("value"))
          .select(col("job_url"), col("pub_date"), col("id_source"),
            col("secteur"), col("niveau_qualification"))
        fact.write.mode("append").parquet(s"$outDir/fact_offre")
        bad.write.mode("append").json(s"$outDir/quarantine")
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
  }

  /** Drain all currently-available lake files and stop. */
  def runOnce(s: SparkSession, lakeDir: String, outDir: String,
      checkpoint: String): Unit = {
    val q = start(s, lakeDir, outDir, checkpoint)
    q.awaitTermination()
  }
}
