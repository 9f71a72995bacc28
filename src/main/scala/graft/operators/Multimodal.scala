package graft.operators

import graft.Q
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media as opaque `binary` columns with a
  * typed metadata struct alongside.
  *
  * The container has no image/audio codecs, so the decode step is a
  * DETERMINISTIC STUB (metadata derived arithmetically from the bytes);
  * the Spark-side contract — binary column, per-row metadata projection,
  * partition-parallel decode with no driver involvement — is the real
  * thing. A codec-backed decoder would replace only the stubbed
  * width/height/frames arithmetic (e.g. via `mapPartitions` over a typed
  * Dataset, one codec instance per partition, which
  * [[graft.operators.MultimodalPipeline]] demonstrates).
  */
object Multimodal {

  /** Manufacture an opaque media blob from the document text (UTF-8
    * bytes), then project typed metadata: byte size, magic prefix (hex),
    * modality kind, and decode-stub dimensions.
    */
  def multimodalMeta(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"),
        encode(col("text"), "UTF-8").as("media"),
        length(encode(col("text"), "UTF-8")).as("n_bytes"),
        hex(encode(substring(col("text"), 1, 4), "UTF-8")).as("magic_hex"),
        (ascii(substring(col("text"), 1, 1)) % 3).as("kind_id"))
      .select(col("doc_id"), col("n_bytes"), col("magic_hex"),
        when(col("kind_id") === 0, "image")
          .when(col("kind_id") === 1, "audio")
          .otherwise("video").as("kind"),
        (col("n_bytes") % 640 + 16).as("width"),
        ((col("n_bytes") * 7) % 480 + 16).as("height"),
        when(col("kind_id") === 2, col("n_bytes") % 120 + 1).otherwise(1)
          .as("n_frames"))
      .orderBy("doc_id")

  val multimodalMetaSql: String =
    """WITH m AS (
         SELECT doc_id, octet_length(encode(text)) AS n_bytes,
                hex(encode(substr(text, 1, 4))) AS magic_hex,
                ascii(substr(text, 1, 1)) % 3 AS kind_id
         FROM documents)
       SELECT doc_id, CAST(n_bytes AS INT) AS n_bytes, magic_hex,
         CASE kind_id WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
              ELSE 'video' END AS kind,
         CAST(n_bytes % 640 + 16 AS INT) AS width,
         CAST((n_bytes * 7) % 480 + 16 AS INT) AS height,
         CAST(CASE WHEN kind_id = 2 THEN n_bytes % 120 + 1 ELSE 1 END AS INT) AS n_frames
       FROM m ORDER BY doc_id"""

  def queries: Seq[Q] = Seq(
    Q("multimodal_meta", Some(multimodalMetaSql))(multimodalMeta))
}
