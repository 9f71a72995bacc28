package graft.operators

import graft.sources.Tables
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One opaque media blob + routing metadata (the wire format a real
  * ingest would carry: bytes + modality tag).
  */
final case class MediaRow(doc_id: Long, media: Array[Byte], kind: String)

/** Typed decode output — what a codec-backed decoder would emit. */
final case class DecodedMeta(doc_id: Long, kind: String, n_bytes: Int,
    checksum: Long, width: Int, height: Int)

/** The partition-parallel decode pipeline behind
  * [[Multimodal.multimodalMeta]]'s SQL surface: a typed
  * `Dataset[MediaRow] -> mapPartitions -> Dataset[DecodedMeta]` where a
  * real implementation would instantiate one codec per PARTITION (never
  * per row, never on the driver). The container ships no codecs, so the
  * per-row decode is a deterministic stub; the batching shape, encoder
  * schema, and partition lifecycle are the real contract and are
  * spec-tested.
  */
object MultimodalPipeline {

  /** Partition-scoped decode: the `val codec = ...` slot is where a real
    * decoder gets created once per partition; rows then stream through
    * it without further setup cost.
    */
  def decodePartition(rows: Iterator[MediaRow]): Iterator[DecodedMeta] = {
    // stub codec: deterministic arithmetic over the raw bytes
    rows.map { r =>
      val n = r.media.length
      var ck = 0L
      var i = 0
      while (i < n) { ck = ck * 31L + (r.media(i) & 0xff); i += 1 }
      DecodedMeta(r.doc_id, r.kind, n, ck, n % 640 + 16, (n * 7) % 480 + 16)
    }
  }

  def decode(s: SparkSession, dir: String): Dataset[DecodedMeta] = {
    import s.implicits._
    Tables.documents(s, dir)
      .select(col("doc_id"),
        encode(col("text"), "UTF-8").as("media"),
        when(ascii(substring(col("text"), 1, 1)) % 3 === 0, "image")
          .when(ascii(substring(col("text"), 1, 1)) % 3 === 1, "audio")
          .otherwise("video").as("kind"))
      .as[MediaRow]
      .mapPartitions(decodePartition)
  }
}
