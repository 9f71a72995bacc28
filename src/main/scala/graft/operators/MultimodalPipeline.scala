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

  /** Resize stage (stub): a real implementation rescales pixel buffers;
    * the contract — pure per-row transform of decoded media, target
    * dims clamped to the source aspect — is what downstream relies on.
    */
  def resize(decoded: Dataset[DecodedMeta], maxW: Int,
      maxH: Int): Dataset[DecodedMeta] = {
    import decoded.sparkSession.implicits._
    decoded.map { m =>
      val scale = math.min(1.0,
        math.min(maxW.toDouble / m.width, maxH.toDouble / m.height))
      m.copy(
        width = math.max(1, (m.width * scale).toInt),
        height = math.max(1, (m.height * scale).toInt))
    }
  }

  /** Frame-sample stage (stub): every `stride`-th frame of video rows;
    * non-video rows pass through as a single frame. Output is one row
    * per sampled frame — the explode shape a real sampler produces.
    */
  def frameSample(s: SparkSession, dir: String,
      stride: Int): Dataset[FrameRow] = {
    import s.implicits._
    decode(s, dir).flatMap { m =>
      if (m.kind == "video") {
        val frames = m.n_bytes % 120 + 1 // matches multimodal_meta's stub
        (0 until frames by stride).map(f =>
          FrameRow(m.doc_id, f, m.checksum * 31L + f))
      } else Seq(FrameRow(m.doc_id, 0, m.checksum))
    }
  }

  /** Feature-extract stage (stub): a fixed-width deterministic feature
    * vector per media row (a real extractor runs a model per partition;
    * the batch shape and schema are the contract).
    */
  def features(decoded: Dataset[DecodedMeta], dim: Int): Dataset[FeatureRow] = {
    import decoded.sparkSession.implicits._
    decoded.mapPartitions { rows =>
      // one "model" per partition (stub): features from the checksum
      rows.map { m =>
        val v = Array.tabulate(dim)(i =>
          (((m.checksum >>> (i % 48)) & 0xffL).toFloat / 255.0f))
        FeatureRow(m.doc_id, v)
      }
    }
  }
}

/** One sampled frame of a (stub-)decoded video. */
final case class FrameRow(doc_id: Long, frame_idx: Int, frame_sig: Long)

/** Fixed-width media feature vector. */
final case class FeatureRow(doc_id: Long, features: Array[Float])
