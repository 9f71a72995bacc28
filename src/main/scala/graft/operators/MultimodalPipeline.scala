package graft.operators

import graft.sources.Tables
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One opaque media blob + routing metadata (the wire format a real
  * ingest would carry: bytes + modality tag).
  */
final case class MediaRow(doc_id: Long, media: Array[Byte], kind: String)

/** Typed decode output — codec from the REAL header parse
  * ("unknown" + stub dims when the bytes are no known container).
  * Carries the full modality-spanning field set of
  * [[graft.plans.MediaHeader.Parsed]]: images fill width/height, audio
  * fills sample_rate/channels, video fills width/height/duration_ms —
  * the typed path surfaces exactly what the SQL surface
  * ([[Multimodal.multimodalMeta]]) does. */
final case class DecodedMeta(doc_id: Long, kind: String, n_bytes: Int,
    checksum: Long, width: Int, height: Int, codec: String,
    sample_rate: Option[Int] = None, channels: Option[Int] = None,
    duration_ms: Option[Long] = None)

/** The partition-parallel decode pipeline behind
  * [[Multimodal.multimodalMeta]]'s SQL surface: a typed
  * `Dataset[MediaRow] -> mapPartitions -> Dataset[DecodedMeta]` where a
  * heavyweight decoder would be instantiated once per PARTITION (never
  * per row, never on the driver). Header decode is REAL —
  * [[graft.plans.MediaHeader.parse]] reads PNG/GIF/BMP/JPEG container
  * headers — with an honest fallback for unparseable bytes (codec
  * "unknown", deterministic stub dims). Pixel-level stages (resize
  * kernels, frame decode, feature models) remain stubs, clearly marked
  * at each stage; the batching shape, encoder schema, and partition
  * lifecycle are the production contract and are spec-tested.
  */
object MultimodalPipeline {

  /** Partition-scoped decode: a heavyweight decoder would be created
    * once per partition here; rows then stream through it without
    * further setup cost. The header parse itself
    * ([[graft.plans.MediaHeader.parse]]) is allocation-free per row.
    */
  def decodePartition(rows: Iterator[MediaRow]): Iterator[DecodedMeta] = {
    rows.map { r =>
      val n = r.media.length
      var ck = 0L
      var i = 0
      while (i < n) { ck = ck * 31L + (r.media(i) & 0xff); i += 1 }
      val p = graft.plans.MediaHeader.parse(r.media)
      if (p != null)
        DecodedMeta(r.doc_id, r.kind, n, ck,
          if (p.width == null) 0 else p.width.intValue,
          if (p.height == null) 0 else p.height.intValue,
          p.codec,
          Option(p.sampleRate).map(_.intValue),
          Option(p.channels).map(_.intValue),
          Option(p.durationMs).map(_.longValue))
      else // not a known container: stub dims, honestly labeled
        DecodedMeta(r.doc_id, r.kind, n, ck,
          n % 640 + 16, (n * 7) % 480 + 16, "unknown")
    }
  }

  /** Media routing: image docs carry one of the four REAL container
    * headers (round-robin by doc_id), "audio" docs a real RIFF/WAVE
    * header (sample_rate/channels parse back), "video" docs a real MP4
    * moov (dims + duration_ms parse back), "opaque" docs unparseable
    * text bytes — exercising the real parse of every modality AND the
    * honest fallback through the same typed path.
    */
  def decode(s: SparkSession, dir: String): Dataset[DecodedMeta] = {
    import s.implicits._
    val w = (pmod(col("doc_id") * 37, lit(2000)) + 16).cast("int")
    val h = (pmod(col("doc_id") * 91, lit(1200)) + 16).cast("int")
    val rate = (pmod(col("doc_id") * 53, lit(40000)) + 8000).cast("int")
    val ch = (pmod(col("doc_id"), lit(2)) + 1).cast("int")
    val dur = (pmod(col("doc_id") * 29, lit(600000)) + 1000).cast("int")
    val kindId = pmod(col("doc_id"), lit(4))
    // image docs are doc_id ≡ 0 (mod 4): pick among the four image
    // codecs by the next two bits so all four actually occur
    val codecPick = pmod(expr("doc_id div 4"), lit(4))
    Tables.documents(s, dir)
      .select(col("doc_id"),
        when(kindId === 1, Multimodal.wavBytes(rate, ch))
          .when(kindId === 2, Multimodal.mp4Bytes(w, h, dur))
          .when(kindId === 3, encode(col("text"), "UTF-8"))
          .otherwise(when(codecPick === 0, Multimodal.pngBytes(w, h))
            .when(codecPick === 1, Multimodal.gifBytes(w, h))
            .when(codecPick === 2, Multimodal.bmpBytes(w, h))
            .otherwise(Multimodal.jpegBytes(w, h))).as("media"),
        when(kindId === 0, "image").when(kindId === 1, "audio")
          .when(kindId === 2, "video").otherwise("opaque").as("kind"))
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
        val frames = m.n_bytes % 120 + 1 // frame-count stub (pixel tier)
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
