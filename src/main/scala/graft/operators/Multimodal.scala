package graft.operators

import graft.Q
import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media as opaque `binary` columns with a
  * typed metadata struct alongside — and a REAL header decode.
  *
  * The container ships no pixel codecs, but dimension/codec extraction
  * never needed one: it reads the container HEADER, which is plain byte
  * arithmetic. [[graft.plans.MediaHeader]]'s `graft_media_meta`
  * expression parses PNG IHDR, GIF logical-screen, BMP DIB, JPEG SOF,
  * RIFF/WAVE fmt and MP4 moov/mvhd/tkhd box headers in pure JVM code,
  * so the decode step here is no longer a
  * stub — the bytes are constructed as REAL format headers (signature,
  * chunk layout, endianness per spec) and actually parsed back. Only
  * pixel-level work (resize kernels, frame decode) remains stubbed in
  * [[MultimodalPipeline]], clearly marked there.
  *
  * Oracle gating: rows-only + spec ([[graft.plans.DeflateLen]]'s
  * model — DuckDB cannot parse binary headers). The spec pins the
  * ROUND TRIP on byte-identical fixtures: every constructed width and
  * height is recovered exactly by the parser for all four formats, and
  * golden hand-written byte arrays decode to known dimensions.
  */
object Multimodal {

  private def beHex16(c: Column): Column = lpad(hex(c), 4, "0")
  private def beHex32(c: Column): Column = lpad(hex(c), 8, "0")
  private def leHex16(c: Column): Column = {
    val h = beHex16(c)
    concat(substring(h, 3, 2), substring(h, 1, 2))
  }
  private def leHex32(c: Column): Column = {
    val h = beHex32(c)
    concat(substring(h, 7, 2), substring(h, 5, 2),
      substring(h, 3, 2), substring(h, 1, 2))
  }

  /** A minimal valid PNG: signature + IHDR chunk (len 13, 8-bit RGBA). */
  def pngBytes(w: Column, h: Column): Column =
    unhex(concat(lit("89504E470D0A1A0A"), lit("0000000D"), lit("49484452"),
      beHex32(w), beHex32(h), lit("0806000000"), lit("00000000")))

  /** A minimal valid GIF89a: header + logical screen descriptor. */
  def gifBytes(w: Column, h: Column): Column =
    unhex(concat(lit("474946383961"), leHex16(w), leHex16(h),
      lit("F70000")))

  /** A minimal valid BMP: BM magic + BITMAPINFOHEADER (DIB size 40,
    * 24bpp). */
  def bmpBytes(w: Column, h: Column): Column =
    unhex(concat(lit("424D"), lit("00000000"), lit("00000000"),
      lit("36000000"), lit("28000000"), leHex32(w), leHex32(h),
      lit("0100"), lit("1800")))

  /** A minimal valid JPEG: SOI, a JFIF APP0 segment (exercises the
    * marker walk's skip-by-length), then the SOF0 frame header that
    * carries the dimensions. */
  def jpegBytes(w: Column, h: Column): Column =
    unhex(concat(lit("FFD8"),
      lit("FFE000104A46494600010100000100010000"),
      lit("FFC0001108"), beHex16(h), beHex16(w),
      lit("03011100021101031101")))

  /** A minimal valid WAV: RIFF/WAVE with a LIST chunk FIRST (exercises
    * the chunk walk's skip-by-size), then the 16-byte PCM `fmt `
    * chunk carrying channels and sample rate. */
  def wavBytes(rate: Column, channels: Column): Column =
    unhex(concat(lit("52494646"), lit("28000000"), lit("57415645"),
      lit("4C495354"), lit("04000000"), lit("494E464F"),
      lit("666D7420"), lit("10000000"), lit("0100"), leHex16(channels),
      leHex32(rate), lit("00000000"), lit("0400"), lit("1000")))

  private val Mp4Matrix =
    "000100000000000000000000000000000001000000000000000000000000000040000000"

  /** A minimal valid MP4 (ISO-BMFF): ftyp, a `free` box (exercises the
    * top-level box skip), then moov holding a `udta` box (child skip),
    * an mvhd with timescale 1000 so duration IS milliseconds, an AUDIO
    * trak whose tkhd carries zero dims (must be skipped), and the video
    * trak whose tkhd carries the 16.16 fixed-point dims. */
  def mp4Bytes(w: Column, h: Column, durMs: Column): Column =
    unhex(concat(
      lit("00000010"), lit("66747970"), lit("69736F6D"), lit("00000000"),
      lit("00000008"), lit("66726565"),
      lit("00000144"), lit("6D6F6F76"), // moov: 8+8+108+100+100
      lit("00000008"), lit("75647461"), // udta (skipped child)
      lit("0000006C"), lit("6D766864"), lit("00000000"), // mvhd v0
      lit("00000000"), lit("00000000"), lit("000003E8"), beHex32(durMs),
      lit("00010000"), lit("0100"), lit("0000"),
      lit("0000000000000000"), lit(Mp4Matrix), lit("0" * 48),
      lit("00000002"),
      lit("00000064"), lit("7472616B"), // audio trak: tkhd dims 0x0
      lit("0000005C"), lit("746B6864"), lit("00000007"),
      lit("00000000"), lit("00000000"), lit("00000001"), lit("00000000"),
      lit("00000000"), lit("0000000000000000"),
      lit("0000"), lit("0000"), lit("0100"), lit("0000"), lit(Mp4Matrix),
      lit("00000000"), lit("00000000"),
      lit("00000064"), lit("7472616B"), // video trak: real dims
      lit("0000005C"), lit("746B6864"), lit("00000007"),
      lit("00000000"), lit("00000000"), lit("00000002"), lit("00000000"),
      lit("00000000"), lit("0000000000000000"),
      lit("0000"), lit("0000"), lit("0000"), lit("0000"), lit(Mp4Matrix),
      concat(beHex16(w), lit("0000")), concat(beHex16(h), lit("0000"))))

  /** Construct one real media header per document (format and
    * dimensions derived deterministically from doc_id), then DECODE it
    * with the pure-JVM header parser and emit the parsed metadata —
    * the parse is the operator; the construction exists because the
    * corpus carries no real media bytes. Pure projection: both the
    * construction (hex/concat/unhex builtins) and the parse are
    * per-row map work at scan speed, no shuffle at any corpus size.
    */
  def multimodalMeta(s: SparkSession, dir: String): DataFrame = {
    val w = (pmod(col("doc_id") * 37, lit(2000)) + 16).cast("int")
    val h = (pmod(col("doc_id") * 91, lit(1200)) + 16).cast("int")
    val rate = (pmod(col("doc_id") * 53, lit(40000)) + 8000).cast("int")
    val ch = (pmod(col("doc_id"), lit(2)) + 1).cast("int")
    val dur = (pmod(col("doc_id") * 29, lit(600000)) + 1000).cast("int")
    Tables.documents(s, dir)
      .select(col("doc_id"), w.as("w0"), h.as("h0"),
        rate.as("r0"), ch.as("c0"), dur.as("d0"),
        pmod(col("doc_id"), lit(6)).as("kind_id"))
      .withColumn("media",
        when(col("kind_id") === 0, pngBytes(col("w0"), col("h0")))
          .when(col("kind_id") === 1, gifBytes(col("w0"), col("h0")))
          .when(col("kind_id") === 2, bmpBytes(col("w0"), col("h0")))
          .when(col("kind_id") === 3, jpegBytes(col("w0"), col("h0")))
          .when(col("kind_id") === 4, wavBytes(col("r0"), col("c0")))
          .otherwise(mp4Bytes(col("w0"), col("h0"), col("d0"))))
      .withColumn("m", expr("graft_media_meta(media)"))
      .select(col("doc_id"),
        length(col("media")).as("n_bytes"),
        col("m.codec").as("codec"),
        col("m.width").as("width"),
        col("m.height").as("height"),
        col("m.sample_rate").as("sample_rate"),
        col("m.channels").as("channels"),
        col("m.duration_ms").as("duration_ms"))
      .orderBy("doc_id")
  }

  def queries: Seq[Q] = Seq(
    Q("multimodal_meta", None)(multimodalMeta))
}
