package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `graft_media_meta(binary)` -> struct<codec, width, height>: a REAL
  * pure-JVM media header decoder — magic-bytes detection plus container
  * header parsing for the formats whose dimensions live in a fixed,
  * documented header layout:
  *
  *  - '''PNG''' (RFC 2083): 8-byte signature, then the IHDRchunk —
  *    width/height as big-endian u32 at offsets 16/20;
  *  - '''GIF''' (GIF87a/GIF89a): logical screen width/height as
  *    little-endian u16 at offsets 6/8;
  *  - '''BMP''' (BITMAPINFOHEADER / BITMAPCOREHEADER): "BM" magic, DIB
  *    header size at 14 selects i32-LE dims at 18/22 (height may be
  *    negative for top-down rows — reported absolute) vs u16-LE at
  *    18/20;
  *  - '''JPEG''' (ISO 10918 / JFIF): marker-segment walk from SOI to
  *    the first SOFn frame header (C0..CF minus C4/C8/CC), whose
  *    height/width are big-endian u16 at segment offsets 5/7 —
  *    dimensions are NOT at a fixed offset in JPEG, so the walk skips
  *    each segment by its declared length, exactly what every real
  *    decoder's header pass does;
  *  - '''WAV''' (RIFF/WAVE): chunk walk to the `fmt ` chunk —
  *    channels le-u16 / sample rate le-u32; the audio modality's
  *    metadata (dimensions stay null, the struct spans modalities).
  *
  * Anything else — truncated headers included — returns NULL, never a
  * guess. The expression replaces the earlier arithmetic decode stub:
  * the bytes are now actually parsed, in the JDK with no codec
  * dependency (dimension extraction needs the container header only,
  * not pixel decoding — the honest pure-JVM scope for this container).
  * Per-row cost is bounded by the header bytes (PNG/GIF/BMP constant;
  * JPEG linear in the pre-frame segment list), far below the
  * [[DeflateLen]] precedent this follows, including its rows-only+spec
  * oracle gating (DuckDB cannot parse binary headers).
  */
object MediaHeader {

  val FnName = "graft_media_meta"

  /** Driver/executor-side parse result (the expression emits the same
    * fields as an InternalRow struct). Image formats carry dimensions
    * and null audio fields; audio formats the reverse — the one struct
    * spans modalities the way a real media catalog column does. */
  final case class Parsed(codec: String, width: java.lang.Integer,
    height: java.lang.Integer, sampleRate: java.lang.Integer = null,
    channels: java.lang.Integer = null)

  def parse(b: Array[Byte]): Parsed = {
    if (b == null) return null
    def u8(i: Int): Int = b(i) & 0xff
    def beU16(i: Int): Int = (u8(i) << 8) | u8(i + 1)
    def leU16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    def beI32(i: Int): Int =
      (u8(i) << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)
    def leI32(i: Int): Int =
      u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16) | (u8(i + 3) << 24)

    val PngSig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)
    if (b.length >= 24 && PngSig.indices.forall(i => u8(i) == PngSig(i)) &&
      u8(12) == 'I' && u8(13) == 'H' && u8(14) == 'D' && u8(15) == 'R')
      return Parsed("png", beI32(16), beI32(20))

    if (b.length >= 10 && u8(0) == 'G' && u8(1) == 'I' && u8(2) == 'F' &&
      u8(3) == '8' && (u8(4) == '7' || u8(4) == '9') && u8(5) == 'a')
      return Parsed("gif", leU16(6), leU16(8))

    if (b.length >= 22 && u8(0) == 'B' && u8(1) == 'M') {
      val dib = leI32(14)
      if (dib >= 40 && b.length >= 26)
        return Parsed("bmp", leI32(18), math.abs(leI32(22)))
      if (dib == 12)
        return Parsed("bmp", leU16(18), leU16(20))
      return null
    }

    // WAV (RIFF/WAVE, the canonical PCM container): chunk walk from
    // offset 12 — [id u32][size le-u32][payload, word-aligned] — to the
    // 'fmt ' chunk, whose channels (le-u16 at +2) and sample rate
    // (le-u32 at +4) are the audio metadata a catalog keeps.
    if (b.length >= 12 && u8(0) == 'R' && u8(1) == 'I' && u8(2) == 'F' &&
      u8(3) == 'F' && u8(8) == 'W' && u8(9) == 'A' && u8(10) == 'V' &&
      u8(11) == 'E') {
      var i = 12
      while (i + 8 <= b.length) {
        val isFmt = u8(i) == 'f' && u8(i + 1) == 'm' && u8(i + 2) == 't' &&
          u8(i + 3) == ' '
        val size = leI32(i + 4)
        if (size < 0) return null
        if (isFmt) {
          if (size < 16 || i + 16 > b.length) return null
          return Parsed("wav", null, null, leI32(i + 12), leU16(i + 10))
        }
        // a declared size past the buffer can't precede an in-bounds
        // fmt chunk — refuse, and never let the Int advance overflow
        // (a hostile 0x7FFFFFF0 size would wrap i negative and index
        // out of bounds instead of returning null)
        if (size > b.length - i - 8) return null
        i += 8 + size + (size & 1) // RIFF chunks are word-aligned
      }
      return null
    }

    if (b.length >= 4 && u8(0) == 0xff && u8(1) == 0xd8) {
      // JPEG marker walk: SOI consumed; segments are FF <marker>
      // [len-u16 payload] except standalone markers (TEM, RSTn, EOI)
      var i = 2
      while (i + 1 < b.length) {
        if (u8(i) != 0xff) return null // desynchronized stream
        var j = i + 1
        while (j < b.length && u8(j) == 0xff) j += 1 // fill bytes
        if (j >= b.length) return null
        val m = u8(j)
        if (m == 0xd9) return null // EOI before any frame header
        else if (m == 0x01 || (m >= 0xd0 && m <= 0xd7)) i = j + 1
        else {
          if (j + 2 >= b.length) return null
          val len = beU16(j + 1)
          if (len < 2) return null
          val isSof = m >= 0xc0 && m <= 0xcf &&
            m != 0xc4 && m != 0xc8 && m != 0xcc
          if (isSof) {
            if (j + 7 >= b.length) return null
            return Parsed("jpeg", beU16(j + 6), beU16(j + 4))
          }
          i = j + 1 + len
        }
      }
      return null
    }
    null
  }

  val OutType: StructType = StructType(Seq(
    StructField("codec", StringType, nullable = false),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("sample_rate", IntegerType, nullable = true),
    StructField("channels", IntegerType, nullable = true)))

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      FnName, exprs => MediaMetaExpr(exprs(0)), "built-in")
}

case class MediaMetaExpr(child: Expression)
  extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a binary column, got ${child.dataType.sql}")

  override def prettyName: String = MediaHeader.FnName
  override def dataType: DataType = MediaHeader.OutType
  override def nullable: Boolean = true

  override protected def nullSafeEval(v: Any): Any = {
    val p = MediaHeader.parse(v.asInstanceOf[Array[Byte]])
    if (p == null) null
    else new GenericInternalRow(Array[Any](
      UTF8String.fromString(p.codec), p.width, p.height,
      p.sampleRate, p.channels))
  }

  override protected def withNewChildInternal(
      newChild: Expression): MediaMetaExpr = copy(child = newChild)
}
