package graft.plans

import graft.SharedSpark
import graft.operators.Multimodal
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The pure-JVM media header parser: golden hand-written byte arrays
  * per format, malformed-input refusals, and the SQL expression's
  * round trip over the fixture constructors.
  */
class MediaHeaderSpec extends AnyFunSuite {
  import SharedSpark._

  private def hexBytes(h: String): Array[Byte] =
    h.replaceAll("\\s", "").grouped(2)
      .map(x => Integer.parseInt(x, 16).toByte).toArray

  test("golden PNG: signature + IHDR big-endian dims") {
    // 800x600, 8-bit RGBA — byte-for-byte the spec layout
    val png = hexBytes(
      "89504E470D0A1A0A 0000000D 49484452 00000320 00000258 0806000000 00000000")
    val p = MediaHeader.parse(png)
    assert(p === MediaHeader.Parsed("png", 800, 600))
  }

  test("golden GIF: both signatures, little-endian logical screen") {
    // 320x200
    assert(MediaHeader.parse(hexBytes("474946383961 4001 C800 F70000")) ===
      MediaHeader.Parsed("gif", 320, 200))
    assert(MediaHeader.parse(hexBytes("474946383761 4001 C800 F70000")) ===
      MediaHeader.Parsed("gif", 320, 200))
  }

  test("golden BMP: INFO header, CORE header, and top-down negative height") {
    // BITMAPINFOHEADER 1024x768
    val info = hexBytes(
      "424D 00000000 00000000 36000000 28000000 00040000 00030000 0100 1800")
    assert(MediaHeader.parse(info) === MediaHeader.Parsed("bmp", 1024, 768))
    // top-down DIB: height -768 (FFFFFD00 LE) reports absolute
    val topDown = hexBytes(
      "424D 00000000 00000000 36000000 28000000 00040000 00FDFFFF 0100 1800")
    assert(MediaHeader.parse(topDown) === MediaHeader.Parsed("bmp", 1024, 768))
    // BITMAPCOREHEADER (DIB size 12): u16 dims 64x48
    val core = hexBytes(
      "424D 00000000 00000000 1A000000 0C000000 4000 3000 0100 1800")
    assert(MediaHeader.parse(core) === MediaHeader.Parsed("bmp", 64, 48))
  }

  test("golden JPEG: SOF behind skipped segments; EOI-first refuses") {
    // SOI, APP0 (JFIF, 16 bytes), SOF0 with height=480 width=640
    val jpg = hexBytes(
      "FFD8 FFE0 0010 4A46494600 0101 00 0001 0001 0000" +
        "FFC0 0011 08 01E0 0280 03 011100 021101 031101")
    assert(MediaHeader.parse(jpg) === MediaHeader.Parsed("jpeg", 640, 480))
    // a COM segment and fill bytes before the frame header still land
    val comFirst = hexBytes(
      "FFD8 FFFE 0004 4142 FFFF FFC2 0011 08 0010 0020 03 011100 021101 031101")
    assert(MediaHeader.parse(comFirst) === MediaHeader.Parsed("jpeg", 32, 16))
    // EOI before any SOF: no dimensions exist
    assert(MediaHeader.parse(hexBytes("FFD8 FFD9")) === null)
    // C4 (DHT) is not a frame header
    assert(MediaHeader.parse(hexBytes("FFD8 FFC4 0004 0000 FFD9")) === null)
  }

  test("malformed inputs refuse rather than guess") {
    assert(MediaHeader.parse(null) === null)
    assert(MediaHeader.parse(Array.emptyByteArray) === null)
    assert(MediaHeader.parse("just some text".getBytes("UTF-8")) === null)
    // truncated PNG: signature but no room for IHDR dims
    assert(MediaHeader.parse(hexBytes("89504E470D0A1A0A 0000000D 4948")) === null)
    // PNG signature with a non-IHDR first chunk
    assert(MediaHeader.parse(hexBytes(
      "89504E470D0A1A0A 0000000D 49444154 00000320 00000258")) === null)
    // truncated JPEG mid-segment
    assert(MediaHeader.parse(hexBytes("FFD8 FFE0 0010 4A46")) === null)
    // BM magic with an unknown DIB size
    assert(MediaHeader.parse(hexBytes(
      "424D 00000000 00000000 1A000000 10000000 4000 3000 0100 1800")) === null)
  }

  test("expression round trip: constructed fixtures parse back to their dims") {
    import spark.implicits._
    val dims = Seq((1L, 17, 23), (2L, 640, 480), (3L, 1999, 1215), (4L, 16, 16))
    val df = dims.toDF("id", "w", "h")
    for ((mk, codec) <- Seq[(org.apache.spark.sql.Column, String)](
      (Multimodal.pngBytes(col("w"), col("h")), "png"),
      (Multimodal.gifBytes(col("w"), col("h")), "gif"),
      (Multimodal.bmpBytes(col("w"), col("h")), "bmp"),
      (Multimodal.jpegBytes(col("w"), col("h")), "jpeg"))) {
      val out = df.withColumn("media", mk)
        .withColumn("m", expr("graft_media_meta(media)"))
        .select(col("w"), col("h"), col("m.codec"), col("m.width"),
          col("m.height"))
        .collect()
      out.foreach { r =>
        assert(r.getString(2) === codec)
        assert(r.getInt(3) === r.getInt(0), s"$codec width round trip")
        assert(r.getInt(4) === r.getInt(1), s"$codec height round trip")
      }
    }
    // mp4: dims AND duration round-trip through the expression
    val mp4 = df.withColumn("d", (col("id") * 7919 + 42).cast("int"))
      .withColumn("media", Multimodal.mp4Bytes(col("w"), col("h"), col("d")))
      .withColumn("m", expr("graft_media_meta(media)"))
      .select(col("w"), col("h"), col("d"), col("m.codec"),
        col("m.width"), col("m.height"), col("m.duration_ms"))
      .collect()
    mp4.foreach { r =>
      assert(r.getString(3) === "mp4")
      assert(r.getInt(4) === r.getInt(0))
      assert(r.getInt(5) === r.getInt(1))
      assert(r.getLong(6) === r.getInt(2).toLong) // timescale 1000
    }
    // null media -> null struct through the expression
    val n = Seq(1L).toDF("id")
      .withColumn("media", lit(null).cast("binary"))
      .selectExpr("graft_media_meta(media) AS m")
      .head
    assert(n.isNullAt(0))
  }

  test("fuzz: arbitrary and mutated bytes never throw — parse or refuse") {
    // a header parser faces untrusted bytes; the contract is total:
    // every input returns a Parsed or null, never an exception
    val rnd = new scala.util.Random(0xbeef) // fixed seed, deterministic
    (0 until 2000).foreach { _ =>
      val b = new Array[Byte](rnd.nextInt(64))
      rnd.nextBytes(b)
      MediaHeader.parse(b) // must not throw
    }
    // mutations of VALID fixtures (truncations + single-byte flips)
    val valid = Seq(
      hexBytes("89504E470D0A1A0A 0000000D 49484452 00000320 00000258 0806000000 00000000"),
      hexBytes("474946383961 4001 C800 F70000"),
      hexBytes("424D 00000000 00000000 36000000 28000000 00040000 00030000 0100 1800"),
      hexBytes("FFD8 FFE0 0010 4A46494600 0101 00 0001 0001 0000" +
        "FFC0 0011 08 01E0 0280 03 011100 021101 031101"),
      hexBytes("52494646 28000000 57415645 4C495354 04000000 494E464F" +
        "666D7420 10000000 0100 0200 44AC0000 00000000 0400 1000"),
      hexBytes(Ftyp + "000000D8 6D6F6F76" + MvhdV0 + TrakVideo))
    valid.foreach { v =>
      (0 to v.length).foreach(k => MediaHeader.parse(v.take(k)))
      (0 until 200).foreach { _ =>
        val m = v.clone()
        m(rnd.nextInt(m.length)) = rnd.nextInt(256).toByte
        MediaHeader.parse(m)
      }
    }
  }

  test("golden WAV: fmt chunk behind a skipped LIST; truncations refuse") {
    // RIFF/WAVE, LIST(4) first, then PCM fmt: 2 ch, 44100 Hz
    val wav = hexBytes("52494646 28000000 57415645" +
      "4C495354 04000000 494E464F" +
      "666D7420 10000000 0100 0200 44AC0000 00000000 0400 1000")
    assert(MediaHeader.parse(wav) ===
      MediaHeader.Parsed("wav", null, null, 44100, 2))
    // fmt directly at offset 12 (no leading chunk)
    assert(MediaHeader.parse(hexBytes(
      "52494646 24000000 57415645 666D7420 10000000 0100 0100 80BB0000" +
        "00000000 0200 1000")) ===
      MediaHeader.Parsed("wav", null, null, 48000, 1))
    // RIFF but not WAVE refuses; WAVE with no fmt chunk refuses;
    // truncated mid-fmt refuses
    assert(MediaHeader.parse(hexBytes("52494646 08000000 41564920")) === null)
    assert(MediaHeader.parse(hexBytes(
      "52494646 0C000000 57415645 64617461 00000000")) === null)
    assert(MediaHeader.parse(hexBytes(
      "52494646 24000000 57415645 666D7420 10000000 0100")) === null)
    // hostile declared chunk size near Int.MaxValue: must refuse, not
    // wrap the walk index negative and index out of bounds
    assert(MediaHeader.parse(hexBytes(
      "52494646 24000000 57415645 64617461 F0FFFF7F")) === null)
  }

  private val Mtx =
    "000100000000000000000000000000000001000000000000000000000000000040000000"
  private val Pred24 = "0" * 48
  // mvhd v0: timescale 600, duration 3000 ticks -> 5000 ms
  private val MvhdV0 = "0000006C 6D766864 00000000 00000000 00000000" +
    "00000258 00000BB8 00010000 0100 0000 0000000000000000" +
    Mtx + Pred24 + "00000002"
  // tkhd v0: 640x360 as 16.16 fixed point
  private val TkhdVideo = "0000005C 746B6864 00000007 00000000 00000000" +
    "00000001 00000000 00000000 0000000000000000 0000 0000 0000 0000" +
    Mtx + "02800000 01680000"
  private val TrakVideo = "00000064 7472616B" + TkhdVideo
  private val Ftyp = "00000010 66747970 69736F6D 00000000"

  test("golden MP4: ftyp + moov/mvhd/trak/tkhd box walk") {
    val mp4 = hexBytes(Ftyp + "000000D8 6D6F6F76" + MvhdV0 + TrakVideo)
    assert(MediaHeader.parse(mp4) ===
      MediaHeader.Parsed("mp4", 640, 360, null, null, 5000L))
    // version-1 mvhd: 64-bit duration at its shifted offsets
    // (timescale 90000, duration 90000 ticks -> 1000 ms)
    val mvhdV1 = "00000078 6D766864 01000000 0000000000000000" +
      "0000000000000000 00015F90 0000000000015F90 00010000 0100 0000" +
      "0000000000000000" + Mtx + Pred24 + "00000002"
    val mp4v1 = hexBytes(Ftyp + "000000E4 6D6F6F76" + mvhdV1 + TrakVideo)
    assert(MediaHeader.parse(mp4v1) ===
      MediaHeader.Parsed("mp4", 640, 360, null, null, 1000L))
    // 64-bit largesize moov (size field 1): same content, same answer
    val mp4big = hexBytes(Ftyp +
      "00000001 6D6F6F76 00000000000000E0" + MvhdV0 + TrakVideo)
    assert(MediaHeader.parse(mp4big) ===
      MediaHeader.Parsed("mp4", 640, 360, null, null, 5000L))
    // audio-only mp4: tkhd dims are zero -> null dims, duration kept
    val tkhdAudio = "0000005C 746B6864 00000007 00000000 00000000" +
      "00000001 00000000 00000000 0000000000000000 0000 0000 0100 0000" +
      Mtx + "00000000 00000000"
    val mp4audio = hexBytes(Ftyp + "000000D8 6D6F6F76" + MvhdV0 +
      "00000064 7472616B" + tkhdAudio)
    assert(MediaHeader.parse(mp4audio) ===
      MediaHeader.Parsed("mp4", null, null, null, null, 5000L))
  }

  test("MP4 refusals: truncation, hostile sizes, missing moov") {
    // ftyp alone: no moov in range
    assert(MediaHeader.parse(hexBytes(Ftyp)) === null)
    // moov truncated mid-mvhd
    assert(MediaHeader.parse(hexBytes(
      Ftyp + "000000D8 6D6F6F76 0000006C 6D766864 0000")) === null)
    // a child box size < 8 inside moov
    assert(MediaHeader.parse(hexBytes(
      Ftyp + "00000010 6D6F6F76 00000005 6D766864")) === null)
    // a declared box size past the buffer
    assert(MediaHeader.parse(hexBytes(
      Ftyp + "7FFFFFF0 6D6F6F76" + MvhdV0)) === null)
    // an UNDERSIZED mvhd (declared size 16: room for version+creation
    // only) must refuse — reading on would decode the next sibling's
    // bytes as timescale/duration
    assert(MediaHeader.parse(hexBytes(
      Ftyp + "0000007C 6D6F6F76 00000010 6D766864 00000000 00000000" +
        TrakVideo)) === null)
    // same rule for an undersized tkhd: dims must not come from bytes
    // past the box's own declared end
    assert(MediaHeader.parse(hexBytes(
      Ftyp + "0000008C 6D6F6F76" + MvhdV0 +
        "00000018 7472616B 00000010 746B6864 00000007 00000000")) === null)
    // timescale 0 is a semantic refusal: codec parses, duration null
    val zeroTs = MvhdV0.replace("00000258", "00000000")
    assert(MediaHeader.parse(hexBytes(
      Ftyp + "000000D8 6D6F6F76" + zeroTs + TrakVideo)) ===
      MediaHeader.Parsed("mp4", 640, 360, null, null, null))
  }

  test("multimodal_meta: every row's parsed metadata equals the constructed one") {
    val out = Multimodal.multimodalMeta(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val expectCodec = (id % 6) match {
        case 0 => "png"; case 1 => "gif"; case 2 => "bmp"; case 3 => "jpeg"
        case 4 => "wav"; case _ => "mp4"
      }
      assert(r.getAs[String]("codec") === expectCodec)
      if (expectCodec == "wav") {
        assert(r.isNullAt(r.fieldIndex("width")))
        assert(r.isNullAt(r.fieldIndex("height")))
        assert(r.getAs[Int]("sample_rate") === (id * 53) % 40000 + 8000)
        assert(r.getAs[Int]("channels") === id % 2 + 1)
        assert(r.isNullAt(r.fieldIndex("duration_ms")))
      } else {
        assert(r.getAs[Int]("width") === (id * 37) % 2000 + 16)
        assert(r.getAs[Int]("height") === (id * 91) % 1200 + 16)
        assert(r.isNullAt(r.fieldIndex("sample_rate")))
        assert(r.isNullAt(r.fieldIndex("channels")))
        if (expectCodec == "mp4")
          assert(r.getAs[Long]("duration_ms") === (id * 29) % 600000 + 1000)
        else assert(r.isNullAt(r.fieldIndex("duration_ms")))
      }
    }
    // all six modalities actually occur
    assert(out.map(_.getAs[String]("codec")).toSet ===
      Set("png", "gif", "bmp", "jpeg", "wav", "mp4"))
  }
}
