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
        "666D7420 10000000 0100 0200 44AC0000 00000000 0400 1000"))
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

  test("multimodal_meta: every row's parsed metadata equals the constructed one") {
    val out = Multimodal.multimodalMeta(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val expectCodec = (id % 5) match {
        case 0 => "png"; case 1 => "gif"; case 2 => "bmp"; case 3 => "jpeg"
        case _ => "wav"
      }
      assert(r.getAs[String]("codec") === expectCodec)
      if (expectCodec == "wav") {
        assert(r.isNullAt(r.fieldIndex("width")))
        assert(r.isNullAt(r.fieldIndex("height")))
        assert(r.getAs[Int]("sample_rate") === (id * 53) % 40000 + 8000)
        assert(r.getAs[Int]("channels") === id % 2 + 1)
      } else {
        assert(r.getAs[Int]("width") === (id * 37) % 2000 + 16)
        assert(r.getAs[Int]("height") === (id * 91) % 1200 + 16)
        assert(r.isNullAt(r.fieldIndex("sample_rate")))
        assert(r.isNullAt(r.fieldIndex("channels")))
      }
    }
    // all five modalities actually occur
    assert(out.map(_.getAs[String]("codec")).toSet ===
      Set("png", "gif", "bmp", "jpeg", "wav"))
  }
}
