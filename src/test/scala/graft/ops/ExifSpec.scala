package graft.ops

import graft.SparkSpec

class ExifSpec extends SparkSpec {

  private val meta = Exif.ExifMeta(
    make = "CamCo", model = "X100", orientation = 6,
    date_time = "2026:08:14 12:34:56",
    exposure_num = 1, exposure_den = 125,
    fnumber_num = 28, fnumber_den = 10,
    iso = 400, focal_num = 50, focal_den = 1,
    pixel_x = 16, pixel_y = 16)

  private def realJpeg(): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(16, 16,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    bos.toByteArray
  }

  test("APP1 round-trips in both endiannesses") {
    for (le <- Seq(true, false)) {
      val app1 = Exif.encodeApp1(meta, le)
      assert((app1(0) & 0xff) === 0xFF && (app1(1) & 0xff) === 0xE1)
      val tiff = app1.drop(10) // FFE1 + len(2) + "Exif\0\0"
      assert(Exif.parseTiff(tiff) === meta, s"littleEndian=$le")
    }
  }

  test("inline (<=4 byte) ASCII values round-trip too") {
    val m = meta.copy(make = "AB", model = "C") // 3 and 2 bytes with NUL
    for (le <- Seq(true, false))
      assert(Exif.parseTiff(Exif.encodeApp1(m, le).drop(10)) === m)
  }

  test("stamped JPEG parses back AND still decodes as an image") {
    val stamped = Exif.stampJpeg(realJpeg(), meta, littleEndian = true)
    assert(Exif.parseJpeg(stamped) === Some(meta))
    val img = Multimodal.decodeImage(stamped) // APP1 must not break decode
    assert(img.width === 16 && img.height === 16)
  }

  test("a JPEG without EXIF yields None; non-JPEG refuses") {
    assert(Exif.parseJpeg(realJpeg()) === None)
    intercept[IllegalArgumentException] {
      Exif.parseJpeg("not a jpeg".getBytes("US-ASCII"))
    }
  }

  test("structurally broken EXIF refuses loudly") {
    val badBom = "XXabcdef".getBytes("US-ASCII")
    intercept[IllegalArgumentException] { Exif.parseTiff(badBom) }
    val good = Exif.encodeApp1(meta, littleEndian = true).drop(10)
    intercept[IllegalArgumentException] { Exif.parseTiff(good.take(20)) } // truncated IFD
  }

  test("distributed extract drops EXIF-less blobs") {
    import spark.implicits._
    val media = Seq(
      (1L, Exif.stampJpeg(realJpeg(), meta, littleEndian = false)),
      (2L, realJpeg())).toDF("doc_id", "media")
    val got = Exif.extract(spark, media).collect()
    assert(got.toSeq === Seq((1L, meta)))
  }
}
