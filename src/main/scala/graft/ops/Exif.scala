package graft.ops

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions.col

/** JPEG EXIF metadata — the camera/provenance facts an image-corpus
  * filter keys on (orientation fix-up, capture time, device family,
  * resolution checks) without decoding a single pixel.
  *
  * EXIF is a TIFF IFD tree embedded in a JPEG APP1 segment
  * (`Exif\0\0` + TIFF header); this walker parses IFD0 (Make, Model,
  * Orientation, DateTime, ExifIFD pointer) and the Exif sub-IFD
  * (ExposureTime, FNumber, ISO, FocalLength, PixelX/YDimension),
  * both endiannesses, values inline or offset per TIFF rules. It
  * runs partition-local at scan time (bounded work: segment walk
  * stops at SOS, so only the metadata prefix of each blob is ever
  * touched — the scan never reads entropy-coded data).
  *
  * Posture: a JPEG without an Exif APP1 returns None (absence is
  * normal in a crawl); an APP1 that CLAIMS Exif but is structurally
  * broken refuses loudly (truncated IFD, bad byte-order mark) — the
  * binary-container rule, unlike tag-soup HTML.
  */
object Exif {

  final case class ExifMeta(
      make: String, model: String, orientation: Int, date_time: String,
      exposure_num: Long, exposure_den: Long,
      fnumber_num: Long, fnumber_den: Long,
      iso: Int, focal_num: Long, focal_den: Long,
      pixel_x: Long, pixel_y: Long)

  private val TMake = 0x010F
  private val TModel = 0x0110
  private val TOrient = 0x0112
  private val TDateTime = 0x0132
  private val TExifPtr = 0x8769
  private val TExposure = 0x829A
  private val TFNumber = 0x829D
  private val TIso = 0x8827
  private val TFocal = 0x920A
  private val TPixelX = 0xA002
  private val TPixelY = 0xA003

  /** Find the Exif APP1 payload (after `Exif\0\0`) in a JPEG, walking
    * marker segments until SOS/EOI. None when absent.
    */
  def findExifApp1(jpeg: Array[Byte]): Option[Array[Byte]] = {
    require(jpeg.length >= 2 && (jpeg(0) & 0xff) == 0xFF && (jpeg(1) & 0xff) == 0xD8,
      "not a JPEG (missing SOI)")
    var i = 2
    while (i + 4 <= jpeg.length) {
      require((jpeg(i) & 0xff) == 0xFF, f"bad JPEG marker at $i: 0x${jpeg(i) & 0xff}%02x")
      val marker = jpeg(i + 1) & 0xff
      if (marker == 0xD9 || marker == 0xDA) return None // EOI / SOS: no EXIF
      val len = ((jpeg(i + 2) & 0xff) << 8) | (jpeg(i + 3) & 0xff)
      require(len >= 2 && i + 2 + len <= jpeg.length,
        s"truncated JPEG segment at $i (len $len)")
      if (marker == 0xE1 && len >= 8 &&
        new String(jpeg, i + 4, 4, "US-ASCII") == "Exif" &&
        jpeg(i + 8) == 0 && jpeg(i + 9) == 0)
        return Some(jpeg.slice(i + 10, i + 2 + len))
      i += 2 + len
    }
    None
  }

  /** Parse the TIFF structure of an Exif APP1 payload. */
  def parseTiff(t: Array[Byte]): ExifMeta = {
    require(t.length >= 8, "EXIF TIFF header truncated")
    val order = new String(t, 0, 2, "US-ASCII") match {
      case "II" => ByteOrder.LITTLE_ENDIAN
      case "MM" => ByteOrder.BIG_ENDIAN
      case bom => throw new IllegalArgumentException(s"bad TIFF byte-order mark '$bom'")
    }
    val bb = ByteBuffer.wrap(t).order(order)
    def u16(off: Int): Int = bb.getShort(off) & 0xFFFF
    def u32(off: Int): Long = bb.getInt(off) & 0xFFFFFFFFL
    require(u16(2) == 42, s"bad TIFF magic ${u16(2)}")

    final case class Entry(tag: Int, typ: Int, count: Long, valOff: Int)
    def ifdEntries(ifdOff: Long): Seq[Entry] = {
      require(ifdOff + 2 <= t.length, s"IFD offset $ifdOff beyond EXIF payload")
      val n = u16(ifdOff.toInt)
      require(ifdOff + 2 + 12L * n + 4 <= t.length, s"IFD at $ifdOff truncated ($n entries)")
      (0 until n).map { k =>
        val e = ifdOff.toInt + 2 + 12 * k
        Entry(u16(e), u16(e + 2), u32(e + 4), e + 8)
      }
    }
    def typeSize(typ: Int): Int = typ match {
      case 1 | 2 | 7 => 1; case 3 => 2; case 4 | 9 => 4; case 5 | 10 => 8
      case x => throw new IllegalArgumentException(s"unsupported EXIF type $x")
    }
    def dataOff(e: Entry, need: Long): Int = {
      // a >= 2^31 offset or count would wrap negative in toInt and
      // walk the String/ByteBuffer reads out of bounds UNCONTROLLED —
      // bound BOTH as Longs first (refuse-loudly contract,
      // CrawlFuzzSpec; `need` comes from the unsigned 32-bit count)
      require(need >= 0 && need <= t.length,
        s"tag 0x${e.tag.toHexString}: value size $need outside EXIF payload")
      val bytes = typeSize(e.typ) * e.count
      val off = if (bytes <= 4) e.valOff.toLong else u32(e.valOff)
      require(off >= 0 && off + need <= t.length,
        s"tag 0x${e.tag.toHexString}: value offset $off (+$need) outside EXIF payload")
      off.toInt
    }
    def ascii(e: Entry): String = {
      require(e.typ == 2, s"tag 0x${e.tag.toHexString} not ASCII (type ${e.typ})")
      val off = dataOff(e, e.count) // count stays Long until bounded
      val len = e.count.toInt
      val raw = new String(t, off, len, "US-ASCII")
      if (raw.nonEmpty && raw.last == '\u0000') raw.init else raw
    }
    def short(e: Entry): Int = { require(e.typ == 3); u16(dataOff(e, 2)) }
    def long32(e: Entry): Long = e.typ match {
      case 3 => short(e).toLong
      case 4 => u32(dataOff(e, 4))
      case x => throw new IllegalArgumentException(
        s"tag 0x${e.tag.toHexString}: expected SHORT/LONG, got type $x")
    }
    def rational(e: Entry): (Long, Long) = {
      require(e.typ == 5, s"tag 0x${e.tag.toHexString} not RATIONAL (type ${e.typ})")
      val off = dataOff(e, 8)
      (u32(off), u32(off + 4))
    }

    val ifd0 = ifdEntries(u32(4)).map(e => e.tag -> e).toMap
    val sub = ifd0.get(TExifPtr)
      .map(p => ifdEntries(long32(p)).map(e => e.tag -> e).toMap)
      .getOrElse(Map.empty)
    def str(m: Map[Int, _ <: Any], tag: Int): String =
      m.asInstanceOf[Map[Int, Entry]].get(tag).map(ascii).getOrElse("")
    def rat(tag: Int): (Long, Long) = sub.get(tag).map(rational).getOrElse((0L, 1L))

    val (en, ed) = rat(TExposure)
    val (fn, fd) = rat(TFNumber)
    val (cn, cd) = rat(TFocal)
    ExifMeta(
      make = str(ifd0, TMake), model = str(ifd0, TModel),
      orientation = ifd0.get(TOrient).map(short).getOrElse(1),
      date_time = str(ifd0, TDateTime),
      exposure_num = en, exposure_den = ed,
      fnumber_num = fn, fnumber_den = fd,
      iso = sub.get(TIso).map(short).getOrElse(0),
      focal_num = cn, focal_den = cd,
      pixel_x = sub.get(TPixelX).map(long32).getOrElse(0L),
      pixel_y = sub.get(TPixelY).map(long32).getOrElse(0L))
  }

  /** EXIF of one JPEG; None when the JPEG carries no Exif APP1. */
  def parseJpeg(jpeg: Array[Byte]): Option[ExifMeta] =
    findExifApp1(jpeg).map(parseTiff)

  /** Distributed EXIF extraction over (doc_id, media); JPEGs without
    * EXIF drop out (filter on the Option, the crawl norm).
    */
  def extract(spark: SparkSession, media: DataFrame): Dataset[(Long, ExifMeta)] = {
    import spark.implicits._
    media.select(col("doc_id"), col("media")).as[(Long, Array[Byte])]
      .flatMap { case (id, payload) => parseJpeg(payload).map(id -> _) }
  }

  // ---- encoder (fixtures + EXIF-stamping writer) ----

  /** Encode `meta` as a full Exif APP1 segment (FFE1 + length +
    * `Exif\0\0` + TIFF), little- or big-endian.
    */
  def encodeApp1(meta: ExifMeta, littleEndian: Boolean): Array[Byte] = {
    val order = if (littleEndian) ByteOrder.LITTLE_ENDIAN else ByteOrder.BIG_ENDIAN
    // layout: header(8) | IFD0(2 + 5*12 + 4) | Exif sub-IFD(2 + 6*12 + 4) | heap
    val ifd0Off = 8
    val subOff = ifd0Off + 2 + 5 * 12 + 4
    val heapStart = subOff + 2 + 6 * 12 + 4
    val heap = new java.io.ByteArrayOutputStream()
    def heapPut(bytes: Array[Byte]): Int = {
      val off = heapStart + heap.size(); heap.write(bytes); off
    }
    def asciiBytes(s: String): Array[Byte] = (s + "\u0000").getBytes("US-ASCII")
    def ratBytes(num: Long, den: Long): Array[Byte] = {
      val b = ByteBuffer.allocate(8).order(order)
      b.putInt(num.toInt); b.putInt(den.toInt); b.array()
    }

    final case class E(tag: Int, typ: Int, count: Long, inline: Option[Array[Byte]],
        heapOff: Option[Int])
    def entryAscii(tag: Int, s: String): E = {
      val b = asciiBytes(s)
      if (b.length <= 4) E(tag, 2, b.length, Some(b.padTo(4, 0.toByte)), None)
      else E(tag, 2, b.length, None, Some(heapPut(b)))
    }
    def entryShort(tag: Int, v: Int): E = {
      val b = ByteBuffer.allocate(4).order(order)
      b.putShort(v.toShort)
      E(tag, 3, 1, Some(b.array()), None)
    }
    def entryLong(tag: Int, v: Long): E = {
      val b = ByteBuffer.allocate(4).order(order)
      b.putInt(v.toInt)
      E(tag, 4, 1, Some(b.array()), None)
    }
    def entryRat(tag: Int, num: Long, den: Long): E =
      E(tag, 5, 1, None, Some(heapPut(ratBytes(num, den))))

    // IMPORTANT: heap writes happen in entry-construction order below
    val ifd0 = Seq(
      entryAscii(TMake, meta.make),
      entryAscii(TModel, meta.model),
      entryShort(TOrient, meta.orientation),
      entryAscii(TDateTime, meta.date_time),
      entryLong(TExifPtr, subOff.toLong)).sortBy(_.tag)
    val sub = Seq(
      entryRat(TExposure, meta.exposure_num, meta.exposure_den),
      entryRat(TFNumber, meta.fnumber_num, meta.fnumber_den),
      entryShort(TIso, meta.iso),
      entryRat(TFocal, meta.focal_num, meta.focal_den),
      entryLong(TPixelX, meta.pixel_x),
      entryLong(TPixelY, meta.pixel_y)).sortBy(_.tag)

    val tiff = ByteBuffer.allocate(heapStart + heap.size()).order(order)
    tiff.put((if (littleEndian) "II" else "MM").getBytes("US-ASCII"))
    tiff.putShort(42).putInt(ifd0Off)
    def writeIfd(entries: Seq[E]): Unit = {
      tiff.putShort(entries.length.toShort)
      entries.foreach { e =>
        tiff.putShort(e.tag.toShort).putShort(e.typ.toShort).putInt(e.count.toInt)
        e.inline match {
          case Some(b) => tiff.put(b)
          case None => tiff.putInt(e.heapOff.get)
        }
      }
      tiff.putInt(0) // no next IFD
    }
    writeIfd(ifd0)
    writeIfd(sub)
    tiff.put(heap.toByteArray)

    val payload = "Exif\u0000\u0000".getBytes("US-ASCII") ++ tiff.array()
    val segLen = payload.length + 2
    Array(0xFF.toByte, 0xE1.toByte,
      ((segLen >> 8) & 0xff).toByte, (segLen & 0xff).toByte) ++ payload
  }

  /** Insert an Exif APP1 into an existing JPEG, right after SOI. */
  def stampJpeg(jpeg: Array[Byte], meta: ExifMeta, littleEndian: Boolean): Array[Byte] = {
    require(jpeg.length >= 2 && (jpeg(0) & 0xff) == 0xFF && (jpeg(1) & 0xff) == 0xD8,
      "not a JPEG (missing SOI)")
    jpeg.take(2) ++ encodeApp1(meta, littleEndian) ++ jpeg.drop(2)
  }
}
