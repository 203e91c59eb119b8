package graft.meta

import java.nio.{ByteBuffer, ByteOrder}
import scala.collection.immutable.VectorBuilder

/** Minimal CBOR (RFC 8949) codec for the itk-wasm `.iwi.cbor` image
  * container (S10 — the reference routes `.iwi.cbor`/`.iwi.cbor.zst`
  * through itkwasm_image_io, `py/ngff_zarr/detect_cli_io_backend.py:45-46`).
  *
  * Scope: every major type (unsigned/negative ints, byte/text
  * strings, arrays, maps, tags, simples, half/single/double floats),
  * definite AND indefinite lengths on read; the encoder always emits
  * definite lengths with shortest-form integer heads (the RFC 8949
  * §4.2.1 core-deterministic argument encoding). Integers beyond the
  * signed 64-bit range refuse loudly rather than wrap — nothing in an
  * image container legitimately exceeds 2^63-1.
  *
  * RFC 8746 typed arrays ride on [[CTag]]: the tag numbers and the
  * element layout rules live in [[graft.operators.IwiIO]]; this layer
  * only transports (tag, byte-string) faithfully.
  */
object Cbor {

  sealed trait Value
  /** Majors 0/1. Negative values are major 1 (`-1 - n`). */
  final case class CInt(v: Long) extends Value
  final case class CBytes(v: Array[Byte]) extends Value
  final case class CText(v: String) extends Value
  final case class CArray(v: Vector[Value]) extends Value
  /** Entry order preserved — itk-wasm writes fixed key order and the
    * round-trip specs assert byte equality.
    */
  final case class CMap(v: Vector[(Value, Value)]) extends Value {
    def get(key: String): Option[Value] =
      v.collectFirst { case (CText(`key`), value) => value }
  }
  final case class CTag(tag: Long, v: Value) extends Value
  /** A definite-length byte string left IN PLACE: `offset`/`length`
    * into the decoded buffer (see [[decodeWithRefs]]). Lets a reader
    * plan a distributed positioned-read of a multi-hundred-MB voxel
    * payload instead of copying it through the driver heap.
    */
  final case class CBytesRef(offset: Int, length: Int) extends Value
  final case class CBool(v: Boolean) extends Value
  case object CNull extends Value
  case object CUndefined extends Value
  /** Simple values other than false/true/null/undefined. */
  final case class CSimple(v: Int) extends Value
  final case class CFloat(v: Double) extends Value

  // ------------------------------------------------------------ decode

  def decode(bytes: Array[Byte]): Value = decodeWithRefs(bytes, Int.MaxValue)

  /** Like [[decode]], but definite-length byte strings of at least
    * `refMin` bytes come back as [[CBytesRef]] (offset into `bytes`)
    * instead of a copied [[CBytes]]. Indefinite-length byte strings
    * always materialize (their chunks aren't contiguous).
    */
  def decodeWithRefs(bytes: Array[Byte], refMin: Int): Value = {
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.BIG_ENDIAN)
    val v = decodeItem(bb, refMin)
    require(!bb.hasRemaining, s"${bb.remaining()} trailing bytes after CBOR item")
    v
  }

  /** Argument of a head byte: the count/length/value field. Returns
    * -1 for the indefinite-length marker (additional info 31).
    */
  private def argument(bb: ByteBuffer, ib: Int): Long = {
    val ai = ib & 0x1f
    ai match {
      case n if n < 24 => n.toLong
      case 24 => bb.get() & 0xffL
      case 25 => bb.getShort() & 0xffffL
      case 26 => bb.getInt() & 0xffffffffL
      case 27 =>
        val v = bb.getLong()
        require(v >= 0, s"CBOR 64-bit argument ${java.lang.Long.toUnsignedString(v)} exceeds the signed-long range")
        v
      case 31 => -1L
      case other => throw new IllegalArgumentException(s"reserved CBOR additional info $other")
    }
  }

  private def decodeItem(bb: ByteBuffer, refMin: Int): Value = {
    val ib = bb.get() & 0xff
    val major = ib >> 5
    major match {
      case 0 => CInt(argumentDefinite(bb, ib, "unsigned int"))
      case 1 =>
        // -1-n maps [0, 2^63-1] onto [-2^63, -1]: always representable
        CInt(-1L - argumentDefinite(bb, ib, "negative int"))
      case 2 =>
        val len = argument(bb, ib)
        if (len >= refMin) { // definite, large: leave in place
          require(len <= bb.remaining(),
            s"CBOR byte string length $len exceeds remaining ${bb.remaining()} bytes")
          val off = bb.position()
          bb.position(off + len.toInt)
          CBytesRef(off, len.toInt)
        } else CBytes(decodeStringBody(bb, ib, major, len))
      case 3 => CText(new String(decodeStringBody(bb, ib, major, argument(bb, ib)), "UTF-8"))
      case 4 =>
        val len = argument(bb, ib)
        val out = new VectorBuilder[Value]
        if (len < 0) { // indefinite
          while (!atBreak(bb)) out += decodeItem(bb, refMin)
          skipBreak(bb)
        } else {
          var i = 0L
          while (i < len) { out += decodeItem(bb, refMin); i += 1 }
        }
        CArray(out.result())
      case 5 =>
        val len = argument(bb, ib)
        val out = new VectorBuilder[(Value, Value)]
        if (len < 0) {
          while (!atBreak(bb)) out += ((decodeItem(bb, refMin), decodeItem(bb, refMin)))
          skipBreak(bb)
        } else {
          var i = 0L
          while (i < len) { out += ((decodeItem(bb, refMin), decodeItem(bb, refMin))); i += 1 }
        }
        CMap(out.result())
      case 6 => CTag(argumentDefinite(bb, ib, "tag"), decodeItem(bb, refMin))
      case 7 =>
        (ib & 0x1f) match {
          case 20 => CBool(false)
          case 21 => CBool(true)
          case 22 => CNull
          case 23 => CUndefined
          case 24 =>
            val v = bb.get() & 0xff
            require(v >= 32, s"two-byte simple value $v in the one-byte range (RFC 8949 §3.3)")
            CSimple(v)
          case 25 => CFloat(halfToDouble(bb.getShort() & 0xffff))
          case 26 => CFloat(bb.getFloat().toDouble)
          case 27 => CFloat(bb.getDouble())
          case 31 => throw new IllegalArgumentException("unexpected CBOR break outside indefinite item")
          case n if n < 20 => CSimple(n)
          case other => throw new IllegalArgumentException(s"reserved CBOR simple/float info $other")
        }
    }
  }

  private def argumentDefinite(bb: ByteBuffer, ib: Int, what: String): Long = {
    val a = argument(bb, ib)
    require(a >= 0, s"indefinite length not allowed for $what")
    a
  }

  /** Byte/text string body; indefinite form concatenates definite
    * chunks of the SAME major type (RFC 8949 §3.2.3).
    */
  private def decodeStringBody(bb: ByteBuffer, ib: Int, major: Int, len: Long): Array[Byte] = {
    if (len >= 0) takeBytes(bb, len)
    else {
      val out = new java.io.ByteArrayOutputStream()
      while (!atBreak(bb)) {
        val cb = bb.get() & 0xff
        require(cb >> 5 == major, s"indefinite string chunk has major ${cb >> 5}, want $major")
        val clen = argument(bb, cb)
        require(clen >= 0, "nested indefinite string chunk")
        out.write(takeBytes(bb, clen))
      }
      skipBreak(bb)
      out.toByteArray
    }
  }

  private def takeBytes(bb: ByteBuffer, len: Long): Array[Byte] = {
    require(len <= Int.MaxValue && len <= bb.remaining(),
      s"CBOR string length $len exceeds remaining ${bb.remaining()} bytes")
    val a = new Array[Byte](len.toInt)
    bb.get(a)
    a
  }

  private def atBreak(bb: ByteBuffer): Boolean = {
    require(bb.hasRemaining, "truncated CBOR: unterminated indefinite item")
    (bb.get(bb.position()) & 0xff) == 0xff
  }
  private def skipBreak(bb: ByteBuffer): Unit = bb.get()

  /** IEEE 754 binary16 → double, bit-exact (subnormals, ±Inf, NaN). */
  def halfToDouble(h: Int): Double = {
    val sign = if ((h & 0x8000) != 0) -1.0 else 1.0
    val exp = (h >> 10) & 0x1f
    val frac = h & 0x3ff
    if (exp == 0) sign * frac * math.pow(2, -24)
    else if (exp != 31) sign * (frac + 1024) * math.pow(2, exp - 25)
    else if (frac == 0) sign * Double.PositiveInfinity
    else Double.NaN
  }

  // ------------------------------------------------------------ encode

  def encode(v: Value): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    encodeItem(v, out)
    out.toByteArray
  }

  private def head(major: Int, arg: Long, out: java.io.ByteArrayOutputStream): Unit = {
    require(arg >= 0, "negative CBOR argument")
    val m = major << 5
    if (arg < 24) out.write(m | arg.toInt)
    else if (arg < 256) { out.write(m | 24); out.write(arg.toInt) }
    else if (arg < 65536) {
      out.write(m | 25); out.write((arg >> 8).toInt); out.write((arg & 0xff).toInt)
    } else if (arg < 0x100000000L) {
      out.write(m | 26)
      var s = 24; while (s >= 0) { out.write(((arg >> s) & 0xff).toInt); s -= 8 }
    } else {
      out.write(m | 27)
      var s = 56; while (s >= 0) { out.write(((arg >> s) & 0xff).toInt); s -= 8 }
    }
  }

  private def encodeItem(v: Value, out: java.io.ByteArrayOutputStream): Unit = v match {
    case CInt(n) if n >= 0 => head(0, n, out)
    case CInt(n) => head(1, -1L - n, out)
    case CBytes(b) => head(2, b.length, out); out.write(b)
    case CText(s) =>
      val b = s.getBytes("UTF-8"); head(3, b.length, out); out.write(b)
    case CArray(items) => head(4, items.length, out); items.foreach(encodeItem(_, out))
    case CMap(entries) =>
      head(5, entries.length, out)
      entries.foreach { case (k, value) => encodeItem(k, out); encodeItem(value, out) }
    case CTag(t, inner) => head(6, t, out); encodeItem(inner, out)
    case CBytesRef(_, _) =>
      throw new IllegalArgumentException("CBytesRef is a read-side view, not encodable")
    case CBool(false) => out.write(0xf4)
    case CBool(true) => out.write(0xf5)
    case CNull => out.write(0xf6)
    case CUndefined => out.write(0xf7)
    case CSimple(n) =>
      require(n >= 0 && n < 256 && (n < 24 || n >= 32), s"unencodable simple value $n")
      if (n < 24) out.write(0xe0 | n) else { out.write(0xf8); out.write(n) }
    case CFloat(d) =>
      // shortest float that round-trips the value (RFC 8949 §4.2.2
      // preferred serialization): f64 → f32 when lossless; half only
      // for the values the itkwasm containers never carry, so we stop
      // at f32 to keep the encoder simple and deterministic.
      val f = d.toFloat
      if (f.toDouble == d || d.isNaN) {
        out.write(0xfa)
        val bits = java.lang.Float.floatToIntBits(if (d.isNaN) Float.NaN else f)
        var s = 24; while (s >= 0) { out.write((bits >> s) & 0xff); s -= 8 }
      } else {
        out.write(0xfb)
        val bits = java.lang.Double.doubleToLongBits(d)
        var s = 56; while (s >= 0) { out.write(((bits >> s) & 0xff).toInt); s -= 8 }
      }
  }
}
