package graft.meta

import org.scalatest.funsuite.AnyFunSuite
import Cbor._

/** Decoder ground truth is RFC 8949 Appendix A's published test
  * vectors (hex → diagnostic value); the encoder is checked as the
  * exact inverse on the vectors whose serialization matches our
  * deterministic choices (shortest int heads, definite lengths,
  * f32-when-lossless floats), plus structural round-trips.
  */
class CborSpec extends AnyFunSuite {

  private def hex(s: String): Array[Byte] =
    s.replaceAll("\\s", "").grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  private def dec(s: String): Value = Cbor.decode(hex(s))
  private def enc(v: Value): String =
    Cbor.encode(v).map(b => f"${b & 0xff}%02x").mkString

  // --- Appendix A: integers ------------------------------------------

  test("appendix A unsigned integers") {
    assert(dec("00") == CInt(0))
    assert(dec("01") == CInt(1))
    assert(dec("0a") == CInt(10))
    assert(dec("17") == CInt(23))
    assert(dec("1818") == CInt(24))
    assert(dec("1819") == CInt(25))
    assert(dec("1864") == CInt(100))
    assert(dec("1903e8") == CInt(1000))
    assert(dec("1a000f4240") == CInt(1000000))
    assert(dec("1b000000e8d4a51000") == CInt(1000000000000L))
    assert(dec("1b7fffffffffffffff") == CInt(Long.MaxValue))
  }

  test("18446744073709551615 (max uint64) refuses loudly") {
    val e = intercept[IllegalArgumentException](dec("1bffffffffffffffff"))
    assert(e.getMessage.contains("exceeds the signed-long range"))
  }

  test("appendix A negative integers") {
    assert(dec("20") == CInt(-1))
    assert(dec("29") == CInt(-10))
    assert(dec("3863") == CInt(-100))
    assert(dec("3903e7") == CInt(-1000))
    assert(dec("3b7fffffffffffffff") == CInt(Long.MinValue))
    // -18446744073709551616 (appendix A's 3bffffffffffffffff) is
    // below Long.MinValue: refuses like the uint64 ceiling does
    intercept[IllegalArgumentException](dec("3bffffffffffffffff"))
  }

  test("appendix A floats (half, single, double)") {
    assert(dec("f90000") == CFloat(0.0))
    assert(dec("f98000") == CFloat(-0.0))
    assert(dec("f93c00") == CFloat(1.0))
    assert(dec("fb3ff199999999999a") == CFloat(1.1))
    assert(dec("f93e00") == CFloat(1.5))
    assert(dec("f97bff") == CFloat(65504.0))
    assert(dec("fa47c35000") == CFloat(100000.0))
    assert(dec("fa7f7fffff") == CFloat(3.4028234663852886e38))
    assert(dec("fb7e37e43c8800759c") == CFloat(1.0e300))
    assert(dec("f90001") == CFloat(5.960464477539063e-8))
    assert(dec("f90400") == CFloat(6.103515625e-5))
    assert(dec("f9c400") == CFloat(-4.0))
    assert(dec("fbc010666666666666") == CFloat(-4.1))
    assert(dec("f97c00") == CFloat(Double.PositiveInfinity))
    assert(dec("f9fc00") == CFloat(Double.NegativeInfinity))
    assert(dec("f97e00").asInstanceOf[CFloat].v.isNaN)
    assert(dec("fa7f800000") == CFloat(Double.PositiveInfinity))
    assert(dec("fb7ff0000000000000") == CFloat(Double.PositiveInfinity))
  }

  test("appendix A simples") {
    assert(dec("f4") == CBool(false))
    assert(dec("f5") == CBool(true))
    assert(dec("f6") == CNull)
    assert(dec("f7") == CUndefined)
    assert(dec("f0") == CSimple(16))
    assert(dec("f8ff") == CSimple(255))
  }

  test("appendix A strings") {
    assert(dec("40").asInstanceOf[CBytes].v.isEmpty)
    assert(dec("4401020304").asInstanceOf[CBytes].v.toSeq == Seq[Byte](1, 2, 3, 4))
    assert(dec("60") == CText(""))
    assert(dec("6161") == CText("a"))
    assert(dec("6449455446") == CText("IETF"))
    assert(dec("62225c") == CText("\"\\"))
    assert(dec("62c3bc") == CText("ü"))
    assert(dec("63e6b0b4") == CText("水"))
  }

  test("appendix A arrays and maps") {
    assert(dec("80") == CArray(Vector.empty))
    assert(dec("83010203") == CArray(Vector(CInt(1), CInt(2), CInt(3))))
    assert(dec("8301820203820405") == CArray(Vector(
      CInt(1), CArray(Vector(CInt(2), CInt(3))), CArray(Vector(CInt(4), CInt(5))))))
    assert(dec("98190102030405060708090a0b0c0d0e0f101112131415161718181819") ==
      CArray((1 to 25).map(i => CInt(i)).toVector))
    assert(dec("a0") == CMap(Vector.empty))
    assert(dec("a201020304") == CMap(Vector(CInt(1) -> CInt(2), CInt(3) -> CInt(4))))
    assert(dec("a26161016162820203") == CMap(Vector(
      CText("a") -> CInt(1), CText("b") -> CArray(Vector(CInt(2), CInt(3))))))
    assert(dec("826161a161626163") == CArray(Vector(
      CText("a"), CMap(Vector(CText("b") -> CText("c"))))))
  }

  test("appendix A tags") {
    assert(dec("c074323031332d30332d32315432303a30343a30305a") ==
      CTag(0, CText("2013-03-21T20:04:00Z")))
    assert(dec("c11a514b67b0") == CTag(1, CInt(1363896240)))
    assert(dec("d74401020304").asInstanceOf[CTag].tag == 23)
    assert(dec("d818456449455446").asInstanceOf[CTag].tag == 24)
  }

  test("appendix A indefinite lengths") {
    assert(dec("5f42010243030405ff").asInstanceOf[CBytes].v.toSeq ==
      Seq[Byte](1, 2, 3, 4, 5))
    assert(dec("7f657374726561646d696e67ff") == CText("streaming"))
    assert(dec("9fff") == CArray(Vector.empty))
    assert(dec("9f018202039f0405ffff") == CArray(Vector(
      CInt(1), CArray(Vector(CInt(2), CInt(3))), CArray(Vector(CInt(4), CInt(5))))))
    assert(dec("9f01820203820405ff") == CArray(Vector(
      CInt(1), CArray(Vector(CInt(2), CInt(3))), CArray(Vector(CInt(4), CInt(5))))))
    assert(dec("83018202039f0405ff") == CArray(Vector(
      CInt(1), CArray(Vector(CInt(2), CInt(3))), CArray(Vector(CInt(4), CInt(5))))))
    assert(dec("9f0102030405060708090a0b0c0d0e0f101112131415161718181819ff") ==
      CArray((1 to 25).map(i => CInt(i)).toVector))
    assert(dec("bf61610161629f0203ffff") == CMap(Vector(
      CText("a") -> CInt(1), CText("b") -> CArray(Vector(CInt(2), CInt(3))))))
    assert(dec("826161bf61626163ff") == CArray(Vector(
      CText("a"), CMap(Vector(CText("b") -> CText("c"))))))
    assert(dec("bf6346756ef563416d7421ff") == CMap(Vector(
      CText("Fun") -> CBool(true), CText("Amt") -> CInt(-2))))
  }

  // --- encoder: exact inverse on deterministic-form vectors -----------

  test("encoder produces the appendix-A bytes for shortest-form items") {
    assert(enc(CInt(0)) == "00")
    assert(enc(CInt(23)) == "17")
    assert(enc(CInt(24)) == "1818")
    assert(enc(CInt(1000)) == "1903e8")
    assert(enc(CInt(1000000)) == "1a000f4240")
    assert(enc(CInt(1000000000000L)) == "1b000000e8d4a51000")
    assert(enc(CInt(-1)) == "20")
    assert(enc(CInt(-1000)) == "3903e7")
    assert(enc(CText("IETF")) == "6449455446")
    assert(enc(CArray(Vector(CInt(1), CInt(2), CInt(3)))) == "83010203")
    assert(enc(CMap(Vector(CText("a") -> CInt(1), CText("b") -> CArray(Vector(CInt(2), CInt(3)))))) ==
      "a26161016162820203")
    assert(enc(CTag(1, CInt(1363896240))) == "c11a514b67b0")
    assert(enc(CBool(true)) == "f5")
    assert(enc(CNull) == "f6")
    assert(enc(CFloat(100000.0)) == "fa47c35000")
    assert(enc(CFloat(1.1)) == "fb3ff199999999999a")
    assert(enc(CFloat(-4.1)) == "fbc010666666666666")
  }

  test("round-trip: decode(encode(v)) == v on a nested structure") {
    val v = CMap(Vector(
      CText("imageType") -> CMap(Vector(
        CText("dimension") -> CInt(3),
        CText("componentType") -> CText("uint16"),
        CText("pixelType") -> CText("Scalar"),
        CText("components") -> CInt(1))),
      CText("origin") -> CArray(Vector(CFloat(0.5), CFloat(-1.25), CFloat(3.0))),
      CText("data") -> CTag(69, CBytes(Array[Byte](1, 0, 2, 0, 3, 0)))))
    val back = Cbor.decode(Cbor.encode(v))
    // CBytes uses reference equality in case-class == on Array; compare structurally
    assert(enc(back.asInstanceOf[Value]) == enc(v))
  }

  test("malformed inputs refuse loudly") {
    intercept[IllegalArgumentException](dec("1c")) // reserved additional info 28
    intercept[IllegalArgumentException](dec("f800")) // two-byte simple in one-byte range
    intercept[IllegalArgumentException](dec("ff")) // lone break
    intercept[Exception](dec("5f4201026130ff")) // text chunk inside indefinite bytes
    intercept[Exception](dec("1b8000000000000000")) // uint64 > Long.Max
    intercept[Exception](dec("4401")) // truncated string body
    assert(intercept[IllegalArgumentException](dec("0000")).getMessage.contains("trailing"))
  }
}
