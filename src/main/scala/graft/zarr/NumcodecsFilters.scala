package graft.zarr

import graft.meta.Dtypes

/** Zarr v2 numcodecs `filters` chains (reference reads these stores
  * transparently through zarr-python — `py/ngff_zarr/from_ngff_zarr.py:126`
  * hands decoding to zarr; delta-filtered v2 stores are common for
  * label/index volumes).
  *
  * v2 encode order is `filters[0] → filters[1] → … → compressor`, so
  * decode runs the chain REVERSED after decompression. Filters are
  * self-describing: each carries the dtype of its encoded output
  * (`astype`), so the raw decompressed bytes are typed by the LAST
  * filter in the chain and every step before it works in the value
  * domain. Byte-level filters (`shuffle`) are only legal after the
  * value-domain steps in encode order — i.e. they are the first
  * decode steps; a shuffle sandwiched between value filters refuses
  * loudly rather than decoding garbage.
  *
  * Supported ids mirror the numcodecs set a reader actually meets in
  * the wild: `delta`, `fixedscaleoffset`, `quantize`, `astype`,
  * `shuffle`. Anything else refuses at metadata parse time (same
  * posture as unknown codecs).
  */
object NumcodecsFilters {

  sealed trait V2Filter extends Serializable

  /** numcodecs.Delta — encode stores first value + successive
    * differences in `astype`; decode is a cumulative sum cast back to
    * `dtype`.
    */
  final case class DeltaF(dtype: String, astype: String) extends V2Filter

  /** numcodecs.FixedScaleOffset — encode `round((x - offset) * scale)`
    * as integer `astype`; decode `x / scale + offset` cast to `dtype`.
    */
  final case class FixedScaleOffsetF(scale: Double, offset: Double,
      dtype: String, astype: String) extends V2Filter

  /** numcodecs.Quantize — lossy float rounding at encode; decode is a
    * plain cast from `astype` back to `dtype`.
    */
  final case class QuantizeF(dtype: String, astype: String) extends V2Filter

  /** numcodecs.AsType — pure dtype cast (`encode_dtype` stored,
    * `decode_dtype` logical).
    */
  final case class AsTypeF(encodeDtype: String, decodeDtype: String) extends V2Filter

  /** numcodecs.Shuffle — byte-transpose of `elementSize`-wide
    * elements (same layout as blosc's byte shuffle); trailing bytes
    * not filling a whole element pass through unshuffled.
    */
  final case class ShuffleF(elementSize: Int) extends V2Filter

  /** Parse a `.zarray` `filters` list. Missing/null/empty → Nil;
    * unknown ids refuse here — at metadata time — never on an
    * executor mid-decode.
    */
  def parse(filters: com.fasterxml.jackson.databind.JsonNode): Seq[V2Filter] = {
    import scala.jdk.CollectionConverters._
    if (filters == null || filters.isMissingNode || filters.isNull) return Nil
    filters.elements().asScala.map { f =>
      val id = f.path("id").asText("")
      id match {
        case "delta" =>
          val dt = f.path("dtype").asText()
          DeltaF(dt, f.path("astype").asText(dt))
        case "fixedscaleoffset" =>
          val dt = f.path("dtype").asText()
          FixedScaleOffsetF(f.path("scale").asDouble(), f.path("offset").asDouble(),
            dt, f.path("astype").asText(dt))
        case "quantize" =>
          val dt = f.path("dtype").asText()
          QuantizeF(dt, f.path("astype").asText(dt))
        case "astype" =>
          AsTypeF(f.path("encode_dtype").asText(), f.path("decode_dtype").asText())
        case "shuffle" =>
          ShuffleF(f.path("elementsize").asInt(4))
        case other => throw new UnsupportedOperationException(
          s"zarr v2 numcodecs filter '$other' unsupported " +
            "(delta/fixedscaleoffset/quantize/astype/shuffle)")
      }
    }.toSeq
  }

  /** Item size of the STORED (encoded) representation — what the
    * compressor actually compressed. This is the `astype` of the last
    * value-domain filter in encode order, or the array dtype when the
    * chain is byte-level only.
    */
  def encodedItemSize(filters: Seq[V2Filter], arrayDtype: String): Int =
    filters.reverse.collectFirst {
      case DeltaF(_, astype) => Dtypes.itemSize(astype)
      case FixedScaleOffsetF(_, _, _, astype) => Dtypes.itemSize(astype)
      case QuantizeF(_, astype) => Dtypes.itemSize(astype)
      case AsTypeF(enc, _) => Dtypes.itemSize(enc)
    }.getOrElse(Dtypes.itemSize(arrayDtype))

  /** Run the decode chain (reversed encode order) over decompressed
    * chunk bytes, producing the array-dtype values as doubles — the
    * element domain the whole engine works in.
    */
  def decodeToDoubles(raw: Array[Byte], filters: Seq[V2Filter],
      arrayDtype: String, arrayBigEndian: Boolean = false): Array[Double] = {
    var bytes = raw
    var values: Array[Double] = null
    def cross(astype: String): Unit =
      if (values == null) {
        values = ZarrStore.decodeToDoubles(bytes, astype, Dtypes.isBigEndian(astype))
        bytes = null
      }
    filters.reverse.foreach {
      case ShuffleF(es) =>
        require(values == null,
          "numcodecs shuffle between value-domain filters is unsupported")
        bytes = byteUnshuffle(bytes, es)
      case DeltaF(dtype, astype) =>
        cross(astype)
        // numcodecs decode is `dec = np.empty_like(enc, dtype=dtype);
        // np.cumsum(enc, out=dec)` — numpy wraps each stored element
        // modulo the OUT (dtype) span, NOT the astype span: uint8
        // diffs cumsummed into an int32 out yield the UNWRAPPED sums
        // (verified empirically, numpy 1.26: [10,250,196,59] → dec
        // [10,260,456,515]). Per-step vs end-of-sum wrapping are
        // congruent mod 2^bits, so a double cumsum + one dtype-span
        // wrap below is exact within the documented 2^53 envelope.
        var acc = 0.0
        var i = 0
        while (i < values.length) { acc += values(i); values(i) = acc; i += 1 }
        truncateIfInt(values, dtype)
      case FixedScaleOffsetF(scale, offset, dtype, astype) =>
        cross(astype)
        var i = 0
        while (i < values.length) { values(i) = values(i) / scale + offset; i += 1 }
        truncateIfInt(values, dtype)
      case QuantizeF(dtype, astype) =>
        cross(astype) // decode is the identity cast
        truncateIfInt(values, dtype)
      case AsTypeF(enc, dec) =>
        cross(enc)
        truncateIfInt(values, dec)
    }
    if (values == null)
      values = ZarrStore.decodeToDoubles(bytes, arrayDtype,
        arrayBigEndian || Dtypes.isBigEndian(arrayDtype))
    values
  }

  /** numpy `astype(<int>)` semantics: truncate toward zero, then wrap
    * modulo 2^bits into the dtype's range — delta chains on narrow
    * unsigned dtypes rely on the wraparound (a uint8 diff of -6 is
    * stored as 250 and must cumsum back to the true value mod 256).
    * 8-byte integers skip the wrap (the engine's double domain is
    * exact to 2^53; documented in Dtypes).
    */
  private def truncateIfInt(values: Array[Double], dtype: String): Unit = {
    val dt = Dtypes.normalize(dtype)
    if (dt.startsWith("float") || dt.startsWith("complex")) return
    val size = Dtypes.itemSize(dt)
    val signed = dt.startsWith("int")
    var i = 0
    if (size >= 8) {
      while (i < values.length) { values(i) = values(i).toLong.toDouble; i += 1 }
    } else {
      val span = 1L << (size * 8)
      val half = span >> 1
      while (i < values.length) {
        var v = java.lang.Math.floorMod(values(i).toLong, span)
        if (signed && v >= half) v -= span
        values(i) = v.toDouble
        i += 1
      }
    }
  }

  /** Inverse of numcodecs Shuffle's byte transpose: input holds all
    * byte-0s of the n elements, then all byte-1s, …; trailing bytes
    * beyond n*es pass through in place.
    */
  private def byteUnshuffle(in: Array[Byte], es: Int): Array[Byte] = {
    if (es <= 1) return in
    val n = in.length / es
    val out = new Array[Byte](in.length)
    var j = 0
    while (j < es) {
      var i = 0
      val base = j * n
      while (i < n) { out(i * es + j) = in(base + i); i += 1 }
      j += 1
    }
    var r = n * es
    while (r < in.length) { out(r) = in(r); r += 1 }
    out
  }
}
