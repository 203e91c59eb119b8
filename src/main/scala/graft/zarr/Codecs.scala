package graft.zarr

import java.io.ByteArrayOutputStream
import java.util.zip.{Deflater, DeflaterOutputStream, GZIPInputStream, GZIPOutputStream, InflaterInputStream}

/** Chunk compression codecs. The engine supports gzip + zstd first
  * (SURVEY §4 "Compression codecs" decision); blosc would need JNI
  * not present in this environment and is intentionally unsupported —
  * stores written with blosc must be re-encoded upstream.
  *
  * zstd rides on the zstd-jni that ships with Spark, gzip/zlib on
  * java.util.zip. Codec name strings match Zarr v2 compressor ids and
  * Zarr v3 codec names.
  */
object Codecs {

  def compress(codec: Option[String], data: Array[Byte], level: Int = 5): Array[Byte] =
    codec match {
      case None => data
      case Some("gzip") =>
        val bos = new ByteArrayOutputStream(data.length / 2 + 64)
        val gz = new GZIPOutputStream(bos) { this.`def`.setLevel(level) }
        gz.write(data); gz.close()
        bos.toByteArray
      case Some("zlib") =>
        val bos = new ByteArrayOutputStream(data.length / 2 + 64)
        val d = new DeflaterOutputStream(bos, new Deflater(level))
        d.write(data); d.close()
        bos.toByteArray
      case Some("zstd") => com.github.luben.zstd.Zstd.compress(data, 3)
      case Some(other) => throw new UnsupportedOperationException(
        s"codec '$other' unsupported (gzip/zlib/zstd only; blosc needs JNI absent here)")
    }

  def decompress(codec: Option[String], data: Array[Byte], expectedSize: Int): Array[Byte] =
    codec match {
      case None => data
      case Some("gzip") =>
        readAll(new GZIPInputStream(new java.io.ByteArrayInputStream(data)), expectedSize)
      case Some("zlib") =>
        readAll(new InflaterInputStream(new java.io.ByteArrayInputStream(data)), expectedSize)
      case Some("zstd") =>
        com.github.luben.zstd.Zstd.decompress(data, expectedSize)
      case Some(other) => throw new UnsupportedOperationException(
        s"codec '$other' unsupported (gzip/zlib/zstd only)")
    }

  private def readAll(in: java.io.InputStream, sizeHint: Int): Array[Byte] = {
    val bos = new ByteArrayOutputStream(math.max(sizeHint, 64))
    val buf = new Array[Byte](8192)
    var n = in.read(buf)
    while (n >= 0) { bos.write(buf, 0, n); n = in.read(buf) }
    in.close()
    bos.toByteArray
  }
}
