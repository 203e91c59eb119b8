package graft.zarr

import java.io.ByteArrayOutputStream
import java.util.zip.{Deflater, DeflaterOutputStream, GZIPInputStream, GZIPOutputStream, InflaterInputStream}

/** Chunk compression codecs: gzip/zlib/zstd (SURVEY §4 "Compression
  * codecs" decision) plus pure-JVM blosc1 (see [[Blosc]]) — the
  * default zarr-python compressor. Inner lz4/zstd/zlib/snappy blocks
  * ride on libraries already on Spark's classpath; blosclz (c-blosc's
  * own LZ77) and both shuffle filters (byte and bit) are implemented
  * in [[Blosc]] directly, so any blosc1 frame decodes.
  *
  * Codec name strings match Zarr v2 compressor ids and Zarr v3 codec
  * names. Blosc encode parameters ride in the id:
  * `"blosc"` (cname lz4, clevel 5, byte-shuffle — zarr-python's
  * defaults) or `"blosc:<cname>[:<clevel>[:<shuffle>]]"` with shuffle
  * one of `byte`/`bit`/`none`. `typesize` drives the shuffle filters;
  * pass the dtype's item size when writing.
  */
object Codecs {

  /** THE parser for `blosc[:<cname>[:<clevel>[:<shuffle>]]]` ids —
    * every consumer (frame encoder, v2 `.zarray`, v3 `zarr.json`,
    * shard codec lists) must go through it so the emitted metadata
    * and the actual frames can never disagree, and an invalid token
    * throws BEFORE any store bytes are written.
    *
    * Returns (cname, clevel, shuffle mode) with mode one of
    * [[Blosc.ShuffleNone]]/[[Blosc.ShuffleByte]]/[[Blosc.ShuffleBit]].
    */
  def parseBloscId(id: String): (String, Int, Int) = {
    val parts = id.split(':')
    val cname = if (parts.length > 1) parts(1) else "lz4"
    val clevel = if (parts.length > 2) parts(2).toInt else 5
    val mode = (if (parts.length > 3) parts(3) else "byte") match {
      case "none" => Blosc.ShuffleNone
      case "byte" => Blosc.ShuffleByte
      case "bit" => Blosc.ShuffleBit
      case other => throw new IllegalArgumentException(
        s"blosc shuffle '$other' (byte/bit/none)")
    }
    (cname, clevel, mode)
  }

  /** numcodecs integer encoding of a shuffle mode (zarr v2). */
  def shuffleV2(mode: Int): Int = mode

  /** zarr v3 blosc codec string for a shuffle mode. */
  def shuffleV3(mode: Int): String = mode match {
    case Blosc.ShuffleNone => "noshuffle"
    case Blosc.ShuffleBit => "bitshuffle"
    case _ => "shuffle"
  }

  def compress(codec: Option[String], data: Array[Byte], level: Int = 5,
      typesize: Int = 1): Array[Byte] =
    codec match {
      case None => data
      case Some(id) if id == "crc32c" || id.startsWith("crc32c:") =>
        // inverse of the decode path: inner codec first, CRC-32C
        // trailer (4 bytes LE) appended last
        val inner = compress(if (id == "crc32c") None else Some(id.substring(7)),
          data, level, typesize)
        val crc = new java.util.zip.CRC32C
        crc.update(inner, 0, inner.length)
        val v = crc.getValue.toInt
        inner ++ Array[Byte](v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)
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
      case Some(b) if b == "blosc" || b.startsWith("blosc:") =>
        val (cname, clevel, mode) = parseBloscId(b)
        Blosc.compressFrame(data, typesize, cname, clevel, mode)
      case Some(other) => throw new UnsupportedOperationException(
        s"codec '$other' unsupported (gzip/zlib/zstd/blosc)")
    }

  def decompress(codec: Option[String], data: Array[Byte], expectedSize: Int): Array[Byte] =
    codec match {
      case None => data
      case Some(id) if id == "crc32c" || id.startsWith("crc32c:") =>
        // zarr v3 checksum codec: verify + strip the 4-byte LE CRC-32C
        // trailer, then hand the payload to the inner codec (if any)
        require(data.length >= 4, "crc32c codec payload shorter than its trailer")
        val crc = new java.util.zip.CRC32C
        crc.update(data, 0, data.length - 4)
        val stored = (data(data.length - 4) & 0xff) |
          ((data(data.length - 3) & 0xff) << 8) |
          ((data(data.length - 2) & 0xff) << 16) |
          ((data(data.length - 1) & 0xff) << 24)
        require(crc.getValue.toInt == stored, "chunk crc32c mismatch")
        val inner = java.util.Arrays.copyOfRange(data, 0, data.length - 4)
        decompress(if (id == "crc32c") None else Some(id.substring(7)),
          inner, expectedSize)
      case Some("gzip") =>
        readAll(new GZIPInputStream(new java.io.ByteArrayInputStream(data)), expectedSize)
      case Some("zlib") =>
        readAll(new InflaterInputStream(new java.io.ByteArrayInputStream(data)), expectedSize)
      case Some("zstd") =>
        com.github.luben.zstd.Zstd.decompress(data, expectedSize)
      case Some(b) if b == "blosc" || b.startsWith("blosc:") =>
        Blosc.decompress(data) // frames are self-describing
      case Some(other) => throw new UnsupportedOperationException(
        s"codec '$other' unsupported (gzip/zlib/zstd/blosc)")
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
