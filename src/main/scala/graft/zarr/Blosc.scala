package graft.zarr

import java.nio.{ByteBuffer, ByteOrder}

/** Pure-JVM blosc1 frame codec — the compressor zarr-python applies by
  * default and the reference writes through (ngff-zarr
  * `py/ngff_zarr/to_ngff_zarr.py:205-214` builds blosc codec configs),
  * so most real-world OME-Zarr stores need it to open at all.
  *
  * Frame layout (public c-blosc format):
  *  - 16-byte header, little-endian: version, versionlz, flags,
  *    typesize, nbytes (i32), blocksize (i32), cbytes (i32);
  *  - flags: bit 0 byte-shuffle, bit 1 pure-memcpy, bit 2 bit-shuffle,
  *    bit 4 dont-split, bits 5-7 inner codec (0 blosclz, 1 lz4,
  *    2 snappy, 3 zlib, 4 zstd);
  *  - memcpy frames: raw payload directly after the header;
  *  - otherwise an i32 block-start table (offsets from frame start,
  *    one per ceil(nbytes/blocksize) block), then per block one or
  *    `typesize` length-prefixed streams (i32 compressed size, then
  *    the compressed bytes; size == uncompressed size marks a stored
  *    stream).
  *
  * Whether a block was split into typesize streams depends on the
  * writer's version-specific split policy (codec, blocksize and
  * typesize thresholds changed across c-blosc releases). Rather than
  * replicating every historical rule, the decoder PROBES: it parses
  * the split layout first when the flags make it possible and falls
  * back to the single-stream layout when the stream lengths or
  * decompressed sizes don't validate — both layouts are
  * self-checking, so the probe cannot mis-decode.
  *
  * Inner codecs ride on what Spark already ships: lz4-java, zstd-jni,
  * snappy-java, java.util.zip. blosclz (c-blosc's own LZ77) and the
  * bit-shuffle filter have no JVM implementation here and are
  * rejected with precise errors.
  */
object Blosc {

  private val MemcpyFlag = 0x02
  private val ShuffleFlag = 0x01
  private val BitShuffleFlag = 0x04
  private val DontSplitFlag = 0x10

  private val CodecBloscLz = 0
  private val CodecLz4 = 1
  private val CodecSnappy = 2
  private val CodecZlib = 3
  private val CodecZstd = 4

  private def codecId(cname: String): Int = cname match {
    case "lz4" | "lz4hc" => CodecLz4
    case "snappy" => CodecSnappy
    case "zlib" => CodecZlib
    case "zstd" => CodecZstd
    case other => throw new UnsupportedOperationException(
      s"blosc cname '$other' unsupported for encode (lz4/zstd/zlib/snappy)")
  }

  // ---- decode ----

  def decompress(frame: Array[Byte]): Array[Byte] = {
    require(frame.length >= 16, s"blosc frame truncated: ${frame.length} bytes")
    val bb = ByteBuffer.wrap(frame).order(ByteOrder.LITTLE_ENDIAN)
    bb.get() // version
    bb.get() // versionlz
    val flags = bb.get() & 0xff
    val typesize = bb.get() & 0xff
    val nbytes = bb.getInt()
    val blocksize = bb.getInt()
    val cbytes = bb.getInt()
    require(nbytes >= 0 && cbytes >= 16 && cbytes <= frame.length,
      s"blosc header out of range: nbytes=$nbytes cbytes=$cbytes frame=${frame.length}")
    if (nbytes == 0) return Array.emptyByteArray
    if ((flags & MemcpyFlag) != 0) {
      require(frame.length >= 16 + nbytes, "blosc memcpy frame truncated")
      return java.util.Arrays.copyOfRange(frame, 16, 16 + nbytes)
    }
    if ((flags & BitShuffleFlag) != 0) throw new UnsupportedOperationException(
      "blosc bit-shuffle filter unsupported (byte-shuffled and unfiltered frames decode)")
    val codec = (flags >>> 5) & 0x7
    if (codec == CodecBloscLz) throw new UnsupportedOperationException(
      "blosc inner codec 'blosclz' unsupported (lz4/zstd/zlib/snappy decode); " +
        "re-encode the store with cname lz4 or zstd")
    val shuffled = (flags & ShuffleFlag) != 0 && typesize > 1
    require(blocksize > 0, s"blosc blocksize $blocksize")
    val nblocks = ((nbytes.toLong + blocksize - 1) / blocksize).toInt
    val bstarts = Array.fill(nblocks)(bb.getInt())
    val out = new Array[Byte](nbytes)
    var j = 0
    while (j < nblocks) {
      val boff = j * blocksize
      val bsize = math.min(blocksize.toLong, nbytes.toLong - boff).toInt
      val dontSplit = (flags & DontSplitFlag) != 0
      val canSplit = shuffled && bsize % typesize == 0 && bsize / typesize > 0
      val block =
        (if (canSplit && !dontSplit) tryStreams(frame, bstarts(j), bsize, typesize, codec)
         else None)
          .orElse(tryStreams(frame, bstarts(j), bsize, 1, codec))
          .orElse(if (canSplit && dontSplit)
            tryStreams(frame, bstarts(j), bsize, typesize, codec) else None)
          .getOrElse(throw new java.io.IOException(
            s"blosc block $j at ${bstarts(j)} does not parse as split or unsplit streams"))
      if (shuffled) unshuffle(block, typesize, out, boff)
      else System.arraycopy(block, 0, out, boff, bsize)
      j += 1
    }
    out
  }

  /** Parse `nstreams` length-prefixed streams of bsize/nstreams bytes
    * each starting at `start`; None when the layout doesn't validate.
    */
  private def tryStreams(frame: Array[Byte], start: Int, bsize: Int,
      nstreams: Int, codec: Int): Option[Array[Byte]] = {
    if (start < 16 || start > frame.length) return None
    val neblock = bsize / nstreams
    if (neblock * nstreams != bsize) return None
    val out = new Array[Byte](bsize)
    var off = start
    var s = 0
    while (s < nstreams) {
      if (off + 4 > frame.length) return None
      val cs = readIntLE(frame, off)
      off += 4
      if (cs <= 0 || off + cs > frame.length) return None
      if (cs == neblock) System.arraycopy(frame, off, out, s * neblock, neblock)
      else if (!inflateStream(codec, frame, off, cs, out, s * neblock, neblock)) return None
      off += cs
      s += 1
    }
    Some(out)
  }

  /** Decompress one stream; false when the codec rejects it or the
    * output size disagrees (probe failure, not an error).
    */
  private def inflateStream(codec: Int, src: Array[Byte], off: Int, len: Int,
      dst: Array[Byte], dstOff: Int, expect: Int): Boolean =
    try codec match {
      case CodecLz4 =>
        val n = lz4.decompress(src, off, len, dst, dstOff, expect)
        n == expect
      case CodecZstd =>
        val n = com.github.luben.zstd.Zstd.decompressByteArray(
          dst, dstOff, expect, src, off, len)
        !com.github.luben.zstd.Zstd.isError(n) && n == expect
      case CodecZlib =>
        val inf = new java.util.zip.Inflater()
        inf.setInput(src, off, len)
        val n = inf.inflate(dst, dstOff, expect)
        val done = inf.finished()
        inf.end()
        done && n == expect
      case CodecSnappy =>
        org.xerial.snappy.Snappy.uncompressedLength(src, off, len) == expect && {
          org.xerial.snappy.Snappy.uncompress(src, off, len, dst, dstOff) == expect
        }
      case _ => false
    } catch { case _: Exception => false }

  private lazy val lz4 = net.jpountz.lz4.LZ4Factory.fastestInstance().safeDecompressor()
  private lazy val lz4c = net.jpountz.lz4.LZ4Factory.fastestInstance().fastCompressor()

  private def readIntLE(a: Array[Byte], off: Int): Int =
    (a(off) & 0xff) | ((a(off + 1) & 0xff) << 8) |
      ((a(off + 2) & 0xff) << 16) | ((a(off + 3) & 0xff) << 24)

  /** Inverse byte-shuffle of one block into `out` at `outOff`:
    * shuffled layout is typesize planes of n = len/typesize bytes,
    * plane k byte i ← original element i byte k; the len % typesize
    * tail is stored unshuffled after the planes.
    */
  private def unshuffle(block: Array[Byte], typesize: Int,
      out: Array[Byte], outOff: Int): Unit = {
    val len = block.length
    val n = len / typesize
    var k = 0
    while (k < typesize) {
      var i = 0
      val plane = k * n
      while (i < n) {
        out(outOff + i * typesize + k) = block(plane + i)
        i += 1
      }
      k += 1
    }
    var t = n * typesize
    while (t < len) { out(outOff + t) = block(t); t += 1 }
  }

  /** Forward byte-shuffle of `len` bytes of `in` at `inOff`. */
  private def shuffleFwd(in: Array[Byte], inOff: Int, len: Int, typesize: Int): Array[Byte] = {
    val out = new Array[Byte](len)
    val n = len / typesize
    var k = 0
    while (k < typesize) {
      var i = 0
      val plane = k * n
      while (i < n) {
        out(plane + i) = in(inOff + i * typesize + k)
        i += 1
      }
      k += 1
    }
    var t = n * typesize
    while (t < len) { out(t) = in(inOff + t); t += 1 }
    out
  }

  // ---- encode ----

  /** Encode a blosc1 frame with the dont-split layout (one stream per
    * block — every c-blosc ≥ 1.11 honors the flag), byte-shuffle when
    * `shuffle` and typesize > 1, falling back to a memcpy frame when
    * compression doesn't pay. Blocks cap at 1 MiB aligned to typesize
    * so decompression stays cache-friendly.
    */
  def compress(data: Array[Byte], typesize: Int, cname: String = "lz4",
      clevel: Int = 5, shuffle: Boolean = true): Array[Byte] = {
    val codec = codecId(cname)
    val ts = if (typesize < 1 || typesize > 255) 1 else typesize
    val doShuffle = shuffle && ts > 1 && data.length >= ts
    val blocksize = {
      val cap = math.min(data.length, 1 << 20)
      val aligned = cap - cap % ts
      math.max(ts, if (aligned > 0) aligned else cap)
    }
    if (data.isEmpty) {
      val h = ByteBuffer.allocate(16).order(ByteOrder.LITTLE_ENDIAN)
      h.put(2.toByte).put(1.toByte).put(MemcpyFlag.toByte).put(ts.toByte)
      h.putInt(0).putInt(0).putInt(16)
      return h.array()
    }
    val nblocks = ((data.length.toLong + blocksize - 1) / blocksize).toInt
    val streams = new Array[Array[Byte]](nblocks)
    val stored = new Array[Boolean](nblocks)
    var j = 0
    while (j < nblocks) {
      val boff = j * blocksize
      val bsize = math.min(blocksize.toLong, data.length.toLong - boff).toInt
      val block = if (doShuffle) shuffleFwd(data, boff, bsize, ts)
        else java.util.Arrays.copyOfRange(data, boff, boff + bsize)
      val packed = deflateStream(codec, block, clevel)
      if (packed != null && packed.length < bsize) { streams(j) = packed; stored(j) = false }
      else { streams(j) = block; stored(j) = true }
      j += 1
    }
    val payload = streams.map(_.length + 4).sum
    val total = 16 + 4 * nblocks + payload
    if (total >= 16 + data.length) {
      // compression doesn't pay: memcpy frame
      val bb = ByteBuffer.allocate(16 + data.length).order(ByteOrder.LITTLE_ENDIAN)
      bb.put(2.toByte).put(1.toByte).put(MemcpyFlag.toByte).put(ts.toByte)
      bb.putInt(data.length).putInt(blocksize).putInt(16 + data.length)
      bb.put(data)
      return bb.array()
    }
    val flags = (codec << 5) | DontSplitFlag | (if (doShuffle) ShuffleFlag else 0)
    val bb = ByteBuffer.allocate(total).order(ByteOrder.LITTLE_ENDIAN)
    bb.put(2.toByte).put(1.toByte).put(flags.toByte).put(ts.toByte)
    bb.putInt(data.length).putInt(blocksize).putInt(total)
    var off = 16 + 4 * nblocks
    streams.foreach { s =>
      bb.putInt(off) // block start table entry
      off += 4 + s.length
    }
    var k = 0
    while (k < nblocks) {
      // a stored stream's length equals its uncompressed size, which
      // is exactly the decoder's raw-stream marker
      bb.putInt(streams(k).length)
      bb.put(streams(k))
      k += 1
    }
    bb.array()
  }

  private def deflateStream(codec: Int, block: Array[Byte], clevel: Int): Array[Byte] =
    try codec match {
      case CodecLz4 => lz4c.compress(block)
      case CodecZstd => com.github.luben.zstd.Zstd.compress(block, math.max(1, clevel))
      case CodecZlib =>
        val bos = new java.io.ByteArrayOutputStream(block.length / 2 + 64)
        val d = new java.util.zip.DeflaterOutputStream(bos,
          new java.util.zip.Deflater(math.min(9, math.max(1, clevel))))
        d.write(block); d.close()
        bos.toByteArray
      case CodecSnappy => org.xerial.snappy.Snappy.compress(block)
      case _ => null
    } catch { case _: Exception => null }
}
