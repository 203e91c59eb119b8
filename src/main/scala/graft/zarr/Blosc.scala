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
  * typesize thresholds changed across c-blosc releases; the default
  * forward-compat mode even splits UNSHUFFLED blosclz blocks). Rather
  * than replicating every historical rule, the decoder PROBES: it
  * parses the split layout first when the flags make it possible and
  * falls back to the single-stream layout when the stream lengths or
  * decompressed sizes don't validate — both layouts are
  * self-checking, so the probe cannot mis-decode.
  *
  * Inner codecs ride on what Spark already ships: lz4-java, zstd-jni,
  * snappy-java, java.util.zip — plus a pure-JVM implementation of
  * blosclz, c-blosc's own FastLZ-derived LZ77 (see [[blosclzDecompress]]
  * for the opcode layout). The bit-shuffle filter (bitshuffle library
  * as vendored by c-blosc) is a pure bit transpose: a filtered block
  * is typesize*8 bit-planes over the largest multiple-of-8-elements
  * prefix; plane p = 8*j + b holds bit b (LSB-first) of byte j of
  * each prefix element (element e's bit at byte e/8, bit e%8), and
  * the leftover elements plus any sub-typesize remainder are stored
  * unfiltered after the planes — c-blosc's exact leftover rule,
  * mirrored on both paths here.
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
    case "blosclz" => CodecBloscLz
    case "lz4" | "lz4hc" => CodecLz4
    case "snappy" => CodecSnappy
    case "zlib" => CodecZlib
    case "zstd" => CodecZstd
    case other => throw new UnsupportedOperationException(
      s"blosc cname '$other' unsupported for encode (blosclz/lz4/zstd/zlib/snappy)")
  }

  /** Shuffle filter selector for [[compress]]: none, byte, or bit. */
  final val ShuffleNone = 0
  final val ShuffleByte = 1
  final val ShuffleBit = 2

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
    val codec = (flags >>> 5) & 0x7
    val shuffled = (flags & ShuffleFlag) != 0 && typesize > 1
    val bitShuffled = (flags & BitShuffleFlag) != 0 && typesize > 0
    require(blocksize > 0, s"blosc blocksize $blocksize")
    val nblocks = ((nbytes.toLong + blocksize - 1) / blocksize).toInt
    val bstarts = Array.fill(nblocks)(bb.getInt())
    val out = new Array[Byte](nbytes)
    var j = 0
    while (j < nblocks) {
      val boff = j * blocksize
      val bsize = math.min(blocksize.toLong, nbytes.toLong - boff).toInt
      val dontSplit = (flags & DontSplitFlag) != 0
      // c-blosc's split policy varies by version and applies to byte-
      // shuffled, bit-shuffled AND (forward-compat blosclz) unshuffled
      // blocks alike — the split operates on the filtered buffer, so
      // concatenating the streams before unfiltering is always right.
      val canSplit = typesize > 1 && bsize % typesize == 0 && bsize / typesize > 0
      val block =
        (if (canSplit && !dontSplit) tryStreams(frame, bstarts(j), bsize, typesize, codec)
         else None)
          .orElse(tryStreams(frame, bstarts(j), bsize, 1, codec))
          .orElse(if (canSplit && dontSplit)
            tryStreams(frame, bstarts(j), bsize, typesize, codec) else None)
          .getOrElse(throw new java.io.IOException(
            s"blosc block $j at ${bstarts(j)} does not parse as split or unsplit streams"))
      if (bitShuffled) bitUnshuffle(block, typesize, out, boff)
      else if (shuffled) unshuffle(block, typesize, out, boff)
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
      case CodecBloscLz => blosclzDecompress(src, off, len, dst, dstOff, expect)
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

  /** Inverse bit-shuffle of one filtered block into `out` at `outOff`.
    * Input layout (bitshuffle library as used by c-blosc): typesize*8
    * bit-planes of floor(nelem/8)/8... precisely, c-blosc (PR #260
    * onward) bit-transposes only the largest multiple-of-8-ELEMENTS
    * prefix — floor(nelem/8)*8 elements — and memcpys the leftover
    * elements plus any sub-typesize remainder unfiltered after the
    * planes. Within the prefix: plane p = 8*j + b, byte r, bit k
    * (LSB-first) carries bit b of byte j of element 8*r + k. Caller
    * guarantees the target region of `out` is zeroed (freshly
    * allocated).
    */
  private def bitUnshuffle(block: Array[Byte], typesize: Int,
      out: Array[Byte], outOff: Int): Unit = {
    val nelem8 = (block.length / typesize) >>> 3 << 3 // shuffled prefix
    val prefix = nelem8 * typesize
    var t = prefix
    while (t < block.length) { out(outOff + t) = block(t); t += 1 }
    val nbr = nelem8 >>> 3 // bytes per bit-plane
    var p = 0
    while (p < typesize * 8) {
      val j = p >>> 3
      val b = p & 7
      val planeOff = p * nbr
      var r = 0
      while (r < nbr) {
        val v = block(planeOff + r) & 0xff
        if (v != 0) {
          val eBase = outOff + (r << 3) * typesize + j
          var k = 0
          while (k < 8) {
            if (((v >>> k) & 1) != 0) {
              val at = eBase + k * typesize
              out(at) = (out(at) | (1 << b)).toByte
            }
            k += 1
          }
        }
        r += 1
      }
      p += 1
    }
  }

  /** Forward bit-shuffle of `len` bytes of `in` at `inOff` (prefix/
    * leftover semantics per c-blosc); exact inverse of
    * [[bitUnshuffle]].
    */
  private def bitShuffleFwd(in: Array[Byte], inOff: Int, len: Int,
      typesize: Int): Array[Byte] = {
    val out = new Array[Byte](len)
    val nelem8 = (len / typesize) >>> 3 << 3
    val prefix = nelem8 * typesize
    var t = prefix
    while (t < len) { out(t) = in(inOff + t); t += 1 }
    val nbr = nelem8 >>> 3
    var p = 0
    while (p < typesize * 8) {
      val j = p >>> 3
      val b = p & 7
      val planeOff = p * nbr
      var r = 0
      while (r < nbr) {
        val eBase = inOff + (r << 3) * typesize + j
        var v = 0
        var k = 0
        while (k < 8) {
          if (((in(eBase + k * typesize) >>> b) & 1) != 0) v |= 1 << k
          k += 1
        }
        out(planeOff + r) = v.toByte
        r += 1
      }
      p += 1
    }
    out
  }

  // ---- blosclz (c-blosc's FastLZ-derived LZ77) ----

  /** Decode one blosclz stream into `dst[dstOff, dstOff+expect)`;
    * false when it doesn't decode to exactly `expect` bytes (probe
    * failure, not an error). Opcode layout (public c-blosc
    * `blosclz.c` format, shared with FastLZ level 2):
    *  - the first control byte is masked `& 31` (a stream always
    *    opens with a literal run);
    *  - ctrl < 32: copy ctrl+1 literal bytes from the input;
    *  - ctrl >= 32: a match. len = (ctrl>>5) - 1; when that is 6,
    *    extension bytes each add their value, continuing while the
    *    byte read was 255. Then one distance byte `code`:
    *    distance = ((ctrl & 31) << 8) + code + 1, match length
    *    len + 3, copied from already-produced output (overlapping
    *    copies are byte-serial, so distance 1 is RLE).
    *  - code == 255 with (ctrl & 31) == 31 escapes to a far match:
    *    two big-endian bytes give ofs, distance = ofs + 8192
    *    (MAX_DISTANCE 8191 + 1).
    */
  private[zarr] def blosclzDecompress(src: Array[Byte], off: Int, len: Int,
      dst: Array[Byte], dstOff: Int, expect: Int): Boolean = {
    if (len <= 0) return expect == 0
    var ip = off
    val ipEnd = off + len
    var op = dstOff
    val opEnd = dstOff + expect
    var ctrl = src(ip) & 31
    ip += 1
    var loop = true
    while (loop) {
      if (ctrl >= 32) {
        var mlen = (ctrl >>> 5) - 1
        val ofsHigh = (ctrl & 31) << 8
        if (mlen == 6) {
          var ext = 0
          do {
            if (ip >= ipEnd) return false
            ext = src(ip) & 0xff
            ip += 1
            mlen += ext
          } while (ext == 255)
        }
        if (ip >= ipEnd) return false
        val code = src(ip) & 0xff
        ip += 1
        mlen += 3
        var ref = op - ofsHigh - code
        if (code == 255 && ofsHigh == (31 << 8)) {
          if (ip + 2 > ipEnd) return false
          ref = op - (((src(ip) & 0xff) << 8) | (src(ip + 1) & 0xff)) - 8191
          ip += 2
        }
        ref -= 1
        if (op + mlen > opEnd || ref < dstOff) return false
        var i = 0
        while (i < mlen) { // byte-serial: overlap gives run semantics
          dst(op + i) = dst(ref + i)
          i += 1
        }
        op += mlen
      } else {
        val n = ctrl + 1
        if (op + n > opEnd || ip + n > ipEnd) return false
        System.arraycopy(src, ip, dst, op, n)
        ip += n
        op += n
      }
      if (ip < ipEnd) { ctrl = src(ip) & 0xff; ip += 1 }
      else loop = false
    }
    op == opEnd
  }

  /** Greedy blosclz encoder (hash-chained 3-byte matches within the
    * 8191-byte short-match window; the decoder additionally accepts
    * far matches, which this encoder never needs to emit). Output is
    * a valid stream for any input; callers drop it when it doesn't
    * beat the raw size.
    */
  private[zarr] def blosclzCompress(in: Array[Byte], off: Int, len: Int): Array[Byte] = {
    val out = new Array[Byte](len + len / 32 + 64)
    var op = 0
    var ip = off
    val end = off + len
    var anchor = off
    val htab = new Array[Int](1 << 14)
    java.util.Arrays.fill(htab, -1)

    def hash(p: Int): Int = {
      val v = (in(p) & 0xff) | ((in(p + 1) & 0xff) << 8) | ((in(p + 2) & 0xff) << 16)
      ((v * 2654435761L) >>> 18).toInt & 0x3fff
    }
    def flushLiterals(upTo: Int): Unit = {
      var a = anchor
      while (a < upTo) {
        val n = math.min(32, upTo - a)
        out(op) = (n - 1).toByte
        op += 1
        System.arraycopy(in, a, out, op, n)
        op += n
        a += n
      }
      anchor = upTo
    }
    def emitMatch(dist: Int, mlen: Int): Unit = {
      // dist-1 <= 8190 never collides with the far-match escape
      // (which needs code == 255 AND high bits == 31 → dist-1 == 8191)
      val d = dist - 1
      val lenField = mlen - 3
      if (lenField < 6) {
        out(op) = (((lenField + 1) << 5) | (d >>> 8)).toByte
        op += 1
      } else {
        out(op) = ((7 << 5) | (d >>> 8)).toByte
        op += 1
        var e = lenField - 6
        while (e >= 255) { out(op) = -1; op += 1; e -= 255 }
        out(op) = e.toByte
        op += 1
      }
      out(op) = (d & 0xff).toByte
      op += 1
    }

    while (ip + 4 <= end) {
      val h = hash(ip)
      val cand = htab(h)
      htab(h) = ip
      if (cand >= 0 && ip - cand <= 8191 &&
          in(cand) == in(ip) && in(cand + 1) == in(ip + 1) && in(cand + 2) == in(ip + 2)) {
        var m = 3
        while (ip + m < end && in(cand + m) == in(ip + m)) m += 1
        flushLiterals(ip)
        emitMatch(ip - cand, m)
        ip += m
        anchor = ip
        if (ip + 3 <= end) htab(hash(ip - 1)) = ip - 1
      } else ip += 1
    }
    flushLiterals(end)
    java.util.Arrays.copyOf(out, op)
  }

  // ---- encode ----

  /** Encode a blosc1 frame with the dont-split layout (one stream per
    * block — every c-blosc ≥ 1.11 honors the flag), byte-shuffle when
    * `shuffle` and typesize > 1, falling back to a memcpy frame when
    * compression doesn't pay. Blocks cap at 1 MiB aligned to typesize
    * so decompression stays cache-friendly.
    */
  def compress(data: Array[Byte], typesize: Int, cname: String = "lz4",
      clevel: Int = 5, shuffle: Boolean = true): Array[Byte] =
    compressFrame(data, typesize, cname, clevel,
      if (shuffle) ShuffleByte else ShuffleNone)

  /** [[compress]] with an explicit shuffle filter: [[ShuffleNone]],
    * [[ShuffleByte]], or [[ShuffleBit]]. Bit-shuffle sizes blocks to
    * a multiple of typesize*8; each block transposes its largest
    * multiple-of-8-elements prefix and stores the leftover bytes
    * unfiltered, mirroring c-blosc (and the decode path).
    */
  def compressFrame(data: Array[Byte], typesize: Int, cname: String,
      clevel: Int, shuffleMode: Int): Array[Byte] = {
    val codec = codecId(cname)
    val ts = if (typesize < 1 || typesize > 255) 1 else typesize
    val doBit = shuffleMode == ShuffleBit
    val doShuffle = shuffleMode == ShuffleByte && ts > 1 && data.length >= ts
    val align = if (doBit) ts * 8 else ts
    val blocksize = {
      val cap = math.min(data.length, 1 << 20)
      val aligned = cap - cap % align
      math.max(align, if (aligned > 0) aligned else cap)
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
      val block =
        if (doBit) bitShuffleFwd(data, boff, bsize, ts)
        else if (doShuffle) shuffleFwd(data, boff, bsize, ts)
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
    val flags = (codec << 5) | DontSplitFlag |
      (if (doBit) BitShuffleFlag else 0) | (if (doShuffle) ShuffleFlag else 0)
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
      case CodecBloscLz => blosclzCompress(block, 0, block.length)
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
