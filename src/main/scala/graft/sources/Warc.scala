package graft.sources

import java.io.{BufferedInputStream, EOFException, InputStream}
import java.nio.charset.StandardCharsets.{US_ASCII, UTF_8}
import java.util.zip.{GZIPInputStream, GZIPOutputStream}

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.zarr.SerializableHadoopConf

/** WARC / WET web-archive ingestion (ISO 28500 — the Common Crawl
  * container), pure JVM.
  *
  * The 100 TB posture: a crawl is tens of thousands of ~1 GiB
  * `.warc.gz` files; per-record gzip members make the files
  * non-splittable, so the unit of parallelism is the FILE — each task
  * streams one archive end to end (constant memory: records decode
  * one at a time off the stream, never the whole file). The path list
  * arrives as a Dataset (a manifest table at scale, a listing
  * helper locally); `spark.hadoopConfiguration` serializes into the
  * executor-side `FileSystem` handles, so local dirs, s3a://, gs://
  * and abfs:// all read through the same code path.
  *
  * Parsing is strict and loud (the engine's no-silently-wrong
  * posture): a record must open with `WARC/1.0` or `WARC/1.1`, carry
  * a `Content-Length`, and close with CRLF CRLF — anything else
  * raises with the file and byte offset. Multi-member gzip is
  * handled by `GZIPInputStream`'s native member concatenation.
  */
object Warc {

  final case class WarcRecord(
      file: String,
      record_type: String, // warcinfo | request | response | conversion | ...
      record_id: String,
      target_uri: String, // "" when absent (e.g. warcinfo)
      warc_date: String,
      content_type: String,
      content_length: Long,
      payload: Array[Byte])

  // ---- record stream parser ----

  private def readFully(in: InputStream, n: Long, file: String): Array[Byte] = {
    require(n <= Int.MaxValue, s"$file: record payload $n exceeds 2 GiB")
    val out = new Array[Byte](n.toInt)
    var off = 0
    while (off < out.length) {
      val r = in.read(out, off, out.length - off)
      if (r < 0) throw new EOFException(
        s"$file: EOF at $off of ${out.length} payload bytes")
      off += r
    }
    out
  }

  /** Parse every record in one (already-decompressed) WARC stream.
    * Per-record allocation is held to the payload array and the
    * header Strings the record carries (r13): the line reader reuses
    * one growable buffer across the stream (the former per-line
    * ByteArrayOutputStream + toByteArray copy ran ~10×/record ×
    * 200k records/archive), and the six headers the record model
    * reads are captured directly instead of materializing an
    * immutable Map per record. Semantics unchanged: keys match
    * case-insensitively after trim, the LAST occurrence of a repeated
    * header wins, unknown headers are skipped (they were stored and
    * never read), and every malformed-input refusal is identical.
    */
  def parseStream(in: InputStream, file: String): Iterator[WarcRecord] =
    new Iterator[WarcRecord] {
      private var nextRec: WarcRecord = _
      private var done = false
      private var lineBuf = new Array[Byte](128)
      /** One CRLF-terminated ASCII header line; null at clean EOF. */
      private def readLine(): String = {
        var b = in.read()
        if (b < 0) return null
        var n = 0
        while (b >= 0 && b != '\n') {
          if (n == lineBuf.length)
            lineBuf = java.util.Arrays.copyOf(lineBuf, n * 2)
          lineBuf(n) = b.toByte; n += 1
          b = in.read()
        }
        if (b < 0) throw new EOFException("EOF inside a WARC header line")
        if (n > 0 && lineBuf(n - 1) == '\r') n -= 1
        new String(lineBuf, 0, n, US_ASCII)
      }
      private def readLineOrThrow(ctx: String): String = {
        val l = readLine()
        if (l == null) throw new EOFException(s"$file: $ctx")
        l
      }
      private def advance(): Unit = {
        // skip blank lines between records (some writers pad)
        var first = readLine()
        while (first != null && first.isEmpty) first = readLine()
        if (first == null) { done = true; return }
        require(first == "WARC/1.0" || first == "WARC/1.1",
          s"$file: expected WARC/1.0|1.1 version line, got '$first'")
        var recType = ""; var recId = ""; var uri = ""
        var date = ""; var ctype = ""; var lenStr: String = null
        var line = readLineOrThrow("EOF inside WARC headers")
        while (line.nonEmpty) {
          val i = line.indexOf(':')
          require(i > 0, s"$file: malformed WARC header '$line'")
          val key = line.substring(0, i).trim.toLowerCase
          val value = line.substring(i + 1).trim
          key match {
            case "warc-type" => recType = value
            case "warc-record-id" => recId = value
            case "warc-target-uri" => uri = value
            case "warc-date" => date = value
            case "content-type" => ctype = value
            case "content-length" => lenStr = value
            case _ => () // stored-but-never-read before; skipped now
          }
          line = readLineOrThrow("EOF inside WARC headers")
        }
        if (lenStr == null) throw new IllegalArgumentException(
          s"$file: record missing Content-Length")
        val len = lenStr.toLong
        val payload = readFully(in, len, file)
        // the two record-terminating CRLFs
        (0 until 2).foreach { _ =>
          val t = readLineOrThrow("EOF at record terminator")
          require(t.isEmpty, s"$file: expected blank record terminator, got '$t'")
        }
        nextRec = WarcRecord(
          file = file,
          record_type = recType,
          record_id = recId,
          target_uri = uri,
          warc_date = date,
          content_type = ctype,
          content_length = len,
          payload = payload)
      }
      advance()
      override def hasNext: Boolean = !done
      override def next(): WarcRecord = {
        val r = nextRec; advance(); r
      }
    }

  /** Open one archive for streaming parse (gz-transparent). The
    * DECOMPRESSED side is buffered too (r12 optimization round):
    * `parseStream`'s header reader consumes single bytes, and an
    * unbuffered `GZIPInputStream.read()` crosses into a native
    * `inflate` call per byte — ~200 header bytes × every record. The
    * buffer turns that into block reads; the byte stream is identical.
    */
  def openMaybeGz(path: String, hconf: SerializableHadoopConf): InputStream = {
    val p = new org.apache.hadoop.fs.Path(path)
    val raw = new BufferedInputStream(p.getFileSystem(hconf.value).open(p), 1 << 16)
    if (path.endsWith(".gz"))
      new BufferedInputStream(new GZIPInputStream(raw, 1 << 16), 1 << 16)
    else raw
  }

  /** Distributed WARC scan: one task per archive file. */
  def read(spark: SparkSession, paths: Seq[String]): Dataset[WarcRecord] = {
    import spark.implicits._
    require(paths.nonEmpty, "empty WARC path list")
    val hconf = SerializableHadoopConf.fromActiveSession()
    spark.createDataset(paths)
      .repartition(paths.length) // file = split (gz members aren't splittable)
      .flatMap(p => parseStream(openMaybeGz(p, hconf), p))
  }

  /** List `*.warc` / `*.warc.gz` under a directory (Hadoop FS). */
  def listArchives(spark: SparkSession, dir: String): Seq[String] = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(p).toSeq
      .filter(s => s.isFile && (s.getPath.getName.endsWith(".warc") ||
        s.getPath.getName.endsWith(".warc.gz")))
      .map(_.getPath.toString).sorted
  }

  // ---- HTTP payload split (response records) ----

  /** Split an `application/http` response payload into (head, body):
    * scan for the first CRLFCRLF. Returns None when the payload is
    * not an HTTP response head.
    */
  def httpSplit(payload: Array[Byte]): Option[(String, Array[Byte])] = {
    if (payload.length < 5 || !new String(payload, 0, 5, US_ASCII).startsWith("HTTP/"))
      return None
    var i = 0
    while (i + 3 < payload.length) {
      if (payload(i) == '\r' && payload(i + 1) == '\n' &&
        payload(i + 2) == '\r' && payload(i + 3) == '\n') {
        val head = new String(payload, 0, i, US_ASCII)
        return Some((head, payload.slice(i + 4, payload.length)))
      }
      i += 1
    }
    None
  }

  private val statusRe = """HTTP/[0-9.]+\s+(\d{3})""".r

  /** Status code from an HTTP head's first line; refuses with record
    * context on the malformed heads real crawls contain (no space,
    * double spaces, missing code) instead of an uncontrolled
    * index/number error.
    */
  def httpStatus(head: String, context: String): Int =
    statusRe.findPrefixMatchOf(head.split("\r\n").head) match {
      case Some(m) => m.group(1).toInt
      case None => throw new IllegalArgumentException(
        s"$context: malformed HTTP status line '${head.split("\r\n").head.take(60)}'")
    }

  /** `response` records → (target_uri, http_status, http_content_type,
    * body). Non-HTTP response payloads refuse loudly.
    */
  def httpResponses(records: Dataset[WarcRecord]): DataFrame = {
    val spark = records.sparkSession
    import spark.implicits._
    records.filter(_.record_type == "response").map { r =>
      val (head, body) = httpSplit(r.payload).getOrElse(
        throw new IllegalArgumentException(
          s"${r.file}: response record ${r.record_id} payload is not HTTP"))
      val status = httpStatus(head, s"${r.file} record ${r.record_id}")
      val ctype = head.split("\r\n").tail.collectFirst {
        case l if l.toLowerCase.startsWith("content-type:") =>
          l.substring(13).trim
      }.getOrElse("")
      (r.target_uri, status, ctype, body)
    }.toDF("target_uri", "http_status", "http_content_type", "body")
  }

  /** `conversion` (WET) records → (target_uri, text). */
  def wetTexts(records: Dataset[WarcRecord]): DataFrame = {
    val spark = records.sparkSession
    import spark.implicits._
    records.filter(_.record_type == "conversion")
      .map(r => (r.target_uri, new String(r.payload, UTF_8)))
      .toDF("target_uri", "text")
  }

  // ---- writer (fixtures, round-trips, re-sharding jobs) ----

  /** Encode one record, CRLF framing per ISO 28500. */
  def encodeRecord(r: WarcRecord): Array[Byte] = {
    val sb = new StringBuilder
    sb.append("WARC/1.0\r\n")
    sb.append(s"WARC-Type: ${r.record_type}\r\n")
    sb.append(s"WARC-Record-ID: ${r.record_id}\r\n")
    sb.append(s"WARC-Date: ${r.warc_date}\r\n")
    if (r.target_uri.nonEmpty) sb.append(s"WARC-Target-URI: ${r.target_uri}\r\n")
    sb.append(s"Content-Type: ${r.content_type}\r\n")
    sb.append(s"Content-Length: ${r.payload.length}\r\n\r\n")
    sb.toString.getBytes(US_ASCII) ++ r.payload ++ "\r\n\r\n".getBytes(US_ASCII)
  }

  /** Write records to one archive; `.gz` path → one gzip MEMBER per
    * record (the Common Crawl layout, so readers can skip records by
    * offset). `level` is the deflate effort (1 = fastest, 9 = best,
    * -1 = zlib default): re-shard jobs that only re-bucket records
    * can drop to 1 — each member pays a fresh Deflater, so level
    * dominates writer CPU.
    */
  def writeArchive(path: String, records: Seq[WarcRecord],
      hconf: Option[SerializableHadoopConf] = None, level: Int = -1): Unit = {
    val conf = hconf.map(_.value).getOrElse(
      SerializableHadoopConf.fromActiveSession().value)
    val p = new org.apache.hadoop.fs.Path(path)
    val out = p.getFileSystem(conf).create(p, true)
    // close-shielded view of the file stream, so each member's
    // GZIPOutputStream can be close()'d — releasing its native
    // Deflater immediately instead of leaking one per record until
    // GC finalization (200k members = 200k zlib buffers otherwise)
    val shield = new java.io.FilterOutputStream(out) {
      override def write(b: Array[Byte], off: Int, len: Int): Unit =
        out.write(b, off, len) // the default writes byte-at-a-time
      override def close(): Unit = flush()
    }
    try {
      records.foreach { r =>
        val bytes = encodeRecord(r)
        if (path.endsWith(".gz")) {
          val g = new GZIPOutputStream(shield, 1 << 14) {
            if (level >= 0) `def`.setLevel(level)
          }
          g.write(bytes); g.close()
        } else out.write(bytes)
      }
    } finally out.close()
  }
}
