package graft.sources

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{Column, DataFrame, Encoders}
import org.apache.spark.sql.functions._

/** WARC (Web ARChive, ISO 28500) record handling — the container format
  * web crawls actually arrive in (Common Crawl ships WARC/WET). A WARC
  * file is a plain concatenation of records, each a CRLF-delimited
  * header block plus a `Content-Length`-framed payload:
  *
  * {{{
  * WARC/1.0\r\n
  * WARC-Type: response\r\n
  * WARC-Record-ID: <urn:...>\r\n
  * WARC-Target-URI: https://...\r\n
  * Content-Length: N\r\n
  * \r\n
  * <N payload bytes>\r\n\r\n
  * }}}
  *
  * The LENGTH framing is the point: payloads may contain anything,
  * including the `\r\n\r\n` separator itself, so a split-on-delimiter
  * "parser" silently corrupts real crawls. [[parse]] walks the bytes.
  *
  * Scale shape: one WARC file is one row (Common Crawl caps them at
  * ~1 GB — executor-sized by construction). At 100 TB you land the
  * files with `spark.read.format("binaryFile")` (or stream them in) and
  * [[parse]] fans each out to its records — per-file imperative byte
  * walking is exactly the `flatMap`-with-encoder slot, the same
  * justified-imperative category as the multimodal codec. Nothing is
  * ever collected; the explode happens executor-side.
  *
  * Reference scope note: the reference engine (bigboss2063/rs-query-engine)
  * has CSV ingest only; WARC ingest is part of this library's
  * training-data-pipeline extension surface.
  */
object Warc {

  /** One parsed record. `content_length` is the declared byte count
    * (== the body's UTF-8 byte length for well-formed records);
    * `body` is the payload decoded as UTF-8. */
  final case class WarcRecord(
      file_id: Long,
      rec_type: String,
      record_id: String,
      target_uri: String,
      content_length: Long,
      body: String)

  /** Build one spec-shaped WARC record as a STRING column (cast to
    * binary at the file-assembly step). Declarative on purpose: the
    * record text is a pure `concat`, so the write side stays inside
    * whole-stage codegen and an oracle can rebuild the identical bytes
    * from the same inputs. */
  def record(recType: Column, recordId: Column, targetUri: Column,
      body: Column): Column = {
    // header-bound values must not carry CR/LF: a crawled link with an
    // embedded \r\n would inject header lines (e.g. a second
    // Content-Length), mis-frame the body, and poison every record
    // after it in the file (r11 self-review) — fold any CR/LF run in
    // the header fields to one space, the usual header-sanitizing move
    def hdr(c: Column): Column = regexp_replace(c, "[\\r\\n]+", " ")
    concat(
      lit("WARC/1.0\r\n"),
      lit("WARC-Type: "), hdr(recType), lit("\r\n"),
      lit("WARC-Record-ID: <"), hdr(recordId), lit(">\r\n"),
      lit("WARC-Target-URI: "), hdr(targetUri), lit("\r\n"),
      lit("Content-Length: "), octet_length(body).cast("string"), lit("\r\n"),
      lit("\r\n"),
      body, lit("\r\n\r\n"))
  }

  /** Parse a dataframe of `(fileIdCol: LONG, blobCol: BINARY)` WARC
    * files into one row per well-formed record. STATELESS per-file, so
    * the same call runs unchanged on a Structured Streaming frame (the
    * continuous-crawl ingest path — StreamingSpec pins batch parity
    * across micro-batches). Malformed trailing
    * garbage (a truncated tail record, a bad magic, an unparseable or
    * overrunning Content-Length) ends that FILE's walk — everything
    * already parsed is kept, which is the recovery semantics a crawler
    * wants for a truncated upload. Record order within a file is
    * preserved only as row order within the output partition; carry ids
    * in the records themselves (they do — WARC-Record-ID). */
  def parse(files: DataFrame, fileIdCol: String, blobCol: String): DataFrame = {
    val spark = files.sparkSession
    implicit val enc = Encoders.product[WarcRecord]
    implicit val rowEnc =
      Encoders.tuple(Encoders.scalaLong, Encoders.BINARY)
    files
      .select(col(fileIdCol).cast("long"), col(blobCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, blob) => parseFile(id, blob) }
      .toDF()
  }

  /** Byte-walk one WARC file. Returns the longest well-formed prefix's
    * records (see [[parse]] for the malformed-tail contract). */
  private[graft] def parseFile(fileId: Long,
      blob: Array[Byte]): Iterator[WarcRecord] = {
    if (blob == null) return Iterator.empty
    val out = Seq.newBuilder[WarcRecord]
    var pos = 0
    var ok = true
    while (ok && pos < blob.length) {
      parseOne(fileId, blob, pos) match {
        case Some((rec, next)) => out += rec; pos = next
        case None => ok = false // truncated/malformed tail: stop this file
      }
    }
    out.result().iterator
  }

  private val Magic = "WARC/1.0\r\n".getBytes(StandardCharsets.US_ASCII)

  /** Parse the record starting at `pos`; `None` if it is not a complete
    * well-formed record (including the trailing \r\n\r\n block end). */
  private def parseOne(fileId: Long, blob: Array[Byte],
      pos: Int): Option[(WarcRecord, Int)] = {
    var p = pos
    if (p + Magic.length > blob.length) return None
    var i = 0
    while (i < Magic.length) {
      if (blob(p + i) != Magic(i)) return None
      i += 1
    }
    p += Magic.length
    // header lines until the empty line; headers are ASCII per spec
    var headers = Map.empty[String, String]
    var done = false
    while (!done) {
      val eol = indexOfCrlf(blob, p)
      if (eol < 0) return None
      if (eol == p) { done = true; p += 2 } // empty line: header block over
      else {
        val line = new String(blob, p, eol - p, StandardCharsets.UTF_8)
        val colonAt = line.indexOf(':')
        if (colonAt <= 0) return None
        headers += (line.substring(0, colonAt).trim.toLowerCase ->
          line.substring(colonAt + 1).trim)
        p = eol + 2
      }
    }
    val len = headers.get("content-length")
      .flatMap(s => scala.util.Try(s.toLong).toOption)
      .getOrElse(return None)
    // overflow-proof bounds: `p + len + 4 > blob.length` wraps negative
    // for a crafted Content-Length near Long.MaxValue, slips the guard,
    // and new String throws instead of the documented malformed-tail
    // stop (r11 self-review) — compare without adding to `len`
    if (len < 0 || len > blob.length.toLong - p.toLong - 4L) return None
    val body = new String(blob, p, len.toInt, StandardCharsets.UTF_8)
    p += len.toInt
    // the spec's two CRLF record terminators
    if (blob(p) != '\r' || blob(p + 1) != '\n' ||
      blob(p + 2) != '\r' || blob(p + 3) != '\n') return None
    val rid = headers.getOrElse("warc-record-id", "")
      .stripPrefix("<").stripSuffix(">")
    Some((WarcRecord(fileId, headers.getOrElse("warc-type", ""),
      rid, headers.getOrElse("warc-target-uri", ""), len, body), p + 4))
  }

  private def indexOfCrlf(blob: Array[Byte], from: Int): Int = {
    var p = from
    while (p + 1 < blob.length) {
      if (blob(p) == '\r' && blob(p + 1) == '\n') return p
      p += 1
    }
    -1
  }

  // --------------------------------------------------------------------
  // .warc.gz — the format crawls actually ship (Common Crawl): each
  // record is its OWN gzip member and the members are concatenated, so
  // a reader can seek to any member without decompressing the file.
  // java.util.zip reads multi-member streams natively; nothing beyond
  // the JDK is needed.
  // --------------------------------------------------------------------

  /** Gzip each record string into its own member (the .warc.gz member-
    * per-record convention). Imperative by necessity — compression is a
    * codec, the same justified-`flatMap` category as the parser. Input
    * rows are (groupIdCol, recordCol: STRING, orderCol); output one
    * blob per group id with members in `orderCol` order — the write
    * side of a sharded .warc.gz export. */
  def gzipFiles(records: DataFrame, groupIdCol: String, recordCol: String,
      orderCol: String): DataFrame = {
    val spark = records.sparkSession
    import spark.implicits._
    records
      .groupBy(col(groupIdCol))
      .agg(transform(
        array_sort(collect_list(struct(col(orderCol).as("o"),
          col(recordCol).as("r")))), x => x.getField("r")).as("recs"))
      .select(col(groupIdCol).cast("long"), col("recs"))
      .as[(Long, Seq[String])]
      .map { case (id, recs) =>
        val out = new java.io.ByteArrayOutputStream()
        recs.foreach { rec =>
          val gz = new java.util.zip.GZIPOutputStream(out)
          gz.write(rec.getBytes(StandardCharsets.UTF_8))
          gz.finish()
          // close() releases the native zlib Deflater NOW — finish()
          // alone leaked one Deflater per record to GC finalization,
          // growing off-heap memory on million-record exports (r11
          // self-review); BAOS.close() is a no-op, so the shared
          // output stream is unaffected
          gz.close()
        }
        (id, out.toByteArray)
      }
      .toDF(groupIdCol, "payload")
  }

  /** Parse a `.warc.gz` file column: inflate the multi-member stream
    * (each record its own gzip member, per the Common Crawl layout —
    * but any member split works, java.util.zip reads them all), then
    * byte-walk the records exactly as [[parse]]. Truncated or corrupt
    * COMPRESSED tails end that file's walk with everything already
    * inflated kept — the same longest-well-formed-prefix recovery as
    * the plain parser, one layer down. */
  def parseGzip(files: DataFrame, fileIdCol: String,
      blobCol: String): DataFrame = {
    val spark = files.sparkSession
    implicit val enc = Encoders.product[WarcRecord]
    implicit val rowEnc =
      Encoders.tuple(Encoders.scalaLong, Encoders.BINARY)
    files
      .select(col(fileIdCol).cast("long"), col(blobCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, gz) => parseFile(id, inflateAll(gz)) }
      .toDF()
  }

  /** Decompression cap for [[inflateAll]]: a crawl container is at
    * most ~1 GB compressed by convention, so 1 GiB of inflated output
    * is already past any legitimate single file — beyond it we are
    * being zip-bombed (a few KB of crafted gzip can claim petabytes)
    * and the walk stops with the prefix, exactly like a truncated
    * file. The cap must sit WELL below ~2 GiB: ByteArrayOutputStream
    * cannot grow past Int.MaxValue and dies with OutOfMemoryError (an
    * Error the IOException recovery never catches), so a 4 GiB cap was
    * unreachable — the bomb crashed the executor before the guard
    * fired (r11 self-review). */
  private val MaxInflatedBytes: Long = 1L << 30

  /** Inflate a (possibly multi-member) gzip blob; a corrupt or
    * truncated tail — or output beyond [[MaxInflatedBytes]] (gzip
    * bomb) — yields the bytes inflated so far. */
  private[graft] def inflateAll(gz: Array[Byte],
      maxBytes: Long = MaxInflatedBytes): Array[Byte] = {
    if (gz == null || gz.length == 0) return Array.emptyByteArray
    val out = new java.io.ByteArrayOutputStream()
    try {
      val in = new java.util.zip.GZIPInputStream(
        new java.io.ByteArrayInputStream(gz))
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n >= 0 && out.size() + n <= maxBytes) {
        out.write(buf, 0, n); n = in.read(buf)
      }
    } catch { case _: java.io.IOException => () } // keep the good prefix
    out.toByteArray
  }
}
