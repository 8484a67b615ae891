package graft.ingest

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** WARC/WET container ingest — stage -1 of the web-corpus funnel
  * (VERDICT r12 task 4): production crawls deliver WARC record streams
  * (ISO 28500: `WARC/1.0` header block, `Content-Length` framing, CRLF
  * record separators), not loose HTML strings. This walks each container
  * ROW-LOCALLY (the established PngCodec/Multimodal binary-decode shape:
  * mapPartitions, no UDF registry, constant memory per task), emits one
  * row per record, and QUARANTINES everything that does not parse —
  * truncated tails, missing/garbled Content-Length, bad HTTP envelopes —
  * with a reason string, never a throw (the q112/JsonlIngest convention:
  * a 100 TB crawl WILL contain garbage and a single bad byte must not
  * kill a task).
  *
  * Record kinds handled:
  *   - `response` with an `application/http` payload: the HTTP envelope
  *     is parsed (status line, headers, body); the body is decoded via
  *     the Content-Type charset parameter (utf-8 default, latin-1 and
  *     ascii honored, unknown charsets fall back to utf-8) with
  *     malformed-input REPLACEMENT — total, never a throw;
  *   - `conversion` (the WET shape): payload IS the extracted text —
  *     decoded the same way, http_status = -1;
  *   - `warcinfo` / `request` / `metadata`: structural records — carried
  *     through with their type and a NULL body so downstream filters see
  *     the full container census (dropping them silently would hide a
  *     mis-framed container from the audit).
  *
  * Charset note: decode replacement makes the walk total but is lossy on
  * genuinely non-UTF-8 bytes declared as UTF-8 — the standard crawl
  * trade; the quarantine keeps the raw offsets so a replay with a better
  * sniffer is possible.
  */
object WarcIngest {

  /** One parsed record (or quarantined span) of a WARC container.
    * `reason` is NULL for clean rows; non-null marks quarantine
    * (`truncated_header`, `missing_length`, `truncated_payload`,
    * `bad_http`). `body_text` is NULL for structural and quarantined
    * records. */
  final case class WarcRow(
      container_id: Long,
      rec_idx: Int,
      warc_type: String,
      url: String,
      fetch_ts: String,
      http_status: Int, // -1 when the payload is not an HTTP response
      content_type: String,
      body_text: String,
      reason: String)

  private val Crlf2 = "\r\n\r\n".getBytes("US-ASCII")

  /** Index of `pat` in `b` within [from, until), or -1. */
  private def indexOf(b: Array[Byte], pat: Array[Byte], from: Int, until: Int): Int = {
    var i = from
    val last = until - pat.length
    while (i <= last) {
      var j = 0
      while (j < pat.length && b(i + j) == pat(j)) j += 1
      if (j == pat.length) return i
      i += 1
    }
    -1
  }

  private def ascii(b: Array[Byte], from: Int, until: Int): String =
    new String(b, from, until - from, java.nio.charset.StandardCharsets.US_ASCII)

  /** Parse a CRLF-separated header block into lowercase-key pairs.
    * Folded continuation lines (obsolete but present in old crawls) are
    * appended to the previous value. */
  private def parseHeaders(block: String): Map[String, String] = {
    val out = scala.collection.mutable.LinkedHashMap.empty[String, String]
    var lastKey: String = null
    block.split("\r\n").foreach { line =>
      if (line.nonEmpty) {
        if ((line.charAt(0) == ' ' || line.charAt(0) == '\t') && lastKey != null) {
          out(lastKey) = out(lastKey) + " " + line.trim
        } else {
          val c = line.indexOf(':')
          if (c > 0) {
            val k = line.substring(0, c).trim.toLowerCase(java.util.Locale.ROOT)
            out(k) = line.substring(c + 1).trim
            lastKey = k
          }
        }
      }
    }
    out.toMap
  }

  /** Total charset resolution from a Content-Type value. */
  private def charsetOf(contentType: String): java.nio.charset.Charset = {
    val m = java.util.regex.Pattern.compile("charset=\"?([A-Za-z0-9_.:-]+)\"?",
      java.util.regex.Pattern.CASE_INSENSITIVE).matcher(contentType)
    val name = if (m.find()) m.group(1) else "utf-8"
    try java.nio.charset.Charset.forName(name)
    catch { case _: Exception => java.nio.charset.StandardCharsets.UTF_8 }
  }

  /** Lossless-on-valid, total-on-garbage text decode. */
  private def decodeText(b: Array[Byte], from: Int, until: Int,
      cs: java.nio.charset.Charset): String = {
    val dec = cs.newDecoder()
      .onMalformedInput(java.nio.charset.CodingErrorAction.REPLACE)
      .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPLACE)
    dec.decode(java.nio.ByteBuffer.wrap(b, from, until - from)).toString
  }

  /** Walk one container; pure function of the bytes (deterministic under
    * any partitioning/retry). Framing failures quarantine the REMAINDER
    * of the container as one row and stop — without a trustworthy
    * Content-Length there is no record boundary to resync on (scanning
    * for the next `WARC/` magic would happily resync INSIDE a payload
    * that embeds another WARC file; the conservative stop is the
    * correctness-first choice and the quarantine row keeps the census
    * honest). */
  def parseContainer(containerId: Long, bytes: Array[Byte]): Seq[WarcRow] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[WarcRow]
    var pos = 0
    var idx = 0
    val n = bytes.length
    def quarantine(reason: String): Unit = {
      out += WarcRow(containerId, idx, null, null, null, -1, null, null, reason)
      idx += 1
    }
    while (pos < n) {
      // skip inter-record CRLFs
      while (pos < n && (bytes(pos) == '\r' || bytes(pos) == '\n')) pos += 1
      if (pos >= n) return out.toSeq
      if (!ascii(bytes, pos, math.min(pos + 5, n)).startsWith("WARC/")) {
        quarantine("truncated_header"); return out.toSeq
      }
      val hdrEnd = indexOf(bytes, Crlf2, pos, n)
      if (hdrEnd < 0) { quarantine("truncated_header"); return out.toSeq }
      val headers = parseHeaders(ascii(bytes, pos, hdrEnd))
      val lenOpt = headers.get("content-length").flatMap(v =>
        try Some(v.toLong) catch { case _: Exception => None })
      lenOpt match {
        case None => quarantine("missing_length"); return out.toSeq
        // overflow-safe form: `hdrEnd + 4 + len > n` wraps negative for a
        // garbled near-Long.MAX Content-Length and would BYPASS the
        // quarantine (review r13); the subtraction form cannot overflow
        // (n, hdrEnd are ints)
        case Some(len) if len < 0 || len > n.toLong - hdrEnd - 4 =>
          quarantine("truncated_payload"); return out.toSeq
        case Some(len) =>
          val p0 = hdrEnd + 4
          val p1 = (p0 + len).toInt
          val wtype = headers.getOrElse("warc-type", "unknown")
            .toLowerCase(java.util.Locale.ROOT)
          val url = headers.getOrElse("warc-target-uri", null)
          val ts = headers.getOrElse("warc-date", null)
          val wct = headers.getOrElse("content-type", "")
          if (wtype == "response" &&
            wct.toLowerCase(java.util.Locale.ROOT).startsWith("application/http")) {
            // HTTP envelope: status line + headers + body
            val httpHdrEnd = indexOf(bytes, Crlf2, p0, p1)
            val statusLine = if (httpHdrEnd < 0) ""
              else ascii(bytes, p0, math.min(p0 + 64, httpHdrEnd))
                .takeWhile(_ != '\r')
            val sm = java.util.regex.Pattern
              .compile("^HTTP/[0-9.]+ ([0-9]{3})").matcher(statusLine)
            if (httpHdrEnd < 0 || !sm.find()) {
              out += WarcRow(containerId, idx, wtype, url, ts, -1, null, null,
                "bad_http")
              idx += 1
            } else {
              val status = sm.group(1).toInt
              val httpHeaders = parseHeaders(ascii(bytes, p0, httpHdrEnd))
              val ct = httpHeaders.getOrElse("content-type", "")
              val body = decodeText(bytes, httpHdrEnd + 4, p1, charsetOf(ct))
              out += WarcRow(containerId, idx, wtype, url, ts, status, ct,
                body, null)
              idx += 1
            }
          } else if (wtype == "conversion") {
            // WET: the payload IS the extracted text
            val body = decodeText(bytes, p0, p1, charsetOf(wct))
            out += WarcRow(containerId, idx, wtype, url, ts, -1, wct, body, null)
            idx += 1
          } else {
            // structural record: census row, no body
            out += WarcRow(containerId, idx, wtype, url, ts, -1, wct, null, null)
            idx += 1
          }
          pos = p1
      }
    }
    out.toSeq
  }

  /** Distributed container walk: (id, warc bytes) → one row per record/
    * quarantined span. Row-local mapPartitions — each container parses
    * entirely inside its task, so the operator scales with container
    * COUNT (at 100 TB: one ~1 GiB WARC per row, tasks sized by
    * maxPartitionBytes), and a corrupt container costs its own rows
    * only. */
  def readWarc(containers: DataFrame, idCol: String, binCol: String): DataFrame = {
    val spark = containers.sparkSession
    import spark.implicits._
    containers.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        parseContainer(id, Option(bytes).getOrElse(Array.emptyByteArray))
      })
      .toDF()
  }

  /** The response-record funnel head: clean 200s whose payload declares
    * HTML, as (url, fetch_ts, html) — exactly what the q222 stage-0
    * kernel consumes. */
  def htmlResponses(records: DataFrame): DataFrame =
    records.filter(col("reason").isNull && col("warc_type") === "response" &&
        col("http_status") === 200 &&
        lower(col("content_type")).contains("text/html"))
      .select(col("url"), col("fetch_ts"), col("body_text").as("html"))

  // ---- deterministic container builder (fixtures + the q232 surface) --

  private def asciiBytes(s: String): Array[Byte] = s.getBytes("US-ASCII")

  /** One well-formed WARC response record carrying an HTML payload. */
  def responseRecord(url: String, ts: String, html: String,
      status: Int = 200, contentType: String = "text/html; charset=utf-8"): Array[Byte] = {
    val body = html.getBytes("UTF-8")
    val http = asciiBytes(s"HTTP/1.1 $status OK\r\nContent-Type: $contentType\r\n" +
      s"Content-Length: ${body.length}\r\n\r\n") ++ body
    asciiBytes(s"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: $url\r\n" +
      s"WARC-Date: $ts\r\nContent-Type: application/http;msgtype=response\r\n" +
      s"Content-Length: ${http.length}\r\n\r\n") ++ http ++ asciiBytes("\r\n\r\n")
  }

  /** A warcinfo record (the standard container preamble). */
  def warcinfoRecord(ts: String): Array[Byte] = {
    val payload = asciiBytes("software: graft-fixture\r\n")
    asciiBytes(s"WARC/1.0\r\nWARC-Type: warcinfo\r\nWARC-Date: $ts\r\n" +
      s"Content-Type: application/warc-fields\r\n" +
      s"Content-Length: ${payload.length}\r\n\r\n") ++ payload ++
      asciiBytes("\r\n\r\n")
  }

  /** A WET conversion record (payload = extracted plain text). */
  def conversionRecord(url: String, ts: String, text: String): Array[Byte] = {
    val payload = text.getBytes("UTF-8")
    asciiBytes(s"WARC/1.0\r\nWARC-Type: conversion\r\nWARC-Target-URI: $url\r\n" +
      s"WARC-Date: $ts\r\nContent-Type: text/plain; charset=utf-8\r\n" +
      s"Content-Length: ${payload.length}\r\n\r\n") ++ payload ++
      asciiBytes("\r\n\r\n")
  }

  /** Pack `(cid, doc_id, payload)` page rows into real multi-record WARC
    * containers — one container per `cid`: warcinfo preamble, one
    * Content-Length-framed record per page (response or WET conversion),
    * optionally a planted truncated tail the walk must quarantine. The
    * SINGLE owner of the container-assembly shape (q232/q234, the funnel
    * stage -1, the scale-curve cell all packed their own copies before —
    * review r13): pages are sorted by doc_id inside each group so the
    * container bytes are deterministic, and groups are bounded by the
    * caller's cid assignment (pages-per-container), so the per-group
    * buffer is constant-size at any corpus scale.
    */
  def packContainers(pages: DataFrame, ts: String, urlOf: Long => String,
      conversion: Boolean = false,
      plantTruncatedTail: Boolean = false): DataFrame = {
    val spark = pages.sparkSession
    import spark.implicits._
    pages.as[(Long, Long, String)]
      .groupByKey(_._1)
      .mapGroups { (cid: Long, it: Iterator[(Long, Long, String)]) =>
        val rows = it.toSeq.sortBy(_._2)
        val records = rows.toArray.flatMap { case (_, id, payload) =>
          if (conversion) conversionRecord(urlOf(id), ts, payload)
          else responseRecord(urlOf(id), ts, payload)
        }
        val tail = if (plantTruncatedTail)
          asciiBytes("WARC/1.0\r\nWARC-Type: response\r\n" +
            "Content-Length: 999999\r\n\r\nshort")
        else Array.emptyByteArray
        (cid, warcinfoRecord(ts) ++ records ++ tail)
      }.toDF("cid", "warc")
  }
}
