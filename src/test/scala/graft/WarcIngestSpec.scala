package graft

import org.apache.spark.sql.functions._
import graft.ingest.WarcIngest

/** Crafted-fixture contracts for the WARC/WET container walk (VERDICT
  * r12 task 4): multi-record and multi-container parsing, HTTP envelope
  * extraction, WET conversion records, structural-record census,
  * charset handling, and every quarantine path — truncated header,
  * truncated payload, missing Content-Length, bad HTTP envelope — each
  * quarantining WITHOUT throwing and without polluting clean rows. The
  * end-to-end round-trip gate is q232's DuckDB oracle (the oracle never
  * sees the WARC bytes or the HTML).
  */
class WarcIngestSpec extends SparkSpec {

  private val ts = "2024-03-05T12:00:00Z"

  private def parse(bytes: Array[Byte]) = WarcIngest.parseContainer(0L, bytes)

  test("multi-record container: warcinfo census + two pages in order") {
    val c = WarcIngest.warcinfoRecord(ts) ++
      WarcIngest.responseRecord("https://a.test/1", ts, "<p>one</p>") ++
      WarcIngest.responseRecord("https://a.test/2", ts, "<p>two</p>")
    val rows = parse(c)
    assert(rows.map(_.warc_type) == Seq("warcinfo", "response", "response"))
    assert(rows.forall(_.reason == null))
    assert(rows(0).body_text == null) // structural: census row, no body
    assert(rows(1).url == "https://a.test/1" && rows(1).http_status == 200)
    assert(rows(1).body_text == "<p>one</p>" && rows(2).body_text == "<p>two</p>")
    assert(rows.map(_.rec_idx) == Seq(0, 1, 2))
    assert(rows.forall(_.fetch_ts == ts))
  }

  test("WET conversion records carry the payload as text, status -1") {
    val c = WarcIngest.conversionRecord("https://a.test/1", ts, "plain text here") ++
      WarcIngest.conversionRecord("https://a.test/2", ts, "unicode é中")
    val rows = parse(c)
    assert(rows.map(_.body_text) == Seq("plain text here", "unicode é中"))
    assert(rows.forall(r => r.http_status == -1 && r.reason == null &&
      r.warc_type == "conversion"))
  }

  test("truncated tail quarantines the remainder; prior records unaffected") {
    val good = WarcIngest.responseRecord("https://a.test/1", ts, "<p>ok</p>")
    val c = good ++ ("WARC/1.0\r\nWARC-Type: response\r\n" +
      "Content-Length: 999999\r\n\r\nshort").getBytes("US-ASCII")
    val rows = parse(c)
    assert(rows.size == 2)
    assert(rows(0).reason == null && rows(0).body_text == "<p>ok</p>")
    assert(rows(1).reason == "truncated_payload" && rows(1).body_text == null)
  }

  test("missing Content-Length and non-WARC garbage quarantine, never throw") {
    val noLen = ("WARC/1.0\r\nWARC-Type: response\r\n" +
      "WARC-Target-URI: x\r\n\r\npayload").getBytes("US-ASCII")
    assert(parse(noLen).map(_.reason) == Seq("missing_length"))
    val garbage = "this is not a warc file at all".getBytes("US-ASCII")
    assert(parse(garbage).map(_.reason) == Seq("truncated_header"))
    // header block never closes
    val openHdr = "WARC/1.0\r\nWARC-Type: response\r\n".getBytes("US-ASCII")
    assert(parse(openHdr).map(_.reason) == Seq("truncated_header"))
    assert(parse(Array.emptyByteArray).isEmpty)
  }

  test("bad HTTP envelope quarantines that record and the walk continues") {
    // a response record whose payload is NOT an HTTP message — framing
    // is intact (Content-Length correct), so the NEXT record still parses
    val payload = "NOT-HTTP garbage body".getBytes("US-ASCII")
    val bad = (s"WARC/1.0\r\nWARC-Type: response\r\n" +
      s"WARC-Target-URI: https://bad.test/\r\nWARC-Date: $ts\r\n" +
      s"Content-Type: application/http;msgtype=response\r\n" +
      s"Content-Length: ${payload.length}\r\n\r\n").getBytes("US-ASCII") ++
      payload ++ "\r\n\r\n".getBytes("US-ASCII")
    val c = bad ++ WarcIngest.responseRecord("https://a.test/2", ts, "<p>after</p>")
    val rows = parse(c)
    assert(rows.size == 2)
    assert(rows(0).reason == "bad_http" && rows(0).url == "https://bad.test/")
    assert(rows(1).reason == null && rows(1).body_text == "<p>after</p>")
  }

  test("charset parameter is honored: latin-1 bodies decode correctly") {
    val body = "café".getBytes("ISO-8859-1") // é = 0xE9, invalid as UTF-8
    val http = (s"HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=ISO-8859-1\r\n" +
      s"Content-Length: ${body.length}\r\n\r\n").getBytes("US-ASCII") ++ body
    val rec = (s"WARC/1.0\r\nWARC-Type: response\r\n" +
      s"WARC-Target-URI: https://l1.test/\r\nWARC-Date: $ts\r\n" +
      s"Content-Type: application/http;msgtype=response\r\n" +
      s"Content-Length: ${http.length}\r\n\r\n").getBytes("US-ASCII") ++
      http ++ "\r\n\r\n".getBytes("US-ASCII")
    val rows = parse(rec)
    assert(rows.head.body_text == "café")
    // and garbage bytes under a utf-8 declaration REPLACE, never throw:
    // mangle the second body byte ('k' of "ok"; the record tail is
    // body(2) + CRLF CRLF(4), so it sits at length - 5)
    val utf8Rec = WarcIngest.responseRecord("https://u.test/", ts, "ok")
    val mangled = utf8Rec.updated(utf8Rec.length - 5, 0xE9.toByte)
    val mrow = parse(mangled).head
    assert(mrow.reason == null && mrow.body_text == "o�")
  }

  test("distributed walk: readWarc + htmlResponses over multiple containers") {
    import spark.implicits._
    val c0 = WarcIngest.warcinfoRecord(ts) ++
      WarcIngest.responseRecord("https://a.test/1", ts, "<p>alpha</p>") ++
      WarcIngest.responseRecord("https://a.test/2", ts, "<p>beta</p>", status = 404)
    val c1 = WarcIngest.responseRecord("https://b.test/3", ts, "<p>gamma</p>") ++
      ("WARC/1.0\r\nbroken").getBytes("US-ASCII")
    val df = Seq((0L, c0), (1L, c1)).toDF("cid", "warc")
    val recs = WarcIngest.readWarc(df, "cid", "warc")
    assert(recs.count() == 5) // 1 warcinfo + 3 responses + 1 quarantine
    assert(recs.filter(col("reason").isNotNull).count() == 1)
    // only clean 200 HTML pages reach the stage-0 kernel: the 404 drops
    val pages = WarcIngest.htmlResponses(recs)
      .collect().map(r => r.getString(0) -> r.getString(2)).toMap
    assert(pages == Map(
      "https://a.test/1" -> "<p>alpha</p>",
      "https://b.test/3" -> "<p>gamma</p>"))
  }

  test("folded header continuation lines parse (obsolete but crawled)") {
    val payload = "x".getBytes("US-ASCII")
    val rec = ("WARC/1.0\r\nWARC-Type: metadata\r\n" +
      "WARC-Target-URI: https://fold.test/a\r\n" +
      "X-Long: part one\r\n part two\r\n" +
      s"Content-Length: ${payload.length}\r\n\r\n").getBytes("US-ASCII") ++
      payload ++ "\r\n\r\n".getBytes("US-ASCII")
    val rows = parse(rec)
    assert(rows.head.reason == null && rows.head.warc_type == "metadata" &&
      rows.head.url == "https://fold.test/a")
  }
}
