package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import graft.functions.HtmlExtract

/** Crafted-fixture contracts for the html_to_text stage-0 kernel
  * (VERDICT r11 task 6): nav/footer/script/style/head boilerplate
  * dropped, body text preserved in document order, entities decoded,
  * and the interpreted and codegen paths agree. The end-to-end
  * round-trip gate is q222's DuckDB oracle (the oracle collapses the
  * raw text and never sees the HTML).
  */
class HtmlExtractSpec extends SparkSpec {

  private def extract(html: String): String =
    HtmlExtract.kernel(UTF8String.fromString(html)).toString

  test("boilerplate dropped, body preserved in order") {
    val html =
      """<html><head><title>Site</title><style>p{x:1}</style>
        |<script>var a = "<p>not text</p>";</script></head>
        |<body><nav><a href="/">Home</a> <a href="/x">Products</a></nav>
        |<h1>The headline</h1>
        |<p>First paragraph with an <a href="/in">inline link</a> inside.</p>
        |<p>Second   paragraph,
        |   wrapped lines.</p>
        |<footer><a href="/tos">Terms</a> <a href="/p">Privacy</a></footer>
        |</body></html>""".stripMargin
    assert(extract(html) ==
      "The headline First paragraph with an inline link inside. " +
        "Second paragraph, wrapped lines.")
  }

  test("entities decode; stray ampersands and angle brackets stay literal") {
    assert(extract("<p>a &amp; b &lt;tag&gt; &quot;q&quot; &#65;&#x42; &nbsp;c</p>") ==
      "a & b <tag> \"q\" AB c")
    assert(extract("<p>AT&T and a < b</p>") == "AT&T and a < b")
    assert(extract("<p>broken &unknownentity; stays</p>") ==
      "broken &unknownentity; stays")
  }

  test("quoted '>' inside attributes does not truncate the tag") {
    assert(extract("""<p><img alt="a>b" src="x.png">text after</p>""") ==
      "text after")
  }

  test("comments and unterminated structures are safe") {
    assert(extract("<p>keep <!-- drop <p>this</p> --> both</p>") == "keep both")
    assert(extract("<p>tail <!-- never closed") == "tail")
    assert(extract("<p>open <script>never closed") == "open")
  }

  test("unterminated <head> implicitly closes at <body> (ADVICE r12)") {
    // malformed crawled page: no </head> — the body must survive
    assert(extract("<html><head><title>T</title><body><p>Body kept</p></body>") ==
      "Body kept")
    // <body with attributes, mixed case
    assert(extract("<head><title>T</title><BODY class=\"x\"><p>Still here</p>") ==
      "Still here")
    // a tag merely PREFIXED by 'body' must not end the skip
    assert(extract("<head><bodyguard>nope</bodyguard><body><p>ok</p>") == "ok")
    // genuinely headless head with no body at all: whole doc is head
    assert(extract("<head><title>T</title><meta x=1>") == "")
  }

  test("literal '<body'/'</head>' inside head scripts never ends the head (review r13)") {
    // document.write("<body ...>") is common real markup: the implicit-
    // close rule must not fire inside a head script string
    assert(extract("<head><script>document.write(\"<body onload=x>\");" +
      "</script><title>T</title></head><body><p>Real</p></body>") == "Real")
    // nor may a literal '</head>' in a script string end the head early
    assert(extract("<head><script>var s = \"</head><p>leak</p>\";</script>" +
      "</head><body><p>Only this</p></body>") == "Only this")
    // same for <style> payloads
    assert(extract("<head><style>/* <body> */ p{}</style></head>" +
      "<body><p>Kept</p></body>") == "Kept")
    // an unterminated nested script still swallows the rest (the
    // documented unterminated-structure behavior, unchanged)
    assert(extract("<head><script>var x = '<body>'") == "")
    // and a REAL <body> after a terminated head script still closes an
    // unterminated head implicitly
    assert(extract("<head><script>var b = \"<body>\";</script>" +
      "<body><p>Implicit</p>") == "Implicit")
  }

  test("self-closing/commented/attr-quoted script markup never swallows the body (review r13)") {
    // XHTML-style self-closing <script/> in head: opens no raw-text span
    assert(extract("<head><script src=\"x.js\"/></head><body><p>T</p></body>") == "T")
    // self-closing <script/> in BODY: same rule on the main-loop path
    assert(extract("<p>before</p><script src=\"x.js\"/><p>after</p>") ==
      "before after")
    // commented-out script (no close tag inside the comment): comments
    // are opaque during the head skip
    assert(extract("<head><!-- <script src=a.js> --></head><body><p>T</p></body>") == "T")
    // a commented '<body' must not implicitly close the head either
    assert(extract("<head><!-- <body> --><title>x</title></head>" +
      "<body><p>Real</p></body>") == "Real")
    // '<script' inside a quoted attribute of another head tag: the tag
    // is consumed whole, the attr text never matches
    assert(extract("<head><meta content=\"use <script> tags\"></head>" +
      "<body><p>Kept</p></body>") == "Kept")
    // and '<body' inside a quoted attribute must not end the head
    assert(extract("<head><meta content=\"x <body> y\"><title>t</title>" +
      "</head><body><p>Still</p></body>") == "Still")
    // self-closing <head/>: no head span at all, following content kept
    assert(extract("<head/><body><p>Open</p></body>") == "Open")
  }

  test("raw-text skips stay pure; malformed head markup still recovers (review r13 rd3)") {
    // minified JS comparison operators: '<n' inside script content must
    // NOT be parsed as a tag — only '</script' ends raw text
    assert(extract("<p>before</p><script>if(i<n)f();</script><p>after</p>") ==
      "before after")
    // same inside a head script
    assert(extract("<head><script>if(a<b){c()}</script></head>" +
      "<body><p>T</p></body>") == "T")
    // a '<!--' in script content is raw text, not a comment — the close
    // tag still ends the element
    assert(extract("<script>var s = \"<!--\";</script><p>after</p>") == "after")
    // broken attribute quoting in head markup: char-step recovery must
    // still find '</head>' instead of consuming the document
    assert(extract("<head><meta content=\"oops></head><body><p>T</p></body>") == "T")
    // ...and the implicit-close path recovers the same way
    assert(extract("<head><meta content=\"oops><body><p>Kept</p>") == "Kept")
  }

  test("link-density rule: link lists drop, linky-but-texty blocks survive") {
    // all-link block: dropped
    assert(extract("""<div><a href="/a">One</a> <a href="/b">Two</a></div>""") == "")
    // anchor text under a third of the block: kept, anchors inlined
    assert(extract(
      """<div>A long sentence of body prose that has one <a href="/x">tiny</a>
        | link within it and plenty of surrounding words.</div>""".stripMargin)
      .startsWith("A long sentence"))
    // exactly at the 1/3 threshold: dropped (>= is boilerplate)
    assert(extract("""<div><a href="/x">ab</a>cdef</div>""") == "")
  }

  test("doctype/PI/CDATA are markup, self-closing anchors don't poison link depth") {
    // every real crawled page starts with a doctype — it must never leak
    assert(extract("<!DOCTYPE html><html><body><p>Hi</p></body></html>") == "Hi")
    assert(extract("""<?xml version="1.0"?><p>x</p>""") == "x")
    // CDATA wrapper is markup, payload is literal text
    assert(extract("<p>a <![CDATA[b <raw> c]]> d</p>") == "a b <raw> c d")
    assert(extract("<p>tail <![CDATA[never closed") == "tail never closed")
    // a self-closing <a/> opens nothing: later text is NOT link text
    assert(extract(
      """<p><a href="/x"/>all of this body text must survive the density rule
        | because the anchor closed itself</p>""".stripMargin)
      .startsWith("all of this body text"))
  }

  test("interpreted path (codegen off) agrees with codegen path") {
    import spark.implicits._
    val html = Seq(
      """<html><head><script>x<1</script></head><body><nav><a href="/">N</a></nav><p>Alpha &amp; beta</p></body>""",
      """<p>plain</p>""",
      """<div><a href="/">only links</a></div>""").toDF("h")
    val expr = HtmlExtract.htmlToText(col("h"))
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    val interpreted =
      try html.select(expr).collect().map(_.getString(0)).toSeq
      finally {
        spark.conf.set("spark.sql.codegen.wholeStage", "true")
        spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
      }
    val codegen = html.select(expr).collect().map(_.getString(0)).toSeq
    assert(interpreted == codegen)
    assert(codegen == Seq("Alpha & beta", "plain", ""))
  }
}
