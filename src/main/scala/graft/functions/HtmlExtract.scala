package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `html_to_text(html)`: web-page → training-text extraction — stage 0
  * of a real web-corpus ingestion funnel (VERDICT r11 task 6). One scan:
  *
  *   - drops `<head>` content, `<script>`/`<style>` bodies, comments,
  *     and every tag (quote-aware, so `>` inside attribute values does
  *     not truncate a tag);
  *   - decodes the common entities (`&amp; &lt; &gt; &quot; &apos;
  *     &nbsp;` and numeric `&#N;` / `&#xN;`);
  *   - segments text into BLOCKS at block-level tags and applies the
  *     classic link-density boilerplate rule (boilerpipe/Arc90 family):
  *     a block whose anchor text is a third or more of its non-space
  *     characters is navigation/footer chrome, not content, and is
  *     dropped — body paragraphs keep their inline anchor text;
  *   - collapses whitespace (`[ \t\n\f\r]+` → one space, trimmed)
  *     and joins kept blocks with single spaces, preserving document
  *     order.
  *
  * A Catalyst `Expression` (SURVEY §2 custom-op preference (b)): pure
  * row-local string work, zero shuffles, stays inside whole-stage
  * codegen — the 100 TB shape for a per-document stage-0 transform.
  */
object HtmlExtract {

  def htmlToText(html: Column): Column =
    org.apache.spark.sql.GraftShim.column(
      HtmlToTextExpr(org.apache.spark.sql.GraftShim.expression(html)))

  /** Anchor-text share (in non-space chars) at or above which a block
    * is boilerplate: drop when linkChars/solidChars >= 1/3. Keeps body
    * paragraphs with a few inline links, drops nav/footer link lists
    * (density ~1). */
  private val LinkDensityDen = 3

  private val BlockTags: Set[String] = Set(
    "p", "div", "li", "ul", "ol", "h1", "h2", "h3", "h4", "h5", "h6",
    "br", "hr", "tr", "td", "th", "table", "thead", "tbody", "tfoot",
    "article", "section", "header", "footer", "nav", "main", "aside",
    "blockquote", "pre", "title", "body", "html", "form", "fieldset",
    "figure", "figcaption", "dl", "dt", "dd", "address", "center")

  @inline private def isWs(c: Char): Boolean = // Java regex \s
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  /** Kernel body, called from both interpreted eval and generated code. */
  def kernel(html: UTF8String): UTF8String = {
    val s = html.toString
    val n = s.length
    val out = new java.lang.StringBuilder(n / 2)
    val block = new java.lang.StringBuilder(256)
    var linkChars = 0  // non-space chars appended while inside <a>
    var solidChars = 0 // all non-space chars in the current block
    var linkDepth = 0

    def flushBlock(): Unit = {
      // density over non-space chars: nav/footer link lists are dropped,
      // body paragraphs (low anchor share) kept — including anchor text.
      // Drop iff linkChars/solidChars >= 1/LinkDensityDen.
      val keep = solidChars > 0 &&
        linkChars.toLong * LinkDensityDen < solidChars.toLong
      if (keep) {
        // collapse whitespace runs to one space, trim the block, and
        // join onto the output with a single separator
        var i = 0
        var sawWs = false
        var started = false
        while (i < block.length) {
          val c = block.charAt(i)
          if (isWs(c)) sawWs = true
          else {
            if (!started) { if (out.length > 0) out.append(' ') }
            else if (sawWs) out.append(' ')
            out.append(c)
            started = true
            sawWs = false
          }
          i += 1
        }
      }
      block.setLength(0)
      linkChars = 0
      solidChars = 0
    }

    def appendText(c: Char): Unit = {
      block.append(c)
      if (!isWs(c)) {
        solidChars += 1
        if (linkDepth > 0) linkChars += 1
      }
    }

    // case-insensitive search for `</name` from `from`; returns the index
    // AFTER the closing '>' of that end tag (or n if unterminated).
    // `stopAtOpen` (when non-null) mirrors real parsers' implicit-close
    // rule: an opening `<stopAtOpen` tag ends the skip AT the '<' so the
    // tag itself is then processed normally — an unterminated <head> on
    // a malformed crawled page must not swallow the whole body
    // (ADVICE r12, low).
    // Quote-aware scan from `k0` (a position inside a tag, before its
    // '>') to the character AFTER the tag's '>'. ONE owner for the
    // tag-end state machine (the main loop and every skip path share it
    // — review r13: a hand-rolled copy drifted and lost the self-closing
    // test). Packed return to stay allocation-free in the per-tag hot
    // path: bits 1+ = after-tag position, bit 0 = self-closing ('/' was
    // the last solid char before '>', outside quotes).
    // packed: bits 2+ = after-tag position, bit 1 = a '>' was found
    // (tag terminated), bit 0 = self-closing
    def scanTagEnd(k0: Int): Long = {
      var quote: Char = 0
      var k = k0
      var done = false
      var lastSolid: Char = 0
      while (k < n && !done) {
        val ch = s.charAt(k)
        if (quote != 0) { if (ch == quote) quote = 0 }
        else if (ch == '"' || ch == '\'') { quote = ch; lastSolid = ch }
        else if (ch == '>') done = true
        else if (!isWs(ch)) lastSolid = ch
        k += 1
      }
      val after = if (done) k else n
      (after.toLong << 2) | (if (done) 2L else 0L) |
        (if (done && lastSolid == '/') 1L else 0L)
    }

    def skipToCloseTag(name: String, from: Int, stopAtOpen: String = null): Int = {
      var i = from
      val target = "</" + name
      val stop = if (stopAtOpen == null) null else "<" + stopAtOpen
      // Two modes (review r13, rounds 2+3). RAW-TEXT mode (script/style):
      // per HTML5 the content has no tag/comment structure — ONLY the
      // matching close tag ends the element, so the loop must not
      // interpret '<!--' or '<ident' (minified JS is full of 'i<n')
      // inside it. STRUCTURED mode (head): comments are opaque, nested
      // raw-text elements are jumped (document.write("<body>") must not
      // implicitly close the head), and other tags are consumed whole so
      // a '<script'/'<body' inside a quoted attribute cannot false-match.
      val structured = name == "head"
      val nested = if (structured) Seq("script", "style") else Nil
      while (i < n) {
        if (s.charAt(i) == '<') {
          if (structured && s.regionMatches(false, i, "<!--", 0, 4)) {
            val end = s.indexOf("-->", i + 4)
            i = if (end < 0) n else end + 3
          } else if (i + target.length <= n &&
            s.regionMatches(true, i, target, 0, target.length)) {
            var j = i + target.length
            while (j < n && s.charAt(j) != '>') j += 1
            return math.min(j + 1, n)
          } else if (!structured) {
            i += 1
          } else if (stop != null && i + stop.length <= n &&
            s.regionMatches(true, i, stop, 0, stop.length) &&
            (i + stop.length == n || !s.charAt(i + stop.length).isLetterOrDigit)) {
            return i
          } else {
            val inner = nested.find(t => i + 1 + t.length <= n &&
              s.regionMatches(true, i + 1, t, 0, t.length) &&
              (i + 1 + t.length == n || !s.charAt(i + 1 + t.length).isLetterOrDigit))
            if (inner.isDefined) {
              val res = scanTagEnd(i + 1 + inner.get.length)
              // a self-closing <script/> opens no raw-text span — jumping
              // to a nonexistent close tag swallowed the document
              i = if ((res & 1L) == 1L) (res >>> 2).toInt
                  else skipToCloseTag(inner.get, (res >>> 2).toInt)
            } else if (i + 1 < n &&
              (s.charAt(i + 1).isLetter || s.charAt(i + 1) == '/')) {
              val res = scanTagEnd(i + 1)
              // unterminated tag (broken attribute quote in malformed
              // markup): consuming to EOF would drop the whole body —
              // fall back to single-step so a later '</head>'/'<body'
              // still recovers (review r13 round 3)
              i = if ((res & 2L) == 2L) (res >>> 2).toInt else i + 1
            } else {
              i += 1
            }
          }
        } else {
          i += 1
        }
      }
      n
    }

    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      if (c == '<') {
        if (s.regionMatches(false, i, "<!--", 0, 4)) {
          val end = s.indexOf("-->", i + 4)
          i = if (end < 0) n else end + 3
        } else if (s.regionMatches(false, i, "<![CDATA[", 0, 9)) {
          // CDATA payload is literal text (XHTML); the wrapper is markup
          val end = s.indexOf("]]>", i + 9)
          val stop = if (end < 0) n else end
          var k = i + 9
          while (k < stop) { appendText(s.charAt(k)); k += 1 }
          i = if (end < 0) n else end + 3
        } else if (i + 1 < n && (s.charAt(i + 1) == '!' || s.charAt(i + 1) == '?')) {
          // markup declarations and processing instructions — <!DOCTYPE
          // html>, <?xml ...?> — are markup, not text: every real crawled
          // page starts with one, and leaking it verbatim polluted the
          // extracted corpus text (round-12 review finding)
          var k = i + 2
          while (k < n && s.charAt(k) != '>') k += 1
          i = math.min(k + 1, n)
        } else {
          // tag: read the name, then scan to '>' honoring quotes
          var j = i + 1
          val closing = j < n && s.charAt(j) == '/'
          if (closing) j += 1
          val nameStart = j
          while (j < n && (s.charAt(j).isLetterOrDigit)) j += 1
          val name = s.substring(nameStart, j).toLowerCase(java.util.Locale.ROOT)
          val res = scanTagEnd(j)
          val afterTag = (res >>> 2).toInt
          val selfClosing = (res & 1L) == 1L
          if (name.isEmpty) {
            // stray '<' that is not a tag: literal text
            appendText('<')
            i += 1
          } else {
            // selfClosing guard on the skips: a self-closing <script/>
            // or <head/> opens no span — skipping to a nonexistent close
            // tag would swallow the rest of the document (review r13)
            if (!closing && !selfClosing && (name == "script" || name == "style")) {
              i = skipToCloseTag(name, afterTag)
            } else if (!closing && !selfClosing && name == "head") {
              flushBlock()
              i = skipToCloseTag(name, afterTag, stopAtOpen = "body")
            } else {
              if (name == "a") {
                // a self-closing <a/> opens nothing: counting it would
                // leave linkDepth stuck >0 and silently classify the
                // whole rest of the document as link text (review finding)
                if (closing) linkDepth = math.max(0, linkDepth - 1)
                else if (!selfClosing) linkDepth += 1
              }
              if (BlockTags.contains(name)) flushBlock()
              i = afterTag
            }
          }
        }
      } else if (c == '&') {
        // entity: named or numeric; an unterminated '&' stays literal
        val semi = s.indexOf(';', i + 1)
        if (semi > i && semi - i <= 10) {
          val ent = s.substring(i + 1, semi)
          val decoded: Int = ent match {
            case "amp" => '&'
            case "lt" => '<'
            case "gt" => '>'
            case "quot" => '"'
            case "apos" => '\''
            case "nbsp" => ' '
            case _ if ent.startsWith("#x") || ent.startsWith("#X") =>
              try Integer.parseInt(ent.substring(2), 16) catch { case _: Exception => -1 }
            case _ if ent.startsWith("#") =>
              try Integer.parseInt(ent.substring(1)) catch { case _: Exception => -1 }
            case _ => -1
          }
          if (decoded >= 0 && decoded <= Character.MAX_CODE_POINT) {
            Character.toChars(decoded).foreach(appendText)
            i = semi + 1
          } else { appendText('&'); i += 1 }
        } else { appendText('&'); i += 1 }
      } else {
        appendText(c)
        i += 1
      }
    }
    flushBlock()
    UTF8String.fromString(out.toString)
  }
}

case class HtmlToTextExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "html_to_text"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string input, got ${t.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    HtmlExtract.kernel(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.HtmlExtract$$.MODULE$$.kernel($c)")

  override protected def withNewChildInternal(newChild: Expression): HtmlToTextExpr =
    copy(child = newChild)
}
